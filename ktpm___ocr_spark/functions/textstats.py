"""Text analysis for training-data pipelines — language-ID, quality
scoring, token counting, document fingerprinting.

These extend the reference's per-document text stage (its OCR output is
trimmed text + a free-form ``{langDetected}`` meta field,
``backend/filters/ocrFilter.js:41-62``) into the operations a large-scale
corpus pipeline needs. Everything is JVM-side column expressions — no
Python in the hot path — and every formulation is deliberately portable
to ANSI SQL (the driver's DuckDB oracle re-runs the same arithmetic).

Portability rules used throughout:
* word hash = first 15 hex digits of sha256 → int (portable to any engine
  with sha256 + hex parse; no reliance on engine-specific hash()),
* folds use an explicit 0 initial accumulator and modulus 2³¹−1 so no
  intermediate exceeds int64 (ANSI-safe),
* regexes restricted to syntax identical in Java regex and RE2.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORD_SPLIT = r"\s+"
WORD_COUNT_RE = r"\S+"
# BPE-ish token: alnum run or single non-alnum-non-space symbol
BPE_TOKEN_RE = "[A-Za-z0-9]+|[^A-Za-z0-9 \\t\\n\\r]"
PUNCT_RE = "[^A-Za-z0-9 \\t\\n\\r]"

# Compact English stopword list (shared verbatim with the DuckDB oracle).
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "at", "is",
    "are", "was", "were", "be", "that", "this", "it", "as", "for", "with",
    "by", "from", "over", "into", "while", "every",
]

FNV_MOD = 2_147_483_647  # 2^31 - 1 — keeps acc*31 + h inside int64


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def words_array(text: Column | str) -> Column:
    """Lower-cased word list; '' and NULL → empty array."""
    t = _col(text)
    return F.filter(
        F.split(F.coalesce(F.lower(t), F.lit("")), WORD_SPLIT),
        lambda w: w != F.lit(""),
    )


def token_count_ws(text: Column | str) -> Column:
    """Whitespace token count (``\\S+`` runs)."""
    return F.coalesce(F.regexp_count(_col(text), F.lit(WORD_COUNT_RE)), F.lit(0))


def token_count_bpe(text: Column | str) -> Column:
    """BPE-ish token count: alnum runs + individual symbols."""
    return F.coalesce(F.regexp_count(_col(text), F.lit(BPE_TOKEN_RE)), F.lit(0))


def stopword_ratio(text: Column | str) -> Column:
    ws = words_array(text)
    n = F.size(ws)
    hits = F.size(F.filter(ws, lambda w: w.isin(*EN_STOPWORDS)))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / n.cast("double")
    )


def lang_id(text: Column | str, threshold: float = 0.12) -> Column:
    """Stopword-ratio language heuristic: 'en' / 'unk' / 'und' (empty)."""
    n = F.size(words_array(text))
    return (
        F.when(n == 0, F.lit("und"))
        .when(stopword_ratio(text) >= F.lit(threshold), F.lit("en"))
        .otherwise(F.lit("unk"))
    )


def punct_ratio(text: Column | str) -> Column:
    t = _col(text)
    n_chars = F.length(t)
    n_punct = F.coalesce(F.regexp_count(t, F.lit(PUNCT_RE)), F.lit(0))
    return F.when(
        n_chars.isNull() | (n_chars == 0), F.lit(0.0)
    ).otherwise(n_punct.cast("double") / n_chars.cast("double"))


def mean_word_len(text: Column | str) -> Column:
    ws = words_array(text)
    n = F.size(ws)
    total = F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        total.cast("double") / n.cast("double")
    )


def quality_score(text: Column | str) -> Column:
    """Composite document-quality score in [0, 1] (rounded to 4 dp).

    0.3·length + 0.3·stopword + 0.2·(1−punct) + 0.2·word-length-shape —
    the standard cheap pre-filter signals (length, stopword density,
    symbol noise, degenerate tokens) used before expensive pipeline
    stages.
    """
    t = _col(text)
    len_score = F.least(
        F.coalesce(F.length(t), F.lit(0)).cast("double") / 500.0, F.lit(1.0)
    )
    stop_score = F.least(stopword_ratio(t) / 0.4, F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(t) / 0.2, F.lit(1.0))
    wl = mean_word_len(t)
    wl_score = F.lit(1.0) - F.least(F.abs(wl - 5.0) / 5.0, F.lit(1.0))
    return F.round(
        0.3 * len_score + 0.3 * stop_score + 0.2 * punct_score + 0.2 * wl_score,
        4,
    )


def word_hash(w: Column) -> Column:
    """Portable 60-bit word hash: int of the first 15 hex chars of sha256."""
    return F.conv(F.substring(F.sha2(w, 256), 1, 15), 16, 10).cast("long")


def fingerprint(text: Column | str, mod: int = FNV_MOD) -> Column:
    """Rolling (Karp–Rabin-style) document fingerprint over words.

    fold: acc ← (acc·31 + hash(word)) mod (2³¹−1), acc₀ = 0. Order-
    sensitive — permuted documents fingerprint differently, unlike a
    bag-of-words hash.
    """
    return F.aggregate(
        words_array(text),
        F.lit(0).cast("long"),
        lambda acc, w: F.pmod(acc * 31 + word_hash(w), F.lit(mod)),
    )
