"""Byte-pair-encoding merge learning over the corpus — tokenizer prep.

Learns the top-K BPE merges (Sennrich, Haddow & Birch 2016, "Neural
Machine Translation of Rare Words with Subword Units") the way real
tokenizer training does: over the WORD-FREQUENCY table, not the corpus —
the corpus is shuffled exactly once (word → count), and every merge
iteration operates on the vocabulary-sized relation (10⁷–10⁸ rows at
100 TB vs 10¹³ tokens), which is what makes tokenizer training on a
web-scale corpus a minutes-job instead of a pass-per-merge.

Engine-portable representation (the fixed-point playbook from
``operators/graph.py``/``kmeans.py``, applied to strings): a word's
symbol sequence is the concatenation of ``\\x1f<sym>\\x1e`` units, so a
merge of pair (a, b) is the LITERAL string replace
``\\x1fa\\x1e\\x1fb\\x1e → \\x1fab\\x1e``. Wrapping every symbol on both
sides makes adjacent matches share no characters, so one left-to-right
non-overlapping replace pass (identical semantics in Spark ``replace``
and DuckDB ``replace``) applies the merge greedily-leftmost everywhere —
including runs like ``aaa → (aa)(a)`` — bit-identically across engines
and partitionings. The DuckDB oracle unrolls the K iterations as CTE
stages and matches hash-for-hash.

Scale shape per iteration: one (l, r)-keyed vocab aggregate (partial,
map-combinable) + a 1-row argmax collect (the k-row MLlib driver-loop
pattern) + a lazy column replace. The word-frequency base is persisted
once; the K-deep replace chain re-evaluates only string replaces over
that cache.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ktpm___ocr_spark.functions.exprutil import let
from ktpm___ocr_spark.functions.textstats import words_array

SYM_L = "\x1f"  # unit separator: opens every symbol
SYM_R = "\x1e"  # record separator: closes every symbol


def sanitize_word(word) -> F.Column:
    """Strip the two delimiter control characters from input words —
    text that already contains U+001E/U+001F (OCR/web junk) would
    otherwise let a merged symbol contain the split boundary and corrupt
    every later round (r5 review)."""
    w = F.col(word) if isinstance(word, str) else word
    return F.regexp_replace(w, f"[{SYM_R}{SYM_L}]", "")


def wrap_chars(word) -> F.Column:
    """word → concatenated ``\\x1fc\\x1e`` units, one per character.
    Explicit per-index substring (no split-on-empty-pattern, whose edge
    behavior differs across engines)."""
    w = F.col(word) if isinstance(word, str) else word
    return F.aggregate(
        F.sequence(F.lit(1), F.length(w)),
        F.lit(""),
        lambda acc, i: F.concat(
            acc, F.lit(SYM_L), w.substr(i, F.lit(1)), F.lit(SYM_R)
        ),
    )


def word_freq_symbols(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, s) — the BPE training relation: corpus word counts
    with each word's initial character-symbol string (delimiter chars
    stripped; words made of nothing else are dropped)."""
    return (
        df.select(F.explode(words_array(F.col(text_col))).alias("_w"))
        .select(sanitize_word("_w").alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("word", "freq", wrap_chars("word").alias("s"))
    )


def _symbols(s) -> F.Column:
    """Symbol string → array of symbols (strip the outer wrappers, split
    on the closing+opening boundary between units). ``let``-bound: ``s``
    may be a deep replace chain, and it appears twice below (substr arg
    and length arg) — without the binding Catalyst evaluates it twice."""
    return let(
        s, lambda ss: F.split(ss.substr(F.lit(2), F.length(ss) - 2), SYM_R + SYM_L)
    )


def pair_counts(wf: DataFrame) -> DataFrame:
    """(lhs, rhs, f): adjacent-symbol pair frequencies weighted by word
    frequency — the relation each merge round argmaxes over.

    The symbol array is ``let``-bound: referenced naively at four sites
    (two sizes + two element_ats inside the transform lambda), Catalyst's
    CollapseProject would re-inline the substr+split subtree per array
    element — O(L²) per word per round (r5 review)."""
    pairs = let(
        _symbols(F.col("s")),
        lambda syms: F.when(
            F.size(syms) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(syms) - 1),
                lambda i: F.struct(
                    F.element_at(syms, i.cast("int")).alias("lhs"),
                    F.element_at(syms, (i + 1).cast("int")).alias("rhs"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<lhs:string,rhs:string>>")),
    )
    return (
        wf.select(F.col("freq"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("freq").cast("long").alias("f"))
    )


def apply_merge(wf: DataFrame, lhs: str, rhs: str) -> DataFrame:
    """One greedy-leftmost merge pass over the whole vocab — a literal
    string replace (see module doc for why this is exact)."""
    return wf.withColumn(
        "s",
        F.replace(
            F.col("s"),
            F.lit(SYM_L + lhs + SYM_R + SYM_L + rhs + SYM_R),
            F.lit(SYM_L + lhs + rhs + SYM_R),
        ),
    )


def bpe_merges(
    df: DataFrame, text_col: str = "text", k: int = 5,
    checkpoint_every: int = 16,
) -> DataFrame:
    """Learn the top-``k`` BPE merges. Returns (merge_rank, lhs, rhs,
    merged, pair_freq) — the merge table a tokenizer would ship.

    Ties break deterministically by (freq DESC, lhs ASC, rhs ASC); an
    exhausted pair space (fewer than k possible merges) stops early.

    Every ``checkpoint_every`` merges the symbol column is materialized
    (``localCheckpoint``, the CC generation pattern) and the previous
    generation's blocks are released. Without it, round R re-evaluates
    an R-deep replace chain over the cached word-freq base — O(K²·V)
    total string work at realistic K (r5 verdict task 5; measured on a
    100k-word vocab: per-merge time grows with rank unchekpointed, flat
    with the cap). The merge TABLE is unaffected — checkpointing only
    truncates lineage. ``0`` disables (useful for plan inspection)."""
    from ktpm___ocr_spark.operators.dedup import _release_checkpoint

    spark = df.sparkSession
    wf = word_freq_symbols(df, text_col).persist()
    gen: DataFrame | None = None
    try:
        out: list[tuple] = []
        cur = wf
        for rank in range(1, k + 1):
            top = (
                pair_counts(cur)
                .orderBy(F.desc("f"), F.asc("lhs"), F.asc("rhs"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            lhs, rhs, f = top[0]["lhs"], top[0]["rhs"], top[0]["f"]
            out.append((rank, lhs, rhs, lhs + rhs, f))
            cur = apply_merge(cur, lhs, rhs)
            if checkpoint_every and rank % checkpoint_every == 0:
                nxt = cur.localCheckpoint(eager=True)
                if gen is not None:
                    _release_checkpoint(gen)
                gen = nxt
                cur = nxt
        return spark.createDataFrame(
            out,
            "merge_rank long, lhs string, rhs string, merged string, "
            "pair_freq long",
        )
    finally:
        wf.unpersist()
        if gen is not None:
            # the returned merge table is driver-side rows — no reader
            # ever references the last generation's blocks
            _release_checkpoint(gen)


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list to every document's words — the
    tokenize step. Returns (id, word, tokens_canon) with the subword
    sequence as a space-joined canonical string.

    The merge chain runs over DISTINCT words (vocab-sized), then joins
    back to the (id, word) occurrences — at the module doc's design
    point that is ~10⁵× fewer chain evaluations than encoding per
    occurrence (r5 review); the same vocab-not-corpus argument that
    shapes training shapes tokenization."""
    words = (
        df.select(
            F.col(id_col), F.explode(words_array(F.col(text_col))).alias("_w")
        )
        .select(F.col(id_col), sanitize_word("_w").alias("word"))
        .filter(F.col("word") != "")
    )
    s = wrap_chars("word")
    for lhs, rhs in merges:
        s = F.replace(
            s,
            F.lit(SYM_L + lhs + SYM_R + SYM_L + rhs + SYM_R),
            F.lit(SYM_L + lhs + rhs + SYM_R),
        )
    encoded = (
        words.select("word")
        .distinct()
        .select("word", F.array_join(_symbols(s), " ").alias("tokens_canon"))
    )
    return words.join(encoded, "word").select(id_col, "word", "tokens_canon")
