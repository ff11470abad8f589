"""BPE merge learning / encoding — the Sennrich worked example plus the
greedy-replace edge cases the wrapped-symbol representation must get
exactly right."""

from __future__ import annotations

from ktpm___ocr_spark.functions.bpe import (
    apply_merge,
    bpe_encode,
    bpe_merges,
    pair_counts,
    word_freq_symbols,
)


def _corpus(spark, text):
    return spark.createDataFrame([(1, text)], "doc_id bigint, text string")


def test_bpe_sennrich_example(spark):
    """low×5 lower×2 newest×6 widest×3 → es, est, lo, low (the canonical
    BPE walk-through, Sennrich et al. 2016 §3.2)."""
    df = _corpus(
        spark,
        " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3),
    )
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["merged"], r["pair_freq"])
        for r in bpe_merges(df, k=4).orderBy("merge_rank").collect()
    ]
    assert got == [
        (1, "e", "s", "es", 9),
        (2, "es", "t", "est", 9),
        (3, "l", "o", "lo", 7),
        (4, "lo", "w", "low", 7),
    ]


def test_bpe_encode_applies_merges(spark):
    df = _corpus(
        spark,
        " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3),
    )
    merges = [
        (r["lhs"], r["rhs"])
        for r in bpe_merges(df, k=6).orderBy("merge_rank").collect()
    ]
    enc = {
        r["word"]: r["tokens_canon"]
        for r in bpe_encode(df, merges).distinct().collect()
    }
    assert enc["newest"] == "n ewest"
    assert enc["lower"] == "low e r"
    assert enc["widest"] == "w i d est"


def test_bpe_greedy_leftmost_on_runs(spark):
    """aaa under merge (a,a) → (aa)(a) — greedy leftmost, never (a)(aa);
    abab under (a,b) merges BOTH pairs in one pass (adjacent matches
    share no characters in the wrapped representation)."""
    wf = word_freq_symbols(
        spark.createDataFrame([(1, "aaa abab")], "doc_id bigint, text string")
    )
    merged = apply_merge(wf, "a", "a")
    from ktpm___ocr_spark.functions.bpe import _symbols
    from pyspark.sql import functions as F

    syms = {
        r["word"]: r["t"]
        for r in merged.select(
            "word", F.array_join(_symbols(F.col("s")), "|").alias("t")
        ).collect()
    }
    assert syms["aaa"] == "aa|a"
    merged2 = apply_merge(wf, "a", "b")
    syms2 = {
        r["word"]: r["t"]
        for r in merged2.select(
            "word", F.array_join(_symbols(F.col("s")), "|").alias("t")
        ).collect()
    }
    assert syms2["abab"] == "ab|ab"


def test_bpe_exhausted_pair_space_stops_early(spark):
    """A vocab of single-char words has no pairs → empty merge table."""
    df = _corpus(spark, "a b c a b a")
    assert bpe_merges(df, k=5).count() == 0


def test_pair_counts_weighted_by_freq(spark):
    df = _corpus(spark, "ab ab ab cd")
    got = {
        (r["lhs"], r["rhs"]): r["f"] for r in pair_counts(word_freq_symbols(df)).collect()
    }
    assert got[("a", "b")] == 3 and got[("c", "d")] == 1


def test_bpe_delimiter_chars_sanitized(spark):
    """Input text containing the \\x1e/\\x1f delimiter chars must not
    corrupt the symbol encoding — they are stripped before wrapping, and
    delimiter-only words vanish."""
    df = _corpus(spark, "ab\x1fcd ab\x1ecd \x1f\x1e ab ab ab")
    wf = {r["word"]: r["freq"] for r in word_freq_symbols(df).collect()}
    # both contaminated spellings collapse to the clean word
    assert wf == {"abcd": 2, "ab": 3}
    merges = [
        (r["lhs"], r["rhs"])
        for r in bpe_merges(df, k=2).orderBy("merge_rank").collect()
    ]
    enc = {
        r["word"]: r["tokens_canon"]
        for r in bpe_encode(df, merges).distinct().collect()
    }
    assert set(enc) == {"abcd", "ab"}
    assert all("\x1e" not in t and "\x1f" not in t for t in enc.values())
