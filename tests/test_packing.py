"""Sliding-token-window coverage/overlap invariants and sequence-packing
determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from ktpm___ocr_spark.functions.packing import pack_samples, token_windows


def _doc(spark, text):
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_windows_cover_every_token_with_overlap(spark):
    words = [f"w{i}" for i in range(120)]
    got = token_windows(_doc(spark, " ".join(words)), size=50, stride=25).collect()
    # ceil((120-50)/25)+1 = 4 windows
    assert [r["win_idx"] for r in sorted(got, key=lambda r: r["win_idx"])] == [0, 1, 2, 3]
    seen = set()
    for r in got:
        toks = r["window_text"].split(" ")
        assert len(toks) == r["n_tokens"]
        assert r["n_tokens"] <= 50
        seen.update(toks)
    assert seen == set(words)  # full coverage
    w0 = next(r for r in got if r["win_idx"] == 0)["window_text"].split(" ")
    w1 = next(r for r in got if r["win_idx"] == 1)["window_text"].split(" ")
    assert w0[25:] == w1[:25]  # stride overlap


def test_short_doc_yields_single_window(spark):
    got = token_windows(_doc(spark, "a b c"), size=50, stride=25).collect()
    assert len(got) == 1 and got[0]["n_tokens"] == 3


def test_empty_doc_yields_no_windows(spark):
    assert token_windows(_doc(spark, "   "), size=50, stride=25).count() == 0


def test_pack_bins_bounded_and_partition_invariant(spark):
    rows = [(i, "en" if i % 2 else "de", 10 + (i * 7) % 90) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    got = pack_samples(df, capacity=300).collect()
    by_bin: dict[tuple, int] = {}
    max_sample = max(r[2] for r in rows)
    for r in got:
        by_bin[(r["lang"], r["bin_id"])] = by_bin.get((r["lang"], r["bin_id"]), 0) + r["n_tokens"]
    # greedy bound: a bin exceeds capacity by at most one sample
    assert all(v <= 300 + max_sample for v in by_bin.values())
    # and bins fill: every non-final bin reaches capacity
    for (lang, b), v in by_bin.items():
        if (lang, b + 1) in by_bin:
            assert v + max_sample >= 300
    got2 = pack_samples(df.repartition(17), capacity=300).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, got2))


def test_stride_larger_than_size_rejected(spark):
    import pytest

    with pytest.raises(ValueError, match="stride must not exceed size"):
        token_windows(_doc(spark, "a b c"), size=10, stride=20)
