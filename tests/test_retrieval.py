"""Sparse retrieval: inverted index + BM25 (functions/retrieval.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ktpm___ocr_spark.functions.retrieval import bm25_topk, inverted_index


@pytest.fixture(scope="module")
def docs(spark, sf001_dir):
    df = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    df.cache().count()
    return df


def test_inverted_index_postings_are_correct(spark):
    d = spark.createDataFrame(
        [
            (1, "alpha beta alpha"),
            (2, "beta gamma"),
            (3, "alpha delta beta"),
        ],
        "doc_id long, text string",
    )
    idx = {r["term"]: r for r in inverted_index(d, min_df=1, max_df_ratio=1.0).collect()}
    assert idx["alpha"]["df"] == 2 and idx["alpha"]["cf"] == 3
    # positions are 0-based token offsets, postings ordered by doc id
    assert idx["alpha"]["postings"] == "1:0 2,3:0"
    assert idx["beta"]["df"] == 3 and idx["beta"]["postings"] == "1:1,2:0,3:2"
    assert idx["gamma"]["postings"] == "2:1"


def test_inverted_index_df_gates(spark):
    d = spark.createDataFrame(
        [
            (i, "common " + ("rare" if i == 0 else ("mid" if i < 5 else "other")))
            for i in range(10)
        ],
        "doc_id long, text string",
    )
    # 'common' in 10/10 docs (stopword gate at 50 %), 'rare' in 1 (below
    # min_df=2), 'mid' in 4 and 'other' in 5 (both survive)
    terms = {r["term"] for r in inverted_index(d, min_df=2, max_df_ratio=0.5).collect()}
    assert "common" not in terms  # stopword-class
    assert "rare" not in terms  # below min_df
    assert terms == {"mid", "other"}


def test_bm25_ranks_matching_docs_first(spark):
    d = spark.createDataFrame(
        [
            (1, "spark shuffle join hash join"),  # 2× join + hash
            (2, "hash table"),
            (3, "completely unrelated text here"),
            (4, "join order"),
        ],
        "doc_id long, text string",
    )
    got = bm25_topk(d, ["join", "hash"], k=4).collect()
    ids = [r["doc_id"] for r in got]
    assert ids[0] == 1  # matches both terms, higher tf
    assert 3 not in ids  # no query term → no row at all
    assert got[0]["n_hits"] == 2


def test_bm25_is_partitioning_invariant(spark, docs):
    a = [tuple(r) for r in bm25_topk(docs, ["hash", "join", "scan"], k=10).collect()]
    b = [
        tuple(r)
        for r in bm25_topk(docs.repartition(11), ["hash", "join", "scan"], k=10).collect()
    ]
    assert a == b


def test_bm25_longer_doc_penalized_at_equal_tf(spark):
    d = spark.createDataFrame(
        [
            (1, "join " + "pad " * 3),
            (2, "join " + "pad " * 40),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["score"] for r in bm25_topk(d, ["join"], k=2).collect()}
    assert got[1] > got[2]  # same tf, shorter doc scores higher (b > 0)


def test_proximity_hits_distances(spark):
    from ktpm___ocr_spark.functions.retrieval import proximity_hits

    d = spark.createDataFrame(
        [
            (1, "hash x x join"),          # dist 3
            (2, "join hash"),              # dist 1
            (3, "hash " + "x " * 20 + "join"),  # dist 21 > 5 → excluded
            (4, "hash only here"),         # no join → excluded
            (5, "join hash join hash"),    # multiple pairs, min dist 1
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["min_dist"], r["n_pairs"]) for r in
           proximity_hits(d, "hash", "join", max_dist=5).collect()}
    assert got == {1: (3, 1), 2: (1, 1), 5: (1, 4)}


def test_proximity_same_term_measures_repetition(spark):
    """term_a == term_b is a repetition-distance query: self-pairs are
    excluded, so a doc with ONE occurrence reports nothing and a doc
    with two occurrences k apart reports min_dist k."""
    from ktpm___ocr_spark.functions.retrieval import proximity_hits

    d = spark.createDataFrame(
        [
            (1, "echo x x echo"),   # dist 3
            (2, "echo alone"),      # single occurrence → no pairs
            (3, "echo echo"),       # dist 1, pairs = 2·1 = 2 ordered
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["min_dist"], r["n_pairs"]) for r in
           proximity_hits(d, "echo", "echo", max_dist=5).collect()}
    assert got == {1: (3, 2), 3: (1, 2)}
