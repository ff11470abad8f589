"""Count-min sketch bounds, fixed-point PageRank invariants, and
split-drift metrics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ktpm___ocr_spark.functions.drift import drift_bins, drift_l1
from ktpm___ocr_spark.functions.heavyhitters import (
    CM_DEPTH,
    CM_WIDTH,
    cm_estimate,
    cm_sketch,
    heavy_hitter_words,
)
from ktpm___ocr_spark.functions.textstats import deterministic_split
from ktpm___ocr_spark.operators.graph import SCALE, pagerank_fp


@pytest.fixture(scope="module")
def docs(spark, sf001_dir):
    df = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    df.cache().count()
    return df


# ---------------- count-min ----------------


def test_cm_estimate_upper_bounds_true_count(spark, docs):
    got = heavy_hitter_words(docs, top_n=20).collect()
    assert len(got) == 20
    for r in got:
        assert r["cm_est"] >= r["true_cnt"], r  # CM never underestimates


def test_cm_sketch_state_is_bounded(spark, docs):
    from ktpm___ocr_spark.functions.textstats import words_array

    terms = docs.select(F.explode(words_array(F.col("text"))).alias("term"))
    sk = cm_sketch(terms, F.col("term"))
    assert sk.count() <= CM_DEPTH * CM_WIDTH
    # total mass per row == |stream| (each item increments one counter/row)
    n_items = terms.count()
    per_row = {r["row"]: r["s"] for r in sk.groupBy("row").agg(F.sum("cnt").alias("s")).collect()}
    assert all(v == n_items for v in per_row.values())


def test_cm_exact_when_width_dwarfs_cardinality(spark):
    data = spark.createDataFrame(
        [(w,) for w in ["a"] * 5 + ["b"] * 3 + ["c"] * 2], "term string"
    )
    sk = cm_sketch(data, F.col("term"), depth=4, width=4096)
    keys = spark.createDataFrame([("a",), ("b",), ("c",)], "term string")
    est = {r["term"]: r["cm_est"] for r in cm_estimate(sk, keys, "term", 4, 4096).collect()}
    assert est == {"a": 5, "b": 3, "c": 2}  # no collisions at this width


def test_cm_estimate_unseen_key_is_zero(spark):
    """A key the stream never saw must come back as ONE row with est 0:
    its counter cells are absent from the sparse sketch relation (= 0),
    and the est>=true contract with true=0 demands est=0 when no cell
    collides — not a dropped key, not a min over populated cells only."""
    data = spark.createDataFrame([(w,) for w in ["a"] * 5], "term string")
    sk = cm_sketch(data, F.col("term"), depth=4, width=4096)
    keys = spark.createDataFrame([("a",), ("never-seen",)], "term string")
    est = {r["term"]: r["cm_est"] for r in cm_estimate(sk, keys, "term", 4, 4096).collect()}
    assert est == {"a": 5, "never-seen": 0}


# ---------------- pagerank ----------------


def test_pagerank_star_graph_ranks_hub_highest(spark):
    # star: spokes b,c,d all point at hub a; a points back at b
    e = spark.createDataFrame(
        [("b", "a"), ("c", "a"), ("d", "a"), ("a", "b")], "src string, dst string"
    )
    got = {r["node"]: r["rank_fp"] for r in pagerank_fp(e, iterations=5).collect()}
    assert set(got) == {"a", "b", "c", "d"}
    assert got["a"] == max(got.values())
    assert got["c"] == got["d"]  # symmetric spokes tie exactly (integer math)
    # total mass ≤ SCALE (dangling/rounding loss only) and > half retained
    assert sum(got.values()) <= SCALE
    assert sum(got.values()) > SCALE // 2


def test_pagerank_is_partitioning_invariant(spark):
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 23}") for i in range(60)]
    e = spark.createDataFrame(edges, "src string, dst string")
    r1 = {r["node"]: r["rank_fp"] for r in pagerank_fp(e, iterations=4).collect()}
    r2 = {
        r["node"]: r["rank_fp"]
        for r in pagerank_fp(e.repartition(13), iterations=4).collect()
    }
    assert r1 == r2  # bigint arithmetic: bit-identical under reshuffle


# ---------------- drift ----------------


def test_drift_zero_for_identical_marginals(spark):
    df = spark.createDataFrame(
        [("train", 100), ("train", 200), ("val", 100), ("val", 200)],
        "split string, n_chars int",
    )
    row = drift_l1(df).collect()[0]
    assert row["l1_distance"] == 0.0
    assert row["n_bins"] == 2


def test_drift_two_for_disjoint_support(spark):
    df = spark.createDataFrame(
        [("train", 10), ("train", 12), ("val", 5000), ("val", 6000)],
        "split string, n_chars int",
    )
    row = drift_l1(df).collect()[0]
    assert row["l1_distance"] == 2.0


def test_drift_on_hash_split_documents_is_small(spark, docs):
    d = deterministic_split(docs)
    row = drift_l1(d).collect()[0]
    # hash split: marginals should agree within statistical noise at sf0.001
    assert 0.0 <= row["l1_distance"] < 0.7
    bins = drift_bins(d).collect()
    # absdiff is rounded from the RAW proportions while p_a/p_b round
    # independently, so compare within the 2-ulp-of-rounding envelope
    assert all(
        abs(abs(b["p_a"] - b["p_b"]) - b["absdiff"]) <= 2e-6 for b in bins
    )
    assert sum(b["n_a"] for b in bins) > 0 and sum(b["n_b"] for b in bins) > 0


def test_triangle_counts_known_graph(spark):
    """K4 on {a,b,c,d} has 4 triangles, every node in 3 of them; a
    pendant edge adds none. Duplicate/reversed/self-loop inputs must
    not change the count."""
    from ktpm___ocr_spark.operators.graph import triangle_counts

    k4 = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
        ("c", "d"),
    ]
    noisy = k4 + [(y, x) for x, y in k4] + [("a", "a"), ("d", "e")]
    df = spark.createDataFrame(noisy, "src string, dst string")
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(df, top_n=10).collect()
    }
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_triangle_counts_each_triangle_once(spark):
    """A single triangle yields exactly one count per node (not 3 or 6
    — the orientation must not over-count permutations)."""
    from ktpm___ocr_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(
        [("x", "y"), ("y", "z"), ("x", "z")], "src string, dst string"
    )
    got = triangle_counts(df, top_n=10).collect()
    assert sorted((r["node"], r["n_triangles"]) for r in got) == [
        ("x", 1), ("y", 1), ("z", 1)
    ]


def test_triangle_counts_no_cartesian_and_equi_joins(spark):
    """All three joins must compile to equi-joins — never a cartesian
    product (the 100 TB guarantee of the oriented-wedge algorithm)."""
    from ktpm___ocr_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(
        [("x", "y"), ("y", "z"), ("x", "z")], "src string, dst string"
    )
    plan = (
        triangle_counts(df, top_n=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
