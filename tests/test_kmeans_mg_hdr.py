"""Round-4 breadth operators: fixed-point k-means, Misra–Gries top-k,
HDR-style mergeable quantile histogram."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ktpm___ocr_spark.functions.heavyhitters import (
    mg_merge,
    mg_partition_summaries,
    mg_top_terms,
)
from ktpm___ocr_spark.functions.sketches import hdr_cells, hdr_quantiles
from ktpm___ocr_spark.functions.textstats import words_array
from ktpm___ocr_spark.operators.kmeans import kmeans_fp, kmeans_profile


@pytest.fixture(scope="module")
def docs(spark, sf001_dir):
    df = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def emb(spark, sf001_dir):
    df = spark.read.parquet(f"{sf001_dir}/embeddings.parquet")
    df.cache().count()
    return df


# ---------------- fixed-point k-means ----------------


def test_kmeans_partitions_all_vectors(spark, emb):
    centroids, assignment = kmeans_fp(emb, k=8, iters=3)
    assert centroids.count() == 8
    assert assignment.count() == emb.count()
    # every vector lands in exactly one cluster, ids 0..7
    cids = {r["cluster_id"] for r in assignment.select("cluster_id").distinct().collect()}
    assert cids <= set(range(8))


def test_kmeans_is_partitioning_invariant(spark, emb):
    """Fixed-point arithmetic end to end ⇒ bit-identical centroids no
    matter how the input is partitioned (the property float Lloyd loses:
    float sums reorder under different partitionings)."""
    a = sorted(tuple(r) for r in kmeans_profile(emb, k=4, iters=2).collect())
    b = sorted(
        tuple(r) for r in kmeans_profile(emb.repartition(13), k=4, iters=2).collect()
    )
    assert a == b


def test_kmeans_iterations_reduce_distortion(spark, emb):
    """More Lloyd rounds must not increase total distortion (floor-mean
    centroids are within 1/scale of the true mean, so monotonicity holds
    at the granularity the test checks)."""
    from ktpm___ocr_spark.operators.kmeans import _int_sqdist, quantize_vec

    def distortion(iters):
        centroids, assignment = kmeans_fp(emb, k=8, iters=iters)
        vecs = emb.select("vec_id", quantize_vec(F.col("embedding")).alias("_q"))
        joined = vecs.join(assignment, "vec_id").join(centroids, "cluster_id")
        return joined.agg(
            F.sum(_int_sqdist(F.col("_q"), F.col("centroid"))).alias("d")
        ).first()["d"]

    assert distortion(3) <= distortion(1)


def test_kmeans_arrow_assign_equals_sql_assign(spark, emb):
    """The numpy int64 assign kernel must produce EXACTLY the assignment
    of the pure-DataFrame (d, cid) struct-min — same integers, same
    lowest-cid tie-breaking — on every vector."""
    from ktpm___ocr_spark.operators.kmeans import _assign, _assign_sql, quantize_vec

    vecs = emb.select("vec_id", quantize_vec(F.col("embedding")).alias("_q"))
    cents = [
        (i, list(r["_q"]))
        for i, r in enumerate(vecs.orderBy("vec_id").limit(8).collect())
    ]
    cent_df = spark.createDataFrame(cents, "cluster_id long, centroid array<bigint>")
    a = {r["vec_id"]: r["cluster_id"] for r in _assign(vecs, cents).collect()}
    b = {r["vec_id"]: r["cluster_id"] for r in _assign_sql(vecs, cent_df).collect()}
    assert a == b


def test_kmeans_profile_shape(spark, emb):
    prof = kmeans_profile(emb, k=8, iters=3)
    rows = prof.collect()
    assert len(rows) == 8
    assert sum(r["n_members"] for r in rows) == emb.count()
    dim = len(emb.first()["embedding"])
    for r in rows:
        assert len(r["centroid_canon"].split(",")) == dim


# ---------------- Misra–Gries ----------------


def test_mg_summary_state_is_bounded(spark, docs):
    terms = docs.select(F.explode(words_array(F.col("text"))).alias("term"))
    summ = mg_partition_summaries(terms.repartition(8), m=64)
    per_part = summ.groupBy(F.spark_partition_id().alias("p")).count()
    # ≤ m candidate rows per partition regardless of stream size —
    # asserted per partition, not just in total (a fold leaking > m
    # counters in one partition could hide under the global bound)
    assert per_part.agg(F.max("count")).first()[0] <= 64
    assert summ.count() <= 8 * 64
    merged = mg_merge(summ, m=64)
    assert merged.count() <= 64


def test_mg_top_terms_equals_exact_topk(spark, docs):
    """The two-pass MG (bounded-state candidates + exact recount) must
    equal the plain exact top-k whenever the margin holds — and the
    margin must hold on this corpus (asserted, not assumed)."""
    terms = docs.select(F.explode(words_array(F.col("text"))).alias("term"))
    n_items = terms.count()
    exact = (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(20)
        .collect()
    )
    # margin: every true top-20 count must exceed the merged summary's
    # worst-case additive error 2·n/(m+1), else MG could evict it
    assert exact[-1]["n"] > 2 * n_items / (256 + 1)
    got = mg_top_terms(docs, top_n=20, m=256).collect()
    assert [(r["term"], r["n"]) for r in got] == [
        (r["term"], r["n"]) for r in exact
    ]


def test_mg_is_partitioning_invariant_after_recount(spark, docs):
    """Candidate SETS are partitioning-dependent (that's inherent to MG);
    the final recounted top-k must not be."""
    a = [tuple(r) for r in mg_top_terms(docs, top_n=10).collect()]
    b = [tuple(r) for r in mg_top_terms(docs.repartition(17), top_n=10).collect()]
    assert a == b


# ---------------- HDR quantile histogram ----------------


def test_hdr_cells_merge_by_addition(spark):
    vals = spark.range(1, 2001).select((F.col("id") * 0.37).alias("v"))
    whole = {
        (r["bl"], r["sub"]): r["cnt"] for r in hdr_cells(vals, "v").collect()
    }
    h1 = hdr_cells(vals.filter(F.col("v") < 300), "v")
    h2 = hdr_cells(vals.filter(F.col("v") >= 300), "v")
    merged = (
        h1.unionByName(h2)
        .groupBy("bl", "sub", "lb")
        .agg(F.sum("cnt").alias("cnt"))
    )
    got = {(r["bl"], r["sub"]): r["cnt"] for r in merged.collect()}
    assert got == whole


def test_hdr_quantiles_bounded_relative_error(spark, sf001_dir):
    ev = spark.read.parquet(f"{sf001_dir}/events.parquet")
    got = {r["label"]: r["est_centi"] for r in hdr_quantiles(ev, "value").collect()}
    exact = ev.selectExpr(
        "percentile(value, 0.5) AS p50",
        "percentile(value, 0.9) AS p90",
        "percentile(value, 0.99) AS p99",
    ).first()
    assert got["p50"] <= got["p90"] <= got["p99"]
    for label in ("p50", "p90", "p99"):
        est = got[label] / 100.0
        true = exact[label]
        # cell lower bound: est ≤ true side of the cell, within one
        # sub-bucket of relative error (2^-4) plus the centi resolution
        assert est <= true + 0.01
        assert est >= true * (1 - 2 ** -4) - 0.02, (label, est, true)


def test_hdr_zero_and_negative_clamp(spark):
    vals = spark.createDataFrame([(-3.0,), (0.0,), (0.004,)], "v double")
    cells = hdr_cells(vals, "v").collect()
    assert len(cells) == 1
    assert cells[0]["bl"] == 0 and cells[0]["lb"] == 0 and cells[0]["cnt"] == 3


def test_hdr_nulls_are_not_observations(spark):
    """A NULL value must not count as a 0-valued observation (greatest()
    skips nulls) — it would inflate n and drag quantiles toward 0."""
    vals = spark.createDataFrame(
        [(1.0,), (None,), (2.0,), (None,)], "v double"
    )
    cells = hdr_cells(vals, "v").collect()
    assert sum(r["cnt"] for r in cells) == 2
    got = {r["label"]: r["target_rank"] for r in hdr_quantiles(vals, "v").collect()}
    assert got["p50"] == 1  # n=2, not 4


# ---------------- KMV bottom-k rank sketch ----------------


def test_kmv_quantiles_match_python_model(spark):
    """On an input smaller than k the sample IS the dataset, so each
    quantile must equal the exact ceil-rank order statistic."""
    from ktpm___ocr_spark.functions.sketches import kmv_quantiles

    rows = [(i, (i * 37) % 100) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {r["label"]: r for r in kmv_quantiles(df, "v", "id").collect()}
    vs = sorted(v for _, v in rows)
    for label, num, den in (
        ("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p90", 9, 10), ("p99", 99, 100),
    ):
        assert got[label]["n_sample"] == 50
        assert got[label]["est_value"] == vs[-(-50 * num // den) - 1], label


def test_kmv_sample_is_merge_order_independent(spark):
    """The defining lattice property: the bottom-k set is a pure
    function of the row set — identical under any partitioning (the
    stand-in for any merge tree / arrival order)."""
    from ktpm___ocr_spark.functions.sketches import kmv_sample

    rows = [(i, i % 17) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, v long")
    base = sorted(map(tuple, kmv_sample(df, "v", "id", k=64).collect()))
    for parts in (1, 7, 32):
        got = sorted(
            map(tuple, kmv_sample(df.repartition(parts), "v", "id", k=64).collect())
        )
        assert got == base, f"bottom-k changed under repartition({parts})"


def test_kmv_empty_and_null_inputs(spark):
    """Empty input -> NULL estimates with n_sample 0; NULL values are
    not observations."""
    from ktpm___ocr_spark.functions.sketches import kmv_quantiles

    empty = spark.createDataFrame([], "id long, v long")
    for r in kmv_quantiles(empty, "v", "id").collect():
        assert r["n_sample"] == 0 and r["est_value"] is None

    withnull = spark.createDataFrame(
        [(1, None), (2, 5), (3, None)], "id long, v long"
    )
    out = {r["label"]: r for r in kmv_quantiles(withnull, "v", "id").collect()}
    assert all(r["n_sample"] == 1 and r["est_value"] == 5 for r in out.values())


def test_kmv_sample_plans_as_take_ordered(spark, sf001_dir):
    """The distributed piece must be TakeOrderedAndProject (per-task
    bottom-k, k·P-row final merge) — never a global Sort Exchange of
    the corpus."""
    from ktpm___ocr_spark.functions.sketches import kmv_sample

    df = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    plan = kmv_sample(df, "n_chars", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_kmv_quantiles_plans_one_sample_one_scan(spark, sf001_dir):
    """The 5 quantile targets must share ONE bottom-k sample (explode of
    a literal targets array against the one-row aggregate) — a
    per-target union would re-plan the TakeOrdered and re-scan the
    corpus once per quantile."""
    from ktpm___ocr_spark.functions.sketches import kmv_quantiles

    df = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    plan = (
        kmv_quantiles(df, "n_chars", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("TakeOrderedAndProject") == 1, plan
    assert plan.count("FileScan") == 1, plan


def test_kmv_grouped_matches_python_model_any_partitioning(spark):
    """Two-phase pre-pruned grouped bottom-k must equal the naive
    per-group model under every partitioning (the min-k lattice)."""
    import hashlib

    from ktpm___ocr_spark.functions.sketches import kmv_grouped_quantiles

    rows = [(i, ["a", "b", "c"][i % 3], (i * 131) % 997) for i in range(300)]
    want = {}
    for g in ("a", "b", "c"):
        grp = [(i, v) for i, gg, v in rows if gg == g]
        byh = sorted(
            grp, key=lambda r: hashlib.sha256(str(r[0]).encode()).hexdigest()
        )
        vs = sorted(v for _, v in byh[:64])
        n = len(vs)
        for label, num, den in (
            ("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4),
            ("p90", 9, 10), ("p99", 99, 100),
        ):
            want[(g, label)] = (n, vs[-(-n * num // den) - 1])

    df = spark.createDataFrame(rows, "id long, g string, v long")
    for parts in (1, 7, 32):
        got = {
            (r["domain"], r["label"]): (r["n_sample"], r["est_value"])
            for r in kmv_grouped_quantiles(
                df.repartition(parts), "v", "id", "g"
            ).collect()
        }
        assert got == want, parts


def test_kmv_grouped_plans_preprune_one_exchange(spark, sf001_dir):
    """The scale shape: a MapInPandas pre-prune feeds ONE grouped
    Exchange over the pruned relation — never a corpus-wide
    group-partitioned window sort."""
    from ktpm___ocr_spark.functions.sketches import kmv_grouped_quantiles

    df = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    plan = (
        kmv_grouped_quantiles(df, "n_chars", "doc_id", "source")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan, plan
    assert plan.count("Exchange") == 1, plan
    assert "Window" not in plan, plan


def test_kmv_grouped_defer_value_equals_plain(spark):
    """All three value strategies — pre-computed column, one-pass
    value_expr (defer=False), two-pass winner join-back (defer=True) —
    must be bit-identical on NULL-free values, under any partitioning."""
    from pyspark.sql import functions as F

    from ktpm___ocr_spark.functions.sketches import kmv_grouped_quantiles

    rows = [(i, ["a", "b"][i % 2], "w " * (1 + i % 9)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, g string, text string")
    expr = F.size(F.split(F.trim("text"), " "))
    plain = sorted(
        map(
            tuple,
            kmv_grouped_quantiles(
                df.withColumn("v", expr.cast("long")), "v", "id", "g"
            ).collect(),
        )
    )
    for parts in (1, 8):
        for strat in (False, True):
            got = sorted(
                map(
                    tuple,
                    kmv_grouped_quantiles(
                        df.repartition(parts),
                        None,
                        "id",
                        "g",
                        value_expr=expr,
                        defer=strat,
                        broadcast_winners=True,
                    ).collect(),
                )
            )
            assert got == plain, (parts, strat)


def test_kmv_grouped_expr_null_semantics_strategy_invariant(spark):
    """NULL-valued winner rows SHRINK the group's sample (winner
    selection by hash over all rows, value filter after) — and the rule
    must hold identically for the one-pass and two-pass strategies and
    every winner-join flavor, or defer='auto' would change results with
    data shape. Checked against a python model."""
    import hashlib

    from pyspark.sql import functions as F

    from ktpm___ocr_spark.functions.sketches import kmv_grouped_quantiles

    # v is NULL for every 3rd row; k=8 so winner slots are contested
    rows = [(i, ["a", "b"][i % 2], None if i % 3 == 0 else (i * 37) % 211)
            for i in range(120)]
    want = {}
    for g in ("a", "b"):
        grp = [(i, v) for i, gg, v in rows if gg == g]
        byh = sorted(
            grp, key=lambda r: hashlib.sha256(str(r[0]).encode()).hexdigest()
        )
        vs = sorted(v for _, v in byh[:8] if v is not None)
        n = len(vs)
        for label, num, den in (
            ("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4),
            ("p90", 9, 10), ("p99", 99, 100),
        ):
            want[(g, label)] = (n, vs[-(-n * num // den) - 1] if n else None)

    df = spark.createDataFrame(rows, "id long, g string, v long")
    variants = [
        dict(defer=False),
        dict(defer=True, broadcast_winners=True),
        dict(defer=True, broadcast_winners=False),
        dict(defer=True, broadcast_winners=None),
    ]
    for parts in (1, 8):
        for kw in variants:
            got = {
                (r["domain"], r["label"]): (r["n_sample"], r["est_value"])
                for r in kmv_grouped_quantiles(
                    df.repartition(parts), None, "id", "g", k=8,
                    value_expr=F.col("v"), **kw,
                ).collect()
            }
            assert got == want, (parts, kw)


def test_kmv_grouped_defer_plans_broadcast_winner_join(spark, sf001_dir):
    """The defer plan's shape: two scans (hash pass + probe), a
    BroadcastHashJoin of the winner keys, still no Window and no extra
    Exchange beyond the two grouped aggregates."""
    from pyspark.sql import functions as F

    from ktpm___ocr_spark.functions.sketches import kmv_grouped_quantiles

    df = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    plan = (
        kmv_grouped_quantiles(
            df,
            None,
            "doc_id",
            "source",
            value_expr=F.length("text"),
            defer=True,
            broadcast_winners=True,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("FileScan") == 2, plan
    assert "Window" not in plan, plan


def test_kmv_grouped_host_cardinality_shuffle_fallback_plan(spark, sf001_dir):
    """broadcast_winners=False — the web-scale HOST-cardinality regime
    where k·|groups| outgrows any broadcast — must swap the winner join
    to a shuffled hash join: no BroadcastHashJoin anywhere, and still no
    corpus-wide Window."""
    from pyspark.sql import functions as F

    from ktpm___ocr_spark.functions.sketches import kmv_grouped_quantiles

    df = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    plan = (
        kmv_grouped_quantiles(
            df,
            None,
            "doc_id",
            "source",
            value_expr=F.length("text"),
            defer=True,
            broadcast_winners=False,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "Window" not in plan, plan


def test_kmv_grouped_measured_broadcast_decision(spark, sf001_dir):
    """broadcast_winners=None MEASURES: phase 1 is persisted + counted,
    and a small winner relation broadcasts (the count at sf0.001 is far
    under the bound). The persisted relation must be REUSED by the join
    (InMemoryTableScan in the plan), not recomputed."""
    from pyspark.sql import functions as F

    from ktpm___ocr_spark.functions.sketches import kmv_grouped_quantiles

    df = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    out = kmv_grouped_quantiles(
        df,
        None,
        "doc_id",
        "source",
        value_expr=F.length("text"),
        defer=True,
        broadcast_winners=None,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "InMemoryTableScan" in plan, plan
    assert out.count() > 0


def test_kmv_grouped_auto_defer_selects_by_row_bytes(spark):
    """defer='auto' picks the strategy from sampled row bytes: tiny rows
    -> one pass (no winner join in the plan); fat rows (>= threshold) ->
    two passes (winner join present). Results identical either way."""
    from pyspark.sql import functions as F

    from ktpm___ocr_spark.functions.sketches import kmv_grouped_quantiles

    small = spark.createDataFrame(
        [(i, "a", "xy") for i in range(50)], "id long, g string, text string"
    )
    fat = spark.createDataFrame(
        [(i, "a", "x" * 4096) for i in range(50)],
        "id long, g string, text string",
    )
    expr = F.length("text")
    plan_small = (
        kmv_grouped_quantiles(small, None, "id", "g", value_expr=expr)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan_small, plan_small
    plan_fat = (
        kmv_grouped_quantiles(fat, None, "id", "g", value_expr=expr)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" in plan_fat, plan_fat


def test_kmv_grouped_keeps_null_group(spark):
    """A NULL group is a group: the pandas pre-prune must not silently
    drop it (pandas groupby defaults to dropna=True), in either path —
    the SQL oracle's GROUP BY and Spark's own groupBy both keep it."""
    from pyspark.sql import functions as F

    from ktpm___ocr_spark.functions.sketches import kmv_grouped_quantiles

    rows = [(i, None if i % 3 == 0 else "a", i) for i in range(90)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    plain = kmv_grouped_quantiles(df, "v", "id", "g").collect()
    doms = {r["domain"] for r in plain}
    assert doms == {None, "a"}, doms
    n_null = {r["n_sample"] for r in plain if r["domain"] is None}
    assert n_null == {30}  # all 30 null-group rows sampled (< k)
    defer = kmv_grouped_quantiles(
        df, None, "id", "g", value_expr=F.col("v")
    ).collect()
    keyf = lambda r: (r[0] is not None, r)  # None domain sorts first
    assert sorted(map(tuple, defer), key=keyf) == sorted(
        map(tuple, plain), key=keyf
    )
