"""Standalone k-means over embedding columns — fixed-point Lloyd
iterations that are bit-identical across engines and partitionings.

The IVF index (``ivf.py:79``) runs ONE float Lloyd refinement; this is
the full iterative operator (the corpus-organization / semantic-sharding
step of a training-data pipeline: cluster the embedding space, then
sample/cap per cluster). Reference parity: the reference app has no
clustering — this belongs to the large-scale-pipeline family the engine
adds on top (SURVEY.md §6).

Portability design (same playbook as the fixed-point PageRank in
``graph.py``): floats enter ONCE, at quantization (``floor(v * scale)``
— floor of an IEEE double is exact and engine-independent); everything
after is bigint arithmetic:

* distances: Σ(x−c)² over bigint components — exact;
* argmin ties: (distance, cluster_id) struct ordering — deterministic;
* centroid update: per-dimension ``sum(x) div count`` — truncating
  integer division, identical in Spark (``div``) and DuckDB (``//``)
  including negatives (both truncate toward zero);
* empty clusters keep their previous centroid (guarded union), so the
  centroid relation always has exactly k rows.

Scale shape: per iteration, one k-row broadcast (the centroid list) +
one (cluster, dim)-keyed aggregate whose shuffle is bounded by k·dim
rows — corpus size only flows through the narrow assign pass. Driver
loop is ``iters`` (fixed, small); no collect of corpus data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ktpm___ocr_spark.operators.similarity import _to_double


def quantize_vec(vec, scale: int = 64):
    """array<float> → array<long> fixed-point: floor(v·scale). Floor (not
    round) — round-half rules differ across engines; floor of a double
    is IEEE-exact in both."""
    return F.transform(
        _to_double(vec), lambda v: F.floor(v * scale).cast("long")
    )


def _int_sqdist(a, b):
    """Exact bigint Σ(x−y)²."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _assign_sql(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest centroid per vector, pure-DataFrame form: k-row broadcast
    list, argmin via (d, cid) struct-min — ties break to the lowest
    cluster id. Kept as the cross-check reference for the Arrow kernel
    (tests assert both produce identical assignments); the hot path is
    ``_assign`` below — interpreted HOF folds cost ~|vecs|·k·dim lambda
    evaluations per pass, which measured 6.7 s at sf0.1 vs 1.3 s for the
    numpy kernel."""
    c = F.broadcast(
        centroids.groupBy().agg(
            F.collect_list(F.struct("cluster_id", "centroid")).alias("_cs")
        )
    )
    nearest = F.array_min(
        F.transform(
            F.col("_cs"),
            lambda s: F.struct(
                _int_sqdist(F.col("_q"), s["centroid"]).alias("d"),
                s["cluster_id"].alias("cid"),
            ),
        )
    )
    return vecs.crossJoin(c).select(
        *vecs.columns, nearest["cid"].alias("cluster_id")
    )


def _assign(vecs: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """Nearest centroid per vector — Arrow-batched exact-int64 numpy
    kernel over a driver-side centroid list. Distances are Σ(x−c)² over
    bigint components; int64 numpy arithmetic computes the SAME integers
    as the SQL fold (no float anywhere), and ``argmin`` returns the
    first minimal index = the lowest cluster id — identical tie-breaking
    to the (d, cid) struct-min. Per batch one (n×d)·(d×k) matmul
    replaces n·k interpreted dim-element lambda folds."""
    cents = sorted(cents)
    cids = [c for c, _ in cents]
    cmat_rows = [v for _, v in cents]

    def kernel(batches):
        import numpy as np
        import pandas as pd

        cmat = np.asarray(cmat_rows, dtype=np.int64)  # k × d
        cnorm = (cmat * cmat).sum(axis=1)  # k
        cid_arr = np.asarray(cids, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(list(pdf["_q"]), dtype=np.int64)  # n × d
            # ‖x−c‖² = ‖x‖² − 2x·c + ‖c‖²; ‖x‖² is constant per row and
            # cannot change the argmin — skip it, keep ints exact
            d2 = cnorm[None, :] - 2 * (x @ cmat.T)
            out = pdf.copy()
            out["cluster_id"] = cid_arr[np.argmin(d2, axis=1)]
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in vecs.schema.fields
    )
    return vecs.mapInPandas(kernel, schema=schema + ", cluster_id bigint")


def _centroid_update(assigned: DataFrame) -> DataFrame:
    """One Lloyd centroid refinement: (cluster, dim)-keyed mean with
    truncating integer division. Map-side combinable — the shuffle
    carries partial (sum, count) pairs bounded by k·dim·partitions rows,
    never |corpus|·dim (``test_plans.test_kmeans_update_aggregate_is_
    partial`` pins the two-HashAggregate shape)."""
    return (
        assigned.select("cluster_id", F.posexplode("_q").alias("dim", "x"))
        .groupBy("cluster_id", "dim")
        .agg(F.expr("sum(x) div count(*)").alias("m"))
        .groupBy("cluster_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("dim", "m"))),
                lambda s: s["m"],
            ).alias("centroid")
        )
    )


def kmeans_fp(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
    scale: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """Fixed-point Lloyd k-means. Returns ``(centroids, assignment)``:
    centroids(cluster_id, centroid array<long>), assignment(id, cluster_id).

    Seeds are the k lexicographically-first ids (stable across runs and
    parallelism). Exactly ``iters`` assign→update rounds; the final
    assignment is against the last update's centroids."""
    spark = corpus.sparkSession
    # persisted for the loop: every iteration's update + the final assign
    # are separate jobs, and without the cache each would re-scan and
    # re-quantize the corpus (iters+1 redundant passes)
    vecs = corpus.select(
        F.col(id_col), quantize_vec(F.col(vec_col), scale).alias("_q")
    ).persist()
    # Centroids live as a driver-side k×dim int table between iterations
    # (k rows — the broadcast-small-dim pattern): each iteration's plan
    # then starts from literals instead of re-deriving every earlier
    # iteration's assign+update lineage (which would re-run 1+2+…+iters
    # times without an explicit cache).
    cents: list[tuple[int, list[int]]] = [
        (i, list(r["_q"]))
        for i, r in enumerate(vecs.orderBy(id_col).limit(k).collect())
    ]

    def _cent_df(c):
        return spark.createDataFrame(
            c, "cluster_id long, centroid array<bigint>"
        )

    for _ in range(iters):
        refined = _centroid_update(_assign(vecs, cents))
        new = {
            r["cluster_id"]: list(r["centroid"]) for r in refined.collect()
        }
        # a cluster that lost every member keeps its previous centroid,
        # so the relation stays exactly k rows (and the oracle mirrors it)
        cents = [(cid, new.get(cid, cen)) for cid, cen in cents]
    # final assignment: localCheckpoint materializes it off the cached
    # vecs so the cache can be released before returning (no persisted
    # blocks outlive the operator — repo-wide persist-hygiene rule)
    try:
        assignment = (
            _assign(vecs, cents).select(id_col, "cluster_id").localCheckpoint()
        )
    finally:
        vecs.unpersist()
    return _cent_df(cents), assignment


def kmeans_profile(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
    scale: int = 64,
) -> DataFrame:
    """Driver-checkable projection: per cluster, member count and the
    exact integer centroid as a canonical comma-joined string (scalar
    columns only — the harness canonicalizer rejects arrays)."""
    centroids, assignment = kmeans_fp(corpus, id_col, vec_col, k, iters, scale)
    sizes = assignment.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return (
        centroids.join(sizes, "cluster_id", "left")
        .select(
            F.col("cluster_id").cast("long").alias("cluster_id"),
            F.coalesce("n_members", F.lit(0)).cast("long").alias("n_members"),
            F.array_join(
                F.transform("centroid", lambda v: v.cast("string")), ","
            ).alias("centroid_canon"),
        )
    )
