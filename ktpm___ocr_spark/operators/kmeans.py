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


def _assign(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest centroid per vector: k-row broadcast list, argmin via
    (d, cid) struct-min — ties break to the lowest cluster id."""
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
    from pyspark.sql.window import Window

    vecs = corpus.select(
        F.col(id_col), quantize_vec(F.col(vec_col), scale).alias("_q")
    )
    centroids = (
        vecs.orderBy(id_col)
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy(id_col)) - 1).alias("cluster_id"),
            F.col("_q").alias("centroid"),
        )
    )
    for _ in range(iters):
        assigned = _assign(vecs, centroids)
        refined = (
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
        # a cluster that lost every member keeps its previous centroid,
        # so the relation stays exactly k rows (and the oracle mirrors it)
        kept = centroids.join(refined.select("cluster_id"), "cluster_id", "left_anti")
        centroids = refined.unionByName(kept)
        # fixed small iteration count — localCheckpoint unnecessary here;
        # lineage depth is 3·(agg+join), well under the planner blowup zone
    assignment = _assign(vecs, centroids).select(id_col, "cluster_id")
    return centroids, assignment


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
