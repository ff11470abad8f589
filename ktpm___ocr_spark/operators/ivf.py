"""IVF (inverted-file) approximate nearest neighbor — the partition-
pruned ANN strategy for corpora too large to broadcast or bucket well.

Plan shape (all DataFrame ops, deterministic end to end):

1. **Centroids**: seed with the K lexicographically-first vectors (stable
   across runs/parallelism), refine with one Lloyd iteration (assign →
   mean per cluster). Deterministic because means are exact decimal-free
   averages over deterministic assignments.
2. **Index**: every corpus vector assigned to its nearest centroid —
   one narrow pass + a tiny broadcast of K centroids.
3. **Search**: a query probes its ``nprobe`` nearest centroids and exact-
   reranks only those clusters' members — the equi-join on cluster id is
   the partition-pruning step; work scales with |cluster| · nprobe, not
   |corpus|.

At 100 TB the index is written once (cluster id = partition column) and
queries prune partitions on scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ktpm___ocr_spark.operators.similarity import _to_double, cosine, dot
from ktpm___ocr_spark.operators.windows import top_n_per_key


def _sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _nearest_centroid(vec, centroids: DataFrame, out: str = "cluster"):
    """Broadcast centroids, pick argmin squared distance."""
    c = F.broadcast(
        centroids.groupBy().agg(
            F.collect_list(F.struct("cluster_id", "centroid")).alias("_cs")
        )
    )
    return c, F.array_min(
        F.transform(
            F.col("_cs"),
            lambda s: F.struct(
                _sqdist(vec, s["centroid"]).alias("d"),
                s["cluster_id"].alias("cid"),
            ),
        )
    )


def build_ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Returns (centroids(cluster_id, centroid), index(id, vec, cluster))."""
    from pyspark.sql.window import Window

    vecs = corpus.select(
        F.col(id_col), _to_double(F.col(vec_col)).alias("_v")
    )
    seeds = (
        vecs.orderBy(id_col)
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy(id_col)) - 1).alias(
                "cluster_id"
            ),
            F.col("_v").alias("centroid"),
        )
    )
    # one Lloyd refinement: assign to seed, average per cluster.
    # Per-dim means via posexplode (shuffle bounded by K·dim rows).
    cjoin, nearest = _nearest_centroid(F.col("_v"), seeds)
    assigned = vecs.crossJoin(cjoin).select(
        id_col, "_v", nearest["cid"].alias("cluster_id")
    )
    refined = (
        assigned.select("cluster_id", F.posexplode("_v").alias("dim", "x"))
        .groupBy("cluster_id", "dim")
        .agg(F.avg("x").alias("m"))
        .groupBy("cluster_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("dim", "m"))),
                lambda s: s["m"],
            ).alias("centroid")
        )
    )
    cjoin2, nearest2 = _nearest_centroid(F.col("_v"), refined)
    index = vecs.crossJoin(cjoin2).select(
        id_col, F.col("_v").alias("vec"), nearest2["cid"].alias("cluster")
    )
    return refined, index


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_clusters: int = 8,
    nprobe: int = 2,
    round_dp: int = 5,
) -> DataFrame:  # dim-free by construction: all arithmetic is zip_with folds
    """Approximate top-k via IVF: probe nprobe clusters, exact rerank."""
    centroids, index = build_ivf_index(corpus, id_col, vec_col, n_clusters)
    qv = queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("q_vec")
    )
    c = F.broadcast(
        centroids.groupBy().agg(
            F.collect_list(F.struct("cluster_id", "centroid")).alias("_cs")
        )
    )
    probes = qv.crossJoin(c).select(
        "query_id",
        "q_vec",
        F.explode(
            F.slice(
                F.array_sort(
                    F.transform(
                        F.col("_cs"),
                        lambda s: F.struct(
                            _sqdist(F.col("q_vec"), s["centroid"]).alias("d"),
                            s["cluster_id"].alias("cid"),
                        ),
                    )
                ),
                1,
                nprobe,
            )
        ).alias("p"),
    ).select("query_id", "q_vec", F.col("p.cid").alias("cluster"))
    cand = probes.join(index, "cluster").filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col("q_vec"), F.col("vec")), round_dp).alias("cos"),
    )
    return top_n_per_key(
        scored, "query_id", "cos", k, tiebreak="neighbor_id", desc=True
    ).orderBy("query_id", F.desc("cos"), "neighbor_id")
