"""IVF ANN: index shape, determinism, recall vs brute force."""

from __future__ import annotations

import pytest

from ktpm___ocr_spark.operators.ivf import build_ivf_index, ivf_topk
from ktpm___ocr_spark.operators.similarity import brute_force_topk


@pytest.fixture(scope="module")
def emb(spark, sf001_dir):
    df = spark.read.parquet(f"{sf001_dir}/embeddings.parquet")
    df.cache().count()
    return df


def test_index_covers_corpus(spark, emb):
    centroids, index = build_ivf_index(emb, k=8)
    assert centroids.count() <= 8
    assert index.count() == emb.count()
    # every vector lands in exactly one existing cluster
    cids = {r["cluster_id"] for r in centroids.collect()}
    assert {r["cluster"] for r in index.select("cluster").distinct().collect()} <= cids


def test_ivf_deterministic(spark, emb):
    q = emb.orderBy("vec_id").limit(4)
    a = [tuple(r) for r in ivf_topk(emb, q, k=3).collect()]
    b = [tuple(r) for r in ivf_topk(emb.repartition(5), q, k=3).collect()]
    assert a == b


def test_ivf_recall_with_full_probe(spark, emb):
    """nprobe == n_clusters degenerates to exact search — recall 1.0."""
    q = emb.orderBy("vec_id").limit(6)
    exact = {(r["query_id"], r["neighbor_id"]) for r in brute_force_topk(emb, q, k=5).collect()}
    full = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, q, k=5, n_clusters=4, nprobe=4).collect()
    }
    assert full == exact


def test_ivf_partial_probe_recall(spark, emb):
    q = emb.orderBy("vec_id").limit(6)
    exact = {(r["query_id"], r["neighbor_id"]) for r in brute_force_topk(emb, q, k=5).collect()}
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, q, k=5, n_clusters=8, nprobe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall
