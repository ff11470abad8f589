"""ANN over the driver's embeddings table: brute force vs numpy exact;
LSH variant self-consistency; embedding near-dups."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ktpm___ocr_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dups,
    lsh_topk,
)

K = 5
N_QUERIES = 8


@pytest.fixture(scope="module")
def emb(spark, sf001_dir):
    df = spark.read.parquet(f"{sf001_dir}/embeddings.parquet")
    df.cache().count()
    return df


def _numpy_topk(rows, query_ids, k):
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    want = {}
    for qid in query_ids:
        qi = int(np.where(ids == qid)[0][0])
        cos = normed @ normed[qi]
        cand = [
            (round(float(c), 5), int(i))
            for c, i in zip(cos, ids)
            if i != qid
        ]
        cand.sort(key=lambda t: (-t[0], t[1]))
        want[qid] = [(i, c) for c, i in cand[:k]]
    return want


def test_brute_force_matches_numpy(spark, emb):
    queries = emb.orderBy("vec_id").limit(N_QUERIES)
    qids = [r["vec_id"] for r in queries.select("vec_id").collect()]
    got = brute_force_topk(emb, queries, k=K).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["neighbor_id"], r["cos"]))
    want = _numpy_topk(emb.collect(), qids, K)
    assert by_q == want


def test_lsh_topk_is_subset_with_decent_recall(spark, emb):
    queries = emb.orderBy("vec_id").limit(N_QUERIES)
    exact = brute_force_topk(emb, queries, k=K).collect()
    approx = lsh_topk(emb, queries, k=K, n_planes=4, n_tables=16).collect()
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx}
    # approx neighbors carry true cosine values, and recall is high at
    # the H=4/L=16 operating point (0.95 measured offline on this table)
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.7, recall
    cos_lookup = {
        (r["query_id"], r["neighbor_id"]): r["cos"] for r in exact
    }
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in cos_lookup:
            assert abs(r["cos"] - cos_lookup[key]) < 1e-9


def test_embedding_near_dups_finds_planted_pair(spark, emb):
    # plant an exact duplicate vector with a new id
    row = emb.orderBy("vec_id").first()
    dup = spark.createDataFrame(
        [(999999, row["embedding"], row["label"])], emb.schema
    )
    got = embedding_near_dups(emb.unionByName(dup), threshold=0.999).collect()
    pairs = {(r["id_a"], r["id_b"]): r["cos"] for r in got}
    assert (row["vec_id"], 999999) in pairs
    assert pairs[(row["vec_id"], 999999)] == 1.0
