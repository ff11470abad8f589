"""Unit tests for corpus snapshot diff (operators/snapshot.py)."""

from __future__ import annotations

from ktpm___ocr_spark.operators.snapshot import snapshot_diff


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_snapshot_diff_classes(spark):
    old = _df(spark, [(1, "a"), (2, "b"), (3, "c"), (4, None), (5, "e")])
    new = _df(spark, [(1, "a"), (2, "B!"), (4, ""), (6, "f")])
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {
        2: "changed",   # text differs
        3: "removed",
        5: "removed",
        4: "changed",   # NULL -> '' must register (sentinel hash)
        6: "added",
    }
    # doc 1 unchanged -> absent


def test_snapshot_diff_identical_snapshots_empty(spark):
    old = _df(spark, [(1, "a"), (2, None)])
    assert snapshot_diff(old, old).count() == 0


def test_snapshot_diff_plan_shuffles_hashes_not_payloads(spark):
    """The join input must be the 2-column (id, sha) projections — the
    text column may not survive past the hash projection into the
    exchange."""
    old = _df(spark, [(1, "a" * 1000)])
    new = _df(spark, [(1, "b" * 1000)])
    plan = (
        snapshot_diff(old, new)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    import re

    for ln in plan.splitlines():
        if "Join" in ln:
            assert "text" not in ln
    # the projections feeding the join carry only id + sha
    assert "sha2" in plan
    assert "CartesianProduct" not in plan
