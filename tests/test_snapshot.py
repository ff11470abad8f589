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
    """The sha2 projections must sit BELOW the full-outer join in the
    optimized tree (children print under their parent), i.e. each side
    is reduced to (id, sha) before any join/exchange — a regression
    that joined payloads and hashed afterwards would print its
    sha2-Project ABOVE the Join line and fail the ordering assertion.
    (Asserting on the Join line's own text is vacuous: logical Join
    nodes never print child output columns.)"""
    old = _df(spark, [(1, "a" * 1000)])
    new = _df(spark, [(1, "b" * 1000)])
    lines = (
        snapshot_diff(old, new)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
        .splitlines()
    )
    join_idx = [i for i, ln in enumerate(lines) if "Join FullOuter" in ln]
    assert join_idx, lines
    sha_idx = [i for i, ln in enumerate(lines) if "sha2(" in ln]
    # both sides hash below (= inside the children of) the join; none above
    assert len(sha_idx) >= 2 and all(i > join_idx[0] for i in sha_idx), lines
