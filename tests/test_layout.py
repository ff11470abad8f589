"""Unit tests for layout-block reading-order recovery (one-level
XY-cut, ktpm___ocr_spark/operators/layout.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ktpm___ocr_spark.operators.layout import reading_order


def _blocks(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, block_id long, x0 int, y0 int, w int, h int, text string"
    )


def test_two_column_page_reads_left_then_right(spark):
    """Blocks interleaved by y across a 50-px whitespace channel must
    come back left-column-first regardless of input/detector order."""
    rows = [
        # right column first in input order — detector order is arbitrary
        (1, 10, 400, 0, 350, 40, "R0"),
        (1, 11, 400, 50, 350, 40, "R1"),
        (1, 0, 0, 0, 350, 40, "L0"),
        (1, 1, 0, 50, 350, 40, "L1"),
        (1, 2, 0, 100, 350, 40, "L2"),
    ]
    got = (
        reading_order(_blocks(spark, rows), min_gap=40)
        .orderBy("rank")
        .select("text", "col", "rank")
        .collect()
    )
    assert [r["text"] for r in got] == ["L0", "L1", "L2", "R0", "R1"]
    assert [r["col"] for r in got] == [0, 0, 0, 1, 1]
    assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]


def test_narrow_gap_stays_single_column(spark):
    """A whitespace channel below min_gap must NOT split: reading order
    is pure top-to-bottom (then x) across the whole page."""
    rows = [
        (1, 0, 0, 0, 100, 40, "A"),
        (1, 1, 130, 0, 100, 40, "B"),  # gap = 130-100 = 30 < 40
        (1, 2, 0, 50, 100, 40, "C"),
        (1, 3, 130, 50, 100, 40, "D"),
    ]
    got = (
        reading_order(_blocks(spark, rows), min_gap=40)
        .orderBy("rank")
        .select("text", "col")
        .collect()
    )
    assert [r["text"] for r in got] == ["A", "B", "C", "D"]
    assert {r["col"] for r in got} == {0}


def test_widest_gap_wins_and_midpoint_assignment(spark):
    """With two candidate channels the cut lands on the WIDEST one, and
    column membership is by block x-midpoint vs the cut (integer-exact:
    2*mid vs 2*cut)."""
    rows = [
        (1, 0, 0, 0, 100, 40, "a"),
        (1, 1, 150, 0, 100, 40, "b"),  # gap 50 at x0=150
        (1, 2, 370, 0, 100, 40, "c"),  # gap 120 at x0=370 -> the cut
        (1, 3, 370, 50, 100, 40, "d"),
    ]
    got = {
        r["text"]: r["col"]
        for r in reading_order(_blocks(spark, rows), min_gap=40).collect()
    }
    assert got == {"a": 0, "b": 0, "c": 1, "d": 1}


def test_per_doc_independence_and_determinism(spark):
    """Docs are cut independently (one two-column, one single-column in
    the same relation) and repeated runs are bit-identical."""
    rows = [
        (1, 0, 0, 0, 350, 40, "1L"),
        (1, 1, 400, 0, 350, 40, "1R"),
        (2, 0, 0, 0, 100, 40, "2A"),
        (2, 1, 0, 50, 100, 40, "2B"),
    ]
    df = _blocks(spark, rows)
    a = sorted(map(tuple, reading_order(df, min_gap=40).collect()))
    b = sorted(map(tuple, reading_order(df, min_gap=40).collect()))
    assert a == b
    cols = {
        (r[0], r[-2]) for r in a  # (doc_id, col)
    }
    assert (1, 0) in cols and (1, 1) in cols
    assert {c for d, c in cols if d == 2} == {0}


def test_single_block_and_empty_doc_edge_cases(spark):
    """One-block docs never split (the running max over 0 preceding rows
    is NULL -> gap NULL -> desc_nulls_last keeps it cut-less)."""
    rows = [(1, 0, 400, 0, 350, 40, "only")]
    got = reading_order(_blocks(spark, rows), min_gap=40).collect()
    assert len(got) == 1
    assert got[0]["col"] == 0 and got[0]["rank"] == 1


def test_plan_one_exchange_for_all_windows(spark):
    """Every window step keys on doc_id and the cut is an in-window
    argmax (no join back): the whole operator must be exactly ONE hash
    Exchange and one scan — no join operator at all. At 100 TB this is
    the difference between one network pass and four."""
    rows = [(1, 0, 0, 0, 350, 40, "L"), (1, 1, 400, 0, 350, 40, "R")]
    plan = (
        reading_order(_blocks(spark, rows), min_gap=40)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    for join_op in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert join_op not in plan, plan
