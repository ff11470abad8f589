"""Layout-block reading-order recovery — the geometric half of the
extraction pipeline.

BASELINE.json's north_star names "layout-block ordering" as a pipeline
stage: OCR/PDF segmentation emits blocks with page geometry but in
arbitrary (detector) order, and the extractor must recover the human
reading sequence before span re-stitching. The reference consumes its
OCR engine's implicit ordering (``backend/filters/ocrFilter.js``); this
operator makes the ordering step explicit and geometry-driven, the way a
layout parser needs at scale.

Algorithm: one recursive level of the classic XY-cut (Nagy & Seth 1984)
— per document, find the widest vertical whitespace channel between
block x-extents; if it is at least ``min_gap`` wide, the page is
two-column (read all of the left column, then all of the right),
otherwise single-column; within a column, blocks read top-to-bottom then
left-to-right. Full XY-cut recurses; one level covers the dominant
1-vs-2-column web/PDF case and keeps every step a window expression.

Portability: pure integer geometry — no floats anywhere (column
membership compares 2·x_center against 2·cut), so the DuckDB oracle is
bit-exact by construction.

Shape at 100 TB: every window partitions by ``doc_id`` — no global sort,
no unpartitioned window — and the per-doc cut is an argmax computed IN
the window layer (``first`` over the gap-ordered full frame), not a
separate relation joined back: the whole operator is ONE hash Exchange
on the doc key, one scan, zero joins (plan pinned by
``tests/test_layout.py::test_plan_one_exchange_for_all_windows``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def reading_order(
    blocks: DataFrame,
    doc_col: str = "doc_id",
    min_gap: int = 40,
) -> DataFrame:
    """Recover reading order for ``(doc_id, block_id, x0, y0, w, h,
    text)`` block relations; returns the input plus ``col`` (0 = left /
    single, 1 = right) and ``rank`` (1-based reading position).

    The vertical cut is the argmax whitespace gap: blocks sorted by
    ``x0``, gap = ``x0 − max(x1 of all blocks further left)``; ties on
    gap break by (x0, block_id) so the cut is deterministic.
    """
    d = F.col(doc_col)
    x1 = F.col("x0") + F.col("w")
    scan = Window.partitionBy(d).orderBy("x0", "block_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    g = blocks.withColumn("_rm", F.max(x1).over(scan)).withColumn(
        "_gap", F.col("x0") - F.col("_rm")
    )
    # Per-doc argmax WITHOUT a self-join: ``first`` over the gap-ordered
    # full frame hands every row the winning (gap, x0) pair; a sub-
    # min_gap (or all-NULL) winner means "no cut" -> NULL cut_x.
    pick = (
        Window.partitionBy(d)
        .orderBy(F.desc_nulls_last("_gap"), F.asc("x0"), F.asc("block_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    best = F.first(
        F.struct(F.col("_gap").alias("g"), F.col("x0").alias("x"))
    ).over(pick)
    with_col = (
        g.withColumn(
            "_cut_x", F.when(best["g"] >= min_gap, best["x"])
        )
        .withColumn(
            "col",
            F.when(F.col("_cut_x").isNull(), F.lit(0))
            .when(
                F.col("x0") * 2 + F.col("w") < F.col("_cut_x") * 2, F.lit(0)
            )
            .otherwise(F.lit(1)),
        )
        .drop("_rm", "_gap", "_cut_x")
    )
    order = Window.partitionBy(d).orderBy("col", "y0", "x0", "block_id")
    return with_col.withColumn("rank", F.row_number().over(order))
