"""Corpus snapshot diff — the audit step between two ingestion runs.

A 100 TB training corpus is rebuilt incrementally (new crawl increments,
re-extraction after pipeline fixes); before promoting a new snapshot the
pipeline diffs it against the previous one: which documents were added,
removed, or changed, and how large each class is. The reference's
history/versioning plane keeps per-item payloads for exactly this kind
of audit (``backend/controllers/historyController.js``); this operator
is the corpus-level generalization.

Shape at 100 TB: both sides reduce to ``(id, sha256)`` BEFORE the join —
the full-outer join shuffles 2 columns of fixed width, never document
payloads; the diff classes come from null-pattern CASEs on the joined
relation. One shuffle per side on the id key; content comparison is by
hash, so a changed 10 MB document costs the same as a changed 1 KB one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document diff between two corpus snapshots.

    Returns ``(doc_id, status)`` for every non-identical document —
    ``added`` (only in new), ``removed`` (only in old), ``changed``
    (both sides, different sha256(text)); unchanged docs are dropped.
    The hash input namespaces NULL ('N') apart from real text
    ('T' || text), so the NULL marker is UNREACHABLE by any document
    content and NULL→'' edits register as changes.
    """

    def keyed(df: DataFrame, side: str) -> DataFrame:
        marked = (
            F.when(F.col(text_col).isNull(), F.lit("N"))
            .otherwise(F.concat(F.lit("T"), F.col(text_col)))
        )
        return df.select(
            F.col(id_col), F.sha2(marked, 256).alias(f"_sha_{side}")
        )

    o = keyed(old, "old")
    n = keyed(new, "new")
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("_sha_old").isNull(), F.lit("added"))
        .when(F.col("_sha_new").isNull(), F.lit("removed"))
        .when(F.col("_sha_old") != F.col("_sha_new"), F.lit("changed"))
    )
    return (
        j.select(F.col(id_col), status.alias("status"))
        .filter(F.col("status").isNotNull())
    )
