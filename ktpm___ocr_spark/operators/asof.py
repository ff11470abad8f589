"""As-of and range joins — Spark lacks native forms; these are the
canonical scalable formulations.

The reference has no joins at all beyond point-lookup memoization
(SURVEY §2.4 note: "no sort-merge/range/as-of/interval joins anywhere"),
but a corpus/analytics engine needs them; they're first-class here.

* ``as_of_join`` — "latest right row at or before each left row" via the
  union+window trick: tag both sides, union, one window pass per key
  ordered by (ts, side) carrying the last non-null right value forward.
  ONE shuffle on the key, no range cross-product, no per-group Python —
  scales like a groupBy. (The ``applyInPandas`` + ``merge_asof``
  alternative needs whole-group materialization; this doesn't.)
* ``range_join`` — equi-join on (key, time-bucket) with the right side
  exploded to adjacent buckets, then an exact interval filter. Candidate
  space is |pairs within bucket width|, never |L|×|R|; bucket width tunes
  the tradeoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: dict[str, str],
    how: str = "left",
) -> DataFrame:
    """For each left row: the most recent right row with
    ``right_ts <= left_ts`` in the same key group (backward as-of).

    right_vals maps output column name → right column. Equal timestamps
    match (right sorts before left at the same instant).
    """
    if how != "left":
        raise ValueError("only left as-of supported")
    l_tag = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    for out in right_vals:
        l_tag = l_tag.withColumn(out, F.lit(None).cast(right.schema[right_vals[out]].dataType))
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(src).alias(out) for out, src in right_vals.items()],
    )
    for c in l_tag.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None))
    u = l_tag.unionByName(r_tag.select(l_tag.columns))
    # Deterministic tiebreak: multiple right rows sharing (key, ts) sort by
    # their value columns ascending, so last(ignorenulls) always picks the
    # MAX right value at a tied instant — stable across runs/partitionings.
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side", *[F.asc_nulls_first(out) for out in right_vals])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for out in right_vals:
        u = u.withColumn(out, F.last(out, ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).drop("_ts", "_side")


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    right_vals: dict[str, str],
) -> DataFrame:
    """All (left, right) pairs in the same key group with
    ``left_ts + lower_s <= right_ts <= left_ts + upper_s``.

    Implemented as a bucketed equi-join: right rows land in buckets of
    width = interval span; each right row is emitted into every bucket
    its match window can touch, then the exact predicate filters.
    """
    width = max(upper_s - lower_s, 1)
    l_b = left.withColumn(
        "_bucket",
        F.floor((F.unix_timestamp(F.col(left_ts)) + lower_s) / width).cast("long"),
    )
    r_eps = right.select(
        F.col(key),
        F.col(right_ts).alias("_rts"),
        *[F.col(src).alias(out) for out, src in right_vals.items()],
    ).withColumn(
        "_bucket",
        F.explode(
            F.array(
                F.floor(F.unix_timestamp(F.col("_rts")) / width).cast("long"),
                F.floor(F.unix_timestamp(F.col("_rts")) / width).cast("long") - 1,
            )
        ),
    )
    joined = l_b.join(r_eps, [key, "_bucket"])
    # exact (microsecond) interval predicate; buckets above only prune
    lo = F.col(left_ts) + F.expr(f"INTERVAL {lower_s} SECONDS")
    hi = F.col(left_ts) + F.expr(f"INTERVAL {upper_s} SECONDS")
    return (
        joined.filter((F.col("_rts") >= lo) & (F.col("_rts") <= hi))
        .drop("_bucket")
        .withColumnRenamed("_rts", f"{right_ts}_right")
    )
