"""Distribution-drift detection between corpus splits.

A training pipeline needs to know that val/test marginals match train
(hash-splitting guarantees it statistically; a bug in filtering or
dedup-before-split breaks it silently). This compares the per-split
log2 document-length histograms and reports the L1 (total-variation ×2)
distance — the standard cheap drift score over binned marginals.

Portability: bin ids and counts are integers; proportions are IEEE
double divisions (exactly specified, engine-independent); the L1 sum
casts each |diff| to DECIMAL after rounding so the summation is exact
and order-independent (the repo's decimal-sum rule).

Physical shape: one hash aggregate to (split, bin) — thousands of rows
at ANY corpus size — then a tiny self-join; nothing downstream of the
first aggregate scales with the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def log2_bin(n) -> F.Column:
    """Integer log2 bin of a positive count: length of its binary
    rendering (exact integer arithmetic — same trick as the HLL rho)."""
    return F.length(F.bin(n)).cast("long")


def split_length_histogram(
    df: DataFrame, split_col: str = "split", length_col: str = "n_chars"
) -> DataFrame:
    """(split, bin, n) — per-split log2-length histogram; rows with
    NULL or non-positive length are excluded (log2 undefined)."""
    return (
        df.filter(F.col(length_col) > 0)
        .select(F.col(split_col), log2_bin(F.col(length_col)).alias("bin"))
        .groupBy(split_col, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def drift_bins(
    df: DataFrame,
    split_a: str = "train",
    split_b: str = "val",
    split_col: str = "split",
    length_col: str = "n_chars",
) -> DataFrame:
    """Per-bin comparison table: (bin, n_a, n_b, p_a, p_b, absdiff),
    full-outer over bins so a bin present in only one split still
    contributes its whole mass."""
    h = split_length_histogram(df, split_col, length_col)
    tot = h.groupBy(split_col).agg(F.sum("n").alias("tot"))
    p = h.join(tot, split_col).select(
        split_col, "bin", "n", (F.col("n") / F.col("tot")).alias("p")
    )
    a = p.filter(F.col(split_col) == split_a).select(
        "bin", F.col("n").alias("n_a"), F.col("p").alias("p_a")
    )
    b = p.filter(F.col(split_col) == split_b).select(
        "bin", F.col("n").alias("n_b"), F.col("p").alias("p_b")
    )
    return a.join(b, "bin", "full_outer").select(
        "bin",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
        F.round(F.coalesce("p_a", F.lit(0.0)), 6).alias("p_a"),
        F.round(F.coalesce("p_b", F.lit(0.0)), 6).alias("p_b"),
        F.round(
            F.abs(F.coalesce("p_a", F.lit(0.0)) - F.coalesce("p_b", F.lit(0.0))), 6
        ).alias("absdiff"),
    )


def drift_l1(
    df: DataFrame,
    split_a: str = "train",
    split_b: str = "val",
    split_col: str = "split",
    length_col: str = "n_chars",
) -> DataFrame:
    """Single row (l1_distance, n_bins): Σ|p_a − p_b| over the bin union.
    0 = identical marginals, 2 = disjoint support. Decimal-cast terms
    make the sum exact and order-independent."""
    bins = drift_bins(df, split_a, split_b, split_col, length_col)
    return bins.agg(
        F.sum(F.col("absdiff").cast("decimal(18,6)"))
        .cast("double")
        .alias("l1_distance"),
        F.count(F.lit(1)).alias("n_bins"),
    )
