"""Ranking windows, retention caps, time windows, percentile stats.

Reference behaviors (SURVEY §2.6, §2.5):

* W1 history top-N: newest-first per owner, limit min(100, ?limit ?? 50)
  (``backend/utils/history.js:23,40``, ``server.js:500``);
* W2 retention cap: keep the 200 most recent per owner
  (``history.js:6,24`` — ``lTrim(0,199)``);
* W4 rate-limit window: ≤ max requests per key per 60 s
  (``middleware/globalLimiter.js:8-16``, ``taskLimiter.js:5-15``);
* A5 benchmark stats: avg / p50 / p95 of response times
  (``backend/test/imgTest/2.json``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HISTORY_RETENTION = 200  # history.js:6
HISTORY_DEFAULT_LIMIT = 50  # server.js:500
HISTORY_MAX_LIMIT = 100


def top_n_per_key(
    df: DataFrame,
    key: str,
    order_col: str,
    n: int,
    tiebreak: str | None = None,
    desc: bool = True,
) -> DataFrame:
    """W1/W2: rank within key (deterministic tiebreak) and keep top-N.

    The physical plan is one shuffle on ``key`` + an in-partition sort —
    rank never crosses partitions, so this scales with the number of
    distinct keys, not total rows.
    """
    order = [F.desc(order_col) if desc else F.asc(order_col)]
    if tiebreak:
        order.append(F.desc(tiebreak) if desc else F.asc(tiebreak))
    w = Window.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .drop("rn")
    )


def history_top_n(
    df: DataFrame, owner: str, ts: str, limit: int | None = None, id_col: str | None = None
) -> DataFrame:
    """W1 with the reference's limit clamp: min(100, ?limit ?? 50)."""
    n = min(HISTORY_MAX_LIMIT, limit if limit is not None else HISTORY_DEFAULT_LIMIT)
    return top_n_per_key(df, owner, ts, n, tiebreak=id_col, desc=True)


def history_items(
    df: DataFrame,
    owner: str = "owner",
    ts: str = "ts",
    original_name: str = "original_name",
    filename: str = "filename",
    mime: str = "mime",
    output: str = "output",
    retention: int = HISTORY_RETENTION,
) -> DataFrame:
    """S7 history *item* sink — the reference's per-user durable payload
    (``utils/history.js:13-29``: ``{id, ts, owner, originalName, filename,
    mime, outputBase64}``), retention-capped to the newest ``retention``
    per owner (``history.js:6,24`` — ``lTrim(0,199)``).

    The reference's ``id`` is a uuid; the batch engine derives it
    content-addressed (sha256 of owner␟filename␟ts) so re-runs are
    idempotent — same conversion, same history row. ``outputBase64`` is
    canonical unwrapped base64 (Spark MIME-wraps at 76 chars; stripped).
    """
    b64 = F.regexp_replace(F.base64(F.col(output)), "\r\n", "")
    # id hashes epoch SECONDS (not a rendered timestamp string) so the
    # identity is engine/timezone-format independent
    items = df.select(
        F.sha2(
            F.concat_ws(
                "\x1f",
                F.col(owner),
                F.col(filename),
                F.col(ts).cast("long").cast("string"),
            ),
            256,
        ).alias("id"),
        F.col(ts).alias("ts"),
        F.col(owner).alias("owner"),
        F.col(original_name).alias("original_name"),
        F.col(filename).alias("filename"),
        F.col(mime).alias("mime"),
        b64.alias("output_b64"),
    )
    w = Window.partitionBy("owner").orderBy(F.desc("ts"), F.desc("id"))
    return (
        items.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= retention)
        .drop("rn")
    )


def rate_window_counts(
    df: DataFrame, ts: str, key: str, window: str = "60 seconds"
) -> DataFrame:
    """W4: requests per key per tumbling window; flags over-limit windows
    the way the limiter would 429 them."""
    return df.groupBy(F.window(F.col(ts), window).alias("w"), F.col(key)).agg(
        F.count("*").alias("n")
    ).select(
        F.col("w.start").alias("window_start"),
        F.col(key),
        F.col("n"),
    )


def percentile_stats(
    df: DataFrame, value: str, by: str | None = None
) -> DataFrame:
    """A5: avg / p50 / p95 (exact percentiles with linear interpolation —
    matches ANSI ``quantile_cont``; ``percentile_approx`` is the scale
    variant, swapped in by callers at the 100 TB point where exact
    percentiles would require a global sort)."""
    aggs = [
        F.round(F.avg(value), 4).alias("avg_value"),
        F.round(F.percentile(value, 0.5), 4).alias("p50"),
        F.round(F.percentile(value, 0.95), 4).alias("p95"),
        F.count("*").alias("n"),
    ]
    return df.groupBy(by).agg(*aggs) if by else df.agg(*aggs)


def success_failed_partition(
    df: DataFrame,
    status_col: str,
    ok_values: list[str] | None = None,
    fail_values: list[str] | None = None,
) -> DataFrame:
    """A4: split results into success/failed legs and count them — the
    reference's ``Promise.allSettled`` partition (``server.js:472-489``).

    Exactly one of ``ok_values`` (allow-list → success) or ``fail_values``
    (deny-list → failed, everything else succeeds — the allSettled shape:
    a row is 'failed' iff it rejected) must be given.
    """
    if (ok_values is None) == (fail_values is None):
        raise ValueError("pass exactly one of ok_values / fail_values")
    if fail_values is not None:
        is_ok = ~F.col(status_col).isin(*fail_values)
    else:
        is_ok = F.col(status_col).isin(*ok_values)
    return (
        df.withColumn(
            "leg", F.when(is_ok, F.lit("success")).otherwise(F.lit("failed"))
        )
        .groupBy("leg")
        .agg(F.count("*").alias("n"))
    )


def binned_percentiles(
    df: DataFrame,
    value: str,
    by: str,
    lo: float,
    hi: float,
    n_bins: int = 1000,
    ps: tuple[float, ...] = (0.5, 0.95),
) -> DataFrame:
    """Histogram-sketch percentiles — the 100 TB path exact
    ``percentile()`` can't take (it needs per-group sorted values; this
    needs one map-side-combinable count per (group, bin), state = n_bins
    ints).

    Unlike ``percentile_approx`` (t-digest: sketch internals are
    engine-specific), fixed-width bins over [lo, hi] give bit-identical
    estimates in any engine, so the result is oracle-checkable. Estimate
    for p = upper edge of the first bin where the cumulative count
    reaches ceil(p·n) — error ≤ one bin width. Values outside [lo, hi]
    clamp to the edge bins.
    """
    w = (hi - lo) / n_bins
    b = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((F.col(value) - lo) / w)),
    ).cast("long")
    # NULLs must be excluded, not binned: greatest(0, floor(NULL)) is 0 in
    # both engines, which would count NULL measurements as the minimum
    hist = (
        df.filter(F.col(value).isNotNull())
        .groupBy(F.col(by), b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cum = hist.select(
        by,
        "bin",
        "c",
        F.sum("c").over(Window.partitionBy(by).orderBy("bin")).alias("cum"),
        F.sum("c").over(Window.partitionBy(by)).alias("total"),
    )
    edge = F.lit(lo) + (F.col("bin") + 1) * F.lit(w)
    aggs = [
        F.round(
            F.min(
                F.when(F.col("cum") >= F.ceil(F.lit(p) * F.col("total")), edge)
            ),
            6,
        ).alias(f"p{int(p * 100)}_est")
        for p in ps
    ]
    return cum.groupBy(by).agg(*aggs, F.max("total").alias("n"))
