"""Count-min sketch heavy hitters — engine-portable, integer-exact.

At 100 TB you cannot groupBy every distinct term to find the frequent
ones; a count-min sketch (Cormode & Muthukrishnan 2005) bounds the state
at depth·width counters regardless of vocabulary size, and the sketch
rows are map-combinable (partial aggregation on every executor, one
narrow merge). This implementation uses the repo's portable sha256-prefix
hash for the (row, key)→column mapping and pure integer counters, so the
exact same sketch — bit for bit — is computable in any engine with
sha256 (the DuckDB oracle replicates it; no float anywhere).

Reference relationship: the reference keeps Redis metric counters per
key (``utils/metrics.js``) — exact counting that works at web-app scale;
the sketch is the bounded-state scale analogue for unbounded key spaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ktpm___ocr_spark.functions.textstats import word_hash, words_array

CM_DEPTH = 4
CM_WIDTH = 512


def cm_col(key, row: int, width: int = CM_WIDTH) -> F.Column:
    """Column index of ``key`` in sketch row ``row`` — portable hash of
    'row|key' mod width (pmod keeps it non-negative in both engines)."""
    return F.pmod(
        word_hash(F.concat(F.lit(f"{row}|"), key)), F.lit(width)
    ).alias(f"c{row}")


def cm_sketch(
    df: DataFrame,
    key_col,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: (row, col, cnt) with cnt = Σweight of keys
    hashing to (row, col). One hash aggregate over |input| rows exploded
    ×depth; state is ≤ depth·width rows regardless of key cardinality."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        cm_col(key_col, r, width).alias("col"),
                        w.cast("long").alias("w"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("e")
    ).select("e.row", "e.col", "e.w")
    return rows.groupBy("row", "col").agg(F.sum("w").alias("cnt"))


def cm_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Point-estimate counts for a candidate key relation: for each key,
    min over sketch rows of the counter it hashes to (the classic CM
    upper bound: est ≥ true, est ≤ true + εN w.h.p.). The sketch is tiny
    (depth·width rows) — broadcast side of the equi-join.

    The join is LEFT with a coalesce-to-0: an absent (row, col) cell in
    the sparse sketch relation means its counter is 0, so a key the
    stream never saw estimates 0 (one output row per probed key, always)
    — an inner join would instead min over only the populated cells and
    overestimate, or drop the key entirely."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        cm_col(F.col(key_col), r, width).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key_col, "p.row", "p.col")
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_est"))
    )


def heavy_hitter_words(
    docs: DataFrame,
    text_col: str = "text",
    top_n: int = 20,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """End-to-end check: sketch the corpus word stream, then for the
    top-N words by TRUE count report (term, true_cnt, cm_est) — the
    CM guarantee est ≥ true holds for every row (tested). Candidate set =
    the true top-N (distributed TakeOrdered), so the probe relation stays
    tiny at any scale."""
    terms = docs.select(F.explode(words_array(F.col(text_col))).alias("term"))
    sketch = cm_sketch(terms, F.col("term"), depth, width)
    true_top = (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("term"))
        .limit(top_n)
    )
    est = cm_estimate(sketch, true_top.select("term"), "term", depth, width)
    return (
        true_top.join(est, "term")
        .select("term", "true_cnt", "cm_est")
        .orderBy(F.desc("true_cnt"), F.asc("term"))
    )
