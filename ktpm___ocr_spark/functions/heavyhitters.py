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


# ---------------- Misra–Gries (deterministic complement) ----------------
#
# Count-min answers "how frequent is this key?" with a probabilistic
# overestimate; Misra–Gries (Misra & Gries 1982, "Finding repeated
# elements") answers "which keys are frequent?" with a DETERMINISTIC
# guarantee: an m-counter summary over a stream of n items reports every
# key with true count > n/(m+1), and each reported counter is within
# [true − n/(m+1), true]. Summaries are mergeable with the same additive
# error bound (Agarwal et al. 2012, "Mergeable summaries"), which is what
# makes the operator distributed: per-partition streaming folds (bounded
# state: m counters per task, any arrival order), one tiny merge, then an
# exact recount of the ≤m surviving candidates.

MG_CAPACITY = 256


def mg_partition_summaries(
    terms: DataFrame, term_col: str = "term", m: int = MG_CAPACITY
) -> DataFrame:
    """Per-input-partition Misra–Gries fold → (term, cnt) rows, ≤ m per
    partition. mapInPandas streams Arrow batches through a dict of at
    most m counters — state is O(m) no matter how large the partition,
    and no ordering is assumed (the guarantee is order-free)."""

    def fold(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for t in pdf[term_col]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < m:
                    counters[t] = 1
                else:
                    # decrement-all: O(m) per trigger, ≤ n/m triggers → O(n)
                    dead = []
                    for k in counters:
                        counters[k] -= 1
                        if counters[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counters[k]
        if counters:
            yield pd.DataFrame(
                {"term": list(counters), "cnt": list(counters.values())}
            )

    return terms.mapInPandas(fold, schema="term string, cnt long")


def mg_merge(summaries: DataFrame, m: int = MG_CAPACITY) -> DataFrame:
    """Merge per-partition summaries back to capacity m: sum counters per
    term, subtract the (m+1)-th largest combined counter from all, keep
    the positive remainder (the Agarwal et al. merge — re-capping costs
    one more additive n/(m+1) error term). The summed relation is at most
    m · #partitions rows — tiny; offset is a 1-row broadcast."""
    combined = summaries.groupBy("term").agg(F.sum("cnt").alias("cnt"))
    # (m+1)-th largest combined counter (0 when ≤ m terms survive).
    # TakeOrdered (orderBy+limit), NOT a global window: the combined
    # relation is m·#partitions rows — at 100k input partitions a
    # no-partition row_number would push 25M rows through one task,
    # while limit(m+1) keeps per-task state at m+1 everywhere.
    top = combined.orderBy(F.desc("cnt"), F.asc("term")).limit(m + 1)
    off = top.agg(
        F.coalesce(
            F.when(F.count(F.lit(1)) == m + 1, F.min("cnt")), F.lit(0)
        ).alias("_off")
    )
    return (
        combined.crossJoin(F.broadcast(off))
        .select("term", (F.col("cnt") - F.col("_off")).alias("cnt"))
        .filter(F.col("cnt") > 0)
    )


def mg_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    top_n: int = 20,
    m: int = MG_CAPACITY,
) -> DataFrame:
    """Two-pass deterministic heavy hitters: MG candidates (bounded state
    everywhere), then an EXACT recount of the ≤m survivors via a
    broadcast semi-join, then top-n by (count desc, term asc).

    The final output is exactly the true top-n whenever the n-th true
    count exceeds the summary's additive error (≈ 2n_items/(m+1) after
    one merge) — the margin the tests assert on zipf-ish text. That makes
    the whole operator oracle-checkable by a plain exact top-n SQL while
    every distributed piece stays bounded-state."""
    terms = docs.select(F.explode(words_array(F.col(text_col))).alias("term"))
    candidates = mg_merge(mg_partition_summaries(terms, "term", m), m)
    exact = (
        terms.join(F.broadcast(candidates.select("term")), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return exact.orderBy(F.desc("n"), F.asc("term")).limit(top_n)
