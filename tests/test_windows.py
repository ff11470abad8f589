"""W1/W2/W4 + A4/A5 against the driver's events table (sf0.001),
cross-checked with pure-Python computations."""

from __future__ import annotations

import json
from collections import defaultdict

from ktpm___ocr_spark.operators.windows import (
    history_top_n,
    percentile_stats,
    rate_window_counts,
    success_failed_partition,
    top_n_per_key,
)


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_history_top_n_matches_python(spark, sf001_dir):
    ev = _events(spark, sf001_dir)
    got = history_top_n(ev, "user_id", "ts", limit=5, id_col="event_id")
    rows = ev.select("user_id", "ts", "event_id").collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append((r["ts"], r["event_id"]))
    want = {
        u: set(
            e for _, e in sorted(v, key=lambda x: (x[0], x[1]), reverse=True)[:5]
        )
        for u, v in by_user.items()
    }
    out = defaultdict(set)
    for r in got.collect():
        out[r["user_id"]].add(r["event_id"])
    assert dict(out) == {u: s for u, s in want.items()}


def test_history_limit_clamp(spark, sf001_dir):
    ev = _events(spark, sf001_dir)
    # limit=1000 clamps to 100 (server.js:500 semantics)
    got = history_top_n(ev, "user_id", "ts", limit=1000, id_col="event_id")
    per_user = got.groupBy("user_id").count().collect()
    assert all(r["count"] <= 100 for r in per_user)


def test_rate_window_counts_total(spark, sf001_dir):
    ev = _events(spark, sf001_dir)
    got = rate_window_counts(ev, "ts", "user_id")
    # windows partition all events exactly once
    assert got.agg({"n": "sum"}).first()[0] == ev.count()


def test_percentiles_match_numpy(spark, sf001_dir):
    import numpy as np

    ev = _events(spark, sf001_dir)
    got = percentile_stats(ev, "value").first()
    vals = np.array([r["value"] for r in ev.select("value").collect()])
    assert got["avg_value"] == round(float(np.mean(vals)), 4)
    assert got["p50"] == round(float(np.percentile(vals, 50)), 4)
    assert got["p95"] == round(float(np.percentile(vals, 95)), 4)


def test_success_failed_partition(spark, sf001_dir):
    ev = _events(spark, sf001_dir)
    n_err = ev.filter("event_type = 'error'").count()
    # deny-list form: 'error' rows are the rejected/failed leg
    got = {r["leg"]: r["n"] for r in
           success_failed_partition(ev, "event_type", fail_values=["error"]).collect()}
    assert got.get("failed", 0) == n_err
    assert got.get("success", 0) == ev.count() - n_err
    # allow-list form is the complement
    got2 = {r["leg"]: r["n"] for r in
            success_failed_partition(ev, "event_type", ok_values=["error"]).collect()}
    assert got2.get("success", 0) == n_err
    import pytest

    with pytest.raises(ValueError):
        success_failed_partition(ev, "event_type")


def test_json_props_parse(spark, sf001_dir):
    from pyspark.sql import functions as F

    ev = _events(spark, sf001_dir)
    got = ev.select(
        F.coalesce(F.from_json("props", "k int")["k"], F.lit(-1)).alias("k"), "props"
    ).collect()
    for r in got:
        want = json.loads(r["props"]).get("k", -1) if r["props"] else -1
        assert r["k"] == want


def test_binned_percentiles_within_bin_width(spark):
    import math

    from ktpm___ocr_spark.operators.windows import binned_percentiles

    rows = [(i % 3, float(i % 200) + 0.25) for i in range(2000)]
    df = spark.createDataFrame(rows, "grp int, value double")
    est = {
        r["grp"]: (r["p50_est"], r["p95_est"])
        for r in binned_percentiles(df, "value", "grp", lo=0.0, hi=200.0).collect()
    }
    bin_w = 200.0 / 1000
    for g in range(3):
        vals = sorted(v for gg, v in rows if gg == g)
        for p, got in zip((0.5, 0.95), est[g]):
            # estimate ≈ the discrete rank statistic (the value whose
            # cumulative count first reaches ceil(p·n)), within one bin
            discrete = vals[math.ceil(p * len(vals)) - 1]
            assert abs(got - discrete) <= bin_w + 1e-9, (g, p, got, discrete)


def test_binned_percentiles_clamps_outliers(spark):
    from ktpm___ocr_spark.operators.windows import binned_percentiles

    df = spark.createDataFrame(
        [(1, -50.0), (1, 9999.0), (1, 5.0)], "grp int, value double"
    )
    r = binned_percentiles(df, "value", "grp", lo=0.0, hi=10.0).first()
    assert 0.0 < r["p50_est"] <= 10.0  # median lands in-range
    assert r["p95_est"] == 10.0  # outlier clamped to the top edge


def test_cohort_retention_semantics(spark, tmp_path):
    """Pin cohort assignment, offset math, ret_ratio, and the
    cohort_size == offset-0 invariant on hand-built events (independent
    of the DuckDB oracle, which shares authorship with the query):
    - u1: first event day 0 (week 0), active weeks 0 and 2
    - u2: first event day 6 (week 0), active week 0 only
    - u3: first event day 8 (week 1), active weeks 1 and 2 (offset 0, 1)
    """
    import datetime

    import __spark_entry__ as em

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base + datetime.timedelta(days=0, hours=5), 1),
        (2, base + datetime.timedelta(days=15), 1),          # week 2
        (3, base + datetime.timedelta(days=6), 2),           # week 0
        (4, base + datetime.timedelta(days=8), 3),           # week 1
        (5, base + datetime.timedelta(days=8, hours=3), 3),  # same week
        (6, base + datetime.timedelta(days=16), 3),          # week 2
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, "view", 1.0, "{}") for i, ts, u in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    ev.write.parquet(f"{tmp_path}/events.parquet")
    got = {
        (r["cohort_week"], r["offset_week"]): (
            r["n_users"], r["cohort_size"], r["ret_ratio"]
        )
        for r in em.queries()["cohort_retention"](spark, str(tmp_path)).collect()
    }
    assert got == {
        (0, 0): (2, 2, 1.0),   # u1+u2 in cohort 0
        (0, 2): (1, 2, 0.5),   # only u1 returns in week 2
        (1, 0): (1, 1, 1.0),   # u3 in cohort 1
        (1, 1): (1, 1, 1.0),   # u3 active the next week
    }
