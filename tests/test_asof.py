"""As-of and range joins vs pure-Python reference computations."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from ktpm___ocr_spark.operators.asof import as_of_join, range_join


@pytest.fixture(scope="module")
def events(spark, sf001_dir):
    ev = spark.read.parquet(f"{sf001_dir}/events.parquet")
    ev.cache().count()
    return ev


def test_as_of_join_matches_python(spark, events):
    clicks = events.filter("event_type = 'click'")
    errors = events.filter("event_type = 'error'")
    got = as_of_join(
        clicks,
        errors,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_vals={"prev_err_id": "event_id", "prev_err_val": "value"},
    )
    rows = {r["event_id"]: (r["prev_err_id"], r["prev_err_val"]) for r in got.collect()}

    errs = defaultdict(list)
    for r in errors.collect():
        errs[r["user_id"]].append((r["ts"], r["event_id"], r["value"]))
    for v in errs.values():
        v.sort()
    want = {}
    for c in clicks.collect():
        cand = [e for e in errs.get(c["user_id"], []) if e[0] <= c["ts"]]
        want[c["event_id"]] = (cand[-1][1], cand[-1][2]) if cand else (None, None)
    assert rows == want
    assert got.count() == clicks.count()  # left join: every click kept


def test_as_of_equal_timestamp_matches(spark):
    import datetime

    t = datetime.datetime(2024, 1, 1, 0, 0, 0)
    left = spark.createDataFrame([(1, t, 10)], "id long, ts timestamp, k long")
    right = spark.createDataFrame([(2, t, 10)], "rid long, ts timestamp, k long")
    got = as_of_join(
        left, right, key="k", left_ts="ts", right_ts="ts", right_vals={"rid_out": "rid"}
    ).first()
    assert got["rid_out"] == 2  # right at the same instant matches (<=)


def test_range_join_matches_python(spark, events):
    clicks = events.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    errors = events.filter("event_type = 'error'").select(
        "event_id", "user_id", "ts"
    )
    got = range_join(
        clicks,
        errors,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        lower_s=-300,
        upper_s=300,
        right_vals={"err_id": "event_id"},
    )
    pairs = {(r["event_id"], r["err_id"]) for r in got.collect()}

    import datetime

    errs = defaultdict(list)
    for r in errors.collect():
        errs[r["user_id"]].append((r["ts"], r["event_id"]))
    want = set()
    d = datetime.timedelta(seconds=300)
    for c in clicks.collect():
        for ets, eid in errs.get(c["user_id"], []):
            if c["ts"] - d <= ets <= c["ts"] + d:
                want.add((c["event_id"], eid))
    assert pairs == want
    assert len(pairs) > 0
