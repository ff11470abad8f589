"""C1–C3 chunk/explode/re-stitch — boundary goldens + round trips.

Boundary cases per the reference's 4500-char vendor limit
(``utils/translate.js:110-116``): 4499/4500/4501/9001. Also pins the
intent-vs-defect decision for ``translate.js:185`` (SURVEY §2.3 note).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ktpm___ocr_spark.functions.chunking import (
    CHUNK_SIZE,
    chunk_array,
    chunk_explode,
    chunk_map_restitch,
    restitch_array,
    restitch_grouped,
)


@pytest.fixture(scope="module")
def texts(spark):
    rows = [
        (0, ""),
        (1, "short"),
        (2, "x" * 4499),
        (3, "y" * 4500),
        (4, "z" * 4501),
        (5, "w" * 9001),
        (6, None),
        (7, "a" * 9000),
    ]
    return spark.createDataFrame(rows, "id int, t string")


def test_chunk_counts(spark, texts):
    got = {
        r["id"]: r["n"]
        for r in texts.select(
            "id", F.size(chunk_array("t", CHUNK_SIZE)).alias("n")
        ).collect()
    }
    assert got == {0: 1, 1: 1, 2: 1, 3: 1, 4: 2, 5: 3, 6: None, 7: 2}


def test_chunk_sizes_at_boundary(spark, texts):
    rows = texts.filter("id = 4").select(
        F.transform(chunk_array("t"), lambda c: F.length(c)).alias("lens")
    ).collect()
    assert rows[0]["lens"] == [4500, 1]


def test_roundtrip_narrow(spark, texts):
    bad = texts.filter(
        ~(
            restitch_array(chunk_array("t")).eqNullSafe(F.col("t"))
        )
    ).count()
    assert bad == 0


def test_roundtrip_exploded(spark, texts):
    ex = chunk_explode(texts.filter("t is not null"), "id", "t")
    # shuffle chunk rows deliberately: repartition scrambles arrival order
    stitched = restitch_grouped(ex.repartition(7), "id")
    orig = {r["id"]: r["t"] for r in texts.filter("t is not null").collect()}
    got = {r["id"]: r["restitched"] for r in stitched.collect()}
    assert got == orig


def test_chunk_map_restitch_fallback_intent(spark, texts):
    """translate.js:185 defect note: a per-chunk map returning NULL falls
    back to the ORIGINAL chunk (intent), not empty output (the literal
    reference behavior, which would produce '' for every doc)."""
    out = {
        r["id"]: r["o"]
        for r in texts.select(
            "id",
            chunk_map_restitch(
                "t", fn=lambda c: F.lit(None).cast("string")
            ).alias("o"),
        ).collect()
    }
    want = {r["id"]: (r["t"] if r["t"] is not None else None) for r in texts.collect()}
    # null text stays null (normalization of totals): chunk_array(null)=null
    assert out == want


def test_chunk_map_applies_fn(spark):
    df = spark.createDataFrame([(1, "abcdef")], "id int, t string")
    got = df.select(
        chunk_map_restitch("t", fn=F.upper, size=4).alias("o")
    ).first()["o"]
    assert got == "ABCDEF"
