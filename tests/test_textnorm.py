"""Normalization goldens — mirrors the reference's filter specs.

Reference goldens: pdf collapse of 2+ newlines (``pdfFilter.js:45-49``),
txt collapse of 3+ (``txtFilter.js:43-47``, asserted at
``tests/filters/txtFilter.test.js:77-90``), CRLF/CR → LF, full trim.
Asserts the Python and Spark implementations agree on every case.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ktpm___ocr_spark import textnorm

CASES = [
    "",
    "   ",
    "plain text",
    "a\r\nb",
    "a\rb",
    "a\n\nb",
    "a\n\n\nb",
    "a\n\n\n\n\nb",
    "  lead",
    "trail   ",
    "\t tab \t",
    "  \r\n mixed \r lead \n\n  ",
    "a\r\n\r\nb",  # CRLF pair → \n\n
    "a\r\rb",  # two lone CRs → \n\n
    "x\ny",  # single newline untouched by both
    None,
]

PDF_EXPECTED = {
    "a\n\nb": "a\n\nb",
    "a\n\n\nb": "a\n\nb",
    "a\n\n\n\n\nb": "a\n\nb",
    "a\r\n\r\nb": "a\n\nb",
    "a\r\rb": "a\n\nb",
    "x\ny": "x\ny",
}

TXT_EXPECTED = {
    "a\n\nb": "a\n\nb",  # 2 newlines KEPT by txt variant
    "a\n\n\nb": "a\n\nb",
    "a\n\n\n\n\nb": "a\n\nb",
    "a\r\n\r\nb": "a\n\nb",
    "a\r\rb": "a\n\nb",
    "x\ny": "x\ny",
}


def test_pdf_goldens():
    for src, want in PDF_EXPECTED.items():
        assert textnorm.normalize_pdf_py(src) == want, src


def test_txt_goldens():
    for src, want in TXT_EXPECTED.items():
        assert textnorm.normalize_txt_py(src) == want, src


def test_variants_differ_on_double_newline():
    # The load-bearing intentional difference between pdf and txt variants.
    assert textnorm.normalize_pdf_py("a\n\n\nb") == "a\n\nb"
    assert textnorm.normalize_txt_py("a\n\nb") == "a\n\nb"
    # pdf collapses a run of 2; txt leaves a run of 2 alone inside text
    assert textnorm.normalize_pdf_py("a\n\nb") == "a\n\nb"


def test_trim_full_whitespace():
    assert textnorm.normalize_pdf_py("   ") == ""
    assert textnorm.normalize_pdf_py(" \t\r\n x \r\n\t ") == "x"


@pytest.mark.parametrize("variant", ["pdf", "txt"])
def test_spark_matches_python(spark, variant):
    py_fn = (
        textnorm.normalize_pdf_py if variant == "pdf" else textnorm.normalize_txt_py
    )
    col_fn = textnorm.normalize_pdf if variant == "pdf" else textnorm.normalize_txt
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(CASES)], "id int, t string"
    )
    got = {
        r["id"]: r["out"]
        for r in df.select("id", col_fn(F.col("t")).alias("out")).collect()
    }
    for i, c in enumerate(CASES):
        assert got[i] == py_fn(c), repr(c)


def test_title_from_name(spark):
    cases = ["report.pdf", "a.b.c.txt", "noext", "", None, ".hidden"]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "id int, n string"
    )
    got = {
        r["id"]: r["t"]
        for r in df.select(
            "id", textnorm.title_from_name(F.col("n")).alias("t")
        ).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == textnorm.title_from_name_py(c), repr(c)
