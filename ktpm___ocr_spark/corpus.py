"""Deterministic synthetic corpus of interleaved text+media documents.

Implements the generation rules of FIXTURES.md §1 (seeded, scale-factor
driven), producing rows of the engine's primary input schema::

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

Properties (mirroring the reference's workload shape):

* ~90 % small docs (3–40 spans), ~10 % medium (40–400), and exactly one
  mega-doc per 1000 docs with ~10⁴ spans — the skew fixture that mirrors
  the reference's single-big-upload case (``backend/server.js:133-141``).
* Span mix ≈ 70 % text / 15 % media / 15 % boilerplate-shaped text (short,
  link-dense — exercises the block-fusion classifier).
* Text spans embed the normalization edge cases asserted by the
  reference's goldens (``pdfFilter.js:45-49``, ``txtFilter.js:43-47``):
  ``\\r\\n``, lone ``\\r``, runs of 2+ and 3+ newlines, leading/trailing
  whitespace, empty strings, and strings straddling the reference's
  4500-char chunk boundary (``utils/translate.js:110-116``): lengths
  4499 / 4500 / 4501 / 9001.
* ~10 % of docs are exact content duplicates of another doc (exercises
  the sha256 memo-dedup, ``cacheFilter.js:8-13``).
* Offsets are unique per doc and deliberately shuffled in array order —
  output must restore order by offset (the span-sequence invariant).
"""

from __future__ import annotations

import random
from typing import Any

from pyspark.sql import types as T

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), nullable=False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
    ]
)

_VOCAB = (
    "the quick brown fox jumps over a lazy dog while spark executors "
    "shuffle partitions of columnar parquet data across the cluster and "
    "catalyst optimizes every logical plan into vectorized stages that "
    "scan filter project join aggregate window sort and write results"
).split()

_EDGE_SNIPPETS = [
    "line one\r\nline two",  # CRLF
    "carriage\rreturn only",  # lone CR
    "two\n\nnewlines kept by txt collapsed by none",
    "three\n\n\nnewlines collapse in both variants",
    "four\n\n\n\nnewlines collapse harder",
    "   leading spaces",
    "trailing spaces   ",
    "\t tab framed \t",
    "  \r\n mixed \r lead and trail \n\n  ",
    "",  # empty text span — the skip path (translateFilter.js:19-30)
    "   ",  # whitespace-only span — trims to empty
]

_LINK_WORDS = ["home", "login", "next", "prev", "terms", "privacy", "rss"]


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_VOCAB) for _ in range(n))


def _text_span(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.12:
        return rng.choice(_EDGE_SNIPPETS)
    if r < 0.16:
        # mix an edge snippet into a sentence
        return _words(rng, rng.randint(3, 12)) + rng.choice(_EDGE_SNIPPETS)
    # plain content — long enough to classify as main content most times
    return _words(rng, rng.randint(5, 40))


def _boilerplate_span(rng: random.Random) -> str:
    """Short, link-dense block: high link density → boilerplate."""
    n_links = rng.randint(1, 4)
    links = " ".join(
        f'<a href="/{w}">{w}</a>' for w in rng.sample(_LINK_WORDS, n_links)
    )
    if rng.random() < 0.5:
        return links
    return f"{rng.choice(_VOCAB)} {links}"


def _long_span(rng: random.Random, length: int) -> str:
    """Span of an exact character length (chunk-boundary fixture)."""
    buf: list[str] = []
    total = 0
    while total < length:
        w = rng.choice(_VOCAB)
        buf.append(w)
        total += len(w) + 1
    s = " ".join(buf)[:length]
    return s + "x" * (length - len(s))


def _make_doc(rng: random.Random, doc_idx: int, n_spans: int) -> dict[str, Any]:
    spans: list[dict[str, Any]] = []
    # offsets: unique, increasing with random gaps (gaps prove we sort by
    # offset value, not by dense rank)
    offset = 0
    for _ in range(n_spans):
        offset += rng.randint(1, 5)
        r = rng.random()
        if r < 0.15:
            spans.append(
                {
                    "kind": "media",
                    "text": None,
                    "media_ref": f"s3://corpus/img/{doc_idx}/{offset}.png",
                    "offset": offset,
                }
            )
        elif r < 0.30:
            spans.append(
                {
                    "kind": "text",
                    "text": _boilerplate_span(rng),
                    "media_ref": None,
                    "offset": offset,
                }
            )
        else:
            spans.append(
                {
                    "kind": "text",
                    "text": _text_span(rng),
                    "media_ref": None,
                    "offset": offset,
                }
            )
    rng.shuffle(spans)  # array order must not matter
    return {"doc_id": f"doc{doc_idx:08d}", "spans": spans}


def generate_rows(n_docs: int, seed: int = 42) -> list[dict[str, Any]]:
    """Generate ``n_docs`` deterministic documents (plain Python rows)."""
    rng = random.Random(seed)
    docs: list[dict[str, Any]] = []
    for i in range(n_docs):
        if i > 0 and i % 1000 == 0:
            n_spans = rng.randint(9_000, 11_000)  # mega-doc skew fixture
        elif rng.random() < 0.10:
            n_spans = rng.randint(40, 400)  # medium
        else:
            n_spans = rng.randint(3, 40)  # small
        docs.append(_make_doc(rng, i, n_spans))

    # chunk-boundary fixtures: lengths straddling 4500 (translate.js:110-116)
    for j, length in enumerate([4499, 4500, 4501, 9001]):
        if j < len(docs):
            docs[j]["spans"].append(
                {
                    "kind": "text",
                    "text": _long_span(rng, length),
                    "media_ref": None,
                    "offset": 10_000_000 + j,
                }
            )

    # ~10 % exact duplicates (same spans, new doc_id) — memo-dedup fixture
    n_dups = n_docs // 10
    for k in range(n_dups):
        src = docs[rng.randrange(n_docs)]
        docs.append(
            {
                "doc_id": f"dup{k:08d}",
                "spans": [dict(s) for s in src["spans"]],
            }
        )
    return docs


def generate_df(spark, n_docs: int, seed: int = 42, partitions: int | None = None):
    """Generate the corpus as a Spark DataFrame with the canonical schema."""
    rows = generate_rows(n_docs, seed)
    df = spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA)
    if partitions:
        df = df.repartition(partitions, "doc_id")
    return df


def write_corpus(spark, path: str, n_docs: int, seed: int = 42, partitions: int = 32):
    """Materialize a corpus to parquet (bench input; written once)."""
    generate_df(spark, n_docs, seed, partitions).write.mode("overwrite").parquet(path)
    return path
