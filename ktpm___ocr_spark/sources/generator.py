"""Distributed deterministic corpus synthesis (bench-scale input).

The pytest oracle corpus (corpus.py) is driver-generated Python — right
for correctness, wrong for scale. This generator builds the same *shape*
of corpus (size mix, mega-doc skew, media/boilerplate span mix,
normalization edge cases, pseudo-shuffled offsets) entirely with column
expressions over ``spark.range`` — generation itself scales with
executors, the way a 10¹²-doc corpus would have to be materialized.

Determinism: every random choice is ``xxhash64(seed, doc_id, …)`` —
identical output for identical (n_docs, seed) at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ktpm___ocr_spark.corpus import _EDGE_SNIPPETS, _LINK_WORDS, _VOCAB

_OFFSET_PRIME = 1_000_003  # > max spans per doc; gcd(step, prime) = 1


def _h(*cols) -> F.Column:
    """Deterministic non-negative 63-bit hash of the given columns."""
    return F.abs(F.xxhash64(*cols))


def synth_corpus(spark: SparkSession, n_docs: int, seed: int = 42) -> DataFrame:
    """documents(doc_id, spans) built fully distributed."""
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    edges = F.array(*[F.lit(e) for e in _EDGE_SNIPPETS])
    links = F.array(*[F.lit(w) for w in _LINK_WORDS])
    s = F.lit(seed)

    df = spark.range(n_docs).withColumnRenamed("id", "i")
    # ~9 % of docs are exact content duplicates of an earlier doc (every
    # 11th doc clones the doc 5 positions back): doc_id stays unique but
    # every content-seeded choice below derives from `doc`, the CONTENT
    # index — the distributed analogue of corpus.py's dup planting.
    doc = F.when(
        (F.col("i") % 11 == 10) & (F.col("i") >= 5), F.col("i") - 5
    ).otherwise(F.col("i"))

    n_spans = (
        F.when(doc % 1000 == 999, (_h(s, doc, F.lit("mega")) % 2000 + 9000))
        .when(_h(s, doc, F.lit("med")) % 10 == 0, (_h(s, doc, F.lit("nm")) % 361 + 40))
        .otherwise(_h(s, doc, F.lit("ns")) % 38 + 3)
    ).cast("int")

    def word_at(i, j):
        return F.element_at(vocab, (_h(s, doc, i, j) % len(_VOCAB) + 1).cast("int"))

    def words(i, n):
        return F.array_join(
            F.transform(F.sequence(F.lit(1), n.cast("int")), lambda j: word_at(i, j)),
            " ",
        )

    def link_at(i, j):
        w = F.element_at(links, (_h(s, doc, i, j, F.lit("l")) % len(_LINK_WORDS) + 1).cast("int"))
        return F.concat(F.lit('<a href="/'), w, F.lit('">'), w, F.lit("</a>"))

    def span_at(i):
        kind_roll = _h(s, doc, i, F.lit("k")) % 100
        offset = ((i * 2_654_435_761) % _OFFSET_PRIME).cast("int")
        text_roll = _h(s, doc, i, F.lit("t")) % 100
        n_words = (_h(s, doc, i, F.lit("w")) % 36 + 5)
        n_links = (_h(s, doc, i, F.lit("nl")) % 4 + 1).cast("int")
        plain = words(i, n_words)
        edge = F.element_at(
            edges, (_h(s, doc, i, F.lit("e")) % len(_EDGE_SNIPPETS) + 1).cast("int")
        )
        boiler = F.array_join(
            F.transform(F.sequence(F.lit(1), n_links), lambda j: link_at(i, j)), " "
        )
        text = (
            F.when(text_roll < 12, edge)
            .when(text_roll < 16, F.concat(plain, edge))
            .otherwise(plain)
        )
        return F.when(
            kind_roll < 15,
            F.struct(
                F.lit("media").alias("kind"),
                F.lit(None).cast("string").alias("text"),
                F.concat_ws(
                    "/", F.lit("s3://corpus/img"), doc.cast("string"), offset.cast("string")
                ).alias("media_ref"),
                offset.alias("offset"),
            ),
        ).otherwise(
            F.struct(
                F.lit("text").alias("kind"),
                F.when(kind_roll < 30, boiler).otherwise(text).alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                offset.alias("offset"),
            )
        )

    spans = F.transform(F.sequence(F.lit(1), n_spans), span_at)
    return df.select(
        F.format_string("doc%08d", F.col("i")).alias("doc_id"),
        spans.alias("spans"),
    )


def materialize(
    spark: SparkSession, path: str, n_docs: int, seed: int = 42, partitions: int | None = None
) -> str:
    df = synth_corpus(spark, n_docs, seed)
    if partitions:
        df = df.repartition(partitions)
    df.write.mode("overwrite").parquet(path)
    return path
