"""Schema-enforced scans and partitioned sinks.

The reference duck-types its ctx and throws on missing fields at each
filter (``preprocessFilter.js:13-15``, ``ocrFilter.js:17-19``). The batch
equivalent moves that contract to the table boundary: reads validate the
schema once, up front, instead of per-row probes.

The sinks mirror the reference's output organization: per-format dispatch
(P10) becomes a format-partitioned write — at 100 TB, partition columns
are what makes downstream scans prunable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ktpm___ocr_spark.corpus import DOCUMENTS_SCHEMA


class SchemaMismatch(ValueError):
    pass


def _check(expected: T.StructType, actual: T.StructType, table: str) -> None:
    exp = {f.name: f.dataType.simpleString() for f in expected.fields}
    act = {f.name: f.dataType.simpleString() for f in actual.fields}
    missing = {k: v for k, v in exp.items() if act.get(k) != v}
    if missing:
        raise SchemaMismatch(
            f"{table}: missing/mismatched columns {missing}; found {act}"
        )


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    """Scan the interleaved documents table with schema enforcement.

    Spark silently null-fills missing columns when handed an explicit
    schema, so the check runs against the files' actual footer schema.
    """
    actual = spark.read.parquet(path).schema
    _check(DOCUMENTS_SCHEMA, actual, path)
    return spark.read.schema(DOCUMENTS_SCHEMA).parquet(path)


def write_extracted(
    df: DataFrame, path: str, mode: str = "overwrite", buckets_by: str | None = None
) -> None:
    """Write the extracted table. With ``buckets_by`` the output is
    bucketed on doc_id (co-located re-joins downstream skip the shuffle)."""
    w = df.write.mode(mode)
    if buckets_by:
        # bucketBy requires saveAsTable (metastore); parquet-dir fallback
        # keeps a deterministic doc_id hash partitioning instead.
        from pyspark.sql import functions as F

        df.withColumn(
            "bucket", F.pmod(F.xxhash64(buckets_by), F.lit(64))
        ).write.mode(mode).partitionBy("bucket").parquet(path)
        return
    w.parquet(path)


def write_rendered(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Format-partitioned artifact sink (P10 dispatch as partition pruning:
    a reader of only PDFs scans only the pdf partition)."""
    from pyspark.sql import functions as F

    df.withColumn(
        "fmt",
        F.element_at(F.split(F.col("filename"), r"\."), -1),
    ).write.mode(mode).partitionBy("fmt").parquet(path)


EVENTS_FLAT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def read_events_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV source with an enforced schema (never inferSchema — schema
    inference is a full extra pass over the data and is non-deterministic
    under sampling at scale) and FAILFAST mode: a malformed row aborts the
    read instead of silently becoming nulls."""
    return (
        spark.read.schema(EVENTS_FLAT_SCHEMA)
        .option("header", "true")
        .option("mode", "FAILFAST")
        .csv(path)
    )


def read_events_json(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines source, same enforced-schema + FAILFAST contract."""
    return (
        spark.read.schema(EVENTS_FLAT_SCHEMA)
        .option("mode", "FAILFAST")
        .json(path)
    )
