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


def read_events_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source with the same enforced-schema contract (columnar like
    parquet — predicate pushdown and column pruning apply).

    Spark null-fills missing columns when handed an explicit schema, so
    like ``read_documents`` the check runs against the files' actual
    footer schema first and raises ``SchemaMismatch`` on a missing or
    retyped column instead of silently producing NULLs."""
    _check(EVENTS_FLAT_SCHEMA, spark.read.orc(path).schema, path)
    return spark.read.schema(EVENTS_FLAT_SCHEMA).orc(path)


def compact_small_files(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-files compaction — the maintenance action a 100 TB table
    needs continuously (Iceberg's rewrite_data_files): streaming/
    incremental ingest produces many files far below the ideal scan unit,
    and every downstream job then pays per-file open/footer/task overhead.
    Rewrites the directory into ceil(total_bytes / target_bytes) files.
    Returns the output file count. Content-preserving by construction
    (same rows, no transform)."""
    import math
    import os

    total = sum(
        os.path.getsize(os.path.join(in_dir, f))
        for f in os.listdir(in_dir)
        if f.endswith(".parquet")
    )
    n_out = max(1, math.ceil(total / target_bytes))
    spark.read.parquet(in_dir).repartition(n_out).write.mode(
        "overwrite"
    ).parquet(out_dir)
    # actual files on disk, not the requested partition count (empty
    # partitions write no file)
    return sum(f.endswith(".parquet") for f in os.listdir(out_dir))
