"""Metastore-bucketed tables — shuffle-free co-located joins.

The 100 TB pattern for repeated joins on the same key (e.g. joining the
extracted table back to stage-cache tables or metadata on ``doc_id``):
bucket BOTH sides on the key at write time; Spark's bucketed-scan then
satisfies the join's distribution requirement with NO Exchange on either
side. This is the batch analogue of the reference's content-addressed
keyspaces — the key layout is baked into storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 16, sort: bool = True
) -> None:
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on the same key with the same bucket
    count — planner proves co-partitioning, no shuffle."""
    return read_table(spark, left_table).join(
        read_table(spark, right_table), on=key, how=how
    )
