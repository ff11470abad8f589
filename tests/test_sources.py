"""Schema-enforced reads, partitioned sinks, distributed generator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ktpm___ocr_spark.corpus import generate_df
from ktpm___ocr_spark.operators.render import render_documents
from ktpm___ocr_spark.sources.generator import synth_corpus
from ktpm___ocr_spark.sources.readers import (
    SchemaMismatch,
    read_documents,
    write_extracted,
    write_rendered,
)


def test_read_documents_roundtrip(spark, tmp_path):
    p = str(tmp_path / "docs")
    generate_df(spark, 30, seed=42).write.parquet(p)
    df = read_documents(spark, p)
    assert df.count() == 33  # 30 + 10% dups
    assert [f.name for f in df.schema.fields] == ["doc_id", "spans"]


def test_read_documents_rejects_wrong_schema(spark, tmp_path):
    p = str(tmp_path / "bad")
    spark.createDataFrame([("a", 1)], "doc_id string, nope int").write.parquet(p)
    with pytest.raises(SchemaMismatch):
        read_documents(spark, p)


def test_write_extracted_bucketed(spark, tmp_path):
    p = str(tmp_path / "out")
    df = generate_df(spark, 20, seed=42)
    write_extracted(df, p, buckets_by="doc_id")
    back = spark.read.parquet(p)
    assert back.count() == df.count()
    assert back.select("bucket").distinct().count() > 1


def test_write_rendered_partitioned_by_fmt(spark, tmp_path):
    p = str(tmp_path / "artifacts")
    df = spark.createDataFrame(
        [("1", "x", "A", "pdf"), ("2", "y", "B", "txt")],
        "doc_id string, text string, title string, fmt string",
    )
    write_rendered(
        render_documents(df, text_col="text", title_col="title", fmt_col="fmt"), p
    )
    pdfs = spark.read.parquet(p).filter("fmt = 'pdf'")
    assert pdfs.count() == 1
    # partition pruning: the pdf-only scan reads only the pdf partition
    plan = pdfs._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(fmt" in plan


def test_synth_corpus_deterministic_across_parallelism(spark):
    a = synth_corpus(spark, 100, seed=1)
    b = synth_corpus(spark, 100, seed=1).repartition(7)
    rows_a = {r["doc_id"]: r["spans"] for r in a.collect()}
    rows_b = {r["doc_id"]: r["spans"] for r in b.collect()}
    assert rows_a == rows_b
    sizes = [len(s) for s in rows_a.values()]
    assert min(sizes) >= 3


def test_cobucketed_join_has_no_exchange(spark, tmp_path):
    """Bucketed write on both sides → the doc_id join plans with ZERO
    Exchange operators (the co-located-join scale pattern)."""
    from pyspark.sql import functions as F

    from ktpm___ocr_spark.sources.bucketing import cobucketed_join, write_bucketed

    docs = generate_df(spark, 50, seed=42).withColumn(
        "n_spans", F.size("spans")
    ).select("doc_id", "n_spans")
    meta = docs.select("doc_id", (F.col("n_spans") * 2).alias("weight"))
    # disable broadcast so a shuffle join would otherwise be required
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(docs, "t_docs_b", "doc_id", buckets=8)
        write_bucketed(meta, "t_meta_b", "doc_id", buckets=8)
        joined = cobucketed_join(spark, "t_docs_b", "t_meta_b", "doc_id")
        assert joined.count() == docs.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_docs_b")
        spark.sql("DROP TABLE IF EXISTS t_meta_b")


def test_csv_json_sources_schema_enforced(spark, tmp_path):
    from pyspark.sql import functions as F

    from ktpm___ocr_spark.sources.readers import (
        EVENTS_FLAT_SCHEMA,
        read_events_csv,
        read_events_json,
    )

    df = spark.createDataFrame(
        [(1, 10, "click", 1.5), (2, 11, "view, with comma", 2.25)],
        EVENTS_FLAT_SCHEMA,
    )
    csv_dir, json_dir = str(tmp_path / "csv"), str(tmp_path / "json")
    df.coalesce(1).write.option("header", "true").csv(csv_dir)
    df.coalesce(1).write.json(json_dir)
    back_csv = read_events_csv(spark, csv_dir).orderBy("event_id").collect()
    back_json = read_events_json(spark, json_dir).orderBy("event_id").collect()
    orig = df.orderBy("event_id").collect()
    assert back_csv == orig  # quoting survives embedded commas
    assert back_json == orig


def test_compact_small_files(spark, tmp_path):
    from ktpm___ocr_spark.sources.readers import compact_small_files

    frag = str(tmp_path / "frag")
    spark.range(0, 5000).repartition(40).write.parquet(frag)
    import os

    n_in = sum(f.endswith(".parquet") for f in os.listdir(frag))
    assert n_in == 40
    out = str(tmp_path / "compact")
    total = sum(
        os.path.getsize(os.path.join(frag, f))
        for f in os.listdir(frag)
        if f.endswith(".parquet")
    )
    n_out = compact_small_files(spark, frag, out, target_bytes=total // 2 + 1)
    n_files = sum(f.endswith(".parquet") for f in os.listdir(out))
    assert n_out == 2 and n_files == 2
    # content-preserving
    assert sorted(
        r["id"] for r in spark.read.parquet(out).collect()
    ) == list(range(5000))
