"""Sparse retrieval over the document corpus: inverted index + BM25.

The dense side of similarity search lives in ``operators/similarity.py``
(brute/LSH/IVF ANN); this module is the sparse counterpart a corpus
pipeline needs for keyword search, contamination lookups, and
quality-weighted retrieval-based filtering.

* ``inverted_index`` — term → document posting lists with positions,
  the classic IR structure (Zobel & Moffat 2006, "Inverted files for
  text search engines"). Shape at scale: one explode + two hash
  aggregates keyed by (term, doc) then (term) — both map-side
  combinable and shuffled on the term key, so the index build is one
  pass and partitions by term hash. Stopword-class skew (a term in
  every doc) is bounded by the ``min_df``/``max_df_ratio`` gates, the
  same guard real indexers apply.
* ``bm25_topk`` — Okapi BM25 (Robertson & Sparck Jones / Robertson et
  al., TREC-3) ranked retrieval for a literal query-term set. The query
  side is a broadcast of |q| terms; corpus work is one (doc, term)
  aggregate + a per-doc sum, then a global top-k (TakeOrdered — no full
  sort). Scores are rounded BEFORE ranking (ties then break by doc_id)
  so the ranking is reproducible across engines — ``ln`` may differ by
  1 ulp between libm implementations, and an unrounded order-by would
  let that flip ranks (same convention as tfidf_top_terms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ktpm___ocr_spark.functions.textstats import words_array

BM25_K1 = 1.2
BM25_B = 0.75


def _term_positions(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, term, pos) — 0-based token position within the doc."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(words_array(F.col(text_col))).alias("pos", "term"),
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 20,
    max_df_ratio: float = 0.5,
) -> DataFrame:
    """Positional inverted index: one row per surviving term with
    ``(term, df, cf, postings)`` where ``postings`` is the canonical
    string ``doc:p1 p2 p3,doc:p1,…`` ordered by doc id (scalar
    projection — array columns don't survive the driver canonicalizer;
    a real deployment would keep the nested arrays and write
    partitionBy(term-hash) parquet).

    ``df`` = document frequency, ``cf`` = collection frequency. Terms
    below ``min_df`` (noise tail: the vocabulary's long tail dominates
    row count but serves no retrieval purpose) and above
    ``max_df_ratio``·N (stopword class: posting list ≈ the whole corpus,
    the skew bound of the term-keyed shuffle) are gated out.

    Two-phase build so the gates bound skew for real: phase 1 computes
    per-term df/cf (map-combinable counts — safe for any skew) and
    applies the gates; phase 2 builds the expensive postings strings
    ONLY for surviving terms via a broadcast semi-join. A single-pass
    formulation would funnel a stopword's N postings structs into one
    collect_list buffer and materialize a corpus-sized string on one
    task *before* the filter could discard it.

    Cost split between the phases (r5 measurement; supersedes the r4
    persist-per_doc design): phase 1 shuffles only (term, doc, count)
    integers — no position strings — and its vocab-sized gate result is
    eagerly materialized (cheap: |vocab| rows). Phase 2 re-tokenizes
    (map-side CPU, the cheap half) but applies the broadcast survivor
    semi-join BEFORE its shuffle, so posting strings move exactly once
    and ONLY for surviving terms — gated-out noise/stopword plists are
    never serialized into an exchange. Nothing corpus-sized is cached
    or checkpointed; the returned index stays lazy for the caller to
    sink (the persist alternative cached the corpus-wide (term, doc,
    plist) relation AND shuffled dropped terms' strings)."""
    n_docs_row = docs.select(F.count(F.lit(1)).alias("_n"))
    tok = _term_positions(docs, id_col, text_col)
    survivors = (
        tok.groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("tf").cast("long").alias("cf"),
        )
        .crossJoin(F.broadcast(n_docs_row))
        .filter(
            (F.col("df") >= min_df)
            & (F.col("df") <= F.col("_n") * max_df_ratio)
        )
        .select("term", "df", "cf")
        # vocab-sized; materialized so the gate's two consumers (the
        # phase-2 semi-join and the final join) don't re-run phase 1
        .localCheckpoint(eager=True)
    )
    postings = (
        tok.join(F.broadcast(survivors.select("term")), "term")
        .groupBy("term", "doc_id")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list(F.col("pos").cast("long"))), " "
            ).alias("plist")
        )
        .groupBy("term")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("doc_id", "plist"))),
                    lambda s: F.concat(
                        s["doc_id"].cast("string"), F.lit(":"), s["plist"]
                    ),
                ),
                ",",
            ).alias("postings")
        )
    )
    return survivors.join(postings, "term").select("term", "df", "cf", "postings")


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under Okapi BM25.

    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))  (the non-negative
    variant), tf component = tf·(k1+1)/(tf + k1·(1−b + b·dl/avgdl)).
    Stats (N, avgdl, per-term df) are computed on the corpus; the query
    relation is |q| rows, broadcast into every join. Output
    (doc_id, score, n_hits) with score rounded to 4 dp before the
    rank order (doc_id tiebreak)."""
    q = F.broadcast(
        docs.sparkSession.createDataFrame(
            [(t,) for t in sorted(set(query_terms))], "term string"
        )
    )
    lens = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(words_array(F.col(text_col))).cast("long").alias("dl"),
    )
    stats = lens.agg(
        F.count(F.lit(1)).alias("_n"), F.avg("dl").alias("_avgdl")
    )
    # ONE tokenize per row on the tf path: let-bind the words array
    # (CollapseProject would otherwise re-inline words_array into every
    # consumer — no CSE across HOF boundaries) and emit (dl, term) pairs
    # from a single generator, carrying dl through the aggregate so no
    # corpus-sized tf⋈lens shuffle join is needed. BM25 never reads
    # positions, so no posexplode struct either.
    from ktpm___ocr_spark.functions.exprutil import let

    pairs = F.explode(
        let(
            words_array(F.col(text_col)),
            lambda ws: F.transform(
                ws,
                lambda w: F.struct(
                    F.size(ws).cast("long").alias("dl"), w.alias("term")
                ),
            ),
        )
    )
    tf = (
        docs.select(F.col(id_col).alias("doc_id"), pairs.alias("p"))
        .select("doc_id", "p.dl", "p.term")
        .join(q, "term")
        .groupBy("doc_id", "term", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1
                    * (1 - b + b * F.col("dl") / F.col("_avgdl"))
                )
            ).alias("s"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.round(F.sum("s"), 4).alias("score"),
        F.count(F.lit(1)).cast("long").alias("n_hits"),
    )
    return per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def proximity_hits(
    docs: DataFrame,
    term_a: str,
    term_b: str,
    max_dist: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Positional proximity query — the op that justifies storing
    positions in the index at all: documents where ``term_a`` and
    ``term_b`` co-occur within ``max_dist`` tokens, with the closest
    distance found. Output (doc_id, min_dist, n_pairs).

    Shape: ONE scan, zero shuffle — the words array is let-bound
    (tokenized once per row), both terms' position arrays are extracted
    in-row, and the tf_a·tf_b distance pairs are a nested HOF over those
    two small arrays. Per-doc work is bounded by the two terms' in-doc
    frequencies, never corpus-sized.

    ``term_a == term_b`` measures repetition distance: same-position
    self-pairs are excluded (otherwise every doc containing the term
    would report min_dist 0), so n_pairs = tf·(tf−1) ordered pairs."""
    from ktpm___ocr_spark.functions.exprutil import let

    def positions(ws, t):
        return F.transform(
            F.filter(
                F.transform(
                    ws, lambda w, i: F.struct(i.alias("i"), w.alias("w"))
                ),
                lambda s: s["w"] == t,
            ),
            lambda s: s["i"].cast("long"),
        )

    same = term_a == term_b
    dists = let(
        words_array(F.col(text_col)),
        lambda ws: let(
            F.struct(
                positions(ws, term_a).alias("pa"),
                positions(ws, term_b).alias("pb"),
            ),
            lambda ab: F.flatten(
                F.transform(
                    ab["pa"],
                    lambda a: F.filter(
                        F.transform(ab["pb"], lambda b: F.abs(a - b)),
                        # positions are unique within a doc, so for the
                        # same-term case dist 0 ⟺ the self-pair
                        lambda d: F.lit(not same) | (d != 0),
                    ),
                )
            ),
        ),
    )
    # explode(array(…)) = a Generate barrier: three downstream consumers
    # (min, size, the filter) would otherwise each re-inline the whole
    # let tree via CollapseProject, re-tokenizing the doc 3×
    stats_struct = F.explode(
        F.array(
            let(
                dists,
                lambda d: F.struct(
                    F.array_min(d).alias("min_dist"),
                    F.size(d).cast("long").alias("n_pairs"),
                ),
            )
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), stats_struct.alias("r"))
        .select(
            "doc_id",
            F.col("r.min_dist").alias("min_dist"),
            F.col("r.n_pairs").alias("n_pairs"),
        )
        # empty distance list → array_min NULL → dropped here
        .filter(F.col("min_dist").isNotNull() & (F.col("min_dist") <= max_dist))
    )
