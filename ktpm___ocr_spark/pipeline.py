"""The extraction pipeline — Spark execution paths.

The reference executes its pipeline as a sequential fold of async filters
over one document at a time (``backend/pipeline.js:22-42``). Our engine
expresses the same semantics as declarative Spark plans. Three physical
strategies, all proven span-sequence-equal to the pure-Python oracle:

``extract_narrow``  (DEFAULT — the 100 TB plan)
    Zero-shuffle: sort/normalize/classify/filter happen *inside* the span
    array via higher-order functions (``array_sort``, ``transform``,
    ``zip_with``, ``filter``) — one narrow projection over the scan, fully
    JVM-side, whole-stage-codegen eligible. Scan → transform → write with
    NO exchange; scales linearly with input bytes and is immune to
    groupBy skew because a document never leaves its row.

``extract_exploded``
    Relational formulation: ``posexplode`` → per-span feature columns →
    window lag/lead over (doc_id, offset) → filter → re-stitch with
    ``sort_array(collect_list(...))``. One wide edge (the re-stitch
    shuffle). Kept because per-span relational processing is what you
    compose other operators onto (memo-joins, per-span analytics), and to
    cross-validate the narrow plan.

``extract_arrow``
    ``mapInPandas`` over Arrow record batches — the vectorized
    pandas/numpy rewrite of the block-fusion classifier per the
    north_star. Normalization via pandas ``str.replace`` (regex), word
    counts via vectorized ``str.count``, neighbor logic via numpy shifts
    with document-boundary fixups. No per-row Python in the batch body.

Classifier: Boilerpipe NumWordsRulesClassifier decision rules
(Kohlschütter et al., WSDM 2010; public algorithm) — see
:mod:`ktpm___ocr_spark.oracle` for the reference implementation.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ktpm___ocr_spark import textnorm
from ktpm___ocr_spark.corpus import DOCUMENTS_SCHEMA
from ktpm___ocr_spark.oracle import (
    ANCHOR_RE_PATTERN,
    CURR_LINK_DENSITY_MAX,
    PREV_LINK_DENSITY_MAX,
    WORD_RE_PATTERN,
)

__all__ = ["extract_narrow", "extract_exploded", "extract_arrow"]


def _norm_col(variant: str, text: Column) -> Column:
    if variant == "pdf":
        return textnorm.normalize_pdf(text)
    if variant == "txt":
        return textnorm.normalize_txt(text)
    raise ValueError(f"unknown variant {variant!r}")


def _word_count(text: Column) -> Column:
    return F.coalesce(F.regexp_count(text, F.lit(WORD_RE_PATTERN)), F.lit(0))


def _link_word_count(text: Column) -> Column:
    anchors = F.regexp_extract_all(text, F.lit(ANCHOR_RE_PATTERN), 1)
    counted = F.aggregate(
        anchors,
        F.lit(0),
        lambda acc, a: acc + F.regexp_count(a, F.lit(WORD_RE_PATTERN)),
    )
    # cheap containment guard: regexp_extract_all allocates even on the
    # ~85 % of spans with no anchor at all
    return F.when(text.contains("<a"), F.coalesce(counted, F.lit(0))).otherwise(
        F.lit(0)
    )


def _keep_rule(w: Column, ld: Column, pw: Column, pld: Column, nw: Column) -> Column:
    """NumWordsRulesClassifier decision tree as one CASE expression."""
    return (
        F.when(ld > F.lit(CURR_LINK_DENSITY_MAX), F.lit(False))
        .when(
            pld <= F.lit(PREV_LINK_DENSITY_MAX),
            (w > 16) | (nw > 15) | (pw > 4),
        )
        .otherwise((w > 40) | (nw > 17))
    )


def _emit(kind: Column, text: Column, media_ref: Column, offset: Column) -> Column:
    return F.struct(
        kind.alias("kind"),
        text.alias("text"),
        media_ref.alias("media_ref"),
        offset.alias("offset"),
    )


# =====================================================================
# Path 1: narrow, zero-shuffle (array higher-order functions)
# =====================================================================
def extract_narrow(
    df: DataFrame, variant: str = "pdf", boilerplate: str = "drop"
) -> DataFrame:
    """Whole pipeline as one narrow projection — no exchange in the plan."""
    is_media = lambda s: s["kind"] == F.lit("media")  # noqa: E731

    sorted_spans = F.array_sort(
        F.col("spans"), lambda l, r: l["offset"] - r["offset"]
    )
    normed = F.transform(
        sorted_spans,
        lambda s: _emit(
            s["kind"],
            F.when(is_media(s), F.lit(None).cast("string")).otherwise(
                _norm_col(variant, s["text"])
            ),
            F.when(is_media(s), s["media_ref"]).otherwise(
                F.lit(None).cast("string")
            ),
            s["offset"],
        ),
    )

    # Allocation discipline (the scaling lever in a shared-heap JVM): four
    # array materializations per doc — sorted, normed, feats, output — and
    # classify+filter FUSED into one indexed-lambda pass over `normed`
    # (no keep array, no zipped struct-of-struct, no final re-projection).
    out = df.withColumn("_normed", normed).withColumn(
        "_feats",
        F.transform(
            F.col("_normed"),
            lambda s: F.struct(
                F.when(is_media(s), F.lit(0))
                .otherwise(_word_count(s["text"]))
                .alias("w"),
                F.when(
                    is_media(s) | (_word_count(s["text"]) == 0), F.lit(0.0)
                )
                .otherwise(
                    _link_word_count(s["text"])
                    / _word_count(s["text"]).cast("double")
                )
                .alias("ld"),
            ),
        ),
    )

    def keep_at(i: Column) -> Column:
        feats = F.col("_feats")
        cur = F.get(feats, i)
        return _keep_rule(
            cur["w"],
            cur["ld"],
            F.coalesce(F.get(feats, i - 1)["w"], F.lit(0)),
            F.coalesce(F.get(feats, i - 1)["ld"], F.lit(0.0)),
            F.coalesce(F.get(feats, i + 1)["w"], F.lit(0)),
        )

    if boilerplate == "drop":
        spans_out = F.filter(
            F.col("_normed"), lambda s, i: is_media(s) | keep_at(i)
        )
    elif boilerplate == "relabel":
        spans_out = F.transform(
            F.col("_normed"),
            lambda s, i: _emit(
                F.when(is_media(s) | keep_at(i), s["kind"]).otherwise(
                    F.lit("boilerplate")
                ),
                s["text"],
                s["media_ref"],
                s["offset"],
            ),
        )
    else:
        raise ValueError(f"unknown boilerplate mode {boilerplate!r}")

    return out.select("doc_id", spans_out.alias("spans"))


# =====================================================================
# Path 2: exploded relational plan (posexplode → window → re-stitch)
# =====================================================================
def classify_exploded(df: DataFrame, variant: str = "pdf") -> DataFrame:
    """Per-span relation with features + keep flag.

    Columns: doc_id, kind, text, media_ref, offset, words, link_density,
    keep. This is the composition surface for per-span operators
    (memo-joins, span-level analytics).
    """
    is_media = F.col("kind") == "media"
    ex = df.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.when(is_media_raw := (F.col("s.kind") == "media"), F.lit(None).cast("string"))
        .otherwise(_norm_col(variant, F.col("s.text")))
        .alias("text"),
        F.when(is_media_raw, F.col("s.media_ref"))
        .otherwise(F.lit(None).cast("string"))
        .alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )
    w = F.when(is_media, F.lit(0)).otherwise(_word_count(F.col("text")))
    ex = ex.withColumn("words", w).withColumn(
        "link_density",
        F.when(is_media | (F.col("words") == 0), F.lit(0.0)).otherwise(
            _link_word_count(F.col("text")) / F.col("words").cast("double")
        ),
    )
    win = Window.partitionBy("doc_id").orderBy("offset")
    ex = (
        ex.withColumn("_pw", F.coalesce(F.lag("words").over(win), F.lit(0)))
        .withColumn(
            "_pld", F.coalesce(F.lag("link_density").over(win), F.lit(0.0))
        )
        .withColumn("_nw", F.coalesce(F.lead("words").over(win), F.lit(0)))
    )
    return ex.withColumn(
        "keep",
        _keep_rule(
            F.col("words"),
            F.col("link_density"),
            F.col("_pw"),
            F.col("_pld"),
            F.col("_nw"),
        ),
    ).drop("_pw", "_pld", "_nw")


def restitch(spans_rel: DataFrame, all_doc_ids: DataFrame) -> DataFrame:
    """Re-stitch a per-span relation into ordered span arrays per doc.

    ``sort_array`` on struct(offset first) restores the span-sequence
    invariant regardless of shuffle order — the engine analogue of the
    reference's ordered chunk join (``utils/translate.js:189``).
    Docs whose spans were all dropped come back with an empty array via
    the right join onto ``all_doc_ids``.
    """
    stitched = spans_rel.groupBy("doc_id").agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct("offset", "kind", "text", "media_ref")
                )
            ),
            lambda s: _emit(s["kind"], s["text"], s["media_ref"], s["offset"]),
        ).alias("spans")
    )
    empty = F.array().cast(DOCUMENTS_SCHEMA["spans"].dataType)
    return all_doc_ids.join(stitched, "doc_id", "left").select(
        "doc_id", F.coalesce("spans", empty).alias("spans")
    )


def extract_exploded(
    df: DataFrame, variant: str = "pdf", boilerplate: str = "drop"
) -> DataFrame:
    rel = classify_exploded(df, variant)
    if boilerplate == "drop":
        rel = rel.filter((F.col("kind") == "media") | F.col("keep"))
    elif boilerplate == "relabel":
        rel = rel.withColumn(
            "kind",
            F.when((F.col("kind") == "media") | F.col("keep"), F.col("kind"))
            .otherwise(F.lit("boilerplate")),
        )
    else:
        raise ValueError(f"unknown boilerplate mode {boilerplate!r}")
    return restitch(
        rel.select("doc_id", "kind", "text", "media_ref", "offset"),
        df.select("doc_id"),
    )


# =====================================================================
# Path 3: Arrow-vectorized mapInPandas (north_star-mandated path)
# =====================================================================
def extract_arrow(
    df: DataFrame, variant: str = "pdf", boilerplate: str = "drop"
) -> DataFrame:
    """Block-fusion classifier over Arrow batches, vectorized with pandas
    and numpy — no per-row Python inside the batch body.

    One row = one document (narrow; no shuffle). Each Arrow batch is
    flattened to span-level numpy/pandas arrays, normalized and classified
    with vectorized ops, and re-folded to span arrays per document.
    """
    import re as _re

    import numpy as np
    import pandas as pd

    # re.ASCII pins \s/\S to the JVM plan's Java-default (ASCII) semantics
    # so all three execution paths agree on non-ASCII whitespace (NBSP,
    # U+2028 are content, not separators) — see textnorm.py.
    crlf = _re.compile(r"\r\n?", _re.ASCII)
    collapse = _re.compile(r"\n{2,}" if variant == "pdf" else r"\n{3,}", _re.ASCII)
    trim = _re.compile(r"^\s+|\s+$", _re.ASCII)
    word_re = _re.compile(WORD_RE_PATTERN, _re.ASCII)
    anchor_re = _re.compile(ANCHOR_RE_PATTERN, _re.ASCII)
    relabel = boilerplate == "relabel"
    if boilerplate not in ("drop", "relabel"):
        raise ValueError(f"unknown boilerplate mode {boilerplate!r}")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pdf
                continue
            # ---- flatten: spans of the whole batch as flat arrays
            counts = pdf["spans"].map(len).to_numpy()
            doc_idx = np.repeat(np.arange(len(pdf)), counts)
            flat = [s for spans in pdf["spans"] for s in spans]
            kind = pd.Series([s["kind"] for s in flat], dtype="object")
            text = pd.Series([s["text"] for s in flat], dtype="object")
            mref = pd.Series([s["media_ref"] for s in flat], dtype="object")
            offset = np.array([s["offset"] for s in flat], dtype="int64")

            # ---- sort by (doc, offset): the span-sequence invariant
            order = np.lexsort((offset, doc_idx))
            doc_idx, offset = doc_idx[order], offset[order]
            kind = kind.iloc[order].reset_index(drop=True)
            text = text.iloc[order].reset_index(drop=True)
            mref = mref.iloc[order].reset_index(drop=True)

            media = (kind == "media").to_numpy()
            # ---- vectorized normalization (text spans only)
            norm = (
                text.str.replace(crlf, "\n", regex=True)
                .str.replace(collapse, "\n\n", regex=True)
                .str.replace(trim, "", regex=True)
            )
            norm = norm.where(~media, None)
            mref = mref.where(media, None)

            # ---- vectorized features
            words = norm.str.count(word_re).fillna(0).to_numpy(dtype="int64")
            link_words = (
                norm.str.findall(anchor_re)
                .map(
                    lambda ms: sum(len(word_re.findall(m)) for m in ms)
                    if isinstance(ms, list)
                    else 0
                )
                .to_numpy(dtype="int64")
            )
            ld = np.where(words > 0, link_words / np.maximum(words, 1), 0.0)

            # ---- neighbor features via shifts + doc-boundary fixup
            pw = np.concatenate(([0], words[:-1]))
            pld = np.concatenate(([0.0], ld[:-1]))
            nw = np.concatenate((words[1:], [0]))
            first = np.concatenate(
                ([True], doc_idx[1:] != doc_idx[:-1])
            )
            last = np.concatenate((doc_idx[:-1] != doc_idx[1:], [True]))
            pw[first], pld[first], nw[last] = 0, 0.0, 0

            # ---- NumWordsRulesClassifier, fully vectorized
            keep = np.where(
                ld > CURR_LINK_DENSITY_MAX,
                False,
                np.where(
                    pld <= PREV_LINK_DENSITY_MAX,
                    (words > 16) | (nw > 15) | (pw > 4),
                    (words > 40) | (nw > 17),
                ),
            )

            # ---- refold to one span-array per document
            out_kind = kind.to_numpy(dtype="object")
            if relabel:
                out_kind = np.where(media | keep, out_kind, "boilerplate")
                emit = np.ones(len(keep), dtype=bool)
            else:
                emit = media | keep
            spans_out: list[list[dict]] = [[] for _ in range(len(pdf))]
            norm_np = norm.to_numpy(dtype="object")
            mref_np = mref.to_numpy(dtype="object")
            for j in np.flatnonzero(emit):
                spans_out[doc_idx[j]].append(
                    {
                        "kind": out_kind[j],
                        "text": norm_np[j],
                        "media_ref": mref_np[j],
                        "offset": int(offset[j]),
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].to_numpy(), "spans": spans_out}
            )

    return df.mapInPandas(process, schema=DOCUMENTS_SCHEMA)
