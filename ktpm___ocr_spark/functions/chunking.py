"""Fixed-size chunk → per-chunk map → order-preserving re-stitch.

The reference bounds its unit-of-work by slicing text into 4500-char
chunks before calling the translator (``backend/utils/translate.js:
110-116``), maps each chunk independently with a per-chunk fallback chain
(``:122-186``), and re-stitches in order with ``join("")`` (``:189``).
SURVEY §2.3 C1–C3.

Spark-first formulation: chunking is ``sequence`` + ``transform`` +
``substring`` (pure column expressions, chunk index carried explicitly),
exploding is ``posexplode``, re-stitching is either ``array_join`` (narrow)
or ``sort_array(collect_list(struct(pos, txt)))`` + ``concat_ws`` after a
shuffle — order restored by the explicit position, never by arrival order.

⚠ Reference-defect note (load-bearing; SURVEY §2.3): the reference's
re-stitch loop reads ``translatedParts.push(translated ?. p)``
(``translate.js:185``) — an optional *property access* that evaluates to
``undefined`` for every string, so as literally written every chunk
re-stitches to the empty string. We implement the evident intent
(``translated ?? p`` — fall back to the original chunk), consistent with
the explicit fallbacks at ``translate.js:181`` and
``translateFilter.js:84``. Pinned by ``tests/test_chunking.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CHUNK_SIZE = 4500  # reference vendor limit, translate.js:110


def chunk_array(col: Column | str, size: int = CHUNK_SIZE) -> Column:
    """C1: split a string into an ordered array of ≤``size``-char chunks.

    Empty string → ``[""]`` (one empty chunk — matches the reference,
    whose ``chunkText`` loop still yields nothing for "" but whose caller
    short-circuits empty text earlier; we keep one chunk so the round
    trip is total). NULL → NULL.
    """
    c = F.col(col) if isinstance(col, str) else col
    n_chunks = F.greatest(F.ceil(F.length(c) / F.lit(size)), F.lit(1))
    chunks = F.transform(
        F.sequence(F.lit(1), n_chunks.cast("int")),
        lambda i: F.substring(c, (i - F.lit(1)) * size + 1, size),
    )
    return F.when(c.isNull(), F.lit(None)).otherwise(chunks)


def restitch_array(chunks: Column | str) -> Column:
    """C3 (narrow): order-preserving concatenation of a chunk array."""
    c = F.col(chunks) if isinstance(chunks, str) else chunks
    return F.array_join(c, "")


def chunk_map_restitch(
    col: Column | str,
    fn: Callable[[Column], Column] | None = None,
    size: int = CHUNK_SIZE,
) -> Column:
    """C1+C2+C3 fused, zero-shuffle: chunk → map each chunk (with the
    reference-intent fallback ``mapped ?? original``) → join("")."""
    mapped = chunk_array(col, size)
    if fn is not None:
        mapped = F.transform(mapped, lambda p: F.coalesce(fn(p), p))
    return F.array_join(mapped, "")


def chunk_explode(
    df: DataFrame, id_col: str, text_col: str, size: int = CHUNK_SIZE
) -> DataFrame:
    """C1 relational form: one row per (id, chunk_pos, chunk)."""
    return df.select(
        F.col(id_col),
        F.posexplode(chunk_array(text_col, size)).alias("chunk_pos", "chunk"),
    )


def restitch_grouped(df: DataFrame, id_col: str) -> DataFrame:
    """C3 relational form: re-stitch exploded chunks after a shuffle.

    Order is restored from the explicit chunk position (W3: order
    preservation is a *data* property, not an execution property).
    """
    return df.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("chunk_pos", "chunk"))),
                lambda s: s["chunk"],
            ),
            "",
        ).alias("restitched")
    )
