"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The reference ingests raw image bytes into ``ctx.buffer`` and transforms
them with native libraries (sharp preprocess ``backend/utils/ocr.js:34-41``,
Tesseract OCR ``:50-65``). In the engine, media is an opaque
``BinaryType`` column with a typed metadata struct; decode / feature /
resize / frame-sample stages are Arrow-batched ``mapInPandas`` operators.

This container has no image/audio libraries, so the actual pixel decode is
STUBBED (clearly marked): ``decode_media`` computes real, deterministic
metadata from the bytes themselves (length, sha256, a fake WxH derived
from the content hash) and raises ``NotImplementedError`` if a real
decoder is requested. The Spark-side plumbing — schema, batch shape,
partition sizing — is real and tested; swapping the stub for
PIL/torchaudio is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def fake_decode_py(ref: str | None, payload: bytes | None) -> dict:
    """Deterministic stand-in for a pixel decode (STUB — see module doc).

    width/height derive from the content sha so tests are stable and the
    'decode' is a pure function of the bytes, like a real decode.
    """
    if payload is None:
        return {
            "media_ref": ref,
            "n_bytes": 0,
            "content_sha": None,
            "format": None,
            "width": None,
            "height": None,
        }
    sha = hashlib.sha256(payload).hexdigest()
    ext = (ref or "").rsplit(".", 1)[-1].lower() if ref and "." in ref else "bin"
    return {
        "media_ref": ref,
        "n_bytes": len(payload),
        "content_sha": sha,
        "format": ext,
        "width": int(sha[:4], 16) % 1920 + 1,
        "height": int(sha[4:8], 16) % 1080 + 1,
    }


def decode_media(
    df: DataFrame,
    ref_col: str = "media_ref",
    bytes_col: str = "payload",
    real_decoder: bool = False,
) -> DataFrame:
    """Arrow-batched media 'decode' → MEDIA_META_SCHEMA rows.

    ``real_decoder=True`` requires an image library this container lacks.
    """
    if real_decoder:
        raise NotImplementedError(
            "real pixel decode needs PIL/libvips — not available in this "
            "container; the deterministic stub is the supported path"
        )

    def process(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = [
                fake_decode_py(r, p)
                for r, p in zip(pdf[ref_col], pdf[bytes_col])
            ]
            yield pd.DataFrame(out, columns=[f.name for f in MEDIA_META_SCHEMA])

    return df.mapInPandas(process, schema=MEDIA_META_SCHEMA)


def frame_sample_refs(
    df: DataFrame, ref_col: str = "media_ref", n_frames: int = 4
) -> DataFrame:
    """Frame-sampling *plumbing*: emit n deterministic frame refs per
    media item (the real variant would decode timestamps; the partition
    shape — explode by a small constant factor — is what matters at
    scale). Pure column expressions, no Python."""
    return df.select(
        F.col(ref_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_frames - 1)),
                lambda i: F.concat_ws(
                    "#", F.col(ref_col), F.format_string("frame=%d", i)
                ),
            )
        ).alias("frame_idx", "frame_ref"),
    )


def media_payload_from_spans(df: DataFrame) -> DataFrame:
    """Pull media spans out of the documents table into a (media_ref,
    payload) relation; payload synthesized from the ref (deterministic
    stand-in for an object-store fetch, which at scale is an Iceberg
    binary column or a storage join)."""
    return (
        df.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(
            F.col("s.media_ref").alias("media_ref"),
            F.encode(F.col("s.media_ref"), "utf-8").alias("payload"),
        )
        .distinct()
    )
