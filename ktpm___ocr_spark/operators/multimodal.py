"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The reference ingests raw image bytes into ``ctx.buffer`` and transforms
them with native libraries (sharp preprocess ``backend/utils/ocr.js:34-41``,
Tesseract OCR ``:50-65``). In the engine, media is an opaque
``BinaryType`` column with a typed metadata struct; decode / feature /
resize / frame-sample stages are Arrow-batched ``mapInPandas`` operators.

This container has no image/audio codec libraries, so COMPRESSED-format
decode is self-healing rather than hard-stubbed: ``decode_media(...,
real_decoder=True)`` probes for Pillow at import (``_probe_pil``) and
uses it when present; without it, uncompressed netpbm P6 rasters still
decode for real (no codec needed — ``decode_ppm_py``: numpy frombuffer →
reshape → channel statistics, driver-verified end-to-end) and only a
compressed payload on a codec-less host raises ``NotImplementedError``.
The default ``real_decoder=False`` path computes deterministic metadata
from the bytes themselves (length, sha256, a fake WxH derived from the
content hash) for stable tests/oracles.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _probe_pil():
    """Runtime probe for a real image codec (PIL/Pillow).

    This container ships no image libraries, so the probe returns None
    here — but on any host WITH Pillow installed, ``decode_media(...,
    real_decoder=True)`` routes through it automatically (self-healing:
    the stub disappears without a code change).  Module-level is correct
    for Spark: python workers re-import this module, so the probe re-runs
    executor-side rather than pickling a driver-side result.
    Reference: ``backend/utils/ocr.js:34-41`` (sharp preprocess).
    """
    try:
        from PIL import Image  # noqa: PLC0415 — probe must be guarded

        return Image
    except ImportError:
        return None


PIL_IMAGE = _probe_pil()

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


def real_decode_py(ref: str | None, payload: bytes | None) -> dict:
    """REAL metadata decode, self-healing across hosts:

    - Pillow present → any codec Pillow knows (JPEG/PNG/…); corrupt
      payloads yield a NULL-width row (web-crawl reality), not a crash.
    - Pillow absent (this container) → codec-free netpbm P6 fallback via
      :func:`decode_ppm_py`; a COMPRESSED payload without a codec raises
      ``NotImplementedError`` — honestly, per-payload, instead of the old
      eager plan-time raise.
    """
    if payload is None:
        return fake_decode_py(ref, None)
    sha = hashlib.sha256(payload).hexdigest()
    if PIL_IMAGE is not None:
        import io

        try:
            img = PIL_IMAGE.open(io.BytesIO(payload))
            w, h = img.size
            fmt = (img.format or "unknown").lower()
        except Exception:  # noqa: BLE001 — corrupt media must not kill a batch
            w = h = fmt = None
    elif payload.startswith(b"P6"):
        try:
            w, h, _ = decode_ppm_py(payload)
            fmt = "ppm"
        except ValueError:
            w = h = fmt = None
    else:
        raise NotImplementedError(
            "compressed-codec pixel decode needs PIL/Pillow — not in this "
            "container; netpbm P6 is the codec-free fallback "
            "(install Pillow and this path activates automatically)"
        )
    return {
        "media_ref": ref,
        "n_bytes": len(payload),
        "content_sha": sha,
        "format": fmt,
        "width": w,
        "height": h,
    }


def decode_media(
    df: DataFrame,
    ref_col: str = "media_ref",
    bytes_col: str = "payload",
    real_decoder: bool = False,
) -> DataFrame:
    """Arrow-batched media 'decode' → MEDIA_META_SCHEMA rows.

    ``real_decoder=True`` uses Pillow when importable (self-healing probe
    :func:`_probe_pil`) and the codec-free P6 decoder otherwise; the
    default keeps the deterministic stub for stable tests/oracles.
    """
    decode = real_decode_py if real_decoder else fake_decode_py

    def process(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = [
                decode(r, None if p is None else bytes(p))
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


# ---------------- REAL pixel decode: netpbm P6 (PPM) ----------------
#
# "No image libraries in this container" is true for compressed formats
# (JPEG/PNG need a codec), but an uncompressed raster needs only numpy:
# netpbm P6 (https://netpbm.sourceforge.net/doc/ppm.html) is an ASCII
# header (magic, width, height, maxval) followed by raw RGB bytes. This
# upgrades P3 from stub-only to real-decode-for-raw-rasters: binary in,
# pixel array out, per-channel statistics computed from actual pixels —
# the same mapInPandas plumbing a JPEG decoder would use, exercised for
# real. Compressed formats remain honestly stubbed (decode_media).

PPM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
    ]
)


def decode_ppm_py(payload: bytes):
    """Parse one P6 image → (width, height, HxWx3 uint8 array).
    Raises ValueError on malformed input (magic/short payload)."""
    import numpy as np

    import re

    if payload is None or not payload.startswith(b"P6"):
        raise ValueError("not a P6 netpbm payload")
    # header = magic, width, height, maxval, then exactly ONE whitespace
    # byte before the raster (netpbm spec) — a bytes.split() would also
    # consume whitespace-valued PIXEL bytes (\n = 10 is a legal pixel
    # value), so the raster boundary must come from the header regex,
    # not tokenization. Comments are out of scope for the deterministic
    # pipeline.
    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", payload)
    if m is None:
        raise ValueError("truncated P6 header")
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval != 255:
        raise ValueError("only maxval=255 supported (8-bit channels)")
    raster = payload[m.end() : m.end() + w * h * 3]
    if len(raster) < w * h * 3:
        raise ValueError("short raster")
    arr = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
    return w, h, arr


def decode_ppm_stats(
    df: DataFrame, ref_col: str = "media_ref", bytes_col: str = "payload"
) -> DataFrame:
    """Arrow-batched REAL decode of P6 payloads → per-image dimensions +
    exact per-channel integer pixel sums (engine-portable: no floats).
    Malformed payloads yield a NULL-width row rather than failing the
    batch (the corrupt-file reality of a web-scale media crawl)."""

    def process(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for r, p in zip(pdf[ref_col], pdf[bytes_col]):
                try:
                    w, h, arr = decode_ppm_py(bytes(p) if p is not None else None)
                    s = arr.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                    rows.append(
                        {
                            "media_ref": r,
                            "width": w,
                            "height": h,
                            "sum_r": int(s[0]),
                            "sum_g": int(s[1]),
                            "sum_b": int(s[2]),
                        }
                    )
                except ValueError:
                    rows.append(
                        {
                            "media_ref": r,
                            "width": None,
                            "height": None,
                            "sum_r": None,
                            "sum_g": None,
                            "sum_b": None,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in PPM_STATS_SCHEMA])

    return df.mapInPandas(process, schema=PPM_STATS_SCHEMA)
