"""Multimodal plumbing: stubbed decode over Arrow batches, frame sampling."""

from __future__ import annotations

import hashlib

import pytest

from ktpm___ocr_spark.corpus import generate_df
from ktpm___ocr_spark.operators import multimodal
from ktpm___ocr_spark.operators.multimodal import (
    decode_media,
    frame_sample_refs,
    media_payload_from_spans,
)


def test_decode_media_stub_deterministic(spark):
    df = spark.createDataFrame(
        [("a.png", b"bytes-a"), ("b.jpg", b"bytes-b"), ("c", None)],
        "media_ref string, payload binary",
    )
    got = {r["media_ref"]: r.asDict() for r in decode_media(df).collect()}
    sha_a = hashlib.sha256(b"bytes-a").hexdigest()
    assert got["a.png"]["content_sha"] == sha_a
    assert got["a.png"]["n_bytes"] == 7
    assert got["a.png"]["format"] == "png"
    assert 1 <= got["a.png"]["width"] <= 1920
    assert got["c"]["n_bytes"] == 0 and got["c"]["content_sha"] is None
    # deterministic across runs
    again = {r["media_ref"]: r.asDict() for r in decode_media(df).collect()}
    assert got == again


def test_real_decoder_p6_fallback_decodes_without_pil(spark):
    """real_decoder=True must work codec-free for netpbm P6 payloads —
    the container fallback of the self-healing probe."""
    payload = b"P6\n2 1\n255\n" + bytes([10, 20, 30, 40, 50, 60])
    df = spark.createDataFrame(
        [("img.ppm", payload)], "media_ref string, payload binary"
    )
    row = decode_media(df, real_decoder=True).first()
    assert (row["width"], row["height"]) == (2, 1)
    assert row["n_bytes"] == len(payload)
    if multimodal.PIL_IMAGE is None:
        assert row["format"] == "ppm"


@pytest.mark.skipif(
    multimodal.PIL_IMAGE is not None, reason="Pillow present — no stub path"
)
def test_real_decoder_compressed_raises_without_pil(spark):
    df = spark.createDataFrame(
        [("a.jpg", b"\xff\xd8\xff\xe0 not decodable here")],
        "media_ref string, payload binary",
    )
    with pytest.raises(Exception, match="NotImplementedError|Pillow|PIL"):
        decode_media(df, real_decoder=True).collect()


@pytest.mark.skipif(
    multimodal.PIL_IMAGE is None, reason="Pillow absent in this container"
)
def test_real_decoder_uses_pil_when_available(spark):
    """Self-healing path: on a host with Pillow the real decoder reads
    true dimensions from a compressed codec (PNG here)."""
    import io

    img = multimodal.PIL_IMAGE.new("RGB", (5, 3))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    df = spark.createDataFrame(
        [("t.png", buf.getvalue())], "media_ref string, payload binary"
    )
    row = decode_media(df, real_decoder=True).first()
    assert (row["width"], row["height"], row["format"]) == (5, 3, "png")


def test_media_extraction_from_corpus(spark):
    docs = generate_df(spark, 50, seed=42)
    media = media_payload_from_spans(docs)
    n = media.count()
    assert n > 0
    decoded = decode_media(media)
    assert decoded.count() == n
    assert decoded.filter("content_sha is null").count() == 0


def test_frame_sample_explodes(spark):
    df = spark.createDataFrame([("v1",), ("v2",)], "media_ref string")
    got = frame_sample_refs(df, n_frames=3)
    assert got.count() == 6
    rows = got.filter("media_ref = 'v1'").orderBy("frame_idx").collect()
    assert [r["frame_ref"] for r in rows] == [
        "v1#frame=0", "v1#frame=1", "v1#frame=2"
    ]


def test_ppm_decode_real_pixels(spark):
    """The P6 decoder reads ACTUAL pixel bytes: a 2x1 image with known
    RGB values must produce exactly those channel sums."""
    from ktpm___ocr_spark.operators.multimodal import decode_ppm_py, decode_ppm_stats

    payload = b"P6\n2 1\n255\n" + bytes([10, 20, 30, 40, 50, 60])
    w, h, arr = decode_ppm_py(payload)
    assert (w, h) == (2, 1)
    assert arr.tolist() == [[[10, 20, 30], [40, 50, 60]]]

    df = spark.createDataFrame([("img.ppm", payload)], "media_ref string, payload binary")
    row = decode_ppm_stats(df).first()
    assert (row["width"], row["height"]) == (2, 1)
    assert (row["sum_r"], row["sum_g"], row["sum_b"]) == (50, 70, 90)


def test_ppm_decode_malformed_yields_null_row(spark):
    from ktpm___ocr_spark.operators.multimodal import decode_ppm_stats

    df = spark.createDataFrame(
        [
            ("bad-magic.ppm", b"JFIF....not a ppm"),
            ("short.ppm", b"P6\n4 4\n255\nxy"),
            ("null.ppm", None),
        ],
        "media_ref string, payload binary",
    )
    rows = {r["media_ref"]: r["width"] for r in decode_ppm_stats(df).collect()}
    assert rows == {"bad-magic.ppm": None, "short.ppm": None, "null.ppm": None}
