"""Baseline JPEG codec fixtures (round 4) — mirrors the PNG five-filter
suite: encoder/decoder round-trips across the supported envelope
(gray / 4:4:4 / 4:2:0, restart intervals, odd sizes), header probes,
declared-unsupported rejections, and the Spark multimodal wiring
(extract_features(fake=False) on mixed PNG+JPEG payloads,
attach_media_metadata(dimensions=True), thumbnails)."""

import struct

import numpy as np
import pytest

from searchengine_spark.pipeline.jpeg import (
    jpeg_decode,
    jpeg_dimensions,
    jpeg_encode,
)
from searchengine_spark.pipeline.multimodal import (
    image_decode,
    image_dimensions,
    png_encode,
)


def _gradient(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 255 // max(w - 1, 1)), (y * 255 // max(h - 1, 1)),
         ((x + y) * 255 // max(h + w - 2, 1))],
        axis=-1,
    ).astype(np.uint8)


# ---------- round-trips ----------

@pytest.mark.parametrize("subsample", [False, True])
@pytest.mark.parametrize("restart", [0, 3])
def test_rgb_roundtrip(subsample, restart):
    img = _gradient(40, 56)
    buf = jpeg_encode(img, subsample=subsample, restart_interval=restart)
    out = jpeg_decode(buf)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    # smooth gradients survive Annex-K quantization within a few levels;
    # chroma subsampling costs a bit more
    assert err < (4.0 if subsample else 3.0), err


def test_gray_roundtrip():
    g = _gradient(40, 56)[:, :, 0]
    out = jpeg_decode(jpeg_encode(g))
    assert out.shape == g.shape and out.ndim == 2
    assert np.abs(out.astype(int) - g.astype(int)).mean() < 3.0


def test_flat_color_near_exact():
    flat = np.full((16, 16, 3), 137, np.uint8)
    out = jpeg_decode(jpeg_encode(flat))
    assert np.abs(out.astype(int) - flat.astype(int)).max() <= 2


def test_odd_sizes_with_subsampling():
    """Dimensions not divisible by the 16x16 MCU: padded during encode,
    cropped back on decode."""
    img = _gradient(33, 41)
    out = jpeg_decode(jpeg_encode(img, subsample=True))
    assert out.shape == (33, 41, 3)


def test_single_block_image():
    img = _gradient(8, 8)
    out = jpeg_decode(jpeg_encode(img))
    assert out.shape == (8, 8, 3)


def test_restart_markers_present_and_consumed():
    img = _gradient(48, 48)
    with_rst = jpeg_encode(img, subsample=True, restart_interval=1)
    without = jpeg_encode(img, subsample=True)
    # RSTn bytes actually exist in the stream
    assert any(
        with_rst[i] == 0xFF and 0xD0 <= with_rst[i + 1] <= 0xD7
        for i in range(2, len(with_rst) - 2)
    )
    a = jpeg_decode(with_rst)
    b = jpeg_decode(without)
    # restart segmentation must not change pixels (same coefficients,
    # only DC predictor resets)
    assert (a == b).all()


# ---------- header probes ----------

def test_dimensions_probe():
    img = _gradient(21, 77)
    buf = jpeg_encode(img)
    assert jpeg_dimensions(buf) == (77, 21, 3)
    g = jpeg_encode(img[:, :, 0])
    assert jpeg_dimensions(g) == (77, 21, 1)


def test_image_dimensions_dispatch():
    img = _gradient(10, 12)
    assert image_dimensions(jpeg_encode(img)) == (12, 10, "jpeg")
    assert image_dimensions(png_encode(img)) == (12, 10, "png")
    assert image_dimensions(b"\x00\x01garbage") == (None, None, None)


# ---------- declared-unsupported envelope ----------

def test_progressive_rejected_with_clear_error():
    """A SOF2 (progressive) header must raise NotImplementedError, not
    mis-decode."""
    img = _gradient(16, 16)
    buf = bytearray(jpeg_encode(img))
    i = buf.find(bytes([0xFF, 0xC0]))
    buf[i + 1] = 0xC2  # rewrite SOF0 -> SOF2
    with pytest.raises(NotImplementedError, match="progressive"):
        jpeg_decode(bytes(buf))
    # the dimensions probe still works on progressive streams
    assert jpeg_dimensions(bytes(buf)) == (16, 16, 3)


def test_non_jpeg_rejected():
    with pytest.raises(ValueError):
        jpeg_decode(b"not a jpeg at all")
    with pytest.raises(ValueError):
        jpeg_dimensions(b"nope")


def test_truncated_stream_raises():
    buf = jpeg_encode(_gradient(24, 24))
    with pytest.raises((ValueError, IndexError, struct.error)):
        jpeg_decode(buf[: len(buf) // 2])


def test_image_decode_dispatch_matches_formats():
    img = _gradient(17, 19)
    via_png = image_decode(png_encode(img))
    assert (via_png == img).all()  # PNG is lossless
    via_jpeg = image_decode(jpeg_encode(img))
    assert via_jpeg.shape == img.shape
    with pytest.raises(NotImplementedError):
        image_decode(b"RIFF....WAVE")  # audio container: declared stub


# ---------- Spark multimodal wiring ----------

@pytest.fixture(scope="module")
def media_df(spark):
    rows = []
    for i in range(6):
        img = _gradient(16 + i, 20 + i)
        payload = (
            jpeg_encode(img, subsample=bool(i % 2))
            if i < 4
            else png_encode(img)
        )
        rows.append((i, "image", bytearray(payload)))
    return spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )


def test_extract_features_real_mixed_formats(media_df):
    from searchengine_spark.pipeline.multimodal import extract_features

    feats = {
        r["doc_id"]: r["feature"]
        for r in extract_features(media_df, dim=8, fake=False).collect()
    }
    assert len(feats) == 6
    for i, f in feats.items():
        # feature[0]=width, [1]=height, [2]=channels
        assert f[0] == 20 + i and f[1] == 16 + i
        assert f[2] == 3.0


def test_attach_media_metadata_dimensions(media_df):
    from searchengine_spark.pipeline.multimodal import attach_media_metadata

    rows = {
        r["doc_id"]: r
        for r in attach_media_metadata(media_df, dimensions=True).collect()
    }
    for i, r in rows.items():
        assert r["width"] == 20 + i and r["height"] == 16 + i
        assert r["format"] == ("jpeg" if i < 4 else "png")


def test_thumbnails_from_jpeg(media_df, spark):
    from searchengine_spark.pipeline.multimodal import (
        image_thumbnails,
        png_decode,
    )

    thumbs = image_thumbnails(media_df, out_h=4, out_w=5).collect()
    assert len(thumbs) == 6
    for r in thumbs:
        img = png_decode(bytes(r["thumb_png"]))
        assert img.shape[:2] == (4, 5)
