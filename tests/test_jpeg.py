"""Baseline JPEG codec (``operators.jpeg``): lossy-roundtrip error
bounds per sampling mode, grayscale and restart-marker paths, header
consistency with the codec-free parser, rejection of non-baseline
streams, and the Spark feature/resize integration."""

from __future__ import annotations

import numpy as np
import pytest

from big_data_hadoop_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _smooth(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.dstack(
        [x * 255 // max(w - 1, 1), y * 255 // max(h - 1, 1),
         (x + y) * 255 // max(h + w - 2, 1)]
    ).astype(np.uint8)


def test_roundtrip_error_bounds_444_and_420():
    img = _smooth(33, 41)  # deliberately non-multiple-of-8
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 4 and err.max() < 20
    out2 = decode_jpeg(encode_jpeg(img, subsample=True))
    err2 = np.abs(out2.astype(int) - img.astype(int))
    assert out2.shape == img.shape
    assert err2.mean() < 6 and err2.max() < 35


def test_flat_color_nearly_exact():
    img = np.full((16, 24, 3), [120, 64, 200], dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_grayscale_and_restart_markers():
    img = _smooth(24, 31)
    g = decode_jpeg(encode_jpeg(img, gray=True))
    luma = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    assert g.shape == (24, 31, 3)
    assert (g[..., 0] == g[..., 1]).all() and (g[..., 1] == g[..., 2]).all()
    assert np.abs(g[..., 0].astype(float) - luma).max() < 10
    # restart markers: identical pixels to the unrestarted stream
    a = decode_jpeg(encode_jpeg(img, restart_interval=3))
    b = decode_jpeg(encode_jpeg(img))
    assert (a == b).all()


def test_header_parser_agrees_and_nonbaseline_rejected():
    from big_data_hadoop_spark.operators.multimodal import parse_jpeg_header

    img = _smooth(19, 27)
    payload = encode_jpeg(img)
    assert parse_jpeg_header(payload) == (27, 19)
    # flip SOF0 -> SOF2 (progressive): decode must refuse, header still parses
    prog = bytearray(payload)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(prog))
    assert parse_jpeg_header(bytes(prog)) == (27, 19)
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(payload[: len(payload) // 2])  # truncated entropy data


def test_spark_features_and_resize_on_jpeg(spark):
    from big_data_hadoop_spark.operators.multimodal import (
        extract_image_features,
        resize_media,
    )

    img = _smooth(40, 56)
    df = spark.createDataFrame(
        [(1, "image/jpeg", bytearray(encode_jpeg(img)))],
        "media_id long, media_type string, payload binary",
    )
    f = extract_image_features(df).collect()[0]
    assert (f["width"], f["height"]) == (56, 40)
    a = img.astype(float)
    # feature values within JPEG quantization error of the source stats
    assert abs(f["mean_r"] - a[..., 0].mean()) < 4
    luma = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    assert abs(f["luma_mean"] - luma.mean()) < 4
    r = resize_media(df, max_dim=14).collect()[0]
    assert (r["width"], r["height"]) == (14, 10)
    assert bytes(r["payload"][:2]) == b"\xff\xd8"
    small = decode_jpeg(bytes(r["payload"]))
    assert small.shape == (10, 14, 3)


def test_marker_in_entropy_stream_raises():
    """Corrupt entropy data containing FF <marker> must raise, not be
    silently consumed as pixel data."""
    img = _smooth(16, 16)
    payload = bytearray(encode_jpeg(img))
    # inject FF C4 into the entropy stream (after SOS, before EOI)
    sos = payload.find(b"\xff\xda")
    inject_at = sos + 30
    payload[inject_at : inject_at + 2] = b"\xff\xc4"
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))
