"""Perceptual image near-dup tier (``operators.imagehash``): the dHash
bit contract is replicated by an INDEPENDENT pure-Python oracle (loops,
no shared code with the operator's numpy path), pairs and incremental
matches are verified against brute-force Hamming over the collected
fingerprints, and the full decode → hash → band pipeline runs on real
BMP/PNG bytes through Spark."""

from __future__ import annotations

import numpy as np
import pytest

from big_data_hadoop_spark.operators.imagehash import (
    dhash_pixels,
    documents_as_images,
    image_dhash,
    image_dhash_pairs,
    image_matches_against,
    image_neardup_pairs,
)
from big_data_hadoop_spark.operators.multimodal import (
    decode_bmp,
    encode_bmp,
    encode_png,
)


def _ref_dhash(arr) -> int:
    """Independent replication of the module-docstring contract:
    Rec.601 luma, pixel-center nearest-neighbor to 9 cols x 8 rows,
    bit r*8+c = 1 iff right strictly brighter, LSB packing, signed."""
    h, w = len(arr), len(arr[0])
    v = 0
    for r in range(8):
        sr = int((r + 0.5) * h / 8)
        for c in range(8):
            sl = int((c + 0.5) * w / 9)
            sr_c = int((c + 1.5) * w / 9)
            def luma(y, x):
                px = arr[y][x]
                return 0.299 * px[0] + 0.587 * px[1] + 0.114 * px[2]
            if luma(sr, sr_c) > luma(sr, sl):
                v |= 1 << (r * 8 + c)
    return v - (1 << 64) if v >= 1 << 63 else v


def _brute_pairs(fps: dict[int, int], radius: int) -> set[tuple]:
    out = set()
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1")
            if ham <= radius:
                out.add((a, b, ham))
    return out


def _rng_img(rng, h, w):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_dhash_matches_independent_oracle_across_shapes():
    rng = np.random.default_rng(7)
    for h, w in [(8, 9), (1, 1), (3, 5), (16, 16), (40, 23), (9, 8)]:
        arr = _rng_img(rng, h, w)
        assert dhash_pixels(arr) == _ref_dhash(arr.tolist()), (h, w)


def test_dhash_oracle_property():
    from hypothesis import given, settings
    from hypothesis import strategies as hst

    @given(
        hst.integers(1, 30), hst.integers(1, 30),
        hst.integers(0, 2**32 - 1),
    )
    @settings(max_examples=30, deadline=None)
    def check(h, w, seed):
        arr = np.random.default_rng(seed).integers(
            0, 256, (h, w, 3), np.uint8
        )
        assert dhash_pixels(arr) == _ref_dhash(arr.tolist())

    check()


def test_dhash_exact_bits_on_identity_grid():
    # 8 rows x 9 cols: the nearest-neighbor maps are the identity, so
    # each bit is exactly one adjacent comparison. Gray ramp rising
    # only in row 0 sets bits 0..7 and nothing else.
    arr = np.zeros((8, 9, 3), dtype=np.uint8)
    arr[0, :, :] = (np.arange(9, dtype=np.uint8) * 10)[:, None]
    assert dhash_pixels(arr) == 0xFF
    # flipping ONE comparison flips exactly one bit
    arr2 = arr.copy()
    arr2[0, 4] = arr2[0, 3]  # kill the strict rise at (r=0, c=3)
    assert dhash_pixels(arr2) == 0xFF ^ (1 << 3)


def test_dhash_invariances():
    rng = np.random.default_rng(11)
    arr = _rng_img(rng, 12, 12)
    # constant image -> ties everywhere -> 0
    assert dhash_pixels(np.full((6, 6, 3), 77, np.uint8)) == 0
    # uniform brightness shift never flips a strict comparison
    small = (arr // 2).astype(np.uint8)
    assert dhash_pixels(small) == dhash_pixels(small + 40)
    # nearest-neighbor 2x upsample preserves the sampled grid exactly
    up = np.repeat(np.repeat(arr, 2, axis=0), 2, axis=1)
    assert dhash_pixels(up) == dhash_pixels(arr)


def test_image_dhash_spark_real_codecs_and_null(spark):
    rng = np.random.default_rng(23)
    bmp_arr = _rng_img(rng, 10, 13)
    png_arr = _rng_img(rng, 9, 7)
    rows = [
        (1, "image/bmp", bytearray(encode_bmp(bmp_arr))),
        (2, "image/png", bytearray(encode_png(png_arr))),
        (3, "application/octet-stream", bytearray(b"\x00\x01notanimage")),
        (4, "image/bmp", None),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"
    )
    got = {r.media_id: r.dhash for r in image_dhash(df).collect()}
    assert got[1] == dhash_pixels(bmp_arr)
    assert got[2] == dhash_pixels(png_arr)
    assert got[3] is None and got[4] is None
    # round-trip sanity: the payload really decodes to the array hashed
    assert np.array_equal(decode_bmp(bytes(rows[0][2])), bmp_arr)


def test_image_neardup_pairs_equals_brute_force(spark):
    # 8x9 grayscale-crafted images so each raster edit is one bit:
    # base, exact copy, 1-bit, 3-bit, 4-bit (outside radius), random far
    base = np.zeros((8, 9, 3), dtype=np.uint8)
    base[:, :, :] = (np.arange(9, dtype=np.uint8) * 9)[None, :, None]
    def edit(n_bits):
        a = base.copy()
        for r in range(n_bits):
            a[r, 4] = a[r, 3]  # kill one strict rise per edited row
        return a
    rng = np.random.default_rng(5)
    imgs = {
        10: base, 11: base.copy(), 12: edit(1), 13: edit(3), 14: edit(4),
        15: _rng_img(rng, 8, 9),
    }
    fps = {k: dhash_pixels(v) for k, v in imgs.items()}
    df = spark.createDataFrame(
        [(k, "image/bmp", bytearray(encode_bmp(v))) for k, v in imgs.items()]
        + [(99, "x", bytearray(b"junk"))],  # NULL fp must not pair
        "media_id long, media_type string, payload binary",
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in image_dhash_pairs(df, max_hamming=3).collect()
    }
    want = _brute_pairs(fps, 3)
    assert got == want
    assert (10, 11, 0) in got and (10, 12, 1) in got and (10, 13, 3) in got
    assert not any(14 in (a, b) and 10 in (a, b) for a, b, _ in got)
    assert not any(99 in (a, b) for a, b, _ in got)


def test_image_matches_against_brute_force(spark):
    rng = np.random.default_rng(31)
    hist_imgs = {i: _rng_img(rng, 8, 9) for i in range(3)}
    batch_imgs = {
        100: hist_imgs[0].copy(),          # exact re-ingest -> hit
        101: _rng_img(rng, 8, 9),          # far -> miss (w.h.p.)
    }
    hist_fp = spark.createDataFrame(
        [(i, dhash_pixels(v)) for i, v in hist_imgs.items()]
        + [(9, None)],  # NULL history row must be ignored
        "media_id long, dhash long",
    )
    batch_fp = spark.createDataFrame(
        [(i, dhash_pixels(v)) for i, v in batch_imgs.items()],
        "media_id long, dhash long",
    )
    got = {r.media_id for r in
           image_matches_against(batch_fp, hist_fp, max_hamming=3).collect()}
    want = set()
    for bid, bv in batch_imgs.items():
        bf = dhash_pixels(bv)
        for hv in hist_imgs.values():
            ham = bin((bf ^ dhash_pixels(hv)) & ((1 << 64) - 1)).count("1")
            if ham <= 3:
                want.add(bid)
    assert got == want and 100 in got


def test_radius_validation():
    # frames unused: the radius check must fail before any job
    with pytest.raises(ValueError, match="max_hamming"):
        image_neardup_pairs(None, max_hamming=4)
    with pytest.raises(ValueError, match="max_hamming"):
        image_matches_against(None, None, max_hamming=4)


def test_probe_r04_matches_pure_python_replication(spark):
    """The r04 probe composition (render -> decode -> dHash -> band
    pairs at radius 2 -> degree rollup) replicated end-to-end in pure
    Python/numpy over the smoke corpus."""
    from big_data_hadoop_spark.probes import QUERIES

    got = [
        (r.media_id, r.n_neighbors, r.min_hamming)
        for r in QUERIES["r04_image_dhash_neardup"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    ]

    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).collect()
    }
    n = 16 * 16 * 3
    fps = {}
    for did, text in docs.items():
        raw = (text or "").encode("utf-8")[:n]
        buf = np.zeros(n, dtype=np.uint8)
        buf[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
        fps[did] = _ref_dhash(buf.reshape(16, 16, 3).tolist())
    neigh: dict[int, list[int]] = {}
    for a, b, ham in _brute_pairs(fps, 2):
        neigh.setdefault(a, []).append(ham)
        neigh.setdefault(b, []).append(ham)
    want = sorted(
        ((k, len(v), min(v)) for k, v in neigh.items()),
        key=lambda t: (-t[1], t[0]),
    )[:100]
    assert got == want and len(got) > 0


def test_documents_as_images_e2e(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup
        (3, "completely different content with other bytes 012345"),
        (4, None),  # NULL text -> all-zero raster, hashes to 0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    media = documents_as_images(docs, width=8, height=8)
    out = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert out[1] == out[2] and out[1] != out[3]
    assert decode_bmp(out[4]).sum() == 0
    pairs = {
        (r.id_a, r.id_b)
        for r in image_dhash_pairs(media, max_hamming=0).collect()
    }
    assert (1, 2) in pairs
