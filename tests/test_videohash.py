"""Perceptual video tier (``operators.videohash``) + the animated-GIF
codec underneath it (``multimodal.decode_gif_frames`` / ``encode_gif``):
compositing semantics pinned against hand-built expectations (offsets,
transparency, disposal 1/2/3, clipping), the frame-sampling/hash
contract replicated in pure Python, and clip pairing verified against
brute force."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from big_data_hadoop_spark.operators.imagehash import dhash_pixels
from big_data_hadoop_spark.operators.multimodal import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
)
from big_data_hadoop_spark.operators.videohash import (
    documents_as_video,
    video_dhash,
    video_dhash_pairs,
    video_neardup_pairs,
)

RAMP = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)


def _rng_frames(seed, k, h=6, w=8):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, size=(h, w), dtype=np.uint8) for _ in range(k)]


def test_encode_decode_roundtrip_and_frame1_compat():
    frames = _rng_frames(1, 5)
    payload = encode_gif(frames)
    dec = decode_gif_frames(payload)
    assert len(dec) == 5
    assert all(np.array_equal(d, RAMP[f]) for d, f in zip(dec, frames))
    # the frame-1 decoder sees the first image unchanged
    assert np.array_equal(decode_gif(payload), RAMP[frames[0]])
    assert len(decode_gif_frames(payload, max_frames=3)) == 3


def _gce(disposal: int, transparent: int | None) -> bytes:
    flags = (disposal & 0x07) << 2 | (1 if transparent is not None else 0)
    return bytes([0x21, 0xF9, 4, flags, 0, 0, transparent or 0, 0])


def _image_block(idx: np.ndarray, left: int, top: int) -> bytes:
    h, w = idx.shape
    out = bytes([0x2C]) + struct.pack("<HHHH", left, top, w, h) + bytes([0])
    out += bytes([8])
    acc = nbits = 0
    stream = bytearray()
    codes = []
    for px in idx.reshape(-1):
        codes += [256, int(px)]
    codes.append(257)
    for code in codes:
        acc |= code << nbits
        nbits += 9
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        stream.append(acc & 0xFF)
    for i in range(0, len(stream), 255):
        out += bytes([len(stream[i:i + 255])]) + bytes(stream[i:i + 255])
    return out + bytes([0])


def _gif(w, h, bg, blocks) -> bytes:
    head = b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x87, bg, 0])
    return head + RAMP.tobytes() + b"".join(blocks) + bytes([0x3B])


def test_compositing_offsets_transparency_and_disposal():
    # screen 4x6, background color 10
    patch = np.full((2, 3), 200, np.uint8)
    patch2 = np.full((2, 2), 7, np.uint8)
    patch2[0, 0] = 99  # one pixel marked transparent below
    payload = _gif(
        6, 4, 10,
        [
            # frame 1: patch at (1,1), disposal 2 (restore region to bg)
            _gce(2, None), _image_block(patch, 1, 1),
            # frame 2: patch2 at (4,2) with transparent index 99,
            # disposal 3 (restore previous canvas afterwards)
            _gce(3, 99), _image_block(patch2, 4, 2),
            # frame 3: full-bleed replace at origin
            _gce(1, None), _image_block(np.full((4, 6), 30, np.uint8), 0, 0),
        ],
    )
    f = decode_gif_frames(payload)
    assert len(f) == 3
    bg = RAMP[10]
    want1 = np.broadcast_to(bg, (4, 6, 3)).copy()
    want1[1:3, 1:4] = RAMP[200]
    assert np.array_equal(f[0], want1)
    # disposal 2 wiped frame 1's region back to bg BEFORE frame 2
    want2 = np.broadcast_to(bg, (4, 6, 3)).copy()
    want2[2:4, 4:6] = RAMP[7]
    want2[2, 4] = bg  # transparent pixel leaves the canvas
    assert np.array_equal(f[1], want2)
    # disposal 3 restored the pre-frame-2 canvas, then full replace
    assert np.array_equal(f[2], RAMP[np.full((4, 6), 30, np.uint8)])


def test_out_of_bounds_frame_is_clipped():
    patch = np.full((3, 3), 50, np.uint8)
    payload = _gif(4, 4, 0, [_image_block(patch, 2, 2)])
    f = decode_gif_frames(payload)
    want = np.zeros((4, 4, 3), np.uint8)
    want[2:4, 2:4] = RAMP[50]
    assert np.array_equal(f[0], want)


def test_resize_gif_palette_preserving(spark):
    from big_data_hadoop_spark.operators.multimodal import (
        resize_gif,
        resize_media,
    )

    frame = _rng_frames(17, 1, h=12, w=16)[0]
    payload = encode_gif(frame)
    nw, nh, npay = resize_gif(payload, 8)
    assert (nw, nh) == (8, 6)
    # expected: pixel-center nearest-neighbor over the INDEX array,
    # looked up in the same (grayscale) palette
    ri = ((np.arange(6) + 0.5) * 12 / 6).astype(int)
    ci = ((np.arange(8) + 0.5) * 16 / 8).astype(int)
    assert np.array_equal(decode_gif(npay), RAMP[frame[ri][:, ci]])
    # animated input -> first frame resized
    anim = encode_gif(_rng_frames(18, 3, h=12, w=16))
    _, _, npay2 = resize_gif(anim, 8)
    assert decode_gif(npay2).shape == (6, 8, 3)
    # and the media operator routes GIFs through the real path now
    df = spark.createDataFrame(
        [(1, "image/gif", bytearray(payload))],
        "media_id long, media_type string, payload binary",
    )
    row = resize_media(df, max_dim=8).collect()[0]
    assert (row.width, row.height) == (8, 6)
    assert np.array_equal(
        decode_gif(bytes(row.payload)), RAMP[frame[ri][:, ci]]
    )


def test_video_dhash_contract_and_null(spark):
    frames = _rng_frames(5, 3, h=8, w=9)
    payload = encode_gif(frames)
    df = spark.createDataFrame(
        [
            (1, "image/gif", bytearray(payload)),
            (2, "video/mp4", bytearray(b"\x00\x00\x00\x18ftypmp42junk")),
            (3, "image/gif", None),
        ],
        "media_id long, media_type string, payload binary",
    )
    rows = video_dhash(df, n_frames=4).collect()
    got = {(r.media_id, r.frame_no): r.dhash for r in rows}
    # undecodable clips contribute NO rows
    assert {m for m, _ in got} == {1}
    # sampling: floor((i+.5)*k/n) over k=3 decoded frames
    for i in range(4):
        src = int((i + 0.5) * 3 / 4)
        assert got[(1, i)] == dhash_pixels(RAMP[frames[src]])


def test_video_pairs_match_brute_force(spark):
    base = _rng_frames(9, 4, h=8, w=9)
    reenc = [f.copy() for f in base]  # byte-identical re-encode
    half = base[:2] + _rng_frames(10, 2, h=8, w=9)  # shares 2 frames
    other = _rng_frames(11, 4, h=8, w=9)
    clips = {1: base, 2: reenc, 3: half, 4: other}
    df = spark.createDataFrame(
        [(k, "image/gif", bytearray(encode_gif(v))) for k, v in clips.items()],
        "media_id long, media_type string, payload binary",
    )
    n_frames, radius, min_match = 4, 2, 2
    got = {
        (r.id_a, r.id_b): (r.n_frame_matches, r.min_hamming)
        for r in video_dhash_pairs(
            df, n_frames=n_frames, max_hamming=radius,
            min_matching_frames=min_match,
        ).collect()
    }
    # brute-force replication
    fps = {}
    for k, v in clips.items():
        for i in range(n_frames):
            src = int((i + 0.5) * len(v) / n_frames)
            fps[(k, i)] = dhash_pixels(RAMP[v[src]])
    want = {}
    ids = sorted(clips)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            matches = [
                bin((fps[(a, i)] ^ fps[(b, j)]) & ((1 << 64) - 1)).count("1")
                for i in range(n_frames)
                for j in range(n_frames)
                if bin(
                    (fps[(a, i)] ^ fps[(b, j)]) & ((1 << 64) - 1)
                ).count("1") <= radius
            ]
            if len(matches) >= min_match:
                want[(a, b)] = (len(matches), min(matches))
    assert got == want
    assert (1, 2) in got  # the re-encode matches on every frame


def test_video_matches_against_brute_force(spark):
    from big_data_hadoop_spark.operators.videohash import (
        video_matches_against,
    )

    hist_clips = {1: _rng_frames(51, 4, h=8, w=9),
                  2: _rng_frames(52, 4, h=8, w=9)}
    batch_clips = {
        100: hist_clips[1][:2] + _rng_frames(53, 2, h=8, w=9),  # 2 shared
        101: hist_clips[2][:1] + _rng_frames(54, 3, h=8, w=9),  # 1 shared
        102: _rng_frames(55, 4, h=8, w=9),                      # none
    }
    def fh_df(clips):
        rows = [
            (cid, i, dhash_pixels(RAMP[f]))
            for cid, frames in clips.items()
            for i, f in enumerate(frames)
        ]
        return spark.createDataFrame(
            rows, "media_id long, frame_no int, dhash long"
        )
    radius, m = 2, 2
    got = {
        r.media_id
        for r in video_matches_against(
            fh_df(batch_clips), fh_df(hist_clips),
            max_hamming=radius, min_matching_frames=m,
        ).collect()
    }
    want = set()
    for bid, bframes in batch_clips.items():
        bh = [dhash_pixels(RAMP[f]) for f in bframes]
        for hframes in hist_clips.values():
            hh = [dhash_pixels(RAMP[f]) for f in hframes]
            n = sum(
                1
                for x in bh
                for y in hh
                if bin((x ^ y) & ((1 << 64) - 1)).count("1") <= radius
            )
            if n >= m:
                want.add(bid)
    assert got == want and 100 in got and 102 not in got


def test_max_frame_df_valve_drops_boilerplate_frames(spark):
    """The boilerplate-frame valve (round 10): two frame-hash values
    shared by EVERY clip (intro/outro cards) make all C(n,2) pairs
    'match' without the valve; with it, only the genuinely-similar
    pair (two shared low-df frames) survives — equal to brute force
    over the df-filtered frame set."""
    from big_data_hadoop_spark.operators.videohash import (
        video_matches_against,
        video_neardup_pairs,
    )

    INTRO, OUTRO = 1 << 20, 1 << 40
    n = 10
    clips = {}
    for c in range(1, n + 1):
        clips[c] = {0: INTRO, 1: (1 << c) | 1, 2: (1 << c) | 3, 3: OUTRO}
    # a genuine near-dup pair: clips 1 and 2 also share their two
    # middle frames (df=2, under any sane cap)
    clips[2][1], clips[2][2] = clips[1][1], clips[1][2]

    def fh_df(cs):
        rows = [
            (cid, i, h)
            for cid, frames in cs.items()
            for i, h in sorted(frames.items())
        ]
        return spark.createDataFrame(
            rows, "media_id long, frame_no int, dhash long"
        )

    kw = dict(max_hamming=0, min_matching_frames=2)
    unvalved = video_neardup_pairs(fh_df(clips), **kw)
    assert unvalved.count() == n * (n - 1) // 2  # quadratic output
    valved = {
        (r.id_a, r.id_b)
        for r in video_neardup_pairs(
            fh_df(clips), max_frame_df=5, **kw
        ).collect()
    }
    assert valved == {(1, 2)}
    # a value at exactly the cap is kept
    at_cap = {
        (r.id_a, r.id_b)
        for r in video_neardup_pairs(
            fh_df(clips), max_frame_df=n, **kw
        ).collect()
    }
    assert len(at_cap) == n * (n - 1) // 2

    # incremental tier: history carries the same boilerplate
    hist = {100 + c: dict(clips[c]) for c in range(1, n + 1)}
    batch = {200: {0: INTRO, 1: 1 << 55, 2: 1 << 56, 3: OUTRO},
             201: dict(clips[1])}
    got = {
        r.media_id
        for r in video_matches_against(
            fh_df(batch), fh_df(hist), max_frame_df=5, **kw
        ).collect()
    }
    # 200 shares only boilerplate -> no match; 201 is a true re-encode
    # of stored clip 101 (its identity frames have df 2 per side)
    assert got == {201}
    with pytest.raises(ValueError, match="max_frame_df"):
        video_neardup_pairs(fh_df(clips), max_frame_df=0, **kw)


def test_video_clip_fingerprint_exact_tier(spark, tmp_path):
    from big_data_hadoop_spark.operators.fingerprint_store import (
        fingerprint_store_build,
        fingerprint_store_load,
    )
    from big_data_hadoop_spark.operators.videohash import (
        video_clip_fingerprint,
    )

    base = _rng_frames(41, 4, h=8, w=9)
    changed = [f.copy() for f in base]
    changed[2] = _rng_frames(42, 1, h=8, w=9)[0]
    df = spark.createDataFrame(
        [
            (1, "image/gif", bytearray(encode_gif(base))),
            (2, "image/gif", bytearray(encode_gif(base))),  # re-encode
            (3, "image/gif", bytearray(encode_gif(changed))),
        ],
        "media_id long, media_type string, payload binary",
    )
    fh = video_dhash(df, n_frames=4)
    fps = {r.media_id: r.fp for r in video_clip_fingerprint(fh).collect()}
    assert fps[1] == fps[2] != fps[3]
    # composes with the persisted store at radius 0 = exact video dedup
    st = fingerprint_store_build(
        spark,
        video_clip_fingerprint(fh),
        str(tmp_path / "s"),
        max_hamming=0,
        id_col="media_id",
    )
    assert st["accepted"] == 2 and st["rejected_within_batch"] == 1
    kept = {
        r.media_id
        for r in fingerprint_store_load(spark, str(tmp_path / "s")).collect()
    }
    assert kept == {1, 3}  # min id survives the identical pair


def test_validation(spark):
    with pytest.raises(ValueError, match="max_hamming"):
        video_neardup_pairs(None, max_hamming=4)
    with pytest.raises(ValueError, match="min_matching_frames"):
        video_neardup_pairs(None, max_hamming=2, min_matching_frames=0)
    with pytest.raises(ValueError, match="n_frames"):
        video_dhash(None, n_frames=0)


def test_probe_r07_matches_pure_python_replication(spark):
    """The r07 probe composition (render -> composite-decode ->
    sample+hash -> drop-constant band pairs -> clip rollup) replicated
    end-to-end in pure Python/numpy over the smoke corpus."""
    from big_data_hadoop_spark.probes import QUERIES

    got = {
        (r.id_a, r.id_b): (r.n_frame_matches, r.min_hamming)
        for r in QUERIES["r07_video_gif_neardup"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).collect()
    }
    per, nf = 12 * 12, 4
    fps = {}
    for did, text in docs.items():
        raw = (text or "").encode("utf-8")[: per * nf]
        buf = np.zeros(per * nf, dtype=np.uint8)
        buf[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
        for i in range(nf):
            # floor((i+0.5)*k/n) with k == n == nf is the identity
            h = dhash_pixels(
                RAMP[buf[i * per:(i + 1) * per].reshape(12, 12)]
            )
            if h != 0:  # drop_constant
                fps[(did, i)] = h
    want = {}
    ids = sorted(docs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            ms = [
                bin((fps[(a, i)] ^ fps[(b, j)]) & ((1 << 64) - 1)).count("1")
                for i in range(nf)
                for j in range(nf)
                if (a, i) in fps and (b, j) in fps
            ]
            ms = [m for m in ms if m <= 1]
            if len(ms) >= 2:
                want[(a, b)] = (len(ms), min(ms))
    assert got == want and len(got) > 0


def test_documents_as_video_e2e(spark):
    long_a = "the quick brown fox jumps over the lazy dog " * 20
    rows = [(1, long_a), (2, long_a), (3, "other content " * 40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    media = documents_as_video(docs, n_frames=4, width=8, height=8)
    out = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert out[1] == out[2] and out[1] != out[3]
    assert len(decode_gif_frames(out[1])) == 4
    pairs = {
        (r.id_a, r.id_b)
        for r in video_dhash_pairs(
            media, n_frames=4, max_hamming=0, min_matching_frames=4
        ).collect()
    }
    assert (1, 2) in pairs
