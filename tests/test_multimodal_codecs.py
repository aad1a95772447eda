"""Real BMP/WAV decode through the Spark multimodal pipeline (VERDICT
r2 #3): genuine format bytes go through ``mapInPandas`` and the
extracted metadata / resized pixels / sampled frames are verified
against independently constructed expectations. The stub path remains
only for codec-needing formats and is exercised alongside."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from big_data_hadoop_spark.operators.multimodal import (
    decode_bmp,
    encode_bmp,
    extract_media_meta,
    parse_bmp_header,
    parse_wav_header,
    resize_bmp,
    resize_media,
    sample_frames,
)


def _gradient_bmp(w: int = 8, h: int = 5) -> tuple[np.ndarray, bytes]:
    arr = np.zeros((h, w, 3), dtype=np.uint8)
    arr[..., 0] = np.arange(w, dtype=np.uint8)[None, :] * 7
    arr[..., 1] = np.arange(h, dtype=np.uint8)[:, None] * 11
    arr[..., 2] = 200
    return arr, encode_bmp(arr)


def _pcm_wav(rate: int = 8000, n_frames: int = 8000, ch: int = 1,
             bits: int = 16) -> bytes:
    block = ch * bits // 8
    data = struct.pack(f"<{n_frames * ch}h", *(
        (i * 37) % 32768 - 16384 for i in range(n_frames * ch)
    ))
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, bits)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_bmp_roundtrip_and_header():
    arr, payload = _gradient_bmp(8, 5)
    assert parse_bmp_header(payload)[:3] == (8, 5, 24)
    assert np.array_equal(decode_bmp(payload), arr)
    # odd width exercises the 4-byte row padding
    arr2, payload2 = _gradient_bmp(7, 3)
    assert np.array_equal(decode_bmp(payload2), arr2)


def test_bmp_rejects_non_bmp():
    with pytest.raises(ValueError):
        parse_bmp_header(b"PNG\x00" + b"\x00" * 60)
    with pytest.raises(NotImplementedError):
        # valid header claiming 8bpp — needs a palette, not supported
        hdr = bytearray(_gradient_bmp(4, 4)[1])
        struct.pack_into("<H", hdr, 28, 8)
        decode_bmp(bytes(hdr))


def test_wav_header_parse():
    rate, ch, bits, nf, off, size = parse_wav_header(_pcm_wav(8000, 4000))
    assert (rate, ch, bits, nf) == (8000, 1, 16, 4000)
    assert size == 4000 * 2 and off > 12
    with pytest.raises(ValueError):
        parse_wav_header(b"RIFFxxxxJUNK")


def test_extract_media_meta_real_formats(spark):
    arr, bmp = _gradient_bmp(24, 10)
    wav = _pcm_wav(rate=16000, n_frames=8000)  # 0.5 s
    rows = [
        (1, "image/bmp", bytearray(bmp)),
        (2, "audio/wav", bytearray(wav)),
        (3, "application/octet-stream", bytearray(b"\x05opaque\x09")),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"
    )
    meta = {r.media_id: r for r in extract_media_meta(media).collect()}
    assert (meta[1].width, meta[1].height) == (24, 10)
    assert meta[1].sample_rate is None
    assert meta[2].sample_rate == 16000
    assert meta[2].duration_ms == pytest.approx(500.0)
    assert meta[2].width is None
    # stub fallback still fills fake dims for opaque payloads
    assert meta[3].width == 1 + 0x05 % 64 and meta[3].height == 1 + 0x09 % 64
    assert all(m.n_bytes == len(r[2]) for m, r in zip(
        (meta[1], meta[2], meta[3]), rows
    ))


def test_resize_media_real_bmp_pixels(spark):
    arr, bmp = _gradient_bmp(16, 8)
    media = spark.createDataFrame(
        [(1, "image/bmp", bytearray(bmp))],
        "media_id long, media_type string, payload binary",
    )
    (row,) = resize_media(media, max_dim=4).collect()
    assert (row.width, row.height) == (4, 2)
    got = decode_bmp(bytes(row.payload))
    # independent nearest-neighbor reference
    yi = (np.arange(2) * (8 / 2)).astype(int)
    xi = (np.arange(4) * (16 / 4)).astype(int)
    assert np.array_equal(got, arr[yi][:, xi])
    # already-small payloads pass through byte-identical
    w, h, same = resize_bmp(bmp, max_dim=64)
    assert (w, h) == (16, 8) and same == bmp


def test_sample_frames_wav_block_aligned(spark):
    wav = _pcm_wav(rate=8000, n_frames=1000, ch=2, bits=16)
    block = 2 * 2
    media = spark.createDataFrame(
        [(7, "audio/wav", bytearray(wav))],
        "media_id long, media_type string, payload binary",
    )
    frames = sample_frames(media, n_frames=4).collect()
    assert [f.frame_no for f in sorted(frames, key=lambda r: r.frame_no)] == [
        0, 1, 2, 3,
    ]
    for f in frames:
        assert len(f.frame) > 0 and len(f.frame) % block == 0
    # the slices together cover the whole data chunk exactly once
    assert sum(len(f.frame) for f in frames) == 1000 * block

def test_sample_frames_short_wav_distinct_blocks(spark):
    # Fewer frames than requested (nf=3 < n_frames=4): span == 0 — each
    # emitted frame must be a DISTINCT single block, not n copies of the
    # first one (ADVICE r3).
    wav = _pcm_wav(rate=8000, n_frames=3, ch=1, bits=16)
    block = 1 * 2
    media = spark.createDataFrame(
        [(9, "audio/wav", bytearray(wav))],
        "media_id long, media_type string, payload binary",
    )
    frames = sorted(
        sample_frames(media, n_frames=4).collect(), key=lambda r: r.frame_no
    )
    assert [f.frame_no for f in frames] == [0, 1, 2]
    assert all(len(f.frame) == block for f in frames)
    assert len({bytes(f.frame) for f in frames}) == 3  # all distinct
    # and together they are exactly the data chunk, in order
    _, _, _, _, off, size = parse_wav_header(wav)
    assert b"".join(bytes(f.frame) for f in frames) == wav[off : off + size]


def test_sample_frames_remainder_tiles_data_chunk(spark):
    # nf=10, n_frames=4: span=2, remainder 2 — the last slice must absorb
    # the trailing samples so the slices tile the data chunk (ADVICE r3).
    wav = _pcm_wav(rate=8000, n_frames=10, ch=2, bits=16)
    block = 2 * 2
    media = spark.createDataFrame(
        [(11, "audio/wav", bytearray(wav))],
        "media_id long, media_type string, payload binary",
    )
    frames = sorted(
        sample_frames(media, n_frames=4).collect(), key=lambda r: r.frame_no
    )
    assert [len(f.frame) for f in frames] == [
        2 * block, 2 * block, 2 * block, 4 * block,
    ]
    _, _, _, _, off, size = parse_wav_header(wav)
    assert b"".join(bytes(f.frame) for f in frames) == wav[off : off + size]


def test_sample_frames_truncated_wav_stays_block_aligned(spark):
    # Data chunk cut mid-sample (header claims more than the payload
    # holds, so parse_wav_header clamps size to a non-block-multiple):
    # the last slice must stop at the last WHOLE frame, never emit a
    # partial sample (ADVICE r4).
    wav = _pcm_wav(rate=8000, n_frames=10, ch=2, bits=16)[:-3]
    block = 2 * 2
    _, _, _, nf, off, size = parse_wav_header(wav)
    assert size % block != 0  # premise: truncation landed mid-sample
    media = spark.createDataFrame(
        [(13, "audio/wav", bytearray(wav))],
        "media_id long, media_type string, payload binary",
    )
    frames = sorted(
        sample_frames(media, n_frames=4).collect(), key=lambda r: r.frame_no
    )
    assert frames and all(len(f.frame) % block == 0 for f in frames)
    # slices tile exactly the whole-frame prefix of the data chunk
    assert (
        b"".join(bytes(f.frame) for f in frames)
        == wav[off : off + nf * block]
    )


def test_audio_features_match_numpy_reference(spark):
    """extract_audio_features must equal a direct numpy recomputation on
    the generated PCM (16-bit stereo + 8-bit mono), including the 8-bit
    offset-binary handling, and yield all-null features for non-WAV."""
    import numpy as np

    from big_data_hadoop_spark.operators.multimodal import (
        extract_audio_features,
    )

    wav16 = _pcm_wav(rate=8000, n_frames=1000, ch=2, bits=16)
    # 8-bit unsigned mono wav
    data8 = bytes((i * 13) % 256 for i in range(500))
    fmt8 = struct.pack("<HHIIHH", 1, 1, 4000, 4000, 1, 8)
    body8 = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt8)) + fmt8
        + b"data" + struct.pack("<I", len(data8)) + data8
    )
    wav8 = b"RIFF" + struct.pack("<I", len(body8)) + body8

    media = spark.createDataFrame(
        [
            (1, "audio/wav", bytearray(wav16)),
            (2, "audio/wav", bytearray(wav8)),
            (3, "image/jpeg", bytearray(b"\xff\xd8\xff not audio")),
        ],
        "media_id long, media_type string, payload binary",
    )
    got = {r.media_id: r for r in extract_audio_features(media).collect()}

    def expect_feats(raw, bits, ch, rate):
        _, _, _, nf, off, size = parse_wav_header(raw)
        block = ch * (bits // 8)
        dt = {8: np.uint8, 16: np.int16}[bits]
        x = np.frombuffer(raw[off : off + nf * block], dtype=dt).astype(float)
        full = 2.0 ** (bits - 1)
        if bits == 8:
            x = x - 128.0
        x = x / full
        signs = np.signbit(x)
        return (
            nf / rate,
            float(np.sqrt(np.mean(x * x))),
            float(np.max(np.abs(x))),
            float(np.mean(signs[1:] != signs[:-1])),
            float(np.mean(np.abs(x) >= (full - 1.0) / full)),
        )

    for mid, raw, bits, ch, rate in ((1, wav16, 16, 2, 8000), (2, wav8, 8, 1, 4000)):
        dur, rms, peak, zcr, clipped = expect_feats(raw, bits, ch, rate)
        r = got[mid]
        assert abs(r.duration_s - dur) < 1e-12
        assert abs(r.rms - rms) < 1e-12
        assert abs(r.peak - peak) < 1e-12
        assert abs(r.zero_crossing_rate - zcr) < 1e-12
        assert abs(r.clipped_ratio - clipped) < 1e-12
    assert got[3].duration_s is None and got[3].rms is None


def test_image_features_match_numpy_reference(spark):
    """extract_image_features must equal a direct numpy recomputation on
    the real decoded BMP pixels; non-decodable payloads yield all-null
    features (never fabricated values)."""
    import numpy as np

    from big_data_hadoop_spark.operators.multimodal import (
        decode_bmp,
        extract_image_features,
    )

    arr, payload = _gradient_bmp(9, 6)
    media = spark.createDataFrame(
        [
            (1, "image/bmp", bytearray(payload)),
            (2, "image/png", bytearray(b"\x89PNG fake")),
        ],
        "media_id long, media_type string, payload binary",
    )
    got = {r.media_id: r for r in extract_image_features(media).collect()}
    px = decode_bmp(payload).astype(float)
    assert np.array_equal(px, arr.astype(float))
    means = px.reshape(-1, 3).mean(axis=0)
    luma = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    r = got[1]
    assert (r.width, r.height) == (9, 6)
    for gotv, expv in [
        (r.mean_r, means[0]), (r.mean_g, means[1]), (r.mean_b, means[2]),
        (r.luma_mean, luma.mean()), (r.luma_std, luma.std()),
    ]:
        assert abs(gotv - expv) < 1e-9
    assert got[2].mean_r is None and got[2].width is None


# ---------------------------------------------------------------------------
# Codec-free container/header parsers: PNG / JPEG / GIF / MP4
# ---------------------------------------------------------------------------


def _png_bytes(w, h):
    import struct

    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x02\x00\x00\x00"
        + b"\x00" * 8
    )


def _jpeg_bytes(w, h):
    import struct

    # segment length includes its own 2 bytes: 2 + 5 + 9 = 16
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x01\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xda" + b"\x00" * 4


def _gif_bytes(w, h):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6


def _mp4_bytes(timescale, duration, w, h):
    import struct

    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 0)
    mvhd_body = bytearray(100)
    struct.pack_into(">I", mvhd_body, 12, timescale)
    struct.pack_into(">I", mvhd_body, 16, duration)
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + bytes(mvhd_body)
    tkhd_body = bytearray(84)
    struct.pack_into(">II", tkhd_body, 76, w << 16, h << 16)
    tkhd = struct.pack(">I", 8 + len(tkhd_body)) + b"tkhd" + bytes(tkhd_body)
    trak = struct.pack(">I", 8 + len(tkhd)) + b"trak" + tkhd
    moov = struct.pack(">I", 8 + len(mvhd) + len(trak)) + b"moov" + mvhd + trak
    return ftyp + moov


def test_png_jpeg_gif_header_parsers():
    from big_data_hadoop_spark.operators.multimodal import (
        parse_gif_header,
        parse_jpeg_header,
        parse_png_header,
    )

    assert parse_png_header(_png_bytes(640, 480)) == (640, 480)
    assert parse_jpeg_header(_jpeg_bytes(1024, 768)) == (1024, 768)
    assert parse_gif_header(_gif_bytes(320, 200)) == (320, 200)
    for bad in (b"", b"\x89PNG", b"\xff\xd8\xff\xda\x00\x04", b"GIF00a12345"):
        for parser in (parse_png_header, parse_jpeg_header, parse_gif_header):
            with pytest.raises(ValueError):
                parser(bad)


def test_mp4_box_walk():
    from big_data_hadoop_spark.operators.multimodal import parse_mp4_meta

    dur_ms, n_tracks, w, h = parse_mp4_meta(_mp4_bytes(1000, 5000, 1920, 1080))
    assert dur_ms == pytest.approx(5000.0)
    assert (n_tracks, w, h) == (1, 1920, 1080)
    with pytest.raises(ValueError):
        parse_mp4_meta(b"\x00" * 32)
    # ftyp but no moov -> no metadata
    import struct

    only_ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 0)
    with pytest.raises(ValueError):
        parse_mp4_meta(only_ftyp)


def test_extract_media_meta_covers_new_formats(spark):
    from big_data_hadoop_spark.operators.multimodal import extract_media_meta

    rows = [
        (1, "image/png", bytearray(_png_bytes(12, 34))),
        (2, "image/jpeg", bytearray(_jpeg_bytes(56, 78))),
        (3, "image/gif", bytearray(_gif_bytes(9, 10))),
        (4, "video/mp4", bytearray(_mp4_bytes(600, 1200, 640, 360))),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"
    )
    got = {r["media_id"]: r for r in extract_media_meta(df).collect()}
    assert (got[1]["width"], got[1]["height"]) == (12, 34)
    assert (got[2]["width"], got[2]["height"]) == (56, 78)
    assert (got[3]["width"], got[3]["height"]) == (9, 10)
    assert (got[4]["width"], got[4]["height"]) == (640, 360)
    assert got[4]["duration_ms"] == pytest.approx(2000.0)


# ---------------------------------------------------------------------------
# Real PNG decode (stdlib zlib + numpy)
# ---------------------------------------------------------------------------


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if pa <= pb and pa <= pc else b if pb <= pc else c


def _png_with_filters(arr, ftypes):
    """Hand-filter ``arr`` (h, w, ch) per the PNG spec with the given
    per-row filter types and assemble a real PNG — an independent
    encoder so decode is tested against the SPEC, not our encoder."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = arr.shape
    stride = w * ch
    flat = arr.reshape(h, stride).astype(int)
    out = bytearray()
    for y, ft in enumerate(ftypes):
        out.append(ft)
        prev = flat[y - 1] if y else np.zeros(stride, dtype=int)
        for x in range(stride):
            a = flat[y][x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            raw = flat[y][x]
            if ft == 0:
                v = raw
            elif ft == 1:
                v = raw - a
            elif ft == 2:
                v = raw - b
            elif ft == 3:
                v = raw - (a + b) // 2
            else:
                v = raw - _paeth(a, b, c)
            out.append(v & 0xFF)

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    color = 2 if ch == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


def test_png_decode_all_filters_against_spec():
    import numpy as np

    from big_data_hadoop_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    png = _png_with_filters(arr, [0, 1, 2, 3, 4])
    assert (decode_png(png) == arr).all()
    rgba = rng.integers(0, 256, size=(4, 3, 4), dtype=np.uint8)
    png4 = _png_with_filters(rgba, [4, 3, 2, 1])
    assert (decode_png(png4) == rgba).all()


def test_png_encode_decode_roundtrip_and_resize():
    import numpy as np

    from big_data_hadoop_spark.operators.multimodal import (
        decode_png,
        encode_png,
        resize_png,
    )

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    assert (decode_png(encode_png(arr)) == arr).all()
    nw, nh, npay = resize_png(encode_png(arr), max_dim=16)
    assert max(nw, nh) == 16 and nw == 16 and nh == 12
    small = decode_png(npay)
    assert small.shape == (nh, nw, 3)
    # nearest-neighbor: every output pixel exists in the input
    yi = (np.arange(nh) * (48 / nh)).astype(int)
    xi = (np.arange(nw) * (64 / nw)).astype(int)
    assert (small == arr[yi][:, xi]).all()
    # pass-through below the cap
    w0, h0, p0 = resize_png(encode_png(arr), max_dim=64)
    assert (w0, h0) == (64, 48) and p0 == encode_png(arr)


def test_png_unsupported_variants_raise():
    import struct
    import zlib

    from big_data_hadoop_spark.operators.multimodal import decode_png

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    pal = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        decode_png(pal)


def test_image_features_and_spark_resize_on_png(spark):
    import numpy as np

    from big_data_hadoop_spark.operators.multimodal import (
        encode_png,
        extract_image_features,
        resize_media,
    )

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(40, 50, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, "image/png", bytearray(encode_png(arr)))],
        "media_id long, media_type string, payload binary",
    )
    feats = extract_image_features(df).collect()[0]
    a = arr.astype(float)
    assert feats["width"] == 50 and feats["height"] == 40
    assert feats["mean_r"] == pytest.approx(a[..., 0].mean())
    luma = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    assert feats["luma_mean"] == pytest.approx(luma.mean())
    assert feats["luma_std"] == pytest.approx(luma.std())
    rs = resize_media(df, max_dim=10).collect()[0]
    assert (rs["width"], rs["height"]) == (10, 8)
    assert rs["payload"][:8] == bytearray(b"\x89PNG\r\n\x1a\n")


# ---------------------------------------------------------------------------
# Real GIF decode (pure-Python LZW)
# ---------------------------------------------------------------------------


def _gif_encode(idx, palette, interlaced=False):
    """Independent test-side GIF writer using the classic
    'uncompressed' LZW trick: every pixel is emitted as its own code,
    with a clear code whenever the decoder's table is about to force a
    width increase — exercises clear handling and bit unpacking without
    reimplementing full LZW compression."""
    import struct

    import numpy as np

    h, w = idx.shape
    n_colors = len(palette)
    exp = max(1, (n_colors - 1).bit_length())
    min_code = max(2, exp)
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1

    rows = idx
    if interlaced:
        order = np.concatenate(
            [
                np.arange(0, h, 8),
                np.arange(4, h, 8),
                np.arange(2, h, 4),
                np.arange(1, h, 2),
            ]
        )
        rows = idx[order]

    bits = []

    def emit(code):
        for i in range(width):
            bits.append((code >> i) & 1)

    emit(clear)
    budget = (1 << width) - eoi - 1  # codes before the width would grow
    for v in rows.flatten():
        if budget == 0:
            emit(clear)
            budget = (1 << width) - eoi - 1
        emit(int(v))
        budget -= 1
    emit(eoi)
    data = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, b in enumerate(bits[i : i + 8]):
            byte |= b << j
        data.append(byte)

    pal = bytearray()
    for r, g, b in palette:
        pal += bytes([r, g, b])
    pal += b"\x00" * ((1 << exp) * 3 - len(pal))  # table has 2^exp entries

    out = bytearray()
    out += b"GIF89a" + struct.pack("<HH", w, h)
    out.append(0x80 | (exp - 1) if exp else 0x80)  # GCT present, size exp-1
    out += b"\x00\x00"  # bg color, aspect
    out += pal
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out.append(0x40 if interlaced else 0x00)
    out.append(min_code)
    for i in range(0, len(data), 255):
        blockdata = data[i : i + 255]
        out.append(len(blockdata))
        out += blockdata
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_decode_matches_reference():
    import numpy as np

    from big_data_hadoop_spark.operators.multimodal import decode_gif

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 4, size=(9, 7), dtype=np.int64)
    gif = _gif_encode(idx, palette)
    got = decode_gif(gif)
    want = np.array(palette, dtype=np.uint8)[idx]
    assert (got == want).all()
    # interlaced four-pass row order
    gif_i = _gif_encode(idx, palette, interlaced=True)
    assert (decode_gif(gif_i) == want).all()


def test_gif_decode_larger_image_table_growth():
    import numpy as np

    from big_data_hadoop_spark.operators.multimodal import decode_gif

    palette = [(i, 255 - i, i // 2) for i in range(16)]
    rng = np.random.default_rng(13)
    idx = rng.integers(0, 16, size=(32, 41), dtype=np.int64)
    got = decode_gif(_gif_encode(idx, palette))
    assert (got == np.array(palette, dtype=np.uint8)[idx]).all()


def test_gif_feeds_image_features(spark):
    import numpy as np

    from big_data_hadoop_spark.operators.multimodal import (
        extract_image_features,
    )

    palette = [(0, 0, 0), (255, 255, 255)]
    idx = np.zeros((8, 8), dtype=np.int64)
    idx[::2] = 1  # half white, half black
    df = spark.createDataFrame(
        [(1, "image/gif", bytearray(_gif_encode(idx, palette)))],
        "media_id long, media_type string, payload binary",
    )
    f = extract_image_features(df).collect()[0]
    assert (f["width"], f["height"]) == (8, 8)
    assert f["mean_r"] == pytest.approx(127.5)
    assert f["luma_mean"] == pytest.approx(127.5)


# ---------------------------------------------------------------------------
# Codec-free audio metadata: MP3 frame header, FLAC STREAMINFO
# ---------------------------------------------------------------------------


def _mp3_bytes(bitrate_idx=9, rate_idx=0, n_bytes=4000, id3=False):
    import struct

    hdr = bytes(
        [0xFF, 0xFB, (bitrate_idx << 4) | (rate_idx << 2), 0x00]
    )
    body = hdr + b"\x00" * (n_bytes - 4)
    if id3:
        tag = b"ID3" + bytes([3, 0, 0]) + bytes([0, 0, 0, 10]) + b"x" * 10
        return tag + body
    return body


def _flac_bytes(rate=44100, ch=2, bits=16, total=44100 * 3):
    out = bytearray(b"fLaC")
    out.append(0x80)  # last-metadata flag + type 0 (STREAMINFO)
    out += (34).to_bytes(3, "big")
    b = bytearray(34)
    # rate: 20 bits starting at byte 10
    b[10] = (rate >> 12) & 0xFF
    b[11] = (rate >> 4) & 0xFF
    b[12] = ((rate & 0x0F) << 4) | (((ch - 1) & 0x07) << 1) | ((bits - 1) >> 4)
    b[13] = (((bits - 1) & 0x0F) << 4) | ((total >> 32) & 0x0F)
    b[14] = (total >> 24) & 0xFF
    b[15] = (total >> 16) & 0xFF
    b[16] = (total >> 8) & 0xFF
    b[17] = total & 0xFF
    out += b
    return bytes(out)


def test_mp3_and_flac_meta_parsers():
    from big_data_hadoop_spark.operators.multimodal import (
        parse_flac_meta,
        parse_mp3_meta,
    )

    rate, br, dur = parse_mp3_meta(_mp3_bytes(bitrate_idx=9, n_bytes=16000))
    assert (rate, br) == (44100, 128)
    assert dur == pytest.approx(16000 * 8 / 128_000 * 1000)
    # ID3v2 prefix is skipped, audio length excludes it
    rate2, br2, dur2 = parse_mp3_meta(_mp3_bytes(n_bytes=16000, id3=True))
    assert (rate2, br2) == (44100, 128)
    assert dur2 == pytest.approx(dur)
    fr, fch, fbits, fdur = parse_flac_meta(_flac_bytes())
    assert (fr, fch, fbits) == (44100, 2, 16)
    assert fdur == pytest.approx(3000.0)
    for parser in (parse_mp3_meta, parse_flac_meta):
        with pytest.raises(ValueError):
            parser(b"nonsense bytes here")


def test_audio_meta_flows_through_extract(spark):
    from big_data_hadoop_spark.operators.multimodal import extract_media_meta

    rows = [
        (1, "audio/mpeg", bytearray(_mp3_bytes(n_bytes=32000))),
        (2, "audio/flac", bytearray(_flac_bytes(rate=48000, total=48000 * 2))),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"
    )
    got = {r["media_id"]: r for r in extract_media_meta(df).collect()}
    assert got[1]["sample_rate"] == 44100
    assert got[1]["duration_ms"] == pytest.approx(32000 * 8 / 128_000 * 1000)
    assert got[2]["sample_rate"] == 48000
    assert got[2]["duration_ms"] == pytest.approx(2000.0)
    assert got[1]["width"] is None and got[2]["width"] is None


def test_malformed_payloads_yield_null_features_not_crash(spark):
    """Review finding: decoder internals can raise zlib/struct/Index
    errors on truncated or lying payloads; the feature extractor must
    yield null features for those rows, never abort the stage."""
    import struct
    import zlib

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    bad_png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", b"not zlib data")
        + chunk(b"IEND", b"")
    )
    rows = [
        (1, "image/gif", bytearray(b"GIF89a\x00\x01\x00\x01")),  # truncated
        (2, "image/png", bytearray(bad_png)),                    # bad IDAT
        (3, "image/jpeg", bytearray(b"\xff\xd8\xff\xc0\x00\x04\x08\x00")),
        (4, "image/bmp", bytearray(_gradient_bmp(4, 3)[1])),     # healthy
    ]
    df = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"
    )
    from big_data_hadoop_spark.operators.multimodal import (
        extract_image_features,
        extract_media_meta,
        resize_media,
    )

    feats = {r["media_id"]: r for r in extract_image_features(df).collect()}
    assert feats[1]["luma_mean"] is None
    assert feats[2]["luma_mean"] is None
    assert feats[3]["luma_mean"] is None
    assert feats[4]["luma_mean"] is not None
    # metadata + resize also survive the same payloads
    assert extract_media_meta(df).count() == 4
    assert resize_media(df, max_dim=2).count() == 4


def _sine_wav(freq_hz: float, rate: int = 8000, n_frames: int = 4096,
              ch: int = 1, bits: int = 16) -> bytes:
    t = np.arange(n_frames) / rate
    x = (np.sin(2 * np.pi * freq_hz * t) * 12000).astype(np.int16)
    frames = np.repeat(x, ch)
    data = frames.tobytes()
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, bits)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_audio_spectrum_pure_tone(spark):
    """A 1 kHz sine's dominant bin and centroid must land on 1 kHz
    (within one FFT bin), rolloff at the tone, flatness near zero."""
    from big_data_hadoop_spark.operators.multimodal import (
        extract_audio_spectrum,
    )

    rate, n = 8000, 4096
    payload = _sine_wav(1000.0, rate=rate, n_frames=n)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    row = extract_audio_spectrum(df).collect()[0]
    bin_hz = rate / n  # 1.953 Hz
    assert abs(row.dominant_hz - 1000.0) <= bin_hz
    # leakage spreads a little mass; centroid stays within a few bins
    assert abs(row.centroid_hz - 1000.0) < 25
    assert abs(row.rolloff85_hz - 1000.0) <= 5 * bin_hz
    assert row.flatness < 0.05
    assert row.bandwidth_hz < 200


def test_audio_spectrum_matches_numpy_reference(spark):
    """Independent recomputation: decode the PCM with struct/numpy in the
    test and recompute every feature from the magnitude spectrum."""
    from big_data_hadoop_spark.operators.multimodal import (
        extract_audio_spectrum,
        parse_wav_header,
    )

    payload = _pcm_wav(rate=8000, n_frames=2048, ch=2, bits=16)
    df = spark.createDataFrame(
        [(7, bytearray(payload))], "media_id long, payload binary"
    )
    row = extract_audio_spectrum(df).collect()[0]

    rate, ch, bits, nf, off, size = parse_wav_header(payload)
    x = (
        np.frombuffer(payload[off : off + nf * ch * 2], dtype=np.int16)
        .astype(np.float64)
        .reshape(-1, ch)
        .mean(axis=1)
        / 32768.0
    )
    mag = np.abs(np.fft.rfft(x))[1:]
    f = np.fft.rfftfreq(x.size, d=1.0 / rate)[1:]
    centroid = (f * mag).sum() / mag.sum()
    assert abs(row.dominant_hz - f[int(np.argmax(mag))]) < 1e-9
    assert abs(row.centroid_hz - centroid) < 1e-9
    bw = np.sqrt(((f - centroid) ** 2 * mag).sum() / mag.sum())
    assert abs(row.bandwidth_hz - bw) < 1e-9
    power = mag * mag
    cum = np.cumsum(power)
    assert abs(
        row.rolloff85_hz - f[int(np.searchsorted(cum, 0.85 * cum[-1]))]
    ) < 1e-9
    flat = np.exp(np.mean(np.log(power + 1e-30))) / (np.mean(power) + 1e-30)
    assert abs(row.flatness - flat) < 1e-12


def test_audio_spectrum_non_wav_is_null_row(spark):
    from big_data_hadoop_spark.operators.multimodal import (
        extract_audio_spectrum,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"not audio")), (2, None)],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in extract_audio_spectrum(df).collect()}
    assert len(rows) == 2
    for r in rows.values():
        assert r.dominant_hz is None and r.flatness is None


def test_audio_spectrum_malformed_block_align_is_null_row(spark):
    """A WAV whose fmt block-align LIES about ch*(bits/8) (or claims
    zero channels) must degrade to the all-null feature row, not raise
    inside frombuffer/reshape and fail the whole task on one malformed
    blob (review finding: 'cannot reshape array of size 3 into shape
    (2)' aborted the job)."""
    import struct

    from big_data_hadoop_spark.operators.multimodal import (
        extract_audio_spectrum,
    )

    def wav(ch, bits, block, data):
        fmt = struct.pack("<HHIIHH", 1, ch, 8000, 8000 * max(block, 1),
                          block, bits)
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    rows = {
        r.media_id: r
        for r in extract_audio_spectrum(
            spark.createDataFrame(
                [
                    # block-align=1 but stereo 16-bit: nf=3 "frames",
                    # only 3 bytes of pcm — a partial frame
                    (1, bytearray(wav(2, 16, 1, b"\x01\x02\x03"))),
                    # zero channels
                    (2, bytearray(wav(0, 16, 4, b"\x01\x02\x03\x04"))),
                    # healthy control in the same batch still decodes
                    (3, bytearray(wav(1, 16, 2, b"\x00\x10" * 64))),
                ],
                "media_id long, payload binary",
            )
        ).collect()
    }
    assert rows[1].dominant_hz is None and rows[1].flatness is None
    assert rows[2].dominant_hz is None
    assert rows[3].dominant_hz is not None


def test_audio_spectrum_noise_flatness_high(spark):
    """Deterministic wideband pseudo-noise should score flatness near 1,
    far above any tone — separating the two is the operator's job."""
    from big_data_hadoop_spark.operators.multimodal import (
        extract_audio_spectrum,
    )

    rng = np.random.default_rng(12345)  # seeded: deterministic test
    x = (rng.uniform(-0.5, 0.5, 4096) * 32767).astype(np.int16)
    data = x.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    row = extract_audio_spectrum(df).collect()[0]
    assert row.flatness > 0.5
