"""Baseline JPEG codec — pure Python/numpy, no codec library.

Implements ITU-T T.81 baseline sequential DCT JPEG: the decoder
(``decode_jpeg``) handles 8-bit baseline SOF0 streams — grayscale or
YCbCr with 4:4:4 / 4:2:2 / 4:2:0 sampling — including canonical Huffman
table construction (DHT), byte unstuffing, restart markers, run-length
AC decoding, dequantization, the exact floating-point 8×8 inverse DCT,
nearest-neighbor chroma upsampling, and JFIF YCbCr→RGB. The encoder
(``encode_jpeg``) produces baseline streams with the T.81 Annex K
standard quantization and Huffman tables — it exists so the decoder is
testable without any external codec, and doubles as the re-encoder for
``multimodal.resize_media``.

Baseline-only by design: progressive (SOF2), arithmetic coding, 12-bit
precision and hierarchical modes raise ``NotImplementedError`` — at
that point a real deployment brings libjpeg-turbo; the container's
header metadata path (``multimodal.parse_jpeg_header``) still covers
those files.

Speed posture: Huffman entropy decoding is inherently bit-serial, so
this decoder is a correctness/capability tier, not a throughput tier —
the Spark operators batch it through Arrow like every other media
transform (one Python pass per payload, payloads never shuffle).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]

# T.81 zig-zag order (index i of the zig-zag sequence -> block position)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# Annex K.1 quantization tables (luminance, chrominance)
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# Annex K.3 standard Huffman tables: (bits[1..16], huffval)
DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# Exact 8x8 DCT-II basis matrix: C[k, n] = s(k) * cos((2n+1)kπ/16)
_C = np.zeros((8, 8))
for _k in range(8):
    _s = np.sqrt(0.125) if _k == 0 else 0.5
    for _n in range(8):
        _C[_k, _n] = _s * np.cos((2 * _n + 1) * _k * np.pi / 16)


def _canonical_codes(bits: list[int], vals: list[int]):
    """(symbol -> (code, length)) canonical Huffman assignment (T.81
    C.2), plus the decode map ((length, code) -> symbol)."""
    enc: dict[int, tuple[int, int]] = {}
    dec: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            enc[sym] = (code, length)
            dec[(length, code)] = sym
            code += 1
            k += 1
        code <<= 1
    return enc, dec


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00 unstuffing
    and restart-marker awareness."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.buf):
            raise ValueError("truncated JPEG entropy stream")
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                # marker reached: pad with 1-bits (T.81 B.2.3 allows the
                # final byte's padding); the MCU loop consumes markers
                # explicitly via sync_marker()
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
            elif nxt == 0xFF:
                self.pos += 1  # fill byte: FF FF ... before a marker
                return self._fill()
            else:
                # FF followed by a non-stuffing, non-restart, non-fill
                # byte inside entropy data is a desync (review finding:
                # silently consuming the marker byte as data produced
                # garbage pixels on corrupt streams instead of an error)
                raise ValueError(
                    f"marker 0x{nxt:02X} inside JPEG entropy stream"
                )
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def sync_marker(self) -> int | None:
        """Discard padding bits and consume an RSTn marker if present."""
        self.acc = 0
        self.n = 0
        while self.pos + 1 < len(self.buf) and self.buf[self.pos] == 0xFF:
            nxt = self.buf[self.pos + 1]
            if 0xD0 <= nxt <= 0xD7:
                self.pos += 2
                return nxt
            if nxt == 0xFF:
                self.pos += 1
                continue
            break
        return None


def _decode_huff(reader: _BitReader, dec: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = dec.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t raw bits to the signed coefficient."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> "np.ndarray":
    """Decode a baseline JPEG to uint8 ``(h, w, 3)`` RGB (grayscale
    replicates to 3 channels)."""
    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = payload[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        body = pos + 4
        end = pos + 2 + seg_len
        if end > len(payload):
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = body
            while p < end:
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qt[tq] = np.frombuffer(
                    payload, np.uint8, 64, p + 1
                ).astype(np.int32)
                p += 65
        elif marker == 0xC4:  # DHT
            p = body
            while p < end:
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                _, dec = _canonical_codes(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec = payload[body]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            h, w = struct.unpack_from(">HH", payload, body + 1)
            nc = payload[body + 5]
            comps = []
            for i in range(nc):
                cid = payload[body + 6 + 3 * i]
                hv = payload[body + 7 + 3 * i]
                tq = payload[body + 8 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", payload, body)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[body]
            scan = []
            for i in range(ns):
                cs = payload[body + 1 + 2 * i]
                tables = payload[body + 2 + 2 * i]
                scan.append((cs, tables >> 4, tables & 0x0F))
            return _decode_scan(
                payload, end, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        pos = end
    raise ValueError("JPEG without SOS")


def _decode_scan(payload, data_pos, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval):
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component sample planes (MCU-padded)
    planes = {
        cid: np.zeros((mcuy * 8 * cv, mcux * 8 * ch))
        for cid, ch, cv, _tq in comps
    }
    comp_by_id = {cid: (ch, cv, tq) for cid, ch, cv, tq in comps}
    reader = _BitReader(payload, data_pos)
    pred = {cid: 0 for cid, *_ in comps}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                if reader.sync_marker() is not None:
                    pred = {cid: 0 for cid in pred}
            for cid, td, ta in scan:
                ch, cv, tq = comp_by_id[cid]
                for by in range(cv):
                    for bx in range(ch):
                        coef = np.zeros(64, dtype=np.int32)
                        t = _decode_huff(reader, huff_dc[td])
                        diff = _extend(reader.read_bits(t), t)
                        pred[cid] += diff
                        coef[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(reader, huff_ac[ta])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            coef[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64)
                        block[ZIGZAG] = coef * qt[tq]
                        px = _C.T @ block.reshape(8, 8) @ _C + 128.0
                        planes[cid][
                            (my * cv + by) * 8 : (my * cv + by) * 8 + 8,
                            (mx * ch + bx) * 8 : (mx * ch + bx) * 8 + 8,
                        ] = px
            n_mcu += 1
    # upsample to full resolution and convert
    full = []
    for cid, ch, cv, _tq in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        return np.dstack([y, y, y]).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.dstack([r, g, b]), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_jpeg(
    arr: "np.ndarray",
    subsample: bool = False,
    gray: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode uint8 RGB ``(h, w, 3)`` as baseline JFIF JPEG with the
    Annex K tables; ``subsample`` selects 4:2:0 chroma, ``gray`` emits
    a single-component (luminance-only) stream, ``restart_interval``
    inserts DRI/RSTn markers every N MCUs."""
    h, w = arr.shape[:2]
    a = arr.astype(np.float64)
    y = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    cb = -0.168736 * a[..., 0] - 0.331264 * a[..., 1] + 0.5 * a[..., 2] + 128
    cr = 0.5 * a[..., 0] - 0.418688 * a[..., 1] - 0.081312 * a[..., 2] + 128

    def pad_to(img, mult):
        ph = (-img.shape[0]) % mult
        pw = (-img.shape[1]) % mult
        return np.pad(img, ((0, ph), (0, pw)), mode="edge")

    if gray:
        planes = [(pad_to(y, 8), 1, 1, 0)]
    elif subsample:
        yf = pad_to(y, 16)
        cbf = pad_to(cb, 16)
        crf = pad_to(cr, 16)
        cbs = cbf.reshape(cbf.shape[0] // 2, 2, cbf.shape[1] // 2, 2).mean((1, 3))
        crs = crf.reshape(crf.shape[0] // 2, 2, crf.shape[1] // 2, 2).mean((1, 3))
        planes = [(yf, 2, 2, 0), (cbs, 1, 1, 1), (crs, 1, 1, 1)]
    else:
        planes = [
            (pad_to(y, 8), 1, 1, 0),
            (pad_to(cb, 8), 1, 1, 1),
            (pad_to(cr, 8), 1, 1, 1),
        ]

    enc_dc = [_canonical_codes(*DC_LUMA)[0], _canonical_codes(*DC_CHROMA)[0]]
    enc_ac = [_canonical_codes(*AC_LUMA)[0], _canonical_codes(*AC_CHROMA)[0]]
    qts = [QT_LUMA, QT_CHROMA]
    writer = _BitWriter()
    pred = [0, 0, 0]
    mcu = 16 if (subsample and not gray) else 8
    mcux = planes[0][0].shape[1] // mcu
    mcuy = planes[0][0].shape[0] // mcu

    # zig-zag forward mapping: seq[i] = block_flat[ZIGZAG[i]]
    def zz_seq(qflat):
        return qflat[ZIGZAG]

    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                writer.flush()
                writer.out += bytes(
                    [0xFF, 0xD0 + ((n_mcu // restart_interval - 1) % 8)]
                )
                pred = [0, 0, 0]
            n_mcu += 1
            for ci, (plane, ch, cv, t) in enumerate(planes):
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = plane[y0 : y0 + 8, x0 : x0 + 8]
                        f = _C @ (block - 128.0) @ _C.T
                        q = np.round(
                            f / qts[t].reshape(8, 8).astype(float)
                        ).astype(int).flatten()
                        seq = zz_seq(q)
                        diff = int(seq[0]) - pred[ci]
                        pred[ci] = int(seq[0])
                        s = _category(diff)
                        code, ln = enc_dc[t][s]
                        writer.write(code, ln)
                        if s:
                            writer.write(
                                diff if diff >= 0 else diff + (1 << s) - 1, s
                            )
                        run = 0
                        for k in range(1, 64):
                            v = int(seq[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = enc_ac[t][0xF0]
                                writer.write(code, ln)
                                run -= 16
                            s = _category(v)
                            code, ln = enc_ac[t][(run << 4) | s]
                            writer.write(code, ln)
                            writer.write(
                                v if v >= 0 else v + (1 << s) - 1, s
                            )
                            run = 0
                        if run:
                            code, ln = enc_ac[t][0x00]
                            writer.write(code, ln)
    writer.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(zz_seq(QT_LUMA).astype(np.uint8)))
    if not gray:
        out += seg(
            0xDB, bytes([1]) + bytes(zz_seq(QT_CHROMA).astype(np.uint8))
        )
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    hv_y = 0x22 if (subsample and not gray) else 0x11
    if gray:
        sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
        sos = bytes([1, 1, 0x00, 0, 63, 0])
    else:
        sof = struct.pack(">BHHB", 8, h, w, 3)
        sof += bytes([1, hv_y, 0, 2, 0x11, 1, 3, 0x11, 1])
        sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xC0, sof)
    tables = ((0, 0, DC_LUMA), (1, 0, AC_LUMA))
    if not gray:
        tables += ((0, 1, DC_CHROMA), (1, 1, AC_CHROMA))
    for tc, t, (bits, vals) in tables:
        out += seg(0xC4, bytes([(tc << 4) | t]) + bytes(bits) + bytes(vals))
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


# Self-contained executor serialization (see operators/multimodal.py):
# decode_jpeg is referenced from multimodal's Arrow-batched closures.
import sys as _sys

try:  # pragma: no cover - vendored cloudpickle without the API
    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except (ImportError, AttributeError):
    pass
