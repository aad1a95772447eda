"""Perceptual audio near-dup tier: spectral-gradient fingerprints.

The audio completion of the perceptual dedup story
(``operators.imagehash`` is the image side): a 64-bit robust hash in
the Haitsma–Kalker family ("A Highly Robust Audio Fingerprint System",
ISMIR 2002, public literature) — the sign of the TIME difference of
FREQUENCY-band energy differences, the quantity that survives volume
changes, re-encoding loss and mild filtering where a byte digest
(``binary_meta``) sees a different file. Reuses, unchanged, the two
tiers the engine already has: the WAV PCM decode conventions of
``extract_audio_features`` / ``extract_audio_spectrum``
(``operators.multimodal``) and the fingerprint-agnostic multi-index
Hamming band joins (``operators.dedup`` ``_fp_band_keys`` —
radius-scaled chunk-combination keys over distinct fingerprint
values) for pairs and incremental history matches.

FIXED CONTRACT (replicated bit-for-bit by the independent pure-Python
oracle in ``tests/test_audiohash.py``):

* decode: RIFF/WAVE via ``parse_wav_header``; 8/16/32-bit integer PCM
  (8-bit is unsigned offset-binary); channels mean-mixed to mono;
  normalized by ``2^(bits-1)``; at most ``max_samples`` leading frames
  (the ``extract_audio_spectrum`` bounded-read trade), partial trailing
  frames clamped;
* framing: 9 equal contiguous time frames — frame ``t`` is
  ``x[floor(t*n/9) : floor((t+1)*n/9)]``;
* too short to frame honestly → NULL: every frame must hold at least
  32 samples (``n >= 288``), else the fingerprint is NULL (disclosed
  drop, the undecodable-image contract);
* per frame: real-FFT power spectrum, DC excluded → bins ``1..m//2``;
  9 GEOMETRICALLY spaced bands: raw edges ``e_k = round((nbins+1)^(k/9))``
  for ``k = 0..9``, then forced strictly increasing left-to-right
  (``e_k = max(e_k, e_{k-1}+1)``); band ``b`` sums power over bin
  indices ``[e_b, e_{b+1})`` — log-spaced bands weight the perceptually
  busy low end, per the published design;
* bit ``t*8 + b`` (LSB packing, the SimHash/dHash convention) is 1 iff
  ``(E[t+1][b] - E[t+1][b+1]) - (E[t][b] - E[t][b+1]) > 0`` — strict,
  ties → 0; stored as a SIGNED long.

Volume invariance falls out by construction: scaling the signal scales
every band energy by the same factor, so no strict sign flips.

Scale shape — identical to the image tier: fingerprinting is ONE
partition-preserving Arrow-batched ``mapInPandas`` pass (vectorized
numpy per clip, the declared Python exemption all media decode holds);
the 8-byte fingerprint is the only thing that leaves; pairs and
history matches are chunk equi-joins over 2-byte keys, never
all-pairs, never payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_hadoop_spark.operators.dedup import (
    _simhash_pairs_given_fps,
    simhash_matches_against,
)
from big_data_hadoop_spark.operators.multimodal import (
    encode_wav,
    parse_wav_header,
)

AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("afp", T.LongType(), True),
    ]
)

_FRAMES = 9
_BANDS = 9
_MIN_FRAME = 32


def _band_edges(nbins: int) -> list[int]:
    """The 10 strictly increasing geometric band edges over power-bin
    indices ``1..nbins`` (module-docstring contract)."""
    edges = [
        int(round((nbins + 1) ** (k / _BANDS))) for k in range(_BANDS + 1)
    ]
    for k in range(1, _BANDS + 1):
        edges[k] = max(edges[k], edges[k - 1] + 1)
    return edges


def audio_fingerprint_pcm(x: "np.ndarray") -> int | None:
    """The 64-bit spectral-gradient fingerprint of a normalized mono
    float signal, or ``None`` when too short (any frame under
    ``_MIN_FRAME`` samples). Shared by the batch fingerprinter; tests
    replicate it independently rather than calling this."""
    n = x.size
    if n < _FRAMES * _MIN_FRAME:
        return None
    cuts = [t * n // _FRAMES for t in range(_FRAMES + 1)]
    energies = np.empty((_FRAMES, _BANDS), dtype=np.float64)
    for t in range(_FRAMES):
        frame = x[cuts[t]: cuts[t + 1]]
        power = np.abs(np.fft.rfft(frame)) ** 2
        nbins = frame.size // 2
        edges = _band_edges(nbins)
        for b in range(_BANDS):
            energies[t, b] = power[edges[b]: edges[b + 1]].sum()
    d = energies[:, :-1] - energies[:, 1:]  # band differences (9 x 8)
    bits = (d[1:, :] - d[:-1, :]) > 0  # time difference of those (8 x 8)
    v = 0
    for t in range(8):
        for b in range(8):
            if bits[t, b]:
                v |= 1 << (t * 8 + b)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def audio_fingerprint(
    df: DataFrame, id_col: str = "media_id", max_samples: int = 1 << 18
) -> DataFrame:
    """Perceptual fingerprints for a binary media frame (the
    ``MEDIA_SCHEMA`` shape) → ``(media_id, afp bigint)``, NULL for
    non-WAV / unsupported-PCM / too-short payloads. Decode conventions
    match ``extract_audio_spectrum`` exactly (8/16/32-bit PCM, mono
    mean-mix, bounded leading read, partial-frame clamp)."""

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p) if p is not None else b""
                fp = None
                try:
                    rate, ch, bits, nf, off, size = parse_wav_header(raw)
                    if bits in (8, 16, 32) and nf and rate and ch >= 1:
                        nf = min(nf, max_samples)
                        block = ch * (bits // 8)
                        pcm = raw[off: off + nf * block]
                        pcm = pcm[: (len(pcm) // block) * block]
                        if pcm:
                            dtype = {
                                8: np.uint8, 16: np.int16, 32: np.int32
                            }[bits]
                            x = np.frombuffer(pcm, dtype=dtype).astype(
                                np.float64
                            )
                            if bits == 8:  # unsigned, offset binary
                                x = x - 128.0
                            x = x.reshape(-1, ch).mean(axis=1) / float(
                                2 ** (bits - 1)
                            )
                            fp = audio_fingerprint_pcm(x)
                except ValueError:
                    pass  # not a WAV: disclosed NULL, never a fake hash
                ids.append(mid)
                fps.append(fp)
            yield pd.DataFrame({"media_id": ids, "afp": fps}).astype(
                {"media_id": "int64"}
            )

    return df.select(F.col(id_col).alias("media_id"), "payload").mapInPandas(
        _fp, schema=AUDIO_FP_SCHEMA
    )


def audio_neardup_pairs(
    fp: DataFrame, max_hamming: int = 3, id_col: str = "media_id"
) -> DataFrame:
    """Near-duplicate clip pairs from precomputed fingerprints →
    ``(id_a, id_b, hamming)``, ``id_a < id_b`` — the SimHash pigeonhole
    band join, exact for radius <= 3. NULL fingerprints are filtered
    before banding. NOT lazy: the shared join eagerly checkpoints the
    fingerprints at call time so both band-join sides share one
    upstream execution — construction runs Spark jobs (round-10
    docstring fix). Rows must be unique per (id, fingerprint), the
    ``_simhash_pairs_given_fps`` precondition — true for every
    fingerprint/store producer."""
    if max_hamming > 3:
        raise ValueError("4x16-bit banding is exact only for max_hamming <= 3")
    fps = fp.filter(F.col("afp").isNotNull()).select(
        F.col(id_col), F.col("afp").alias("simhash")
    )
    return _simhash_pairs_given_fps(fps, max_hamming, id_col)


def audio_fingerprint_pairs(
    df: DataFrame, max_hamming: int = 3, id_col: str = "media_id"
) -> DataFrame:
    """Convenience composition: fingerprint + pair in one call; the
    fingerprints are eagerly checkpointed so the band join's two sides
    share ONE decode execution (the ``image_dhash_pairs`` discipline)."""
    if max_hamming > 3:
        # validate BEFORE the decode job, not after paying it
        raise ValueError("4x16-bit banding is exact only for max_hamming <= 3")
    fp = audio_fingerprint(df, id_col=id_col).localCheckpoint(eager=True)
    return audio_neardup_pairs(fp, max_hamming=max_hamming, id_col=id_col)


def audio_matches_against(
    fp: DataFrame,
    stored_fps: DataFrame,
    max_hamming: int = 3,
    id_col: str = "media_id",
) -> DataFrame:
    """Incremental tier: the batch ids whose fingerprint lies within
    ``max_hamming`` bits of ANY stored history fingerprint (one id
    column, distinct — the shared ``simhash_matches_against``
    contract). History is ONE long per past clip; ``afp`` column, id
    optional and ignored."""
    if max_hamming > 3:
        raise ValueError("4x16-bit banding is exact only for max_hamming <= 3")
    batch = fp.filter(F.col("afp").isNotNull()).select(
        F.col(id_col), F.col("afp").alias("simhash")
    )
    prior = stored_fps.filter(F.col("afp").isNotNull()).select(
        F.col("afp").alias("simhash")
    )
    return simhash_matches_against(
        batch, prior, max_hamming=max_hamming, id_col=id_col
    )


def documents_as_audio(
    df: DataFrame, n_samples: int = 2048, rate: int = 8000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Test/probe adapter (the ``documents_as_images`` pattern): render
    each document's leading UTF-8 bytes as a real mono 16-bit WAV —
    consecutive byte pairs become little-endian samples, zero-padded to
    ``n_samples`` — so the driver testdata can exercise the full
    decode → FFT → band pipeline with REAL RIFF payloads end-to-end.
    Deterministic: equal prefixes give byte-identical clips. Not a
    production operator: production feeds actual recordings."""
    n_bytes = n_samples * 2

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for did, text in zip(pdf[id_col], pdf["text"]):
                raw = (text or "").encode("utf-8")[:n_bytes]
                buf = np.zeros(n_bytes, dtype=np.uint8)
                buf[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
                samples = buf.view("<i2")
                ids.append(did)
                payloads.append(encode_wav(samples, rate=rate))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "media_type": "audio/wav",
                    "payload": payloads,
                }
            )

    from big_data_hadoop_spark.operators.multimodal import MEDIA_SCHEMA

    return df.select(F.col(id_col), "text").mapInPandas(
        _render, schema=MEDIA_SCHEMA
    )


# Self-contained executor serialization (the multimodal.py pattern).
import sys as _sys

try:  # pragma: no cover - vendored cloudpickle without the API
    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except (ImportError, AttributeError):
    pass
