"""Perceptual audio fingerprint tier (``operators.audiohash``): the
spectral-gradient bit contract is replicated by an independent
pure-Python oracle, pairs/matches are verified against brute-force
Hamming, and the full WAV decode → FFT → band pipeline runs on real
RIFF bytes through Spark."""

from __future__ import annotations

import numpy as np
import pytest

from big_data_hadoop_spark.operators.audiohash import (
    audio_fingerprint,
    audio_fingerprint_pairs,
    audio_fingerprint_pcm,
    audio_matches_against,
    audio_neardup_pairs,
    documents_as_audio,
)
from big_data_hadoop_spark.operators.multimodal import (
    encode_wav,
    parse_wav_header,
)


def _ref_fingerprint(x) -> int | None:
    """Independent replication of the module-docstring contract."""
    x = list(map(float, x))
    n = len(x)
    if n < 9 * 32:
        return None
    E = []
    for t in range(9):
        frame = np.array(x[t * n // 9: (t + 1) * n // 9])
        power = (np.abs(np.fft.rfft(frame)) ** 2).tolist()
        nbins = len(frame) // 2
        edges = [round((nbins + 1) ** (k / 9)) for k in range(10)]
        for k in range(1, 10):
            edges[k] = max(edges[k], edges[k - 1] + 1)
        E.append(
            [sum(power[edges[b]: edges[b + 1]]) for b in range(9)]
        )
    v = 0
    for t in range(8):
        for b in range(8):
            d1 = E[t + 1][b] - E[t + 1][b + 1]
            d0 = E[t][b] - E[t][b + 1]
            if d1 - d0 > 0:
                v |= 1 << (t * 8 + b)
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


def _tone_mix(seed: int, n: int = 2000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    x = np.zeros(n)
    for _ in range(4):
        f = rng.uniform(0.01, 0.45)
        x += rng.uniform(0.1, 1.0) * np.sin(2 * np.pi * f * t)
    return x / np.max(np.abs(x))


def test_fingerprint_matches_independent_oracle():
    for seed, n in [(1, 2000), (2, 288), (3, 1023), (4, 5000)]:
        x = _tone_mix(seed, n)
        assert audio_fingerprint_pcm(x) == _ref_fingerprint(x), (seed, n)


def test_fingerprint_oracle_property():
    from hypothesis import given, settings
    from hypothesis import strategies as hst

    @given(hst.integers(288, 2500), hst.integers(0, 2**32 - 1))
    @settings(max_examples=20, deadline=None)
    def check(n, seed):
        x = np.random.default_rng(seed).normal(size=n)
        x = x / (np.max(np.abs(x)) or 1.0)
        assert audio_fingerprint_pcm(x) == _ref_fingerprint(x)

    check()


def test_fingerprint_invariances_and_short_refusal():
    x = _tone_mix(9)
    fp = audio_fingerprint_pcm(x)
    # volume invariance: exact power-of-two scaling flips no strict sign
    assert audio_fingerprint_pcm(x * 0.5) == fp
    assert audio_fingerprint_pcm(x * 0.25) == fp
    # too short to frame honestly -> None, not a junk hash
    assert audio_fingerprint_pcm(x[:287]) is None
    assert audio_fingerprint_pcm(np.zeros(300)) is not None  # ties -> 0
    assert audio_fingerprint_pcm(np.zeros(300)) == 0


def test_audio_fingerprint_spark_real_wav_and_null(spark):
    x16 = (_tone_mix(21) * 30000).astype(np.int16)
    rows = [
        (1, "audio/wav", bytearray(encode_wav(x16))),
        (2, "text/plain", bytearray(b"not a wav")),
        (3, "audio/wav", None),
        (4, "audio/wav", bytearray(encode_wav(x16[:100]))),  # too short
    ]
    df = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"
    )
    got = {r.media_id: r.afp for r in audio_fingerprint(df).collect()}
    assert got[1] == audio_fingerprint_pcm(x16.astype(np.float64) / 32768.0)
    assert got[2] is None and got[3] is None and got[4] is None


def test_audio_pairs_and_matches_brute_force(spark):
    # craft clips: base, exact dup, mild high-band perturbation, far
    base = _tone_mix(33, 1800)
    mild = base + 0.002 * np.sin(2 * np.pi * 0.48 * np.arange(1800))
    clips = {
        10: base,
        11: base.copy(),
        12: mild,
        13: _tone_mix(77, 1800),
        14: _tone_mix(78, 1800),
    }
    fps = {
        k: audio_fingerprint_pcm(v) for k, v in clips.items()
    }
    def wav(v):
        return bytearray(encode_wav((v * 30000).astype(np.int16)))
    df = spark.createDataFrame(
        [(k, "audio/wav", wav(v)) for k, v in clips.items()]
        + [(99, "x", bytearray(b"junk"))],
        "media_id long, media_type string, payload binary",
    )
    # int16 quantization means spark-side fps differ from float fps —
    # recompute the expectation from the quantized signal
    qfps = {
        k: audio_fingerprint_pcm(
            (v * 30000).astype(np.int16).astype(np.float64) / 32768.0
        )
        for k, v in clips.items()
    }
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in audio_fingerprint_pairs(df, max_hamming=3).collect()
    }
    assert got == _brute_pairs(qfps, 3)
    assert (10, 11, 0) in got
    assert not any(99 in (a, b) for a, b, _ in got)

    hist = spark.createDataFrame(
        [(0, qfps[10]), (9, None)], "media_id long, afp long"
    )
    batch = spark.createDataFrame(
        [(100, qfps[11]), (101, qfps[13])], "media_id long, afp long"
    )
    hit = {
        r.media_id
        for r in audio_matches_against(batch, hist, max_hamming=3).collect()
    }
    want = set()
    for bid, bf in ((100, qfps[11]), (101, qfps[13])):
        ham = bin((bf ^ qfps[10]) & ((1 << 64) - 1)).count("1")
        if ham <= 3:
            want.add(bid)
    assert hit == want and 100 in hit


def test_radius_validation():
    with pytest.raises(ValueError, match="max_hamming"):
        audio_neardup_pairs(None, max_hamming=4)
    with pytest.raises(ValueError, match="max_hamming"):
        audio_fingerprint_pairs(None, max_hamming=4)
    with pytest.raises(ValueError, match="max_hamming"):
        audio_matches_against(None, None, max_hamming=4)


def test_probe_r05_matches_pure_python_replication(spark):
    """The r05 probe composition (render -> decode -> fingerprint ->
    band pairs at radius 1 -> degree rollup) replicated end-to-end in
    pure Python/numpy over the smoke corpus."""
    from big_data_hadoop_spark.probes import QUERIES

    got = [
        (r.media_id, r.n_neighbors, r.min_hamming)
        for r in QUERIES["r05_audio_fingerprint_neardup"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    ]
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).collect()
    }
    n_bytes = 512 * 2
    fps = {}
    for did, text in docs.items():
        raw = (text or "").encode("utf-8")[:n_bytes]
        buf = np.zeros(n_bytes, dtype=np.uint8)
        buf[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
        x = buf.view("<i2").astype(np.float64) / 32768.0
        fps[did] = _ref_fingerprint(x)
    neigh: dict[int, list[int]] = {}
    for a, b, ham in _brute_pairs(fps, 1):
        neigh.setdefault(a, []).append(ham)
        neigh.setdefault(b, []).append(ham)
    want = sorted(
        ((k, len(v), min(v)) for k, v in neigh.items()),
        key=lambda t: (-t[1], t[0]),
    )[:100]
    assert got == want and len(got) > 0


def test_documents_as_audio_e2e(spark):
    long_a = "the quick brown fox jumps over the lazy dog " * 20
    rows = [
        (1, long_a),
        (2, long_a),  # exact dup
        (3, "completely different content with other bytes " * 20),
        (4, None),  # NULL text -> silence, hashes to 0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    media = documents_as_audio(docs, n_samples=512)
    out = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert out[1] == out[2] and out[1] != out[3]
    rate, ch, bits, nf, off, size = parse_wav_header(out[1])
    assert (rate, ch, bits, nf) == (8000, 1, 16, 512)
    fps = {
        r.media_id: r.afp
        for r in audio_fingerprint(media).collect()
    }
    assert fps[1] == fps[2] and fps[4] == 0
    pairs = {
        (r.id_a, r.id_b)
        for r in audio_fingerprint_pairs(media, max_hamming=0).collect()
    }
    assert (1, 2) in pairs
