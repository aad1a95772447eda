"""Persisted frame-hash store (``operators.framehash_store``): greedy
clip-granularity keep-first semantics replicated by a pure-Python
union-find oracle over the ``video_matches_against`` matching rule,
the no-two-stored-clips-match invariant brute forced, crash/replay/
validation behavior pinned, and the streaming sink drained against the
greedy control (the fingerprint-store test battery, one tier up)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from big_data_hadoop_spark.operators.framehash_store import (
    framehash_store_build,
    framehash_store_compact,
    framehash_store_load,
    framehash_store_refresh,
    framehash_store_vacuum,
)

RADIUS = 1
MIN_FRAMES = 2
DROP_CONSTANT = True


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _match(fa, fb, radius=RADIUS, min_frames=MIN_FRAMES,
           drop_constant=DROP_CONSTANT):
    """The video_matches_against rule: >= min_frames distinct
    (frame_no_a, frame_no_b) pairs within the radius; dHash-0 frames
    excluded on both sides under drop_constant."""
    a = {n: h for n, h in fa.items() if not (drop_constant and h == 0)}
    b = {n: h for n, h in fb.items() if not (drop_constant and h == 0)}
    pairs = sum(
        1 for ha in a.values() for hb in b.values() if _ham(ha, hb) <= radius
    )
    return pairs >= min_frames


def _greedy(batches):
    """Per batch: reject clips matching ANY stored clip; union-find the
    survivors on pairwise matches; keep the min clip id per
    component."""
    stored: dict[int, dict[int, int]] = {}
    for batch in batches:
        fresh = {
            cid: frames
            for cid, frames in batch.items()
            if not any(_match(frames, s) for s in stored.values())
        }
        parent = {i: i for i in fresh}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ids = sorted(fresh)
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                if _match(fresh[ids[ai]], fresh[ids[bi]]):
                    ra, rb = find(ids[ai]), find(ids[bi])
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        for cid, frames in fresh.items():
            if find(cid) == cid:
                stored[cid] = frames
    return stored


def _fh_df(spark, clips):
    rows = [
        (cid, n, h) for cid, frames in clips.items()
        for n, h in sorted(frames.items())
    ]
    return spark.createDataFrame(
        rows, "media_id long, frame_no int, dhash long"
    )


# crafted clips: a near-dup family (two frames within 1 bit), a far
# clip, and a blank-heavy clip whose single content frame is not
# enough to match under min_frames=2
B1 = {
    1: {0: 0xF0, 1: 0xF00, 2: 1 << 40},
    2: {0: 0xF1, 1: 0xF01, 2: 1 << 50},       # near-dup of 1 (2 frames)
    3: {0: 7 << 60, 1: 5 << 20, 2: 9 << 30},  # far
    4: {0: 0, 1: 0, 2: 0xF0},                 # blanks + one shared frame
}
B2 = {
    10: {0: 0xF0, 1: 0xF00, 2: 123 << 8},     # matches stored 1
    11: {0: 7 << 60, 1: (5 << 20) ^ 1, 2: 1 << 15},  # matches stored 3
    12: {0: 1 << 25, 1: 1 << 26, 2: 1 << 27},  # fresh
}


def _grow(spark, tmp_path, name="s"):
    path = str(tmp_path / name)
    st0 = framehash_store_build(
        spark, _fh_df(spark, B1), path,
        max_hamming=RADIUS, min_matching_frames=MIN_FRAMES,
        drop_constant=DROP_CONSTANT,
    )
    st1 = framehash_store_refresh(spark, _fh_df(spark, B2), path)
    return path, (st0, st1)


def _loaded(spark, path):
    out: dict[int, dict[int, int]] = {}
    for r in framehash_store_load(spark, path).collect():
        out.setdefault(r.media_id, {})[r.frame_no] = r.dhash
    return out


def test_grown_store_matches_greedy_oracle(spark, tmp_path):
    path, (st0, st1) = _grow(spark, tmp_path)
    got = _loaded(spark, path)
    want = _greedy([B1, B2])
    assert got == want
    # stats: clip counts add up per batch
    assert st0["clips_in"] == 4 and st0["rejected_history"] == 0
    assert st0["accepted"] + st0["rejected_within_batch"] == 4
    assert st1["rejected_history"] == 2 and st1["accepted"] == 1
    # invariant: no two STORED clips match at the pinned parameters
    ids = sorted(got)
    assert all(
        not _match(got[a], got[b])
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
    )
    # accepted clips store their FULL frame rows (blank frames kept —
    # drop_constant is a matching-time rule, not a storage filter)
    assert got[4] == B1[4]


def test_refusals_and_validation(spark, tmp_path):
    path, _ = _grow(spark, tmp_path)
    with pytest.raises(ValueError, match="already exists"):
        framehash_store_build(spark, _fh_df(spark, B1), path)
    with pytest.raises(ValueError, match="already accepted"):
        framehash_store_refresh(spark, _fh_df(spark, B1), path)
    before = _loaded(spark, path)
    st = framehash_store_refresh(
        spark, _fh_df(spark, B1), path, drop_known=True
    )
    # replay: accepted ids drop as known; previously-rejected clips are
    # re-judged by the same history and rejected again -> unchanged
    assert _loaded(spark, path) == before and st["accepted"] == 0
    with pytest.raises(ValueError, match="NULL clip ids"):
        framehash_store_refresh(
            spark,
            spark.createDataFrame(
                [(None, 0, 5)], "media_id long, frame_no int, dhash long"
            ),
            path,
        )
    with pytest.raises(ValueError, match="chimera"):
        framehash_store_refresh(
            spark,
            spark.createDataFrame(
                [(50, 0, 5), (50, 0, 6)],
                "media_id long, frame_no int, dhash long",
            ),
            path,
        )
    # a NULL frame_no is NOT a duplicate (round-11 review: the naive
    # multi-arg count_distinct dropped such rows and spuriously fired
    # the chimera refusal) — the batch flows through validation;
    # two rows on the SAME (id, NULL) slot still refuse
    st_nullframe = framehash_store_refresh(
        spark,
        spark.createDataFrame(
            [(51, None, 1234567), (51, 1, 7654321)],
            "media_id long, frame_no int, dhash long",
        ),
        path,
    )
    assert st_nullframe["clips_in"] == 1  # validated, judged normally
    with pytest.raises(ValueError, match="chimera"):
        framehash_store_refresh(
            spark,
            spark.createDataFrame(
                [(52, None, 5), (52, None, 6)],
                "media_id long, frame_no int, dhash long",
            ),
            path,
        )
    with pytest.raises(ValueError, match="max_hamming"):
        framehash_store_build(
            spark, _fh_df(spark, B1), str(tmp_path / "bad"), max_hamming=4
        )
    with pytest.raises(ValueError, match="min_matching_frames"):
        framehash_store_build(
            spark, _fh_df(spark, B1), str(tmp_path / "bad2"),
            min_matching_frames=0,
        )


def test_meta_pins_params(spark, tmp_path):
    path, _ = _grow(spark, tmp_path)
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    assert meta["max_hamming"] == RADIUS
    assert meta["min_matching_frames"] == MIN_FRAMES
    assert meta["drop_constant"] is DROP_CONSTANT
    assert meta["max_frame_df"] is None  # pure contract by default
    assert meta["id_col"] == "media_id"


def test_max_frame_df_pinned_and_honored_on_refresh(spark, tmp_path):
    """A store built with the boilerplate-frame valve pins it in meta
    and applies it on refresh: a batch clip sharing ONLY the
    corpus-wide intro/outro with history is accepted (novel content),
    while a true re-encode of a stored clip is rejected."""
    INTRO, OUTRO = 1 << 20, 1 << 40
    hist = {
        c: {0: INTRO, 1: (1 << (2 * c)) | 1, 2: (1 << (2 * c)) | 3,
            3: OUTRO}
        for c in range(1, 9)
    }
    path = str(tmp_path / "s")
    st = framehash_store_build(
        spark, _fh_df(spark, hist), path,
        max_hamming=0, min_matching_frames=2, drop_constant=False,
        max_frame_df=4,
    )
    # without the valve every clip pair would match on INTRO+OUTRO and
    # one clip would survive; with it all 8 are mutually novel
    assert st["accepted"] == 8 and st["rejected_within_batch"] == 0
    with open(os.path.join(path, "meta.json")) as fh:
        assert json.load(fh)["max_frame_df"] == 4
    batch = {
        100: {0: INTRO, 1: 1 << 55, 2: 1 << 56, 3: OUTRO},  # novel
        101: dict(hist[1]),  # re-encode of stored clip 1
    }
    st2 = framehash_store_refresh(spark, _fh_df(spark, batch), path)
    assert st2["accepted"] == 1 and st2["rejected_history"] == 1
    got = _loaded(spark, path)
    assert 100 in got and 101 not in got


def test_all_rejected_refresh_commits_no_slot(spark, tmp_path):
    path, _ = _grow(spark, tmp_path)
    with open(os.path.join(path, "meta.json")) as fh:
        before = json.load(fh)["batches"]
    st = framehash_store_refresh(
        spark, _fh_df(spark, {90: B1[1]}), path
    )
    assert st["batch"] is None and st["rejected_history"] == 1
    with open(os.path.join(path, "meta.json")) as fh:
        assert json.load(fh)["batches"] == before


def test_compact_vacuum_and_crashed_compact(spark, tmp_path):
    from unittest import mock

    from big_data_hadoop_spark.sources import batch_store

    path, _ = _grow(spark, tmp_path)
    before = _loaded(spark, path)
    with mock.patch.object(
        batch_store, "write_meta", side_effect=RuntimeError("killed (test)")
    ):
        with pytest.raises(RuntimeError, match="killed"):
            framehash_store_compact(spark, path)
    assert _loaded(spark, path) == before
    assert framehash_store_vacuum(path, grace_seconds=0.0)["removed"] == 1
    st = framehash_store_compact(spark, path)
    assert st["batches_before"] == 2
    assert st["frame_rows"] == sum(len(f) for f in before.values())
    assert _loaded(spark, path) == before
    assert framehash_store_vacuum(path, grace_seconds=0.0)["removed"] == 2


def test_streaming_sink_matches_greedy_and_replays(spark, tmp_path):
    from big_data_hadoop_spark.streaming.pipelines import (
        streaming_video_dedup,
    )

    src = str(tmp_path / "src")
    _fh_df(spark, B2).write.parquet(src)
    B3 = {20: {0: 1 << 25, 1: (1 << 26) ^ 1, 2: 5}}  # matches 12 if stored
    _fh_df(spark, B3).write.mode("append").parquet(src)
    path = str(tmp_path / "store")
    framehash_store_build(
        spark, _fh_df(spark, B1), path,
        max_hamming=RADIUS, min_matching_frames=MIN_FRAMES,
        drop_constant=DROP_CONSTANT,
    )

    stream = spark.readStream.schema(
        "media_id long, frame_no int, dhash long"
    ).parquet(src)
    q = streaming_video_dedup(
        stream, path, str(tmp_path / "ckpt1"),
        lambda b: b.select("media_id", "frame_no", "dhash"),
    )
    q.awaitTermination(180)
    got = _loaded(spark, path)
    # availableNow may fold the two files into one micro-batch or two
    want_two = _greedy([B1, B2, B3])
    want_one = _greedy([B1, {**B2, **B3}])
    assert got in (want_two, want_one)

    # full replay with a fresh checkpoint: nothing changes
    replay = spark.readStream.schema(
        "media_id long, frame_no int, dhash long"
    ).parquet(src)
    q2 = streaming_video_dedup(
        replay, path, str(tmp_path / "ckpt2"),
        lambda b: b.select("media_id", "frame_no", "dhash"),
    )
    q2.awaitTermination(180)
    assert _loaded(spark, path) == got


def test_streaming_sink_validates_columns_and_store(spark, tmp_path):
    from big_data_hadoop_spark.streaming.pipelines import (
        streaming_video_dedup,
    )

    src = str(tmp_path / "src")
    _fh_df(spark, B2).write.parquet(src)
    with pytest.raises(FileNotFoundError, match="framehash_store_build"):
        streaming_video_dedup(
            spark.readStream.schema(
                "media_id long, frame_no int, dhash long"
            ).parquet(src),
            str(tmp_path / "absent"),
            str(tmp_path / "c"),
            lambda b: b,
        )
    path = str(tmp_path / "store")
    framehash_store_build(spark, _fh_df(spark, B1), path)
    q = streaming_video_dedup(
        spark.readStream.schema(
            "media_id long, frame_no int, dhash long"
        ).parquet(src),
        path,
        str(tmp_path / "ckpt"),
        lambda b: b.select("media_id", F.col("dhash").alias("h")),
    )
    with pytest.raises(Exception, match="pinned column"):
        q.awaitTermination(180)


def test_matches_read_path(spark, tmp_path):
    """framehash_store_matches: clip ids that would be rejected right
    now, under the pinned parameters — equal to the direct rule over
    the loaded history; read-only (manifest unchanged)."""
    from big_data_hadoop_spark.operators.framehash_store import (
        framehash_store_matches,
    )

    path, _ = _grow(spark, tmp_path)
    stored = _loaded(spark, path)
    probe = {
        90: dict(B1[1]),                                  # re-encode
        91: {0: 9 << 50, 1: 11 << 50, 2: 13 << 50},       # novel
    }
    got = sorted(
        r.media_id
        for r in framehash_store_matches(
            spark, _fh_df(spark, probe), path
        ).collect()
    )
    want = sorted(
        cid for cid, frames in probe.items()
        if any(_match(frames, s) for s in stored.values())
    )
    assert got == want and 90 in got and 91 not in got
    with open(os.path.join(path, "meta.json")) as fh:
        assert json.load(fh)["batches"] == [0, 1]


def test_concurrent_refreshes_serialize_and_both_commit(spark, tmp_path):
    """Two refreshes racing on one store SERIALIZE on the writer claim
    and both commit in distinct slots; the grown store equals the
    greedy fold under ONE of the two serialization orders (greedy
    outcomes are order-dependent BY CONTRACT — the disclosed
    keep-first semantics — but never corrupt: the no-two-stored-clips-
    match invariant holds either way)."""
    import threading

    B3 = {30: {0: 1 << 45, 1: 1 << 46, 2: 1 << 47}}
    path = str(tmp_path / "s")
    framehash_store_build(
        spark, _fh_df(spark, B1), path,
        max_hamming=RADIUS, min_matching_frames=MIN_FRAMES,
        drop_constant=DROP_CONSTANT,
    )
    errs = []

    def refresh(clips):
        try:
            framehash_store_refresh(spark, _fh_df(spark, clips), path)
        except Exception as exc:
            errs.append(exc)

    ts = [
        threading.Thread(target=refresh, args=(c,)) for c in (B2, B3)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    with open(os.path.join(path, "meta.json")) as fh:
        assert json.load(fh)["batches"] == [0, 1, 2]
    got = _loaded(spark, path)
    assert got in (_greedy([B1, B2, B3]), _greedy([B1, B3, B2]))
    ids = sorted(got)
    assert all(
        not _match(got[a], got[b])
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
    )


def test_reader_isolated_from_concurrent_refresh(spark, tmp_path):
    """A frame loaded before a refresh keeps returning its own meta
    generation after the refresh commits (immutable batch dirs — the
    no-swap-window reader contract, pinned per store)."""
    path = str(tmp_path / "s")
    framehash_store_build(
        spark, _fh_df(spark, B1), path,
        max_hamming=RADIUS, min_matching_frames=MIN_FRAMES,
        drop_constant=DROP_CONSTANT,
    )
    held = framehash_store_load(spark, path)
    before = {(r.media_id, r.frame_no, r.dhash) for r in held.collect()}
    framehash_store_refresh(spark, _fh_df(spark, B2), path)
    assert {
        (r.media_id, r.frame_no, r.dhash) for r in held.collect()
    } == before
    assert len(_loaded(spark, path)) > len({i for i, _, _ in before})


def test_probe_r09_matches_greedy_oracle(spark):
    """The r09 probe composition (shared frame-hash table -> build on
    evens -> refresh odds -> load) replicated with the pure-Python
    greedy fold over the engine's own frame hashes at the probe's
    pinned parameters (radius 1, 2 matching frames, blanks excluded
    from matching)."""
    from big_data_hadoop_spark.probes import (
        QUERIES,
        _shared_video_framehash,
    )

    got: dict[int, dict[int, int]] = {}
    for r in QUERIES["r09_video_framehash_store"](
        spark, "/root/testdata/sf0.001"
    ).collect():
        got.setdefault(r.media_id, {})[r.frame_no] = r.dhash
    clips: dict[int, dict[int, int]] = {}
    for r in _shared_video_framehash(
        spark, "/root/testdata/sf0.001"
    ).collect():
        clips.setdefault(r.media_id, {})[r.frame_no] = r.dhash
    evens = {c: f for c, f in clips.items() if c % 2 == 0}
    odds = {c: f for c, f in clips.items() if c % 2 == 1}
    want = _greedy([evens, odds])
    assert got == want and len(got) > 0


def test_store_composes_with_real_codec_tier(spark, tmp_path):
    """End-to-end with REAL GIF clips: render documents as animated
    GIFs, frame-hash them, grow the store in two batches, and pin the
    result against the greedy oracle over the engine's own frame
    hashes (the decode/hash contract itself is oracle-pinned in
    test_videohash.py)."""
    from big_data_hadoop_spark.operators.videohash import (
        documents_as_video,
        video_dhash,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text").limit(60)
    fh = video_dhash(
        documents_as_video(docs, n_frames=3, width=10, height=10),
        n_frames=3,
    ).localCheckpoint(eager=True)
    clips: dict[int, dict[int, int]] = {}
    for r in fh.collect():
        clips.setdefault(r.media_id, {})[r.frame_no] = r.dhash
    evens = {c: f for c, f in clips.items() if c % 2 == 0}
    odds = {c: f for c, f in clips.items() if c % 2 == 1}
    path = str(tmp_path / "store")
    framehash_store_build(
        spark, fh.filter(F.col("media_id") % 2 == 0), path,
        max_hamming=RADIUS, min_matching_frames=MIN_FRAMES,
        drop_constant=DROP_CONSTANT,
    )
    framehash_store_refresh(
        spark, fh.filter(F.col("media_id") % 2 == 1), path
    )
    assert _loaded(spark, path) == _greedy([evens, odds])


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def _clip_batches(draw):
    """Two small clip batches over a tiny hash alphabet (low bits +
    one-bit perturbations) so collisions, near-misses and blank frames
    all occur."""
    alphabet = [0, 1, 2, 3, 6, 1 << 10, (1 << 10) | 1, 5 << 20]

    def batch(ids):
        return {
            i: {
                f: draw(st.sampled_from(alphabet))
                for f in range(draw(st.integers(2, 4)))
            }
            for i in ids
        }

    n1 = draw(st.integers(1, 5))
    n2 = draw(st.integers(1, 5))
    return batch(range(1, n1 + 1)), batch(range(100, 100 + n2))


@_SETTINGS
@given(_clip_batches())
def test_greedy_property_random_batches(spark, tmp_path_factory, data):
    """Randomized greedy-equality property: build+refresh over random
    small clip batches equals the pure-Python fold, and the stored set
    satisfies the no-two-match invariant."""
    b1, b2 = data
    path = str(tmp_path_factory.mktemp("fhprop") / "s")
    framehash_store_build(
        spark, _fh_df(spark, b1), path,
        max_hamming=RADIUS, min_matching_frames=MIN_FRAMES,
        drop_constant=DROP_CONSTANT,
    )
    framehash_store_refresh(spark, _fh_df(spark, b2), path)
    got = _loaded(spark, path)
    assert got == _greedy([b1, b2])
    ids = sorted(got)
    assert all(
        not _match(got[a], got[b])
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
    )


def test_streaming_sink_health_log_equals_sequential_control(
    spark, tmp_path
):
    """``stats_path`` on the video sink: per-micro-batch refresh stats
    equal the sequential control verbs' on an identical control store
    — the embedding-sink health-parity pin, one tier over."""
    from big_data_hadoop_spark.streaming.pipelines import (
        streaming_video_dedup,
    )

    src = str(tmp_path / "src")
    _fh_df(spark, B2).write.parquet(src)
    B3 = {20: {0: 1 << 25, 1: (1 << 26) ^ 1, 2: 5}}
    _fh_df(spark, B3).write.mode("append").parquet(src)
    path, control = str(tmp_path / "store"), str(tmp_path / "control")
    for p in (path, control):
        framehash_store_build(
            spark, _fh_df(spark, B1), p,
            max_hamming=RADIUS, min_matching_frames=MIN_FRAMES,
            drop_constant=DROP_CONSTANT,
        )
    stats_path = str(tmp_path / "health")
    stream = spark.readStream.schema(
        "media_id long, frame_no int, dhash long"
    ).parquet(src)
    q = streaming_video_dedup(
        stream, path, str(tmp_path / "ckpt"),
        lambda b: b.select("media_id", "frame_no", "dhash"),
        stats_path=stats_path,
    )
    q.awaitTermination(180)
    log = [
        json.loads(r.stats)
        for r in spark.read.parquet(stats_path).orderBy("epoch").collect()
    ]
    batches = [B2, B3] if len(log) == 2 else [{**B2, **B3}]
    assert len(log) == len(batches)
    from big_data_hadoop_spark.operators.framehash_store import (
        framehash_store_refresh,
    )

    for row, batch in zip(log, batches):
        want = framehash_store_refresh(
            spark, _fh_df(spark, batch), control,
            drop_known=True, validate_ids=False,
        )
        assert row == want, (row, want)
