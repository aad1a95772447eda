"""Persisted perceptual fingerprint store (``operators.
fingerprint_store``): greedy keep-first semantics replicated by a
pure-Python union-find oracle, the pairwise-spacing invariant brute
forced, crash/replay/validation behavior pinned, and the streaming
sink drained against the sequential-refresh control."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from big_data_hadoop_spark.operators.fingerprint_store import (
    fingerprint_store_build,
    fingerprint_store_compact,
    fingerprint_store_load,
    fingerprint_store_refresh,
    fingerprint_store_vacuum,
)

RADIUS = 2


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _greedy(batches, radius):
    """Pure-Python replication of the store's contract: per batch,
    reject rows within ``radius`` of any stored fp; union-find the
    survivors on within-radius pairs; keep the min id per component."""
    stored: dict[int, int] = {}
    for batch in batches:
        batch = [(i, f) for i, f in batch if f is not None]
        fresh = [
            (i, f)
            for i, f in batch
            if not any(_ham(f, g) <= radius for g in stored.values())
        ]
        parent = {i: i for i, _ in fresh}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        fps = dict(fresh)
        ids = sorted(fps)
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                if _ham(fps[ids[ai]], fps[ids[bi]]) <= radius:
                    ra, rb = find(ids[ai]), find(ids[bi])
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        for i, f in fresh:
            if find(i) == i:
                stored[i] = f
    return stored


def _fp_df(spark, rows):
    return spark.createDataFrame(rows, "media_id long, fp long")


# crafted fingerprints: families within radius 2 of a base, and far
# outliers (distinct high bits)
B1 = [(1, 0b1111), (2, 0b1111 ^ 0b11), (3, 1 << 40), (4, None)]
B2 = [(10, 0b1111 ^ 0b1), (11, (1 << 40) ^ 0b1), (12, 7 << 60)]
B3 = [(20, 7 << 60), (21, 0b1111), (22, 1 << 20)]


def _grow(spark, tmp_path, name="s"):
    path = str(tmp_path / name)
    st0 = fingerprint_store_build(
        spark, _fp_df(spark, B1), path, max_hamming=RADIUS
    )
    st1 = fingerprint_store_refresh(spark, _fp_df(spark, B2), path)
    st2 = fingerprint_store_refresh(spark, _fp_df(spark, B3), path)
    return path, (st0, st1, st2)


def test_grown_store_matches_greedy_oracle(spark, tmp_path):
    path, (st0, st1, st2) = _grow(spark, tmp_path)
    got = {
        (r.media_id, r.fp)
        for r in fingerprint_store_load(spark, path).collect()
    }
    want = set(_greedy([B1, B2, B3], RADIUS).items())
    assert got == want
    # stats add up batch by batch
    assert st0["null_fp"] == 1 and st0["rejected_history"] == 0
    assert st0["accepted"] + st0["rejected_within_batch"] == 3
    oracle01 = _greedy([B1, B2], RADIUS)
    assert st1["accepted"] == len(oracle01) - len(_greedy([B1], RADIUS))
    # pairwise spacing invariant: everything stored is > RADIUS apart
    fps = [f for _, f in got]
    assert all(
        _ham(a, b) > RADIUS
        for i, a in enumerate(fps)
        for b in fps[i + 1:]
    )


def test_refusals_and_validation(spark, tmp_path):
    path = str(tmp_path / "s")
    fingerprint_store_build(
        spark, _fp_df(spark, B1), path, max_hamming=RADIUS
    )
    # existing-store refusal
    with pytest.raises(ValueError, match="already exists"):
        fingerprint_store_build(spark, _fp_df(spark, B2), path)
    # known-id refusal vs drop_known
    with pytest.raises(ValueError, match="already accepted"):
        fingerprint_store_refresh(spark, _fp_df(spark, B1), path)
    before = {
        (r.media_id, r.fp)
        for r in fingerprint_store_load(spark, path).collect()
    }
    st = fingerprint_store_refresh(
        spark, _fp_df(spark, B1), path, drop_known=True
    )
    after = {
        (r.media_id, r.fp)
        for r in fingerprint_store_load(spark, path).collect()
    }
    # replayed batch: accepted ids drop as known; the previously
    # REJECTED near-dup (id 2) is re-judged against history and
    # rejected again -> store unchanged
    assert after == before and st["accepted"] == 0
    # NULL id refusal
    with pytest.raises(ValueError, match="NULL ids"):
        fingerprint_store_refresh(
            spark,
            spark.createDataFrame(
                [(None, 123)], "media_id long, fp long"
            ),
            path,
        )
    # duplicate-id refusal, skippable
    dup = _fp_df(spark, [(50, 5), (50, 5)])
    with pytest.raises(ValueError, match="duplicate"):
        fingerprint_store_refresh(spark, dup, path)
    # radius validation
    with pytest.raises(ValueError, match="max_hamming"):
        fingerprint_store_build(
            spark, _fp_df(spark, B1), str(tmp_path / "bad"), max_hamming=4
        )


def test_meta_pins_params_and_columns(spark, tmp_path):
    path = str(tmp_path / "s")
    df = spark.createDataFrame(
        [(1, 0), (2, 3 << 30)], "clip_id long, hash64 long"
    )
    fingerprint_store_build(
        spark, df, path, max_hamming=1, id_col="clip_id", fp_col="hash64"
    )
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    assert (meta["max_hamming"], meta["id_col"], meta["fp_col"]) == (
        1, "clip_id", "hash64",
    )
    loaded = fingerprint_store_load(spark, path)
    assert set(loaded.columns) == {"clip_id", "hash64"}
    st = fingerprint_store_refresh(
        spark,
        spark.createDataFrame(
            [(3, (3 << 30) ^ (1 << 30))], "clip_id long, hash64 long"
        ),
        path,
    )
    assert st["rejected_history"] == 1 and st["accepted"] == 0


def test_compact_vacuum_and_crashed_compact(spark, tmp_path):
    from unittest import mock

    from big_data_hadoop_spark.sources import batch_store

    path, _ = _grow(spark, tmp_path)
    before = {
        (r.media_id, r.fp)
        for r in fingerprint_store_load(spark, path).collect()
    }
    with mock.patch.object(
        batch_store, "write_meta", side_effect=RuntimeError("killed (test)")
    ):
        with pytest.raises(RuntimeError, match="killed"):
            fingerprint_store_compact(spark, path)
    # previous generation intact, orphan slot invisible
    assert {
        (r.media_id, r.fp)
        for r in fingerprint_store_load(spark, path).collect()
    } == before
    assert fingerprint_store_vacuum(path, grace_seconds=0.0)["removed"] == 1
    st = fingerprint_store_compact(spark, path)
    # _grow commits TWO slots (B3's lone survivor candidate is itself
    # within the radius of history, and all-rejected refreshes no
    # longer commit empty slots)
    assert st["batches_before"] == 2 and st["fingerprints"] == len(before)
    assert {
        (r.media_id, r.fp)
        for r in fingerprint_store_load(spark, path).collect()
    } == before
    with open(os.path.join(path, "meta.json")) as fh:
        assert len(json.load(fh)["batches"]) == 1
    vac = fingerprint_store_vacuum(path, grace_seconds=0.0)
    assert vac["removed"] == 2  # the two superseded slots


def test_streaming_sink_matches_sequential_and_replays(spark, tmp_path):
    from big_data_hadoop_spark.streaming.pipelines import (
        streaming_fingerprint_dedup,
    )

    src = str(tmp_path / "src")
    # part-files must sit directly under the streamed path (the file
    # source does not recurse into nested parquet dirs): append both
    # batches into ONE directory
    _fp_df(spark, B2).write.parquet(src)
    _fp_df(spark, B3).write.mode("append").parquet(src)
    path = str(tmp_path / "store")
    fingerprint_store_build(
        spark, _fp_df(spark, B1), path, max_hamming=RADIUS
    )

    def fingerprint(batch):
        return batch.select("media_id", "fp")

    stream = spark.readStream.schema("media_id long, fp long").parquet(src)
    q = streaming_fingerprint_dedup(
        stream, path, str(tmp_path / "ckpt1"), fingerprint
    )
    q.awaitTermination(180)
    got = {
        (r.media_id, r.fp)
        for r in fingerprint_store_load(spark, path).collect()
    }
    # NOTE: availableNow may fold the files into ONE micro-batch or
    # several — the control is the greedy oracle over both batchings
    want_two = set(_greedy([B1, B2, B3], RADIUS).items())
    want_one = set(_greedy([B1, B2 + B3], RADIUS).items())
    assert got in (want_two, want_one)

    # full replay with a fresh checkpoint: nothing changes
    replay = spark.readStream.schema("media_id long, fp long").parquet(src)
    q2 = streaming_fingerprint_dedup(
        replay, path, str(tmp_path / "ckpt2"), fingerprint
    )
    q2.awaitTermination(180)
    assert {
        (r.media_id, r.fp)
        for r in fingerprint_store_load(spark, path).collect()
    } == got


def test_all_rejected_refresh_commits_no_slot(spark, tmp_path):
    """A refresh whose every row is rejected (near-dups of history)
    appends NO batch directory — a no-new-content stream would
    otherwise grow one empty slot per trigger."""
    path = str(tmp_path / "s")
    fingerprint_store_build(
        spark, _fp_df(spark, B1), path, max_hamming=RADIUS
    )
    st = fingerprint_store_refresh(
        spark, _fp_df(spark, [(90, 0b1111)]), path
    )
    assert st["batch"] is None and st["rejected_history"] == 1
    with open(os.path.join(path, "meta.json")) as fh:
        assert json.load(fh)["batches"] == [0]
    assert not os.path.exists(os.path.join(path, "fp", "b00001"))


def test_probe_r06_matches_greedy_oracle(spark):
    """The r06 probe composition (simhash fps -> build on evens ->
    refresh odds -> load) replicated with the pure-Python greedy fold
    over the engine's fingerprints (the fingerprint computation itself
    is oracle-pinned in test_rows_only_values)."""
    from big_data_hadoop_spark.operators.dedup import simhash
    from big_data_hadoop_spark.probes import QUERIES

    got = [
        (r.doc_id, r.fp)
        for r in QUERIES["r06_fingerprint_store"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    ]
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    fps = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    evens = sorted((i, f) for i, f in fps.items() if i % 2 == 0)
    odds = sorted((i, f) for i, f in fps.items() if i % 2 == 1)
    want = sorted(_greedy([evens, odds], 3).items())
    assert got == want and len(got) > 0


def test_matches_read_path(spark, tmp_path):
    """fingerprint_store_matches: ids within the pinned radius of any
    accepted fingerprint, read-only (store untouched), NULL fps never
    match — equal to the brute-force rule over the loaded store."""
    from big_data_hadoop_spark.operators.fingerprint_store import (
        fingerprint_store_matches,
    )

    path, _ = _grow(spark, tmp_path)
    stored = {
        f for _, f in
        ((r.media_id, r.fp)
         for r in fingerprint_store_load(spark, path).collect())
    }
    probe = [(90, 0b1111 ^ 0b1), (91, 5 << 55), (92, None)]
    got = sorted(
        r.media_id
        for r in fingerprint_store_matches(
            spark, _fp_df(spark, probe), path
        ).collect()
    )
    want = sorted(
        i for i, f in probe
        if f is not None and any(_ham(f, s) <= RADIUS for s in stored)
    )
    assert got == want and 90 in got and 92 not in got
    # read-only: manifest unchanged
    with open(os.path.join(path, "meta.json")) as fh:
        assert json.load(fh)["batches"] == [0, 1]


def test_probe_r08_matches_greedy_oracle(spark):
    """The r08 probe composition (clip fingerprints -> radius-0 store
    on evens -> refresh odds -> load) replicated with the pure-Python
    greedy fold over the engine's own clip fingerprints (the frame
    hash / clip digest contracts are pinned in test_videohash.py)."""
    from big_data_hadoop_spark.operators.videohash import (
        documents_as_video,
        video_clip_fingerprint,
        video_dhash,
    )
    from big_data_hadoop_spark.probes import QUERIES

    got = [
        (r.media_id, r.fp)
        for r in QUERIES["r08_video_exact_store"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    ]
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    fh = video_dhash(
        documents_as_video(docs, n_frames=4, width=12, height=12),
        n_frames=4,
    )
    fps = {
        r.media_id: r.fp for r in video_clip_fingerprint(fh).collect()
    }
    evens = sorted((i, f) for i, f in fps.items() if i % 2 == 0)
    odds = sorted((i, f) for i, f in fps.items() if i % 2 == 1)
    want = sorted(_greedy([evens, odds], 0).items())
    assert got == want and len(got) > 0
    # radius 0 is EXACT dedup: accepted fingerprints pairwise distinct,
    # and every corpus fingerprint value is represented
    vals = [f for _, f in got]
    assert len(set(vals)) == len(vals)
    assert set(vals) == set(fps.values())


def test_streaming_sink_validates_fp_col(spark, tmp_path):
    """A callable returning the right id but a differently-named
    fingerprint column fails with the sink's explanatory error, not a
    raw unresolved-column AnalysisException from inside _accept
    (round-10 ADVICE)."""
    from big_data_hadoop_spark.streaming.pipelines import (
        streaming_fingerprint_dedup,
    )

    src = str(tmp_path / "src")
    _fp_df(spark, B2).write.parquet(src)
    path = str(tmp_path / "store")
    fingerprint_store_build(
        spark, _fp_df(spark, B1), path, max_hamming=RADIUS
    )
    stream = spark.readStream.schema("media_id long, fp long").parquet(src)
    q = streaming_fingerprint_dedup(
        stream,
        path,
        str(tmp_path / "ckpt"),
        lambda b: b.select("media_id", F.col("fp").alias("dhash")),
    )
    with pytest.raises(Exception, match="pinned column"):
        q.awaitTermination(180)


def test_streaming_sink_requires_existing_store(spark, tmp_path):
    from big_data_hadoop_spark.streaming.pipelines import (
        streaming_fingerprint_dedup,
    )

    src = str(tmp_path / "src")
    _fp_df(spark, B1[:2]).write.parquet(src)
    stream = spark.readStream.schema("media_id long, fp long").parquet(src)
    with pytest.raises(FileNotFoundError, match="fingerprint_store_build"):
        streaming_fingerprint_dedup(
            stream, str(tmp_path / "absent"), str(tmp_path / "c"),
            lambda b: b,
        )
