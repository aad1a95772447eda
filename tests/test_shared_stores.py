"""Shared per-corpus persisted stores behind the graph probes (round-10
judge task 1): q88/q97/q98/q99 load the near-dup pair graph from ONE
build-if-absent store instead of re-running the minhash pipeline per
probe, and q93's fingerprint history is the maintained SimHash store.
Pins: build-at-most-once, content-keyed staleness, edge equality with a
fresh one-shot build, probe==consumer-off-store wiring, and a full
pure-Python replication of q93's store-backed greedy semantics."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from big_data_hadoop_spark.probes import (
    QUERIES,
    _shared_neardup_edges,
    _shared_simhash_history,
    shared_neardup_store_path,
    shared_simhash_store_path,
)
from tests.conftest import SF_SMOKE


def _edges(df):
    return {(r.id_a, r.id_b, r.jac_est) for r in df.collect()}


def test_shared_store_built_at_most_once(spark):
    e1 = _edges(_shared_neardup_edges(spark, SF_SMOKE))
    meta = os.path.join(shared_neardup_store_path(SF_SMOKE), "meta.json")
    mtime = os.stat(meta).st_mtime_ns
    e2 = _edges(_shared_neardup_edges(spark, SF_SMOKE))
    assert e1 == e2 and len(e1) > 0
    # second call LOADED — no rebuild, no meta recommit
    assert os.stat(meta).st_mtime_ns == mtime


def test_shared_edges_equal_fresh_one_shot_build(spark, tmp_path):
    from big_data_hadoop_spark.operators.neardup_graph import (
        neardup_graph_build,
        neardup_graph_load,
    )
    from big_data_hadoop_spark.sources.io import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    path = str(tmp_path / "fresh")
    neardup_graph_build(spark, docs, path, threshold=0.7)
    want = _edges(neardup_graph_load(spark, path))
    got = _edges(_shared_neardup_edges(spark, SF_SMOKE))
    assert got == want


def test_store_key_tracks_corpus_content(tmp_path):
    src = os.path.join(SF_SMOKE, "documents.parquet")
    sf2 = str(tmp_path / "sf")
    os.makedirs(sf2)
    dst = os.path.join(sf2, "documents.parquet")
    (shutil.copytree if os.path.isdir(src) else shutil.copyfile)(src, dst)
    p1 = shared_neardup_store_path(sf2)
    assert p1 != shared_neardup_store_path(SF_SMOKE)  # path is in the key
    # content mutation (mtime bump) -> new key, stale store unreachable
    target = dst
    if os.path.isdir(dst):
        target = os.path.join(
            dst, sorted(os.listdir(dst))[0]
        )
    st = os.stat(target)
    os.utime(target, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    assert shared_neardup_store_path(sf2) != p1


def test_graph_probes_equal_consumers_off_loaded_store(spark):
    from big_data_hadoop_spark.operators.graph import (
        bfs_distances,
        k_core,
        label_propagation,
        pagerank,
    )

    edges = _shared_neardup_edges(spark, SF_SMOKE).select("id_a", "id_b")

    got88 = [
        (r.id, r.rank)
        for r in QUERIES["q88_pagerank_neardup"](spark, SF_SMOKE).collect()
    ]
    want88 = [
        (r.id, round(r.rank, 8))
        for r in pagerank(edges, tol=1e-4, max_iter=15)
        .orderBy("id")
        .collect()
    ]
    assert got88 == want88 and len(got88) > 0

    got97 = [
        tuple(r) for r in QUERIES["q97_kcore_neardup"](spark, SF_SMOKE).collect()
    ]
    want97 = [tuple(r) for r in k_core(edges, 2).orderBy("id").collect()]
    assert got97 == want97

    got98 = [
        tuple(r)
        for r in QUERIES["q98_lpa_communities"](spark, SF_SMOKE).collect()
    ]
    want98 = [
        tuple(r) for r in label_propagation(edges).orderBy("id").collect()
    ]
    assert got98 == want98 and len(got98) > 0

    seed = edges.agg(F.min(F.least("id_a", "id_b")).alias("m")).first().m
    got99 = [
        tuple(r)
        for r in QUERIES["q99_bfs_expansion"](spark, SF_SMOKE).collect()
    ]
    want99 = [
        tuple(r) for r in bfs_distances(edges, [seed]).orderBy("id").collect()
    ]
    assert got99 == want99 and len(got99) > 0


def test_shared_exact_pairs_equal_direct_operator(spark):
    """The cached derived table is the operator's own output, value
    for value — q58/q67/q85 consume the identical relation they used
    to build inline."""
    from big_data_hadoop_spark.operators.dedup import minhash_lsh_pairs
    from big_data_hadoop_spark.probes import _shared_exact_pairs
    from big_data_hadoop_spark.sources.io import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    want = {
        (r.id_a, r.id_b, r.jac)
        for r in minhash_lsh_pairs(docs, threshold=0.7).collect()
    }
    got = {
        (r.id_a, r.id_b, r.jac)
        for r in _shared_exact_pairs(spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) > 0


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_q93_matches_store_backed_greedy_replication(spark):
    """q93 == pure-Python fold of its round-10 semantics: the history
    split grows a greedy keep-first fingerprint store (union-find at
    radius 3, min-id representative per component), the batch is
    rejected against the STORE's accepted fps, then within-batch
    greedy dedup — all over the engine's own simhash values (the
    fingerprint computation itself is oracle-pinned elsewhere)."""
    from big_data_hadoop_spark.operators.dedup import simhash
    from big_data_hadoop_spark.sources.io import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    fps = {r.doc_id: r.simhash for r in simhash(docs).collect()}

    # greedy store accept over the history split (one batch, min-id)
    hist = {i: f for i, f in fps.items() if i % 3 == 0}
    parent = {i: i for i in hist}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(hist)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            if _ham(hist[ids[ai]], hist[ids[bi]]) <= 3:
                ra, rb = find(ids[ai]), find(ids[bi])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    stored = [hist[i] for i in ids if find(i) == i]
    # the shared store holds exactly these fingerprints
    store_fps = sorted(
        r.simhash for r in _shared_simhash_history(spark, SF_SMOKE).collect()
    )
    assert store_fps == sorted(stored)

    # batch vs store, then within-batch greedy keep-min
    batch = {i: f for i, f in fps.items() if i % 3 != 0}
    fresh = {
        i: f
        for i, f in batch.items()
        if all(_ham(f, s) > 3 for s in stored)
    }
    parent = {i: i for i in fresh}
    ids = sorted(fresh)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            if _ham(fresh[ids[ai]], fresh[ids[bi]]) <= 3:
                ra, rb = find(ids[ai]), find(ids[bi])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    want = sorted(i for i in ids if find(i) == i)
    got = [
        r.doc_id
        for r in QUERIES["q93_simhash_incremental"](spark, SF_SMOKE).collect()
    ]
    assert got == want and len(got) > 0


def test_shared_embedding_store_built_once_and_r11_books(spark):
    """The r11 audit probe's shared embedding store (round 11): built
    at most once per corpus (meta untouched on the second call), and
    the probe's output is the audit's books — metric names pinned,
    recall in [0, 1], cell ⊆ truth, missed = truth − cell, sample
    bounded, store diagnostics positive. Value-level audit books are
    independently replicated against a pure-Python oracle in
    tests/test_embedding_store.py."""
    from big_data_hadoop_spark.probes import (
        _shared_embedding_store,
        shared_embedding_store_path,
    )

    path1 = _shared_embedding_store(spark, SF_SMOKE)
    meta = os.path.join(shared_embedding_store_path(SF_SMOKE), "meta.json")
    mtime = os.stat(meta).st_mtime_ns
    assert _shared_embedding_store(spark, SF_SMOKE) == path1
    assert os.stat(meta).st_mtime_ns == mtime  # loaded, not rebuilt
    rows = {
        r.metric: r.value
        for r in QUERIES["r11_embedding_store_audit"](
            spark, SF_SMOKE
        ).collect()
    }
    assert sorted(rows) == [
        "audit_cell_matches",
        "audit_missed",
        "audit_recall",
        "audit_sample_rows",
        "audit_truth_matches",
        "store_build_dist_mean",
        "store_n_cells",
    ]
    assert 0.0 <= rows["audit_recall"] <= 1.0
    assert rows["audit_cell_matches"] <= rows["audit_truth_matches"]
    assert (
        rows["audit_missed"]
        == rows["audit_truth_matches"] - rows["audit_cell_matches"]
    )
    assert 0 < rows["audit_sample_rows"] <= 128
    assert rows["store_n_cells"] == 8.0
    assert rows["store_build_dist_mean"] > 0.0


def test_crash_leak_sweep_spares_live_owners_and_reads_file_mtimes(
    tmp_path,
):
    """The shared-base crash-leak sweep (``_shared_store_path``) must
    (a) never reap a temporary whose owning pid is still alive — a
    single multi-hour part file updates no mtime until it closes, so
    mtime alone cannot prove death (round-11 advice); (b) judge a
    dead owner's staleness by the newest mtime across the tree's dirs
    AND files; (c) still sweep a dead owner's genuinely stale tree."""
    import time

    from big_data_hadoop_spark.probes import _shared_store_path

    base = os.path.dirname(_shared_store_path("sweeptest", "k0"))
    old = time.time() - 7200.0
    dead_pid = 4194000 + (os.getpid() % 100)  # near pid_max: no owner

    def plant(name, file_mtime, dir_mtime):
        p = os.path.join(base, name)
        os.makedirs(os.path.join(p, "_temporary"), exist_ok=True)
        f = os.path.join(p, "_temporary", "part-0")
        with open(f, "w") as fh:
            fh.write("x")
        os.utime(f, (file_mtime, file_mtime))
        os.utime(os.path.join(p, "_temporary"), (dir_mtime, dir_mtime))
        os.utime(p, (dir_mtime, dir_mtime))
        return p

    ancient = time.time() - 8.5 * 86400.0  # past _TMP_LIVE_CAP
    live = plant(f"a.tmp-{os.getpid()}", old, old)  # we are the owner
    dead_fresh = plant(f"b.tmp-{dead_pid}", time.time(), old)
    dead_stale = plant(f"c.tmp-{dead_pid}", old, old)
    # (d) a RECYCLED pid: the name carries OUR (alive) pid but the
    # tree is past the liveness hard cap — the round-12 review case
    # where pid wraparound would shield a dead builder's litter
    # forever; past the cap it falls to the staleness gate and sweeps
    recycled = plant(f"d.tmp-{os.getpid()}", ancient, ancient)
    try:
        _shared_store_path("sweeptest", "k1")  # triggers the sweep
        assert os.path.isdir(live), "live owner's temp was reaped"
        assert os.path.isdir(dead_fresh), "fresh FILE mtime ignored"
        assert not os.path.exists(dead_stale), "stale orphan kept"
        assert not os.path.exists(recycled), (
            "past-cap tree kept on pid-liveness alone"
        )
    finally:
        for p in (live, dead_fresh, dead_stale, recycled):
            shutil.rmtree(p, ignore_errors=True)
