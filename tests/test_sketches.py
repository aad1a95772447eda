"""Sketch aggregates: every approximate operator is bounded against its
exact verifier on real data (the same pairing discipline as LSH vs
brute-force)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from big_data_hadoop_spark.operators.sketches import (
    approx_distinct_tokens,
    approx_percentiles,
    exact_distinct_tokens,
    heavy_hitter_tokens,
)
from big_data_hadoop_spark.sources.io import load_table
from tests.conftest import SF_ORACLE


def test_approx_distinct_within_rsd_bound(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    rsd = 0.05
    approx = {
        r.category: r.n_distinct_approx
        for r in approx_distinct_tokens(docs, rsd=rsd).collect()
    }
    exact = {
        r.category: r.n_distinct
        for r in exact_distinct_tokens(docs).collect()
    }
    assert set(approx) == set(exact) and exact
    for cat, n in exact.items():
        # 4 standard deviations: P(outside) ~ 6e-5, and the estimate is
        # deterministic for fixed input, so this cannot flake
        assert abs(approx[cat] - n) <= max(4 * rsd * n, 4), (cat, approx[cat], n)


def test_approx_percentiles_within_rank_error(spark):
    li = load_table(spark, SF_ORACLE, "lineitem")
    accuracy = 10_000
    (row,) = approx_percentiles(
        li, "l_extendedprice", (0.5, 0.9, 0.99), accuracy
    ).collect()
    vals = sorted(r.l_extendedprice for r in li.select("l_extendedprice").collect())
    n = len(vals)
    for p, got in (("p50", row.p50), ("p90", row.p90), ("p99", row.p99)):
        prob = {"p50": 0.5, "p90": 0.9, "p99": 0.99}[p]
        # GK guarantee: the returned value's rank is within n/accuracy
        # of the target rank
        import bisect

        lo = bisect.bisect_left(vals, got)
        hi = bisect.bisect_right(vals, got)
        target = prob * n
        tol = n / accuracy + 1
        assert lo - tol <= target <= hi + tol, (p, got, lo, hi, target)


def test_heavy_hitters_match_duckdb(spark, duck):
    docs = load_table(spark, SF_ORACLE, "documents")
    got = heavy_hitter_tokens(docs, min_share=0.01).toPandas()
    oracle = """
WITH t AS (
  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents),
c AS (
  SELECT CASE WHEN regexp_full_match(tok, '[a-z-_]+') THEN 'word'
              WHEN regexp_full_match(tok, '[-+]?[0-9]+[.]{0,1}[0-9]*')
                THEN 'number' END AS category,
         tok AS token
  FROM t),
f AS (SELECT category, token FROM c WHERE category IS NOT NULL),
counts AS (SELECT category, token, COUNT(*) AS cnt FROM f GROUP BY 1, 2),
totals AS (SELECT category, COUNT(*) AS total FROM f GROUP BY 1)
SELECT counts.category, token, CAST(cnt AS BIGINT) AS cnt,
       cnt / total AS share
FROM counts JOIN totals USING (category)
WHERE cnt / total >= 0.01
ORDER BY share DESC, category, token
"""
    from tests.oracle_utils import assert_frames_match

    exp = duck.execute(oracle).fetchdf()
    assert len(got) > 0
    assert_frames_match(got, exp, "heavy_hitters")

def test_approx_percentiles_custom_probability_labels(spark):
    """ADVICE r3: int(p*100) truncates under binary floats (0.29*100 ->
    28.999... -> 'p28'). Labels must round instead."""
    df = spark.range(10).select(F.col("id").cast("double").alias("x"))
    cols = approx_percentiles(df, "x", (0.29, 0.07, 0.875)).columns
    assert cols == ["p29", "p07", "p88"]


def test_approx_percentiles_half_up_labels_and_collision(spark):
    """ADVICE r4: round() banker's-rounds 0.125 to 'p12'; labels must
    round half-up, and colliding labels must raise instead of yielding
    ambiguous duplicate column names."""
    import pytest

    df = spark.range(10).select(F.col("id").cast("double").alias("x"))
    assert approx_percentiles(df, "x", (0.125,)).columns == ["p13"]
    with pytest.raises(ValueError, match="collide"):
        approx_percentiles(df, "x", (0.290, 0.294))


def test_hll_sketches_merge_across_runs(spark):
    """Cross-run contract: union-merging the two halves' stored
    sketches gives EXACTLY the estimate of sketching all the data at
    once, and both land within HLL error of the exact distinct count."""
    from big_data_hadoop_spark.operators.sketches import (
        hll_merge_estimate,
        hll_sketches,
    )
    from big_data_hadoop_spark.sources.io import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    toks = docs.selectExpr(
        "lang", "explode(filter(split(lower(text), ' '), x -> x != '')) AS token"
    )
    run_a = toks.filter("pmod(xxhash64(token), 2) = 0")
    run_b = toks.filter("pmod(xxhash64(token), 2) != 0")
    merged = hll_merge_estimate(
        hll_sketches(run_a, "token", ("lang",)).unionByName(
            hll_sketches(run_b, "token", ("lang",))
        ),
        ("lang",),
    )
    whole = hll_merge_estimate(hll_sketches(toks, "token", ("lang",)), ("lang",))
    got_m = {r["lang"]: r["n_distinct_approx"] for r in merged.collect()}
    got_w = {r["lang"]: r["n_distinct_approx"] for r in whole.collect()}
    assert got_m == got_w  # register-state union == one-shot sketch
    exact = {
        r["lang"]: r["n"]
        for r in toks.groupBy("lang")
        .agg(F.countDistinct("token").alias("n"))
        .collect()
    }
    for lang, n in exact.items():
        assert abs(got_m[lang] - n) / n < 0.05, (lang, got_m[lang], n)


def test_agg_state_merge_equals_one_shot(spark, tmp_path):
    """Split the corpus into two batches, build a state per batch,
    merge — the merged state must equal the one-shot state over the
    whole corpus (exact for n/s/mn/mx and the sketch registers; s2 up
    to float summation order)."""
    from pyspark.sql import functions as F

    from big_data_hadoop_spark.operators.sketches import (
        agg_state,
        agg_state_finalize,
        agg_state_merge,
    )
    from tests.conftest import SF_ORACLE

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    one_shot = agg_state(
        docs, ["source"], "n_chars", distinct_col="lang"
    )
    merged = agg_state_merge(
        agg_state(b1, ["source"], "n_chars", distinct_col="lang").unionByName(
            agg_state(b2, ["source"], "n_chars", distinct_col="lang")
        ),
        ["source"],
    )
    a = {r.source: r for r in agg_state_finalize(one_shot).collect()}
    b = {r.source: r for r in agg_state_finalize(merged).collect()}
    assert a.keys() == b.keys() and len(a) > 1
    for k in a:
        assert a[k].n_rows == b[k].n_rows
        assert a[k].vmin == b[k].vmin and a[k].vmax == b[k].vmax
        assert abs(a[k].total - b[k].total) < 1e-6
        assert abs(a[k].var_samp - b[k].var_samp) < 1e-4
        assert a[k].n_distinct_approx == b[k].n_distinct_approx


def test_agg_state_finalize_matches_duckdb(spark, duck):
    """Finalized aggregates vs SQL on the same data."""
    from big_data_hadoop_spark.operators.sketches import (
        agg_state,
        agg_state_finalize,
    )
    from tests.conftest import SF_ORACLE

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    got = {
        r.source: r
        for r in agg_state_finalize(
            agg_state(docs, ["source"], "n_chars")
        ).collect()
    }
    want = duck.sql(
        """
        SELECT source, COUNT(n_chars)::BIGINT AS n_rows,
               SUM(n_chars)::DOUBLE AS total,
               MIN(n_chars)::DOUBLE AS vmin, MAX(n_chars)::DOUBLE AS vmax,
               AVG(n_chars) AS avg, VAR_SAMP(n_chars) AS var_samp
        FROM documents GROUP BY source
        """
    ).fetchall()
    assert len(want) == len(got)
    for source, n_rows, total, vmin, vmax, avg, var_samp in want:
        r = got[source]
        assert r.n_rows == n_rows
        assert abs(r.total - total) < 1e-6
        assert r.vmin == vmin and r.vmax == vmax
        assert abs(r.avg - avg) < 1e-9
        assert abs(r.var_samp - var_samp) < 1e-6


def test_agg_state_roundtrips_through_parquet(spark, tmp_path):
    """The state table (incl. the binary sketch) must persist and merge
    from storage — the cross-run contract."""
    from pyspark.sql import functions as F

    from big_data_hadoop_spark.operators.sketches import (
        agg_state,
        agg_state_finalize,
        agg_state_merge,
    )
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    p1, p2 = str(tmp_path / "st1"), str(tmp_path / "st2")
    agg_state(
        docs.filter(F.col("doc_id") < 250), ["lang"], "n_chars",
        distinct_col="source",
    ).write.parquet(p1)
    agg_state(
        docs.filter(F.col("doc_id") >= 250), ["lang"], "n_chars",
        distinct_col="source",
    ).write.parquet(p2)
    merged = agg_state_merge(
        spark.read.parquet(p1).unionByName(spark.read.parquet(p2)), ["lang"]
    )
    direct = agg_state(docs, ["lang"], "n_chars", distinct_col="source")
    a = {r.lang: r for r in agg_state_finalize(merged).collect()}
    b = {r.lang: r for r in agg_state_finalize(direct).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k].n_rows == b[k].n_rows
        assert a[k].n_distinct_approx == b[k].n_distinct_approx
        assert a[k].var_samp is None or abs(a[k].var_samp - b[k].var_samp) < 1e-4


def test_agg_state_var_null_for_singleton(spark):
    from big_data_hadoop_spark.operators.sketches import (
        agg_state,
        agg_state_finalize,
    )

    df = spark.createDataFrame([(1, 5.0)], "k long, v double")
    row = agg_state_finalize(agg_state(df, ["k"], "v")).collect()[0]
    assert row.n_rows == 1 and row.var_samp is None


def _token_rows(spark, sf):
    from big_data_hadoop_spark.operators.tokenize import tokens
    from big_data_hadoop_spark.sources.io import load_table

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return tokens(docs, lowercase=True, keep_cols=()).select("token")


def test_cms_never_undercounts_and_bounds_error(spark):
    """CMS guarantee: est >= true for every present key; overcount is
    bounded (deterministic data + seed, so the measured bound is a
    stable pin, not a flake)."""
    from pyspark.sql import functions as F

    from big_data_hadoop_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )
    from tests.conftest import SF_ORACLE

    toks = _token_rows(spark, SF_ORACLE)
    exact = toks.groupBy("token").agg(F.count("*").alias("true_cnt"))
    state = cms_build(toks, "token")
    est = cms_estimate(state, exact, "token")
    rows = est.collect()
    total = sum(r.true_cnt for r in rows)
    assert all(r.est_cnt >= r.true_cnt for r in rows)
    # e/w * total expected-overcount bound (w=2048); generous 3x slack
    worst = max(r.est_cnt - r.true_cnt for r in rows)
    assert worst <= 3 * 2.72 * total / 2048, (worst, total)
    # heavy keys should be near-exact relative to their own mass
    heavy = [r for r in rows if r.true_cnt >= total * 0.01]
    assert heavy and all(
        (r.est_cnt - r.true_cnt) <= 0.05 * r.true_cnt for r in heavy
    )


def test_cms_merge_is_exact_sum(spark):
    """Merged two-batch sketch == one-shot sketch, cell for cell."""
    from pyspark.sql import functions as F

    from big_data_hadoop_spark.operators.sketches import cms_build, cms_merge
    from tests.conftest import SF_SMOKE

    toks = _token_rows(spark, SF_SMOKE).withColumn(
        "h", F.pmod(F.xxhash64("token"), F.lit(2))
    )
    one = cms_build(toks, "token")
    merged = cms_merge(
        cms_build(toks.filter("h = 0"), "token").unionByName(
            cms_build(toks.filter("h = 1"), "token")
        )
    )
    a = {(r.r, r.b): r.cnt for r in one.collect()}
    b = {(r.r, r.b): r.cnt for r in merged.collect()}
    assert a == b and len(a) > 100


def test_cms_weighted_equals_exploded(spark):
    """weight_col over pre-aggregated counts == unweighted over raw."""
    from pyspark.sql import functions as F

    from big_data_hadoop_spark.operators.sketches import cms_build
    from tests.conftest import SF_SMOKE

    toks = _token_rows(spark, SF_SMOKE)
    pre = toks.groupBy("token").agg(F.count("*").alias("n"))
    a = {
        (r.r, r.b): r.cnt
        for r in cms_build(toks, "token").collect()
    }
    b = {
        (r.r, r.b): r.cnt
        for r in cms_build(pre, "token", weight_col="n").collect()
    }
    assert a == b


def test_cms_absent_key_estimate_small(spark):
    from big_data_hadoop_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )
    from tests.conftest import SF_SMOKE

    toks = _token_rows(spark, SF_SMOKE)
    state = cms_build(toks, "token")
    probe = spark.createDataFrame(
        [("zz-never-seen-token-xq",)], "token string"
    )
    est = cms_estimate(state, probe, "token").collect()[0]
    total = toks.count()
    assert 0 <= est.est_cnt <= 3 * 2.72 * total / 2048


def test_cms_rejects_degenerate_shape(spark):
    import pytest as _pytest

    from big_data_hadoop_spark.operators.sketches import cms_build

    df = spark.createDataFrame([("a",)], "token string")
    with _pytest.raises(ValueError):
        cms_build(df, "token", d=0)
    with _pytest.raises(ValueError):
        cms_build(df, "token", w=1)


def test_cms_estimate_probe_sketch_schema_columns_survive(spark):
    """A probe frame already carrying ``cnt``/``r``/``b`` columns (the
    sketch's own schema names) passes through UNTOUCHED — review
    finding: the internal coalesce silently overwrote a probe ``cnt``
    before the min-fold and the join errored on ``r``/``b``. A probe
    column colliding with the OUTPUT (``est_cnt``) is refused loudly."""
    import pytest as _pytest

    from big_data_hadoop_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    toks = spark.createDataFrame(
        [("a",), ("a",), ("b",)], "token string"
    )
    state = cms_build(toks, "token")
    probe = spark.createDataFrame(
        [("a", 777, 1, 2), ("b", 888, 3, 4)],
        "token string, cnt long, r int, b int",
    )
    rows = {r.token: r for r in cms_estimate(state, probe, "token").collect()}
    assert rows["a"].cnt == 777 and rows["b"].cnt == 888  # untouched
    assert rows["a"].r == 1 and rows["b"].b == 4
    assert rows["a"].est_cnt >= 2 and rows["b"].est_cnt >= 1
    bad = spark.createDataFrame([("a", 0)], "token string, est_cnt long")
    with _pytest.raises(ValueError, match="collide"):
        cms_estimate(state, bad, "token")


def test_cms_estimate_preserves_duplicate_probe_rows(spark):
    """One output row per input row, even for duplicate probes
    (review finding: the fold collapsed them)."""
    from big_data_hadoop_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    corpus = spark.createDataFrame(
        [("a",), ("a",), ("b",)], "token string"
    )
    state = cms_build(corpus, "token")
    probes = spark.createDataFrame(
        [("a",), ("a",), ("b",)], "token string"
    )
    rows = cms_estimate(state, probes, "token").collect()
    assert len(rows) == 3
    assert sorted((r.token, r.est_cnt) for r in rows) == [
        ("a", 2), ("a", 2), ("b", 1)
    ]


def test_streaming_agg_state_equals_batch(spark, tmp_path):
    """Drained continuous aggregate == one-shot batch state, including
    across a second drain over the same checkpoint with new files."""
    import shutil

    from pyspark.sql import functions as F

    from big_data_hadoop_spark.operators.sketches import (
        agg_state,
        agg_state_finalize,
        streaming_agg_state,
    )
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "source", "n_chars"
    )
    src = tmp_path / "cas_src"
    src.mkdir()
    state = str(tmp_path / "cas_state")
    ckpt = str(tmp_path / "cas_ckpt")

    def add(name, pred):
        staged = tmp_path / f"_s_{name}"
        docs.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            str(staged)
        )
        shutil.copy(
            next(staged.glob("part-*.parquet")), src / f"{name}.parquet"
        )

    def drain():
        stream = spark.readStream.schema(docs.schema).parquet(str(src))
        q = streaming_agg_state(
            stream, state, ckpt, ["source"], "n_chars", distinct_col="doc_id"
        )
        q.awaitTermination(120)

    add("b1", F.col("doc_id") < 250)
    drain()
    add("b2", F.col("doc_id") >= 250)
    drain()

    got = {
        r.source: r
        for r in agg_state_finalize(spark.read.parquet(state)).collect()
    }
    want = {
        r.source: r
        for r in agg_state_finalize(
            agg_state(docs, ["source"], "n_chars", distinct_col="doc_id")
        ).collect()
    }
    assert got.keys() == want.keys() and len(got) > 1
    for k in got:
        assert got[k].n_rows == want[k].n_rows
        assert got[k].vmin == want[k].vmin and got[k].vmax == want[k].vmax
        assert got[k].n_distinct_approx == want[k].n_distinct_approx
        assert abs(got[k].total - want[k].total) < 1e-6


def test_maintain_agg_state_epoch_replay_is_noop(spark, tmp_path):
    """The at-least-once hazard: replaying an already-applied epoch must
    not double-count."""
    from big_data_hadoop_spark.operators.sketches import (
        agg_state_finalize,
        maintain_agg_state,
    )

    path = str(tmp_path / "st")
    b = spark.createDataFrame([("a", 1.0), ("a", 3.0)], "g string, v double")
    maintain_agg_state(b, path, ["g"], "v", epoch=0)
    maintain_agg_state(b, path, ["g"], "v", epoch=0)  # replay: no-op
    row = agg_state_finalize(spark.read.parquet(path)).collect()[0]
    assert row.n_rows == 2 and row.total == 4.0
    # a NEW epoch applies
    maintain_agg_state(b, path, ["g"], "v", epoch=1)
    row = agg_state_finalize(spark.read.parquet(path)).collect()[0]
    assert row.n_rows == 4 and row.total == 8.0


def test_maintain_agg_state_recovers_stranded_old_generation(spark, tmp_path):
    """Crash between the two swap renames leaves only path+'.old'; the
    next fold must restore it instead of rebuilding from scratch
    (review finding: the rmtree-then-rename swap lost the table)."""
    import os

    from big_data_hadoop_spark.operators.sketches import (
        agg_state_finalize,
        maintain_agg_state,
    )

    path = str(tmp_path / "rec_st")
    b1 = spark.createDataFrame([("a", 1.0)], "g string, v double")
    maintain_agg_state(b1, path, ["g"], "v", epoch=0)
    # simulate the crash window: generation renamed away, swap not done
    os.rename(path, path + ".old")
    b2 = spark.createDataFrame([("a", 2.0)], "g string, v double")
    maintain_agg_state(b2, path, ["g"], "v", epoch=1)
    row = agg_state_finalize(spark.read.parquet(path)).collect()[0]
    assert row.n_rows == 2 and row.total == 3.0  # history survived


def test_streaming_agg_state_checkpoint_reset_not_suppressed(spark, tmp_path):
    """After a checkpoint reset, batch ids restart at 0 — the new run's
    folds must NOT be dropped by the previous run's epoch markers
    (review finding). The source replays from scratch on reset, so the
    first run's rows re-fold (documented at-least-once hazard): totals
    count b1 twice and b2 once."""
    import shutil

    from pyspark.sql import functions as F

    from big_data_hadoop_spark.operators.sketches import (
        agg_state_finalize,
        streaming_agg_state,
    )

    src = tmp_path / "cr_src"
    src.mkdir()
    state = str(tmp_path / "cr_state")
    ckpt = str(tmp_path / "cr_ckpt")

    def add(name, rows):
        staged = tmp_path / f"_cr_{name}"
        spark.createDataFrame(rows, "g string, v double").coalesce(
            1
        ).write.mode("overwrite").parquet(str(staged))
        shutil.copy(
            next(staged.glob("part-*.parquet")), src / f"{name}.parquet"
        )

    def drain():
        stream = spark.readStream.schema("g string, v double").parquet(
            str(src)
        )
        q = streaming_agg_state(stream, state, ckpt, ["g"], "v")
        q.awaitTermination(120)

    add("b1", [("a", 1.0), ("a", 2.0)])
    drain()
    shutil.rmtree(ckpt)  # ops resets the checkpoint
    add("b2", [("a", 10.0)])
    drain()
    row = agg_state_finalize(spark.read.parquet(state)).collect()[0]
    # b1 folded twice (replay-from-scratch), b2 once — and crucially
    # b2 is PRESENT: with unscoped markers it would have been dropped
    assert row.n_rows == 5 and row.total == 16.0, row


def test_applied_epoch_recognizes_legacy_markers(spark, tmp_path):
    """Markers written as `_epoch-<n>` by the pre-token version still
    suppress a replay of the same epoch for token-less callers."""
    import os

    from big_data_hadoop_spark.operators.sketches import (
        agg_state_finalize,
        maintain_agg_state,
    )

    path = str(tmp_path / "leg_st")
    b = spark.createDataFrame([("a", 1.0)], "g string, v double")
    maintain_agg_state(b, path, ["g"], "v", epoch=3)
    # rewrite the marker in the OLD format
    os.rename(
        os.path.join(path, "_epoch--3"), os.path.join(path, "_epoch-3")
    )
    maintain_agg_state(b, path, ["g"], "v", epoch=3)  # replay: no-op
    row = agg_state_finalize(spark.read.parquet(path)).collect()[0]
    assert row.n_rows == 1


def test_streaming_cms_equals_batch(spark, tmp_path):
    """Drained continuous CMS == one-shot batch sketch, cell for cell,
    across two drains; and cms_estimate over the maintained state gives
    the exact counts for this tiny vocabulary."""
    import shutil

    from big_data_hadoop_spark.operators.sketches import (
        cms_build,
        cms_estimate,
        streaming_cms,
    )

    rows1 = [("alpha",), ("beta",), ("alpha",)]
    rows2 = [("alpha",), ("gamma",)]
    src = tmp_path / "scms_src"
    src.mkdir()
    state = str(tmp_path / "scms_state")
    ckpt = str(tmp_path / "scms_ckpt")

    def add(name, rows):
        staged = tmp_path / f"_sc_{name}"
        spark.createDataFrame(rows, "token string").coalesce(
            1
        ).write.mode("overwrite").parquet(str(staged))
        shutil.copy(
            next(staged.glob("part-*.parquet")), src / f"{name}.parquet"
        )

    def drain():
        stream = spark.readStream.schema("token string").parquet(str(src))
        q = streaming_cms(stream, state, ckpt, "token")
        q.awaitTermination(120)

    add("b1", rows1)
    drain()
    add("b2", rows2)
    drain()

    got = {(r.r, r.b): r.cnt for r in spark.read.parquet(state).collect()}
    want = {
        (r.r, r.b): r.cnt
        for r in cms_build(
            spark.createDataFrame(rows1 + rows2, "token string"), "token"
        ).collect()
    }
    assert got == want
    probes = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",), ("never",)], "token string"
    )
    est = {
        r.token: r.est_cnt
        for r in cms_estimate(
            spark.read.parquet(state), probes, "token"
        ).collect()
    }
    assert est == {"alpha": 3, "beta": 1, "gamma": 1, "never": 0}


def test_maintain_state_generalized_epoch_noop(spark, tmp_path):
    """The generalized fold honors epoch idempotence for any build/merge
    pair (here: CMS)."""
    from big_data_hadoop_spark.operators.sketches import (
        cms_build,
        cms_merge,
        maintain_state,
    )

    path = str(tmp_path / "gm")
    b = spark.createDataFrame([("x",), ("x",)], "token string")
    kw = dict(
        build=lambda d: cms_build(d, "token"), merge=cms_merge, epoch=0
    )
    maintain_state(b, path, **kw)
    maintain_state(b, path, **kw)  # replay: no-op
    total = sum(r.cnt for r in spark.read.parquet(path).collect())
    assert total == 2 * 4  # 2 rows x d=4 cells, folded once


def test_streaming_cms_rejects_bad_shape_eagerly(spark, tmp_path):
    import pytest as _pytest

    from big_data_hadoop_spark.operators.sketches import streaming_cms

    src = tmp_path / "eg_src"
    src.mkdir()
    stream = spark.readStream.schema("token string").parquet(str(src))
    with _pytest.raises(ValueError):
        streaming_cms(
            stream, str(tmp_path / "s"), str(tmp_path / "c"), "token", w=1
        )
