"""Training-data curation pipeline: the composed funnel must equal a
DuckDB re-implementation built from the SAME SQL building blocks the
individual probe oracles use (q24 quality, q25 lang-id, q17 exact
dedup), and the hash-based near-dup stage must satisfy subset and
determinism properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_hadoop_spark.operators.textstats import STOPWORDS
from big_data_hadoop_spark.pipeline import curate_training_data
from big_data_hadoop_spark.sources.io import load_table
from tests.conftest import SF_ORACLE
from tests.oracle_utils import assert_frames_match

MIN_TOKENS, MIN_ALPHA = 5, 0.3


def _stop_sql(words: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return (
        "CAST(len(list_filter(string_split(lower(text), ' '), "
        f"x -> list_contains([{lst}], x))) AS BIGINT)"
    )


_ORACLE = f"""
WITH g AS (
  SELECT doc_id, text,
         {_stop_sql(STOPWORDS['en'])} AS s_en,
         {_stop_sql(STOPWORDS['de'])} AS s_de,
         {_stop_sql(STOPWORDS['fr'])} AS s_fr,
         {_stop_sql(STOPWORDS['es'])} AS s_es
  FROM documents
  WHERE len(string_split(lower(text), ' ')) >= {MIN_TOKENS}
    AND length(regexp_replace(lower(text), '[^a-z]', '', 'g'))::DOUBLE
        / greatest(length(text), 1) >= {MIN_ALPHA}
),
l AS (
  SELECT doc_id, text FROM g
  WHERE CASE WHEN s_en > 0 AND s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
             WHEN s_de > 0 AND s_de >= greatest(s_fr, s_es) THEN 'de'
             WHEN s_fr > 0 AND s_fr >= s_es THEN 'fr'
             WHEN s_es > 0 THEN 'es'
             ELSE 'und' END = 'en'
),
d AS (
  SELECT doc_id, text,
         md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))) AS h
  FROM l
),
k AS (SELECT h, MIN(doc_id) AS keep_id FROM d GROUP BY h)
SELECT d.doc_id, d.text
FROM d JOIN k ON d.h = k.h AND d.doc_id = k.keep_id
ORDER BY d.doc_id
"""


def test_curation_funnel_matches_duckdb(spark, duck):
    docs = load_table(spark, SF_ORACLE, "documents")
    got = (
        curate_training_data(
            docs, min_tokens=MIN_TOKENS, min_alpha_ratio=MIN_ALPHA,
            langs=("en",),
        )
        .select("doc_id", "text")
        .orderBy("doc_id")
        .toPandas()
    )
    exp = duck.execute(_ORACLE).fetchdf()
    assert len(got) > 0  # non-vacuous: the funnel keeps something
    assert_frames_match(got, exp, "curation_funnel")
    # ... and drops something (each gate is live on this corpus)
    assert len(got) < docs.count()


def test_curation_neardup_stage_properties(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    base = curate_training_data(docs)
    near = curate_training_data(docs, neardup_threshold=0.9)
    base_ids = {r.doc_id for r in base.select("doc_id").collect()}
    near_ids = {r.doc_id for r in near.select("doc_id").collect()}
    # subset of the exact-dedup output, deterministic, keep-first:
    assert near_ids <= base_ids
    near_ids2 = {
        r.doc_id
        for r in curate_training_data(docs, neardup_threshold=0.9)
        .select("doc_id")
        .collect()
    }
    assert near_ids == near_ids2
    # every dropped doc has a surviving near-dup partner with a lower id
    from big_data_hadoop_spark.operators.dedup import minhash_lsh_pairs

    pairs = [
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(base, threshold=0.9).collect()
    ]
    dropped = base_ids - near_ids
    assert dropped == {b for _, b in pairs}
    for a, b in pairs:
        assert a < b


def test_curation_gates_fuse_into_scan_filter(spark):
    """The two gates must plan as ONE Filter directly over the scan —
    no join, no shuffle, no Python stage before dedup's semi-join."""
    from big_data_hadoop_spark.plans.audit import formatted_plan

    docs = load_table(spark, SF_ORACLE, "documents")
    plan = formatted_plan(curate_training_data(docs))
    assert "BatchEvalPython" not in plan
    # exactly one join — the dedup semi-join; the gates add none
    joins = [l for l in plan.splitlines() if "Join" in l and "(" in l and "+-" in l]
    assert len(joins) == 1 and "LeftSemi" in joins[0], joins


def test_token_budget_sample_matches_python_reference(spark):
    """The distributed prefix-sum sampler must pick EXACTLY the docs a
    sequential greedy walk picks in the same (bucket, hash) order, and
    obey the budget up to the one-document overshoot rule."""
    from big_data_hadoop_spark.pipeline import sample_to_token_budget

    docs = load_table(spark, SF_ORACLE, "documents")
    n_buckets, budget = 8, 5_000
    rows = docs.select(
        "doc_id",
        F.xxhash64("doc_id").alias("h"),
        F.size(F.split(F.lower("text"), " ", -1)).cast("long").alias("n"),
    ).collect()
    order = sorted(rows, key=lambda r: (r.h % n_buckets, r.h, r.doc_id))
    expect, running = set(), 0
    for r in order:
        if running < budget:
            expect.add(r.doc_id)
        running += r.n
    got = {
        r.doc_id
        for r in sample_to_token_budget(
            docs, budget, n_buckets=n_buckets
        ).collect()
    }
    assert got == expect
    n_by_id = {r.doc_id: r.n for r in rows}
    taken = sum(n_by_id[i] for i in got)
    assert taken >= min(budget, sum(n_by_id.values()))
    assert taken - max(n_by_id[i] for i in got) < budget
    # determinism across invocations
    got2 = {
        r.doc_id
        for r in sample_to_token_budget(
            docs, budget, n_buckets=n_buckets
        ).collect()
    }
    assert got == got2


def test_token_budget_sample_no_global_sort(spark):
    """The plan must contain no single-partition exchange: the prefix
    sum is bucketed (parallel windows), never a global orderBy."""
    from big_data_hadoop_spark.pipeline import sample_to_token_budget
    from big_data_hadoop_spark.plans.audit import formatted_plan

    docs = load_table(spark, SF_ORACLE, "documents")
    plan = formatted_plan(sample_to_token_budget(docs, 1_000))
    assert "SinglePartition" not in plan, plan


def test_chunk_documents_matches_duckdb(spark, duck):
    from big_data_hadoop_spark.pipeline import chunk_documents

    max_t, ov = 40, 8
    stride = max_t - ov
    got = (
        chunk_documents(
            load_table(spark, SF_ORACLE, "documents"), max_t, overlap=ov
        )
        .orderBy("doc_id", "chunk_no")
        .toPandas()
    )
    oracle = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
c AS (
  SELECT doc_id, toks,
         greatest(CAST(ceil((len(toks) - {ov})::DOUBLE / {stride}) AS INT), 1)
           AS n_chunks
  FROM t),
e AS (
  SELECT doc_id, toks, g.k AS chunk_no
  FROM c, LATERAL (SELECT unnest(generate_series(0, n_chunks - 1)) AS k) g)
SELECT doc_id, CAST(chunk_no AS BIGINT) AS chunk_no,
       array_to_string(toks[chunk_no * {stride} + 1 :
                            chunk_no * {stride} + {max_t}], ' ') AS chunk_text,
       CAST(len(toks[chunk_no * {stride} + 1 :
                     chunk_no * {stride} + {max_t}]) AS BIGINT)
         AS n_chunk_tokens
FROM e ORDER BY doc_id, chunk_no
"""
    exp = duck.execute(oracle).fetchdf()
    assert len(got) > load_table(spark, SF_ORACLE, "documents").count()
    assert_frames_match(got, exp, "chunking")
    # every chunk obeys the window contract
    assert (got["n_chunk_tokens"] <= max_t).all()
    assert (got["n_chunk_tokens"] > 0).all()


def test_chunk_documents_short_doc_single_chunk(spark):
    from big_data_hadoop_spark.pipeline import chunk_documents

    df = spark.createDataFrame(
        [(1, "just three tokens"), (2, "a")], "doc_id long, text string"
    )
    rows = chunk_documents(df, 10, overlap=2).collect()
    assert {(r.doc_id, r.chunk_no, r.chunk_text) for r in rows} == {
        (1, 0, "just three tokens"),
        (2, 0, "a"),
    }
    import pytest as _pytest

    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, 10, overlap=10)


def test_redact_pii_matches_duckdb(spark, duck):
    from big_data_hadoop_spark.pipeline import PII_PATTERNS, redact_pii

    rows = [
        (1, "mail me at jane.doe+x@example.co.uk or visit https://a.b/c?d=1"),
        (2, "call +1 (555) 123-4567 now"),
        (3, "no pii here at all"),
        (4, "two mails: a@b.io c@d.org and http://x.y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = redact_pii(df).orderBy("doc_id").toPandas()
    sql = "SELECT doc_id, text FROM df_v"
    expr = "text"
    for _n, pat, tag in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{tag}', 'g')"
    duck.register("df_v", df.toPandas())
    exp = duck.execute(
        f"SELECT doc_id, {expr} AS text FROM df_v ORDER BY doc_id"
    ).fetchdf()
    assert_frames_match(got, exp, "redact_pii")
    texts = dict(zip(got["doc_id"], got["text"]))
    assert texts[1] == "mail me at <EMAIL> or visit <URL>"
    assert texts[2] == "call <PHONE> now"
    assert texts[3] == "no pii here at all"
    assert texts[4] == "two mails: <EMAIL> <EMAIL> and <URL>"


def test_sample_fraction_and_mix_corpora(spark):
    from big_data_hadoop_spark.pipeline import mix_corpora, sample_fraction

    docs = load_table(spark, SF_ORACLE, "documents")
    n = docs.count()
    half = sample_fraction(docs, 0.5, seed=7)
    n_half = half.count()
    # deterministic, approximately the fraction, independent across seeds
    assert n_half == sample_fraction(docs, 0.5, seed=7).count()
    assert 0.4 * n < n_half < 0.6 * n
    other = {r.doc_id for r in sample_fraction(docs, 0.5, seed=8).collect()}
    ours = {r.doc_id for r in half.collect()}
    overlap = len(ours & other) / max(len(ours), 1)
    assert 0.3 < overlap < 0.7  # independent samples, not aligned
    # membership is exactly the hash rule (Spark supplies the hash,
    # Python applies the threshold — same split as the simhash tests)
    from pyspark.sql import functions as F

    hashes = {
        r.doc_id: r.h
        for r in docs.select(
            "doc_id", F.pmod(F.xxhash64("doc_id", F.lit(7)), F.lit(1_000_000)).alias("h")
        ).collect()
    }
    assert ours == {d for d, h in hashes.items() if h < 500_000}
    # edge fractions
    assert sample_fraction(docs, 0.0).count() == 0
    assert sample_fraction(docs, 1.0).count() == n
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sample_fraction(docs, 1.5)

    mixed = mix_corpora(
        [("full", docs, 1.0), ("half", docs, 0.5)], seed=7
    )
    by_src = {
        r.source: r.n
        for r in mixed.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    assert by_src["full"] == n
    assert 0.4 * n < by_src["half"] < 0.6 * n
    # reordering sources must not change any source's kept set
    reordered = mix_corpora([("half", docs, 0.5), ("full", docs, 1.0)], seed=7)
    a = {r.doc_id for r in mixed.filter("source = 'half'").collect()}
    b = {r.doc_id for r in reordered.filter("source = 'half'").collect()}
    assert a == b


def test_pack_sequences_matches_python_reference(spark):
    """Packing must equal a sequential greedy fill in the same global
    hash order: same pack ids, same in-pack offsets."""
    from big_data_hadoop_spark.pipeline import pack_sequences

    docs = load_table(spark, SF_ORACLE, "documents")
    ctx, n_buckets = 1_000, 64
    rows = docs.select(
        "doc_id",
        F.xxhash64("doc_id").alias("h"),
        F.size(F.split(F.lower("text"), " ", -1)).cast("long").alias("n"),
    ).collect()
    order = sorted(rows, key=lambda r: (r.h % n_buckets, r.h, r.doc_id))
    expect, running = {}, 0
    for r in order:
        expect[r.doc_id] = (running // ctx, running - (running // ctx) * ctx)
        running += r.n
    got = {
        r.doc_id: (r.pack_id, r.pack_offset)
        for r in pack_sequences(docs, ctx, n_buckets=n_buckets).collect()
    }
    assert got == expect
    # structural invariants: dense-ish pack ids, offsets inside context
    pack_ids = {p for p, _ in got.values()}
    assert pack_ids == set(range(max(pack_ids) + 1))
    assert all(0 <= off < ctx for _, off in got.values())
    import pytest as _pytest

    with _pytest.raises(ValueError, match="context_tokens"):
        pack_sequences(docs, 0)


def test_prefix_sum_ops_no_global_sort(spark):
    from big_data_hadoop_spark.pipeline import pack_sequences
    from big_data_hadoop_spark.plans.audit import formatted_plan

    docs = load_table(spark, SF_ORACLE, "documents")
    plan = formatted_plan(pack_sequences(docs, 1_000))
    assert "SinglePartition" not in plan, plan


def test_materialize_packs_matches_python_greedy_fill(spark):
    """VERDICT r3 #5: the materialized per-pack rows must equal a
    sequential Python greedy fill (same global hash order) — member
    lists, kept-token payloads, truncation bookkeeping — and explode
    back to every kept doc's tokens in order (reconstruction)."""
    from big_data_hadoop_spark.pipeline import materialize_packs

    docs = load_table(spark, SF_ORACLE, "documents")
    ctx, n_buckets = 1_000, 64
    rows = docs.select(
        "doc_id",
        "text",
        F.xxhash64("doc_id").alias("h"),
    ).collect()
    order = sorted(rows, key=lambda r: (r.h % n_buckets, r.h, r.doc_id))
    expect: dict[int, dict] = {}
    running = 0
    for r in order:
        toks = r.text.split(" ")
        pid, off = running // ctx, running % ctx
        kept = min(len(toks), ctx - off)
        p = expect.setdefault(
            pid,
            {"doc_ids": [], "kept": [], "toks": [], "cut": 0},
        )
        p["doc_ids"].append(r.doc_id)
        p["kept"].append(kept)
        p["toks"].extend(toks[:kept])
        p["cut"] += len(toks) - kept
        running += len(toks)

    got = {r.pack_id: r for r in materialize_packs(docs, ctx).collect()}
    assert set(got) == set(expect)
    for pid, e in expect.items():
        g = got[pid]
        assert list(g.doc_ids) == e["doc_ids"], pid
        assert g.n_docs == len(e["doc_ids"])
        assert g.token_count == sum(e["kept"]), pid
        assert g.n_truncated == e["cut"], pid
        assert g.payload == " ".join(e["toks"]), pid
    # an interior pack is full up to the head gap left by the previous
    # pack's truncated straddler: token_count == ctx - prev.n_truncated
    last = max(got)
    for p in sorted(got):
        assert got[p].token_count <= ctx
        if p != last and (p - 1) in got and got[p - 1].n_truncated < ctx:
            prev_cut = got[p - 1].n_truncated if p > 0 else 0
            assert got[p].token_count == ctx - prev_cut, p
    # reconstruction: walking each pack's payload with the per-doc kept
    # counts recovers every kept doc's token prefix, in order
    text_by_id = {r.doc_id: r.text for r in rows}
    for pid, e in expect.items():
        toks = got[pid].payload.split(" ") if got[pid].payload else []
        pos = 0
        for did, kept in zip(got[pid].doc_ids, e["kept"]):
            assert toks[pos : pos + kept] == text_by_id[did].split(" ")[:kept]
            pos += kept
        assert pos == len(toks) or (pos == 0 and toks == [""])


def test_materialize_packs_giant_and_empty_docs(spark):
    """Edge semantics vs the same Python reference: a document longer
    than the context window (overflow spans multiple pack ranges — those
    ranges yield NO pack row, their tokens are dropped) and empty-text
    docs (one empty token) must round-trip exactly."""
    from big_data_hadoop_spark.pipeline import materialize_packs

    ctx, n_buckets = 10, 8
    corpus = [
        (1, " ".join(f"t{i}" for i in range(25))),  # 2.5x the window
        (2, ""),
        (3, "a b c"),
        (4, " ".join(f"u{i}" for i in range(9))),
        (5, "x"),
        (6, " ".join(f"v{i}" for i in range(12))),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    rows = docs.select("doc_id", "text", F.xxhash64("doc_id").alias("h")).collect()
    order = sorted(rows, key=lambda r: (r.h % n_buckets, r.h, r.doc_id))
    expect: dict[int, dict] = {}
    running = 0
    for r in order:
        toks = r.text.split(" ")
        pid, off = running // ctx, running % ctx
        kept = min(len(toks), ctx - off)
        p = expect.setdefault(pid, {"doc_ids": [], "toks": [], "cut": 0})
        p["doc_ids"].append(r.doc_id)
        p["toks"].extend(toks[:kept])
        p["cut"] += len(toks) - kept
        running += len(toks)
    got = {r.pack_id: r for r in materialize_packs(docs, ctx, n_buckets=n_buckets).collect()}
    assert set(got) == set(expect)  # ranges swallowed by overflow -> no row
    for pid, e in expect.items():
        g = got[pid]
        assert list(g.doc_ids) == e["doc_ids"]
        assert g.n_truncated == e["cut"]
        assert g.payload == " ".join(e["toks"])
        assert g.token_count == len(e["toks"])


def test_materialize_packs_no_global_sort(spark):
    """The pack materialization must inherit the prefix sum's bucketed
    parallelism: no single-partition exchange anywhere in the plan."""
    from big_data_hadoop_spark.pipeline import materialize_packs
    from big_data_hadoop_spark.plans.audit import formatted_plan

    docs = load_table(spark, SF_ORACLE, "documents")
    plan = formatted_plan(materialize_packs(docs, 1_000))
    assert "SinglePartition" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_find_contaminated_matches_duckdb(spark, duck):
    """Decontamination: shared word n-grams between docs and a benchmark
    set, against a DuckDB n-gram join oracle; the action drops exactly
    the flagged docs."""
    from big_data_hadoop_spark.pipeline import decontaminate, find_contaminated

    docs = load_table(spark, SF_ORACLE, "documents")
    n = 5
    # benchmarks: substrings lifted from two real docs (guaranteed hits)
    # plus an unrelated prompt (guaranteed miss)
    two = {r.doc_id: r.text for r in docs.filter("doc_id IN (7, 42)").collect()}
    bench_rows = [
        (100, " ".join(two[7].split(" ")[2:2 + n + 3])),
        (101, " ".join(two[42].split(" ")[1:1 + n])),
        (102, "completely unrelated benchmark prompt nothing shared here"),
    ]
    bench = spark.createDataFrame(bench_rows, "bench_id long, text string")
    got = {
        (r.doc_id, r.bench_id): r.n_shared_ngrams
        for r in find_contaminated(docs, bench, n=n).collect()
    }
    assert any(b == 100 for _, b in got) and any(b == 101 for _, b in got)
    assert not any(b == 102 for _, b in got)

    duck.register("bench_df", bench.toPandas())
    oracle = f"""
WITH dsh AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id,
           array_to_string(toks[g.k + 1 : g.k + {n}], ' ') AS sh
    FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
         LATERAL (SELECT unnest(generate_series(0, len(toks) - {n})) AS k) g
  )
),
bsh AS (
  SELECT DISTINCT bench_id, sh FROM (
    SELECT bench_id,
           array_to_string(toks[g.k + 1 : g.k + {n}], ' ') AS sh
    FROM (SELECT bench_id, string_split(lower(text), ' ') AS toks FROM bench_df),
         LATERAL (SELECT unnest(generate_series(0, len(toks) - {n})) AS k) g
  )
)
SELECT doc_id, bench_id, CAST(COUNT(*) AS BIGINT) AS n
FROM dsh JOIN bsh USING (sh)
GROUP BY doc_id, bench_id
"""
    expect = {(r[0], r[1]): r[2] for r in duck.execute(oracle).fetchall()}
    assert got == expect

    kept = {r.doc_id for r in decontaminate(docs, bench, n=n).collect()}
    flagged = {d for d, _ in got}
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert kept == all_ids - flagged


def test_find_contaminated_broadcasts_bench_side(spark):
    from big_data_hadoop_spark.pipeline import find_contaminated
    from big_data_hadoop_spark.plans.audit import formatted_plan

    docs = load_table(spark, SF_ORACLE, "documents")
    bench = spark.createDataFrame(
        [(1, "some benchmark text for plan inspection only")],
        "bench_id long, text string",
    )
    plan = formatted_plan(find_contaminated(docs, bench))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_sample_by_temperature_flattens_distribution(spark):
    """tau=1 keeps everything; tau>1 downsamples large sources toward
    the flattened p^(1/tau) distribution; selection is deterministic and
    per-row membership matches the hash rule recomputed in Python."""
    from big_data_hadoop_spark.pipeline import sample_by_temperature

    rows = (
        [(i, "big") for i in range(900)]
        + [(i + 1000, "mid") for i in range(90)]
        + [(i + 2000, "small") for i in range(10)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string")

    assert sample_by_temperature(docs, tau=1.0).count() == 1000

    out = sample_by_temperature(docs, tau=3.0, seed=7)
    by_src = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # smallest source keeps everything (rate 1.0 after normalization)
    assert by_src["small"] == 10
    # ratios flatten: big/small raw is 90x, post-sampling must be far less
    assert by_src["big"] / max(by_src["small"], 1) < 30
    # deterministic across invocations
    ids1 = {r.doc_id for r in out.collect()}
    ids2 = {
        r.doc_id for r in sample_by_temperature(docs, tau=3.0, seed=7).collect()
    }
    assert ids1 == ids2
    # exact membership: recompute keep fractions in Python and apply the
    # same hash rule via an independent Spark expression
    counts = {"big": 900, "mid": 90, "small": 10}
    total = sum(counts.values())
    expo = 1.0 / 3.0 - 1.0
    raw = {s: (n / total) ** expo for s, n in counts.items()}
    cap = max(raw.values())
    den = 1_000_000
    cuts = {s: int(min(r / cap, 1.0) * den) for s, r in raw.items()}
    expect = set()
    h = F.pmod(F.xxhash64(F.col("doc_id"), F.lit(7)), F.lit(den))
    for s, cut in cuts.items():
        expect |= {
            r.doc_id
            for r in docs.filter(F.col("source") == s)
            .filter(h < F.lit(cut))
            .collect()
        }
    assert ids1 == expect


def test_filter_by_group_quantile_matches_duckdb(spark, duck):
    """Per-group keep-low gate vs SQL quantile_disc-style cutoffs.
    percentile_approx at accuracy=10k is exact at this group size, and
    its result is an ACTUAL data value, so quantile_disc matches."""
    from big_data_hadoop_spark.pipeline import filter_by_group_quantile

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    got = {
        r.doc_id
        for r in filter_by_group_quantile(
            docs, "n_chars", 0.5, group_col="source", best="low"
        ).collect()
    }
    want = {
        r[0]
        for r in duck.sql(
            """
        WITH c AS (SELECT source, quantile_disc(n_chars, 0.5) AS cut
                   FROM documents GROUP BY source)
        SELECT d.doc_id FROM documents d JOIN c USING (source)
        WHERE d.n_chars <= c.cut
        """
        ).fetchall()
    }
    assert got == want and got


def test_filter_by_group_quantile_high_and_null(spark):
    from pyspark.sql import functions as F

    from big_data_hadoop_spark.pipeline import filter_by_group_quantile

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0), (4, "a", 4.0),
         (5, "b", 10.0), (6, "b", None), (7, None, 5.0), (8, None, 6.0)],
        "doc_id long, source string, score double",
    )
    hi = {
        r.doc_id
        for r in filter_by_group_quantile(
            df, "score", 0.5, best="high"
        ).collect()
    }
    # The cutoff is a DATA VALUE (percentile_approx), kept inclusively:
    # group a keeps scores >= q(0.5)=2 -> {2,3,4} (at LEAST keep_frac,
    # ties never split); group b's only scored row 5 keeps; the NULL
    # group is a group of its own (eqNullSafe): {5,6} -> cut 5 -> {7,8}
    assert hi == {2, 3, 4, 5, 7, 8}
    lo = {
        r.doc_id
        for r in filter_by_group_quantile(
            df, "score", 0.5, best="low"
        ).collect()
    }
    assert lo == {1, 2, 5, 7}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        filter_by_group_quantile(df, "score", 0.0)
    with _pytest.raises(ValueError):
        filter_by_group_quantile(df, "score", 0.5, best="middle")


def test_filter_by_group_quantile_no_data_shuffle(spark):
    """The corpus side must not exchange: cutoffs broadcast back."""
    from big_data_hadoop_spark.pipeline import filter_by_group_quantile

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    plan = filter_by_group_quantile(
        docs, "n_chars", 0.5
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the only shuffle Exchange feeds the O(groups) cutoff aggregate
    # (broadcast exchanges ship the tiny cutoff frame, not the corpus)
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 1


def test_corpus_diff_statuses(spark):
    from big_data_hadoop_spark.pipeline import corpus_diff

    old = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "gamma text"),
         (4, "delta  text")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(2, "beta text"), (3, "gamma CHANGED"), (4, "delta text"),
         (5, "epsilon new")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "unchanged",  # whitespace-only drift normalizes away
        5: "added",
    }


def test_corpus_diff_matches_duckdb(spark, duck):
    """Self-diff with a deterministic mutation on sf0.01: statuses match
    a SQL full-outer recomputation (same digest rule)."""
    from pyspark.sql import functions as F

    from big_data_hadoop_spark.pipeline import corpus_diff

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        "doc_id", "text"
    )
    new = docs.filter(F.col("doc_id") % 7 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" x")))
        .otherwise(F.col("text")),
    )
    got = {r.doc_id: r.status for r in corpus_diff(docs, new).collect()}
    want = {
        r[0]: r[1]
        for r in duck.sql(
            """
        WITH o AS (SELECT doc_id,
                     md5(trim(regexp_replace(lower(text),
                         '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))) AS h
                   FROM documents),
             n AS (SELECT doc_id,
                     md5(trim(regexp_replace(lower(
                         CASE WHEN doc_id % 5 = 0 THEN text || ' x'
                              ELSE text END),
                         '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))) AS h
                   FROM documents WHERE doc_id % 7 != 0)
        SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.h IS NULL THEN 'added'
                    WHEN n.h IS NULL THEN 'removed'
                    WHEN o.h = n.h THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        """
        ).fetchall()
    }
    assert got == want and "changed" in got.values() and "removed" in got.values()


# ------------------------------------------------- shuffled shard export


def test_shuffled_shards_deterministic_and_balanced(spark):
    """Shard assignment and intra-shard order are a pure function of
    (id, seed): re-running reproduces them exactly, the seed re-deals,
    and the input partitioning/order is irrelevant."""
    from big_data_hadoop_spark.pipeline import shuffled_shards

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    a = shuffled_shards(docs, 8, seed=1).select("doc_id", "shard").collect()
    b = shuffled_shards(
        docs.repartition(13).orderBy(F.desc("doc_id")), 8, seed=1
    ).select("doc_id", "shard").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = shuffled_shards(docs, 8, seed=2).select("doc_id", "shard").collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))
    # every shard populated, no shard starved (hash balance)
    from collections import Counter

    sizes = Counter(s for _, s in map(tuple, a))
    assert set(sizes) == set(range(8))
    assert min(sizes.values()) > 0.5 * max(sizes.values())


def test_write_shuffled_shards_one_file_per_shard(spark, tmp_path):
    import os

    from big_data_hadoop_spark.pipeline import write_shuffled_shards

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    out = str(tmp_path / "shards")
    write_shuffled_shards(docs, out, 4, seed=7)
    for k in range(4):
        d = os.path.join(out, f"shard={k}")
        parts = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(parts) == 1, f"shard {k}: {parts}"
    # round-trip: union of shards == corpus; order within a shard is
    # the (id, seed, 'order') hash order — byte-stable across exports
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    first = [r.doc_id for r in spark.read.parquet(os.path.join(out, "shard=0")).collect()]
    out2 = str(tmp_path / "shards2")
    write_shuffled_shards(docs.repartition(17), out2, 4, seed=7)
    second = [r.doc_id for r in spark.read.parquet(os.path.join(out2, "shard=0")).collect()]
    assert first == second and len(first) > 0


def test_write_shuffled_shards_rejects_bad_args(spark, tmp_path):
    import pytest

    from big_data_hadoop_spark.pipeline import (
        shuffled_shards,
        write_shuffled_shards,
    )

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id")
    with pytest.raises(ValueError, match="n_shards"):
        shuffled_shards(docs, 0)
    with pytest.raises(ValueError, match="format"):
        write_shuffled_shards(docs, str(tmp_path / "x"), 2, fmt="csvx")


# ------------------------------------------------------- skew diagnosis


def test_diagnose_skew_flags_hot_key_and_uniform(spark):
    from big_data_hadoop_spark.operators.counts import diagnose_skew

    hot = spark.range(0, 10_000).select(
        F.when(F.col("id") < 9_000, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), F.col("id")))
        .alias("k")
    )
    top, s = diagnose_skew(hot, "k", n_top=3, shuffle_partitions=16)
    rows = top.collect()
    assert rows[0].k == "hot" and rows[0].cnt == 9_000
    assert abs(rows[0].share - 0.9) < 1e-6
    assert s["rows"] == 10_000 and s["distinct_keys"] == 1_001
    assert s["max_key_rows"] == 9_000
    assert s["skew_factor"] > 1.0
    assert 2 <= s["recommended_salt_buckets"] <= 16

    uni = spark.range(0, 10_000).select((F.col("id") % 500).alias("k"))
    _, su = diagnose_skew(uni, "k", shuffle_partitions=16)
    assert su["skew_factor"] <= 1.0
    assert su["recommended_salt_buckets"] == 1


def test_shuffled_shards_curriculum_order(spark):
    """order_col: shard assignment stays the seeded hash deal, but
    each shard walks ascending by the score — the curriculum export."""
    from big_data_hadoop_spark.pipeline import shuffled_shards

    docs = spark.createDataFrame(
        [(i, float((i * 37) % 101)) for i in range(200)],
        "doc_id long, score double",
    )
    plain = shuffled_shards(docs, 4, seed=5)
    curr = shuffled_shards(docs, 4, seed=5, order_col="score")
    # same deal
    assert sorted(
        (r.doc_id, r.shard) for r in plain.select("doc_id", "shard").collect()
    ) == sorted(
        (r.doc_id, r.shard) for r in curr.select("doc_id", "shard").collect()
    )
    # within-shard ascending by score (toLocalIterator preserves the
    # partition-local sort; collect() concatenates partitions in order)
    rows = curr.collect()
    by_shard: dict[int, list[float]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.score)
    assert set(by_shard) == {0, 1, 2, 3}
    for scores in by_shard.values():
        assert scores == sorted(scores)


def test_winsorize_by_group_matches_duckdb(spark, duck):
    """Per-group quantile-band clamp vs quantile_disc cutoffs (exact
    at this group size, actual data values — same rationale as the
    gate test above): every row survives, tails are capped to the
    group band, interior values pass through untouched."""
    from big_data_hadoop_spark.pipeline import winsorize_by_group

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    got = {
        r.doc_id: r.n_chars
        for r in winsorize_by_group(
            docs, "n_chars", 0.1, 0.9, group_col="source"
        ).collect()
    }
    want = {
        r[0]: r[1]
        for r in duck.sql(
            """
        WITH c AS (SELECT source, quantile_disc(n_chars, 0.1) AS lo,
                          quantile_disc(n_chars, 0.9) AS hi
                   FROM documents GROUP BY source)
        SELECT d.doc_id,
               CAST(least(greatest(CAST(d.n_chars AS DOUBLE), CAST(c.lo AS DOUBLE)),
                          CAST(c.hi AS DOUBLE)) AS DOUBLE)
        FROM documents d JOIN c USING (source)
        """
        ).fetchall()
    }
    assert got == want and got
    n_docs = docs.count()
    assert len(got) == n_docs  # every row survives


def test_winsorize_nulls_and_validation(spark):
    import pytest

    from big_data_hadoop_spark.pipeline import winsorize_by_group

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "a", 100.0), (4, "a", None),
         (5, None, 7.0)],
        "doc_id long, source string, v double",
    )
    got = {
        r.doc_id: r.v
        for r in winsorize_by_group(df, "v", 0.0, 0.5).collect()
    }
    # group "a": median-disc of (1,2,100) = 2 → 100 clamps to 2
    assert got[3] == 2.0 and got[1] == 1.0 and got[2] == 2.0
    assert got[4] is None  # NULL passes through, row kept
    assert got[5] == 7.0  # NULL group clamps within its own group
    with pytest.raises(ValueError, match="lo_frac"):
        winsorize_by_group(df, "v", 0.9, 0.1)


def test_winsorize_nan_passthrough_and_collision(spark):
    """NaN neither skews the band (excluded from the sketch) nor gets
    rewritten to the hi cut (passes through like NULL); internal cut
    names refuse loudly on collision (review findings)."""
    import math

    import pytest

    from big_data_hadoop_spark.pipeline import winsorize_by_group

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0),
         (4, "a", float("nan")), (5, "a", 100.0)],
        "doc_id long, source string, v double",
    )
    got = {
        r.doc_id: r.v for r in winsorize_by_group(df, "v", 0.0, 0.5).collect()
    }
    # band from clean values (1,2,3,100): median-disc = 2 — NaN did
    # not drag _hi; the outlier clamps, NaN survives as NaN
    assert got[5] == 2.0 and math.isnan(got[4])
    assert got[1] == 1.0 and got[2] == 2.0
    with pytest.raises(ValueError, match="collide"):
        winsorize_by_group(df.withColumnRenamed("doc_id", "_lo"), "v", 0.0, 0.5)
