"""CLI entry points mirroring the reference programs (SURVEY §2.1 S6).

Reference CLIs → engine subcommands:

- ``HadoopWordCount <in> <out>``            → ``wordcount``
- ``HadoopWordPairs <in> <out>``            → ``wordpairs`` (m=1)
- ``HadoopWordPairs2 <in> <out> <m>``       → ``wordpairs -m M``
- ``HadoopWordStripes <in> <out>``          → ``wordstripes`` (m=1)
- ``HadoopWordStripes2 <in> <out> <m>``     → ``wordstripes -m M``
- ``SparkWordCount <in> <out> <out2>``      → ``topk`` (lowercase on,
  top-1000 per category, deterministic tie-break)

plus ``probe`` to run any declared probe and ``bench`` hints. Like the
reference's drivers (``HadoopWordCount.java:108,130-132``), each command
prints its wall-clock on completion.

Usage: ``python -m big_data_hadoop_spark.cli <command> ...``
"""

from __future__ import annotations

import argparse
import sys
import time

from pyspark.sql import Observation
from pyspark.sql import functions as F


def _read_table_cli(spark, path: str):
    """Every CLI read of a user-supplied LOCAL parquet path goes
    through ``read_table``: the path may be an engine-published
    MUTABLE table (upsert/compact/ingest stage-and-swap), and a bare
    ``spark.read.parquet`` racing a concurrent writer's swap window
    fails -- or silently reads nothing -- where the library-level
    reader survives (judge task r8 #3; the library closed this in
    round 8, the user-facing surface now follows).

    Remote URIs (``s3a://``, ``hdfs://`` -- anything with a scheme)
    and glob patterns bypass the routing: ``read_table``'s
    existence checks are local-POSIX (``os.path.exists`` can neither
    see a remote URI nor resolve a glob), so routing them would turn
    every previously-working remote/glob read into an instant
    FileNotFoundError (round-9 review finding). The swap-window
    protection only ever applied to the local stage-and-swap layout
    those checks serve."""
    import re

    # scheme'd URIs include the single-slash Hadoop form (file:/x,
    # hdfs:/x) — match any RFC-3986 scheme prefix, not just '://';
    # glob chars include {a,b} alternation (round-9 review, 2nd pass)
    if re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", path) or any(
        c in path for c in "*?[{"
    ):
        return spark.read.parquet(path)
    from big_data_hadoop_spark.sources.io import read_table

    return read_table(spark, path)


def _spark(app: str):
    from big_data_hadoop_spark.session import get_spark

    return get_spark(app_name=app)


def cmd_wordcount(args: argparse.Namespace) -> None:
    from big_data_hadoop_spark.operators.counts import token_counts
    from big_data_hadoop_spark.sources.io import (
        read_text_lines,
        write_partitioned_by_category,
    )

    spark = _spark("wordcount")
    lines = read_text_lines(spark, args.input)
    counts = token_counts(lines, lowercase=args.lowercase)
    write_partitioned_by_category(
        counts.orderBy("token").select("category", "token", "cnt"), args.output
    )


def cmd_wordpairs(args: argparse.Namespace) -> None:
    from big_data_hadoop_spark.operators.cooccur import pair_counts
    from big_data_hadoop_spark.sources.io import (
        read_text_lines,
        write_partitioned_by_category,
    )

    spark = _spark("wordpairs")
    lines = read_text_lines(spark, args.input)
    pairs = pair_counts(lines, m=args.m, lowercase=args.lowercase)
    out = pairs.select(
        "category",
        F.concat_ws(":", "left", "right").alias("pair"),
        "cnt",
    ).orderBy("pair")
    write_partitioned_by_category(out, args.output)


def cmd_wordstripes(args: argparse.Namespace) -> None:
    from big_data_hadoop_spark.operators.cooccur import stripe_entries, stripes
    from big_data_hadoop_spark.sources.io import (
        read_text_lines,
        write_partitioned_by_category,
    )

    spark = _spark("wordstripes")
    lines = read_text_lines(spark, args.input)
    st = stripe_entries(stripes(lines, m=args.m, lowercase=args.lowercase))
    out = st.select(
        "category", "token", F.concat_ws(",", "stripe").alias("stripe")
    ).orderBy("token")
    write_partitioned_by_category(out, args.output)


def cmd_topk(args: argparse.Namespace) -> None:
    from big_data_hadoop_spark.operators.counts import token_counts, top_k
    from big_data_hadoop_spark.sources.io import (
        read_text_lines,
        write_single_text_file,
    )

    spark = _spark("topk")
    lines = read_text_lines(spark, args.input)
    counts = token_counts(lines, lowercase=True)
    for category, out in ((args.words_category, args.output), ("number", args.output2)):
        if out is None:
            continue
        ranked = top_k(counts.filter(F.col("category") == category), args.k)
        write_single_text_file(ranked.select("token", "cnt"), out)


def _read_docs(spark, path: str):
    """Documents input for pipeline commands: a parquet table with
    (doc_id, text) or a JSONL file/directory of the same shape —
    detected from the actual part-file extensions, not the path name."""
    import os

    from big_data_hadoop_spark.sources.io import read_jsonl

    def is_parquet(p: str) -> bool:
        if os.path.isdir(p):
            return any(
                f.endswith(".parquet")
                for _root, _dirs, files in os.walk(p)
                for f in files
            )
        return p.endswith(".parquet")

    if is_parquet(path):
        return _read_table_cli(spark, path).select("doc_id", "text")
    raw = read_jsonl(spark, path, schema="doc_id long, text string")
    # PERMISSIVE mode turns unparseable lines into all-null rows; without
    # this filter they would flow silently into curate/chunk/sample
    # (ADVICE r3). Dropping them is a narrow filter fused into the scan.
    # The triage count rides the command's own action as an observed
    # metric (ADVICE r4: an eager count here doubled the ingest scan and
    # broke laziness); ``_warn_dropped_lines`` reads it post-action.
    # unique name per ingest: two _read_docs frames meeting in ONE query
    # (e.g. decontaminate's docs + benchmarks) must not collide
    # (DUPLICATED_METRICS_NAME)
    obs = Observation(f"jsonl_triage_{len(_PENDING_TRIAGE)}")
    raw = raw.observe(
        obs,
        F.count(F.when(F.col("_corrupt_record").isNotNull(), 1)).alias(
            "n_bad"
        ),
    )
    _PENDING_TRIAGE.append(obs)
    return raw.filter(F.col("_corrupt_record").isNull()).select(
        "doc_id", "text"
    )


_PENDING_TRIAGE: list = []


def _warn_dropped_lines() -> None:
    """Emit the JSONL-triage warning after the pipeline's action ran.
    ``Observation.get`` would block forever if no action consumed the
    observed plan, so this must only be called post-write."""
    while _PENDING_TRIAGE:
        obs = _PENDING_TRIAGE.pop()
        try:
            n_bad = obs.get["n_bad"]
        except Exception:
            # A pipeline stage that re-executes the observed subtree in a
            # degenerate way can leave the metric unreadable; the corrupt
            # rows are still FILTERED either way — only the count is lost.
            print(
                "warning: unparseable JSONL line count unavailable "
                "(lines were still dropped)",
                file=sys.stderr,
            )
            continue
        if n_bad:
            print(
                f"warning: {n_bad} unparseable JSONL line(s) dropped",
                file=sys.stderr,
            )


def cmd_curate(args: argparse.Namespace) -> None:
    from big_data_hadoop_spark.pipeline import curate_training_data
    from big_data_hadoop_spark.sources.io import write_jsonl

    spark = _spark("curate")
    docs = _read_docs(spark, args.input)
    out = curate_training_data(
        docs,
        min_tokens=args.min_tokens,
        min_alpha_ratio=args.min_alpha_ratio,
        langs=tuple(args.langs.split(",")),
        neardup_threshold=args.neardup_threshold,
        neardup_mode=args.neardup_mode,
        max_dup_line_frac=args.max_dup_line_frac,
        strip_dup_spans_k=args.strip_dup_spans,
    )
    write_jsonl(out, args.output)
    _warn_dropped_lines()


def cmd_chunk(args: argparse.Namespace) -> None:
    from big_data_hadoop_spark.pipeline import chunk_documents
    from big_data_hadoop_spark.sources.io import write_jsonl

    spark = _spark("chunk")
    docs = _read_docs(spark, args.input)
    write_jsonl(
        chunk_documents(docs, args.max_tokens, overlap=args.overlap),
        args.output,
    )
    _warn_dropped_lines()


def cmd_sample(args: argparse.Namespace) -> None:
    from big_data_hadoop_spark.pipeline import sample_to_token_budget
    from big_data_hadoop_spark.sources.io import write_jsonl

    spark = _spark("sample")
    docs = _read_docs(spark, args.input)
    write_jsonl(sample_to_token_budget(docs, args.budget), args.output)
    _warn_dropped_lines()


def cmd_pack(args: argparse.Namespace) -> None:
    from big_data_hadoop_spark.pipeline import materialize_packs
    from big_data_hadoop_spark.sources.io import write_jsonl

    spark = _spark("pack")
    docs = _read_docs(spark, args.input)
    write_jsonl(
        materialize_packs(docs, args.context_tokens), args.output
    )
    _warn_dropped_lines()


def cmd_decontaminate(args: argparse.Namespace) -> None:
    from big_data_hadoop_spark.pipeline import decontaminate
    from big_data_hadoop_spark.sources.io import write_jsonl

    spark = _spark("decontaminate")
    docs = _read_docs(spark, args.input)
    bench = _read_docs(spark, args.benchmarks).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    write_jsonl(
        decontaminate(docs, bench, n=args.ngram), args.output
    )
    _warn_dropped_lines()


def cmd_profile(args: argparse.Namespace) -> None:
    """Corpus health profile to stdout (and optionally JSONL)."""
    from big_data_hadoop_spark.pipeline import corpus_profile
    from big_data_hadoop_spark.sources.io import write_jsonl

    spark = _spark("profile")
    docs = _read_docs(spark, args.input)
    group_cols = tuple(c for c in args.group_cols.split(",") if c)
    if group_cols:
        # group columns live beside (doc_id, text) in the source table.
        # Detection mirrors _read_docs (scan for .parquet part files —
        # a JSONL DIRECTORY is also isdir, review finding): JSONL inputs
        # re-read with the wider schema instead of the parquet reader.
        import os

        def is_parquet(p: str) -> bool:
            if os.path.isdir(p):
                return any(
                    f.endswith(".parquet")
                    for _root, _dirs, files in os.walk(p)
                    for f in files
                )
            return p.endswith(".parquet")

        if is_parquet(args.input):
            full = _read_table_cli(spark, args.input)
        else:
            from big_data_hadoop_spark.sources.io import read_jsonl

            cols = ", ".join(f"{c} string" for c in group_cols)
            full = read_jsonl(
                spark, args.input, schema=f"doc_id long, text string, {cols}"
            ).filter(F.col("_corrupt_record").isNull())
        docs = full.select("doc_id", "text", *group_cols)
    prof = corpus_profile(docs, group_cols=group_cols).orderBy(
        *group_cols if group_cols else ["n_docs"]
    )
    prof.show(1000, truncate=False)
    if args.output:
        write_jsonl(prof, args.output)
    _warn_dropped_lines()


def cmd_split(args: argparse.Namespace) -> None:
    """Leakage-safe split assignment; output partitioned by split."""
    from big_data_hadoop_spark.pipeline import split_leakage_safe
    from big_data_hadoop_spark.sources.io import write_jsonl

    spark = _spark("split")
    docs = _read_docs(spark, args.input)
    weights: dict[str, float] = {}
    for part in args.weights.split(","):
        name, _, w = part.partition("=")
        if not w:
            sys.exit(f"bad --weights entry {part!r}; expected name=weight")
        weights[name] = float(w)
    clusters = None
    if args.neardup_threshold is not None:
        from big_data_hadoop_spark.operators.dedup import (
            duplicate_clusters,
            minhash_lsh_pairs,
        )

        clusters = duplicate_clusters(
            minhash_lsh_pairs(docs, threshold=args.neardup_threshold)
        )
    out = split_leakage_safe(docs, weights, clusters=clusters, seed=args.seed)
    write_jsonl(out, args.output, partition_by=("split",))
    _warn_dropped_lines()


def cmd_search(args: argparse.Namespace) -> None:
    """Ad-hoc BM25 retrieval over a document corpus."""
    from big_data_hadoop_spark.operators.bm25 import bm25_index, bm25_topk

    spark = _spark("search")
    docs = _read_docs(spark, args.input)
    from big_data_hadoop_spark.sources.io import local_frame

    queries = local_frame(
        spark,
        [(i, q) for i, q in enumerate(args.query)],
        "query_id long, text string",
    )
    idx = bm25_index(docs, max_df_frac=args.max_df_frac)
    hits = bm25_topk(idx, queries, topk=args.topk).join(
        docs.select("doc_id", F.substring("text", 1, 80).alias("snippet")),
        "doc_id",
    )
    # ONE action for all queries (review finding: a per-query
    # filter+collect re-ran the whole index/score job N times)
    by_query: dict[int, list] = {}
    for r in hits.collect():
        by_query.setdefault(r["query_id"], []).append(r)
    for q_i, q in enumerate(args.query):
        print(f"# query[{q_i}]: {q}")
        for r in sorted(by_query.get(q_i, []), key=lambda r: r["rank"]):
            print(
                f"  {r['rank']:>2}. doc {r['doc_id']} "
                f"(bm25 {r['score']:.3f}): {r['snippet']}"
            )
    _warn_dropped_lines()


def cmd_clean(args: argparse.Namespace) -> None:
    """Web-text hygiene chain: optional HTML-to-text, Unicode
    normalization, optional cross-document line dedup — the cleanup
    that runs BEFORE the curate gates so quality signals see prose,
    not tag soup."""
    from big_data_hadoop_spark.operators.texthygiene import (
        dedup_lines,
        normalize_text,
        strip_html,
    )
    from big_data_hadoop_spark.sources.io import write_jsonl

    spark = _spark("clean")
    docs = _read_docs(spark, args.input)
    if args.strip_html:
        docs = docs.withColumn("text", strip_html(F.col("text")))
    docs = normalize_text(docs, form=args.form)
    if args.max_line_df > 0:
        docs = dedup_lines(docs, max_df=args.max_line_df).select(
            "doc_id", "text"
        )
    write_jsonl(docs, args.output)
    _warn_dropped_lines()


def cmd_ingest(args: argparse.Namespace) -> None:
    """Manifest-tracked incremental ingest: append only files no prior
    run processed into a parquet dataset; the manifest commits AFTER
    the write succeeds, so a failed run retries the same files
    (at-least-once — ``sources.io.read_incremental``)."""
    from big_data_hadoop_spark.sources.io import read_incremental

    spark = _spark("ingest")
    df, commit = read_incremental(
        spark, args.input, args.manifest, glob=args.glob, fmt=args.format
    )
    if df is None:
        print("[ingest] no new files")
        return
    # the row count rides the write's own scan via observe — an eager
    # count() here read every new file twice (review finding)
    obs = Observation("ingest_rows")
    df = df.observe(obs, F.count(F.lit(1)).alias("n"))
    df.write.mode("append").parquet(args.output)
    commit()
    print(f"[ingest] appended {obs.get['n']} rows from new files")


def cmd_upsert(args: argparse.Namespace) -> None:
    """Keyed MERGE of an updates parquet into a dataset
    (``sources.io.upsert_parquet``): same-key rows replaced, new keys
    inserted; partitioned datasets rewrite only affected partitions."""
    from big_data_hadoop_spark.sources.io import upsert_parquet

    spark = _spark("upsert")
    updates = _read_table_cli(spark, args.updates)
    upsert_parquet(
        spark,
        args.dataset,
        updates,
        key_cols=args.keys.split(","),
        partition_cols=(
            args.partition_by.split(",") if args.partition_by else None
        ),
        stats_path=args.stats_path,
        stats_glob=args.stats_glob,
    )
    print(f"[upsert] merged into {args.dataset}")


def cmd_shard(args: argparse.Namespace) -> None:
    """Seeded deterministic shuffle-shard export
    (``pipeline.write_shuffled_shards``): the corpus dealt into N
    pseudo-random shards (one file each, ``shard=K/`` layout) whose
    contents and internal order are a pure function of (id, seed) —
    re-exports are byte-identical, a new seed re-deals everything."""
    from big_data_hadoop_spark.pipeline import write_shuffled_shards

    spark = _spark("shard")
    docs = _read_table_cli(spark, args.input)
    write_shuffled_shards(
        docs,
        args.output,
        args.n_shards,
        seed=args.seed,
        id_col=args.id_col,
        fmt=args.format,
    )
    print(f"[shard] wrote {args.n_shards} shards to {args.output}")


def _run_store_cli(args: argparse.Namespace, spec: dict) -> None:
    """ONE lifecycle driver for all four persisted stores (near-dup
    graph, fingerprint, frame-hash, embedding) — they share the
    immutable-batch protocol (``sources/batch_store.py``), so they
    share the CLI surface too: build / refresh / matches / compact /
    vacuum / export / stats plus store-specific extras (round-11: the
    four ~170-line near-clones folded into this).

    ``spec`` keys: ``name`` (CLI command), ``hint`` (meta hint),
    ``build_defaults`` (build-only flags with their argparse defaults
    — passing one to a non-build action refuses loudly: params come
    from the store's meta, a mid-history change would silently
    redefine "duplicate"), ``flag_actions`` (flags additionally legal
    for specific extra actions), ``refusal_suffix``, ``vacuum`` /
    ``build`` / ``batch_frame`` / ``refresh`` / ``matches`` /
    ``compact`` / ``load`` callables, ``match_order`` / ``match_fmt``
    (stdout form of the read-only novelty check), ``export_key``,
    ``stats_view`` (meta → printable dict), ``extra`` (action →
    ``fn(spark, args) -> stats``)."""
    import json as _json

    flag_actions = spec.get("flag_actions", {})
    flag_allowed = spec.get("flag_allowed", {})
    passed, off_build = [], []
    for k, d in spec["build_defaults"].items():
        if getattr(args, k) == d:
            continue
        allowed = flag_allowed.get(
            k, ("build",) + tuple(flag_actions.get(k, ()))
        )
        if args.action not in allowed:
            passed.append(f"--{k.replace('_', '-')}")
            off_build.append(allowed)
    if passed:
        # the unified 'build' message only when every offending flag
        # is EXCLUSIVELY a build parameter — a multi-action flag (e.g.
        # --check-cells: build/rebuild/audit) must fall through to the
        # per-flag lines below or the refusal hides its other legal
        # actions (round-12 review: "only apply to 'build'" told the
        # operator the lever was build-only when rebuild/audit are the
        # documented fixes)
        if all(tuple(a) == ("build",) for a in off_build):
            raise SystemExit(
                f"{' '.join(passed)} only apply to 'build' — "
                f"'{args.action}' takes every store parameter from "
                "the store's meta.json (a mid-history change would "
                "silently redefine what 'duplicate' means"
                f"{spec.get('refusal_suffix', '')})"
            )
        # one refusal line PER offending flag naming that flag's OWN
        # allowed actions — a unioned action list can send the user to
        # the wrong fix when flags from different actions are mixed
        # (round-11 advice: `--eps --sample-rows` on refresh read as
        # "audit or build take both")
        lines = [
            f"{flag} only apply to "
            + "/".join(repr(a) for a in sorted(set(allowed)))
            for flag, allowed in zip(passed, off_build)
        ]
        raise SystemExit(
            "; ".join(lines)
            + " — a flag that is a silent no-op refuses loudly instead"
        )
    if args.action == "vacuum":
        # filesystem-only: no Spark session spin-up for a sweep
        st = spec["vacuum"](args.store, args.grace_seconds)
        print(_json.dumps(st, sort_keys=True))
        return
    if args.action == "stats":
        # inspect before you mutate: committed meta verbatim (params +
        # manifest), no Spark session — a metadata read must not cost
        # a JVM spin-up
        from big_data_hadoop_spark.sources import batch_store

        meta = batch_store.read_meta(args.store, spec["hint"])
        print(
            _json.dumps(
                spec.get("stats_view", lambda m: m)(meta), sort_keys=True
            )
        )
        return
    spark = _spark(spec["name"])
    if args.action in ("build", "refresh", "matches"):
        if not args.input:
            raise SystemExit(
                f"{spec['name']} {args.action} requires --input"
            )
        if args.action == "build":
            st = spec["build"](spark, args)
        else:
            from big_data_hadoop_spark.sources import batch_store

            # refresh/matches derive EVERY parameter (tier, column
            # names) from the store's meta — argparse defaults would
            # make a store built with custom columns permanently
            # un-refreshable from the CLI
            meta = batch_store.read_meta(args.store, spec["hint"])
            df = spec["batch_frame"](spark, args, meta)
            if args.action == "matches":
                # read-only novelty check: what the store would reject
                # right now — no writer claim, no mutation
                hits = spec["matches"](spark, df, args.store)
                if args.output:
                    # corpus-scale form: never collect the match list
                    n = hits.count()
                    hits.write.mode("overwrite").parquet(args.output)
                    st = {"matches": n}
                else:
                    rows = hits.orderBy(*spec["match_order"](meta)).collect()
                    fmt = spec.get("match_fmt", lambda r: str(r[0]))
                    for r in rows:
                        print(fmt(r))
                    st = {"matches": len(rows)}
            else:
                st = spec["refresh"](spark, df, args.store)
    elif args.action == "compact":
        st = spec["compact"](spark, args.store)
    elif args.action == "export":
        if not args.output:
            raise SystemExit(f"{spec['name']} export requires --output")
        # count the STORE's immutable directories, then write — no bare
        # re-read of the freshly-written mutable output path (round-10;
        # the last such reads on the CLI surface)
        stored = spec["load"](spark, args.store)
        n = stored.count()
        stored.write.mode("overwrite").parquet(args.output)
        st = {spec["export_key"]: n}
    else:
        st = spec["extra"][args.action](spark, args)
    print(_json.dumps(st, sort_keys=True))


def cmd_neardup_graph(args: argparse.Namespace) -> None:
    """Maintain the persisted near-dup pair graph store
    (``operators.neardup_graph``): build it from a corpus, refresh it
    with an ingest batch (history is never re-shingled), compact its
    batch directories, vacuum orphans, or export the edge table."""
    from big_data_hadoop_spark.operators import neardup_graph as ng_ops

    def build(spark, args):
        docs = _read_table_cli(spark, args.input).select(
            args.id_col, args.text_col
        )
        return ng_ops.neardup_graph_build(
            spark,
            docs,
            args.store,
            n=args.ngram,
            num_perm=args.num_perm,
            bands=args.bands,
            threshold=args.threshold,
            text_col=args.text_col,
            id_col=args.id_col,
        )

    _run_store_cli(
        args,
        {
            "name": "neardup-graph",
            "hint": "neardup_graph_build",
            "build_defaults": {
                "ngram": 3,
                "num_perm": 128,
                "bands": 32,
                "threshold": 0.9,
                "text_col": "text",
                "id_col": "doc_id",
            },
            "vacuum": lambda store, grace: ng_ops.neardup_graph_vacuum(
                store, grace_seconds=grace
            ),
            "build": build,
            "batch_frame": lambda spark, args, meta: _read_table_cli(
                spark, args.input
            ).select(meta["id_col"], meta["text_col"]),
            "refresh": ng_ops.neardup_graph_refresh,
            "matches": ng_ops.neardup_graph_matches,
            "match_order": lambda meta: (meta["id_col"], "prior_id"),
            "match_fmt": lambda r: f"{r[0]}\t{r[1]}\t{r[2]:.6f}",
            "compact": ng_ops.neardup_graph_compact,
            "load": ng_ops.neardup_graph_load,
            "export_key": "edges",
        },
    )


_FP_TIERS = ("image", "audio", "video", "simhash", "raw")


def _resolve_tier(args, meta: dict, family_word: str) -> str:
    """The pinned-family handshake shared by the tiered stores: an
    explicit ``--tier`` must agree with the family pinned at build;
    a store built via the library (no family) needs it passed."""
    tier = meta.get("family")
    if args.tier and tier and args.tier != tier:
        raise SystemExit(
            f"--tier {args.tier} conflicts with the store's pinned "
            f"family '{tier}' — one history, one {family_word} family"
        )
    tier = args.tier or tier
    if not tier:
        raise SystemExit(
            "the store's meta has no pinned family (built via the "
            "library?) — pass --tier explicitly"
        )
    return tier


def _fp_tier_frame(spark, tier: str, path: str, args):
    """Input parquet → ``(id, fp)`` frame for the chosen fingerprint
    family: image/audio read a binary media table (``media_id``,
    ``payload``) through the decode tiers; simhash reads documents
    (``--id-col``/``--text-col``); raw passes precomputed fingerprints
    (``--id-col``/``--fp-col``) through."""
    df = _read_table_cli(spark, path)
    # decode/fingerprint-backed tiers are eagerly checkpointed: the
    # store verbs reference the frame 3-5 times (duplicate-id check,
    # isEmpty, history match, _accept's own checkpoint) and would
    # otherwise re-execute the expensive media-decode mapInPandas per
    # reference (round-10 ADVICE — the same 4x re-execution the r06
    # probe measured and fixed probe-side)
    if tier == "image":
        from big_data_hadoop_spark.operators.imagehash import image_dhash

        return (
            image_dhash(df)
            .withColumnRenamed("dhash", "fp")
            .localCheckpoint(eager=True),
            "media_id",
        )
    if tier == "audio":
        from big_data_hadoop_spark.operators.audiohash import (
            audio_fingerprint,
        )

        return (
            audio_fingerprint(df)
            .withColumnRenamed("afp", "fp")
            .localCheckpoint(eager=True),
            "media_id",
        )
    if tier == "video":
        # the EXACT clip tier: ordered-frame-hash digest — the store's
        # single-value shape (build with --max-hamming 0 for exact
        # dedup; clip NEAR-dup stays with video_neardup_pairs/
        # video_matches_against, whose per-frame rows don't fit a
        # one-fp-per-id history)
        from big_data_hadoop_spark.operators.videohash import (
            video_clip_fingerprint,
            video_dhash,
        )

        return (
            video_clip_fingerprint(video_dhash(df)).localCheckpoint(
                eager=True
            ),
            "media_id",
        )
    if tier == "simhash":
        from big_data_hadoop_spark.operators.dedup import simhash

        fp = simhash(
            df.select(args.id_col, args.text_col),
            text_col=args.text_col,
            id_col=args.id_col,
        )
        return (
            fp.withColumnRenamed("simhash", "fp").localCheckpoint(
                eager=True
            ),
            args.id_col,
        )
    # raw: already (id, fp) — keep the caller's column names; build
    # pins them in meta and refresh reads them back, so a store built
    # from custom columns stays refreshable (the neardup-graph CLI
    # lesson from earlier this round)
    return df.select(F.col(args.id_col), F.col(args.fp_col)), args.id_col


def cmd_fingerprint_store(args: argparse.Namespace) -> None:
    """Maintain a persisted perceptual fingerprint store
    (``operators.fingerprint_store``): build it from a media/document
    corpus (fingerprinting with the chosen ``--tier``), refresh it
    with an ingest batch, compact, vacuum, or export the accepted
    table. The tier is pinned in the store's meta at build time and
    validated on refresh — mixing fingerprint families in one history
    would silently redefine what "duplicate" means."""
    from big_data_hadoop_spark.operators import fingerprint_store as fs_ops

    def build(spark, args):
        if not args.tier:
            raise SystemExit(
                "fingerprint-store build requires --tier "
                f"({'|'.join(_FP_TIERS)})"
            )
        if args.tier == "video" and args.max_hamming != 0:
            # round-10 ADVICE: the clip fingerprint is an xxhash64
            # avalanche digest — visually-near clips land ~32 bits
            # apart, so any nonzero radius silently degrades to
            # exact-only dedup while CLAIMING a near-dup radius
            raise SystemExit(
                "--tier video requires --max-hamming 0 (the clip "
                "fingerprint is an avalanche digest; Hamming "
                "distance on it is meaningless) — for NEAR-dup "
                "video matching use the frame-hash tier "
                "(video_neardup_pairs / video_matches_against)"
            )
        fp, id_col = _fp_tier_frame(spark, args.tier, args.input, args)
        return fs_ops.fingerprint_store_build(
            spark,
            fp,
            args.store,
            max_hamming=args.max_hamming,
            id_col=id_col,
            fp_col=args.fp_col if args.tier == "raw" else "fp",
            family=args.tier,
            extras=(
                {"text_col": args.text_col}
                if args.tier == "simhash"
                else None
            ),
        )

    def batch_frame(spark, args, meta):
        tier = _resolve_tier(args, meta, "fingerprint")
        # for simhash/raw tiers the column names come from meta
        # (a store built with custom columns must stay refreshable)
        args.id_col = meta["id_col"]
        args.fp_col = meta["fp_col"]
        args.text_col = meta.get("extras", {}).get(
            "text_col", args.text_col
        )
        fp, _ = _fp_tier_frame(spark, tier, args.input, args)
        return fp

    _run_store_cli(
        args,
        {
            "name": "fingerprint-store",
            "hint": "fingerprint_store_build",
            "build_defaults": {
                "max_hamming": 3,
                "text_col": "text",
                "id_col": "doc_id",
                "fp_col": "fp",
            },
            "vacuum": lambda store, grace: fs_ops.fingerprint_store_vacuum(
                store, grace_seconds=grace
            ),
            "build": build,
            "batch_frame": batch_frame,
            "refresh": fs_ops.fingerprint_store_refresh,
            "matches": fs_ops.fingerprint_store_matches,
            "match_order": lambda meta: (meta["id_col"],),
            "compact": fs_ops.fingerprint_store_compact,
            "load": fs_ops.fingerprint_store_load,
            "export_key": "fingerprints",
        },
    )


_FH_TIERS = ("video", "raw")


def _fh_tier_frame(spark, tier: str, path: str, args):
    """Input parquet → ``(id, frame_no, dhash)`` frame for the
    framehash store: video decodes a binary media table through
    ``video_dhash`` (sampling ``--n-frames``, pinned in meta); raw
    passes a precomputed frame-hash table through (``--id-col``)."""
    df = _read_table_cli(spark, path)
    if tier == "video":
        from big_data_hadoop_spark.operators.videohash import video_dhash

        # decode-backed: checkpoint so the store verbs' 3-5 references
        # share ONE execution of the codec mapInPandas (the
        # _fp_tier_frame discipline)
        return (
            video_dhash(df, n_frames=args.n_frames).localCheckpoint(
                eager=True
            ),
            "media_id",
        )
    return (
        df.select(F.col(args.id_col), F.col("frame_no"), F.col("dhash")),
        args.id_col,
    )


def cmd_framehash_store(args: argparse.Namespace) -> None:
    """Maintain a persisted video frame-hash store
    (``operators.framehash_store``): NEAR-dup clip dedup with history
    = n_frames 8-byte hashes per accepted clip. The tier and the
    sampling parameter are pinned in meta at build time and validated/
    re-read on refresh — mixed sampling in one history would silently
    change clip identities (the fingerprint-store family contract)."""
    from big_data_hadoop_spark.operators import framehash_store as fh_ops

    def build(spark, args):
        if not args.tier:
            raise SystemExit(
                "framehash-store build requires --tier "
                f"({'|'.join(_FH_TIERS)})"
            )
        fh, id_col = _fh_tier_frame(spark, args.tier, args.input, args)
        return fh_ops.framehash_store_build(
            spark,
            fh,
            args.store,
            max_hamming=args.max_hamming,
            min_matching_frames=args.min_matching_frames,
            drop_constant=not args.match_constant_frames,
            max_frame_df=args.max_frame_df,
            id_col=id_col,
            family=args.tier,
            extras=(
                {"n_frames": args.n_frames}
                if args.tier == "video"
                else None
            ),
        )

    def batch_frame(spark, args, meta):
        tier = _resolve_tier(args, meta, "frame-hash")
        args.id_col = meta["id_col"]
        args.n_frames = meta.get("extras", {}).get(
            "n_frames", args.n_frames
        )
        fh, _ = _fh_tier_frame(spark, tier, args.input, args)
        return fh

    _run_store_cli(
        args,
        {
            "name": "framehash-store",
            "hint": "framehash_store_build",
            "build_defaults": {
                "max_hamming": 1,
                "min_matching_frames": 2,
                "n_frames": 8,
                "id_col": "media_id",
                "match_constant_frames": False,
                "max_frame_df": None,
            },
            "vacuum": lambda store, grace: fh_ops.framehash_store_vacuum(
                store, grace_seconds=grace
            ),
            "build": build,
            "batch_frame": batch_frame,
            "refresh": fh_ops.framehash_store_refresh,
            "matches": fh_ops.framehash_store_matches,
            "match_order": lambda meta: (meta["id_col"],),
            "compact": fh_ops.framehash_store_compact,
            "load": fh_ops.framehash_store_load,
            "export_key": "frame_rows",
        },
    )


def cmd_embedding_store(args: argparse.Namespace) -> None:
    """Maintain a persisted embedding store
    (``operators.embedding_store``): incremental semantic dedup with
    centroids pinned at build. Input is an ``(id, embedding)`` parquet
    table (``--id-col``/``--vec-col``, pinned in meta and re-read on
    refresh). ``matches`` is the read-only novelty check; ``audit``
    measures the within-cell approximation's recall on a sample
    (``embedding_store_recall_audit``); ``rebuild`` refits the
    quantizer and replays accepted history through the new cells
    (``--n-cells``/``--seed`` optionally override the pinned
    values)."""
    from big_data_hadoop_spark.operators import embedding_store as es_ops
    from big_data_hadoop_spark.sources import batch_store

    def build(spark, args):
        if args.dim is None:
            raise SystemExit(
                "embedding-store build requires --dim (the fixed "
                "embedding width; the flat scoring path needs it)"
            )
        df = _read_table_cli(spark, args.input).select(
            F.col(args.id_col), F.col(args.vec_col)
        )
        return es_ops.embedding_store_build(
            spark,
            df,
            args.store,
            eps=args.eps,
            n_cells=args.n_cells if args.n_cells is not None else 16,
            dim=args.dim,
            id_col=args.id_col,
            vec_col=args.vec_col,
            seed=args.seed if args.seed is not None else 42,
            max_cell_rows=args.max_cell_rows,
            check_cells=(
                args.check_cells if args.check_cells is not None else 1
            ),
        )

    def rebuild(spark, args):
        if args.clear_max_cell_rows and args.max_cell_rows is not None:
            raise SystemExit(
                "--clear-max-cell-rows and --max-cell-rows are "
                "mutually exclusive"
            )
        if args.clear_max_cell_rows:
            max_cell_rows = None  # remove the valve
        elif args.max_cell_rows is not None:
            max_cell_rows = args.max_cell_rows
        else:
            max_cell_rows = "keep"
        return es_ops.embedding_store_rebuild(
            spark,
            args.store,
            n_cells=args.n_cells,
            seed=args.seed,
            max_cell_rows=max_cell_rows,
            check_cells=args.check_cells,
        )

    def audit(spark, args):
        if not args.input:
            raise SystemExit("embedding-store audit requires --input")
        meta = batch_store.read_meta(args.store, "embedding_store_build")
        df = _read_table_cli(spark, args.input).select(
            F.col(meta["id_col"]), F.col(meta["vec_col"])
        )
        if args.sweep_cells is not None:
            # the multi-width tuning loop: truth computed ONCE, one
            # widened verdict per probed p (the library sweep verb)
            if args.check_cells is not None:
                raise SystemExit(
                    "--sweep-cells and --check-cells are mutually "
                    "exclusive on audit (the sweep IS a multi-width "
                    "audit)"
                )
            if args.output:
                raise SystemExit(
                    "--output applies to the single-width audit (the "
                    "sweep skips materializing per-width miss "
                    "evidence); rerun audit --check-cells <p> at the "
                    "chosen width for the missed rows"
                )
            try:
                widths = tuple(
                    int(x) for x in args.sweep_cells.split(",") if x
                )
            except ValueError:
                raise SystemExit(
                    "--sweep-cells takes a comma-separated list of "
                    f"ints, got {args.sweep_cells!r}"
                ) from None
            if not widths:
                # an all-separators value (',' or '') parses to an
                # EMPTY width list — refuse here with the same
                # message, not as the library's raw traceback after
                # Spark spin-up
                raise SystemExit(
                    "--sweep-cells takes a comma-separated list of "
                    f"ints, got {args.sweep_cells!r}"
                )
            return {
                "sweep": es_ops.embedding_store_recall_sweep(
                    spark,
                    df,
                    args.store,
                    check_cells=widths,
                    sample_rows=args.sample_rows,
                    seed=args.seed if args.seed is not None else 0,
                )
            }
        missed, summary = es_ops.embedding_store_recall_audit(
            spark,
            df,
            args.store,
            sample_rows=args.sample_rows,
            seed=args.seed if args.seed is not None else 0,
            # hypothetical width (default: the store's pinned value) —
            # measure the lever's gain BEFORE paying the rebuild
            check_cells=args.check_cells,
        )
        if args.output:
            # the missed pairs ARE the evidence — persist on request
            # (their count is already summary["missed"]; no re-count)
            missed.write.mode("overwrite").parquet(args.output)
        return summary

    def stats_view(meta):
        # centroids are k x dim floats — summarize, don't dump
        meta = dict(meta)
        meta["centroids"] = f"<{len(meta['centroids'])} pinned>"
        return meta

    _run_store_cli(
        args,
        {
            "name": "embedding-store",
            "hint": "embedding_store_build",
            "build_defaults": {
                "eps": 0.95,
                "n_cells": None,
                "dim": None,
                "id_col": "vec_id",
                "vec_col": "embedding",
                "seed": None,
                "max_cell_rows": None,
                "check_cells": None,
                "sample_rows": 256,
                "sweep_cells": None,
                "clear_max_cell_rows": False,
            },
            # rebuild legitimately re-pins the quantizer geometry and
            # the valve; audit takes a sampling seed + sample size;
            # flag_allowed FULLY overrides the implicit build set for
            # flags that are NOT build parameters at all
            "flag_actions": {
                "n_cells": ("rebuild",),
                "seed": ("rebuild", "audit"),
                "max_cell_rows": ("rebuild",),
                "check_cells": ("rebuild", "audit"),
            },
            "flag_allowed": {
                "sample_rows": ("audit",),
                "sweep_cells": ("audit",),
                "clear_max_cell_rows": ("rebuild",),
            },
            "refusal_suffix": ", or move a cell boundary",
            "vacuum": lambda store, grace: es_ops.embedding_store_vacuum(
                store, grace_seconds=grace
            ),
            "build": build,
            "batch_frame": lambda spark, args, meta: _read_table_cli(
                spark, args.input
            ).select(F.col(meta["id_col"]), F.col(meta["vec_col"])),
            "refresh": es_ops.embedding_store_refresh,
            "matches": es_ops.embedding_store_matches,
            "match_order": lambda meta: (meta["id_col"],),
            "compact": es_ops.embedding_store_compact,
            "load": es_ops.embedding_store_load,
            "export_key": "embeddings",
            "stats_view": stats_view,
            "extra": {"rebuild": rebuild, "audit": audit},
        },
    )


def cmd_skew(args: argparse.Namespace) -> None:
    """Pre-flight skew report for a planned groupBy/join key
    (``operators.counts.diagnose_skew``): exact heavy hitters, key
    distribution percentiles, and a salt-bucket recommendation."""
    import json as _json

    from big_data_hadoop_spark.operators.counts import diagnose_skew

    spark = _spark("skew")
    df = _read_table_cli(spark, args.input)
    top, summary = diagnose_skew(df, args.keys.split(","), n_top=args.top)
    for r in top.collect():
        print("\t".join(str(v) for v in r))
    print(_json.dumps(summary, sort_keys=True))


def cmd_analyze(args: argparse.Namespace) -> None:
    """ANALYZE-style table profile (``sources.io.analyze_table``):
    row/file/byte counts and per-column min/max/nulls/NDV in one pass,
    optional per-column heavy values — printed as one JSON line."""
    import json as _json

    from big_data_hadoop_spark.sources.io import analyze_table

    spark = _spark("analyze")
    out = analyze_table(
        spark,
        args.dataset,
        cols=args.cols.split(",") if args.cols else None,
        topk=args.topk,
        glob=args.glob,
    )
    print(_json.dumps(out, sort_keys=True))


def cmd_vacuum(args: argparse.Namespace) -> None:
    """Reclaim stage-and-swap crash residue of a mutable dataset
    (``sources.io.vacuum_table``): stranded ``.old`` generations are
    restored, post-publish ``.old`` leftovers and dead ``.staging``
    copies older than the grace window are deleted. No SparkSession —
    pure metadata walk under the dataset's writer claim."""
    import json as _json

    from big_data_hadoop_spark.sources.io import vacuum_table

    stats = vacuum_table(args.dataset, grace_seconds=args.grace_seconds)
    print(f"[vacuum] {args.dataset}: " + _json.dumps(stats, sort_keys=True))


def cmd_index(args: argparse.Namespace) -> None:
    """Bootstrap or refresh the persisted zone-map index for a parquet
    dataset (``layout.maintain_file_stats``): pass ``--cols`` once to
    bootstrap; later calls (or ``upsert``/``compact`` with
    ``--stats-path``) refresh incrementally — only new/rewritten files
    re-scan. Runs under the dataset's writer claim so a CLI refresh
    cannot race a verb's own index maintenance on the shared staging
    directory (review finding)."""
    from big_data_hadoop_spark.sources.io import (
        _VERB_LOCK_OPTS,
        table_write_lock,
    )
    from big_data_hadoop_spark.sources.layout import maintain_file_stats

    spark = _spark("index")
    with table_write_lock(args.dataset, **_VERB_LOCK_OPTS) as lock:
        maintain_file_stats(
            spark,
            args.dataset,
            args.stats_path,
            cols=args.cols.split(",") if args.cols else None,
            glob=args.glob,
            lock=lock,
            bloom_cols=(
                args.bloom_cols.split(",") if args.bloom_cols else None
            ),
            bloom_bits=args.bloom_bits,
            bloom_k=args.bloom_k,
        )
    n = _read_table_cli(spark, args.stats_path).count()
    print(f"[index] {args.stats_path}: {n} files indexed")


def cmd_train_quality(args: argparse.Namespace) -> None:
    """Train the hashed-linear quality head on a labeled parquet
    (columns: text + 0/1 label) and persist the model
    (``textstats.train_hashed_linear`` / ``hashed_linear_save``)."""
    from big_data_hadoop_spark.operators.textstats import (
        hashed_linear_save,
        train_hashed_linear,
    )

    spark = _spark("train-quality")
    df = _read_table_cli(spark, args.input)
    model = train_hashed_linear(
        df,
        label_col=args.label_col,
        text_col=args.text_col,
        dim=args.dim,
        epochs=args.epochs,
        lr=args.lr,
        l2=args.l2,
    )
    hashed_linear_save(model, args.model)
    print(
        f"[train-quality] dim={args.dim} epochs={args.epochs} "
        f"bias={model.bias:.6f} -> {args.model}"
    )


def cmd_score_quality(args: argparse.Namespace) -> None:
    """Score a corpus with a saved quality model — the UDF-free batch
    scoring pass (``textstats.hashed_linear_scores``)."""
    from big_data_hadoop_spark.operators.textstats import (
        hashed_linear_load,
        hashed_linear_scores,
    )

    spark = _spark("score-quality")
    model = hashed_linear_load(spark, args.model)
    docs = _read_table_cli(spark, args.input)
    scored = hashed_linear_scores(
        docs, model.weights, bias=model.bias,
        text_col=args.text_col, id_col=args.id_col,
    )
    scored.write.mode("overwrite").parquet(args.output)
    print(f"[score-quality] scored {args.input} -> {args.output}")


def cmd_compact(args: argparse.Namespace) -> None:
    """Small-file compaction of a parquet dataset in place."""
    from big_data_hadoop_spark.sources.io import compact_parquet

    spark = _spark("compact")
    before, after = compact_parquet(
        spark,
        args.path,
        target_file_bytes=args.target_mb * 1024 * 1024,
        stats_path=args.stats_path,
        stats_glob=args.stats_glob,
        sort_cols=(
            [c.strip() for c in args.sort_by.split(",") if c.strip()]
            if args.sort_by
            else None
        ),
        zorder_cols=(
            [c.strip() for c in args.zorder_by.split(",") if c.strip()]
            if args.zorder_by
            else None
        ),
    )
    print(f"[compact] {before} files -> {after}")


def cmd_diff(args: argparse.Namespace) -> None:
    """Snapshot diff between two corpus versions: status counts to
    stdout, optional per-document JSONL."""
    from big_data_hadoop_spark.pipeline import corpus_diff
    from big_data_hadoop_spark.sources.io import write_jsonl

    spark = _spark("diff")
    old = _read_docs(spark, args.old)
    new = _read_docs(spark, args.new)
    d = corpus_diff(old, new)
    if args.output:
        write_jsonl(d, args.output)
        # status counts from the written result: no second derivation
        d = spark.read.json(args.output)
    for r in d.groupBy("status").count().orderBy("status").collect():
        print(f"[diff] {r['status']}: {r['count']}")
    _warn_dropped_lines()


def cmd_probe(args: argparse.Namespace) -> None:
    from big_data_hadoop_spark.probes import QUERIES

    if args.name not in QUERIES:
        sys.exit(f"unknown probe {args.name!r}; choose from: {', '.join(QUERIES)}")
    spark = _spark(f"probe-{args.name}")
    df = QUERIES[args.name](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.rows, truncate=False)


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="big_data_hadoop_spark")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp, m_arg=False):
        sp.add_argument("input")
        sp.add_argument("output")
        sp.add_argument(
            "--lowercase", action="store_true", help="fold case before classifying"
        )
        if m_arg:
            sp.add_argument("-m", type=int, default=1, help="co-occurrence window")

    common(sub.add_parser("wordcount", help="token counts, category-partitioned"))
    common(sub.add_parser("wordpairs", help="co-occurrence pairs"), m_arg=True)
    common(sub.add_parser("wordstripes", help="co-occurrence stripes"), m_arg=True)

    tk = sub.add_parser("topk", help="top-K words and numbers (lowercased)")
    tk.add_argument("input")
    tk.add_argument("output", help="words output dir")
    tk.add_argument("output2", nargs="?", help="numbers output dir")
    tk.add_argument("-k", type=int, default=1000)
    tk.set_defaults(words_category="word")

    pr = sub.add_parser("probe", help="run a declared probe")
    pr.add_argument("name")
    pr.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pr.add_argument("--rows", type=int, default=20)
    pr.add_argument("--explain", action="store_true")

    cu = sub.add_parser(
        "curate", help="training-data curation funnel -> JSONL"
    )
    cu.add_argument("input", help="parquet table or JSONL dir of (doc_id, text)")
    cu.add_argument("output", help="JSONL output dir")
    cu.add_argument("--min-tokens", type=int, default=5)
    cu.add_argument("--min-alpha-ratio", type=float, default=0.3)
    cu.add_argument("--langs", default="en", help="comma-separated language codes")
    cu.add_argument(
        "--neardup-threshold", type=float, default=None,
        help="enable MinHash-LSH near-dedup at this Jaccard threshold",
    )
    cu.add_argument(
        "--neardup-mode", choices=("pairwise", "cluster"),
        default="pairwise",
        help="pair resolution: drop id_b per pair, or keep one doc per "
        "connected component",
    )
    cu.add_argument(
        "--max-dup-line-frac", type=float, default=None,
        help="Gopher-style repetition gate: drop docs whose duplicate-"
        "line fraction exceeds this",
    )
    cu.add_argument(
        "--strip-dup-spans", type=int, default=None, metavar="K",
        help="excise corpus-wide duplicated character spans (window "
        "length K) before gating",
    )

    ch = sub.add_parser("chunk", help="token-window chunking -> JSONL")
    ch.add_argument("input")
    ch.add_argument("output")
    ch.add_argument("--max-tokens", type=int, default=512)
    ch.add_argument("--overlap", type=int, default=0)

    sa = sub.add_parser(
        "sample", help="deterministic token-budget sample -> JSONL"
    )
    sa.add_argument("input")
    sa.add_argument("output")
    sa.add_argument("--budget", type=int, required=True, help="token budget")

    pk = sub.add_parser(
        "pack", help="materialize context-window training packs -> JSONL"
    )
    pk.add_argument("input")
    pk.add_argument("output")
    pk.add_argument(
        "--context-tokens", type=int, default=2048,
        help="pack size in whitespace tokens",
    )

    dc = sub.add_parser(
        "decontaminate",
        help="drop docs sharing n-grams with a benchmark set -> JSONL",
    )
    dc.add_argument("input", help="training docs (parquet or JSONL)")
    dc.add_argument("benchmarks", help="benchmark docs (parquet or JSONL)")
    dc.add_argument("output")
    dc.add_argument("--ngram", type=int, default=13)

    pf = sub.add_parser("profile", help="corpus health profile -> stdout")
    pf.add_argument("input")
    pf.add_argument("--output", default=None, help="also write JSONL here")
    pf.add_argument(
        "--group-cols", default="",
        help="comma-separated grouping columns (parquet inputs; empty = "
        "one global row)",
    )

    sl = sub.add_parser(
        "split",
        help="leakage-safe train/val/test assignment -> JSONL "
        "partitioned by split",
    )
    sl.add_argument("input")
    sl.add_argument("output")
    sl.add_argument(
        "--weights", default="train=0.98,val=0.01,test=0.01",
        help="comma-separated name=weight entries",
    )
    sl.add_argument(
        "--neardup-threshold", type=float, default=None,
        help="group near-duplicate clusters atomically at this MinHash "
        "Jaccard threshold (omit for plain hash splitting)",
    )
    sl.add_argument("--seed", type=int, default=0)

    se = sub.add_parser("search", help="ad-hoc BM25 retrieval over a corpus")
    se.add_argument("input")
    se.add_argument(
        "--query", action="append", required=True,
        help="query text (repeatable)",
    )
    se.add_argument("--topk", type=int, default=10)
    se.add_argument(
        "--max-df-frac", type=float, default=None,
        help="drop terms present in more than this fraction of docs",
    )

    cl = sub.add_parser(
        "clean", help="HTML strip + normalize + line dedup -> JSONL"
    )
    cl.add_argument("input")
    cl.add_argument("output")
    cl.add_argument("--strip-html", action="store_true")
    cl.add_argument("--form", default="NFKC")
    cl.add_argument(
        "--max-line-df", type=int, default=0,
        help="drop lines in more than this many docs (0 = keep all)",
    )

    co = sub.add_parser("compact", help="compact a parquet dataset's files")
    co.add_argument("path")
    co.add_argument("--target-mb", type=int, default=128)
    co.add_argument("--stats-path", default=None, dest="stats_path")
    co.add_argument("--stats-glob", default="*.parquet", dest="stats_glob")
    co.add_argument("--sort-by", default=None, dest="sort_by")
    co.add_argument("--zorder-by", default=None, dest="zorder_by")

    di = sub.add_parser(
        "diff", help="added/removed/changed/unchanged between two corpora"
    )
    di.add_argument("old")
    di.add_argument("new")
    di.add_argument("--output", default=None, help="optional JSONL output")

    ig = sub.add_parser(
        "ingest", help="manifest-tracked incremental append into parquet"
    )
    ig.add_argument("input")
    ig.add_argument("output")
    ig.add_argument("--manifest", required=True)
    ig.add_argument("--glob", default="*.parquet")
    ig.add_argument("--format", default="parquet")

    up = sub.add_parser("upsert", help="keyed MERGE of updates into a dataset")
    up.add_argument("updates")
    up.add_argument("dataset")
    up.add_argument("--keys", required=True, help="comma-separated key columns")
    up.add_argument("--partition-by", default=None)
    up.add_argument("--stats-path", default=None, dest="stats_path")
    up.add_argument("--stats-glob", default="*.parquet", dest="stats_glob")

    tq = sub.add_parser(
        "train-quality", help="train the hashed-linear quality head"
    )
    tq.add_argument("input")
    tq.add_argument("model")
    tq.add_argument("--label-col", default="label")
    tq.add_argument("--text-col", default="text")
    tq.add_argument("--dim", type=int, default=1 << 12)
    tq.add_argument("--epochs", type=int, default=30)
    tq.add_argument("--lr", type=float, default=1.0)
    tq.add_argument("--l2", type=float, default=0.0)

    sh = sub.add_parser(
        "shard", help="seeded deterministic shuffle-shard export"
    )
    sh.add_argument("input")
    sh.add_argument("output")
    sh.add_argument("--n-shards", type=int, required=True)
    sh.add_argument("--seed", type=int, default=0)
    sh.add_argument("--id-col", default="doc_id")
    sh.add_argument("--format", default="parquet", choices=["parquet", "json"])

    an = sub.add_parser(
        "analyze", help="table profile: rows/files/bytes + column stats"
    )
    an.add_argument("dataset")
    an.add_argument("--cols", default=None, help="comma-separated (default: all atomic)")
    an.add_argument("--topk", type=int, default=0)
    an.add_argument("--glob", default="*.parquet")

    vc = sub.add_parser(
        "vacuum", help="reclaim a mutable dataset's crash residue"
    )
    vc.add_argument("dataset")
    vc.add_argument("--grace-seconds", type=float, default=86400.0)

    ix = sub.add_parser(
        "index", help="bootstrap/refresh a dataset's zone-map index"
    )
    ix.add_argument("dataset")
    ix.add_argument("stats_path")
    ix.add_argument("--cols", default=None, help="bootstrap columns (comma-sep)")
    ix.add_argument("--glob", default="*.parquet")
    ix.add_argument(
        "--bloom-cols",
        default=None,
        help="bootstrap bloom-sidecar columns (comma-sep, subset of --cols)",
    )
    ix.add_argument("--bloom-bits", type=int, default=8192)
    ix.add_argument("--bloom-k", type=int, default=6)

    sk = sub.add_parser(
        "skew", help="exact skew report for a groupBy/join key"
    )
    sk.add_argument("input")
    sk.add_argument("--keys", required=True, help="comma-separated key columns")
    sk.add_argument("--top", type=int, default=20)

    ng = sub.add_parser(
        "neardup-graph",
        help="maintain the persisted near-dup pair graph store",
    )
    ng.add_argument(
        "action",
        choices=[
            "build", "refresh", "matches", "compact", "vacuum",
            "export", "stats",
        ],
    )
    ng.add_argument("store")
    ng.add_argument(
        "--input", default=None, help="documents parquet (build/refresh)"
    )
    ng.add_argument(
        "--output", default=None, help="edge parquet destination (export)"
    )
    ng.add_argument("--text-col", default="text")
    ng.add_argument("--id-col", default="doc_id")
    ng.add_argument("--ngram", type=int, default=3)
    ng.add_argument("--num-perm", type=int, default=128)
    ng.add_argument("--bands", type=int, default=32)
    ng.add_argument("--threshold", type=float, default=0.9)
    ng.add_argument("--grace-seconds", type=float, default=86400.0)

    fs = sub.add_parser(
        "fingerprint-store",
        help="maintain a persisted perceptual fingerprint store",
    )
    fs.add_argument(
        "action",
        choices=[
            "build", "refresh", "matches", "compact", "vacuum",
            "export", "stats",
        ],
    )
    fs.add_argument("store")
    fs.add_argument(
        "--input", default=None,
        help="media/documents/fingerprint parquet (build/refresh)",
    )
    fs.add_argument(
        "--output", default=None,
        help="accepted-fingerprints destination (export)",
    )
    fs.add_argument(
        "--tier", default=None, choices=list(_FP_TIERS),
        help="fingerprint family (build; pinned in meta thereafter)",
    )
    fs.add_argument(
        "--max-hamming", type=int, default=3,
        help="dedup radius in bits (build; 0..3). The video tier "
        "REQUIRES 0: its clip fingerprint is an avalanche digest, so "
        "a nonzero Hamming radius is meaningless — near-dup video "
        "matching uses video_neardup_pairs/video_matches_against",
    )
    fs.add_argument("--text-col", default="text")
    fs.add_argument("--id-col", default="doc_id")
    fs.add_argument("--fp-col", default="fp")
    fs.add_argument("--grace-seconds", type=float, default=86400.0)

    fhp = sub.add_parser(
        "framehash-store",
        help="maintain a persisted video frame-hash store "
        "(near-dup clip dedup; history = n_frames hashes per clip)",
    )
    fhp.add_argument(
        "action",
        choices=[
            "build", "refresh", "matches", "compact", "vacuum",
            "export", "stats",
        ],
    )
    fhp.add_argument("store")
    fhp.add_argument(
        "--input", default=None,
        help="media/frame-hash parquet (build/refresh)",
    )
    fhp.add_argument(
        "--output", default=None,
        help="accepted frame-hash destination (export)",
    )
    fhp.add_argument(
        "--tier", default=None, choices=list(_FH_TIERS),
        help="input shape: video decodes media payloads; raw passes a "
        "precomputed (id, frame_no, dhash) table (build; pinned)",
    )
    fhp.add_argument(
        "--max-hamming", type=int, default=1,
        help="per-frame Hamming radius (build; 0..3)",
    )
    fhp.add_argument(
        "--min-matching-frames", type=int, default=2,
        help="distinct frame pairs within the radius that make two "
        "clips duplicates (build)",
    )
    fhp.add_argument(
        "--match-constant-frames", action="store_true",
        help="include dHash-0 (blank) frames in matching — default "
        "excludes them, the standard blank-frame filter (build)",
    )
    fhp.add_argument(
        "--n-frames", type=int, default=8,
        help="sampled frames per clip for the video tier (build; "
        "pinned in meta and reused on refresh)",
    )
    fhp.add_argument(
        "--max-frame-df", type=int, default=None,
        help="boilerplate-frame valve: exclude frame-hash values "
        "appearing in more than this many clips from matching "
        "(intro/outro cards manufacture quadratic pairs; build)",
    )
    fhp.add_argument("--id-col", default="media_id")
    fhp.add_argument("--grace-seconds", type=float, default=86400.0)

    es = sub.add_parser(
        "embedding-store",
        help="maintain a persisted embedding store "
        "(incremental semantic dedup; centroids pinned at build)",
    )
    es.add_argument(
        "action",
        choices=[
            "build", "refresh", "matches", "compact", "vacuum",
            "export", "stats", "rebuild", "audit",
        ],
    )
    es.add_argument("store")
    es.add_argument(
        "--input", default=None,
        help="(id, embedding) parquet (build/refresh/matches/audit)",
    )
    es.add_argument(
        "--output", default=None,
        help="accepted-embeddings destination (export) / missed-rows "
        "destination (audit)",
    )
    es.add_argument(
        "--eps", type=float, default=0.95,
        help="same-cell cosine duplicate threshold (build)",
    )
    es.add_argument(
        "--n-cells", type=int, default=None,
        help="IVF cells; hot cells are the skew lever (build, "
        "default 16; rebuild, default = pinned value)",
    )
    es.add_argument(
        "--dim", type=int, default=None,
        help="fixed embedding width (build; required)",
    )
    es.add_argument("--id-col", default="vec_id")
    es.add_argument("--vec-col", default="embedding")
    es.add_argument(
        "--seed", type=int, default=None,
        help="KMeans seed (build, default 42; rebuild, default = "
        "pinned value) / sampling seed (audit, default 0)",
    )
    es.add_argument(
        "--max-cell-rows", type=int, default=None,
        help="hot-cell valve: refuse any verb that would leave one "
        "cell holding more accepted rows than this (build/rebuild; "
        "pinned in meta, default off)",
    )
    es.add_argument(
        "--clear-max-cell-rows", action="store_true",
        help="rebuild only: remove the pinned hot-cell valve (the "
        "library's max_cell_rows=None; mutually exclusive with "
        "--max-cell-rows)",
    )
    es.add_argument(
        "--check-cells", type=int, default=None,
        help="recall lever: every judged row checks its p nearest "
        "cells instead of only its home cell (build, default 1; "
        "rebuild, default = pinned value; audit, the HYPOTHETICAL "
        "width to measure before paying the rebuild)",
    )
    es.add_argument(
        "--sample-rows", type=int, default=256,
        help="audit sample size (fixed cost at every corpus scale)",
    )
    es.add_argument(
        "--sweep-cells", type=str, default=None,
        help="audit only: comma-separated check_cells widths (e.g. "
        "'1,2,4') measured in ONE pass — exact truth computed once, "
        "one widened store verdict per width; the pre-rebuild tuning "
        "loop",
    )
    es.add_argument("--grace-seconds", type=float, default=86400.0)

    sq = sub.add_parser(
        "score-quality", help="score a corpus with a saved quality model"
    )
    sq.add_argument("input")
    sq.add_argument("model")
    sq.add_argument("output")
    sq.add_argument("--text-col", default="text")
    sq.add_argument("--id-col", default="doc_id")

    args = p.parse_args(argv)
    t0 = time.monotonic()
    {
        "wordcount": cmd_wordcount,
        "wordpairs": cmd_wordpairs,
        "wordstripes": cmd_wordstripes,
        "topk": cmd_topk,
        "probe": cmd_probe,
        "curate": cmd_curate,
        "chunk": cmd_chunk,
        "sample": cmd_sample,
        "pack": cmd_pack,
        "decontaminate": cmd_decontaminate,
        "profile": cmd_profile,
        "split": cmd_split,
        "search": cmd_search,
        "ingest": cmd_ingest,
        "upsert": cmd_upsert,
        "shard": cmd_shard,
        "skew": cmd_skew,
        "index": cmd_index,
        "vacuum": cmd_vacuum,
        "analyze": cmd_analyze,
        "train-quality": cmd_train_quality,
        "score-quality": cmd_score_quality,
        "neardup-graph": cmd_neardup_graph,
        "fingerprint-store": cmd_fingerprint_store,
        "framehash-store": cmd_framehash_store,
        "embedding-store": cmd_embedding_store,
        "clean": cmd_clean,
        "compact": cmd_compact,
        "diff": cmd_diff,
    }[args.command](args)
    print(f"[{args.command}] completed in {time.monotonic() - t0:.2f}s")


if __name__ == "__main__":
    main()
