"""JSONL source/sink — the LLM-corpus interchange format: round-trip
fidelity, schema-pinned reads (no inference scan), and PERMISSIVE
corrupt-line capture."""

from __future__ import annotations

from big_data_hadoop_spark.sources.io import load_table, read_jsonl, write_jsonl
from tests.conftest import SF_SMOKE


def test_jsonl_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, schema="doc_id long, text string").cache()
    assert back.filter("_corrupt_record IS NOT NULL").count() == 0
    got = {(r.doc_id, r.text) for r in back.select("doc_id", "text").collect()}
    exp = {(r.doc_id, r.text) for r in docs.collect()}
    assert got == exp


def test_jsonl_corrupt_lines_are_captured_not_fatal(spark, tmp_path):
    src = tmp_path / "dirty"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok"}\n'
    )
    df = read_jsonl(spark, str(src), schema="doc_id long, text string").cache()
    good = df.filter("_corrupt_record IS NULL")
    bad = df.filter("_corrupt_record IS NOT NULL")
    assert {r.doc_id for r in good.collect()} == {1, 2}
    assert bad.count() == 1
    assert "not json" in bad.collect()[0]._corrupt_record


def test_read_text_lines_multi_split_file(spark, tmp_path):
    """VERDICT r3 #7: a text file larger than maxPartitionBytes is read
    as MULTIPLE scan partitions, and line_no must still be the exact
    0-based file order (splits tie on size under Spark's stable
    length-descending split sort, so partition index tracks byte
    offset)."""
    from big_data_hadoop_spark.sources.io import read_text_lines

    p = tmp_path / "big.txt"
    with open(p, "w") as f:
        for i in range(30_000):
            f.write(f"line {i} pad pad pad pad\n")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
    try:
        assert spark.read.text(str(p)).rdd.getNumPartitions() > 1
        rows = read_text_lines(spark, str(p)).orderBy("line_no").collect()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert len(rows) == 30_000
    assert len({r.doc_id for r in rows}) == 1
    assert all(
        r.text == f"line {i} pad pad pad pad" for i, r in enumerate(rows)
    )


def test_write_jsonl_partitioned_prunes(spark, tmp_path):
    """Partitioned JSONL layout: hive dirs exist and a partition filter
    reads only its directory (partition pruning, not data filtering)."""
    from big_data_hadoop_spark.sources.io import write_jsonl

    df = spark.createDataFrame(
        [(1, "hallo", "de"), (2, "hello", "en"), (3, "hi", "en")],
        "doc_id long, text string, lang string",
    )
    out = str(tmp_path / "part_jsonl")
    write_jsonl(df, out, partition_by=("lang",))
    import os

    assert sorted(
        d for d in os.listdir(out) if d.startswith("lang=")
    ) == ["lang=de", "lang=en"]
    back = spark.read.json(out)
    en = back.filter("lang = 'en'")
    assert en.count() == 2
    from big_data_hadoop_spark.plans.audit import formatted_plan

    assert "PartitionFilters: [isnotnull(lang" in formatted_plan(en)


def test_csv_roundtrip_and_corrupt_capture(spark, tmp_path):
    from big_data_hadoop_spark.sources.io import read_csv, write_csv

    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", -2.0), (3, "with,comma", 0.0)],
        "id long, name string, score double",
    )
    out = str(tmp_path / "csv_rt")
    write_csv(df, out)
    back = read_csv(
        spark, out, schema="id long, name string, score double"
    ).cache()
    assert back.filter("_corrupt_record IS NOT NULL").count() == 0
    got = {(r.id, r.name, r.score) for r in back.select("id", "name", "score").collect()}
    assert got == {(1, "alpha", 1.5), (2, "beta", -2.0), (3, "with,comma", 0.0)}
    # malformed rows land in _corrupt_record, not in a job failure
    src = tmp_path / "dirty_csv"
    src.mkdir()
    (src / "a.csv").write_text("id,name,score\n1,ok,2.5\nnot-a-long,x,y\n")
    dirty = read_csv(
        spark, str(src), schema="id long, name string, score double"
    ).cache()
    assert dirty.filter("_corrupt_record IS NULL").count() == 1
    assert dirty.filter("_corrupt_record IS NOT NULL").count() == 1


def test_orc_roundtrip_partitioned_and_pushdown(spark, tmp_path):
    from big_data_hadoop_spark.plans.audit import formatted_plan
    from big_data_hadoop_spark.sources.io import load_table, read_orc, write_orc

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text", "lang"
    )
    out = str(tmp_path / "orc_rt")
    write_orc(docs, out, partition_by=("lang",))
    back = read_orc(spark, out)
    assert back.count() == docs.count()
    got = {(r.doc_id, r.text) for r in back.select("doc_id", "text").collect()}
    exp = {(r.doc_id, r.text) for r in docs.collect()}
    assert got == exp
    # partition pruning + predicate pushdown both reach the ORC scan
    q = back.filter((back.lang == "en") & (back.doc_id > 10)).select("doc_id")
    plan = formatted_plan(q)
    assert "PartitionFilters: [isnotnull(lang" in plan
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,10)]" in plan


def test_exact_dedup_against_matches_duckdb(spark, duck, tmp_path):
    """Incremental dedup: new batch anti-joined against stored digests,
    then keep-first within the batch — equal to the DuckDB two-stage
    form; history representation round-trips via content_digests."""
    from pyspark.sql import functions as F

    from big_data_hadoop_spark.operators.dedup import (
        content_digests,
        exact_dedup_against,
    )

    old = spark.createDataFrame(
        [(1, "seen before"), (2, "also  SEEN before")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "Seen   before"),       # dup of history (normalized)
            (11, "brand new"),
            (12, "brand  NEW"),          # in-batch dup of 11
            (13, "another fresh one"),
        ],
        "doc_id long, text string",
    )
    seen = content_digests(old)
    got = {
        r.doc_id for r in exact_dedup_against(new, seen).collect()
    }
    assert got == {11, 13}
    # oracle: same semantics in SQL
    norm = "md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')))"
    con = duck
    con.register("old_df", old.toPandas())
    con.register("new_df", new.toPandas())
    oracle = f"""
WITH seen AS (SELECT DISTINCT {norm} AS h FROM old_df),
cand AS (SELECT doc_id, text, {norm} AS h FROM new_df
         WHERE {norm} NOT IN (SELECT h FROM seen)),
k AS (SELECT h, MIN(doc_id) AS keep_id FROM cand GROUP BY h)
SELECT c.doc_id FROM cand c JOIN k ON c.h = k.h AND c.doc_id = k.keep_id
ORDER BY c.doc_id
"""
    assert [r[0] for r in con.execute(oracle).fetchall()] == sorted(got)


def test_tsv_sink_writes_raw_bytes(spark, tmp_path):
    """TextOutputFormat parity is BYTE-level (review finding: the CSV
    writer quote-wrapped any value containing the separator or a quote
    — univocity even falls back to NUL-byte quoting with quoting
    'disabled'). Values with embedded quotes must come out raw."""
    from pathlib import Path

    from big_data_hadoop_spark.sources.io import write_tsv

    df = spark.createDataFrame(
        [('say "hi"', 3), ("plain", 1), (None, 2)], "k string, n int"
    )
    out = str(tmp_path / "raw_tsv")
    write_tsv(df, out)
    lines = sorted(
        line
        for p in Path(out).glob("part-*.txt")
        for line in p.read_text().splitlines()
    )
    assert lines == ["\t2", "plain\t1", 'say "hi"\t3']


def test_incremental_read_picks_up_only_new_files(spark, tmp_path):
    """Two-batch ingest: run 1 reads batch 1 and commits; run 2 sees only
    batch 2; run 3 sees nothing. An uncommitted run retries."""
    from big_data_hadoop_spark.sources.io import read_incremental

    src = tmp_path / "inc_src"
    src.mkdir()
    manifest = str(tmp_path / "inc_manifest")

    def add_file(name, ids):
        staged = tmp_path / f"_stage_{name}"
        spark.createDataFrame(
            [(i,) for i in ids], "id long"
        ).coalesce(1).write.mode("overwrite").parquet(str(staged))
        import shutil

        shutil.copy(
            next(staged.glob("part-*.parquet")), src / f"{name}.parquet"
        )

    add_file("b1", [1, 2, 3])

    df, commit = read_incremental(spark, str(src), manifest)
    assert {r.id for r in df.collect()} == {1, 2, 3}

    # failure before commit: the same files come back on retry
    df_retry, commit_retry = read_incremental(spark, str(src), manifest)
    assert {r.id for r in df_retry.collect()} == {1, 2, 3}
    commit_retry()

    add_file("b2", [10, 11])
    df2, commit2 = read_incremental(spark, str(src), manifest)
    assert {r.id for r in df2.collect()} == {10, 11}
    commit2()

    df3, _ = read_incremental(spark, str(src), manifest)
    assert df3 is None


def test_incremental_commit_never_collects_manifest(spark, tmp_path):
    """The commit path must build the next manifest generation
    distributedly: NO DataFrame.collect() of the file history may run
    inside commit() (review finding: the old commit rebuilt the entire
    manifest — O(all files ever) — as a Python list on the driver on
    EVERY ingest batch; at 100 TB file counts that is a multi-GB
    driver materialization per commit). The only driver-side list is
    the O(new files) one the read itself needs, collected BEFORE
    commit."""
    import shutil

    from pyspark.sql import DataFrame as _DF

    from big_data_hadoop_spark.sources.io import read_incremental

    src = tmp_path / "inc_nc_src"
    src.mkdir()
    manifest = str(tmp_path / "inc_nc_manifest")

    def add_file(name, ids):
        staged = tmp_path / f"_stage_nc_{name}"
        spark.createDataFrame(
            [(i,) for i in ids], "id long"
        ).coalesce(1).write.mode("overwrite").parquet(str(staged))
        shutil.copy(
            next(staged.glob("part-*.parquet")), src / f"{name}.parquet"
        )

    add_file("b1", [1, 2])
    df, commit = read_incremental(spark, str(src), manifest)
    assert df.count() == 2

    real_collect = _DF.collect

    def forbidden(self):
        raise AssertionError(
            "commit() collected a DataFrame to the driver"
        )

    _DF.collect = forbidden
    try:
        commit()  # second-gen path below exercises the union branch
        add_file("b2", [10])
        _DF.collect = real_collect
        df2, commit2 = read_incremental(spark, str(src), manifest)
        assert df2.count() == 1
        _DF.collect = forbidden
        commit2()
    finally:
        _DF.collect = real_collect

    df3, _ = read_incremental(spark, str(src), manifest)
    assert df3 is None  # both generations committed correctly


def test_incremental_read_reprocesses_changed_length(spark, tmp_path):
    """A re-uploaded file with a different size is new again."""
    from big_data_hadoop_spark.sources.io import read_incremental

    src = tmp_path / "inc2_src"
    src.mkdir()
    manifest = str(tmp_path / "inc2_manifest")

    def write_named(ids):
        staged = tmp_path / "_stage_inc2"
        spark.createDataFrame(
            [(i,) for i in ids], "id long"
        ).coalesce(1).write.mode("overwrite").parquet(str(staged))
        import shutil

        shutil.copy(next(staged.glob("part-*.parquet")), src / "a.parquet")

    write_named([1])
    df, commit = read_incremental(spark, str(src), manifest)
    assert {r.id for r in df.collect()} == {1}
    commit()

    write_named([1, 2, 3, 4, 5, 6, 7, 8])  # same path, bigger file
    df2, commit2 = read_incremental(spark, str(src), manifest)
    assert df2 is not None and df2.count() == 8
    commit2()
    assert read_incremental(spark, str(src), manifest)[0] is None


def test_list_data_files_prunes_content(spark, tmp_path):
    """The listing plan must NOT materialize file bytes: the binaryFile
    scan's ReadSchema carries only metadata columns."""
    from big_data_hadoop_spark.sources.io import list_data_files

    src = tmp_path / "ls_src"
    src.mkdir()
    spark.createDataFrame([(1,)], "id long").write.mode(
        "overwrite"
    ).parquet(str(src / "t"))
    df = list_data_files(spark, str(src / "t"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan
    files = df.collect()
    assert files and all(r.length > 0 for r in files)


def test_incremental_read_reprocesses_same_length_overwrite(spark, tmp_path):
    """An in-place overwrite with IDENTICAL byte length is still new:
    the manifest keys on (path, length, mtime) (review finding)."""
    import shutil
    import time as _time

    from big_data_hadoop_spark.sources.io import read_incremental

    src = tmp_path / "inc3_src"
    src.mkdir()
    manifest = str(tmp_path / "inc3_manifest")

    def write_named(ids, stage):
        staged = tmp_path / stage
        spark.createDataFrame(
            [(i,) for i in ids], "id long"
        ).coalesce(1).write.mode("overwrite").parquet(str(staged))
        shutil.copy(next(staged.glob("part-*.parquet")), src / "a.parquet")

    write_named([1], "_s_a")
    df, commit = read_incremental(spark, str(src), manifest)
    assert {r.id for r in df.collect()} == {1}
    commit()

    _time.sleep(1.1)  # ensure a distinct mtime second
    write_named([2], "_s_b")  # same schema/row count -> same byte length
    import os

    df2, commit2 = read_incremental(spark, str(src), manifest)
    assert df2 is not None, "same-length overwrite must be reprocessed"
    assert {r.id for r in df2.collect()} == {2}
    commit2()
    assert read_incremental(spark, str(src), manifest)[0] is None


def test_incremental_legacy_manifest_upgrades_cleanly(spark, tmp_path):
    """A 2-column (path, length) manifest from an earlier version must
    keep suppressing its files (no mass re-ingest), and the first
    commit must rewrite the directory to ONE schema (review finding:
    appending the new schema made Spark's schema pick arbitrary)."""
    import shutil

    from big_data_hadoop_spark.sources.io import (
        list_data_files,
        read_incremental,
    )

    src = tmp_path / "leg_src"
    src.mkdir()
    manifest = str(tmp_path / "leg_manifest")

    def add_file(name, ids):
        staged = tmp_path / f"_ls_{name}"
        spark.createDataFrame(
            [(i,) for i in ids], "id long"
        ).coalesce(1).write.mode("overwrite").parquet(str(staged))
        shutil.copy(
            next(staged.glob("part-*.parquet")), src / f"{name}.parquet"
        )

    add_file("a", [1, 2])
    # legacy manifest: the old 2-column schema, written directly
    list_data_files(spark, str(src)).select("path", "length").write.parquet(
        manifest
    )

    # run 1 after upgrade: the legacy-tracked file must NOT come back
    df, commit = read_incremental(spark, str(src), manifest)
    assert df is None

    # new file arrives; only it is ingested; commit rewrites to 3 cols
    add_file("b", [3])
    df2, commit2 = read_incremental(spark, str(src), manifest)
    assert {r.id for r in df2.collect()} == {3}
    commit2()
    man = spark.read.parquet(manifest)
    assert set(man.columns) == {"path", "length", "mtime"}
    assert man.count() == 2  # both files, one schema
    # and the upgraded manifest still suppresses everything
    assert read_incremental(spark, str(src), manifest)[0] is None


def test_overwrite_partitions_touches_only_written_partitions(spark, tmp_path):
    """Dynamic overwrite rewrites only the partitions present in the
    frame; untouched partitions survive (static mode would wipe them)."""
    from pyspark.sql import functions as F

    from big_data_hadoop_spark.sources.io import overwrite_partitions

    path = str(tmp_path / "dyn")
    base = spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-01", 2), ("2024-01-02", 3)],
        "day string, v long",
    )
    overwrite_partitions(base, path, ["day"])
    # backfill day 1 with corrected data only
    fix = spark.createDataFrame([("2024-01-01", 99)], "day string, v long")
    overwrite_partitions(fix, path, ["day"])
    # hive partition values type-infer back as dates; compare as str
    got = {(str(r.day), r.v) for r in spark.read.parquet(path).collect()}
    assert got == {("2024-01-01", 99), ("2024-01-02", 3)}


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from big_data_hadoop_spark.sources.io import compact_parquet

    path = str(tmp_path / "frag")
    df = spark.range(1000).selectExpr("id", "id * 2 AS v")
    df.repartition(40).write.parquet(path)  # 40 tiny files
    before, after = compact_parquet(spark, path, target_file_bytes=10**9)
    assert before == 40 and after == 1
    got = {(r.id, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(i, i * 2) for i in range(1000)}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        compact_parquet(spark, path, target_file_bytes=0)


def test_read_parquet_evolving_merges_schemas(spark, tmp_path):
    """Files written before and after a column addition read as one
    unified schema with NULLs for the missing column."""
    from big_data_hadoop_spark.sources.io import read_parquet_evolving

    path = tmp_path / "evo"
    path.mkdir()
    spark.createDataFrame([(1,)], "id long").coalesce(1).write.parquet(
        str(path / "gen1")
    )
    spark.createDataFrame(
        [(2, "en")], "id long, lang string"
    ).coalesce(1).write.parquet(str(path / "gen2"))
    import shutil

    for gen in ("gen1", "gen2"):
        for p in (path / gen).glob("part-*.parquet"):
            shutil.copy(p, path / f"{gen}.parquet")
        shutil.rmtree(path / gen)
    df = read_parquet_evolving(spark, str(path))
    assert set(df.columns) == {"id", "lang"}
    got = {(r.id, r.lang) for r in df.collect()}
    assert got == {(1, None), (2, "en")}


def test_compact_preserves_hive_partitions(spark, tmp_path):
    """Compacting a partitioned dataset must keep the layout (review
    finding: a flat rewrite killed pruning and corrupted later dynamic
    backfills)."""
    import os

    from big_data_hadoop_spark.sources.io import (
        compact_parquet,
        overwrite_partitions,
    )

    path = str(tmp_path / "pc")
    df = spark.createDataFrame(
        [("a", i) for i in range(50)] + [("b", i) for i in range(50)],
        "k string, v long",
    ).repartition(10)
    df.write.partitionBy("k").parquet(path)
    before, after = compact_parquet(spark, path, target_file_bytes=10**9)
    assert sorted(os.listdir(path)) >= ["k=a", "k=b"] or {
        "k=a", "k=b"
    } <= set(os.listdir(path))
    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert len(got) == 100
    # a dynamic backfill after compaction stays correct
    overwrite_partitions(
        spark.createDataFrame([("a", 999)], "k string, v long"), path, ["k"]
    )
    rows = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert ("a", 999) in rows and len([r for r in rows if r[0] == "a"]) == 1
    assert len([r for r in rows if r[0] == "b"]) == 50


def test_compact_noop_guards(spark, tmp_path):
    from big_data_hadoop_spark.sources.io import compact_parquet

    # empty dataset: clean no-op, not an AnalysisException
    empty = tmp_path / "empty"
    empty.mkdir()
    assert compact_parquet(spark, str(empty)) == (0, 0)
    # already compact: no rewrite (file count unchanged, tiny target)
    path = str(tmp_path / "one")
    spark.range(10).coalesce(1).write.parquet(path)
    import glob as _g

    parts_before = sorted(_g.glob(path + "/part-*.parquet"))
    assert compact_parquet(spark, path, target_file_bytes=1) == (1, 1)
    assert sorted(_g.glob(path + "/part-*.parquet")) == parts_before


def test_incremental_legacy_null_mtime_backfilled_on_commit(spark, tmp_path):
    """After the upgrade commit, legacy rows carry the real mtime, so a
    later same-length overwrite of a pre-upgrade file IS re-ingested
    (review finding: NULL persisted forever and permanently re-opened
    the hazard)."""
    import shutil
    import time as _time

    from big_data_hadoop_spark.sources.io import (
        list_data_files,
        read_incremental,
    )

    src = tmp_path / "lb_src"
    src.mkdir()
    manifest = str(tmp_path / "lb_manifest")

    def write_named(ids, stage):
        staged = tmp_path / stage
        spark.createDataFrame(
            [(i,) for i in ids], "id long"
        ).coalesce(1).write.mode("overwrite").parquet(str(staged))
        shutil.copy(next(staged.glob("part-*.parquet")), src / "a.parquet")

    write_named([1], "_lb1")
    list_data_files(spark, str(src)).select("path", "length").write.parquet(
        manifest
    )  # legacy manifest tracks the file without mtime

    # a new file triggers the upgrade commit
    staged2 = tmp_path / "_lb2"
    spark.createDataFrame([(9,)], "id long").coalesce(1).write.parquet(
        str(staged2)
    )
    shutil.copy(next(staged2.glob("part-*.parquet")), src / "b.parquet")
    df, commit = read_incremental(spark, str(src), manifest)
    assert {r.id for r in df.collect()} == {9}
    commit()
    man = spark.read.parquet(manifest)
    assert man.filter("mtime IS NULL").count() == 0  # backfilled

    # same-length in-place overwrite of the PRE-UPGRADE file: reprocessed
    _time.sleep(1.1)
    write_named([2], "_lb3")
    df2, _ = read_incremental(spark, str(src), manifest)
    assert df2 is not None and {r.id for r in df2.collect()} == {2}


def test_compact_partitioned_noop_and_per_partition_sizing(spark, tmp_path):
    """Second scheduled run on an already-compact partitioned dataset is
    a no-op (review finding: it rewrote everything every tick), and a
    directory larger than the target splits into multiple files."""
    import glob as _g

    from big_data_hadoop_spark.sources.io import compact_parquet

    import hashlib

    path = str(tmp_path / "pps")
    # high-entropy text so the parquet files don't compress below the
    # tiny test target
    spark.createDataFrame(
        [
            ("a", hashlib.sha256(str(i).encode()).hexdigest() * 4)
            for i in range(300)
        ]
        + [("b", "y")] * 3,
        "k string, text string",
    ).repartition(6).write.partitionBy("k").parquet(path)
    # per-partition sizing: k=a (~45 KB compressed over 6 fragments)
    # compacts toward ceil(bytes/16 KB) ≈ 3 groups — fewer files than
    # before but MORE than one (the one-file-per-partition shortcut
    # would funnel everything through one task); k=b merges to 1
    n_a_before = len(_g.glob(path + "/k=a/part-*.parquet"))
    b1, a1 = compact_parquet(spark, path, target_file_bytes=16384)
    n_a = len(_g.glob(path + "/k=a/part-*.parquet"))
    assert 1 < n_a < n_a_before
    assert len(_g.glob(path + "/k=b/part-*.parquet")) == 1
    files_after_first = sorted(_g.glob(path + "/k=*/part-*.parquet"))
    # second scheduled run at the same target: nothing to do
    b2, a2 = compact_parquet(spark, path, target_file_bytes=16384)
    assert (b2, a2) == (a1, a1)
    assert sorted(_g.glob(path + "/k=*/part-*.parquet")) == files_after_first
    # a big target merges k=a fully
    compact_parquet(spark, path, target_file_bytes=10**9)
    assert len(_g.glob(path + "/k=a/part-*.parquet")) == 1
    assert spark.read.parquet(path).count() == 303


def test_compact_preserves_string_partition_values(spark, tmp_path):
    """id=01 and id=1 are DISTINCT string partitions and must both
    survive compaction verbatim (review finding: type inference merged
    them into id=1)."""
    import os

    from big_data_hadoop_spark.sources.io import compact_parquet

    path = str(tmp_path / "strp")
    spark.createDataFrame(
        [("01", 1), ("01", 2), ("1", 9)], "id string, v long"
    ).repartition(4).write.partitionBy("id").parquet(path)
    assert {"id=01", "id=1"} <= set(os.listdir(path))
    compact_parquet(spark, path, target_file_bytes=10**9)
    assert {"id=01", "id=1"} <= set(os.listdir(path))
    # verify values with inference off (the default read would itself
    # merge 01 and 1 at presentation time, independent of layout)
    key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prior = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        got = {(r.id, r.v) for r in spark.read.parquet(path).collect()}
    finally:
        spark.conf.set(key, prior)
    assert got == {("01", 1), ("01", 2), ("1", 9)}


def test_compact_flat_with_stray_equals_dir(spark, tmp_path):
    """A flat dataset with a stray 'name=value' subdirectory holding no
    parquet is still compacted as FLAT (review finding: the directory
    walk misclassified it as partitioned and the rewrite aborted)."""
    import os

    from big_data_hadoop_spark.sources.io import compact_parquet

    path = str(tmp_path / "stray")
    spark.range(100).repartition(5).write.parquet(path)
    os.makedirs(os.path.join(path, "backup=old"))
    b, a = compact_parquet(spark, path, target_file_bytes=10**9)
    assert (b, a) == (5, 1)
    assert spark.read.parquet(path).count() == 100


def test_compact_preserves_escaped_and_null_partitions(spark, tmp_path):
    """Partition values needing hive escaping ('a:b' -> a%3Ab) and NULL
    partitions (__HIVE_DEFAULT_PARTITION__) must survive compaction
    byte-for-byte (review finding: the value-decoding join dropped
    them). Per-dir leaf rewrites never decode directory names."""
    from pyspark.sql import functions as F

    from big_data_hadoop_spark.sources.io import compact_parquet

    path = str(tmp_path / "esc")
    spark.createDataFrame(
        [("a:b", 1), ("a:b", 2), (None, 3), (None, 4), ("x", 5)],
        "k string, v long",
    ).repartition(5).write.partitionBy("k").parquet(path)
    before = spark.read.parquet(path).count()
    b, a = compact_parquet(spark, path, target_file_bytes=10**9)
    assert a < b
    got = {
        (r.k, r.v) for r in spark.read.parquet(path).collect()
    }
    assert got == {("a:b", 1), ("a:b", 2), (None, 3), (None, 4), ("x", 5)}
    assert spark.read.parquet(path).count() == before


def test_compact_tolerates_reserved_column_names(spark, tmp_path):
    """User columns named _salt/_k pass through untouched (review
    finding: the salted rewrite silently dropped _salt and crashed on
    _k)."""
    from big_data_hadoop_spark.sources.io import compact_parquet

    path = str(tmp_path / "resv")
    spark.createDataFrame(
        [("a", 1, 2, 3)] * 20, "k string, _salt long, _k long, v long"
    ).repartition(5).write.partitionBy("k").parquet(path)
    b, a = compact_parquet(spark, path, target_file_bytes=10**9)
    assert a < b
    df = spark.read.parquet(path)
    assert {"_salt", "_k", "v", "k"} <= set(df.columns)
    assert df.count() == 20
    assert df.select("_salt").distinct().collect()[0][0] == 1
    assert df.select("_k").distinct().collect()[0][0] == 2


def test_compact_rewrites_only_dirty_partitions(spark, tmp_path):
    """Only over-budget directories are rewritten: the clean partition's
    files keep their exact paths (review finding: one dirty day
    rewrote the whole table)."""
    import glob as _g

    from big_data_hadoop_spark.sources.io import compact_parquet

    path = str(tmp_path / "dirty1")
    spark.createDataFrame(
        [("hot", i) for i in range(50)], "k string, v long"
    ).repartition(8).write.partitionBy("k").parquet(path)
    spark.createDataFrame(
        [("cold", 0)], "k string, v long"
    ).coalesce(1).write.mode("append").partitionBy("k").parquet(path)
    cold_before = sorted(_g.glob(path + "/k=cold/part-*.parquet"))
    assert len(cold_before) == 1
    compact_parquet(spark, path, target_file_bytes=10**9)
    assert sorted(_g.glob(path + "/k=cold/part-*.parquet")) == cold_before
    assert len(_g.glob(path + "/k=hot/part-*.parquet")) == 1
    assert spark.read.parquet(path).count() == 51


def test_versioned_dataset_time_travel_and_vacuum(spark, tmp_path):
    from big_data_hadoop_spark.sources.io import (
        versioned_read,
        versioned_vacuum,
        versioned_versions,
        versioned_write,
    )

    path = str(tmp_path / "vds")
    v0 = versioned_write(
        spark.createDataFrame([(1, "a")], "id long, s string"), path
    )
    v1 = versioned_write(
        spark.createDataFrame([(2, "b")], "id long, s string"), path
    )
    v2 = versioned_write(
        spark.createDataFrame([(3, "c")], "id long, s string"), path
    )
    assert (v0, v1, v2) == (0, 1, 2)
    assert versioned_read(spark, path).collect()[0].id == 3  # latest
    assert versioned_read(spark, path, version=0).collect()[0].id == 1
    assert versioned_versions(path) == [0, 1, 2]
    removed = versioned_vacuum(path, keep_last=2)
    assert removed == [0]
    assert versioned_versions(path) == [1, 2]
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        versioned_read(spark, path, version=0)
    with _pytest.raises(ValueError):
        versioned_vacuum(path, keep_last=0)


def test_versioned_vacuum_never_drops_published(spark, tmp_path):
    """If _latest points at an old version (e.g. a rolled-back pointer),
    vacuum must spare it whatever its age."""
    import os

    from big_data_hadoop_spark.sources.io import (
        versioned_read,
        versioned_vacuum,
        versioned_versions,
        versioned_write,
    )

    path = str(tmp_path / "vdp")
    for i in range(4):
        versioned_write(
            spark.createDataFrame([(i,)], "id long"), path
        )
    # roll the pointer back to v0
    with open(os.path.join(path, "_latest"), "w") as f:
        f.write("0")
    versioned_vacuum(path, keep_last=1)
    assert 0 in versioned_versions(path)
    assert versioned_read(spark, path).collect()[0].id == 0


def test_versioned_crashed_write_invisible_to_latest(spark, tmp_path):
    """A version directory without a pointer flip (crashed writer) is
    not served as latest; the next write supersedes it."""
    import os
    import shutil

    from big_data_hadoop_spark.sources.io import (
        versioned_read,
        versioned_write,
    )

    path = str(tmp_path / "vcr")
    versioned_write(spark.createDataFrame([(1,)], "id long"), path)
    # simulate a crashed writer: v=1 exists, pointer still at 0
    spark.createDataFrame([(99,)], "id long").write.parquet(
        os.path.join(path, "v=1")
    )
    assert versioned_read(spark, path).collect()[0].id == 1  # still v0's row
    v = versioned_write(spark.createDataFrame([(2,)], "id long"), path)
    assert v == 2  # superseded, never reused
    assert versioned_read(spark, path).collect()[0].id == 2


def test_versioned_vacuum_policy_with_crashed_top_version(spark, tmp_path):
    """Crashed unmarked dirs don't count toward keep_last (review
    finding: they displaced real history); a FRESH unmarked dir at ANY
    number is spared as a possibly-live concurrent writer (review
    finding: a slow writer's claim below a faster writer's published
    version was vacuumed mid-write); once aged past the grace window it
    is collected as residue."""
    import os

    from big_data_hadoop_spark.sources.io import (
        versioned_vacuum,
        versioned_versions,
        versioned_write,
    )

    path = str(tmp_path / "vp")
    for i in range(3):  # published v0..v2, pointer at 2
        versioned_write(spark.createDataFrame([(i,)], "id long"), path)
    # writers still in flight (or crashed): unmarked v=3 and v=5 (top)
    os.mkdir(os.path.join(path, "v=3"))
    os.mkdir(os.path.join(path, "v=5"))
    removed = versioned_vacuum(path, keep_last=2)
    # keep: published history {1,2}, published 2, top 5, AND fresh v=3
    # (possibly mid-write); collect only superseded-published v=0
    assert removed == [0]
    assert versioned_versions(path) == [1, 2, 3, 5]
    # age v=3 past the grace window -> now provably dead residue
    old = os.path.getmtime(os.path.join(path, "v=3")) - 48 * 3600
    os.utime(os.path.join(path, "v=3"), (old, old))
    removed = versioned_vacuum(path, keep_last=2)
    assert removed == [3]
    assert versioned_versions(path) == [1, 2, 5]


def test_versioned_vacuum_spares_slow_writer_below_published(spark, tmp_path):
    """The ADVICE scenario end-to-end: writer A claims v1 and is slow;
    writer B claims v2, finishes, and publishes. A vacuum in that
    window must NOT collect A's claim — A then finishes and publishes,
    and its snapshot must still be fully readable."""
    import os

    from big_data_hadoop_spark.sources.io import (
        versioned_read,
        versioned_vacuum,
        versioned_write,
    )

    path = str(tmp_path / "vslow")
    versioned_write(spark.createDataFrame([(0,)], "id long"), path)
    # writer A's claim: dir exists, data mid-write, no marker yet
    os.mkdir(os.path.join(path, "v=1"))
    # writer B overtakes: claims v=2, finishes, publishes
    v = versioned_write(spark.createDataFrame([(2,)], "id long"), path)
    assert v == 2
    versioned_vacuum(path, keep_last=1)
    assert os.path.isdir(os.path.join(path, "v=1"))  # A not vacuumed
    # A now finishes writing and publishes (last-flip-wins)
    spark.createDataFrame([(1,)], "id long").write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "v=1"))
    with open(os.path.join(path, "_latest"), "w") as f:
        f.write("1")
    assert versioned_read(spark, path).collect()[0].id == 1


def test_versioned_write_cleans_pointer_residue(spark, tmp_path):
    import os

    from big_data_hadoop_spark.sources.io import versioned_write

    path = str(tmp_path / "vr")
    versioned_write(spark.createDataFrame([(1,)], "id long"), path)
    # a writer killed between mkstemp and replace, LONG ago
    dead = os.path.join(path, "._latest_dead")
    with open(dead, "w") as f:
        f.write("99")
    old = os.path.getmtime(dead) - 2 * 3600
    os.utime(dead, (old, old))
    # a concurrent writer holding its temp RIGHT NOW (mkstemp→replace
    # window) — cleanup must not steal it (review finding: deleting it
    # made that writer's os.replace raise FileNotFoundError)
    live = os.path.join(path, "._latest_live")
    with open(live, "w") as f:
        f.write("7")
    versioned_write(spark.createDataFrame([(2,)], "id long"), path)
    names = [n for n in os.listdir(path) if n.startswith("._latest_")]
    assert names == ["._latest_live"]  # aged residue gone, live spared
    # pointer is world-readable like the data
    mode = os.stat(os.path.join(path, "_latest")).st_mode & 0o777
    assert mode & 0o044 == 0o044


def test_versioned_write_claims_skip_existing_dirs(spark, tmp_path):
    """A pre-existing (e.g. crashed concurrent) v=N dir is never written
    into: the next writer claims the next free number atomically."""
    import os

    from big_data_hadoop_spark.sources.io import (
        versioned_read,
        versioned_write,
    )

    path = str(tmp_path / "vc")
    versioned_write(spark.createDataFrame([(1,)], "id long"), path)
    os.mkdir(os.path.join(path, "v=1"))  # someone else's claim
    v = versioned_write(spark.createDataFrame([(2,)], "id long"), path)
    assert v == 2
    assert versioned_read(spark, path).collect()[0].id == 2
    assert os.listdir(os.path.join(path, "v=1")) == []  # untouched


def test_versioned_vacuum_legacy_unmarked_history_keeps_quota(spark, tmp_path):
    """Upgrade path (review finding): snapshots written BEFORE the
    _PUBLISHED marker existed must still count toward keep_last — a
    marker-only quota collapsed to nothing on upgrade and mass-deleted
    real published history once past the grace window."""
    import os

    from big_data_hadoop_spark.sources.io import (
        versioned_vacuum,
        versioned_versions,
        versioned_write,
    )

    path = str(tmp_path / "vleg")
    for i in range(3):
        versioned_write(spark.createDataFrame([(i,)], "id long"), path)
    # simulate the pre-marker format: strip markers, age everything
    for v in range(3):
        os.remove(os.path.join(path, f"v={v}", "_PUBLISHED"))
    for root, dirs, files in os.walk(path):
        for n in dirs + files:
            p = os.path.join(root, n)
            old = os.path.getmtime(p) - 48 * 3600
            os.utime(p, (old, old))
    removed = versioned_vacuum(path, keep_last=2)
    assert removed == [0]  # quota {1,2} honored, not collapsed
    assert versioned_versions(path) == [1, 2]


def test_versioned_vacuum_grace_sees_deep_writer_activity(spark, tmp_path):
    """A long-running writer whose committer only touches
    vdir/_temporary/... (top-level mtime stuck at claim time) must
    still be inside the grace window — the liveness check walks the
    tree (review finding: a top-level-only mtime check collected a
    slow write mid-flight)."""
    import os

    from big_data_hadoop_spark.sources.io import (
        versioned_vacuum,
        versioned_write,
    )

    path = str(tmp_path / "vdeep")
    for i in range(2):
        versioned_write(spark.createDataFrame([(i,)], "id long"), path)
    # slow writer claimed v=2 LONG ago; job is still writing under
    # _temporary (fresh file there), top-level dir mtime is stale
    vdir = os.path.join(path, "v=2")
    tmpdir = os.path.join(vdir, "_temporary", "0")
    os.makedirs(tmpdir)
    with open(os.path.join(tmpdir, "part-000.parquet.inprogress"), "w"):
        pass
    old = os.path.getmtime(vdir) - 48 * 3600
    os.utime(vdir, (old, old))
    os.utime(os.path.join(vdir, "_temporary"), (old, old))
    # the deep file stays FRESH -> grace must protect the claim
    versioned_vacuum(path, keep_last=1)
    assert os.path.isdir(vdir)


def test_upsert_parquet_unpartitioned(spark, tmp_path):
    """Keyed MERGE: updated keys replaced, new keys inserted, untouched
    rows survive; first call creates the dataset; duplicate update keys
    and schema drift are refused loudly."""
    import pytest as _pytest

    from big_data_hadoop_spark.sources.io import upsert_parquet

    path = str(tmp_path / "ups")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    upsert_parquet(spark, path, base, ["id"])  # create
    upd = spark.createDataFrame(
        [(2, "B2"), (4, "d")], "id long, v string"
    )
    upsert_parquet(spark, path, upd, ["id"])
    got = {(r.id, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "B2"), (3, "c"), (4, "d")}
    dup = spark.createDataFrame(
        [(5, "x"), (5, "y")], "id long, v string"
    )
    with _pytest.raises(ValueError, match="duplicate keys"):
        upsert_parquet(spark, path, dup, ["id"])
    drift = spark.createDataFrame([(6, "z")], "id long, w string")
    with _pytest.raises(ValueError, match="schema"):
        upsert_parquet(spark, path, drift, ["id"])
    with _pytest.raises(ValueError, match="key_cols"):
        upsert_parquet(spark, path, upd, [])


def test_upsert_parquet_partitioned_rewrites_only_affected(spark, tmp_path):
    """Partitioned MERGE: only partitions containing updated keys are
    rewritten — untouched partition directories keep their exact data
    files (the one-day-of-a-year-partitioned-table property)."""
    import os

    from big_data_hadoop_spark.sources.io import upsert_parquet

    path = str(tmp_path / "upsp")
    base = spark.createDataFrame(
        [(1, "d1", "a"), (2, "d1", "b"), (3, "d2", "c"), (4, "d3", "e")],
        "id long, day string, v string",
    )
    upsert_parquet(spark, path, base, ["id"], partition_cols=["day"])

    def files_of(day):
        d = os.path.join(path, f"day={day}")
        return sorted(
            (n, os.path.getmtime(os.path.join(d, n)))
            for n in os.listdir(d)
            if n.endswith(".parquet")
        )

    before_d2, before_d3 = files_of("d2"), files_of("d3")
    upd = spark.createDataFrame(
        [(2, "d1", "B2"), (10, "d1", "new")], "id long, day string, v string"
    )
    upsert_parquet(spark, path, upd, ["id"], partition_cols=["day"])
    got = {(r.id, r.day, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {
        (1, "d1", "a"), (2, "d1", "B2"), (10, "d1", "new"),
        (3, "d2", "c"), (4, "d3", "e"),
    }
    assert files_of("d2") == before_d2  # byte-untouched
    assert files_of("d3") == before_d3
    import pytest as _pytest

    missing = spark.createDataFrame([(1, "x")], "id long, v string")
    with _pytest.raises(ValueError, match="partition columns"):
        upsert_parquet(spark, path, missing, ["id"], partition_cols=["day"])


def test_upsert_parquet_null_partition_value(spark, tmp_path):
    """A NULL partition value routes to the hive default partition and
    must merge correctly (the class of edge the compaction review round
    found dropped)."""
    from big_data_hadoop_spark.sources.io import upsert_parquet

    path = str(tmp_path / "upsn")
    base = spark.createDataFrame(
        [(1, None, "a"), (2, "d1", "b")], "id long, day string, v string"
    )
    upsert_parquet(spark, path, base, ["id"], partition_cols=["day"])
    upd = spark.createDataFrame(
        [(1, None, "A2")], "id long, day string, v string"
    )
    upsert_parquet(spark, path, upd, ["id"], partition_cols=["day"])
    got = {(r.id, r.day, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, None, "A2"), (2, "d1", "b")}


def test_upsert_removes_moved_key_from_old_partition(spark, tmp_path):
    """A key whose partition value changed must have its old row
    REMOVED from the old partition (review finding: computing affected
    partitions from the updates alone left a stale duplicate); with
    assume_keys_colocated=True that scan is skipped and the documented
    stale-duplicate contract applies."""
    from big_data_hadoop_spark.sources.io import upsert_parquet

    def fresh(name):
        path = str(tmp_path / name)
        base = spark.createDataFrame(
            [(1, "d1", "a"), (2, "d1", "b"), (3, "d2", "c")],
            "id long, day string, v string",
        )
        upsert_parquet(spark, path, base, ["id"], partition_cols=["day"])
        return path

    moved = spark.createDataFrame(
        [(2, "d9", "moved")], "id long, day string, v string"
    )
    safe = fresh("upmv_safe")
    upsert_parquet(spark, safe, moved, ["id"], partition_cols=["day"])
    got = {(r.id, r.day, r.v) for r in spark.read.parquet(safe).collect()}
    assert got == {(1, "d1", "a"), (2, "d9", "moved"), (3, "d2", "c")}

    fast = fresh("upmv_fast")
    upsert_parquet(
        spark, fast, moved, ["id"], partition_cols=["day"],
        assume_keys_colocated=True,
    )
    got = {(r.id, r.day, r.v) for r in spark.read.parquet(fast).collect()}
    # documented trade: the old row survives under the colocated flag
    assert (2, "d1", "b") in got and (2, "d9", "moved") in got


def test_upsert_null_key_is_replaced(spark, tmp_path):
    """NULL-safe key equality: a NULL-keyed update REPLACES the
    NULL-keyed prior row (review finding: plain join equality
    duplicated it)."""
    from big_data_hadoop_spark.sources.io import upsert_parquet

    path = str(tmp_path / "upnk")
    base = spark.createDataFrame(
        [(None, "a"), (2, "b")], "id long, v string"
    )
    upsert_parquet(spark, path, base, ["id"])
    upd = spark.createDataFrame([(None, "A2")], "id long, v string")
    upsert_parquet(spark, path, upd, ["id"])
    got = {(r.id, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(None, "A2"), (2, "b")}


def test_upsert_refuses_type_drift_and_layout_mismatch(spark, tmp_path):
    """(a) Same column names with a retyped column are refused (review
    finding: name-set comparison let unionByName silently widen the
    stored column); (b) upserting a partitioned dataset WITHOUT
    partition_cols is refused instead of silently rewriting it flat."""
    import pytest as _pytest

    from big_data_hadoop_spark.sources.io import upsert_parquet

    flat = str(tmp_path / "uptd")
    upsert_parquet(
        spark,
        flat,
        spark.createDataFrame([(1, 5)], "id long, v int"),
        ["id"],
    )
    retyped = spark.createDataFrame([(2, "s")], "id long, v string")
    with _pytest.raises(ValueError, match="types"):
        upsert_parquet(spark, flat, retyped, ["id"])

    part = str(tmp_path / "uplm")
    upsert_parquet(
        spark,
        part,
        spark.createDataFrame([(1, "d1", "a")], "id long, day string, v string"),
        ["id"],
        partition_cols=["day"],
    )
    upd = spark.createDataFrame(
        [(1, "d1", "A")], "id long, day string, v string"
    )
    with _pytest.raises(ValueError, match="hive-partitioned"):
        upsert_parquet(spark, part, upd, ["id"])
    with _pytest.raises(ValueError, match="layout"):
        upsert_parquet(spark, part, upd, ["id"], partition_cols=["id"])
    with _pytest.raises(ValueError, match="layout"):
        upsert_parquet(spark, flat, upd, ["id"], partition_cols=["day"])
