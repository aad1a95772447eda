"""Mutable-table vacuum (``sources.io.vacuum_table``): every
stage-and-swap crash-residue class — stranded ``.old`` (restore, never
delete), post-publish ``.old`` (delete past grace), dead ``.staging``
(delete past grace), fresh residue (keep) — top-level and nested
per-partition, plus the CLI surface."""

from __future__ import annotations

import os
import shutil
import time

from big_data_hadoop_spark.sources.io import vacuum_table


def _age(root: str, seconds: float = 90000.0) -> None:
    t = time.time() - seconds
    for dp, dns, fns in os.walk(root):
        for n in dns + fns:
            os.utime(os.path.join(dp, n), (t, t))
    os.utime(root, (t, t))


def _rows(spark, path):
    return sorted(r.id for r in spark.read.parquet(path).collect())


def test_vacuum_restores_stranded_old(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(10).coalesce(1).write.parquet(p)
    os.rename(p, p + ".old")  # kill window between the two swap renames
    stats = vacuum_table(p)
    assert stats["recovered"] == 1 and stats["removed"] == 0
    assert _rows(spark, p) == list(range(10))


def test_vacuum_removes_dead_residue_keeps_fresh(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(10).coalesce(1).write.parquet(p)
    shutil.copytree(p, p + ".old")  # kill after publish, before rmtree
    shutil.copytree(p, p + ".staging")  # writer died before its swap
    _age(p + ".old")
    stats = vacuum_table(p)
    # aged .old goes; fresh .staging stays (a bypassing writer might
    # be mid-stage — grace fails toward keeping data)
    assert stats["removed"] == 1 and stats["kept_fresh"] == 1
    assert stats["bytes_freed"] > 0
    assert not os.path.exists(p + ".old")
    assert os.path.exists(p + ".staging")
    _age(p + ".staging")
    stats = vacuum_table(p)
    assert stats["removed"] == 1 and not os.path.exists(p + ".staging")
    assert _rows(spark, p) == list(range(10))


def test_vacuum_nested_partition_residue(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(20).selectExpr("id", "id % 2 as day").write.partitionBy(
        "day"
    ).parquet(p)
    d0, d1 = os.path.join(p, "day=0"), os.path.join(p, "day=1")
    os.rename(d0, d0 + ".old")  # stranded: partition invisible
    shutil.copytree(d1, d1 + ".old")  # post-publish leftover
    _age(d1 + ".old")
    stats = vacuum_table(p)
    assert stats["recovered"] == 1 and stats["removed"] == 1
    assert os.path.exists(d0) and not os.path.exists(d1 + ".old")
    assert _rows(spark, p) == list(range(20))


def test_vacuum_missing_table_is_noop(tmp_path):
    stats = vacuum_table(str(tmp_path / "never"))
    assert stats == {
        "recovered": 0,
        "removed": 0,
        "kept_fresh": 0,
        "bytes_freed": 0,
    }


def test_vacuum_cli(spark, tmp_path, capsys):
    from big_data_hadoop_spark.cli import main

    p = str(tmp_path / "t")
    spark.range(5).coalesce(1).write.parquet(p)
    shutil.copytree(p, p + ".staging")
    _age(p + ".staging")
    main(["vacuum", p])
    out = capsys.readouterr().out
    assert '"removed": 1' in out and not os.path.exists(p + ".staging")


def test_vacuum_staging_only_first_write_crash(spark, tmp_path):
    """A FIRST-EVER write killed before its swap leaves only
    <path>.staging — no base, no .old. The early return must not skip
    it (review finding: that full copy survived forever)."""
    p = str(tmp_path / "t")
    spark.range(5).coalesce(1).write.parquet(p + ".staging")
    _age(p + ".staging")
    stats = vacuum_table(p)
    assert stats["removed"] == 1 and stats["bytes_freed"] > 0
    assert not os.path.exists(p + ".staging")


def test_vacuum_nested_residue_inside_restored_generation(spark, tmp_path):
    """Dead residue INSIDE a stranded generation is reclaimed in the
    SAME run: the sweep re-walks after restores (review finding: the
    pre-restore walk recorded the nested path under .old, so its
    sweep no-op'd and the garbage survived until the next vacuum)."""
    p = str(tmp_path / "t")
    spark.range(20).selectExpr("id", "id % 2 as day").write.partitionBy(
        "day"
    ).parquet(p)
    d0 = os.path.join(p, "day=0")
    inner = os.path.join(d0, "hour=1")
    spark.range(3).coalesce(1).write.parquet(inner + ".staging")
    _age(inner + ".staging")
    os.rename(d0, d0 + ".old")  # strand the partition AROUND the residue
    stats = vacuum_table(p)
    assert stats["recovered"] == 1 and stats["removed"] == 1
    assert os.path.exists(d0) and not os.path.exists(inner + ".staging")
    assert _rows(spark, p) == list(range(20))


def test_vacuum_kept_fresh_counted_once_across_passes(spark, tmp_path):
    """A restore triggers a second fixpoint pass; fresh residue seen by
    both passes must count ONCE (review finding: kept_fresh=2 for one
    entry)."""
    p = str(tmp_path / "t")
    spark.range(20).selectExpr("id", "id % 2 as day").write.partitionBy(
        "day"
    ).parquet(p)
    d0, d1 = os.path.join(p, "day=0"), os.path.join(p, "day=1")
    os.rename(d0, d0 + ".old")  # stranded → restore → second pass
    shutil.copytree(d1, d1 + ".staging")  # fresh (inside grace)
    stats = vacuum_table(p)
    assert stats["recovered"] == 1 and stats["kept_fresh"] == 1
    assert os.path.exists(d1 + ".staging")
