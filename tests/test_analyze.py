"""Table profile (``sources.io.analyze_table``): exact stats against a
DuckDB oracle on sf0.01 orders, heavy-value ranking, column selection
and validation, and the CLI JSON line."""

from __future__ import annotations

import json

from big_data_hadoop_spark.sources.io import analyze_table
from tests.conftest import SF_ORACLE

ORDERS = SF_ORACLE + "/orders.parquet"


def test_analyze_matches_duckdb(spark, duck):
    got = analyze_table(spark, ORDERS, cols=["o_orderkey", "o_orderstatus"])
    want = duck.execute(
        """
        SELECT count(*), min(o_orderkey), max(o_orderkey),
               sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END),
               count(DISTINCT o_orderkey), count(DISTINCT o_orderstatus),
               min(o_orderstatus), max(o_orderstatus)
        FROM orders
        """
    ).fetchone()
    assert got["n_rows"] == want[0]
    assert got["n_files"] == 1 and got["total_bytes"] > 0
    ok = got["columns"]["o_orderkey"]
    assert (ok["min"], ok["max"], ok["nulls"]) == (want[1], want[2], 0)
    assert abs(ok["ndv"] - want[4]) / want[4] < 0.06  # HLL++ rsd=0.02
    st = got["columns"]["o_orderstatus"]
    assert (st["min"], st["max"], st["nulls"]) == (want[6], want[7], want[3])
    assert st["ndv"] == want[5]  # tiny cardinality: HLL++ exact


def test_analyze_topk_and_validation(spark, duck):
    got = analyze_table(spark, ORDERS, cols=["o_orderstatus"], topk=2)
    want = duck.execute(
        """
        SELECT o_orderstatus, count(*) AS n FROM orders
        GROUP BY 1 ORDER BY n DESC, o_orderstatus LIMIT 2
        """
    ).fetchall()
    assert got["columns"]["o_orderstatus"]["top"] == [
        [v, n] for v, n in want
    ]
    import pytest

    with pytest.raises(ValueError, match="not in"):
        analyze_table(spark, ORDERS, cols=["nope"])


def test_analyze_default_cols_and_cli(spark, capsys):
    from big_data_hadoop_spark.cli import main

    got = analyze_table(spark, ORDERS)
    # every atomic column profiled, timestamps JSON-able
    assert "o_orderdate" in got["columns"]
    assert json.dumps(got)
    main(["analyze", ORDERS, "--cols", "o_orderkey"])
    lines = [
        ln
        for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("{")
    ]
    out = json.loads(lines[-1])
    assert out["n_rows"] == got["n_rows"]


def test_analyze_empty_table_and_nan(spark, tmp_path):
    """Zero-row tables report nulls=0 (SUM over no rows is NULL in
    SQL) and NaN min/max serializes as the string 'NaN', keeping the
    CLI line strict-JSON (review findings)."""
    import math

    p = str(tmp_path / "e")
    spark.createDataFrame([], "x long, y double").write.parquet(p)
    got = analyze_table(spark, p)
    assert got["n_rows"] == 0
    assert got["columns"]["x"] == {"min": None, "max": None, "nulls": 0, "ndv": 0}
    p2 = str(tmp_path / "nan")
    spark.createDataFrame(
        [(1.0,), (float("nan"),)], "y double"
    ).write.parquet(p2)
    got = analyze_table(spark, p2)
    assert got["columns"]["y"]["max"] == "NaN"
    line = json.dumps(got)
    assert "NaN," not in line.replace('"NaN"', "")  # no bare NaN token
    json.loads(line)


def test_analyze_from_stats_matches_data_scan(spark, tmp_path):
    """The index rollup agrees with the data-scan profile on every
    shared field — rows, files, bytes, min/max/nulls — without
    touching a data page; NDV honestly degrades to the per-file max
    (sketchless counts cannot merge), the bloom-sizing input."""
    from big_data_hadoop_spark.sources.layout import (
        analyze_from_stats,
        build_file_stats,
    )

    p = str(tmp_path / "ds")
    spark.createDataFrame(
        [(i, None if i % 7 == 0 else i * 3) for i in range(1000)],
        "k long, v long",
    ).repartition(4).write.parquet(p)
    stats = build_file_stats(spark, p, ["k", "v"])
    got = analyze_from_stats(stats)
    want = analyze_table(spark, p, cols=["k", "v"])
    assert (got["n_rows"], got["n_files"], got["total_bytes"]) == (
        want["n_rows"], want["n_files"], want["total_bytes"])
    for c in ("k", "v"):
        for f in ("min", "max", "nulls"):
            assert got["columns"][c][f] == want["columns"][c][f], (c, f)
        assert got["columns"][c]["ndv_per_file_max"] <= want["columns"][c]["ndv"] * 1.1
    import pytest

    with pytest.raises(ValueError, match="not a"):
        analyze_from_stats(stats.select("file", "length"))
