"""Native session_window sessions (``relational.session_agg``):
per-user session counts equal the lag+cumsum probe (q29) on real
events, hand-built sessions with exact start/end/n, the documented
boundary divergence, and a one-shuffle plan pin."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from pyspark.sql import functions as F

from big_data_hadoop_spark.operators.relational import session_agg
from big_data_hadoop_spark.probes import QUERIES
from big_data_hadoop_spark.sources.io import load_table
from tests.conftest import SF_ORACLE


def test_session_agg_agrees_with_lag_cumsum_probe(spark):
    ev = load_table(spark, SF_ORACLE, "events")
    got = {
        r.user_id: r.n
        for r in session_agg(ev, "user_id", "ts", 1800)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {
        r.user_id: r.n_sessions
        for r in QUERIES["q29_sessionization"](spark, SF_ORACLE).collect()
    }
    assert got == want and len(got) > 50


def test_session_agg_constructed(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        ("a", t0),
        ("a", t0 + timedelta(minutes=10)),
        ("a", t0 + timedelta(minutes=50)),  # 40 min gap > 30 → new
        ("b", t0 + timedelta(hours=2)),
    ]
    df = spark.createDataFrame(rows, "u string, ts timestamp")
    got = sorted(
        (r.u, r.session_start, r.session_end, r.n_events)
        for r in session_agg(df, "u", "ts", 1800).collect()
    )
    assert got == [
        ("a", t0, t0 + timedelta(minutes=10), 2),
        ("a", t0 + timedelta(minutes=50), t0 + timedelta(minutes=50), 1),
        ("b", t0 + timedelta(hours=2), t0 + timedelta(hours=2), 1),
    ]
    with pytest.raises(ValueError, match="positive"):
        session_agg(df, "u", "ts", 0)


def test_session_agg_boundary_agreement_pinned(spark):
    """An event EXACTLY gap after its predecessor MERGES in all three
    sessionizers (session_window's end is inclusive; the lag/cumsum
    rule splits only when the gap is EXCEEDED) — pinned so a Spark
    behavior change cannot drift past silently."""
    t0 = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("a", t0), ("a", t0 + timedelta(seconds=1800))],
        "user_id string, ts timestamp",
    )
    assert session_agg(df, "user_id", "ts", 1800).count() == 1
    # one microsecond PAST the gap splits
    df2 = spark.createDataFrame(
        [("a", t0), ("a", t0 + timedelta(seconds=1800, microseconds=1))],
        "user_id string, ts timestamp",
    )
    assert session_agg(df2, "user_id", "ts", 1800).count() == 2
    # the q29 rule ((t - prev) > gap) keeps the boundary event
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    micros = F.unix_micros(F.col("ts"))
    ns = F.when(
        F.lag(micros).over(w).isNull()
        | ((micros - F.lag(micros).over(w)) > 1800 * 1_000_000),
        1,
    ).otherwise(0)
    n = (
        df.select("user_id", ns.alias("ns"))
        .groupBy("user_id")
        .agg(F.sum("ns").alias("n"))
        .collect()[0]
        .n
    )
    assert n == 1


def test_session_agg_single_shuffle_plan(spark):
    ev = load_table(spark, SF_ORACLE, "events")
    plan = session_agg(ev, "user_id", "ts", 1800)._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "Window" not in plan


def test_session_agg_fractional_gap(spark):
    """Fractional gaps resolve at microsecond precision — int() would
    build an invalid '0 seconds' window for 0.5 (review finding)."""
    t0 = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("a", t0), ("a", t0 + timedelta(milliseconds=400)),
         ("a", t0 + timedelta(milliseconds=1200))],
        "u string, ts timestamp",
    )
    assert session_agg(df, "u", "ts", 0.5).count() == 2
    with pytest.raises(ValueError, match="positive"):
        session_agg(df, "u", "ts", 0.0000001)


def test_session_agg_streams_and_equals_batch_when_drained(spark, tmp_path):
    """The SAME session_agg expression under readStream (watermark +
    append mode), drained with maxFilesPerTrigger=1 over the real
    events plus a far-future sentinel batch that pushes the watermark
    past every real session: the emitted sessions equal the batch
    operator on the real events, session by session (substantiates
    the docstring's stream-capable claim; Spark merges session state
    across micro-batches natively)."""
    import shutil
    import time
    from datetime import timedelta

    from big_data_hadoop_spark.streaming.pipelines import read_events_stream
    from tests.conftest import SF_SMOKE

    src = tmp_path / "sess_src"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "part-0.parquet")
    batch = load_table(spark, SF_SMOKE, "events")
    schema = spark.read.parquet(f"{SF_SMOKE}/events.parquet").schema
    max_ts = batch.agg(F.max(F.col("ts").cast("timestamp"))).first()[0]
    sentinel_ts = max_ts + timedelta(days=30)
    # the events ts PHYSICAL type drifts between testdata rounds
    # (int64 epoch-nanos vs timestamp[us] NTZ — read_events_stream
    # absorbs it); build the sentinel to match the footer schema
    from pyspark.sql.types import LongType

    if isinstance(schema["ts"].dataType, LongType):
        sentinel_ts = int(sentinel_ts.timestamp() * 1e9)
    spark.createDataFrame(
        [(-11, sentinel_ts, -1, "sentinel", 0.0, "{}")],
        schema,
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "s1"))
    time.sleep(1.1)  # distinct mtime -> the sentinel drains LAST
    part = next((tmp_path / "s1").glob("part-*.parquet"))
    shutil.copy(part, src / "part-1.parquet")

    stream = (
        read_events_stream(spark, str(src), maxFilesPerTrigger="1")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
    )
    q = (
        session_agg(stream, "user_id", "ts", 1800)
        .writeStream.format("memory")
        .queryName("native_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT * FROM native_sessions WHERE user_id >= 0"
        ).collect()
    }
    want = {
        tuple(r) for r in session_agg(batch, "user_id", "ts", 1800).collect()
    }
    assert len(got) > 100 and got == want
