"""Structured Streaming: the streaming windowed aggregation must converge
to the batch twin's result when the stream is drained (availableNow)."""

from __future__ import annotations

import pytest

from big_data_hadoop_spark.probes import q28_event_windows
from big_data_hadoop_spark.streaming import (
    read_events_stream,
    streaming_windowed_event_agg,
)
from tests.conftest import SF_SMOKE


def test_streaming_matches_batch(spark, tmp_path):
    # file stream sources require a directory
    import shutil

    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "part-0.parquet")
    stream = read_events_stream(spark, str(src))
    agg = streaming_windowed_event_agg(stream, watermark="100 days")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT window_start, event_type, n, sv FROM win_agg"
        ).collect()
    }
    expect = {tuple(r) for r in q28_event_windows(spark, SF_SMOKE).collect()}
    assert got == expect


def test_streaming_token_counts_runs(spark, golden_lines, tmp_path):
    from big_data_hadoop_spark.streaming import streaming_token_counts

    src = str(tmp_path / "lines")
    golden_lines.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        streaming_token_counts(stream)
        .writeStream.format("memory")
        .queryName("tok_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.category, r.token): r.cnt
        for r in spark.sql("SELECT * FROM tok_counts").collect()
    }
    assert got[("word", "the")] == 3
    assert got[("number", "20")] == 2


def test_streaming_sessionize(spark, tmp_path):
    """Closed sessions emitted by the stateful operator must agree with the
    batch sessionization (q29): for each user the number of closed
    streaming sessions is the batch count or one less (the final session
    stays open unless the event-time timeout has fired)."""
    import shutil

    from big_data_hadoop_spark.probes import q29_sessionization
    from big_data_hadoop_spark.streaming import (
        read_events_stream,
        streaming_sessionize,
    )

    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "part-0.parquet")
    stream = read_events_stream(spark, str(src))
    q = (
        streaming_sessionize(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert rows, "no closed sessions emitted"
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    batch = {
        r.user_id: r.n_sessions
        for r in q29_sessionization(spark, SF_SMOKE).collect()
    }
    for uid, sess in by_user.items():
        ids = sorted(s.session_id for s in sess)
        assert ids == list(range(len(ids))), f"non-dense session ids for {uid}"
        assert all(s.n_events >= 1 and s.end_us >= s.start_us for s in sess)
        assert len(sess) in (batch[uid] - 1, batch[uid]), (
            uid, len(sess), batch[uid]
        )


def test_streaming_parquet_sink(spark, tmp_path):
    """Full readStream -> stateful transform -> writeStream(parquet)
    pipeline: drained output must be readable and non-empty."""
    import shutil

    from big_data_hadoop_spark.streaming import (
        read_events_stream,
        streaming_sessionize,
        write_stream_parquet,
    )

    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "part-0.parquet")
    out = str(tmp_path / "sessions_out")
    q = write_stream_parquet(
        streaming_sessionize(read_events_stream(spark, str(src))),
        out,
        str(tmp_path / "ckpt_sink"),
    )
    q.awaitTermination(180)
    back = spark.read.parquet(out)
    assert back.count() > 0
    assert set(back.columns) == {
        "user_id", "session_id", "n_events", "start_us", "end_us"
    }
