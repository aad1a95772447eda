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
