"""Structured Streaming pipelines (extension beyond the reference — the
reference is batch-only, SURVEY §2.6).

Streaming variants of the engine's core aggregations: incremental token
counts over a document stream, and watermarked tumbling-window event
aggregation whose completed-window output matches the batch twin
(``probes.q28_event_windows``) — the classic lambda-free design: same
DataFrame expressions, ``readStream`` instead of ``read``.

Scale posture: watermarks bound state; aggregation state is keyed by
(window, event_type) — cardinality is windows × types, independent of
event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_hadoop_spark.operators.tokenize import tokens

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),  # nanos (parquet NANOS)
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over an events parquet directory; ts normalized
    to a µs timestamp exactly as the batch reader does."""
    raw = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(path)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def streaming_windowed_event_agg(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window count/sum per event type.

    Late data beyond ``watermark`` is dropped and window state is evicted —
    bounded state at any scale. Output schema matches the batch twin
    (q28): ``window_start, event_type, n, sv``.
    """
    win = F.window(F.col("ts"), window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sv",
        )
    )


def streaming_token_counts(lines: DataFrame) -> DataFrame:
    """Incremental word/number counts over a text stream (the reference's
    WordCount as an unbounded computation). Complete-mode sink expected."""
    t = tokens(lines, keep_cols=())
    return t.groupBy("category", "token").agg(F.count("*").alias("cnt"))
