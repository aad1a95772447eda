"""Structured Streaming: the streaming windowed aggregation must converge
to the batch twin's result when the stream is drained (availableNow)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def test_streaming_sessionize_equals_batch_when_drained(spark, tmp_path):
    """VERDICT r2 #5: full stream/batch equivalence. Two far-future
    sentinel batches (a dummy user) push the watermark past every real
    session's event-time timeout, so ALL real sessions close — the
    complete streaming output must then equal a batch gap-and-islands
    sessionization of the same parquet, session by session."""
    import shutil
    import time
    from datetime import datetime, timedelta, timezone

    import duckdb
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from big_data_hadoop_spark.sources.io import load_table
    from big_data_hadoop_spark.streaming import (
        read_events_stream,
        streaming_sessionize,
    )

    gap_s = 1800
    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "part-0.parquet")
    # sentinel events written in the SAME layout as the real file (footer
    # schema), far enough in the future to close every real session
    schema = spark.read.parquet(f"{SF_SMOKE}/events.parquet").schema
    max_us = duckdb.sql(
        f"SELECT max(epoch_us(ts)) FROM '{SF_SMOKE}/events.parquet'"
    ).fetchone()[0]
    max_dt = datetime.fromtimestamp(max_us / 1e6, tz=timezone.utc).replace(
        tzinfo=None
    )
    for i, days in enumerate((30, 60), start=1):
        spark.createDataFrame(
            [(-(10 + i), max_dt + timedelta(days=days), -1, "sentinel", 0.0, "{}")],
            schema,
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"s{i}"))
        part = next((tmp_path / f"s{i}").glob("part-*.parquet"))
        shutil.copy(part, src / f"part-{i}.parquet")
        time.sleep(1.1)  # distinct mtimes -> deterministic batch order

    stream = read_events_stream(spark, str(src), maxFilesPerTrigger="1")
    q = (
        streaming_sessionize(stream, gap_seconds=gap_s)
        .writeStream.format("memory")
        .queryName("sessions_eq")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_eq"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.user_id, r.session_id, r.n_events, r.start_us, r.end_us)
        for r in spark.sql(
            "SELECT * FROM sessions_eq WHERE user_id >= 0"
        ).collect()
    }

    ev = load_table(spark, SF_SMOKE, "events")
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag(micros).over(w)
    ns = F.when(
        prev.isNull() | ((micros - prev) > gap_s * 1_000_000), 1
    ).otherwise(0)
    sid = (
        F.sum(ns).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1
    ).cast("long")
    expect = {
        tuple(r)
        for r in ev.select(
            "user_id", micros.alias("us"), sid.alias("session_id")
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
        )
        .collect()
    }
    assert len(got) > 0 and got == expect


def test_streaming_exact_dedup_matches_batch(spark, tmp_path):
    """Streaming exact dedup must keep exactly one row per content key
    (the batch dropDuplicates cardinality) with watermark-bounded state."""
    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", f"sha{i % 7}") for i in range(30)
    ]
    src = str(tmp_path / "dd_src")
    df = spark.createDataFrame(
        rows, "row_id long, ts_s string, content_sha string"
    ).selectExpr("row_id", "CAST(ts_s AS TIMESTAMP) AS ts", "content_sha")
    df.write.parquet(src)

    from big_data_hadoop_spark.streaming import streaming_exact_dedup

    stream = spark.readStream.schema(
        "row_id long, ts timestamp, content_sha string"
    ).parquet(src)
    q = (
        streaming_exact_dedup(stream, key_cols=("content_sha",))
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dedup_stream").collect()
    assert len(got) == df.dropDuplicates(["content_sha"]).count() == 7
    # each kept row is a genuine member of its key group (first ARRIVAL
    # wins — arrival order within a batch is partition order, so the
    # representative is arbitrary-but-one, same as batch dropDuplicates)
    members = {(r.content_sha, r.row_id) for r in df.collect()}
    kept_keys = set()
    for r in got:
        assert (r.content_sha, r.row_id) in members
        kept_keys.add(r.content_sha)
    assert kept_keys == {f"sha{i}" for i in range(7)}


def test_streaming_curate_matches_batch_gates(spark, tmp_path):
    """The streaming funnel must admit exactly the batch gate's document
    set (same predicate object), deduped to batch-dedup cardinality."""
    import shutil

    from pyspark.sql import functions as F

    from big_data_hadoop_spark.operators.dedup import exact_dedup
    from big_data_hadoop_spark.pipeline import curation_gate
    from big_data_hadoop_spark.sources.io import load_table
    from big_data_hadoop_spark.streaming import streaming_curate

    # docs with a synthetic arrival timestamp (offset away from epoch 0:
    # Structured Streaming's initial watermark IS epoch 0, so a row at
    # exactly that instant is judged late and dropped) and injected dups
    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .withColumn(
            "ts",
            F.timestamp_micros(
                (F.col("doc_id") + F.lit(1_700_000_000)) * 1_000_000
            ),
        )
    )
    dup = docs.withColumn("doc_id", F.col("doc_id") + 10_000)
    both = docs.unionByName(dup)
    src = str(tmp_path / "curate_src")
    both.write.parquet(src)

    stream = spark.readStream.schema(
        "doc_id long, text string, ts timestamp"
    ).parquet(src)
    q = (
        streaming_curate(stream)
        .writeStream.format("memory")
        .queryName("curated_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_cur"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM curated_stream").collect()

    batch_gated = both.filter(curation_gate())
    batch_dedup_n = exact_dedup(batch_gated).count()
    assert len(got) == batch_dedup_n > 0
    # every emitted doc passes the batch gate (same predicate, and the
    # duplicate-injected corpus proves the dedup stage is live)
    gated_ids = {r.doc_id for r in batch_gated.collect()}
    assert {r.doc_id for r in got} <= gated_ids
    assert len(got) < batch_gated.count()


def test_stateless_pipeline_ops_stream_unchanged(spark, tmp_path):
    """chunk_documents and redact_pii are narrow/stateless, so the SAME
    functions apply to a readStream frame with no changes — drained
    output must equal the batch result exactly."""
    from pyspark.sql import functions as F

    from big_data_hadoop_spark.pipeline import chunk_documents, redact_pii
    from big_data_hadoop_spark.sources.io import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_src")
    docs.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)

    q = (
        chunk_documents(redact_pii(stream), 32, overlap=4)
        .writeStream.format("memory")
        .queryName("chunks_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.chunk_no, r.chunk_text)
        for r in spark.sql("SELECT * FROM chunks_stream").collect()
    }
    expect = {
        (r.doc_id, r.chunk_no, r.chunk_text)
        for r in chunk_documents(redact_pii(docs), 32, overlap=4).collect()
    }
    assert got == expect and len(got) > 0


def test_streaming_pair_counts_equals_batch_when_drained(spark, golden_lines, tmp_path):
    """VERDICT r3 #3: the reference's signature computation as an
    unbounded query. Documents delivered across multiple micro-batches
    (maxFilesPerTrigger=1) must drain to EXACTLY the batch pair_counts
    of the same corpus, for both m=1 and m=3."""
    from pyspark.sql import functions as F

    from big_data_hadoop_spark.operators.cooccur import pair_counts
    from big_data_hadoop_spark.streaming import streaming_pair_counts

    src = str(tmp_path / "lines")
    # 3 files -> 3 micro-batches: the count must accumulate across them
    golden_lines.repartition(3).write.parquet(src)
    for m in (1, 3):
        stream = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = (
            streaming_pair_counts(stream, m=m)
            .writeStream.format("memory")
            .queryName(f"pairs_m{m}")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / f"ckpt_pairs{m}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            tuple(r)
            for r in spark.sql(f"SELECT * FROM pairs_m{m}").collect()
        }
        expect = {tuple(r) for r in pair_counts(golden_lines, m=m).collect()}
        assert got == expect and got, f"m={m}"


def test_streaming_neighbor_counts_equals_batch_when_drained(
    spark, golden_lines, tmp_path
):
    """Streaming stripes (flat form): drained symmetric neighbor counts
    equal the batch neighbor_counts edge-for-edge; the batch map rollup
    applied to the drained output equals batch stripes exactly."""
    from pyspark.sql import functions as F

    from big_data_hadoop_spark.operators.cooccur import (
        neighbor_counts,
        stripes,
    )
    from big_data_hadoop_spark.streaming import streaming_neighbor_counts

    src = str(tmp_path / "lines_nb")
    golden_lines.repartition(3).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        streaming_neighbor_counts(stream, m=1)
        .writeStream.format("memory")
        .queryName("nb_m1")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_nb"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    drained = spark.sql("SELECT * FROM nb_m1")
    got = {tuple(r) for r in drained.collect()}
    expect = {tuple(r) for r in neighbor_counts(golden_lines, m=1).collect()}
    assert got == expect and got
    # presentation-time rollup of the drained edges == batch stripes
    rolled = {
        (r.category, r.token, tuple(sorted(r.stripe.items())), r.mass)
        for r in drained.groupBy("category", "token")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("neighbor", "cnt")))
            ).alias("stripe"),
            F.sum("cnt").alias("mass"),
        )
        .collect()
    }
    batch = {
        (r.category, r.token, tuple(sorted(r.stripe.items())), r.mass)
        for r in stripes(golden_lines, m=1, keep_empty=False).collect()
    }
    assert rolled == batch


def test_streaming_topk_equals_batch_when_drained(spark, golden_lines, tmp_path):
    """SparkWordCount's top-K as a stream: drained complete-mode output
    must equal batch top_k exactly, including the deterministic
    (cnt DESC, token ASC) tie-break across micro-batch boundaries."""
    from big_data_hadoop_spark.operators.counts import token_counts, top_k
    from big_data_hadoop_spark.streaming import streaming_topk_words

    src = str(tmp_path / "lines_topk")
    golden_lines.repartition(3).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        streaming_topk_words(stream, k=5)
        .writeStream.format("memory")
        .queryName("topk_words")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_topk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [
        tuple(r)
        for r in spark.sql(
            "SELECT * FROM topk_words ORDER BY cnt DESC, token ASC"
        ).collect()
    ]
    expect = [
        tuple(r)
        for r in top_k(
            token_counts(golden_lines, lowercase=True, category="word"), k=5
        ).collect()
    ]
    assert got == expect and len(got) == 5


def test_streaming_media_meta_equals_batch_when_drained(spark, tmp_path):
    """The multimodal operators are stateless mapInPandas passes, so they
    must stream unchanged: drained metadata + audio features over a media
    stream equal the batch run on the same files."""
    import struct as _struct

    from big_data_hadoop_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_audio_features,
        extract_media_meta,
    )

    data = _struct.pack("<100h", *(((i * 53) % 32768 - 16384) for i in range(100)))
    fmt = _struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"data" + _struct.pack("<I", len(data)) + data
    )
    wav = b"RIFF" + _struct.pack("<I", len(body)) + body
    rows = [
        (1, "audio/wav", bytearray(wav)),
        (2, "image/jpeg", bytearray(b"\xff\xd8\xffnotreally")),
        (3, "text/plain", bytearray(b"hello media")),
    ]
    src = str(tmp_path / "media_src")
    batch = spark.createDataFrame(rows, MEDIA_SCHEMA)
    batch.write.parquet(src)

    stream = spark.readStream.schema(MEDIA_SCHEMA).parquet(src)
    for name, op in (("meta_s", extract_media_meta), ("audio_s", extract_audio_features)):
        q = (
            op(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()}
        expect = {tuple(r) for r in op(batch).collect()}
        assert got == expect and got, name


def test_streaming_dedup_state_survives_restart(spark, tmp_path):
    """Checkpoint recovery: a second availableNow run over the SAME
    checkpoint must resume the dedup state — a key that passed in run 1
    is suppressed when it reappears in new files during run 2, and
    nothing from run 1 is re-emitted."""
    from big_data_hadoop_spark.streaming import streaming_exact_dedup

    src = tmp_path / "dd_restart_src"
    src.mkdir()
    ckpt = str(tmp_path / "dd_restart_ckpt")
    out = "dd_restart"

    def write_batch(name, rows):
        spark.createDataFrame(
            rows, "row_id long, ts timestamp, content_sha string"
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / name))
        part = next((tmp_path / name).glob("part-*.parquet"))
        import shutil

        shutil.copy(part, src / f"{name}.parquet")

    sink = str(tmp_path / "dd_restart_out")

    def run_once():
        from big_data_hadoop_spark.streaming import write_stream_parquet

        stream = spark.readStream.schema(
            "row_id long, ts timestamp, content_sha string"
        ).parquet(str(src))
        q = write_stream_parquet(
            streaming_exact_dedup(stream, watermark="2 hours"), sink, ckpt
        )
        q.awaitTermination(120)
        return {
            (r.row_id, r.content_sha)
            for r in spark.read.parquet(sink).collect()
        }

    from datetime import datetime

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    write_batch("b1", [(1, t0, "A"), (2, t0, "B"), (3, t0, "A")])
    first = run_once()
    assert {s for _, s in first} == {"A", "B"} and len(first) == 2

    # run 2: same checkpoint, new file with an old key (A) + a new key (C)
    write_batch("b2", [(10, t0, "A"), (11, t0, "C")])
    second = run_once()
    # run 2 appends ONLY what run 1 hadn't admitted: C passes, the
    # re-arrived A is suppressed by the RECOVERED state, run-1 rows are
    # not re-emitted
    assert second - first == {(11, "C")}, second
    assert first <= second and len(second) == 3


def test_stateless_hygiene_ops_stream_unchanged(spark, tmp_path):
    """normalize_text and compression_signals are narrow/stateless
    mapInPandas transforms — applied to a readStream frame unchanged,
    the drained output must equal the batch result exactly."""
    from big_data_hadoop_spark.operators.texthygiene import (
        compression_signals,
        normalize_text,
    )
    from big_data_hadoop_spark.sources.io import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    src = str(tmp_path / "hyg_src")
    docs.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)

    q = (
        compression_signals(normalize_text(stream))
        .writeStream.format("memory")
        .queryName("hyg_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r) for r in spark.sql("SELECT * FROM hyg_stream").collect()
    }
    expect = {
        tuple(r)
        for r in compression_signals(normalize_text(docs)).collect()
    }
    assert got == expect and len(got) == docs.count()


def test_streaming_interval_join_inner_equals_batch(spark, tmp_path):
    """Drained stream-stream inner join (view ⋈ click, same user, click
    within 30 minutes of the view) must equal the batch join with the
    identical predicate."""
    from big_data_hadoop_spark.streaming import streaming_interval_join

    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    views_b = events.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("view_id")
    )
    clicks_b = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("r_ts"), F.col("event_id").alias("click_id")
    )
    vsrc, csrc = str(tmp_path / "views"), str(tmp_path / "clicks")
    views_b.write.parquet(vsrc)
    clicks_b.write.parquet(csrc)
    vs = spark.readStream.schema(views_b.schema).parquet(vsrc)
    cs = spark.readStream.schema(clicks_b.schema).parquet(csrc)

    joined = streaming_interval_join(
        vs, cs, key="user_id", max_delay="30 minutes", watermark="100 days"
    ).select("view_id", "click_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_inner")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.view_id, r.click_id)
        for r in spark.sql("SELECT * FROM ssj_inner").collect()
    }
    expect = {
        (r.view_id, r.click_id)
        for r in views_b.join(
            clicks_b,
            (views_b.user_id == clicks_b.user_id)
            & (clicks_b.r_ts >= views_b.l_ts)
            & (clicks_b.r_ts <= views_b.l_ts + F.expr("INTERVAL 30 minutes")),
        ).collect()
    }
    assert got == expect and len(got) > 0


def test_streaming_interval_join_left_outer_flushes_after_watermark(
    spark, tmp_path
):
    """Left-outer semantics: matches emit on the first drain; unmatched
    left rows emit with NULL right columns only after a later run's
    watermark proves no match can arrive (restart pattern over one
    checkpoint)."""
    from datetime import datetime, timedelta

    from big_data_hadoop_spark.streaming import streaming_interval_join

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    lsrc, rsrc = tmp_path / "lo_l", tmp_path / "lo_r"
    lsrc.mkdir()
    rsrc.mkdir()
    ckpt = str(tmp_path / "lo_ckpt")
    sink = str(tmp_path / "lo_out")

    def write_file(dirp, name, rows, schema):
        df = spark.createDataFrame(rows, schema).coalesce(1)
        staged = tmp_path / f"_stage_{dirp.name}_{name}"
        df.write.mode("overwrite").parquet(str(staged))
        import shutil

        part = next(staged.glob("part-*.parquet"))
        shutil.copy(part, dirp / f"{name}.parquet")

    l_schema = "user_id long, l_ts timestamp, view_id long"
    r_schema = "user_id long, r_ts timestamp, click_id long"
    # user 1 matched within 10 min; user 2 unmatched
    write_file(lsrc, "b1", [(1, t0, 100), (2, t0, 200)], l_schema)
    write_file(rsrc, "b1", [(1, t0 + timedelta(minutes=5), 900)], r_schema)

    def run_once():
        from big_data_hadoop_spark.streaming import write_stream_parquet

        ls = spark.readStream.schema(l_schema).parquet(str(lsrc))
        rs = spark.readStream.schema(r_schema).parquet(str(rsrc))
        j = streaming_interval_join(
            ls, rs, key="user_id", max_delay="10 minutes",
            watermark="1 minute", how="left_outer",
        ).select("view_id", "click_id")
        q = write_stream_parquet(j, sink, ckpt)
        q.awaitTermination(120)
        return {
            (r.view_id, r.click_id)
            for r in spark.read.parquet(sink).collect()
        }

    first = run_once()
    assert (100, 900) in first
    # advance the watermark far past t0's band with a late file each side
    t_far = t0 + timedelta(hours=6)
    write_file(lsrc, "b2", [(9, t_far, 901)], l_schema)
    write_file(rsrc, "b2", [(9, t_far + timedelta(minutes=1), 902)], r_schema)
    second = run_once()
    assert (200, None) in second, second
    assert (100, 900) in second and (901, 902) in second


def test_streaming_interval_join_rejects_unknown_how(spark):
    import pytest as _pytest

    from big_data_hadoop_spark.streaming import streaming_interval_join

    df = spark.range(1).select(
        F.col("id").alias("user_id"),
        F.current_timestamp().alias("l_ts"),
    )
    with _pytest.raises(ValueError):
        streaming_interval_join(df, df, how="full_outer")


def test_streaming_ingest_bridge_equals_batch_manifest_fold(spark, tmp_path):
    """The ingest bridge end-to-end (VERDICT r5 #7): file drops →
    ``read_files_stream`` → continuous agg-state fold must produce the
    SAME state as the batch manifest path (``read_incremental`` →
    ``maintain_agg_state``) over the same drops — the file source's
    checkpoint log and the batch manifest are twins of one contract
    (each file folded exactly once across restarts)."""
    import shutil

    from big_data_hadoop_spark.operators.sketches import (
        agg_state_finalize,
        maintain_agg_state,
        streaming_agg_state,
    )
    from big_data_hadoop_spark.sources.io import read_incremental
    from big_data_hadoop_spark.streaming import read_files_stream
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "source", "n_chars"
    )
    s_src, b_src = tmp_path / "br_s_src", tmp_path / "br_b_src"
    s_src.mkdir(), b_src.mkdir()
    s_state = str(tmp_path / "br_s_state")
    b_state = str(tmp_path / "br_b_state")
    ckpt = str(tmp_path / "br_ckpt")
    manifest = str(tmp_path / "br_manifest")

    def add(name, pred):
        staged = tmp_path / f"_br_{name}"
        docs.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            str(staged)
        )
        part = next(staged.glob("part-*.parquet"))
        shutil.copy(part, s_src / f"{name}.parquet")
        shutil.copy(part, b_src / f"{name}.parquet")

    def drain_stream():
        stream = read_files_stream(spark, str(s_src))
        q = streaming_agg_state(
            stream, s_state, ckpt, ["source"], "n_chars",
            distinct_col="doc_id",
        )
        q.awaitTermination(120)

    def batch_ingest():
        df, commit = read_incremental(spark, str(b_src), manifest)
        if df is None:
            return
        maintain_agg_state(
            df.select("doc_id", "source", "n_chars"),
            b_state,
            ["source"],
            "n_chars",
            distinct_col="doc_id",
        )
        commit()

    add("b1", F.col("doc_id") < 200)
    drain_stream()
    batch_ingest()
    add("b2", F.col("doc_id") >= 200)
    drain_stream()
    batch_ingest()
    batch_ingest()  # idle poll: nothing new, state untouched

    got = {
        r.source: r
        for r in agg_state_finalize(spark.read.parquet(s_state)).collect()
    }
    want = {
        r.source: r
        for r in agg_state_finalize(spark.read.parquet(b_state)).collect()
    }
    assert got.keys() == want.keys() and len(got) > 1
    for k in got:
        assert got[k].n_rows == want[k].n_rows, k
        assert got[k].total == want[k].total, k
        assert got[k].vmin == want[k].vmin and got[k].vmax == want[k].vmax
        assert got[k].n_distinct_approx == want[k].n_distinct_approx, k


def test_streaming_funnel_drained_equals_batch(spark, tmp_path):
    """Watermark-buffered streaming funnel == batch funnel_progress on
    the same events, exactly, for every user (a far-future sentinel
    event pushes the watermark so ALL users flush). Events arrive in
    THREE time-ordered files with one file per micro-batch, so later
    batches find the watermark already past earlier events — the
    incremental ready/hold fold and milestone emission genuinely run
    (review finding: a single-file layout buffered everything and only
    ever exercised the timeout branch)."""
    import shutil
    import time
    from datetime import datetime, timedelta, timezone

    import duckdb

    from pyspark.sql import functions as F2

    from big_data_hadoop_spark.operators.relational import funnel_progress
    from big_data_hadoop_spark.streaming import (
        read_events_stream,
        streaming_funnel,
    )
    from tests.conftest import SF_SMOKE

    steps = ["view", "click", "purchase"]
    within = 6 * 3600
    src = tmp_path / "fun_src"
    src.mkdir()
    ev_all = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    lo, hi = ev_all.agg(
        F2.min("ts").cast("timestamp"), F2.max("ts").cast("timestamp")
    ).collect()[0]
    span = hi - lo
    cuts = [lo + span / 3, lo + 2 * span / 3]
    slices = [
        ev_all.filter(F2.col("ts").cast("timestamp") <= F2.lit(cuts[0])),
        ev_all.filter(
            (F2.col("ts").cast("timestamp") > F2.lit(cuts[0]))
            & (F2.col("ts").cast("timestamp") <= F2.lit(cuts[1]))
        ),
        ev_all.filter(F2.col("ts").cast("timestamp") > F2.lit(cuts[1])),
    ]
    for i, part in enumerate(slices):
        staged = tmp_path / f"_slice{i}"
        part.coalesce(1).write.mode("overwrite").parquet(str(staged))
        shutil.copy(
            next(staged.glob("part-*.parquet")), src / f"part-{i}.parquet"
        )
        time.sleep(1.1)  # distinct mtimes -> deterministic batch order
    # sentinel: one far-future view for a dummy user pushes the
    # watermark past every real event + horizon in the final batch
    schema = ev_all.schema
    max_us = duckdb.sql(
        f"SELECT max(epoch_us(ts)) FROM '{SF_SMOKE}/events.parquet'"
    ).fetchone()[0]
    max_dt = datetime.fromtimestamp(max_us / 1e6, tz=timezone.utc).replace(
        tzinfo=None
    )
    spark.createDataFrame(
        [(10**6, max_dt + timedelta(days=30), 999999, "view", 0.0, "{}")],
        schema,
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "_sen"))
    shutil.copy(
        next((tmp_path / "_sen").glob("part-*.parquet")),
        src / "part-9.parquet",
    )

    q = (
        streaming_funnel(
            read_events_stream(spark, str(src), maxFilesPerTrigger="1"),
            steps,
            within_seconds=within,
            watermark="10 minutes",
        )
        .writeStream.format("memory")
        .queryName("funnel_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "fun_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    # the incremental path must actually have run: completions
    # discovered while data was still flowing emit final=false rows
    milestones = {
        r.user
        for r in spark.sql(
            "SELECT user FROM funnel_out WHERE NOT final"
        ).collect()
    }
    assert milestones, "incremental fold never fired a milestone"
    # exactly one final row per user (review finding: a dict would
    # silently collapse a double-final regression)
    dupes = spark.sql(
        "SELECT user FROM funnel_out WHERE final "
        "GROUP BY user HAVING count(*) > 1"
    ).collect()
    assert not dupes, dupes
    finals = {
        r.user: (r.reached, r.completed, r.first_us, r.last_us)
        for r in spark.sql(
            "SELECT * FROM funnel_out WHERE final AND user != 999999"
        ).collect()
    }
    prog = funnel_progress(ev_all, steps, within_seconds=within).select(
        "user",
        "reached",
        "completed",
        F2.unix_micros("first_ts").alias("fu"),
        F2.unix_micros("last_ts").alias("lu"),
    )
    batch = {
        r.user: (r.reached, r.completed, r.fu, r.lu) for r in prog.collect()
    }
    assert set(finals) == set(batch)
    assert finals == batch
    assert milestones <= {u for u, (_, c, _, _) in batch.items() if c}


def test_streaming_upsert_cdc_equals_latest_per_key(spark, tmp_path):
    """CDC MERGE sink end-to-end: change rows dropped as files across
    two drains (including an OUT-OF-ORDER late file carrying older
    versions) must leave the table equal to the newest-version row per
    key over ALL input — the out-of-order batch cannot regress a row,
    and a re-drain over the same checkpoint is a no-op."""
    import shutil
    import time

    from big_data_hadoop_spark.streaming import streaming_upsert

    src = tmp_path / "cdc_src"
    src.mkdir()
    table = str(tmp_path / "cdc_table")
    ckpt = str(tmp_path / "cdc_ckpt")
    schema = "id long, ver long, v string"

    def add(name, rows):
        staged = tmp_path / f"_cdc_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(staged))
        shutil.copy(
            next(staged.glob("part-*.parquet")), src / f"{name}.parquet"
        )
        time.sleep(1.1)

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = streaming_upsert(
            stream, table, ["id"], "ver", ckpt
        )
        q.awaitTermination(120)

    # batch 1: initial inserts, including an in-batch double change
    # for id=1 (ver 1 then 2 -> 2 must win)
    add("b1", [(1, 1, "a1"), (1, 2, "a2"), (2, 1, "b1"), (3, 1, "c1")])
    drain()
    got = {(r.id, r.ver, r.v) for r in spark.read.parquet(table).collect()}
    assert got == {(1, 2, "a2"), (2, 1, "b1"), (3, 1, "c1")}

    # batch 2: a newer change for id=2, a LATE/out-of-order older
    # change for id=1 (must NOT regress), and a new key
    add("b2", [(2, 5, "b5"), (1, 1, "stale"), (4, 1, "d1")])
    drain()
    got = {(r.id, r.ver, r.v) for r in spark.read.parquet(table).collect()}
    assert got == {(1, 2, "a2"), (2, 5, "b5"), (3, 1, "c1"), (4, 1, "d1")}

    # idle re-drain: nothing new, table untouched
    drain()
    got2 = {(r.id, r.ver, r.v) for r in spark.read.parquet(table).collect()}
    assert got2 == got


def test_streaming_upsert_guards(spark, tmp_path):
    """Review-batch pins for the CDC sink: (a) a crash that left only
    the '.old' generation is recovered BEFORE the newer-than filter
    decides anything, so a replayed older row still cannot regress;
    (b) NULL keys in the change stream are refused loudly; (c) a
    non-key-unique stored table (foreign writer) does not fan out into
    persistent duplicate rows; (d) missing columns fail at wiring
    time."""
    import os
    import shutil

    import pytest as _pytest

    from big_data_hadoop_spark.streaming import streaming_upsert

    schema = "id long, ver long, v string"

    def drop(src, name, rows):
        staged = tmp_path / f"_g_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(staged))
        shutil.copy(
            next(staged.glob("part-*.parquet")), src / f"{name}.parquet"
        )

    # (a) crash-window recovery before the exists() probe
    src = tmp_path / "g1_src"
    src.mkdir()
    table = str(tmp_path / "g1_table")
    spark.createDataFrame(
        [(1, 5, "current")], schema
    ).write.parquet(table)
    os.rename(table, table + ".old")  # killed inside _swap_in
    drop(src, "late", [(1, 1, "stale")])
    q = streaming_upsert(
        spark.readStream.schema(schema).parquet(str(src)),
        table, ["id"], "ver", str(tmp_path / "g1_ckpt"),
    )
    q.awaitTermination(120)
    got = {(r.id, r.ver, r.v) for r in spark.read.parquet(table).collect()}
    assert got == {(1, 5, "current")}  # recovered, not regressed

    # (b) NULL keys refused (the query fails rather than corrupting)
    src2 = tmp_path / "g2_src"
    src2.mkdir()
    drop(src2, "n", [(None, 1, "x")])
    q2 = streaming_upsert(
        spark.readStream.schema(schema).parquet(str(src2)),
        str(tmp_path / "g2_table"), ["id"], "ver",
        str(tmp_path / "g2_ckpt"),
    )
    with _pytest.raises(Exception, match="NULL key"):
        q2.awaitTermination(120)
        q2.processAllAvailable()

    # (c) stored duplicates collapse instead of persisting
    src3 = tmp_path / "g3_src"
    src3.mkdir()
    table3 = str(tmp_path / "g3_table")
    spark.createDataFrame(
        [(1, 1, "dupA"), (1, 2, "dupB")], schema  # foreign writer
    ).write.parquet(table3)
    drop(src3, "c", [(1, 9, "fix")])
    q3 = streaming_upsert(
        spark.readStream.schema(schema).parquet(str(src3)),
        table3, ["id"], "ver", str(tmp_path / "g3_ckpt"),
    )
    q3.awaitTermination(120)
    got3 = [tuple(r) for r in spark.read.parquet(table3).collect()]
    assert got3 == [(1, 9, "fix")]

    # (d) wiring-time validation
    stream = spark.readStream.schema(schema).parquet(str(src3))
    with _pytest.raises(ValueError, match="lacks columns"):
        streaming_upsert(
            stream, table3, ["id"], "version", str(tmp_path / "g4")
        )
    with _pytest.raises(ValueError, match="key column"):
        streaming_upsert(
            stream, table3, ["id"], "id", str(tmp_path / "g5")
        )


def test_reconcile_flags_inplace_overwrite_not_appends(spark, tmp_path):
    """``reconcile_files_stream`` turns the documented batch↔stream
    ingest divergence into a report: a same-path in-place overwrite
    (which the file source's path-keyed log silently skips forever) is
    flagged; appended-then-ingested files and not-yet-overwritten files
    are not."""
    import os
    import shutil
    import time

    from big_data_hadoop_spark.streaming import (
        read_files_stream,
        reconcile_files_stream,
    )

    src = tmp_path / "rc_src"
    src.mkdir()
    ckpt = str(tmp_path / "rc_ckpt")
    sink = str(tmp_path / "rc_sink")

    def stage(name, ids):
        staged = tmp_path / f"_rc_{name}"
        spark.createDataFrame(
            [(i,) for i in ids], "id long"
        ).coalesce(1).write.mode("overwrite").parquet(str(staged))
        part = next(staged.glob("part-*.parquet"))
        shutil.copy(part, src / f"{name}.parquet")

    def drain():
        q = (
            read_files_stream(spark, str(src))
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    stage("a", [1, 2])
    stage("b", [3])
    drain()
    # clean landing zone: nothing to report
    assert reconcile_files_stream(spark, str(src), ckpt).count() == 0

    # violate the append-only contract: overwrite a.parquet in place
    # with new bytes and a clearly newer mtime
    stage("a", [1, 2, 4, 5])
    future = time.time() + 30
    os.utime(src / "a.parquet", (future, future))
    stage("c", [6])  # a legitimate append alongside the violation
    drain()
    # the stream picked up c but silently skipped the overwritten a
    assert spark.read.parquet(sink).count() == 2 + 1 + 1  # a(v1)+b+c
    flagged = reconcile_files_stream(spark, str(src), ckpt).collect()
    assert [os.path.basename(r.path) for r in flagged] == ["a.parquet"]
    assert flagged[0].current_mtime_ms > flagged[0].logged_mtime_ms


def test_reconcile_before_first_trigger_is_empty(spark, tmp_path):
    """A scheduled reconcile firing before the stream's first trigger
    (no sources/ log yet) reports 'nothing ingested, nothing diverged'
    instead of raising (review finding)."""
    from big_data_hadoop_spark.streaming.pipelines import (
        reconcile_files_stream,
    )

    land = str(tmp_path / "land")
    spark.range(3).coalesce(1).write.parquet(land)
    out = reconcile_files_stream(
        spark, land, str(tmp_path / "ckpt-never-used")
    )
    assert out.count() == 0
    assert out.columns == [
        "path",
        "length",
        "logged_mtime_ms",
        "current_mtime_ms",
    ]


def test_streaming_upsert_maintains_index(spark, tmp_path):
    """The CDC sink's stats_path forwards to the batch upsert: after
    drain, the persisted zone-map index is in step and strict indexed
    reads work with no manual refresh."""
    from big_data_hadoop_spark.sources.layout import (
        maintain_file_stats,
        read_pruned_indexed,
    )
    from big_data_hadoop_spark.streaming.pipelines import streaming_upsert

    ds = str(tmp_path / "cdcix_ds")
    idx = str(tmp_path / "cdcix_idx")
    land = str(tmp_path / "cdcix_land")
    ckpt = str(tmp_path / "cdcix_ckpt")
    spark.createDataFrame(
        [(1, 10, 100.0), (2, 10, 200.0)], "k long, v long, x double"
    ).write.parquet(ds)
    maintain_file_stats(spark, ds, idx, cols=["x"])
    spark.createDataFrame(
        [(2, 20, 250.0), (3, 20, 300.0)], "k long, v long, x double"
    ).coalesce(1).write.parquet(land)
    stream = spark.readStream.schema("k long, v long, x double").parquet(land)
    q = streaming_upsert(
        stream, ds, ["k"], "v", ckpt, stats_path=idx
    )
    q.awaitTermination(120)
    got = sorted(
        (r.k, r.x)
        for r in read_pruned_indexed(spark, ds, idx, "x", lo=200.0, hi=400.0).collect()
    )
    assert got == [(2, 250.0), (3, 300.0)]
