"""Value oracle for ``operators.repetition.repetition_signals``.

A pure-Python replication of the documented contract (module docstring of
``operators/repetition.py``), compared row-for-row against the Spark
output on crafted edge-case documents and on real sf0.001 ``documents``
rows — the same verification pattern as the q51+ rows-only tail
(``test_rows_only_values.py``).
"""

from __future__ import annotations

from collections import Counter

import pytest

from big_data_hadoop_spark.operators.repetition import repetition_signals
from big_data_hadoop_spark.sources.io import load_table

SF_SMOKE = "/root/testdata/sf0.001"

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)


def _unit_fracs(units: list[str]) -> tuple[float, float]:
    seen: set[str] = set()
    dups = 0
    dup_chars = 0
    tot_chars = sum(len(u) for u in units)
    for u in units:
        if u in seen:
            dups += 1
            dup_chars += len(u)
        else:
            seen.add(u)
    return dups / max(len(units), 1), dup_chars / max(tot_chars, 1)


def py_repetition(text: str) -> dict[str, float]:
    lines = [l for l in text.split("\n") if l != ""]
    paras = [
        p for p in text.split("\n\n") if p.strip(" \t\n\x0b\f\r") != ""
    ]
    lf, lcf = _unit_fracs(lines)
    pf, pcf = _unit_fracs(paras)
    out = {
        "dup_line_frac": lf,
        "dup_line_char_frac": lcf,
        "dup_para_frac": pf,
        "dup_para_char_frac": pcf,
    }

    toks = [t for t in text.lower().split(" ") if t != ""]
    tlens = [len(t) for t in toks]
    tot = max(sum(tlens), 1)
    for n in TOP_NS:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        c = Counter(grams)
        best = 0
        if c:
            # ties: (count, char length, gram string) descending
            g, cnt = max(
                c.items(), key=lambda kv: (kv[1], len(kv[0]) - (n - 1), kv[0])
            )
            if cnt > 1:
                best = cnt * (len(g) - (n - 1))
        out[f"top_{n}gram_char_frac"] = min(best / tot, 1.0)
    for n in DUP_NS:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        c = Counter(grams)
        covered: set[int] = set()
        for i, g in enumerate(grams):
            if c[g] > 1:
                covered.update(range(i, i + n))
        out[f"dup_{n}gram_char_frac"] = sum(tlens[i] for i in covered) / tot
    return out


EDGE_DOCS = [
    (0, ""),
    (1, "solo"),
    (2, "a a a a a a a a a a a a"),
    (3, "the cat sat on the mat the cat sat on the rug"),
    (4, "x\nx\nx\ny\n\n\nz z z"),
    (5, "one two three four five six seven eight nine ten"),
    (6, "ab cd ab cd ab cd ab cd ab cd ab cd"),
    (7, "Mixed CASE mixed case MIXED case tokens here now ok"),
    (8, "  leading and   multiple    spaces and trailing   "),
    (9, "line one\nline two\nline one\nline two\nline three"),
    (10, "p q r s t u v w p q r s t u v w p q r s t u v w"),
    (11, "\n\n\n"),
    (12, "tie atie tie atie btie btie"),
    (13, "para one here\n\npara two here\n\npara one here\n\nlast"),
    (14, "same\nsame\n\nsame\nsame\n\nother"),
    (15, "  \n\n\t\n\nreal paragraph"),
    (16, "\t\n\n\t\n\nx\n\nx"),
]


@pytest.fixture(scope="module")
def spark_out(spark):
    docs = spark.createDataFrame(EDGE_DOCS, "doc_id long, text string")
    return {
        r["doc_id"]: r.asDict()
        for r in repetition_signals(docs).collect()
    }


def test_edge_docs_match_python(spark_out):
    for doc_id, text in EDGE_DOCS:
        expect = py_repetition(text)
        got = spark_out[doc_id]
        for k, v in expect.items():
            assert got[k] == pytest.approx(v, abs=1e-12), (doc_id, k, got[k], v)


def test_fraction_bounds(spark_out):
    for doc_id, row in spark_out.items():
        for k, v in row.items():
            if k == "doc_id":
                continue
            assert 0.0 <= v <= 1.0, (doc_id, k, v)


def test_sf0001_documents_match_python(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {
        r["doc_id"]: r.asDict() for r in repetition_signals(docs).collect()
    }
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        expect = py_repetition(text)
        for k, v in expect.items():
            assert got[doc_id][k] == pytest.approx(v, abs=1e-12), (doc_id, k)


def test_row_count_preserved(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    assert repetition_signals(docs).count() == docs.count()


def test_gate_column_matches_signals_output(spark):
    """dup_line_frac_col (the fusable gate form) must equal the
    repetition_signals output column row-for-row."""
    from pyspark.sql import functions as F

    from big_data_hadoop_spark.operators.repetition import dup_line_frac_col

    docs = spark.createDataFrame(EDGE_DOCS, "doc_id long, text string")
    gate = {
        r["doc_id"]: r["f"]
        for r in docs.select(
            "doc_id", dup_line_frac_col().alias("f")
        ).collect()
    }
    sig = {
        r["doc_id"]: r["dup_line_frac"]
        for r in repetition_signals(docs).collect()
    }
    assert gate == sig


def test_curate_repetition_gate_composes(spark):
    """curate_training_data(max_dup_line_frac=t) == manual pre-filter +
    default funnel, and the gate actually drops a repetitive doc."""
    from big_data_hadoop_spark.operators.repetition import dup_line_frac_col
    from big_data_hadoop_spark.pipeline import curate_training_data

    base = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    noisy = base.unionByName(
        spark.createDataFrame(
            [(990001, "spam line alpha beta gamma delta\n" * 40)],
            "doc_id long, text string",
        )
    )
    t = 0.5
    got = sorted(
        r["doc_id"]
        for r in curate_training_data(noisy, max_dup_line_frac=t).collect()
    )
    expect = sorted(
        r["doc_id"]
        for r in curate_training_data(
            noisy.filter(dup_line_frac_col() <= t)
        ).collect()
    )
    assert got == expect
    assert 990001 not in got


def test_curate_span_strip_composes(spark):
    """curate_training_data(strip_dup_spans_k=k) == remove spans first,
    then the default funnel."""
    from big_data_hadoop_spark.operators.substring import (
        remove_duplicate_spans,
    )
    from big_data_hadoop_spark.pipeline import curate_training_data

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    k = 25
    got = {
        r["doc_id"]: r["text"]
        for r in curate_training_data(docs, strip_dup_spans_k=k).collect()
    }
    expect = {
        r["doc_id"]: r["text"]
        for r in curate_training_data(
            remove_duplicate_spans(docs, k=k)
        ).collect()
    }
    assert got == expect


def test_streaming_curate_repetition_gate_matches_batch(spark, tmp_path):
    """The streaming twin with the repetition gate admits exactly the
    batch gate's documents (drained comparison, gates only — dedup off
    via unique texts)."""
    from pyspark.sql import functions as F

    from big_data_hadoop_spark.pipeline import curation_gate
    from big_data_hadoop_spark.streaming.pipelines import streaming_curate

    rows = [
        (i, f"2024-01-01 00:00:{i:02d}", text)
        for i, (_, text) in enumerate(EDGE_DOCS)
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(
        rows, "doc_id long, ts string, text string"
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(src)
    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)
    out = streaming_curate(stream, max_dup_line_frac=0.3, min_tokens=1)
    q = (
        out.writeStream.format("memory")
        .queryName("cur_rep_gate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r["doc_id"] for r in spark.sql("select * from cur_rep_gate").collect()
    )
    expect = sorted(
        r["doc_id"]
        for r in static.filter(
            curation_gate(min_tokens=1, max_dup_line_frac=0.3)
        ).collect()
    )
    assert got == expect
