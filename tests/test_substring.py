"""Value oracle for ``operators.substring`` (exact duplicated-substring
detection/removal): a pure-Python replication of the documented
keep-first window contract, compared span-for-span and byte-for-byte
against the Spark output on crafted corpora and real sf0.001 documents.
"""

from __future__ import annotations

import pytest

from big_data_hadoop_spark.operators.substring import (
    duplicate_spans,
    remove_duplicate_spans,
)
from big_data_hadoop_spark.sources.io import load_table

SF_SMOKE = "/root/testdata/sf0.001"


def py_redundant_starts(docs: dict[int, str], k: int) -> dict[int, list[int]]:
    first: dict[str, tuple[int, int]] = {}
    for doc_id in sorted(docs):
        text = docs[doc_id]
        for pos in range(len(text) - k + 1):
            gram = text[pos : pos + k]
            if gram not in first:
                first[gram] = (doc_id, pos)
    out: dict[int, list[int]] = {}
    for doc_id in sorted(docs):
        text = docs[doc_id]
        starts = [
            pos
            for pos in range(len(text) - k + 1)
            if first[text[pos : pos + k]] != (doc_id, pos)
        ]
        if starts:
            out[doc_id] = starts
    return out


def py_merge(starts: list[int], k: int) -> list[tuple[int, int]]:
    spans: list[list[int]] = []
    for s in starts:
        if spans and s <= spans[-1][1]:
            spans[-1][1] = max(spans[-1][1], s + k)
        else:
            spans.append([s, s + k])
    return [(s, e - s) for s, e in spans]


def py_spans(docs: dict[int, str], k: int) -> set[tuple[int, int, int]]:
    return {
        (doc_id, s, ln)
        for doc_id, starts in py_redundant_starts(docs, k).items()
        for s, ln in py_merge(starts, k)
    }


def py_removed(docs: dict[int, str], k: int) -> dict[int, str]:
    red = py_redundant_starts(docs, k)
    out = {}
    for doc_id, text in docs.items():
        kept, prev = [], 0
        for s, ln in py_merge(red.get(doc_id, []), k):
            kept.append(text[prev:s])
            prev = s + ln
        kept.append(text[prev:])
        out[doc_id] = "".join(kept)
    return out


BOILER = "Subscribe to our newsletter for the latest updates and offers! "
CORPUS = {
    0: BOILER + "Alpha document body with its own unique words here.",
    1: BOILER + "Beta document body, different enough from alpha text.",
    2: "A fresh start. " + BOILER + "Gamma trailer text closes this one.",
    3: "repeat me repeat me repeat me repeat me repeat me repeat me",
    4: "short",
    5: "",
    6: "No duplication lives in this entirely singular sentence at all.",
    7: "xyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxy",
}
K = 20


@pytest.fixture(scope="module")
def crafted(spark):
    return spark.createDataFrame(
        sorted(CORPUS.items()), "doc_id long, text string"
    )


def test_spans_match_python(spark, crafted):
    got = {
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in duplicate_spans(crafted, k=K).collect()
    }
    assert got == py_spans(CORPUS, K)


def test_removal_matches_python(spark, crafted):
    got = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(crafted, k=K).collect()
    }
    assert got == py_removed(CORPUS, K)
    # the shared boilerplate survives exactly once, in the first doc
    assert BOILER in got[0]
    assert BOILER not in got[1] and BOILER not in got[2]
    # untouched docs pass through byte-identical
    assert got[4] == CORPUS[4] and got[5] == CORPUS[5] and got[6] == CORPUS[6]


def test_removal_preserves_other_columns(spark):
    df = spark.createDataFrame(
        [(1, BOILER + "one", "web"), (2, BOILER + "two", "book")],
        "doc_id long, text string, source string",
    )
    out = remove_duplicate_spans(df, k=K)
    assert out.columns == df.columns
    assert {r["source"] for r in out.collect()} == {"web", "book"}


def test_span_invariants(spark, crafted):
    rows = duplicate_spans(crafted, k=K).collect()
    lens = {r["doc_id"]: len(CORPUS[r["doc_id"]]) for r in rows}
    for r in rows:
        assert r["span_len"] >= K
        assert 0 <= r["span_start"]
        assert r["span_start"] + r["span_len"] <= lens[r["doc_id"]]


def test_sf0001_documents_match_python(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    k = 25
    got_spans = {
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in duplicate_spans(docs, k=k).collect()
    }
    assert got_spans == py_spans(texts, k)
    got_txt = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(docs, k=k).collect()
    }
    assert got_txt == py_removed(texts, k)
