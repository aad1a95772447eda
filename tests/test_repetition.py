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


def py_repetition(text: str) -> dict[str, float]:
    lines = [l for l in text.split("\n") if l != ""]
    n_lines = len(lines)
    seen: set[str] = set()
    dup_lines = 0
    dup_chars = 0
    tot_line_chars = sum(len(l) for l in lines)
    for l in lines:
        if l in seen:
            dup_lines += 1
            dup_chars += len(l)
        else:
            seen.add(l)
    out = {
        "dup_line_frac": dup_lines / max(n_lines, 1),
        "dup_line_char_frac": dup_chars / max(tot_line_chars, 1),
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
