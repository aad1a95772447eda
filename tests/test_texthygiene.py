"""Text hygiene (``operators.texthygiene``): normalization against
stdlib ``unicodedata`` directly, compression signals against a zlib
replication, and schema/pass-through invariants."""

from __future__ import annotations

import unicodedata
import zlib

import pytest

from big_data_hadoop_spark.operators.texthygiene import (
    compression_signals,
    normalize_text,
)
from big_data_hadoop_spark.sources.io import load_table

SF = "/root/testdata/sf0.001"


def test_normalize_nfkc_and_control_strip(spark):
    rows = [
        (1, "café ﬁne"),          # combining acute + fi ligature
        (2, "a\x00b\x07c\td\ne"),            # NUL/BEL stripped, tab/LF kept
        (3, None),
        (4, "① ½"),                # circled one, vulgar half
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in normalize_text(df).collect()}
    assert got[1] == unicodedata.normalize("NFKC", rows[0][1])
    assert got[1] == "café fine"
    assert got[2] == "abc\td\ne"
    assert got[3] is None
    assert got[4] == unicodedata.normalize("NFKC", rows[3][1])
    with pytest.raises(ValueError):
        normalize_text(df, form="NFX")


def test_normalize_preserves_other_columns_and_schema(spark):
    docs = load_table(spark, SF, "documents")
    out = normalize_text(docs, form="NFC", strip_control=False)
    assert out.columns == docs.columns
    assert out.count() == docs.count()
    # NFC on already-clean ASCII-ish text is identity
    a = {r["doc_id"]: r["text"] for r in docs.collect()}
    b = {r["doc_id"]: r["text"] for r in out.collect()}
    assert a == b


def test_compression_signals_match_zlib(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    got = {
        r["doc_id"]: (r["n_bytes"], r["n_deflate_bytes"], r["compression_ratio"])
        for r in compression_signals(docs).collect()
    }
    for r in docs.collect():
        raw = r["text"].encode("utf-8")
        z = len(zlib.compress(raw, 6))
        nb, nz, ratio = got[r["doc_id"]]
        assert (nb, nz) == (len(raw), z)
        assert ratio == pytest.approx(z / len(raw))


def test_compression_signals_flag_both_tails(spark):
    import os

    junk = "".join(chr(33 + (b % 90)) for b in os.urandom(4000))
    rows = [
        (1, "spam " * 1000),   # templated -> highly compressible
        (2, junk),             # random -> incompressible
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["compression_ratio"] for r in compression_signals(df).collect()}
    assert got[1] < 0.05
    assert got[2] > 0.7
    assert got[3] is None
    with pytest.raises(ValueError):
        compression_signals(df, level=11)
