"""BPE tokenizer (``operators.bpe``): merge learning pinned against the
worked example from Sennrich et al. 2016 (hand-derived under the
documented deterministic tie-break), encode golden + roundtrip
properties, and corpus-scale sanity."""

from __future__ import annotations

import pytest

from big_data_hadoop_spark.operators.bpe import (
    EOW,
    BPEModel,
    bpe_apply_word,
    bpe_encode,
    bpe_train,
)
from big_data_hadoop_spark.sources.io import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def paper_corpus(spark):
    """Word frequencies of the paper's example: low:5 lower:2 newest:6
    widest:3 — spread across documents to exercise the distributed
    count."""
    rows = [
        (0, "low low low"),
        (1, "low low lower"),
        (2, "lower newest newest newest"),
        (3, "newest newest newest widest"),
        (4, "widest widest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_merges_match_hand_derivation(spark, paper_corpus):
    model = bpe_train(paper_corpus, n_merges=5)
    assert model.merges == (
        ("e", "s"),
        ("es", "t"),
        ("est", EOW),
        ("l", "o"),
        ("lo", "w"),
    )


def test_encode_golden_and_unknown_chars(spark, paper_corpus):
    model = bpe_train(paper_corpus, n_merges=5)
    assert bpe_apply_word("lowest", model.ranks) == ["low", f"est{EOW}"]
    assert bpe_apply_word("low", model.ranks) == ["low", EOW]
    # unseen characters pass through as single symbols
    assert bpe_apply_word("lox", model.ranks) == ["lo", "x", EOW]
    docs = spark.createDataFrame(
        [(10, "lowest lowest low"), (11, ""), (12, "   ")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bpe_encode(docs, model).collect()}
    assert list(got[10]["pieces"]) == [
        "low", f"est{EOW}", "low", f"est{EOW}", "low", EOW,
    ]
    assert (got[10]["n_tokens"], got[10]["n_pieces"]) == (3, 6)
    for d in (11, 12):
        assert (got[d]["n_tokens"], got[d]["n_pieces"]) == (0, 0)
        assert list(got[d]["pieces"]) == []


def test_roundtrip_and_compression_on_corpus(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text").cache()
    # 30 merges: enough to compress, few enough that the tiny synthetic
    # vocabulary does not fully collapse every word into one piece
    # (its ~100-word pool exhausts ALL repeating pairs at ~105 merges,
    # at which point every frequent word IS a single learned symbol)
    model = bpe_train(docs, n_merges=30)
    assert len(model.merges) == 30
    enc = {r["doc_id"]: r for r in bpe_encode(docs, model).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(enc) == set(texts)
    comp_tok = comp_char = 0
    for d, text in texts.items():
        toks = [t for t in text.lower().split(" ") if t]
        r = enc[d]
        assert r["n_tokens"] == len(toks)
        # lossless: pieces concatenate back to the exact token stream
        assert "".join(r["pieces"]).replace(EOW, " ").split() == toks or (
            not toks and not list(r["pieces"])
        )
        comp_tok += r["n_tokens"]
        comp_char += r["n_pieces"]
    n_chars = sum(
        len(t) + 1 for text in texts.values()
        for t in text.lower().split(" ") if t
    )
    # merges actually compress: fewer pieces than raw symbols, more
    # pieces than whitespace tokens
    assert comp_tok < comp_char < n_chars


def test_train_validation(spark, paper_corpus):
    with pytest.raises(ValueError):
        bpe_train(paper_corpus, n_merges=0)
    # merge learning stops early when no pair repeats
    tiny = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    model = bpe_train(tiny, n_merges=50)
    assert len(model.merges) < 50
