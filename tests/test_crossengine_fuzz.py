"""Cross-engine fuzzing: the gate and redaction expressions claim to be
engine-portable (Java regex in Spark vs RE2-ish in DuckDB). Random
adversarial text — unicode, control chars, regex metacharacters, long
whitespace runs — must produce IDENTICAL results in both engines. This
is the same discipline as the probe oracles, but over generated inputs
instead of the fixed corpus, where regex-dialect divergences (\\s
membership, case folding, greediness) actually live."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_hadoop_spark.operators.textstats import STOPWORDS
from big_data_hadoop_spark.pipeline import PII_PATTERNS, curation_gate, redact_pii

# Alphabet tuned to stress the patterns: letters (both cases), digits,
# the email/url/phone special chars, whitespace variants, regex
# metacharacters, a couple of non-ASCII letters.
_ALPHA = (
    "abcdefXYZ0189 ._%+-@:/()"
    "\t\n\r\x0b\f"  # \x0b: Java-\s vs RE2-\s divergence, caught here once
    "éß漢"
    "<>[]{}|\\^$*?!#~the a of und"
)

texts = st.lists(
    st.text(alphabet=_ALPHA, min_size=0, max_size=40),
    min_size=1,
    max_size=24,
)


def _duck_with(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    return con


def _stop_sql(words):
    lst = ", ".join(f"'{w}'" for w in words)
    return (
        "CAST(len(list_filter(string_split(lower(text), ' '), "
        f"x -> list_contains([{lst}], x))) AS BIGINT)"
    )


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=texts)
def test_curation_gate_agrees_with_duckdb_on_random_text(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id for r in df.filter(curation_gate()).collect()}
    con = _duck_with(rows)
    sql = f"""
SELECT doc_id FROM (
  SELECT doc_id, text,
         {_stop_sql(STOPWORDS['en'])} AS s_en,
         {_stop_sql(STOPWORDS['de'])} AS s_de,
         {_stop_sql(STOPWORDS['fr'])} AS s_fr,
         {_stop_sql(STOPWORDS['es'])} AS s_es
  FROM documents
  WHERE len(string_split(lower(text), ' ')) >= 5
    AND length(regexp_replace(lower(text), '[^a-z]', '', 'g'))::DOUBLE
        / greatest(length(text), 1) >= 0.3
)
WHERE CASE WHEN s_en > 0 AND s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
           WHEN s_de > 0 AND s_de >= greatest(s_fr, s_es) THEN 'de'
           WHEN s_fr > 0 AND s_fr >= s_es THEN 'fr'
           WHEN s_es > 0 THEN 'es'
           ELSE 'und' END = 'en'
"""
    exp = {r[0] for r in con.execute(sql).fetchall()}
    con.close()
    assert got == exp, (got ^ exp, [texts[i] for i in (got ^ exp)])


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=texts)
def test_redact_pii_agrees_with_duckdb_on_random_text(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text for r in redact_pii(df).collect()}
    con = _duck_with(rows)
    expr = "text"
    for _n, pat, tag in PII_PATTERNS:
        escaped = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{escaped}', '{tag}', 'g')"
    exp = dict(
        con.execute(f"SELECT doc_id, {expr} FROM documents").fetchall()
    )
    con.close()
    diff = {i: (got[i], exp[i]) for i in got if got[i] != exp[i]}
    assert not diff, diff


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=texts)
def test_token_counts_agree_with_duckdb_on_random_text(spark, texts):
    """The reference-parity tokenization (space split with empties,
    full-match category regexes, lowercase fold) — the expressions every
    q01-q06 oracle builds on — fuzzed cross-engine."""
    from big_data_hadoop_spark.functions.text import (
        NUMBER_PATTERN,
        WORD_PATTERN,
    )
    from big_data_hadoop_spark.operators.counts import token_counts

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.category, r.token): r.cnt
        for r in token_counts(df, lowercase=True).collect()
    }
    con = _duck_with(rows)
    sql = f"""
WITH u AS (
  SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents),
c AS (
  SELECT w,
         CASE WHEN regexp_full_match(w, '{WORD_PATTERN}') THEN 'word'
              WHEN regexp_full_match(w, '{NUMBER_PATTERN}') THEN 'number'
         END AS category
  FROM u)
SELECT category, w, CAST(COUNT(*) AS BIGINT)
FROM c WHERE category IS NOT NULL GROUP BY 1, 2
"""
    exp = {(c, w): n for c, w, n in con.execute(sql).fetchall()}
    con.close()
    assert got == exp, dict(set(got.items()) ^ set(exp.items()))


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=texts,
    max_t=st.integers(min_value=2, max_value=20),
    ov_frac=st.integers(min_value=0, max_value=3),
)
def test_chunking_agrees_with_duckdb_on_random_text(spark, texts, max_t, ov_frac):
    """Chunking window arithmetic (ceil division, stride slicing, short
    docs) against the DuckDB LATERAL oracle over adversarial text and
    random window/overlap parameters."""
    from big_data_hadoop_spark.pipeline import chunk_documents

    ov = (max_t - 1) * ov_frac // 4  # 0 .. ~3/4 of the window, ov < max_t
    stride = max_t - ov
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.chunk_no, r.chunk_text, r.n_chunk_tokens)
        for r in chunk_documents(df, max_t, overlap=ov).collect()
    )
    con = _duck_with(rows)
    oracle = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
c AS (
  SELECT doc_id, toks,
         greatest(CAST(ceil((len(toks) - {ov})::DOUBLE / {stride}) AS INT), 1)
           AS n_chunks
  FROM t),
e AS (
  SELECT doc_id, toks, g.k AS chunk_no
  FROM c, LATERAL (SELECT unnest(generate_series(0, n_chunks - 1)) AS k) g)
SELECT doc_id, CAST(chunk_no AS BIGINT) AS chunk_no,
       array_to_string(toks[chunk_no * {stride} + 1 :
                            chunk_no * {stride} + {max_t}], ' ') AS chunk_text,
       CAST(len(toks[chunk_no * {stride} + 1 :
                     chunk_no * {stride} + {max_t}]) AS BIGINT)
         AS n_chunk_tokens
FROM e ORDER BY doc_id, chunk_no
"""
    expect = [tuple(r) for r in con.execute(oracle).fetchall()]
    assert got == expect


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=texts)
def test_token_stats_and_fingerprint_agree_with_duckdb(spark, texts):
    """token_stats (incl. the BPE-ish regex count, the anchored category
    regexes, and the avg-token-length identity) and the sorted-distinct
    fingerprint, over adversarial text — regex dialect and unicode
    case-fold divergences live exactly here."""
    from big_data_hadoop_spark.functions.text import (
        NUMBER_PATTERN,
        WORD_PATTERN,
    )
    from big_data_hadoop_spark.operators.textstats import (
        fingerprint,
        token_stats,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got_stats = {
        r.doc_id: (r.n_tokens, r.n_bpe_tokens, r.n_words, r.n_numbers,
                   round(r.avg_token_len, 9))
        for r in token_stats(df).collect()
    }
    got_fp = {r.doc_id: r.fp for r in fingerprint(df).collect()}
    con = _duck_with(rows)
    stats_sql = f"""
WITH t AS (SELECT doc_id, text, string_split(lower(text), ' ') AS toks
           FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text,
            ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \\t\\n\\x0b\\f\\r]+'))
            AS BIGINT) AS n_bpe,
       CAST(len(list_filter(toks, x -> regexp_full_match(x, '{WORD_PATTERN}')))
            AS BIGINT) AS n_words,
       CAST(len(list_filter(toks, x -> NOT regexp_full_match(x, '{WORD_PATTERN}')
            AND regexp_full_match(x, '{NUMBER_PATTERN}'))) AS BIGINT) AS n_numbers,
       (length(text) - len(toks) + 1)::DOUBLE / len(toks) AS avg_len
FROM t"""
    expect_stats = {
        r[0]: (r[1], r[2], r[3], r[4], round(r[5], 9))
        for r in con.execute(stats_sql).fetchall()
    }
    assert got_stats == expect_stats
    fp_sql = """
SELECT doc_id, md5(array_to_string(list_sort(list_distinct(
           string_split(lower(text), ' '))), ' ')) AS fp
FROM documents"""
    expect_fp = {r[0]: r[1] for r in con.execute(fp_sql).fetchall()}
    assert got_fp == expect_fp


_PROFILE_ORACLE_FUZZ = """
WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split(lower(text), ' '), x -> x != ''))
           ::BIGINT AS ntok,
         length(text)::BIGINT AS nchar,
         md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))) AS h
  FROM documents)
SELECT COUNT(*)::BIGINT AS n_docs,
       COUNT(DISTINCT h)::BIGINT AS n_distinct,
       CASE WHEN COUNT(*) > 0 THEN
         (COUNT(*) - COUNT(DISTINCT h))::DOUBLE / COUNT(*) END AS dup_frac,
       SUM(ntok)::BIGINT AS total_tokens,
       SUM(nchar)::BIGINT AS total_chars,
       ROUND(AVG(ntok), 2) AS avg_tokens,
       quantile_cont(ntok, 0.5) AS p50_tokens,
       quantile_cont(ntok, 0.9) AS p90_tokens
FROM t
"""


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=texts)
def test_corpus_profile_agrees_with_duckdb_on_random_text(spark, texts):
    """The newest oracle surface fuzzed like the gates: the global
    (group-less) profile over adversarial text must match DuckDB
    column-for-column — whitespace-class and md5-normalization
    divergences would surface here."""
    from big_data_hadoop_spark.pipeline import corpus_profile
    from tests.oracle_utils import assert_frames_match

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = corpus_profile(df, group_cols=()).toPandas()
    con = _duck_with(rows)
    try:
        want = con.sql(_PROFILE_ORACLE_FUZZ).df()
    finally:
        con.close()
    assert_frames_match(got, want, "corpus_profile_fuzz")
