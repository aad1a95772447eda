"""Corpus profile (``pipeline.corpus_profile``): full-frame DuckDB
oracle on sf0.01 — every column (counts, dup rate on the dedup digest,
token/char volumes, exact interpolated percentiles) must match."""

from __future__ import annotations

from big_data_hadoop_spark.pipeline import corpus_profile
from big_data_hadoop_spark.sources.io import load_table
from tests.conftest import SF_ORACLE
from tests.oracle_utils import assert_frames_match

ORACLE = """
WITH t AS (
  SELECT lang, source,
         len(list_filter(string_split(lower(text), ' '), x -> x != ''))
           ::BIGINT AS ntok,
         length(text)::BIGINT AS nchar,
         md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))) AS h
  FROM documents)
SELECT lang, source,
       COUNT(*)::BIGINT AS n_docs,
       COUNT(DISTINCT h)::BIGINT AS n_distinct,
       (COUNT(*) - COUNT(DISTINCT h))::DOUBLE / COUNT(*) AS dup_frac,
       SUM(ntok)::BIGINT AS total_tokens,
       SUM(nchar)::BIGINT AS total_chars,
       ROUND(AVG(ntok), 2) AS avg_tokens,
       quantile_cont(ntok, 0.5) AS p50_tokens,
       quantile_cont(ntok, 0.9) AS p90_tokens
FROM t GROUP BY lang, source ORDER BY lang, source
"""


def test_profile_matches_duckdb(spark, duck):
    docs = load_table(spark, SF_ORACLE, "documents")
    got = (
        corpus_profile(docs)
        .orderBy("lang", "source")
        .toPandas()
    )
    want = duck.sql(ORACLE).df()
    assert len(got) > 1  # multiple (lang, source) groups at sf0.01
    assert_frames_match(got, want, "corpus_profile")


def test_profile_single_group_and_dup_rate(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c", "en", "web"),
            (2, "a  B c", "en", "web"),   # normalized dup of 1
            (3, "totally different", "en", "web"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    row = corpus_profile(df).collect()[0]
    assert row["n_docs"] == 3
    assert row["n_distinct"] == 2
    assert abs(row["dup_frac"] - 1 / 3) < 1e-12
    assert row["total_tokens"] == 3 + 3 + 2


CENTROID_ORACLE = """
WITH e AS (
  SELECT label, t.j, embedding[t.j + 1] AS v
  FROM embeddings, range(0, 64) t(j))
SELECT label, CAST(j AS INT) AS j,
       ROUND(AVG(v), 9) AS centroid_j
FROM e GROUP BY label, j ORDER BY label, j
"""


def test_grouped_centroids_match_duckdb(spark, duck):
    """Long-form per-label centroids vs DuckDB's unnest/avg — same
    9-decimal rounding on both sides absorbs float-sum order."""
    from big_data_hadoop_spark.operators.similarity import grouped_centroids

    emb = load_table(spark, SF_ORACLE, "embeddings")
    got = (
        grouped_centroids(emb, dim=64)
        .orderBy("label", "j")
        .toPandas()
    )
    want = duck.sql(CENTROID_ORACLE).df()
    assert len(got) == 64 * emb.select("label").distinct().count()
    assert_frames_match(got, want, "grouped_centroids")
