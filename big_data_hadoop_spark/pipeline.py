"""End-to-end training-data curation pipeline (LLM-pipeline surface).

Composes the engine's text-analysis and dedup operators into the
standard corpus-preparation funnel:

    quality gate -> language gate -> exact dedup -> (optional) near-dedup

All gate expressions are the SAME expressions the individual probes use
(q24 quality, q25 language-ID, q17 exact dedup), so the composed
pipeline is ANSI-SQL-reproducible and is verified against a DuckDB
oracle in ``tests/test_pipeline.py``. The optional MinHash-LSH
near-dedup stage is xxhash64-based (not SQL-expressible) and is
verified by subset/consistency properties instead.

Scale shape: the two gates fuse into one scan-side filter (no joins,
no shuffle); exact dedup shuffles 16-byte md5 digests (never document
bodies); the near-dup stage is the bucketed LSH join. Nothing in the
funnel materializes the corpus more than the dedup semi-join requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_hadoop_spark.functions.text import split_tokens
from big_data_hadoop_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
from big_data_hadoop_spark.operators.textstats import STOPWORDS, _stop_count


def _lang_pred(toks: Column) -> Column:
    """The q25 language-ID CASE expression (fixed precedence)."""
    scores = {lang: _stop_count(toks, ws) for lang, ws in STOPWORDS.items()}
    s_en, s_de, s_fr, s_es = (scores[x] for x in ("en", "de", "fr", "es"))
    return (
        F.when((s_en > 0) & (s_en >= F.greatest(s_de, s_fr, s_es)), "en")
        .when((s_de > 0) & (s_de >= F.greatest(s_fr, s_es)), "de")
        .when((s_fr > 0) & (s_fr >= s_es), "fr")
        .when(s_es > 0, "es")
        .otherwise("und")
    )


def curate_training_data(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    min_alpha_ratio: float = 0.3,
    langs: tuple[str, ...] = ("en",),
    neardup_threshold: float | None = None,
) -> DataFrame:
    """Curated corpus: rows of ``docs`` (original schema) that pass every
    stage.

    - quality gate: ``>= min_tokens`` whitespace tokens AND alphabetic
      character ratio ``>= min_alpha_ratio`` (q24 expressions);
    - language gate: q25 stopword-vote prediction in ``langs``;
    - exact dedup: keep-first on the md5 of normalized text (q17);
    - near-dedup (only when ``neardup_threshold`` is set): MinHash-LSH
      pairs at that Jaccard threshold; the HIGHER id of each verified
      pair is dropped (keep-first, matching exact dedup's tie rule).

    The gates are one fused filter over the scan; their predicates are
    deliberately identical to the standalone probes so the whole funnel
    (minus the hash-based near-dup stage) has an exact DuckDB oracle.
    """
    text = F.col(text_col)
    toks = split_tokens(text, lowercase=True)
    n_tokens = F.size(toks).cast("long")
    alpha = F.length(F.regexp_replace(F.lower(text), "[^a-z]", "")).cast("long")
    alpha_ratio = alpha.cast("double") / F.greatest(
        F.length(text).cast("long"), F.lit(1).cast("long")
    )
    gated = docs.filter(
        (n_tokens >= F.lit(min_tokens))
        & (alpha_ratio >= F.lit(min_alpha_ratio))
        & _lang_pred(toks).isin(list(langs))
    )
    deduped = exact_dedup(gated, text_col=text_col, id_col=id_col)
    if neardup_threshold is None:
        return deduped
    pairs = minhash_lsh_pairs(
        deduped, threshold=neardup_threshold, text_col=text_col, id_col=id_col
    )
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return deduped.join(drop, id_col, "left_anti")


def sample_to_token_budget(
    docs: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic corpus sample of at most ``budget_tokens``
    whitespace tokens: documents are taken in ``(xxhash64(id) mod
    n_buckets, xxhash64(id))`` order (a data-defined pseudorandom
    permutation — independent of partitioning and stable across
    runs/cluster layouts) until the running token total would exceed the
    budget. A document is kept iff the tokens BEFORE it fit the budget,
    so the result can overshoot by at most one document — the standard
    greedy prefix rule.

    Scale shape — a distributed prefix sum, NOT a global sort: a total
    order needs a global cumulative sum, and the naive single window
    (``Window.orderBy(...)`` with no partition) funnels the corpus
    through ONE task. Instead:

    1. each doc hashes to one of ``n_buckets`` ordered buckets;
    2. per-bucket token totals (``n_buckets`` longs) come to the driver
       — the only driver-side data, O(buckets) not O(rows);
    3. each bucket's running offset is attached as a broadcast-joined
       literal table, and a window PARTITIONED BY bucket (bounded state,
       parallel across buckets) adds the within-bucket prefix.

    Hash order means the sample is an unbiased (hash-random) subset, and
    the same budget over the same corpus always picks the same docs.
    """
    h = F.xxhash64(F.col(id_col))
    bucket = F.pmod(h, F.lit(n_buckets)).cast("int")
    toks = split_tokens(F.col(text_col), lowercase=True)
    base = docs.withColumn("_tok_n", F.size(toks).cast("long")).withColumn(
        "_bkt", bucket
    )

    totals = {
        r._bkt: r.total
        for r in base.groupBy("_bkt").agg(F.sum("_tok_n").alias("total")).collect()
    }
    offsets, running = [], 0
    for b in range(n_buckets):
        offsets.append((b, running))
        running += totals.get(b, 0)
    offset_df = docs.sparkSession.createDataFrame(
        offsets, "_bkt int, _offset long"
    )

    w = (
        Window.partitionBy("_bkt")
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("_tok_n").over(w), F.lit(0)) + F.col("_offset")
    return (
        base.join(F.broadcast(offset_df), "_bkt")
        .withColumn("_before", before)
        .filter(F.col("_before") < F.lit(budget_tokens))
        .drop("_tok_n", "_bkt", "_offset", "_before")
    )
