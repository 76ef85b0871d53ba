"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score raw-corpus documents by how much more likely
their hashed n-gram features are under a TARGET domain's distribution
than under the raw corpus's own, then keep the highest-weight docs.
The standard recipe for tilting a web-scale crawl toward a quality
domain (e.g. Wikipedia+books) without training a classifier.

Feature space: unigrams + bigrams, feature-hashed into ``dim`` buckets
(the paper's construction) via the engine-portable md5 bucket of
``text.token_bucket``. Both bucket distributions are add-one smoothed:
``p_b = (c_b + 1) / (N + dim)``.

Determinism: the per-bucket log-ratio ``ln(p_target / p_raw)`` is
computed ONCE per bucket (a dim-row table) and ROUNDED to a scaled
BIGINT before any per-document accumulation, so document scores are
exact integer sums (DECIMAL accumulator, order-independent) with one
terminal division — libm's 1-ulp ``ln`` drift can only flip a bucket's
last scaled digit, never reorder documents through float-sum
nondeterminism (the lm_surprisal / tfidf determinism move, adapted to
a quantity that genuinely needs a log).

Plan shape at 100 TB: the raw corpus pays one explode + two hash
aggregations (corpus-level bucket counts, per-doc bucket counts); the
target is the small side (its counts and the dim-row log-ratio table
broadcast); selection is TakeOrderedAndProject. Nothing ever joins
corpus-to-corpus. Lloyd-free but log-based, so this family is
unit-tested against a numpy reference rather than SQL-oracle-checked
(ln is not portably bit-stable across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from clickhouse_mysql_data_reader_spark.operators.text import (
    bigram_array,
    token_bucket,
    tokens,
)
from clickhouse_mysql_data_reader_spark.util import fan_out


def _feature_arrays(df: DataFrame, text_col: str, *keep) -> DataFrame:
    """``keep`` columns + ``feat``: the unigram+bigram feature array of
    the normalized token stream (multiset — DSIR counts occurrences).
    Empty-string tokens are dropped BEFORE bigram construction, and
    docs with fewer than two real tokens contribute no bigram at all —
    otherwise an empty/whitespace doc (tokens == ['']) would ride
    ``bigram_array``'s 1-token guard into a bogus '' feature, giving
    every blank doc weight mass and skewing one bucket's log-ratio."""
    return (
        fan_out(df)
        .select(*keep, tokens(F.col(text_col)).alias("tk"))
        .select(*keep, F.filter("tk", lambda t: t != "").alias("tkc"))
        .select(
            *keep,
            F.concat(
                "tkc",
                F.when(
                    F.size("tkc") >= 2, bigram_array(F.col("tkc"))
                ).otherwise(F.array().cast("array<string>")),
            ).alias("feat"),
        )
    )


def _doc_feature_buckets(
    df: DataFrame, text_col: str, id_col: str, dim: int
) -> DataFrame:
    """(doc_id, bucket), one row per feature occurrence."""
    return (
        _feature_arrays(df, text_col, F.col(id_col).alias("doc_id"))
        .select("doc_id", F.explode("feat").alias("f"))
        .select("doc_id", token_bucket(F.col("f"), dim).alias("bucket"))
    )


def _corpus_bucket_counts(df: DataFrame, text_col: str, dim: int) -> DataFrame:
    """(bucket, c) corpus-level feature counts — map-side combined; no
    doc identity needed."""
    return (
        _feature_arrays(df, text_col)
        .select(F.explode("feat").alias("f"))
        .select(token_bucket(F.col("f"), dim).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_logratios(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    dim: int = 1024,
    scale: int = 1_000_000,
) -> DataFrame:
    """The dim-row importance table: (bucket, llr) where ``llr`` is the
    scaled-integer log-ratio of the add-one-smoothed bucket probability
    under ``target`` vs under ``raw``. Buckets no feature hashed into
    still get a row (the smoothing's uniform mass), so downstream joins
    never miss."""
    spark = raw.sparkSession
    raw_c = _corpus_bucket_counts(raw, text_col, dim)
    tgt_c = _corpus_bucket_counts(target, text_col, dim)
    buckets = spark.range(dim).select(F.col("id").alias("bucket"))
    # both count tables are <= dim rows AFTER their aggregates — hint
    # them broadcast so the dim-row assembly never plans a sort-merge
    # join (the aggregation itself still shuffles the feature stream,
    # which is the unavoidable corpus-level pass)
    joined = (
        buckets.join(
            F.broadcast(raw_c.withColumnRenamed("c", "c_raw")), "bucket", "left"
        )
        .join(F.broadcast(tgt_c.withColumnRenamed("c", "c_tgt")), "bucket", "left")
        .fillna(0, ["c_raw", "c_tgt"])
    )
    # totals stay in-plan (1-row aggregates, broadcast crossJoin) so
    # composing callers keep their laziness — the lm_surprisal pattern
    tot = joined.agg(
        F.sum("c_raw").alias("n_raw"), F.sum("c_tgt").alias("n_tgt")
    )
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.round(
                F.lit(scale)
                * (
                    F.ln((F.col("c_tgt") + 1) / (F.col("n_tgt") + dim))
                    - F.ln((F.col("c_raw") + 1) / (F.col("n_raw") + dim))
                )
            )
            .cast("long")
            .alias("llr"),
        )
    )


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
    scale: int = 1_000_000,
    logratios: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, n_features, logw): per-document log importance weight
    ``logw = sum_b c_b * llr_b / scale`` — positive means the doc looks
    more like the target domain than like the raw corpus. Pass a
    precomputed ``logratios`` table (e.g. reused across daily batches —
    the importance estimator is frozen in the paper, too) to skip the
    corpus-level counting pass; otherwise it is derived from ``corpus``
    itself as the raw distribution."""
    llr = (
        logratios
        if logratios is not None
        else dsir_logratios(corpus, target, text_col=text_col, dim=dim, scale=scale)
    )
    feats = _doc_feature_buckets(corpus, text_col, id_col, dim)
    doc_counts = feats.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        doc_counts.join(F.broadcast(llr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_features"),
            (
                F.sum((F.col("c") * F.col("llr")).cast("decimal(38,0)"))
                / F.lit(float(scale))
            )
            .cast("double")
            .alias("logw"),
        )
    )


def dsir_select(
    corpus: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
    scale: int = 1_000_000,
    logratios: DataFrame | None = None,
) -> DataFrame:
    """Keep the ``k`` corpus docs with the highest importance weight
    (logw desc, id asc tie-break — fully deterministic). This is the
    paper's top-k variant; for its Gumbel-noise resampling flavor,
    compose ``dsir_weights`` with ``sampling.weighted_sample_topk``
    instead. The global top-k lowers to TakeOrderedAndProject
    (per-partition heaps, never a full sort), and the corpus text rides
    along via one id-keyed join against the k-row selection."""
    w = dsir_weights(
        corpus,
        target,
        text_col=text_col,
        id_col=id_col,
        dim=dim,
        scale=scale,
        logratios=logratios,
    )
    top = (
        w.orderBy(F.col("logw").desc(), F.col("doc_id").asc())
        .limit(k)
        .select(F.col("doc_id").alias(id_col), "logw")
    )
    return corpus.join(F.broadcast(top), id_col)
