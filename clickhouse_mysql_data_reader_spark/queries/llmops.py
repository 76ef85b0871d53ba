"""LLM-data-pipeline operators as oracle-checked queries: dedup family,
embedding similarity search, text analysis (BASELINE.json north-star).

Oracle-portability notes:
- all content hashing is md5 (identical across Spark/DuckDB, unlike
  murmur3/xxhash), so MinHash/SimHash/fingerprints compare exactly;
- ratios are raw double divisions (bit-deterministic IEEE) instead of
  round(), whose half-way semantics differ across engines;
- the shingle construction is mirrored token-for-token between
  ``operators.dedup.word_shingles`` and the SQL CTE below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_mysql_data_reader_spark.operators.dedup import (
    MH_H28,
    MH_P,
    exact_dedup_groups,
    jaccard_pairs,
    lsh_candidate_pairs,
    mh_a,
    mh_b,
    minhash_signatures,
    shingle_table,
    simhash,
)
from clickhouse_mysql_data_reader_spark.operators.similarity import cosine_topk, ivf_topk
from clickhouse_mysql_data_reader_spark.operators.text import (
    EN_STOPWORDS,
    GOPHER_STOPWORDS,
    fingerprint_documents,
    gopher_rules,
    lang_id,
    ngram_boilerplate,
    quality_features,
    stopword_ratio,
)
from clickhouse_mysql_data_reader_spark.queries.registry import QUERIES, register
from clickhouse_mysql_data_reader_spark.sources.parquet import load_table

NUM_HASHES = 16
BANDS = 4

# --- shared SQL fragments (mirror operators.dedup exactly) -----------------

_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"

_SHINGLE_CTE = f"""
  norm AS (SELECT doc_id, {_NORM} AS nt FROM documents),
  toks AS (SELECT doc_id, string_split(nt, ' ') AS tk FROM norm),
  sh AS (
    SELECT DISTINCT doc_id,
           ('0x' || substr(md5(array_to_string(tk[i:i+2], ' ')), 1, 15))::BIGINT AS sh_h
    FROM toks, UNNEST(range(1, greatest(len(tk) - 2, 1) + 1)) AS u(i)
  )
"""

_MH_COLS = ", ".join(
    f"min(({mh_a(i)} * (sh_h % {MH_H28}) + {mh_b(i)}) % {MH_P}) AS mh_{i}"
    for i in range(NUM_HASHES)
)
_ROWS_PER_BAND = NUM_HASHES // BANDS
_BAND_SELECTS = "\n    UNION ALL ".join(
    "SELECT doc_id, {b} AS band_id, md5({expr}) AS band_hash FROM mh".format(
        b=b,
        expr=" || '|' || ".join(
            f"mh_{b * _ROWS_PER_BAND + r}" for r in range(_ROWS_PER_BAND)
        ),
    )
    for b in range(BANDS)
)
_SW_LIST = ", ".join(f"'{w}'" for w in EN_STOPWORDS)


# --- dedup family ----------------------------------------------------------


@register(
    "dedup_exact_groups",
    f"""
    SELECT fp, count(*) AS n_dupes, min(doc_id) AS keeper_id
    FROM (SELECT doc_id, md5({_NORM}) AS fp FROM documents)
    GROUP BY fp
    """,
    doc="Exact dedup by normalized-content hash; keeper = min doc_id. "
    "One groupBy on a 128-bit key — the cheapest and first dedup pass "
    "of any corpus pipeline.",
)
def dedup_exact_groups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup_groups(docs, "text", "doc_id")


@register(
    "doc_fingerprint",
    f"""
    SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents
    """,
    doc="Per-document stable content fingerprint (md5 of normalized "
    "text) — the cross-corpus exact-dedup join key.",
)
def doc_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return fingerprint_documents(docs, "text", "doc_id")


@register(
    "dedup_minhash_signatures",
    f"""
    WITH {_SHINGLE_CTE}
    SELECT doc_id, {_MH_COLS}
    FROM sh GROUP BY doc_id
    """,
    doc="MinHash signatures (k=16) over 3-word shingles: one md5 per "
    "shingle -> 60-bit int, then k affine hashes (A_i*h+B_i) mod P. "
    "Exact-checked element-wise against the oracle — validates the "
    "whole shingle+hash pipeline, not just pair counts.",
)
def dedup_minhash_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # distinct=False: MinHash is duplicate-insensitive, skip the dedup shuffle.
    # partition_by_id deliberately OFF here (round 15): the signature
    # groupBy partial-aggregates map-side, so its exchange moves one
    # 17-long row per doc — strictly fewer bytes than the raw-text
    # hash repartition partition_by_id would pay. Idle-host interleaved
    # A/B (r15): pbi=False 1.18s vs pbi=True 1.395s min-of-5, every
    # pair agreeing — confirming the r14 driver regression (0.838 ->
    # 1.316). pbi stays on for the distinct=True consumers, where it
    # replaces the (doc_id, sh_h) distinct exchange and wins 2x.
    return minhash_signatures(
        shingle_table(docs, "text", "doc_id", k=3, distinct=False),
        NUM_HASHES,
    )


@register(
    "dedup_lsh_candidates",
    f"""
    WITH {_SHINGLE_CTE},
    mh AS (SELECT doc_id, {_MH_COLS} FROM sh GROUP BY doc_id),
    bands AS (
    {_BAND_SELECTS}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    """,
    doc="LSH banding (4 bands x 4 rows): docs sharing any band bucket "
    "become candidate pairs. The self-join keys on (band_id, band_hash) "
    "— narrow columns, AQE handles bucket skew at scale.",
)
def dedup_lsh_candidates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # partition_by_id OFF (round 15) — the dedup_minhash_signatures
    # rationale: the signature groupBy partial-aggregates, so its
    # exchange is per-doc rows, cheaper than a raw-text repartition.
    # Idle-host interleaved A/B: 1.448s vs 1.911s min-of-5.
    sigs = minhash_signatures(
        shingle_table(docs, "text", "doc_id", k=3, distinct=False),
        NUM_HASHES,
    )
    return lsh_candidate_pairs(sigs, NUM_HASHES, BANDS)


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH {_SHINGLE_CTE},
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.sh_h = b.sh_h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_inter,
           n_inter / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_inter >= 3
    """,
    doc="Exact 3-gram Jaccard for pairs sharing >=3 shingles. The "
    "shingle equi-join only materializes co-shingled pairs — the 100 TB "
    "path never forms the full cross product.",
)
def dedup_ngram_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_table(docs, "text", "doc_id", k=3, partition_by_id=True)
    # caller-owned persist: released by unpersist/clearCache after the
    # action (bench.py clears between queries)
    return jaccard_pairs(sh, min_inter=3, storage=StorageLevel.MEMORY_AND_DISK)


@register(
    "dedup_containment_near",
    f"""
    WITH {_SHINGLE_CTE},
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.sh_h = b.sh_h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_inter,
           n_inter / least(sa.n_sh, sb.n_sh) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_inter >= 3 AND n_inter / least(sa.n_sh, sb.n_sh) >= 0.5
    """,
    doc="Exact 3-gram CONTAINMENT (|A∩B| / min(|A|,|B|), Broder 1997) "
    "for co-shingled pairs: a truncated/excerpted copy of a long doc "
    "scores ~1.0 here while its symmetric Jaccard can sit far below any "
    "dedup threshold — the sub-document-duplicate metric Jaccard-only "
    "passes systematically miss. Shares jaccard_pairs' verify core "
    "(candidate-driven join, never all-pairs). At this LOW threshold "
    "(0.5) the co-shingle join IS the right plan — the prefix-filter "
    "variant (dedup_containment_prefix) pays its frequency-ordering "
    "shuffles for a prefix that is still half of every doc, measured "
    "3x slower at sf0.1 with identical output.",
)
def dedup_containment_near_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from clickhouse_mysql_data_reader_spark.operators.dedup import (
        containment_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_table(docs, "text", "doc_id", k=3, partition_by_id=True)
    return containment_pairs(
        sh, min_inter=3, min_containment=0.5,
        storage=StorageLevel.MEMORY_AND_DISK,
    )


@register(
    "dedup_containment_prefix",
    f"""
    WITH {_SHINGLE_CTE},
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.sh_h = b.sh_h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_inter,
           n_inter / least(sa.n_sh, sb.n_sh) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_inter >= 3 AND n_inter / least(sa.n_sh, sb.n_sh) >= 0.9
    """,
    doc="The SAME containment metric at a HIGH threshold (0.9) through "
    "AllPairs PREFIX FILTERING (Bayardo et al., WWW'07): candidates "
    "join only each doc's rarest floor((1-t)|A|)+2 shingles (~10% at "
    "t=0.9) against the corpus — exact (the all-co-shingled oracle "
    "hash-matches), and the frequency ordering steers the join away "
    "from hot boilerplate shingles, so bucket sizes stay bounded where "
    "the co-shingle self-join explodes as sum(df^2) on template "
    "clusters. On the template-free sf0.1 synthetic it measures 1.4x "
    "the co-shingle plan (2.6s vs 1.9s — the structural win has "
    "nothing to prune locally); at web scale the quadratic hot-shingle "
    "term is the whole cost, which is why curate(near_dup_containment=)"
    " routes through this path.",
)
def dedup_containment_prefix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from clickhouse_mysql_data_reader_spark.operators.dedup import (
        containment_pairs,
        containment_prefix_candidates,
    )

    docs = load_table(spark, sf_dir, "documents")
    # one persist shared by the candidate generator (freq + prefix +
    # probe side) and the verify core (sizes + both join sides) —
    # caller-owned, released by bench.py's clearCache between queries
    sh = shingle_table(docs, "text", "doc_id", k=3, partition_by_id=True).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cands = containment_prefix_candidates(sh, min_containment=0.9)
    return containment_pairs(
        sh, candidates=cands, min_inter=3, min_containment=0.9
    )


@register(
    "dedup_jaccard_prefix",
    f"""
    WITH {_SHINGLE_CTE},
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.sh_h = b.sh_h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_inter,
           n_inter / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_inter >= 3
      AND n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    """,
    doc="EXACT Jaccard >= 0.5 near-dup through the AllPairs prefix "
    "filter — the deterministic alternative to MinHash-LSH: LSH recall "
    "is probabilistic (a pair whose bands never collide is silently "
    "lost), the prefix filter provably emits a superset of every "
    "qualifying pair. The Jaccard bound is tighter than containment's "
    "(prefix = floor(((1-t)/(1+t))|A|)+2 rarest shingles, ~11% at "
    "t=0.8), and the all-co-shingled oracle hash-verifies exactness.",
)
def dedup_jaccard_prefix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from clickhouse_mysql_data_reader_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_prefix_candidates,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_table(docs, "text", "doc_id", k=3, partition_by_id=True).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cands = jaccard_prefix_candidates(sh, min_jaccard=0.5)
    return jaccard_pairs(sh, candidates=cands, min_inter=3, min_jaccard=0.5)


@register(
    "dedup_simhash",
    f"""
    WITH norm AS (SELECT doc_id, {_NORM} AS nt FROM documents),
    tok AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS tok FROM norm),
    th AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS th FROM tok),
    bits AS (
      SELECT doc_id, i AS bit_i,
             sum(CASE WHEN (th >> i) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM th, UNNEST(range(0, 32)) AS u(i)
      GROUP BY doc_id, i
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit_i) ELSE 0 END)
                AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
    """,
    doc="32-bit SimHash: token hashes vote bitwise (frequency-weighted); "
    "sign of each bit-sum forms the fingerprint. Hamming-close "
    "fingerprints = near-dups. Pure expression pipeline, md5-derived "
    "hashes so the oracle matches bit-for-bit.",
)
def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash(docs, "text", "doc_id", bits=32)


# --- similarity search -----------------------------------------------------

_COS_ORACLE = """
    WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
               FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.qid, e.vec_id,
             list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS cos
      FROM q, embeddings e
      WHERE e.vec_id <> q.qid {extra}
    )
    SELECT qid, vec_id, round(cos, 6) AS cos_sim, rn
    FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                       ORDER BY cos DESC, vec_id ASC) AS rn
          FROM scored)
    WHERE rn <= 3
"""


@register(
    "embed_cosine_topk",
    _COS_ORACLE.format(extra=""),
    doc="Brute-force exact cosine top-k (queries broadcast, corpus "
    "streamed, per-query heap via row_number). The correctness baseline "
    "for ANN; zip_with/aggregate fold keeps the math in codegen.",
)
def embed_cosine_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    return cosine_topk(emb, queries, k=3, query_id_col="qid")


@register(
    "embed_ivf_topk",
    """
    WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe, label AS qcell
               FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.qid, e.vec_id,
             list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS cos
      FROM q JOIN embeddings e ON e.label = q.qcell
      WHERE e.vec_id <> q.qid
    )
    SELECT qid, vec_id, round(cos, 6) AS cos_sim, rn
    FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                       ORDER BY cos DESC, vec_id ASC) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
    doc="IVF-style ANN: probe only the query's coarse-quantizer cell "
    "(the corpus `label`). At scale the corpus is partitioned by cell, "
    "so the equi-join prunes ~n_cells x of I/O and compute.",
)
def embed_ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding", "label"
    )
    return ivf_topk(emb, queries, k=3, cell_col="label", query_id_col="qid")


# --- text analysis ---------------------------------------------------------


@register(
    "text_token_stats",
    f"""
    WITH norm AS (SELECT doc_id, {_NORM} AS nt FROM documents),
    t AS (SELECT doc_id, nt, len(string_split(nt, ' ')) AS n_tokens FROM norm)
    SELECT doc_id, n_tokens,
           CAST(ceil(length(nt) / 4) AS BIGINT) AS bpe_est,
           (length(nt) - (n_tokens - 1)) / n_tokens AS mean_token_len
    FROM t
    """,
    doc="Token counting: whitespace tokens + BPE-ish chars/4 budget "
    "estimate + mean token length. Raw-double ratios for bit parity.",
)
def text_token_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.dedup import normalize_text
    from clickhouse_mysql_data_reader_spark.operators.text import (
        bpe_token_estimate,
        token_count,
    )

    from clickhouse_mysql_data_reader_spark.util import fan_out

    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_tok = token_count(t)
    return fan_out(docs, bytes_per_task=128 * 1024).select(
        "doc_id",
        n_tok.alias("n_tokens"),
        bpe_token_estimate(t).alias("bpe_est"),
        ((F.length(normalize_text(t)) - (n_tok - 1)) / n_tok).alias("mean_token_len"),
    )


@register(
    "text_lang_id",
    f"""
    WITH norm AS (SELECT doc_id, lang, {_NORM} AS nt FROM documents),
    t AS (SELECT doc_id, lang,
                 len(list_filter(string_split(nt, ' '), x -> x IN ({_SW_LIST})))
                   AS sw_hits,
                 len(string_split(nt, ' ')) AS n_tokens
          FROM norm)
    SELECT doc_id, lang,
           sw_hits / n_tokens AS sw_ratio,
           CASE WHEN sw_hits / n_tokens >= 0.05 THEN 'en' ELSE 'unk' END AS lang_pred
    FROM t
    """,
    doc="Language-ID heuristic: English function-word density over "
    "whitespace tokens. One expression column, no shuffle; swap in a "
    "real classifier (pandas UDF) without changing the pipeline shape.",
)
def text_lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.util import fan_out

    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return fan_out(docs, bytes_per_task=128 * 1024).select(
        "doc_id",
        "lang",
        stopword_ratio(t).alias("sw_ratio"),
        lang_id(t, threshold=0.05).alias("lang_pred"),
    )


def _lang_multi_sql() -> str:
    """Oracle for text_lang_multi, generated from the SAME
    LANG_STOPWORDS inventory the operator folds over (list drift would
    be a silent hash mismatch, not an error)."""
    from clickhouse_mysql_data_reader_spark.operators.text import LANG_STOPWORDS

    codes = sorted(LANG_STOPWORDS)  # de, en, es, fr
    ratio_cols = ",\n        ".join(
        "len(list_filter(tk, x -> x IN ({lst}))) / n AS r_{c}".format(
            lst=", ".join(f"'{w}'" for w in LANG_STOPWORDS[c]), c=c
        )
        for c in codes
    )
    allr = ", ".join(f"r_{c}" for c in codes)
    # CASE in lexicographic code order = the operator's min-code
    # tie-break among max-ratio holders
    best_case = "\n             ".join(
        f"WHEN r_{c} = greatest({allr}) THEN '{c}'" for c in codes[:-1]
    )
    second = ",\n          ".join(
        f"CASE WHEN best_lang = '{c}' THEN -1.0 ELSE r_{c} END" for c in codes
    )
    return f"""
    WITH norm AS (SELECT doc_id, lang, {_NORM} AS nt FROM documents),
    t AS (SELECT doc_id, lang, string_split(nt, ' ') AS tk,
                 greatest(len(string_split(nt, ' ')), 1) AS n
          FROM norm),
    r AS (SELECT doc_id, lang,
        {ratio_cols}
      FROM t),
    s AS (SELECT doc_id, lang, {allr},
            greatest({allr}) AS best_ratio,
            CASE {best_case}
             ELSE '{codes[-1]}' END AS best_lang
          FROM r),
    x AS (SELECT doc_id, lang, best_ratio, best_lang,
            greatest(
          {second}) AS second_ratio
          FROM s)
    SELECT doc_id, lang,
           CASE WHEN best_ratio >= 0.05 THEN best_lang ELSE 'unk' END
             AS lang_pred,
           round(best_ratio, 6) AS best_ratio,
           round(second_ratio, 6) AS second_ratio,
           (best_ratio >= 0.05 AND second_ratio >= best_ratio * 0.5
            AND second_ratio > 0) AS is_mixed
    FROM x
    """


@register(
    "text_lang_multi",
    _lang_multi_sql(),
    doc="Multi-language function-word ID (operators/text.py "
    "lang_id_multi): per-language stopword densities over ONE token "
    "array (adding a language costs one expression, not a pass), argmax "
    "with min-code tie-break, 'unk' floor, and an is_mixed flag for "
    "code-switched docs whose runner-up density is within half the "
    "winner's. Zero shuffles — rides the scan. The curation pipeline's "
    "language gate (CurationConfig.lang_allow) runs this exact struct.",
)
def text_lang_multi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.text import lang_id_multi
    from clickhouse_mysql_data_reader_spark.util import fan_out

    docs = load_table(spark, sf_dir, "documents")
    m = lang_id_multi(F.col("text"))
    return fan_out(docs, bytes_per_task=128 * 1024).select(
        "doc_id",
        "lang",
        m["lang"].alias("lang_pred"),
        m["best_ratio"].alias("best_ratio"),
        m["second_ratio"].alias("second_ratio"),
        m["is_mixed"].alias("is_mixed"),
    )


@register(
    "text_quality_score",
    f"""
    WITH norm AS (SELECT doc_id, {_NORM} AS nt FROM documents),
    t AS (SELECT doc_id, nt,
                 len(string_split(nt, ' ')) AS n_tokens,
                 len(list_filter(string_split(nt, ' '), x -> x IN ({_SW_LIST})))
                   AS sw_hits
          FROM norm)
    SELECT doc_id,
           n_tokens,
           (length(nt) - (n_tokens - 1)) / n_tokens AS mean_token_len,
           sw_hits / n_tokens AS stopword_ratio,
           length(regexp_replace(nt, '[^a-z0-9]', '', 'g')) / length(nt) AS alnum_ratio,
           least(1.0, greatest(0.0,
                 (sw_hits / n_tokens) * 4
                 + least(n_tokens / 100.0, 1.0) * 0.5)) AS quality_score
    FROM t
    """,
    doc="Composite quality features: verbosity, fluency (stopword "
    "density), boilerplate (alnum ratio), folded into a clamped score.",
)
def text_quality_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return quality_features(docs, "text", "doc_id")


@register(
    "text_quality_calibrated",
    f"""
    WITH norm AS (SELECT doc_id, source, {_NORM} AS nt FROM documents),
    t AS (SELECT doc_id, source,
                 len(string_split(nt, ' ')) AS n_tokens,
                 len(list_filter(string_split(nt, ' '), x -> x IN ({_SW_LIST})))
                   AS sw_hits
          FROM norm),
    q AS (SELECT doc_id, source,
                 least(1.0, greatest(0.0,
                       (sw_hits / n_tokens) * 4
                       + least(n_tokens / 100.0, 1.0) * 0.5)) AS qs
          FROM t),
    p AS (SELECT doc_id, source, qs,
                 percent_rank() OVER (PARTITION BY source ORDER BY qs) AS pr
          FROM q),
    s AS (SELECT doc_id, source, qs, pr,
                 coalesce(min(CASE WHEN pr >= 0.2 THEN qs END)
                            OVER (PARTITION BY source),
                          min(qs) OVER (PARTITION BY source)) AS thr
          FROM p)
    SELECT doc_id, source,
           round(qs, 6) AS quality_score,
           round(pr, 6) AS cal_pctile,
           CAST(qs >= thr AS INT) AS kept
    FROM s
    """,
    doc="Per-source quantile calibration of the quality score "
    "(operators/text.py quality_calibrated): the raw composite score "
    "is source-biased (forums run stopword-dense, reference text dry), "
    "so a single global raw threshold over-prunes whole sources; "
    "mapping each doc to its percent_rank WITHIN its source makes "
    "'drop the worst 20%' mean the same thing everywhere — the "
    "per-bucket filtering discipline of the CCNet/FineWeb lineage. "
    "One scan-stage token pass (shared quality_score_expr) + ONE "
    "window shuffle partitioned by source. percent_rank is an exact "
    "(rank-1)/(n-1) rational over bit-equal scores, so the keep "
    "boundary is deterministic cross-engine. The keep gate is the "
    "threshold construction (min score clearing the cut, source-min "
    "fallback), so single-doc / all-tied sources — percent_rank 0 on "
    "every row — are kept whole, and the window form keeps exactly "
    "the docs the frozen calibrated_quality_thresholds gate keeps.",
)
def text_quality_calibrated_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.text import (
        quality_calibrated,
    )

    docs = load_table(spark, sf_dir, "documents")
    return quality_calibrated(docs, "text", "doc_id", "source", keep_pctile=0.2)


@register(
    "sample_length_buckets",
    f"""
    WITH norm AS (SELECT doc_id, {_NORM} AS nt FROM documents),
    t AS (SELECT doc_id,
                 CAST(len(string_split(nt, ' ')) AS BIGINT) AS n
          FROM norm),
    b AS (SELECT n,
                 CASE WHEN n IS NULL OR n <= 0 THEN 0
                      ELSE CAST(length(bin(greatest(n, 1) - 1)) AS INT)
                      END AS bucket
          FROM t)
    SELECT bucket,
           CAST(1::BIGINT << bucket AS BIGINT) AS padded_len,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n) AS BIGINT) AS total_tokens,
           CAST(min(n) AS BIGINT) AS min_tokens,
           CAST(max(n) AS BIGINT) AS max_tokens,
           round(CAST(sum(n) AS BIGINT)
                 / (count(*) * (1::BIGINT << bucket)), 6) AS fill_ratio
    FROM b GROUP BY bucket
    """,
    doc="Power-of-two sequence-length bucketing report (operators/"
    "sampling.py length_bucket_stats): docs bucket by the binary digit "
    "count of (token count - 1), i.e. ceil(log2) — bucket b = counts "
    "in (2^(b-1), 2^b] with {1,2} in bucket 1, so a batch padded to "
    "2^b is >=50% real content by construction; "
    "fill_ratio reports the exact content fraction per bucket. The "
    "batching planner's alternative to quantile bins: an unpartitioned "
    "ntile would funnel the corpus through ONE window task, while this "
    "is a per-row integer expression (exact — no float log2 edge cases "
    "at the powers) + one map-side-combinable groupBy, and the bucket "
    "boundaries never move as the corpus grows. Degenerate docs "
    "(token count <= 0) surface in their own bucket 0 with true token "
    "sums instead of silently inflating bucket 1.",
)
def sample_length_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.sampling import (
        length_bucket_stats,
    )
    from clickhouse_mysql_data_reader_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    return length_bucket_stats(docs, token_count(F.col("text")))


@register(
    "dedup_embed_near",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.35
    """,
    doc="Embedding-cosine near-duplicate detection, cell-blocked: only "
    "vectors in the same coarse-quantizer cell are compared (the "
    "embedding analogue of LSH banding), so candidates scale with "
    "sum(|cell|^2) instead of |corpus|^2.",
)
def dedup_embed_near_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.similarity import near_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return near_dup_pairs(emb, threshold=0.35, cell_col="label")


@register(
    "dedup_embed_near_multiprobe",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    dims AS (
      SELECT label, i, avg(v[i]) AS m
      FROM e, UNNEST(range(1, len(v) + 1)) AS t(i)
      GROUP BY label, i
    ),
    cent AS (SELECT label AS cell, list(m ORDER BY i) AS c FROM dims GROUP BY label),
    scored AS (
      SELECT e.vec_id, cent.cell, list_distance(e.v, cent.c) AS d
      FROM e CROSS JOIN cent
    ),
    probes AS (
      SELECT vec_id, cell
      FROM (SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
            FROM scored)
      WHERE rn <= 2
      UNION
      SELECT vec_id, label AS cell FROM e
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM probes a JOIN probes b ON a.cell = b.cell AND a.vec_id < b.vec_id
    )
    SELECT c.vec_a, c.vec_b,
           round(list_cosine_similarity(ea.v, eb.v), 6) AS cos_sim
    FROM cand c
    JOIN e ea ON ea.vec_id = c.vec_a
    JOIN e eb ON eb.vec_id = c.vec_b
    WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= 0.35
    """,
    doc="dedup_embed_near with multi-probe recall: each vector probes "
    "its 2 nearest per-cell-mean centroids PLUS its labeled cell "
    "(candidates are a strict superset of the single-probe blocking), "
    "restoring near-dup pairs split across a cell border. Candidate "
    "pairs are DISTINCT id pairs from the probes' cell self-join; each "
    "pair is scored once via two id-keyed joins back to the vectors.",
)
def dedup_embed_near_multiprobe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from clickhouse_mysql_data_reader_spark.operators.similarity import (
        near_dup_pairs_multiprobe,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # caller-owned probe-table persist (released by bench.py
    # clearCache): both cell self-join sides read it
    return near_dup_pairs_multiprobe(
        emb, threshold=0.35, n_probe=2, cell_col="label",
        storage=StorageLevel.MEMORY_AND_DISK,
    )


def _srp_oracle_ctes(dim: int = 64, n_bits: int = 32, n_bands: int = 4) -> str:
    """Shared CTE block for the SRP oracles: the SAME md5-derived +-1
    hyperplanes as operators.similarity.srp_hyperplanes, inlined as SQL
    literals, applied to the SAME floor(x*2^16) fixed-point quantization
    — so every sign bit (and therefore every band bucket) is an exact
    integer decision in both engines."""
    from clickhouse_mysql_data_reader_spark.operators.similarity import (
        SRP_SCALE,
        srp_hyperplanes,
    )

    planes = srp_hyperplanes(dim, n_bits)
    band_bits = n_bits // n_bands

    def plane_lit(b: int) -> str:
        return "[" + ", ".join(f"{w}.0" for w in planes[b]) + "]"

    def band_expr(j: int) -> str:
        terms = [
            f"(CASE WHEN list_dot_product(vq, {plane_lit(j * band_bits + i)}) > 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i in range(band_bits)
        ]
        return " + ".join(terms)

    bands = ", ".join(band_expr(j) for j in range(n_bands))
    return f"""
      e AS (SELECT vec_id,
                   list_transform(embedding::DOUBLE[], x -> floor(x * {SRP_SCALE})) AS vq,
                   embedding::DOUBLE[] AS v
            FROM embeddings),
      fp AS (SELECT vec_id, v, [{bands}] AS bands FROM e),
      bt AS (SELECT vec_id, j - 1 AS band_idx, bands[j] AS band_val
             FROM fp, UNNEST(range(1, {n_bands} + 1)) AS t(j))
    """


@register(
    "embed_srp_bands",
    f"""
    WITH {_srp_oracle_ctes()}
    SELECT vec_id AS vid, CAST(band_idx AS INT) AS band_idx,
           CAST(band_val AS BIGINT) AS band_val
    FROM bt
    """,
    doc="SRP-LSH band table (Charikar 2002): 32 sign-random-projection "
    "bits per vector packed into 4 8-bit band buckets. Element-wise "
    "exact-checked against the oracle — validates every hyperplane "
    "sign decision, the same verification depth dedup_minhash_"
    "signatures gives MinHash. The fixed-point floor(x*2^16) "
    "quantization makes each sign an exact integer comparison, immune "
    "to cross-engine float fold differences.",
)
def embed_srp_bands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.similarity import srp_band_table

    emb = load_table(spark, sf_dir, "embeddings")
    # the expression path: SQL-transparent, so the oracle verifies every
    # hyperplane sign; the arrow path is hash-verified end-to-end by
    # dedup_embed_near_srp and bit-equality-pinned in pytest
    bt = srp_band_table(emb, dim=64, impl="expr")
    return bt.select(
        "vid",
        F.col("band_idx").cast("int").alias("band_idx"),
        F.col("band_val").cast("long").alias("band_val"),
    )


@register(
    "dedup_embed_near_srp",
    f"""
    WITH {_srp_oracle_ctes()},
      cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
               FROM bt a
               JOIN bt b ON a.band_idx = b.band_idx
                        AND a.band_val = b.band_val
                        AND a.vec_id < b.vec_id)
    SELECT c.vec_a, c.vec_b,
           round(list_cosine_similarity(ea.v, eb.v), 6) AS cos_sim
    FROM cand c
    JOIN e ea ON ea.vec_id = c.vec_a
    JOIN e eb ON eb.vec_id = c.vec_b
    WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= 0.35
    """,
    doc="Embedding near-dup pairs via SRP-LSH banding — the "
    "quantizer-free sibling of dedup_embed_near: no trained centroids, "
    "no cell-border misses; recall is the (n_bits, n_bands) S-curve "
    "(high at the cos>=0.9 near-dup regime; pinned vs the exact "
    "baseline in tests/test_similarity_extras.py with planted dups). "
    "Band buckets bound the self-join (sum(|bucket|^2), never "
    "|corpus|^2) with md5-uniform keys — no salting needed. The "
    "verify stage re-scores candidates with the exact rounded cosine, "
    "so banding only loses pairs, never invents them.",
)
def dedup_embed_near_srp_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.similarity import (
        near_dup_pairs_srp,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return near_dup_pairs_srp(emb, threshold=0.35, dim=64)


@register(
    "doc_winnow_fingerprint",
    f"""
    WITH
      norm AS (SELECT doc_id, {_NORM} AS nt FROM documents),
      toks AS (SELECT doc_id, string_split(nt, ' ') AS tk FROM norm),
      sh AS (
        SELECT doc_id, i,
               ('0x' || substr(md5(array_to_string(tk[i:i+2], ' ')), 1, 15))::BIGINT AS h
        FROM toks, UNNEST(range(1, greatest(len(tk) - 2, 1) + 1)) AS u(i)
      ),
      lists AS (SELECT doc_id, list(h ORDER BY i) AS hs FROM sh GROUP BY doc_id)
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               range(1, greatest(len(hs) - 3, 1) + 1),
               j -> list_min(hs[j:j+3])))) AS fp_hash
    FROM lists
    """,
    doc="Winnowing fingerprints (Schleimer et al., SIGMOD'03): min-hash "
    "of each sliding window of 4 consecutive ordered 3-gram hashes. "
    "Pure per-row array work — zero shuffles; guarantees shared runs "
    ">= w+k-1 tokens produce shared fingerprints at ~1/w density.",
)
def doc_winnow_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.text import winnow_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    return winnow_fingerprints(docs, "text", "doc_id", k=3, w=4)


@register(
    "embed_cell_assign",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    dims AS (
      SELECT label, i, avg(v[i]) AS m
      FROM e, UNNEST(range(1, len(v) + 1)) AS t(i)
      GROUP BY label, i
    ),
    cent AS (SELECT label AS cell, list(m ORDER BY i) AS c FROM dims GROUP BY label),
    scored AS (
      SELECT e.vec_id, cent.cell, list_distance(e.v, cent.c) AS d
      FROM e CROSS JOIN cent
    )
    SELECT vec_id, cell
    FROM (SELECT vec_id, cell,
                 row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
          FROM scored)
    WHERE rn = 1
    """,
    doc="IVF coarse quantizer end-to-end: per-cell mean centroids (one "
    "k-means step, computed per-dimension so no cell ever gathers on "
    "one executor) then broadcast-argmin assignment. This is the step "
    "that produces the cell ids embed_ivf_topk and dedup_embed_near "
    "block on. Ordering-only use of distance keeps it oracle-exact "
    "(sqrt vs squared L2 is monotone).",
)
def embed_cell_assign_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.similarity import (
        assign_cells,
        centroids_by_cell,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return assign_cells(emb, centroids_by_cell(emb))


@register(
    "dedup_lsh_jaccard",
    f"""
    WITH {_SHINGLE_CTE},
    mh AS (SELECT doc_id, {_MH_COLS} FROM sh GROUP BY doc_id),
    bands AS (
    {_BAND_SELECTS}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS n_inter
      FROM cand c
      JOIN sh a ON a.doc_id = c.doc_a
      JOIN sh b ON b.doc_id = c.doc_b AND b.sh_h = a.sh_h
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b, i.n_inter,
           i.n_inter / (sa.n_sh + sb.n_sh - i.n_inter) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    """,
    doc="The full 100 TB near-dup pipeline as one verified operator: "
    "MinHash signatures -> LSH band buckets -> candidate pairs -> exact "
    "Jaccard ONLY over candidates. The candidate set drives the "
    "verification join, so the all-pairs co-shingle explosion never "
    "materializes — cost is |candidates| x shingles-per-doc.",
)
def dedup_lsh_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_table(docs, "text", "doc_id", k=3, partition_by_id=True)
    sigs = minhash_signatures(sh, NUM_HASHES)
    cands = lsh_candidate_pairs(sigs, NUM_HASHES, BANDS)
    # the shared shingle frame feeds signatures AND the verify join;
    # caller-owned persist (bench.py clearCache releases it)
    return jaccard_pairs(sh, candidates=cands, storage=StorageLevel.MEMORY_AND_DISK)


# --- dedup clustering, sampling, PII, tf-idf, quantization (round 3) -------

_CC_THRESHOLD = 0.5

# CTE chain shared by the components query and its keeper-policy
# extension: shingles -> minhash -> LSH bands -> candidate pairs ->
# Jaccard-verified edges -> recursive transitive closure (`reach`).
_CC_REACH_CTES = f"""
    WITH RECURSIVE {_SHINGLE_CTE},
    mh AS (SELECT doc_id, {_MH_COLS} FROM sh GROUP BY doc_id),
    bands AS (
    {_BAND_SELECTS}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS n_inter
      FROM cand c
      JOIN sh a ON a.doc_id = c.doc_a
      JOIN sh b ON b.doc_id = c.doc_b AND b.sh_h = a.sh_h
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b
      WHERE i.n_inter / (sa.n_sh + sb.n_sh - i.n_inter) >= {_CC_THRESHOLD}
    ),
    edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach(u, lbl) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
      UNION
      SELECT e.u, r.lbl FROM edges e JOIN reach r ON r.u = e.v
    )"""


@register(
    "dedup_cluster_components",
    f"""{_CC_REACH_CTES}
    SELECT u AS doc_id, min(lbl) AS component FROM reach GROUP BY u
    """,
    doc="The dedup ENDGAME: near-dup pairs (LSH -> Jaccard >= 0.5) "
    "folded into connected components, labeling every document with its "
    "cluster's min doc_id — the transitive closure that turns pairwise "
    "similarity into keep/drop groups. Spark side is iterative "
    "neighbor-min label propagation (joins + groupBy per round, "
    "converges in graph-diameter rounds — 2-4 for near-dup cliques); "
    "the oracle is DuckDB's recursive CTE over the identical pair set.",
)
def dedup_cluster_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from clickhouse_mysql_data_reader_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_table(docs, "text", "doc_id", k=3, partition_by_id=True)
    sigs = minhash_signatures(sh, NUM_HASHES)
    cands = lsh_candidate_pairs(sigs, NUM_HASHES, BANDS)
    # sh feeds the signature subtree AND the verify join's three reads;
    # caller-owned persist, same discipline as dedup_lsh_jaccard
    pairs = jaccard_pairs(
        sh, candidates=cands, min_jaccard=_CC_THRESHOLD,
        storage=StorageLevel.MEMORY_AND_DISK,
    )
    return connected_components(pairs)


@register(
    "dedup_cluster_best_keeper",
    f"""{_CC_REACH_CTES},
    comp AS (SELECT u AS doc_id, min(lbl) AS component FROM reach GROUP BY u),
    scored AS (
      SELECT c.doc_id, c.component, d.n_chars
      FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    ),
    best AS (SELECT component, max(n_chars) AS mx FROM scored GROUP BY component),
    keeper AS (
      SELECT s.component, min(s.doc_id) AS keeper_id
      FROM scored s JOIN best b
        ON s.component = b.component AND s.n_chars = b.mx
      GROUP BY s.component
    )
    SELECT s.doc_id, s.component, k.keeper_id,
           s.doc_id = k.keeper_id AS is_keeper
    FROM scored s JOIN keeper k ON s.component = k.component
    """,
    doc="Quality-aware keeper policy over the near-dup components: the "
    "kept representative of each cluster is the LONGEST member "
    "(n_chars, ties -> min doc_id) instead of the blind min-id label — "
    "what production near-dup passes actually do (keep the best doc, "
    "not the first-crawled one). Spark side composes "
    "connected_components with a map-side-combinable max(struct(score, "
    "-id)) per component + one join back — no window, so a giant "
    "boilerplate cluster still partial-aggregates across tasks. The "
    "component column hash-verifies the full transitive closure "
    "end-to-end, which is why this query subsumes "
    "dedup_cluster_components in the driver-checked set.",
)
def dedup_cluster_best_keeper_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from clickhouse_mysql_data_reader_spark.operators.graph import (
        component_keepers,
        connected_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_table(docs, "text", "doc_id", k=3, partition_by_id=True)
    sigs = minhash_signatures(sh, NUM_HASHES)
    cands = lsh_candidate_pairs(sigs, NUM_HASHES, BANDS)
    pairs = jaccard_pairs(
        sh, candidates=cands, min_jaccard=_CC_THRESHOLD,
        storage=StorageLevel.MEMORY_AND_DISK,
    )
    comp = connected_components(pairs)
    return component_keepers(comp, docs.select("doc_id", "n_chars"), "n_chars")


_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}
_STRATA_RATES = {"click": 0.5, "view": 0.1, "purchase": 1.0}
_DEFAULT_RATE = 0.1


def _register_cluster_safe_split() -> None:
    """Deferred so the helpers below (_sql_split_case) exist first."""

    @register(
        "sample_split_cluster_safe",
        f"""{_CC_REACH_CTES},
    comp AS (SELECT u AS doc_id, min(lbl) AS component FROM reach GROUP BY u),
    labeled AS (
      SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c USING (doc_id)
    )
    SELECT doc_id, component, {_sql_split_case('component')} AS split
    FROM labeled
    """,
        doc="Leakage-safe train/val/test split (operators/sampling.py "
        "cluster_safe_split): the split label hashes the near-dup "
        "COMPONENT (LSH -> Jaccard verify -> connected components, the "
        "checked dedup_cluster machinery) instead of the doc id, so a "
        "document and its near-twin can never straddle train and test "
        "— the eval-leakage failure the plain hash_split has with "
        "probability 2*p_train*p_test per near-dup pair, which "
        "within-split dedup cannot fix (the leak is ACROSS splits). "
        "Singletons skip the graph via the left join and hash their "
        "own id, so a dup-free corpus degenerates to the plain split "
        "bit-for-bit (same salt, same thresholds). Plan: components "
        "are bounded by the near-dup population; the corpus takes one "
        "join + a scan-stage hash CASE. The oracle replays the full "
        "closure (recursive CTE) and the exact split thresholds.",
    )
    def sample_split_cluster_safe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark import StorageLevel

        from clickhouse_mysql_data_reader_spark.operators.sampling import (
            cluster_safe_split,
        )

        docs = load_table(spark, sf_dir, "documents")
        sh = shingle_table(docs, "text", "doc_id", k=3, partition_by_id=True)
        sigs = minhash_signatures(sh, NUM_HASHES)
        cands = lsh_candidate_pairs(sigs, NUM_HASHES, BANDS)
        pairs = jaccard_pairs(
            sh, candidates=cands, min_jaccard=_CC_THRESHOLD,
            storage=StorageLevel.MEMORY_AND_DISK,
        )
        return cluster_safe_split(
            docs.select("doc_id"), pairs, _SPLITS
        ).select("doc_id", "component", "split")


def _sql_hash(salt: str, key_sql: str) -> str:
    return f"substr(md5('{salt}:' || CAST({key_sql} AS VARCHAR)), 1, 8)"


def _sql_sample_cond(key_sql: str, rate: float, salt: str = "sample") -> str:
    from clickhouse_mysql_data_reader_spark.operators.sampling import _hex_threshold

    if rate >= 1.0:
        return "TRUE"
    if rate <= 0.0:
        return "FALSE"
    return f"{_sql_hash(salt, key_sql)} < '{_hex_threshold(rate)}'"


def _sql_split_case(key_sql: str) -> str:
    from clickhouse_mysql_data_reader_spark.operators.sampling import _hex_threshold

    branches, cum = [], 0.0
    names = list(_SPLITS)
    for name in names[:-1]:
        cum += _SPLITS[name]
        branches.append(f"WHEN {_sql_hash('split', key_sql)} < '{_hex_threshold(cum)}' THEN '{name}'")
    return "CASE " + " ".join(branches) + f" ELSE '{names[-1]}' END"


def _sql_strat_cond(key_sql: str, strata_sql: str) -> str:
    whens = " ".join(
        f"WHEN {strata_sql} = '{v}' THEN {_sql_sample_cond(key_sql, r)}"
        for v, r in sorted(_STRATA_RATES.items())
    )
    return f"CASE {whens} ELSE {_sql_sample_cond(key_sql, _DEFAULT_RATE)} END"


_register_cluster_safe_split()


@register(
    "sample_stratified_split",
    f"""
    WITH tagged AS (
      SELECT event_type,
             {_sql_split_case('event_id')} AS split,
             {_sql_strat_cond('event_id', 'event_type')} AS keep
      FROM events
    )
    SELECT event_type, split,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM tagged GROUP BY event_type, split
    """,
    doc="Deterministic hash sampling + dataset splitting in one pass: "
    "80/10/10 train/val/test assignment AND per-stratum downsampling "
    "(click 50%, view 10%, purchase 100%), both keyed on "
    "md5(salt || event_id) so membership is identical across runs, "
    "stage retries, and engines — unlike df.sample, whose per-partition "
    "seed changes with the physical layout. Different salts decorrelate "
    "the split from the sample. Zero shuffles before the final count.",
)
def sample_stratified_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.sampling import (
        hash_split,
        stratified_sample_condition,
    )

    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        "event_type",
        hash_split(F.col("event_id"), _SPLITS).alias("split"),
        stratified_sample_condition(
            F.col("event_id"), F.col("event_type"), _STRATA_RATES, _DEFAULT_RATE
        ).alias("keep"),
    )
    return tagged.groupBy("event_type", "split").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_sampled"),
    )


@register(
    "text_pii_redact",
    """
    WITH prof AS (
      SELECT c_custkey,
             lower(concat_ws(' ', c_name, c_mktsegment,
               CASE WHEN c_custkey % 2 = 0
                    THEN replace(lower(c_name), '#', '.') || '@example.com'
                    ELSE 'no email on file' END,
               CASE WHEN c_custkey % 3 = 0
                    THEN lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0') || '-' ||
                         lpad(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0') || '-' ||
                         lpad(CAST((c_custkey * 13) % 1000 AS VARCHAR), 3, '0') || '-' ||
                         lpad(CAST((c_custkey * 31) % 10000 AS VARCHAR), 4, '0')
                    ELSE 'unlisted' END)) AS lt
      FROM customer
    )
    SELECT c_custkey,
           len(regexp_extract_all(lt, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS n_emails,
           len(regexp_extract_all(lt, '[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phones,
           regexp_replace(regexp_replace(lt,
             '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '[EMAIL]', 'g'),
             '[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g') AS redacted
    FROM prof
    """,
    doc="PII scrub over contact-profile text: count emails/phones via "
    "regexp_extract_all, redact via ordered regexp_replace (emails then "
    "phones). Patterns are chosen to parse identically under Java regex "
    "and RE2. The profile text is synthesized deterministically from "
    "customer keys (the test tables carry no organic PII), with ~1/2 of "
    "rows getting an email and ~1/3 a phone so counts actually vary. "
    "Per-row expression work — rides the scan at any scale.",
)
def text_pii_redact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.text import pii_redact

    cust = load_table(spark, sf_dir, "customer")

    def _pad(expr, n):
        return F.lpad(expr.cast("string"), n, "0")

    email = F.concat(
        F.regexp_replace(F.lower("c_name"), "#", "."), F.lit("@example.com")
    )
    phone = F.concat_ws(
        "-",
        _pad(F.col("c_custkey") % 100, 2),
        _pad((F.col("c_custkey") * 7) % 1000, 3),
        _pad((F.col("c_custkey") * 13) % 1000, 3),
        _pad((F.col("c_custkey") * 31) % 10000, 4),
    )
    prof = cust.select(
        "c_custkey",
        F.concat_ws(
            " ",
            F.col("c_name"),
            F.col("c_mktsegment"),
            F.when(F.col("c_custkey") % 2 == 0, email).otherwise(F.lit("no email on file")),
            F.when(F.col("c_custkey") % 3 == 0, phone).otherwise(F.lit("unlisted")),
        ).alias("profile"),
    )
    return pii_redact(prof, "profile", "c_custkey")


@register(
    "text_tfidf_top_terms",
    f"""
    WITH norm AS (SELECT doc_id, {_NORM} AS nt FROM documents),
    toks AS (SELECT doc_id, t.term
             FROM norm, UNNEST(string_split(nt, ' ')) AS t(term)),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM toks GROUP BY doc_id, term),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, d.df,
             tf.tf * ((n.n_docs * 1000) // d.df) AS score
      FROM tf JOIN dfreq d USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, score, rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, term ASC) AS rnk
          FROM scored)
    WHERE rnk <= 3
    """,
    doc="Top-3 characteristic terms per document by tf-idf with a "
    "scaled-integer idf ((N*1000) div df): floor division of bigints is "
    "bit-identical across engines, unlike ln(N/df) whose libm ulps can "
    "flip near-tie rankings. Deterministic (score desc, term asc) "
    "ordering. Plan: explode + two hash aggs + broadcast 1-row count + "
    "per-doc window — the df join is AQE's choice of broadcast vs "
    "shuffle depending on vocabulary size.",
)
def text_tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.text import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "text", "doc_id", top_k=3)


_BM25_TERMS = ("vector", "merge", "scan", "query")
_BM25_IN = ", ".join(f"'{t}'" for t in _BM25_TERMS)


@register(
    "text_bm25_topk",
    f"""
    WITH norm AS (SELECT doc_id, {_NORM} AS nt FROM documents),
    base AS (SELECT doc_id, string_split(nt, ' ') AS tk FROM norm),
    dls AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM base),
    totals AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(sum(dl) AS BIGINT) AS total_tok FROM dls),
    tf AS (
      SELECT b.doc_id, d.dl, t.term, CAST(count(*) AS BIGINT) AS tf
      FROM base b JOIN dls d USING (doc_id), UNNEST(b.tk) AS t(term)
      WHERE t.term IN ({_BM25_IN})
      GROUP BY b.doc_id, d.dl, t.term
    ),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
    scored AS (
      -- HUGEINT (int128), NOT DECIMAL: DuckDB's // on DECIMAL operands
      -- lowers to DOUBLE division (no floor), while // on HUGEINT is
      -- exact integer division — the twin of Spark's DECIMAL(38,0) div
      SELECT tf.doc_id,
             CAST((CAST(((2*n_docs - 2*df + 1) * 1000) // (2*df + 1)
                        AS HUGEINT)
                   * (tf * 11 * 4 * 1000))
                  // (5*4*1000*tf + 6*(4-3)*1000
                      + 6*3*((dl * 1000 * n_docs) // total_tok))
                  AS BIGINT) AS term_score
      FROM tf JOIN dfreq USING (term) CROSS JOIN totals
    )
    SELECT doc_id, CAST(sum(term_score) AS BIGINT) AS score,
           CAST(count(*) AS BIGINT) AS n_terms
    FROM scored GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC LIMIT 10
    """,
    doc="BM25 top-10 retrieval for a fixed 4-term query in the "
    "scaled-integer determinism idiom: RSJ odds idf without the log "
    "(((2N-2df+1)*1000) div (2df+1) — libm-free, so near-tie rankings "
    "can't flip on a ulp) and rational k1=6/5, b=3/4 cleared to "
    "integers with a DECIMAL(38,0) product (web-scale N can't overflow "
    "int64). Tokens are filtered to the query's terms BEFORE the tf "
    "aggregate; df joins broadcast (<= |query| rows); final top-k is "
    "TakeOrderedAndProject, never a global sort.",
)
def text_bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.text import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, "text", "doc_id", list(_BM25_TERMS), top_k=10)


@register(
    "text_bm25_frozen",
    # Same oracle as text_bm25_topk: frozen stats BUILT FROM the scored
    # corpus are definitionally equal to the derived statistics, so the
    # two Spark plans (recount vs frozen-table join) must hash-match
    # the one SQL. What differs — and what this query driver-checks —
    # is the deployment PLAN: df/N/avgdl come from the bm25_stats
    # relation (left join + 1-row max agg), not from the scored frame.
    QUERIES["text_bm25_topk"].oracle,
    doc="BM25 top-10 through the FROZEN-STATS deployment path "
    "(bm25_topk(stats=bm25_stats(corpus))): collection statistics land "
    "once and daily batches score against the same distribution, so a "
    "document's score is batch-composition-independent — the "
    "lm_surprisal(counts=)/DSIR deployment shape. Built here from the "
    "scored corpus itself, making results provably identical to "
    "text_bm25_topk (also pinned vs the derived form in "
    "test_bm25_frozen_stats); unseen query terms take df=0 (maximal "
    "idf). Plan: vocab-sized stats relation joins broadcast; totals "
    "are a 1-row max aggregate over it, never a corpus rescan.",
)
def text_bm25_frozen_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from clickhouse_mysql_data_reader_spark.operators.text import (
        bm25_stats,
        bm25_topk,
    )

    docs = load_table(spark, sf_dir, "documents")
    # the vocab-sized stats relation has several consumers inside
    # bm25_topk (per-term df joins + the 1-row totals aggregate); in
    # production it is LANDED once — persisting here models that
    # (caller-owned, released by bench.py clearCache) instead of
    # re-deriving it from the corpus per consumer
    stats = bm25_stats(docs, "text", "doc_id").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    return bm25_topk(
        docs, "text", "doc_id", list(_BM25_TERMS), top_k=10, stats=stats,
    )


@register(
    "embed_quantize_int8",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM e),
    s AS (SELECT vec_id, v,
                 CASE WHEN mx = 0 THEN 1.0 ELSE mx / 127.0 END AS scale
          FROM m)
    SELECT vec_id, scale,
           array_to_string(list_transform(v,
             x -> CAST(floor(x / scale + 0.5) AS BIGINT)), ',') AS q8
    FROM s
    """,
    doc="Symmetric per-vector int8 quantization (scale = max|v|/127, "
    "codes = floor(v/scale + 0.5)) — the standard 4x compression step "
    "before ANN indexing at 100 TB. Every step (float->double widening, "
    "max, IEEE divide, floor) is bit-deterministic, so the oracle "
    "verifies the EXACT codes, emitted as comma-joined strings (array "
    "columns compare engine-specifically).",
)
def embed_quantize_int8_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.similarity import quantize_int8

    emb = load_table(spark, sf_dir, "embeddings")
    return quantize_int8(emb, "vec_id", "embedding")


@register(
    "embed_centroid_drift",
    """
    WITH base AS (
      SELECT vec_id, label, r.i AS pos,
             CAST(floor(CAST(embedding[r.i] AS DOUBLE) * 1000000000 + 0.5)
                  AS BIGINT) AS t
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS r(i)
    ),
    o AS (SELECT label, pos, CAST(sum(t) AS HUGEINT) AS s, count(*) AS n
          FROM base WHERE vec_id % 2 = 0 GROUP BY label, pos),
    nn AS (SELECT label, pos, CAST(sum(t) AS HUGEINT) AS s, count(*) AS n
           FROM base WHERE vec_id % 2 = 1 GROUP BY label, pos),
    j AS (SELECT o.label, o.s AS so, nn.s AS sn, o.n AS n_old, nn.n AS n_new
          FROM o JOIN nn ON o.label = nn.label AND o.pos = nn.pos),
    agg AS (SELECT label, min(n_old) AS n_old, min(n_new) AS n_new,
                   sum(so * sn) AS dot, sum(so * so) AS no2, sum(sn * sn) AS nn2
            FROM j GROUP BY label)
    SELECT label, CAST(n_old AS BIGINT) AS n_old, CAST(n_new AS BIGINT) AS n_new,
           CASE WHEN sqrt(CAST(no2 AS DOUBLE) * CAST(nn2 AS DOUBLE)) = 0 THEN 0.0
                ELSE round(CAST(dot AS DOUBLE)
                     / sqrt(CAST(no2 AS DOUBLE) * CAST(nn2 AS DOUBLE)), 6)
           END AS centroid_cos
    FROM agg
    """,
    doc="Per-label embedding-distribution drift "
    "(operators/similarity.py centroid_drift): cosine between each "
    "label's old- and new-snapshot centroids — the embedding-space "
    "twin of corpus_snapshot_diff for encoder/data-shift monitoring. "
    "Float sums are partition-order-dependent, so elements quantize to "
    "integer ticks first (the quantize_int8 bit-deterministic double "
    "pipeline); (label, dim) tick sums are exact BIGINTs, dot/norm "
    "products ride DECIMAL(38,0)/HUGEINT, and the final cosine divides "
    "identical doubles. Scale: one posexplode at the scan, map-side "
    "combine to labels x dims rows; vectors never shuffle. The two "
    "snapshots here are the even/odd vec_id halves.",
)
def embed_centroid_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.similarity import (
        centroid_drift,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return centroid_drift(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
    )


@register(
    "text_repetition_stats",
    f"""
    WITH norm AS (SELECT doc_id, {_NORM} AS nt FROM documents),
    base AS (SELECT doc_id, string_split(nt, ' ') AS tk FROM norm),
    sized AS (SELECT doc_id, tk, len(tk) AS n FROM base),
    uni AS (SELECT doc_id, t.term, count(*) AS c
            FROM sized, UNNEST(tk) AS t(term) GROUP BY doc_id, t.term),
    unitop AS (SELECT doc_id, max(c) AS top_uni FROM uni GROUP BY doc_id),
    bi AS (SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS bg, count(*) AS c
           FROM sized, UNNEST(range(1, greatest(n - 1, 1) + 1)) AS u(i)
           GROUP BY doc_id, bg),
    bitop AS (SELECT doc_id, max(c) AS top_bi FROM bi GROUP BY doc_id)
    SELECT s.doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           top_uni / n AS top_unigram_frac,
           top_bi / greatest(n - 1, 1) AS top_bigram_frac,
           (n - len(list_distinct(tk))) / n AS dup_token_frac,
           (top_uni / n > 0.30 OR top_bi / greatest(n - 1, 1) > 0.18)
             AS flag_repetitive
    FROM sized s JOIN unitop USING (doc_id) JOIN bitop USING (doc_id)
    """,
    doc="Gopher-style repetition quality rules (top-unigram/top-bigram "
    "token fractions, duplicate-token fraction; bigram flag at the "
    "published 0.18, unigram at 0.30 since prose spends 0.2+ on one "
    "stopword). Spark side is a per-row array_sort + aggregate "
    "fold (longest equal run = top multiplicity): ZERO shuffles vs the "
    "oracle's textbook explode+groupBy+max formulation — same numbers, "
    "scan-stage-only plan.",
)
def text_repetition_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.text import repetition_stats

    docs = load_table(spark, sf_dir, "documents")
    return repetition_stats(docs, "text", "doc_id")


@register(
    "doc_pack_sequences",
    f"""
    WITH norm AS (SELECT doc_id, {_NORM} AS nt FROM documents),
    base AS (SELECT doc_id,
                    CAST(len(string_split(nt, ' ')) AS BIGINT) AS n_tokens,
                    CAST(doc_id % 8 AS INT) AS shard
             FROM norm),
    c AS (SELECT shard, doc_id, n_tokens,
                 CAST(sum(n_tokens) OVER (
                        PARTITION BY shard ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      - n_tokens AS BIGINT) AS start_token
          FROM base)
    SELECT shard, doc_id, n_tokens, start_token,
           CAST(start_token // 128 AS BIGINT) AS pack_id,
           CAST(start_token % 128 AS BIGINT) AS pack_offset
    FROM c
    """,
    doc="Sequence packing for pretraining: documents laid end-to-end in "
    "doc_id order, each assigned the 128-token context window (pack) "
    "and offset where it starts. Sharded by doc_id % 8 so the running "
    "sum is n_shards independent window partitions instead of one "
    "global ORDER BY task — the difference between parallel and "
    "serialized at 100 TB.",
)
def doc_pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.sampling import pack_sequences
    from clickhouse_mysql_data_reader_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, token_count(F.col("text")), "doc_id", budget=128, n_shards=8)


@register(
    "doc_contamination_check",
    f"""
    WITH
    {_SHINGLE_CTE},
    ben AS (SELECT doc_id, sh_h FROM sh WHERE doc_id % 25 = 0),
    corp AS (SELECT DISTINCT sh_h FROM sh WHERE doc_id % 25 <> 0),
    agg AS (
      SELECT b.doc_id,
             CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(sum(CASE WHEN c.sh_h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated
      FROM ben b LEFT JOIN corp c USING (sh_h)
      GROUP BY b.doc_id
    )
    SELECT doc_id, n_shingles, n_contaminated,
           n_contaminated / n_shingles AS contamination_frac,
           (n_contaminated / n_shingles) >= 0.5 AS flag_contaminated
    FROM agg
    """,
    doc="Benchmark decontamination: per eval-document fraction of "
    "3-gram shingles found anywhere in the training corpus (eval set = "
    "doc_id % 25 = 0 here). The Spark plan broadcasts the benchmark's "
    "shingle ids into a left-semi join against the corpus shingle "
    "stream, so the 100 TB corpus side is scanned once and never "
    "shuffled; only the tiny hit set is deduplicated and joined back.",
)
def doc_contamination_check_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.dedup import contamination_check

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    corpus = docs.filter(F.col("doc_id") % 25 != 0)
    return contamination_check(corpus, bench, "text", "doc_id", flag_threshold=0.5)


@register(
    "doc_corpus_contamination",
    f"""
    WITH
    {_SHINGLE_CTE},
    ben AS (SELECT DISTINCT sh_h FROM sh WHERE doc_id % 25 = 0),
    corp AS (SELECT doc_id, sh_h FROM sh WHERE doc_id % 25 <> 0),
    agg AS (
      SELECT c.doc_id,
             CAST(count(DISTINCT c.sh_h) AS BIGINT) AS n_shingles,
             CAST(count(DISTINCT CASE WHEN b.sh_h IS NOT NULL THEN c.sh_h END)
                  AS BIGINT) AS n_contaminated
      FROM corp c LEFT JOIN ben b USING (sh_h)
      GROUP BY c.doc_id
    )
    SELECT doc_id, n_shingles, n_contaminated,
           n_contaminated / n_shingles AS contamination_frac,
           (n_contaminated / n_shingles) >= 0.5 AS flag_contaminated
    FROM agg
    """,
    doc="Corpus-side decontamination (the dual of doc_contamination_check, "
    "and the direction curate() drops training docs with): per CORPUS "
    "document, the fraction of its 3-gram shingles found anywhere in the "
    "benchmark (eval set = doc_id % 25 = 0). The Spark plan broadcasts the "
    "benchmark's distinct shingle hashes onto the corpus shingle stream; "
    "the corpus crosses the wire once, inside the partial-deduped per-doc "
    "distinct-count aggregate — never broadcast, never shuffled twice.",
)
def doc_corpus_contamination_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.dedup import corpus_contamination

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    corpus = docs.filter(F.col("doc_id") % 25 != 0)
    return corpus_contamination(corpus, bench, "text", "doc_id", flag_threshold=0.5)


# mixture weights shared verbatim by the Spark builder and the SQL
# oracle below — per-branch targets are Python-evaluated literals so
# both engines divide the identical constant by src_tokens
_MIX_WEIGHTS = {"src1": 0.2, "src2": 0.1, "src3": 0.05}
_MIX_BUDGET = 10_000
_MIX_DEFAULT_W = 0.02


def _sql_mixture_target() -> str:
    whens = " ".join(
        f"WHEN '{s}' THEN {float(_MIX_BUDGET * w)}"
        for s, w in sorted(_MIX_WEIGHTS.items())
    )
    return f"CASE source {whens} ELSE {float(_MIX_BUDGET * _MIX_DEFAULT_W)} END"


@register(
    "sample_mixture_weights",
    f"""
    WITH d AS (
      SELECT doc_id, source,
             CAST(len(string_split({_NORM}, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    t AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
          FROM d GROUP BY source),
    r AS (SELECT source,
                 least(1.0, ({_sql_mixture_target()}) / src_tokens) AS rate
          FROM t),
    k AS (
      SELECT d.source, d.n_tokens, r.rate,
             (r.rate >= 1.0 OR
              {_sql_hash('mixture', 'doc_id')} <
              lower(lpad(to_hex(CAST(floor(r.rate * 4294967296.0) AS BIGINT)), 8, '0')))
               AS keep
      FROM d JOIN r USING (source)
    )
    SELECT source,
           max(rate) AS rate,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
           CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT)
             AS n_tokens_kept
    FROM k GROUP BY source
    """,
    doc="Pretraining mixture construction: per-source keep-rate "
    "min(1, budget*weight / source_tokens) applied as deterministic "
    "md5 hash sampling (data-dependent rates -> runtime hex threshold). "
    "Over-represented sources are downsampled toward their mixture "
    "weight; under-represented ones kept whole. Two aggs + a broadcast "
    "of the few-row rate table — the corpus is scanned, never cached.",
)
def sample_mixture_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.sampling import mixture_sample
    from clickhouse_mysql_data_reader_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    return mixture_sample(
        docs,
        token_count(F.col("text")),
        "doc_id",
        "source",
        _MIX_WEIGHTS,
        _MIX_BUDGET,
        default_weight=_MIX_DEFAULT_W,
    )


_EPOCH_WEIGHTS = {"src1": 0.5, "src2": 0.05}
_EPOCH_BUDGET = 100_000
_EPOCH_DEFAULT_W = 0.003


def _sql_epoch_target() -> str:
    whens = " ".join(
        f"WHEN '{s}' THEN {float(_EPOCH_BUDGET * w)}"
        for s, w in sorted(_EPOCH_WEIGHTS.items())
    )
    return f"CASE source {whens} ELSE {float(_EPOCH_BUDGET * _EPOCH_DEFAULT_W)} END"


@register(
    "sample_mixture_epochs",
    f"""
    WITH d AS (
      SELECT doc_id, source,
             CAST(len(string_split({_NORM}, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    t AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
          FROM d GROUP BY source),
    r AS (SELECT source, ({_sql_epoch_target()}) / src_tokens AS rate FROM t),
    c AS (
      SELECT d.doc_id, d.source,
             CAST(floor(r.rate) AS INT) +
             (CASE WHEN {_sql_hash('mixture', 'doc_id')} <
                  lower(lpad(to_hex(CAST(floor((r.rate - floor(r.rate))
                        * 4294967296.0) AS BIGINT)), 8, '0'))
              THEN 1 ELSE 0 END) AS n_copies
      FROM d JOIN r USING (source)
    )
    SELECT doc_id, source, CAST(unnest(range(0, n_copies)) AS INT) AS copy_no
    FROM c
    """,
    doc="Mixture shaping WITH repetition (epochs): a source whose "
    "target share exceeds one pass over it gets floor(rate) full "
    "copies of every doc plus one extra copy of a hash-drawn "
    "(rate - floor(rate)) fraction — the GPT-3/LLaMA-style multi-epoch "
    "upweighting of small high-quality sources; rates below 1 "
    "degenerate to the checked mixture down-sampling. Replication is "
    "an in-plan explode(sequence(...)) riding the scan (no generated-"
    "series join, no driver loop); copy counts are a pure function of "
    "(key, salt, totals). Subsumes sample_mixture_weights' machinery: "
    "the same totals -> rate -> md5-threshold chain decides every "
    "copy, so the copy_no output hash-verifies the rates end-to-end.",
)
def sample_mixture_epochs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.sampling import (
        mixture_oversample,
    )
    from clickhouse_mysql_data_reader_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    out = mixture_oversample(
        docs,
        token_count(F.col("text")),
        "doc_id",
        "source",
        _EPOCH_WEIGHTS,
        _EPOCH_BUDGET,
        default_weight=_EPOCH_DEFAULT_W,
    )
    return out.select("doc_id", "source", "copy_no")


@register(
    "dedup_bloom_prefilter",
    """
    WITH hist AS (SELECT DISTINCT md5(text) AS fp FROM documents
                  WHERE doc_id % 2 = 0),
         newb AS (SELECT doc_id, md5(text) AS fp FROM documents
                  WHERE doc_id % 2 = 1)
    SELECT n.doc_id, n.fp
    FROM newb n LEFT JOIN hist h USING (fp)
    WHERE h.fp IS NULL
    """,
    doc="Bloom-prefiltered history anti-join (operators/membership.py): "
    "new-batch rows that are DEFINITE Bloom misses skip the shuffle "
    "join entirely; only maybe-rows (hits + fpp false positives) pay "
    "the exact anti-join, which removes the false positives — the "
    "composition equals the plain anti-join for ANY fpp, which is "
    "exactly what this oracle verifies. The incremental-dedup hot "
    "path at 100 TB: a steady corpus is almost all definite misses, "
    "so the per-increment shuffle shrinks from |batch| to ~|hits|. "
    "ClickHouse's bloom_filter skip index answers the same problem "
    "read-side (reference delegates to it); Spark's internal "
    "bloom_filter_agg is unexposed here, so the filter is built "
    "per-partition in Arrow batches and OR-merged driver-side "
    "(bounded bytes/partition, same class as a broadcast dim).",
)
def dedup_bloom_prefilter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.membership import (
        bloom_prefiltered_anti_join,
    )

    docs = load_table(spark, sf_dir, "documents")
    new_b = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", F.md5(F.col("text")).alias("fp")
    )
    hist = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.md5(F.col("text")).alias("fp")
    )
    return bloom_prefiltered_anti_join(new_b, hist, "fp", fpp=0.05)


# --- round-5 additions: simhash near-dup join, domain capping, vocab -------

_SIMHASH_CTE = f"""
    norm2 AS (SELECT doc_id, {_NORM} AS nt FROM documents),
    tok2 AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS tok FROM norm2),
    th2 AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS th FROM tok2),
    bits2 AS (
      SELECT doc_id, i AS bit_i,
             sum(CASE WHEN (th >> i) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM th2, UNNEST(range(0, 32)) AS u(i)
      GROUP BY doc_id, i
    ),
    sig AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit_i) ELSE 0 END)
                  AS BIGINT) AS simhash
      FROM bits2 GROUP BY doc_id
    )
"""


@register(
    "dedup_simhash_near",
    f"""
    WITH {_SIMHASH_CTE}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    doc="SimHash near-duplicate pairs via pigeonhole banding (Manku "
    "WWW'07): the 32-bit fingerprint splits into 4 chunks; Hamming<=3 "
    "forces agreement on >=1 chunk, so candidates come from an "
    "equi-self-join on (chunk_i, chunk_val) — never the all-pairs "
    "product the oracle brute-forces — and one bit_count(XOR) verifies. "
    "Checks the full simhash computation end-to-end (fingerprint bits "
    "drive both bucketing and the hamming values).",
)
def dedup_simhash_near_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.dedup import simhash_near_pairs

    docs = load_table(spark, sf_dir, "documents")
    sigs = simhash(docs, "text", "doc_id", bits=32)
    return simhash_near_pairs(sigs, bits=32, hamming_max=3).withColumn(
        "hamming", F.col("hamming").cast("long")
    )


@register(
    "sample_source_cap",
    """
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY substr(md5('srccap:' || CAST(doc_id AS VARCHAR)), 1, 8),
                        CAST(doc_id AS VARCHAR)
             ) AS src_rank
      FROM documents
    )
    SELECT doc_id, source, CAST(src_rank AS BIGINT) AS src_rank
    FROM ranked WHERE src_rank <= 15
    """,
    doc="Per-source quota cap (Common-Crawl style domain capping): at "
    "most N docs admitted per source, chosen by a salted-md5 uniform "
    "draw so the survivors are an unbiased, retry-stable sample rather "
    "than crawl-order-biased 'first N'. One shuffle keyed on source; "
    "row_number state is O(1) per reducer and sorts spill, so a "
    "mega-domain skews time, not memory.",
)
def sample_source_cap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.sampling import source_quota_cap

    docs = load_table(spark, sf_dir, "documents")
    return source_quota_cap(docs, "source", "doc_id", quota=15).select(
        "doc_id", "source", F.col("src_rank").cast("long").alias("src_rank")
    )


@register(
    "text_vocab_topk",
    f"""
    WITH norm3 AS (SELECT {_NORM} AS nt FROM documents),
    tok3 AS (SELECT unnest(string_split(nt, ' ')) AS token FROM norm3)
    SELECT token, CAST(count(*) AS BIGINT) AS n
    FROM tok3 WHERE token <> ''
    GROUP BY token ORDER BY n DESC, token ASC LIMIT 100
    """,
    doc="Corpus vocab top-100 by token frequency — the first pass of "
    "tokenizer/vocab training. Map-side combine collapses each "
    "partition to its distinct tokens before the exchange (hot tokens "
    "ARE the combined rows, so token skew never ships), and the global "
    "top-k plans as TakeOrderedAndProject per-partition heaps, never a "
    "full sort. Deterministic (count desc, token asc) tie-break.",
)
def text_vocab_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.text import vocab_topk

    docs = load_table(spark, sf_dir, "documents")
    return vocab_topk(docs, "text", top_n=100)


@register(
    "doc_chunk_overlap",
    f"""
    WITH normc AS (SELECT doc_id, {_NORM} AS nt FROM documents),
    tokc AS (SELECT doc_id, string_split(nt, ' ') AS tk FROM normc),
    cn AS (
      SELECT doc_id, tk,
             greatest(1, CAST(ceil((len(tk) - 8) / 56.0) AS BIGINT)) AS n_chunks
      FROM tokc
    ),
    ch AS (
      SELECT doc_id, i AS chunk_id, tk[i*56+1 : i*56+64] AS chunk_tk
      FROM cn, UNNEST(range(0, n_chunks)) AS u(i)
    )
    SELECT doc_id, chunk_id,
           CAST(len(chunk_tk) AS BIGINT) AS n_chunk_tokens,
           array_to_string(chunk_tk, ' ') AS chunk_text
    FROM ch
    """,
    doc="Context-window chunking with overlap (64-token chunks, 8-token "
    "overlap): per-doc chunk starts via sequence+explode, slice + "
    "array_join — zero shuffles, rides the scan. The per-document "
    "complement of doc_pack_sequences.",
)
def doc_chunk_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.text import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, "text", "doc_id", chunk_tokens=64, overlap=8)


def _rag_query_vector_sql(query: str = "vector stream join", dim: int = 64) -> str:
    """The oracle's query-vector literal, derived from the SAME md5
    bucket recipe as operators.text.token_bucket so the two sides
    cannot drift."""
    import hashlib

    qv = [0] * dim
    for t in query.split():
        qv[int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % dim] += 1
    return "[" + ", ".join(f"{w}.0" for w in qv) + "]"


@register(
    "rag_chunk_retrieve",
    f"""
    WITH normc AS (SELECT doc_id, {_NORM} AS nt FROM documents),
    tokc AS (SELECT doc_id, string_split(nt, ' ') AS tk FROM normc),
    cn AS (
      SELECT doc_id, tk,
             greatest(1, CAST(ceil((len(tk) - 8) / 56.0) AS BIGINT)) AS n_chunks
      FROM tokc
    ),
    ch AS (
      SELECT doc_id, i AS chunk_id, tk[i*56+1 : i*56+64] AS chunk_tk
      FROM cn, UNNEST(range(0, n_chunks)) AS u(i)
    ),
    b AS (
      SELECT doc_id, chunk_id, CAST(len(chunk_tk) AS BIGINT) AS n_chunk_tokens,
             list_transform(chunk_tk,
                            tk -> ('0x' || substr(md5(tk), 1, 15))::BIGINT % 64) AS bk
      FROM ch
    ),
    c AS (
      SELECT doc_id, chunk_id, n_chunk_tokens,
             list_transform(range(0, 64),
                            q -> CAST(len(list_filter(bk, x -> x = q)) AS DOUBLE)) AS cnt
      FROM b
    ),
    s AS (
      SELECT doc_id, chunk_id, n_chunk_tokens,
             list_dot_product(cnt, {_rag_query_vector_sql()}) AS dot,
             list_dot_product(cnt, cnt) AS sumsq
      FROM c
    )
    SELECT doc_id, chunk_id, n_chunk_tokens,
           CASE WHEN sumsq > 0
                THEN CAST(CAST(dot * dot * 1000000 AS HUGEINT)
                          // CAST(sumsq AS HUGEINT) AS BIGINT)
                ELSE 0 END AS score_x1e6
    FROM s
    ORDER BY score_x1e6 DESC, doc_id ASC, chunk_id ASC
    LIMIT 10
    """,
    doc="Index-free RAG retrieval end-to-end: 64-token chunking (8 "
    "overlap) -> hashed-BoW chunk vectors -> cosine-ranked top-10 "
    "chunks for the query 'vector stream join'. Ranking uses the "
    "exact-integer cos^2 statistic scale*dot^2 div |c|^2 (counts are "
    "integers, the query vector a constant, dot >= 0) — no sqrt, no "
    "float fold, bit-identical across engines; full (doc, chunk) "
    "tie-break. Chunking + embedding ride the scan; the only "
    "distributed op is TakeOrderedAndProject.",
)
def rag_chunk_retrieve_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.text import chunk_retrieve_topk

    docs = load_table(spark, sf_dir, "documents")
    return chunk_retrieve_topk(docs, "vector stream join", k=10)


@register(
    "rag_rrf_fuse",
    f"""
    WITH norm AS (SELECT doc_id, {_NORM} AS nt FROM documents),
    base AS (SELECT doc_id, string_split(nt, ' ') AS tk FROM norm),
    dls AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM base),
    totals AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(sum(dl) AS BIGINT) AS total_tok FROM dls),
    tf AS (
      SELECT b.doc_id, d.dl, t.term, CAST(count(*) AS BIGINT) AS tf
      FROM base b JOIN dls d USING (doc_id), UNNEST(b.tk) AS t(term)
      WHERE t.term IN ({_BM25_IN})
      GROUP BY b.doc_id, d.dl, t.term
    ),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
    bm AS (
      SELECT tf.doc_id,
             CAST((CAST(((2*n_docs - 2*df + 1) * 1000) // (2*df + 1)
                        AS HUGEINT)
                   * (tf * 11 * 4 * 1000))
                  // (5*4*1000*tf + 6*(4-3)*1000
                      + 6*3*((dl * 1000 * n_docs) // total_tok))
                  AS BIGINT) AS term_score
      FROM tf JOIN dfreq USING (term) CROSS JOIN totals
    ),
    lex AS (
      SELECT doc_id, CAST(sum(term_score) AS BIGINT) AS score
      FROM bm GROUP BY doc_id ORDER BY score DESC, doc_id ASC LIMIT 20
    ),
    lexr AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
      FROM lex
    ),
    cn AS (
      SELECT doc_id, tk,
             greatest(1, CAST(ceil((len(tk) - 8) / 56.0) AS BIGINT)) AS n_chunks
      FROM base
    ),
    ch AS (
      SELECT doc_id, i AS chunk_id, tk[i*56+1 : i*56+64] AS chunk_tk
      FROM cn, UNNEST(range(0, n_chunks)) AS u(i)
    ),
    bk2 AS (
      SELECT doc_id, chunk_id,
             list_transform(chunk_tk,
                            tk -> ('0x' || substr(md5(tk), 1, 15))::BIGINT % 64) AS bk
      FROM ch
    ),
    cnt2 AS (
      SELECT doc_id, chunk_id,
             list_transform(range(0, 64),
                            q -> CAST(len(list_filter(bk, x -> x = q)) AS DOUBLE)) AS cnt
      FROM bk2
    ),
    sc2 AS (
      SELECT doc_id, chunk_id,
             list_dot_product(cnt, {_rag_query_vector_sql()}) AS dot,
             list_dot_product(cnt, cnt) AS sumsq
      FROM cnt2
    ),
    sem20 AS (
      SELECT doc_id, chunk_id,
             CASE WHEN sumsq > 0
                  THEN CAST(CAST(dot * dot * 1000000 AS HUGEINT)
                            // CAST(sumsq AS HUGEINT) AS BIGINT)
                  ELSE 0 END AS score_x1e6
      FROM sc2
      ORDER BY score_x1e6 DESC, doc_id ASC, chunk_id ASC LIMIT 20
    ),
    semdoc AS (SELECT doc_id, max(score_x1e6) AS sc FROM sem20 GROUP BY doc_id),
    semr AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY sc DESC, doc_id ASC) AS rank
      FROM semdoc
    ),
    contrib AS (
      SELECT doc_id, 1000000000000 // (60 + rank) AS c FROM lexr
      UNION ALL
      SELECT doc_id, 1000000000000 // (60 + rank) AS c FROM semr
    ),
    fused AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS score_u,
             CAST(count(*) AS BIGINT) AS n_rankers
      FROM contrib GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY score_u DESC, doc_id ASC) AS INT)
             AS rank,
           n_rankers, score_u,
           score_u / 1000000000000.0 AS rrf_score
    FROM fused ORDER BY score_u DESC, doc_id ASC LIMIT 10
    """,
    doc="Reciprocal Rank Fusion (operators/similarity.py rrf_fuse; "
    "Cormack, Clarke & Büttcher SIGIR'09) over two INDEPENDENT "
    "retrievers the registry already checks — the lexical BM25 top-20 "
    "(text_bm25_topk's scorer) and the hashed-BoW semantic chunk "
    "retriever reduced to per-doc best (rag_chunk_retrieve's scorer) "
    "— the standard hybrid-RAG fusion: rank positions are comparable "
    "across retrievers where raw scores are not, and score_u = SUM of "
    "exact-integer 1e12 div (60 + rank) contributions, so the fused "
    "ordering is engine-exact (the scaled-integer idiom; the only "
    "float is one identical final division). Scale shape: both "
    "retrievers already reduced the corpus to bounded top-N frames, "
    "so the fusion is a union + tiny groupBy + bounded-window "
    "row_number — nothing corpus-sized moves.",
)
def rag_rrf_fuse_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel
    from pyspark.sql import Window as W

    from clickhouse_mysql_data_reader_spark.operators.similarity import rrf_fuse
    from clickhouse_mysql_data_reader_spark.operators.text import (
        bm25_stats,
        bm25_topk,
        chunk_retrieve_topk,
    )

    docs = load_table(spark, sf_dir, "documents")
    # persist the vocab-sized BM25 stats across bm25_topk's internal
    # consumers (frozen==derived equality is pinned by
    # test_text_gates.py, so this is a pure plan transform);
    # caller-owned, released by bench.py clearCache
    stats = bm25_stats(docs, "text", "doc_id").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    lex = bm25_topk(
        docs, "text", "doc_id", list(_BM25_TERMS), top_k=20, stats=stats
    )
    lexr = lex.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("score").desc(), F.col("doc_id").asc()))
        .alias("rank"),
    )
    sem = chunk_retrieve_topk(docs, "vector stream join", k=20)
    semdoc = sem.groupBy("doc_id").agg(F.max("score_x1e6").alias("_sc"))
    semr = semdoc.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("_sc").desc(), F.col("doc_id").asc()))
        .alias("rank"),
    )
    return rrf_fuse([lexr, semr], id_col="doc_id", k=60, top_k=10)


@register(
    "sample_weighted_topk",
    """
    WITH scored AS (
      SELECT doc_id, source, n_chars,
             ln( (('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                  + 1.0) / 4294967296.0 )
               / CAST(n_chars AS DOUBLE) AS _score
      FROM documents WHERE CAST(n_chars AS DOUBLE) > 0
    )
    SELECT doc_id, source, n_chars
    FROM scored ORDER BY _score DESC, CAST(doc_id AS VARCHAR) LIMIT 100
    """,
    doc="Efraimidis-Spirakis weighted sampling without replacement: "
    "rank by u^(1/w) via the monotone ln(u)/w, take top-100 by "
    "n_chars weight. The score is NOT emitted (libm ln differs by "
    "1 ulp across engines) — the driver hash-checks the SELECTED rows, "
    "whose inter-row score gaps dwarf ulp noise.",
)
def sample_weighted_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.sampling import (
        weighted_sample_topk,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return weighted_sample_topk(docs, "n_chars", "doc_id", k=100)


@register(
    "doc_corpus_stats",
    f"""
    WITH b AS (
      SELECT source,
             CAST(len(string_split({_NORM}, ' ')) AS BIGINT) AS nt,
             CAST(length(text) AS BIGINT) AS nc,
             CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END AS emp
      FROM documents
    ),
    pb AS (
      SELECT source, nt // 64 AS bucket,
             count(*) AS bn, CAST(sum(nt) AS BIGINT) AS bt,
             CAST(sum(nc) AS BIGINT) AS bc, CAST(sum(emp) AS BIGINT) AS be,
             min(nt) AS bmin, max(nt) AS bmax
      FROM b GROUP BY 1, 2
    )
    SELECT source,
           CAST(sum(bn) AS BIGINT) AS n_docs,
           CAST(sum(bt) AS BIGINT) AS n_tokens,
           CAST(sum(bc) AS BIGINT) AS n_chars,
           CAST(sum(be) AS BIGINT) AS n_empty,
           min(bmin) AS min_tokens,
           max(bmax) AS max_tokens,
           CAST(sum(bt) AS DOUBLE) / sum(bn) AS avg_tokens,
           CAST(sum(bc) AS DOUBLE) / sum(bn) AS avg_chars,
           string_agg(lpad(CAST(bucket AS VARCHAR), 9, '0') || ':' || CAST(bn AS VARCHAR),
                      ',' ORDER BY lpad(CAST(bucket AS VARCHAR), 9, '0')) AS token_hist
    FROM pb GROUP BY source
    """,
    doc="One-pass per-source corpus report (the before/after-curation "
    "monitoring aggregate): doc/token/char totals, empties, length "
    "extremes/averages, and a 64-token-wide length histogram emitted "
    "as a sorted 'bucket:count' string (two-level pre-aggregate — the "
    "collected list is bucket-sized, never doc-sized). Exact integer "
    "sums; two terminal double averages.",
)
def doc_corpus_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.text import corpus_stats

    docs = load_table(spark, sf_dir, "documents")
    return corpus_stats(docs, hist_bucket_tokens=64)


@register(
    "monitor_dup_rate_by_source",
    f"""
    WITH f AS (SELECT source, md5({_NORM}) AS fp FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct,
           CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_dup_docs,
           round(1.0 - count(DISTINCT fp) / count(*), 6) AS dup_rate
    FROM f GROUP BY source
    """,
    doc="Per-source exact-duplication rate — the pre-dedup corpus-"
    "health monitor a scraping pipeline reads BEFORE paying for a "
    "dedup pass (a source whose dup_rate jumps is re-crawling itself "
    "or mirroring another feed): per source, docs, distinct content "
    "fingerprints (the md5-of-normalized-text the exact-dedup stage "
    "keys on — operators/dedup.py content_fingerprint, so this report "
    "predicts exactly what that stage would remove), duplicated-doc "
    "count and rate. Scale shape: one map-side-combinable count-"
    "distinct per source (two-phase partial aggregation on the "
    "(source, fp) key — no window, no join); the text is hashed in "
    "the scan stage and only 16-byte fingerprints shuffle.",
)
def monitor_dup_rate_by_source_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.dedup import (
        content_fingerprint,
    )

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct(content_fingerprint(F.col("text")))
            .cast("long")
            .alias("n_distinct"),
        )
        .select(
            "source",
            "n_docs",
            "n_distinct",
            (F.col("n_docs") - F.col("n_distinct")).alias("n_dup_docs"),
            F.round(1.0 - F.col("n_distinct") / F.col("n_docs"), 6).alias(
                "dup_rate"
            ),
        )
    )


@register(
    "sample_shuffle_order",
    """
    SELECT doc_id, source, shard, CAST(pos AS BIGINT) AS pos FROM (
      SELECT doc_id, source,
             CAST(('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 64 AS shard,
             row_number() OVER (
               PARTITION BY CAST(('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 8))
                                 AS BIGINT) % 64
               ORDER BY substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 8), doc_id
             ) AS pos
      FROM documents
    )
    """,
    doc="Deterministic training-order shuffle: md5-draw shard + "
    "within-shard rank — the SGD decorrelation step between curation "
    "and packing. Pure function of (salt, id): reproducible across "
    "runs/retries, per-epoch reshuffle = new salt. No global sort — "
    "n_shards independent window tasks.",
)
def sample_shuffle_order_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.sampling import (
        training_shuffle,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return training_shuffle(docs, n_shards=64, salt="shuf")


@register(
    "text_lm_surprisal",
    f"""
    WITH norml AS (SELECT doc_id, {_NORM} AS nt FROM documents),
    tokl AS (
      SELECT doc_id, tok AS token
      FROM (SELECT doc_id, unnest(string_split(nt, ' ')) AS tok FROM norml)
      WHERE tok <> ''
    ),
    rc AS (SELECT token, count(*) AS n FROM tokl GROUP BY token),
    tot AS (SELECT CAST(sum(n) AS BIGINT) + count(*) AS db FROM rc),
    sc AS (
      SELECT t.doc_id, coalesce(rc.n, 0) AS cnt
      FROM tokl t LEFT JOIN rc USING (token)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN cnt = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           sum(CAST(1000000 AS BIGINT) * (SELECT db FROM tot) // (cnt + 1))
             / (count(*) * 1000000.0) AS surprisal
    FROM sc GROUP BY doc_id
    """,
    doc="Unigram LM quality scoring (CCNet/KenLM filter shape): mean "
    "add-one-smoothed inverse token probability under the corpus's own "
    "unigram distribution — scaled-INTEGER per-token statistic (bigint "
    "div), so sums are exact and order-independent where log-space "
    "perplexity would inherit libm 1-ulp drift; one terminal double "
    "division. Same determinism move as tfidf's scaled idf.",
)
def text_lm_surprisal_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.text import lm_surprisal

    docs = load_table(spark, sf_dir, "documents")
    return lm_surprisal(docs, docs, text_col="text", id_col="doc_id")


@register(
    "doc_span_decontaminate",
    f"""
    WITH t AS (
      SELECT doc_id, list_filter(string_split({_NORM}, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    bt AS (SELECT tk FROM t WHERE doc_id % 97 = 0),
    bw AS (
      SELECT unnest(range(0, len(tk) - 13 + 1)) AS s, tk
      FROM bt WHERE len(tk) >= 13
    ),
    bfp AS (
      SELECT DISTINCT
             CAST(('0x' || substr(md5(array_to_string(tk[s + 1 : s + 13], ' ')), 1, 15))
                  AS BIGINT) AS fp
      FROM bw
    ),
    w AS (
      SELECT doc_id, unnest(range(0, len(tk) - 13 + 1)) AS s, tk
      FROM t WHERE len(tk) >= 13
    ),
    wf AS (
      SELECT doc_id, s,
             CAST(('0x' || substr(md5(array_to_string(tk[s + 1 : s + 13], ' ')), 1, 15))
                  AS BIGINT) AS fp
      FROM w
    ),
    marks AS (SELECT wf.doc_id, wf.s FROM wf SEMI JOIN bfp USING (fp)),
    di AS (
      SELECT DISTINCT m.doc_id, m.s + k.k AS idx
      FROM marks m, range(0, 13) k(k)
    ),
    tokpos AS (
      SELECT doc_id, unnest(range(0, len(tk))) AS pos, unnest(tk) AS tok FROM t
    ),
    keptagg AS (
      SELECT tp.doc_id, string_agg(tp.tok, ' ' ORDER BY tp.pos) AS text
      FROM tokpos tp
      ANTI JOIN di ON di.doc_id = tp.doc_id AND di.idx = tp.pos
      GROUP BY tp.doc_id
    ),
    dcount AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dropped FROM di GROUP BY 1)
    SELECT t.doc_id,
           CAST(len(t.tk) AS BIGINT) AS n_tokens,
           coalesce(d.n_dropped, 0) AS n_dropped,
           coalesce(k.text, '') AS text
    FROM t LEFT JOIN keptagg k USING (doc_id) LEFT JOIN dcount d USING (doc_id)
    """,
    doc="SPAN-level benchmark decontamination (GPT-3 App. C, Brown et "
    "al. 2020): every 13-gram of a corpus doc colliding with the "
    "benchmark slice (doc_id % 97 = 0, in-query) is excised from ALL "
    "occurrences — the surgical alternative to whole-doc dropping when "
    "eval items are quoted inside otherwise-good documents. Benchmark "
    "window fingerprints are a broadcast semi-join against the corpus "
    "windows (the corpus_contamination direction); excision reuses the "
    "checked dedup_exact_substring machinery via shared helpers.",
)
def doc_span_decontaminate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.text import span_decontaminate

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return span_decontaminate(docs, bench, window=13)


@register(
    "text_lm_bigram",
    f"""
    WITH t AS (
      SELECT doc_id, list_filter(string_split({_NORM}, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    p AS (
      SELECT doc_id,
             unnest(list_concat([''], tk[1:len(tk)-1])) AS prev,
             unnest(tk) AS cur
      FROM t WHERE len(tk) > 0
    ),
    uni AS (SELECT cur AS token, count(*) AS n FROM p GROUP BY 1),
    big AS (SELECT prev, cur, count(*) AS nb FROM p WHERE prev <> '' GROUP BY 1, 2),
    tot AS (SELECT CAST(sum(n) AS BIGINT) + count(*) AS db FROM uni),
    sc AS (
      SELECT p.doc_id, p.prev, b.nb, up.n AS nprev, coalesce(uc.n, 0) AS nc
      FROM p
      LEFT JOIN big b ON b.prev = p.prev AND b.cur = p.cur
      LEFT JOIN uni uc ON uc.token = p.cur
      LEFT JOIN uni up ON up.token = p.prev
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN nc = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(sum(CASE WHEN nb IS NULL AND prev <> '' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_backoff,
           sum(CASE WHEN nb IS NOT NULL THEN CAST(1000000 AS BIGINT) * nprev // nb
                    WHEN prev = '' THEN CAST(1000000 AS BIGINT) * (SELECT db FROM tot) // (nc + 1)
                    ELSE (CAST(1000000 AS BIGINT) * (SELECT db FROM tot) // (nc + 1)) * 5 // 2
               END)
             / (count(*) * 1000000.0) AS surprisal
    FROM sc GROUP BY doc_id
    """,
    doc="Bigram LM quality scoring with stupid backoff (Brants et al. "
    "2007): per-token scaled-integer inverse probability — bigram path "
    "scale*cnt(w1) div cnt(w1,w2), backoff path = unigram inverse *5 "
    "div 2 (alpha=0.4 exact in integers), doc-start tokens plain "
    "unigram. Punishes scrambled word order where text_lm_surprisal "
    "cannot; sums are exact DECIMAL(38,0), one terminal double division.",
)
def text_lm_bigram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.text import lm_surprisal_bigram

    docs = load_table(spark, sf_dir, "documents")
    return lm_surprisal_bigram(docs, docs, text_col="text", id_col="doc_id")


@register(
    "dedup_exact_substring",
    f"""
    WITH t AS (
      SELECT doc_id, list_filter(string_split({_NORM}, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    w AS (
      SELECT doc_id, unnest(range(0, len(tk) - 8 + 1)) AS s, tk
      FROM t WHERE len(tk) >= 8
    ),
    wf AS (
      SELECT doc_id, s,
             CAST(('0x' || substr(md5(array_to_string(tk[s + 1 : s + 8], ' ')), 1, 15))
                  AS BIGINT) AS fp
      FROM w
    ),
    r AS (
      SELECT doc_id, s,
             row_number() OVER (PARTITION BY fp ORDER BY doc_id, s) AS rn,
             count(*) OVER (PARTITION BY fp) AS c
      FROM wf
    ),
    marks AS (SELECT doc_id, s FROM r WHERE c >= 2 AND rn > 1),
    di AS (
      SELECT DISTINCT m.doc_id, m.s + k.k AS idx
      FROM marks m, range(0, 8) k(k)
    ),
    tokpos AS (
      SELECT doc_id, unnest(range(0, len(tk))) AS pos, unnest(tk) AS tok FROM t
    ),
    keptagg AS (
      SELECT tp.doc_id, string_agg(tp.tok, ' ' ORDER BY tp.pos) AS text
      FROM tokpos tp
      ANTI JOIN di ON di.doc_id = tp.doc_id AND di.idx = tp.pos
      GROUP BY tp.doc_id
    ),
    dcount AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dropped FROM di GROUP BY 1)
    SELECT t.doc_id,
           CAST(len(t.tk) AS BIGINT) AS n_tokens,
           coalesce(d.n_dropped, 0) AS n_dropped,
           coalesce(k.text, '') AS text
    FROM t LEFT JOIN keptagg k USING (doc_id) LEFT JOIN dcount d USING (doc_id)
    """,
    doc="ExactSubstr dedup (Lee et al. 2021): every 8-token span "
    "occurring 2+ times in the corpus is excised from all but its "
    "globally-first occurrence (keeper = min (doc, start); overlapping "
    "windows merge via the per-doc index union). The distributed "
    "re-expression of the paper's suffix array: window fingerprints + "
    "map-side-combined keeper election + AQE-splittable fp join — at "
    "sf0.01 this finds the near-dup docs' shared spans (24 docs, 1254 "
    "tokens).",
)
def dedup_exact_substring_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.text import (
        exact_substring_dedup,
    )

    docs = load_table(spark, sf_dir, "documents")
    return exact_substring_dedup(docs, window=8, min_count=2)


@register(
    "text_ccnet_buckets",
    f"""
    WITH norml AS (SELECT doc_id, {_NORM} AS nt FROM documents),
    tokl AS (
      SELECT doc_id, tok AS token
      FROM (SELECT doc_id, unnest(string_split(nt, ' ')) AS tok FROM norml)
      WHERE tok <> ''
    ),
    rc AS (SELECT token, count(*) AS n FROM tokl GROUP BY token),
    tot AS (SELECT CAST(sum(n) AS BIGINT) + count(*) AS db FROM rc),
    sc AS (
      SELECT t.doc_id, coalesce(rc.n, 0) AS cnt
      FROM tokl t LEFT JOIN rc USING (token)
    ),
    s AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             sum(CAST(1000000 AS BIGINT) * (SELECT db FROM tot) // (cnt + 1))
               / (count(*) * 1000000.0) AS surprisal
      FROM sc GROUP BY doc_id
    ),
    th AS (
      SELECT quantile_cont(surprisal, 0.3333333333333333) AS p_lo,
             quantile_cont(surprisal, 0.6666666666666666) AS p_hi
      FROM s
    )
    SELECT doc_id, n_tokens, surprisal,
           CASE WHEN surprisal <= (SELECT p_lo FROM th) THEN 'head'
                WHEN surprisal <= (SELECT p_hi FROM th) THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM s
    """,
    doc="CCNet perplexity bucketing (Wenzek et al. 2020): lm_surprisal "
    "per doc, head/middle/tail by the corpus's own exact surprisal "
    "terciles — thresholds stay in-plan as a broadcast 1-row exact-"
    "percentile aggregate (Spark percentile == DuckDB quantile_cont, "
    "the pair agg_approx_percentile's exact anchors already "
    "hash-verify). The standard keep-head/sample-middle/drop-tail "
    "LM-data selection.",
)
def text_ccnet_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from clickhouse_mysql_data_reader_spark.operators.text import ccnet_buckets

    docs = load_table(spark, sf_dir, "documents")
    # caller-owned persist of the scored frame (two consumers:
    # threshold aggregate + output projection — the operator docstring's
    # prescription); released by bench.py clearCache
    return ccnet_buckets(
        docs, text_col="text", id_col="doc_id",
        storage=StorageLevel.MEMORY_AND_DISK,
    )


@register(
    "text_line_dedup",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id,
             text || chr(10) || 'unique tail ' || CAST(doc_id AS VARCHAR) AS text
      FROM documents WHERE doc_id % 5 = 0
    ),
    t AS (SELECT doc_id, string_split(text, chr(10)) AS tk FROM corpus),
    l AS (
      SELECT doc_id,
             unnest(range(0, len(tk))) AS line_no,
             unnest(tk) AS line
      FROM t
    ),
    r AS (
      SELECT doc_id, line_no, line,
             row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
      FROM l
    ),
    kept AS (SELECT * FROM r WHERE length(trim(line)) < 1 OR rn = 1),
    tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines FROM l GROUP BY 1),
    ka AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             string_agg(line, chr(10) ORDER BY line_no) AS text
      FROM kept GROUP BY 1
    )
    SELECT tot.doc_id, tot.n_lines,
           coalesce(ka.n_kept, 0) AS n_kept,
           coalesce(ka.text, '') AS text
    FROM tot LEFT JOIN ka USING (doc_id)
    """,
    doc="C4/RefinedWeb-style corpus-level line deduplication: every "
    "verbatim-duplicated line keeps only its globally first occurrence "
    "(min (doc_id, line_no)); docs are reassembled in original line "
    "order. The duplicate structure is constructed in-query (synthetic "
    "twins sharing a line), identically on both engines. Spark plan is "
    "skew-proof by construction: keeper election is a map-side-combined "
    "min(struct) aggregate (never a window over partitionBy(line) — a "
    "popular boilerplate line would be an unsplittable hot window "
    "partition) and the keep test joins on the unique (line, doc, pos) "
    "triple.",
)
def text_line_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.text import line_dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    twins = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit("\nunique tail "), F.col("doc_id").cast("string")
        ).alias("text"),
    )
    return line_dedup(docs.unionByName(twins), min_line_chars=1)


@register(
    "text_paragraph_dedup",
    """
    WITH corpus AS (
      SELECT doc_id,
             text || chr(10) || chr(10) ||
             'this shared footer paragraph appears in many documents' ||
             chr(10) || chr(10) || 'closing paragraph ' ||
             CAST(doc_id AS VARCHAR) AS text
      FROM documents WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
    ),
    t AS (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS tk FROM corpus),
    l AS (
      SELECT doc_id,
             unnest(range(0, len(tk))) AS line_no,
             unnest(tk) AS line
      FROM t
    ),
    r AS (
      SELECT doc_id, line_no, line,
             row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
      FROM l
    ),
    kept AS (SELECT * FROM r WHERE length(trim(line)) < 1 OR rn = 1),
    tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras FROM l GROUP BY 1),
    ka AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             string_agg(line, chr(10) || chr(10) ORDER BY line_no) AS text
      FROM kept GROUP BY 1
    )
    SELECT tot.doc_id, tot.n_paras,
           coalesce(ka.n_kept, 0) AS n_kept,
           coalesce(ka.text, '') AS text
    FROM tot LEFT JOIN ka USING (doc_id)
    """,
    doc="RefinedWeb-style corpus-level PARAGRAPH deduplication: the "
    "dedup unit is a blank-line-separated paragraph, so templated "
    "multi-line blocks (licence paragraphs, author bios) keep only "
    "their globally-first occurrence. The paragraph structure is "
    "constructed in-query (a footer paragraph shared by every third "
    "doc plus a unique closing paragraph), identically on both "
    "engines. Same skew-proof machinery as the checked text_line_dedup "
    "at sep='\\n\\n' granularity (operators/text.py paragraph_dedup).",
)
def text_paragraph_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.text import paragraph_dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    footered = docs.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(
                "\n\nthis shared footer paragraph appears in many documents"
                "\n\nclosing paragraph "
            ),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    corpus = footered.unionByName(docs.filter(F.col("doc_id") % 3 != 0))
    out = paragraph_dedup(corpus)
    return out.select(
        "doc_id", F.col("n_lines").alias("n_paras"), "n_kept", "text"
    )


_GOPHER_SW = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)

@register(
    "text_gopher_rules",
    f"""
    WITH t AS (SELECT doc_id, text, {_NORM} AS nt FROM documents),
    s AS (
      SELECT doc_id,
        (length(text) - length(replace(text, '#', '')))
          + (length(text) - length(replace(text, '...', ''))) / 3
          + (length(text) - length(replace(text, '…', ''))) AS n_sym,
        string_split(text, chr(10)) AS ln,
        string_split(nt, ' ') AS tk,
        length(nt) AS nt_len
      FROM t
    ),
    f AS (
      SELECT doc_id, n_sym, nt_len,
        len(ln) AS n_ln,
        len(tk) AS n_words,
        len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
        len(list_distinct(list_filter(tk, x -> x IN ({_GOPHER_SW}))))
          AS n_stop_types,
        len(list_filter(ln, x -> regexp_matches(trim(x), '^[-*•]')))
          AS n_bullet,
        len(list_filter(ln, x -> regexp_matches(rtrim(x), '(\\.\\.\\.|…)$')))
          AS n_ellipsis
      FROM s
    )
    SELECT doc_id, n_words,
      (nt_len - (n_words - 1)) / n_words AS mean_word_len,
      n_sym / n_words AS symbol_ratio,
      n_bullet / n_ln AS bullet_frac,
      n_ellipsis / n_ln AS ellipsis_frac,
      n_alpha / n_words AS alpha_frac,
      n_stop_types,
      (n_words BETWEEN 40 AND 100000)
        AND ((nt_len - (n_words - 1)) / n_words BETWEEN 3.0 AND 10.0)
        AND (n_sym / n_words <= 0.1)
        AND (n_bullet / n_ln <= 0.9)
        AND (n_ellipsis / n_ln <= 0.3)
        AND (n_alpha / n_words >= 0.8)
        AND (n_stop_types >= 1) AS pass_gopher
    FROM f
    """,
    doc="Gopher rule filter (Rae et al. 2021 App. A): word-count and "
    "mean-word-length bounds, symbol-to-word ratio, bullet/ellipsis "
    "line fractions, alphabetic-word fraction, distinct-stopword floor "
    "— all scan-stage expressions, zero shuffles. min_words/stopword "
    "thresholds tuned to the synthetic word-soup corpus so the flag "
    "varies; the operator defaults are the paper's.",
)
def text_gopher_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return gopher_rules(
        docs, "text", "doc_id", min_words=40, min_stop_types=1
    )


@register(
    "text_token_budget",
    f"""
    WITH t AS (SELECT doc_id, {_NORM} AS nt FROM documents)
    SELECT doc_id,
           CAST(len(string_split(nt, ' ')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(nt,
               '''[a-z]+|[a-z]+|[0-9]|[^a-z0-9\\s]+')) AS BIGINT)
             AS n_bpe_pretokens,
           CAST(ceil(length(nt) / 4.0) AS BIGINT) AS est_chars_div4
    FROM t
    """,
    doc="Token budgeting three ways: whitespace tokens, GPT-2-style "
    "regex pre-tokenizer pieces (the RE2-compatible core — "
    "contractions, letter runs, single digits, punctuation runs; the "
    "piece count upper-bounds the true BPE token count since merges "
    "only shrink it), and the chars/4 rule of thumb. All scan-stage "
    "expressions, zero shuffles — the budget gate that decides packing "
    "and mixture token accounting upstream of any real tokenizer.",
)
def text_token_budget_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.text import (
        bpe_pretoken_count,
        bpe_token_estimate,
        token_count,
    )

    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        token_count(t).cast("long").alias("n_ws_tokens"),
        bpe_pretoken_count(t).cast("long").alias("n_bpe_pretokens"),
        bpe_token_estimate(t).alias("est_chars_div4"),
    )


@register(
    "text_blocklist_gate",
    f"""
    WITH t AS (SELECT doc_id, string_split({_NORM}, ' ') AS tk FROM documents),
    f AS (
      SELECT doc_id, tk,
             list_filter(tk, x -> x IN ('slow', 'stream', 'vector')) AS hits
      FROM t
    )
    SELECT doc_id,
           len(tk) AS n_tokens,
           len(hits) AS block_hits,
           len(hits) / len(tk) AS block_ratio,
           (len(hits) = 0) AS passed,
           coalesce(array_to_string(list_sort(list_distinct(hits)), ','), '')
             AS hit_terms
    FROM f
    """,
    doc="C4-style blocklist gate (Raffel et al. 2020 §2.2): drop any "
    "page containing a blocklist token. Token-boundary matching, one "
    "scan, zero shuffles — the cheapest/highest-drop-rate gate, so it "
    "belongs first in the curation chain at 100 TB. Blocklist drawn "
    "from the synthetic corpus vocabulary so the flag varies; the "
    "operator default is a real spam/adult list.",
)
def text_blocklist_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.text import blocklist_gate

    docs = load_table(spark, sf_dir, "documents")
    return blocklist_gate(docs, "text", "doc_id", blocklist=("slow", "stream", "vector"))


@register(
    "text_boilerplate_ngrams",
    f"""
    WITH {_SHINGLE_CTE},
    freq AS (SELECT sh_h, count(*) AS n_docs FROM sh GROUP BY sh_h),
    boiler AS (SELECT sh_h FROM freq WHERE n_docs >= 3)
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(b.sh_h) AS BIGINT) AS boiler_hits,
           count(b.sh_h) / count(*) AS boiler_frac
    FROM sh s LEFT JOIN boiler b USING (sh_h)
    GROUP BY s.doc_id
    """,
    doc="Corpus-internal boilerplate coverage: fraction of each doc's "
    "3-gram shingles appearing in >= 3 distinct documents (CCNet/"
    "RefinedWeb repeated-fragment removal at n-gram granularity). One "
    "shingle explode shared by the frequency count and the join back; "
    "text crosses the wire only as 60-bit hashes.",
)
def text_boilerplate_ngrams_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    # caller-owned persist (two consumers: freq + join back); released
    # by unpersist/clearCache after the action, same as dedup_ngram_jaccard
    sh = shingle_table(docs, "text", "doc_id", k=3, partition_by_id=True).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    return ngram_boilerplate(docs, "text", "doc_id", min_docs=3, shingles=sh)


@register(
    "text_hashed_embed",
    f"""
    WITH norm AS (SELECT doc_id, {_NORM} AS nt FROM documents),
    t AS (
      SELECT doc_id,
             list_transform(string_split(nt, ' '),
                            tk -> ('0x' || substr(md5(tk), 1, 15))::BIGINT % 64)
               AS bk
      FROM norm
    ),
    c AS (
      SELECT doc_id,
             list_transform(range(0, 64),
                            b -> CAST(len(list_filter(bk, x -> x = b)) AS DOUBLE))
               AS cnt
      FROM t
    )
    SELECT doc_id,
           len(list_filter(cnt, c -> c > 0)) AS nnz,
           sqrt(list_aggregate(list_transform(cnt, c -> c * c), 'sum')) AS l2_norm,
           CAST(list_aggregate(list_transform(range(0, 64), b -> b * cnt[b + 1]),
                               'sum') AS BIGINT) AS checksum,
           list_position(cnt, list_max(cnt)) - 1 AS top_bucket
    FROM c
    """,
    doc="Hashed bag-of-words embedding (feature hashing): md5-bucket "
    "count vector per doc, entirely in-row (zero shuffles). The arrays "
    "themselves can't hash-compare across engines (numpy vs list), so "
    "the checked projection is exact scalar invariants of the vector: "
    "nonzero count, L2 norm (exact-rounded sqrt over integer counts), "
    "a position-weighted checksum, and the argmax bucket (min-index "
    "ties via first-match position).",
)
def text_hashed_embed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.text import hashed_bow_embed

    docs = load_table(spark, sf_dir, "documents")
    emb = hashed_bow_embed(docs, "text", "doc_id", dim=64, normalize=False)
    cnt = F.col("embedding")
    seq = F.sequence(F.lit(0), F.lit(63))
    return emb.select(
        "doc_id",
        F.size(F.filter(cnt, lambda c: c > 0)).alias("nnz"),
        F.col("l2_norm"),
        F.aggregate(
            F.zip_with(seq, cnt, lambda b, c: b * c), F.lit(0.0), lambda a, x: a + x
        )
        .cast("bigint")
        .alias("checksum"),
        (F.array_position(cnt, F.array_max(cnt)) - 1).alias("top_bucket"),
    )


# --- round-11 additions: in-plan temperature + UniMax mixtures, SemDeDup ---

_TEMPER_BUDGET = 12_000


@register(
    "sample_temperature",
    f"""
    WITH d AS (
      SELECT doc_id, source,
             CAST(len(string_split({_NORM}, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    t AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
          FROM d GROUP BY source),
    w AS (SELECT source, src_tokens,
                 CAST(floor(sqrt(src_tokens)) AS BIGINT) AS w
          FROM t),
    z AS (SELECT CAST(sum(w) AS BIGINT) AS z FROM w),
    r AS (SELECT source, w,
                 least(1.0, ({float(_TEMPER_BUDGET)} * w) / (z.z * src_tokens))
                   AS rate
          FROM w CROSS JOIN z),
    k AS (
      SELECT d.source, d.n_tokens, r.w, r.rate,
             (r.rate >= 1.0 OR
              {_sql_hash('temper', 'doc_id')} <
              lower(lpad(to_hex(CAST(floor(r.rate * 4294967296.0) AS BIGINT)), 8, '0')))
               AS keep
      FROM d JOIN r USING (source)
    )
    SELECT source,
           CAST(max(w) AS BIGINT) AS w,
           max(rate) AS rate,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
           CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT)
             AS n_tokens_kept
    FROM k GROUP BY source
    """,
    doc="Temperature mixture (alpha = 0.5, the XLM-R/mT5 flattening "
    "family) with weights derived IN-PLAN in exact integer arithmetic: "
    "w_i = isqrt(source tokens) realizes the 0.5 exponent with no libm "
    "pow and no driver collect — one lazy DAG end-to-end (totals agg, "
    "1-row normalizer crossJoin, broadcast rate table, md5 keep). The "
    "scale shape of temperature_weights/temperature_mixture, whose "
    "float-pow weights are driver-side Python.",
)
def sample_temperature_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.sampling import (
        sqrt_temperature_mixture,
    )
    from clickhouse_mysql_data_reader_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    return sqrt_temperature_mixture(
        docs, token_count(F.col("text")), "doc_id", "source", _TEMPER_BUDGET
    )


_UNIMAX_BUDGET = 25_000


@register(
    "sample_unimax",
    f"""
    WITH RECURSIVE d AS (
      SELECT doc_id, source,
             CAST(len(string_split({_NORM}, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    t AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
          FROM d GROUP BY source),
    o AS (SELECT source, CAST(src_tokens AS DOUBLE) AS sz,
                 CAST(row_number() OVER (ORDER BY src_tokens, source) AS BIGINT)
                   AS rn,
                 CAST(count(*) OVER () AS BIGINT) AS n
          FROM t),
    wf(rn, remaining, alloc, source) AS (
      SELECT CAST(0 AS BIGINT), CAST({_UNIMAX_BUDGET} AS DOUBLE),
             CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR)
      UNION ALL
      SELECT o.rn,
             wf.remaining - least(o.sz * 1.0, wf.remaining / (o.n - o.rn + 1)),
             least(o.sz * 1.0, wf.remaining / (o.n - o.rn + 1)),
             o.source
      FROM wf JOIN o ON o.rn = wf.rn + 1
    ),
    r AS (
      SELECT w.source,
             least(1.0, ({_UNIMAX_BUDGET} * (w.alloc / {_UNIMAX_BUDGET}))
                          / t.src_tokens) AS rate
      FROM wf w JOIN t ON t.source = w.source
    ),
    k AS (
      SELECT d.source, d.n_tokens, r.rate,
             (r.rate >= 1.0 OR
              {_sql_hash('unimax', 'doc_id')} <
              lower(lpad(to_hex(CAST(floor(r.rate * 4294967296.0) AS BIGINT)), 8, '0')))
               AS keep
      FROM d JOIN r USING (source)
    )
    SELECT source,
           max(rate) AS rate,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
           CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT)
             AS n_tokens_kept
    FROM k GROUP BY source
    """,
    doc="UniMax mixture (Chung et al. 2022): spread the token budget "
    "uniformly across sources with an epoch cap — greedy waterfilling "
    "over sources sorted by size (one bounded driver aggregate + a "
    "python loop), then the standard md5 mixture draw. The oracle "
    "replays the waterfill as a recursive CTE in the identical sorted "
    "order, so every IEEE step (fair share, cap, remaining) matches "
    "bit-for-bit. Sources below the fair share are kept whole (their "
    "rate hits the >= 1.0 short-circuit); larger sources are "
    "downsampled toward the uniform target.",
)
def sample_unimax_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.sampling import (
        mixture_sample,
        unimax_weights,
    )
    from clickhouse_mysql_data_reader_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    w = unimax_weights(
        docs, token_count(F.col("text")), "source", token_budget=_UNIMAX_BUDGET
    )
    return mixture_sample(
        docs,
        token_count(F.col("text")),
        "doc_id",
        "source",
        w,
        _UNIMAX_BUDGET,
        salt="unimax",
    )


_SEMDEDUP_TAU = 0.35


@register(
    "dedup_semdedup",
    f"""
    WITH RECURSIVE e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ),
    dims AS (
      SELECT label, i, avg(v[i]) AS m
      FROM e, UNNEST(range(1, len(v) + 1)) AS t(i)
      GROUP BY label, i
    ),
    cent AS (SELECT label AS cell, list(m ORDER BY i) AS c FROM dims GROUP BY label),
    scored AS (
      SELECT e.vec_id, e.v, cent.cell, cent.c, list_distance(e.v, cent.c) AS dist
      FROM e CROSS JOIN cent
    ),
    assigned AS (
      SELECT vec_id, v, cell, c
      FROM (SELECT vec_id, v, cell, c,
                   row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
            FROM scored)
      WHERE rn = 1
    ),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM assigned a JOIN assigned b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {_SEMDEDUP_TAU}
    ),
    edges AS (SELECT vec_a AS u, vec_b AS w FROM pairs
              UNION ALL SELECT vec_b, vec_a FROM pairs),
    reach(u, lbl) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges) s
      UNION
      SELECT e2.u, r.lbl FROM edges e2 JOIN reach r ON r.u = e2.w
    ),
    comp AS (SELECT u AS vec_id, min(lbl) AS component FROM reach GROUP BY u),
    cs AS (
      SELECT a.vec_id, round(list_cosine_similarity(a.v, a.c), 6) AS cent_sim
      FROM assigned a
    )
    SELECT comp.vec_id, comp.component, cs.cent_sim,
           (row_number() OVER (PARTITION BY comp.component
                               ORDER BY cs.cent_sim, comp.vec_id) = 1) AS keep
    FROM comp JOIN cs USING (vec_id)
    """,
    doc="SemDeDup (Abbas et al. 2023, arXiv:2303.09540) as one verified "
    "operator: coarse-quantizer cells -> within-cell cosine pairs -> "
    "connected components -> keep exactly the LEAST-typical member of "
    "each group (lowest cosine to its cluster centroid, the paper's "
    "diversity-preserving keeper; min-id ties). Cells here are the "
    "per-label mean centroids (the embed_cell_assign one-step "
    "quantizer) so the oracle can replay the assignment; production "
    "passes kmeans_iterate centroids through the same `centroids=` "
    "seam. Candidates are cell-blocked (sum(|cell|^2), never "
    "|corpus|^2), components are diameter-bounded label propagation, "
    "the keeper window is bounded by cluster size.",
)
def dedup_semdedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from clickhouse_mysql_data_reader_spark.operators.similarity import (
        centroids_by_cell,
        semantic_dedup_decisions,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = centroids_by_cell(emb)
    # caller-owned persist of the (id, vector, cell) frame (released by
    # bench.py clearCache) — four consumers, see the operator docstring
    return semantic_dedup_decisions(
        emb, _SEMDEDUP_TAU, centroids=cents,
        storage=StorageLevel.MEMORY_AND_DISK,
    )


_HTML_PRE = (
    '<html><head><title>t</title>'
    '<script type="text/javascript">var x = 1 < 2 && y > 0;</script>'
    '<style>p { color: red; }</style></head><body><!-- boilerplate'
    ' nav --><p>'
)
_HTML_POST = (
    '</p><div class="foot">&amp; &lt;em&gt; &quot;q&quot;'
    ' &#39;s&#39;&nbsp;end</div></body></html>'
)


@register(
    "text_html_strip",
    f"""
    WITH h AS (
      SELECT doc_id, '{_HTML_PRE}' || text || '{_HTML_POST}' AS html
      FROM documents
    ),
    s1 AS (SELECT doc_id,
                  regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS c
           FROM h),
    s2 AS (SELECT doc_id,
                  regexp_replace(c, '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS c
           FROM s1),
    s3 AS (SELECT doc_id, regexp_replace(c, '(?s)<!--.*?-->', ' ', 'g') AS c FROM s2),
    s4 AS (SELECT doc_id, regexp_replace(c, '(?s)<[^>]+>', ' ', 'g') AS c FROM s3),
    e AS (SELECT doc_id,
                 replace(replace(replace(replace(replace(replace(c,
                   '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                   '&quot;', '"'), '&#39;', ''''), '&amp;', '&') AS c
          FROM s4)
    SELECT doc_id,
           trim(regexp_replace(c, '\\s+', ' ', 'g')) AS clean_text,
           CAST(length(trim(regexp_replace(c, '\\s+', ' ', 'g'))) AS BIGINT)
             AS n_clean_chars
    FROM e
    """,
    doc="HTML -> text extraction (operators/text.py html_to_text), the "
    "web-pipeline step in front of every text gate: script/style "
    "bodies, comments and tags stripped, the six dominant entities "
    "decoded (amp last so '&amp;lt;' stays a literal '&lt;'), "
    "whitespace collapsed. Exercised over a deterministic HTML "
    "wrapping of the corpus (script with embedded '<', style block, "
    "multiline-ish comment, every entity) since the synthetic docs "
    "carry none. Patterns are RE2-safe so the oracle runs them "
    "verbatim; all scan-stage expressions, zero shuffles.",
)
def text_html_strip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.text import html_to_text

    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(F.lit(_HTML_PRE), F.col("text"), F.lit(_HTML_POST))
    clean = html_to_text(html)
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        F.length(clean).cast("long").alias("n_clean_chars"),
    )


def _mmr_oracle(k: int, n_candidates: int, lam: float) -> str:
    """Unrolled MMR greedy as plain CTE steps (the sample_unimax move:
    replay the exact greedy arithmetic instead of approximating it).
    Scores are the operator's exact scaled integers — rel/sim in
    micro-units (round(cos*1e6) as BIGINT), ``lam`` as the rational of
    its decimal literal (0.7 = 7/10), score = num*rel_u -
    (den-num)*pen_u — so step winners and ties ((score DESC, id ASC))
    are integer comparisons and the only float op is the final
    ``score / (den*1e6)`` division, identical on both engines. (A
    float formulation systematically diverged: 0.7 * <6-decimal
    value> lands on an exact decimal half at the 7th digit for every
    odd last digit, where Spark's HALF_UP and DuckDB's binary round
    disagree.) k is small and fixed per registration, so the unroll
    stays readable where a recursive CTE would be fragile."""
    from fractions import Fraction

    frac = Fraction(str(lam))
    num, pnum = frac.numerator, frac.denominator - frac.numerator
    div = float(frac.denominator) * 1e6
    steps = [
        f"""
    sc1 AS (
      SELECT qid, vec_id, {num}*rel_u AS score FROM cand
    ),
    s1 AS (SELECT qid, vec_id, score FROM (
             SELECT *, row_number() OVER (PARTITION BY qid
                       ORDER BY score DESC, vec_id) AS rn FROM sc1)
           WHERE rn = 1),
    sel1 AS (SELECT qid, vec_id, 1 AS rank, score FROM s1)"""
    ]
    for m in range(2, k + 1):
        p = m - 1
        steps.append(
            f"""
    sc{m} AS (
      SELECT c.qid, c.vec_id,
             {num}*c.rel_u - {pnum}*coalesce(
               (SELECT max(p.sim_u) FROM pairs p
                JOIN sel{p} s ON s.qid = p.qid AND s.vec_id = p.ib
                WHERE p.qid = c.qid AND p.ia = c.vec_id), 0) AS score
      FROM cand c
      WHERE NOT EXISTS (SELECT 1 FROM sel{p} s
                        WHERE s.qid = c.qid AND s.vec_id = c.vec_id)
    ),
    s{m} AS (SELECT qid, vec_id, score FROM (
               SELECT *, row_number() OVER (PARTITION BY qid
                         ORDER BY score DESC, vec_id) AS rn FROM sc{m})
             WHERE rn = 1),
    sel{m} AS (SELECT * FROM sel{p}
               UNION ALL
               SELECT qid, vec_id, {m} AS rank, score FROM s{m})"""
        )
    return f"""
    WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
               FROM embeddings WHERE vec_id < 4),
    scored AS (
      SELECT q.qid, e.vec_id,
             list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS cos
      FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid
    ),
    cand AS (
      SELECT qid, vec_id,
             CAST(round(round(cos, 6) * 1000000) AS BIGINT) AS rel_u
      FROM (SELECT *, row_number() OVER (PARTITION BY qid
                      ORDER BY cos DESC, vec_id) AS rn FROM scored)
      WHERE rn <= {n_candidates}
    ),
    pairs AS (
      SELECT a.qid, a.vec_id AS ia, b.vec_id AS ib,
             CAST(round(round(list_cosine_similarity(
                    ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6)
                  * 1000000) AS BIGINT) AS sim_u
      FROM cand a
      JOIN cand b ON a.qid = b.qid AND a.vec_id <> b.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
    ),{",".join(steps)}
    SELECT qid, CAST(rank AS INT) AS rank, vec_id,
           score / {div!r} AS mmr_score
    FROM sel{k}
    """


@register(
    "rag_mmr_rerank",
    _mmr_oracle(k=5, n_candidates=16, lam=0.7),
    doc="Maximal Marginal Relevance diversified retrieval (operators/"
    "similarity.py mmr_rerank, Carbonell & Goldstein SIGIR'98): exact "
    "cosine top-16 candidates per query, then the greedy "
    "lam*rel - (1-lam)*max-sim-to-selected pick of 5, per-query inside "
    "an Arrow-batched cogroup applyInPandas — queries scale across "
    "executors, only the bounded candidate set (and its N^2 pair sims) "
    "leaves the JVM, the corpus never does. Rel/sim are rounded to 6 "
    "BEFORE the greedy so last-ulp noise can't flip an argmax; the "
    "oracle unrolls the identical greedy steps as CTEs (the "
    "sample_unimax idiom) and matches the selection bit-for-bit.",
)
def rag_mmr_rerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_mysql_data_reader_spark.operators.similarity import mmr_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    # The candidates= persist seam (r14) was MEASURED AND DROPPED in
    # round 15: A/B-neutral at sf0.1 AND at a 10x slice (1.28s
    # persisted vs 1.337s lazy, min-of-3 interleaved, rows identical)
    # while costing 2 extra exchanges — the bounded candidate subtree
    # is too cheap for its re-evaluation to matter before the greedy
    # cogroup dominates. The operator seam itself stays for callers
    # whose retrieval leg IS expensive (ANN upstream).
    return mmr_rerank(emb, queries, k=5, n_candidates=16, lam=0.7)


@register(
    "text_url_normalize",
    """
    WITH u AS (
      SELECT doc_id,
             CASE WHEN doc_id % 4 = 0 THEN 'HTTP://WWW.'
                  ELSE 'HTTPS://WWW.' END
             || source || '.Example.COM:443/' || lang
             || '/page-' || CAST(doc_id % 40 AS VARCHAR)
             || CASE WHEN doc_id % 3 = 0
                     THEN '?utm_source=feed&id=' || CAST(doc_id % 40 AS VARCHAR)
                     WHEN doc_id % 3 = 1
                     THEN '?id=' || CAST(doc_id % 40 AS VARCHAR)
                          || '&myutm_s=keep&utm_campaign=x&gclid=abc'
                     ELSE '' END
             || CASE WHEN doc_id % 2 = 0
                     THEN '#sec-' || CAST(doc_id AS VARCHAR)
                     ELSE '' END AS raw_url
      FROM documents
    ),
    s1 AS (SELECT doc_id, raw_url,
                  regexp_replace(raw_url, '#.*$', '') AS nu
           FROM u),
    s2 AS (SELECT doc_id, raw_url, nu,
                  regexp_extract(nu, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)
                    AS head,
                  lower(regexp_extract(nu,
                    '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme
           FROM s1),
    s3 AS (SELECT doc_id, raw_url, scheme,
                  CASE WHEN scheme = 'http'
                            AND regexp_matches(lower(head), ':80$')
                       THEN regexp_replace(lower(head), ':80$', '')
                       WHEN scheme = 'https'
                            AND regexp_matches(lower(head), ':443$')
                       THEN regexp_replace(lower(head), ':443$', '')
                       ELSE lower(head) END AS head2,
                  substr(nu, length(head) + 1) AS rest
           FROM s2),
    s4 AS (SELECT doc_id, raw_url, scheme, head2,
                  regexp_extract(rest, '^([^?]*)', 1) AS path,
                  substr(rest,
                         length(regexp_extract(rest, '^([^?]*)', 1)) + 1)
                    AS qs0
           FROM s3),
    s5 AS (SELECT doc_id, raw_url, scheme, head2, path,
                  regexp_replace(regexp_replace(regexp_replace(
                    regexp_replace(regexp_replace(qs0,
                      '&(utm_[a-z]+|fbclid|gclid|ref_src)=[^&#]*', '', 'g'),
                      '\\?(utm_[a-z]+|fbclid|gclid|ref_src)=[^&#]*&', '?', 'g'),
                      '\\?(utm_[a-z]+|fbclid|gclid|ref_src)=[^&#]*$', '', 'g'),
                      '\\?&+', '?', 'g'),
                      '[?&]+$', '', 'g') AS qs
           FROM s4),
    n AS (SELECT doc_id,
                 head2 || path || qs AS norm_url,
                 CASE WHEN scheme = 'http'
                           AND regexp_matches(lower(regexp_extract(raw_url,
                             '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)),
                             ':80$')
                      THEN regexp_replace(lower(regexp_extract(raw_url,
                             '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)),
                             ':80$', '')
                      WHEN scheme = 'https'
                           AND regexp_matches(lower(regexp_extract(raw_url,
                             '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)),
                             ':443$')
                      THEN regexp_replace(lower(regexp_extract(raw_url,
                             '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)),
                             ':443$', '')
                      ELSE lower(regexp_extract(raw_url,
                             '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)) END
                   AS host
          FROM s5)
    SELECT doc_id, norm_url, host,
           CAST(count(*) OVER (PARTITION BY norm_url) AS BIGINT) AS n_same_url
    FROM n
    """,
    doc="URL canonicalization (operators/text.py url_normalize/"
    "url_host) over a DETERMINISTIC URL wrapping of the corpus (the "
    "text_html_strip move — the repo's tables carry no URLs, so the "
    "query synthesizes the classic spellings one page arrives under: "
    "mixed-case scheme/host, default AND non-default ports, "
    "utm_*/gclid tracking params, a suffix-coincident myutm_s param "
    "that must SURVIVE, fragments): drop fragment, lowercase "
    "scheme+host (path stays case-sensitive), strip the scheme's "
    "DEFAULT port only (the http://...:443 spellings keep their port "
    "— a distinct origin), strip tracking params anchored on their "
    "?/& separator within the query string only, then the separator "
    "debris. The n_same_url window shows the point — variant "
    "spellings collapse to one canonical identity for URL-level "
    "dedup / per-host caps. Pure RE2-safe scan-stage regexps the "
    "oracle runs verbatim; the only shuffle is the norm_url count "
    "window.",
)
def text_url_normalize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from clickhouse_mysql_data_reader_spark.operators.text import (
        url_host,
        url_normalize,
    )

    docs = load_table(spark, sf_dir, "documents")
    k = F.pmod(F.col("doc_id"), F.lit(40)).cast("string")
    raw = F.concat(
        F.when(
            F.pmod(F.col("doc_id"), F.lit(4)) == 0, F.lit("HTTP://WWW.")
        ).otherwise(F.lit("HTTPS://WWW.")),
        F.col("source"),
        F.lit(".Example.COM:443/"),
        F.col("lang"),
        F.lit("/page-"),
        k,
        F.when(
            F.pmod(F.col("doc_id"), F.lit(3)) == 0,
            F.concat(F.lit("?utm_source=feed&id="), k),
        )
        .when(
            F.pmod(F.col("doc_id"), F.lit(3)) == 1,
            F.concat(
                F.lit("?id="), k, F.lit("&myutm_s=keep&utm_campaign=x&gclid=abc")
            ),
        )
        .otherwise(F.lit("")),
        F.when(
            F.pmod(F.col("doc_id"), F.lit(2)) == 0,
            F.concat(F.lit("#sec-"), F.col("doc_id").cast("string")),
        ).otherwise(F.lit("")),
    )
    base = docs.select(
        "doc_id",
        url_normalize(raw).alias("norm_url"),
        url_host(raw).alias("host"),
    )
    w = Window.partitionBy("norm_url")
    return base.select(
        "doc_id",
        "norm_url",
        "host",
        F.count(F.lit(1)).over(w).alias("n_same_url"),
    )


def _register_near_dup_rate_monitor() -> None:
    """Deferred so _CC_REACH_CTES (defined mid-module) is in scope."""

    @register(
        "monitor_near_dup_rate_by_source",
        f"""{_CC_REACH_CTES},
    comp AS (SELECT u AS doc_id, min(lbl) AS component FROM reach GROUP BY u),
    labeled AS (
      SELECT d.doc_id, d.source, coalesce(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c USING (doc_id)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN doc_id = component THEN 0 ELSE 1 END)
                AS BIGINT) AS n_dup_docs,
           round(sum(CASE WHEN doc_id = component THEN 0 ELSE 1 END)
                 / count(*), 6) AS near_dup_rate
    FROM labeled GROUP BY source
    """,
        doc="Per-source NEAR-duplication rate — the near-dup complement "
        "of monitor_dup_rate_by_source: exactly what a near-dedup pass "
        "(LSH -> Jaccard verify -> connected components, min-id keeper "
        "— the checked dedup_cluster machinery) would remove from each "
        "source. Read the two monitors together to tell a source "
        "re-crawling itself (exact rate jumps) from one templating or "
        "mirroring with edits (near rate jumps while exact stays "
        "flat). A doc is a near-dup casualty iff its component label "
        "(= min member id, connected_components' convention) differs "
        "from its own id, so the report needs NO separate keeper "
        "election — one scan-stage comparison after the closure. "
        "Scale shape: the banded LSH candidate machinery of the "
        "checked dedup family (never all-pairs); the corpus adds one "
        "left join against the bounded component frame and a "
        "map-side-combinable per-source aggregate. The oracle replays "
        "the full closure as a recursive CTE.",
    )
    def monitor_near_dup_rate_by_source_q(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from pyspark import StorageLevel

        from clickhouse_mysql_data_reader_spark.operators.graph import (
            connected_components,
        )

        docs = load_table(spark, sf_dir, "documents")
        sh = shingle_table(docs, "text", "doc_id", k=3, partition_by_id=True)
        sigs = minhash_signatures(sh, NUM_HASHES)
        cands = lsh_candidate_pairs(sigs, NUM_HASHES, BANDS)
        pairs = jaccard_pairs(
            sh, candidates=cands, min_jaccard=_CC_THRESHOLD,
            storage=StorageLevel.MEMORY_AND_DISK,
        )
        comp = connected_components(pairs)
        labeled = (
            docs.select("doc_id", "source")
            .join(comp, "doc_id", "left")
            .withColumn("component", F.coalesce("component", F.col("doc_id")))
        )
        dropped = F.when(F.col("doc_id") == F.col("component"), 0).otherwise(1)
        return (
            labeled.groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum(dropped).cast("long").alias("n_dup_docs"),
            )
            .select(
                "source",
                "n_docs",
                "n_dup_docs",
                F.round(F.col("n_dup_docs") / F.col("n_docs"), 6).alias(
                    "near_dup_rate"
                ),
            )
        )


_register_near_dup_rate_monitor()


@register(
    "match_margin_pairs",
    """
    WITH a AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
               FROM embeddings WHERE label = 0),
    b AS (SELECT vec_id, embedding::DOUBLE[] AS ce
          FROM embeddings WHERE label <> 0),
    scored AS (
      SELECT a.qid, b.vec_id, list_cosine_similarity(a.qe, b.ce) AS cos
      FROM a, b
    ),
    ranked AS (
      SELECT qid, vec_id, round(cos, 6) AS cos6,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos DESC, vec_id ASC) AS rn
      FROM scored
    )
    SELECT r1.qid, r1.vec_id, r1.cos6 AS cos_sim,
           round(r1.cos6 - r2.cos6, 6) AS margin
    FROM ranked r1 JOIN ranked r2 ON r1.qid = r2.qid
                                 AND r1.rn = 1 AND r2.rn = 2
    WHERE round(r1.cos6 - r2.cos6, 6) >= 0.01 AND r1.cos6 >= 0.35
    """,
    doc="Margin-based cross-population pair mining — the bitext-mining "
    "criterion (Artetxe & Schwenk 2019's margin scoring, distance-"
    "margin form; the CCMatrix/LASER recipe for mining parallel "
    "corpora): a query vector accepts its best cross-side neighbor "
    "only when the TOP-1 cosine beats the RUNNER-UP by a margin — "
    "absolute similarity alone over-accepts in dense hubs where "
    "everything is equally close, the exact failure the margin "
    "rejects. Sides here are embedding label 0 vs the rest (in a "
    "multilingual pipeline: source-language vs target-language "
    "sentence embeddings). Returns (qid, vec_id, cos_sim, margin) "
    "for accepted pairs. Both engines rank by RAW cosine (the "
    "embed_cosine_topk discipline) and round per-rank values to 6dp "
    "before the margin subtraction, so accept decisions are grid-"
    "stable; thresholds sit in measured data gaps. Scale shape: the "
    "bounded query side broadcasts and the corpus streams (one "
    "BroadcastNestedLoop scan — the exact baseline; at 100 TB the "
    "candidate stage swaps to the SRP-banded or IVF-blocked siblings "
    "and this margin verify runs on their candidates), and the "
    "top-2 -> margin pivot is ONE conditional aggregate per query — "
    "no self-join of the ranked frame.",
)
def match_margin_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("label") == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    b = emb.filter(F.col("label") != 0)
    t2 = cosine_topk(b, a, k=2, query_id_col="qid")
    pivoted = t2.groupBy("qid").agg(
        F.max(F.when(F.col("rn") == 1, F.col("vec_id"))).alias("vec_id"),
        F.max(F.when(F.col("rn") == 1, F.col("cos_sim"))).alias("cos_sim"),
        F.max(F.when(F.col("rn") == 2, F.col("cos_sim"))).alias("_c2"),
    )
    return (
        pivoted.withColumn(
            "margin", F.round(F.col("cos_sim") - F.col("_c2"), 6)
        )
        .filter((F.col("margin") >= 0.01) & (F.col("cos_sim") >= 0.35))
        .select("qid", "vec_id", "cos_sim", "margin")
    )
