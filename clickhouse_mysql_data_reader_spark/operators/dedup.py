"""Deduplication operators.

``latest_wins_view`` is the engine's ReplacingMergeTree-FINAL
equivalent (the destination contract the reference sets up via
``ENGINE = ReplacingMergeTree() ORDER BY pk``, tablesqlbuilder.py:393-398).

The rest are the training-data-pipeline dedup family: exact content
hash, normalized fingerprint, MinHash+LSH, SimHash, n-gram Jaccard.
All are pure DataFrame compositions — shingle explosion + hash-min
aggregation + band-bucket self-join — no Python UDFs, so the same plan
runs on 100 TB of documents (the shuffles are keyed on narrow hash
columns, never on document text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def latest_wins_view(
    df: DataFrame, key_cols: list[str], version_cols: list[str]
) -> DataFrame:
    """Last-write-wins per key, deterministic via version_cols tiebreak."""
    w = W.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in version_cols])
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def normalize_text(col):
    """Whitespace-collapse + lowercase + trim: the canonical form used by
    every content-hash dedup below (portable to the SQL oracle)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def content_fingerprint(col):
    """Deterministic 128-bit fingerprint of normalized content (md5 —
    identical in Spark and DuckDB, unlike murmur3/xxhash)."""
    return F.md5(normalize_text(col))


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group exact duplicates by content fingerprint; keeper = min id."""
    return (
        df.select(F.col(id_col), content_fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_dupes"),
            F.min(id_col).alias("keeper_id"),
        )
    )


def word_shingles(col, k: int = 3):
    """k-word shingles of normalized text as an array column.

    Built from pure SQL building blocks (split + sequence + transform)
    so the DuckDB oracle can reproduce it token-for-token.
    """
    toks = F.split(normalize_text(col), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n >= k, F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def shingle_table(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """(id, shingle) pairs, distinct — the base relation for Jaccard and
    MinHash. At scale this is the only wide dataset; everything after
    operates on (id, hash) pairs."""
    return (
        df.select(F.col(id_col).alias("doc_id"), word_shingles(F.col(text_col), k).alias("sh"))
        .select("doc_id", F.explode("sh").alias("shingle"))
        .distinct()
    )


def minhash_signatures(shingles: DataFrame, num_hashes: int = 16) -> DataFrame:
    """MinHash signature per doc: hash_i(s) = md5(i || ':' || s); the
    signature element is min over shingles (lexicographic min of the hex
    digest — a uniform 128-bit hash, so ties are measure-zero).

    One groupBy on doc_id; per-doc state is num_hashes * 32 bytes.
    """
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return shingles.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """Band the signature, bucket by band hash, self-join buckets.

    The standard LSH trick: docs sharing ANY band bucket become a
    candidate pair. The self-join is keyed on (band_id, band_hash) —
    narrow keys, and bucket sizes are the only skew concern (AQE's
    skew-join split handles pathological clusters).
    """
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band_id"), F.md5(F.concat_ws("|", *parts)).alias("band_hash"))
        )
    banded = signatures.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band")
    ).select("doc_id", F.col("band.band_id").alias("band_id"), F.col("band.band_hash").alias("band_hash"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_pairs(
    shingles: DataFrame,
    candidates: DataFrame | None = None,
    min_jaccard: float = 0.0,
    min_inter: int = 1,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs (or all co-shingled
    pairs when candidates is None).

    |A ∩ B| comes from the shingle self-join; |A ∪ B| = |A|+|B|-|A∩B|.
    Restricting to candidate pairs first is the 100 TB path: the
    all-pairs join only ever materializes pairs that share ≥1 shingle.
    """
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = shingles.alias("sa")
    b = shingles.alias("sb")
    inter = (
        a.join(b, (F.col("sa.shingle") == F.col("sb.shingle")) & (F.col("sa.doc_id") < F.col("sb.doc_id")))
        .groupBy(F.col("sa.doc_id").alias("doc_a"), F.col("sb.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["doc_a", "doc_b"], "left_semi")
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            # raw double division, NOT rounded: both engines lower
            # int/int to the identical IEEE double op, so the value is
            # bit-deterministic — unlike round(), whose half-way
            # behavior differs across engines.
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
    )
    return out.filter(
        (F.col("jaccard") >= min_jaccard) & (F.col("n_inter") >= min_inter)
    ).select("doc_a", "doc_b", "n_inter", "jaccard")


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 32) -> DataFrame:
    """SimHash over word tokens: each token votes its 32-bit md5-derived
    hash bitwise; the sign of each bit-sum forms the fingerprint.

    Pure expression pipeline: token explode -> bit explode via sequence
    -> conditional sum -> bit reassembly. Hamming-close fingerprints =
    near-duplicates. 32 bits keeps every intermediate in a LONG (and
    portable to the oracle via conv/hex tricks).
    """
    toks = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"))
        .withColumn("th", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"))
    )
    bit = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit_i"),
        "th",
    ).withColumn(
        "vote",
        F.when(F.expr("(shiftright(th, bit_i) & 1) = 1"), 1).otherwise(-1),
    )
    bitsum = bit.groupBy("doc_id", "bit_i").agg(F.sum("vote").alias("s"))
    return bitsum.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), bit_i)")).otherwise(0)
        ).alias("simhash")
    )
