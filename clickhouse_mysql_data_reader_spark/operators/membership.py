"""Approximate-membership (Bloom filter) pre-filtering for incremental
dedup at scale.

The incremental-curation hot path anti-joins every new batch against the
landed fingerprint history (curation.py:curate_increment). That join
shuffles the BATCH by fingerprint every increment even though, on a
steady corpus, almost every new document is genuinely new — the join
does a full pass to discover mostly-misses. The classic fix (ClickHouse
uses Bloom-filter secondary indexes for the same reason; Spark's own
runtime row-level filtering builds `bloom_filter_agg` internally, but
that aggregate is not exposed in this build's function registry) is a
Bloom filter over the history keys:

- rows whose key is DEFINITELY NOT in the filter skip the join;
- only the "maybe" rows (true hits + the fpp share of false positives)
  pay the exact anti-join, which REMOVES the false positives — the
  composition is exactly equal to the plain anti-join, so the DuckDB
  oracle for the composed operator is ordinary SQL.

Scale shape: one JVM-side ``xxhash64`` per row feeds everything; the
filter is built per-partition in Arrow batches (numpy bit-ops, no
per-row Python) and OR-merged on the driver — bounded driver traffic of
``num_bits/8`` bytes per partition, the same class as collecting a
broadcast dim. The probe side broadcasts the finished filter once.

Probe positions use Kirsch-Mitzenmacher double hashing: position_i =
(h1 + i * h2) mod m over the single 64-bit input hash — k independent
probes from one hash, identical arithmetic (numpy uint64 wrap-around)
on build and probe.
"""

from __future__ import annotations

import math
import sys

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# odd multiplier (golden-ratio constant) for the derived second hash;
# uint64 wrap-around multiplication keeps it a bijection
_H2_MULT = 0x9E3779B97F4A7C15


def _self_contained_pickle() -> None:
    """Ship this module by value inside pickled UDFs (workers may not
    have the repo on PYTHONPATH); shared logic in util.py."""
    from clickhouse_mysql_data_reader_spark.util import self_contained_pickle

    self_contained_pickle(sys.modules[__name__])


def bloom_sizing(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """(num_bits, num_hashes) for a target false-positive rate, the
    standard formulas m = -n ln p / (ln 2)^2, k = (m/n) ln 2. num_bits
    is rounded up to a multiple of 8 so the filter is a whole number of
    bytes."""
    n = max(1, int(expected_items))
    m = int(-n * math.log(fpp) / (math.log(2.0) ** 2))
    m = max(64, (m + 7) // 8 * 8)
    k = max(1, round(m / n * math.log(2.0)))
    return m, k


def _positions(h_uint64, num_bits: int, num_hashes: int):
    """(k, len(h)) matrix of probe bit positions — shared by build and
    probe so the arithmetic cannot drift apart."""
    h1 = h_uint64
    h2 = h1 * np.uint64(_H2_MULT) | np.uint64(1)  # odd -> full-period step
    return [
        ((h1 + np.uint64(i) * h2) % np.uint64(num_bits)) for i in range(num_hashes)
    ]


def build_bloom(
    keys: DataFrame,
    key_col: str,
    num_bits: int,
    num_hashes: int,
) -> bytes:
    """Build a Bloom filter over ``keys[key_col]`` (any hashable SQL
    type; hashed JVM-side with xxhash64 before Python sees a row).

    Each partition reduces to ONE ``num_bits/8``-byte array inside an
    Arrow batch job; the driver ORs the per-partition arrays as they
    stream in. Driver memory is O(num_bits), independent of row count —
    at 100 TB pick num_bits for the HISTORY cardinality (1e9 keys at
    1% fpp is ~1.2 GB; for driver comfort either raise fpp — false
    positives only cost exact-join work, never correctness — or build
    per-shard filters).
    """
    _self_contained_pickle()
    if num_bits % 8:
        # floor-dividing to bytes would make bit positions in the last
        # partial byte index past the array — an executor IndexError on
        # the first write. Fail at build time instead; callers size via
        # bloom_sizing() (already byte-rounded) or round up themselves.
        raise ValueError(f"num_bits must be a multiple of 8, got {num_bits}")
    nbytes = num_bits // 8

    def per_partition(batches):
        bits = np.zeros(nbytes, dtype=np.uint8)
        saw = False
        for pdf in batches:
            if pdf.empty:
                continue
            saw = True
            h = pdf["h"].to_numpy(dtype=np.int64).view(np.uint64)
            for pos in _positions(h, num_bits, num_hashes):
                np.bitwise_or.at(
                    bits, (pos // 8).astype(np.int64), np.uint8(1) << (pos % np.uint64(8)).astype(np.uint8)
                )
        if saw:
            yield pd.DataFrame({"bf": [bits.tobytes()]})

    parts = (
        keys.select(F.xxhash64(F.col(key_col)).alias("h"))
        .mapInPandas(per_partition, "bf binary")
        .toLocalIterator()  # stream: 2 partition filters in memory, not all
    )
    merged = np.zeros(nbytes, dtype=np.uint8)
    for r in parts:
        merged |= np.frombuffer(r["bf"], dtype=np.uint8)
    return bytes(merged)


def might_contain(bloom: bytes, num_bits: int, num_hashes: int, key: Column) -> Column:
    """Boolean probe column: False means DEFINITELY not in the filter's
    key set; True means maybe. Arrow-batched pandas UDF over the same
    JVM-side xxhash64 the build used.

    The filter bytes ship as a ``SparkContext.broadcast`` — delivered
    ONCE per executor via the torrent protocol — not as closure bytes,
    which would be re-serialized into every task's python command (at
    the module's 1e9-key sizing example that is ~1.2 GB per task).
    The closure captures only the broadcast handle; the fallback to raw
    bytes exists solely for the no-active-session case (unit code
    building columns before a session exists)."""
    _self_contained_pickle()
    if num_bits % 8:
        raise ValueError(f"num_bits must be a multiple of 8, got {num_bits}")
    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf

    nbits = num_bits
    nhashes = num_hashes
    spark = SparkSession.getActiveSession()
    payload = (
        spark.sparkContext.broadcast(bloom) if spark is not None else bloom
    )

    @pandas_udf("boolean")
    def probe(h: pd.Series) -> pd.Series:
        raw = payload.value if hasattr(payload, "value") else payload
        bits = np.frombuffer(raw, dtype=np.uint8)
        hv = h.to_numpy(dtype=np.int64).view(np.uint64)
        hit = np.ones(len(hv), dtype=bool)
        for pos in _positions(hv, nbits, nhashes):
            byte = bits[(pos // 8).astype(np.int64)]
            hit &= (byte >> (pos % np.uint64(8)).astype(np.uint8)) & 1 == 1
        return pd.Series(hit)

    return probe(F.xxhash64(key))


def bloom_prefiltered_anti_join(
    new_df: DataFrame,
    history_df: DataFrame,
    key_col: str,
    expected_items: int | None = None,
    fpp: float = 0.01,
    storage=None,
) -> DataFrame:
    """``new_df`` rows whose ``key_col`` does NOT appear in
    ``history_df[key_col]`` — semantically identical to
    ``new_df.join(history_df, key_col, "left_anti")``, but only the
    Bloom "maybe" rows reach the shuffle join:

    - definite-miss rows (the overwhelming majority on a steady
      corpus) are kept by a broadcast-filter scan, zero shuffle;
    - maybe rows pay the exact anti-join, which removes the Bloom's
      false positives, so the result is EXACT for any fpp.

    ``expected_items`` sizes the filter (defaults to counting
    ``history_df`` — one cheap aggregate; pass the known history
    cardinality to skip it).

    Both output branches consume ``new_df``, so its upstream plan
    executes twice per action. For a plain scan that is cheap; when
    ``new_df`` is an expensive derivation, pass ``storage`` (e.g.
    ``StorageLevel.MEMORY_AND_DISK``) to persist the tagged frame for
    the duration — CALLER owns the lifecycle (unpersist/clearCache
    after the action), same contract as ``dedup.jaccard_pairs``."""
    if expected_items is None:
        expected_items = history_df.count()
    num_bits, num_hashes = bloom_sizing(expected_items, fpp)
    bloom = build_bloom(history_df, key_col, num_bits, num_hashes)
    maybe_col = might_contain(bloom, num_bits, num_hashes, F.col(key_col))
    tagged = new_df.withColumn("_maybe", maybe_col)
    if storage is not None:
        tagged = tagged.persist(storage)
    definite_new = tagged.filter(~F.col("_maybe")).drop("_maybe")
    maybes = tagged.filter(F.col("_maybe")).drop("_maybe")
    survivors = maybes.join(
        history_df.select(key_col).distinct(), key_col, "left_anti"
    )
    return definite_new.unionByName(survivors)
