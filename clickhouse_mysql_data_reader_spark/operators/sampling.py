"""Deterministic hash-based sampling and dataset splitting.

Training-data pipelines need sampling that is REPRODUCIBLE (same rows
selected on every run, every retry, every engine) and INDEPENDENT
across uses (the 10% quality-audit sample must not correlate with the
80/10/10 train split). Spark's ``df.sample`` is seeded per-partition —
its membership changes whenever partitioning changes — so these
operators hash a stable business key instead:

    keep row  <=>  first 8 hex chars of md5(salt || key)  <  threshold

md5 is identical in Spark and DuckDB (unlike murmur3/xxhash), the 8-hex
prefix is uniform over [0, 16^8), and comparing equal-length lowercase
hex strings lexicographically IS numeric comparison — so the exact same
rows are selected by the SQL oracle, by a retried stage, and by a
different engine entirely. Different ``salt`` values give independent
hash functions (per-use decorrelation).

At 100 TB all of this is a per-row expression on the scan — zero
shuffles, trivially pushed into the first stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_SPAN = 16**8  # 8-hex-digit space


def _hex_threshold(rate: float) -> str:
    """Exclusive upper bound for an 8-hex-digit hash prefix, as a
    lexicographically-comparable lowercase hex literal."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return format(int(rate * HEX_SPAN), "08x")


def hash_bucket(key: Column, salt: str) -> Column:
    """First 8 hex chars of md5(salt || key) — the uniform [0,16^8)
    draw every sampling decision is made against."""
    return F.substring(F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 8)


def sample_condition(key: Column, rate: float, salt: str = "sample") -> Column:
    """Boolean keep-condition selecting ~``rate`` of rows, deterministic
    in the key. rate=1.0 keeps everything, rate=0.0 nothing."""
    if rate >= 1.0:
        return F.lit(True)
    if rate <= 0.0:
        return F.lit(False)
    return hash_bucket(key, salt) < F.lit(_hex_threshold(rate))


def stratified_sample_condition(
    key: Column,
    stratum: Column,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "sample",
) -> Column:
    """Per-stratum keep-condition (e.g. downsample 'view' events to 10%
    but keep every 'purchase'). One hash per row regardless of the
    number of strata."""
    cond = sample_condition(key, default_rate, salt)
    for value, rate in sorted(rates.items()):
        cond = F.when(stratum == F.lit(value), sample_condition(key, rate, salt)).otherwise(cond)
    return cond


def hash_split(key: Column, fractions: dict[str, float], salt: str = "split") -> Column:
    """Assign each row a split label ('train'/'val'/'test'...) by hash
    range. Fractions must sum to 1; the last listed split absorbs any
    rounding remainder. Assignment is a pure function of the key — a
    document lands in the same split in every run and every engine, the
    property that keeps eval sets leak-free across pipeline reruns."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = hash_bucket(key, salt)
    names = list(fractions)
    expr: Column | None = None
    cum = 0.0
    for name in names[:-1]:
        cum += fractions[name]
        branch = bucket < F.lit(_hex_threshold(cum))
        expr = F.when(branch, F.lit(name)) if expr is None else expr.when(branch, F.lit(name))
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)
