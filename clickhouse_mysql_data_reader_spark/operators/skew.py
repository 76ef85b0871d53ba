"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (on in session.py) handles most cases at
runtime; salting is the *plan-level* tool for the pathological ones —
a groupBy where one key owns half the input, or a shuffle join against
a side with a few giant keys. Both transforms below are semantics-
preserving (partials merge across salts, so the salt value never
affects the result) and RNG-free, so results are oracle-checkable
against the unsalted form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, num_salts: int) -> Column:
    """Per-row salt in [0, num_salts): a hash of the row content MIXED
    with the row's physical position (partition id + in-partition
    offset). The position term spreads a hot key made of IDENTICAL rows
    (common in event/CDC data) across salts — a pure content hash maps
    all duplicates to one reducer, recreating the skew it was meant to
    break. Retry stability is BEST-EFFORT, and that is enough: when the
    upstream is a deterministic file scan, a retried map task re-reads
    the same partition in the same order and rows re-salt identically;
    above an arbitrary shuffle, ``monotonically_increasing_id`` may
    renumber under retry and rows can land on different salts — which
    changes WHERE partials compute, never WHAT they sum to, because
    partials merge across all salts and the salt value never leaks
    into results."""
    return F.pmod(
        F.xxhash64(
            *[F.col(c) for c in df.columns],
            F.spark_partition_id(),
            F.monotonically_increasing_id(),
        ),
        F.lit(num_salts),
    )

# (partial_fn, merge_fn) per supported algebraic aggregate.
# count honors SQL count(col) semantics (nulls excluded); pass a
# known-non-null column for count(*) behavior.
_ALGEBRAIC = {
    "count": (F.count, F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with an explicit salt: phase 1 groups by
    (keys + salt) so a hot key's rows spread over ``num_salts``
    reducers; phase 2 merges the small per-salt partials.

    ``aggs`` maps output column -> (source column, fn) with fn in
    {count, sum, min, max} (algebraic: partials merge losslessly).
    The salt is position-mixed row hashing (see ``_row_salt``), not
    rand() — a retried stage re-salts identically, and duplicate rows
    of a hot key still spread.
    """
    for out, (_, fn) in aggs.items():
        if fn not in _ALGEBRAIC:
            raise ValueError(f"{out}: {fn} is not algebraically mergeable")
    salted = df.withColumn("_salt", _row_salt(df, num_salts))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _ALGEBRAIC[fn][0](src).alias(f"_p_{out}")
            for out, (src, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[fn][1](f"_p_{out}").alias(out)
            for out, (_, fn) in aggs.items()
        ]
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys on the skewed side: the skewed
    side gets a deterministic salt in [0, num_salts); the other side is
    replicated num_salts times (explode of a literal range — num_salts
    times ITS size, which is why this fits dimension-ish right sides).
    The join key becomes (on + salt), so one hot key's rows land on
    num_salts different reducers instead of one.

    Only inner/left/semi/anti shapes are semantics-preserving: an
    unmatched row on the REPLICATED side exists in every salted copy,
    so right/full outer joins would emit it num_salts times."""
    if how.replace("_", "").lower() not in (
        "inner",
        "left",
        "leftouter",
        "leftsemi",
        "semi",
        "leftanti",
        "anti",
        "cross",
    ):
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched rows of "
            "the replicated side; use inner/left/semi/anti"
        )
    s = skewed.withColumn("_salt", _row_salt(skewed, num_salts))
    o = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return s.join(o, on + ["_salt"], how).drop("_salt")
