"""As-of (point-in-time) join — for each left row, the single most
recent right row with ``right_ts <= left_ts`` on the same key.

The reference has no join layer at all (SURVEY.md §2.4); this is the
time-series operator its destination (ClickHouse ``ASOF JOIN``) offers
over the landed tables, re-expressed Spark-first.

Scale story: the naive formulation is a range join (every left row
against every earlier right row of the key) whose intermediate blows up
quadratically per key. Instead we UNION the two sides tagged, sort once
per key by (ts, side, seq), and carry the right side's payload forward
with ``last(ignorenulls=True)`` over a running window. Cost is ONE
shuffle on the key + a linear per-partition pass — the same plan shape
at 100 TB, with no pair-wise intermediate ever materialized. Skewed
keys are handled by AQE the same as any window partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    seq_col: str | None = None,
) -> DataFrame:
    """Left as-of join: all left columns + each right ``payload_cols``
    value from the latest right row with ``right_ts <= left_ts``
    (NULL when no such row exists).

    ``seq_col`` (a right-side column) breaks ties among right rows with
    identical (key, ts) deterministically — the row with the greatest
    ``seq_col`` wins, mirroring last-write-wins CDC semantics. Without
    ``seq_col`` the tie-break is a content hash of the right row
    (``xxhash64`` over all its columns): arbitrary but DETERMINISTIC —
    the same input rows produce the same winner regardless of input
    partitioning, shuffle layout, or stage retries (unlike
    ``monotonically_increasing_id``, which is partition-layout-
    dependent and changes under retry).
    """
    left_cols = left.columns
    pay = [f"_r_{c}" for c in payload_cols]

    # Tag sides; left rows carry NULL payload slots that the running
    # window fills from the most recent preceding right row.
    tie = F.col(seq_col) if seq_col else F.xxhash64(*[F.col(c) for c in right.columns])
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        tie.alias("_seq"),
        *[F.col(c).alias(p) for c, p in zip(payload_cols, pay)],
        *[F.lit(None).alias(c) for c in left_cols],
    )
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_seq"),
        *[F.lit(None).alias(p) for p in pay],
        *left_cols,
    )
    # Right before left at equal ts => inclusive (<=) as-of semantics.
    w = (
        W.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_seq").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = r.unionByName(l).select(
        "*", *[F.last(p, ignorenulls=True).over(w).alias(f"_f_{p}") for p in pay]
    )
    return filled.filter(F.col("_side") == 1).select(
        *left_cols,
        *[F.col(f"_f_{p}").alias(c) for c, p in zip(payload_cols, pay)],
    )
