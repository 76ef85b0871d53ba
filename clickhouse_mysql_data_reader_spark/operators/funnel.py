"""Sequential-event analytics in the ClickHouse style: windowFunnel and
retention — the signature behavioral-analytics functions a ClickHouse
user of the reference runs on event streams
(reference docs/manual.md: ClickHouse destination; functions
windowFunnel/retention have no ANSI equivalent, so they are modeled
explicitly here).

Both are computed in ONE shuffle on the user key:

- ``funnel_levels``: groupBy(user) -> sorted (ts, type) array -> a
  per-user higher-order fold walks the events once, tracking the
  earliest chain start and each step's completion time under the window
  constraint. No joins, no re-scans per step — the staged-CTE
  formulation (one aggregation + join PER STEP) shuffles the events
  table once per funnel stage; this does it once total, which is the
  difference between 1 and k full-table shuffles at 100 TB.
- ``retention_flags``: plain conditional aggregation (bool_or per
  condition), AND-chained like ClickHouse ``retention``.

Timestamps fold as epoch MICROSECONDS (integer compares — no float
drift), matching the DuckDB oracle via unix_micros/epoch_us.

Scale bound: the fold buffers ONE user's step-relevant events as an
array (8+overhead bytes per event after the isin pre-filter projects
away everything but ts+type) — the same per-user buffering contract as
ClickHouse's windowFunnel. A pathological user with ~10^8 step events
would need ~GBs on one executor; mitigate upstream by bounding the
funnel window at ingest (filter events to the analysis time range)
before grouping. Normal users (<=10^5 events) are a few MB at worst.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NO_TS = -1  # sentinel: integer micros are always >= 0 for the fixtures


def funnel_levels(
    events: DataFrame,
    steps: list[str],
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel depth: the greedy-from-earliest-start chain
    semantics — step 1 completes at the user's FIRST step-1 event, each
    later step at the first matching event after the previous step and
    within ``window_seconds`` of the chain start. Returns
    (user, funnel_level) with level in [0, len(steps)].

    (ClickHouse windowFunnel additionally retries later chain starts;
    the greedy-first-start variant is the standard SQL formulation and
    is what the DuckDB oracle mirrors stage by stage.)
    """
    if not 1 <= len(steps) <= 8:
        raise ValueError(f"need 1..8 steps, got {len(steps)}")
    w_us = int(window_seconds) * 1_000_000
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.struct(
            F.unix_micros(F.col(ts_col)).alias("ts_us"),
            F.col(type_col).alias("etype"),
        ).alias("e"),
    ).filter(F.col("e.etype").isin(*steps))
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list("e")).alias("evs")
    )

    n = len(steps)
    init = F.struct(
        *[F.lit(_NO_TS).cast("long").alias(f"t{i}") for i in range(n)]
    )

    def _merge(acc: Column, e: Column) -> Column:
        fields = []
        for i, step in enumerate(steps):
            prev_done = (
                F.lit(True) if i == 0 else acc[f"t{i-1}"] != F.lit(_NO_TS)
            )
            after_prev = (
                F.lit(True) if i == 0 else e["ts_us"] > acc[f"t{i-1}"]
            )
            in_window = (
                F.lit(True)
                if i == 0
                else e["ts_us"] <= acc["t0"] + F.lit(w_us)
            )
            take = (
                (acc[f"t{i}"] == F.lit(_NO_TS))
                & (e["etype"] == F.lit(step))
                & prev_done
                & after_prev
                & in_window
            )
            fields.append(
                F.when(take, e["ts_us"]).otherwise(acc[f"t{i}"]).alias(f"t{i}")
            )
        return F.struct(*fields)

    folded = F.aggregate(F.col("evs"), init, _merge)
    # ascending build: each step wraps the previous chain in otherwise(),
    # so the OUTERMOST when checks the deepest step first -> max level
    level: Column = F.lit(0)
    for i in range(n):
        level = F.when(folded[f"t{i}"] != F.lit(_NO_TS), F.lit(i + 1)).otherwise(
            level
        )
    return per_user.select("user_id", level.cast("int").alias("funnel_level"))


def funnel_histogram(
    events: DataFrame, steps: list[str], window_seconds: int, **kw
) -> DataFrame:
    """(funnel_level, n_users) — the report shape analysts read."""
    return (
        funnel_levels(events, steps, window_seconds, **kw)
        .groupBy("funnel_level")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def retention_flags(
    events: DataFrame,
    conditions: list[Column],
    user_col: str = "user_id",
) -> DataFrame:
    """ClickHouse ``retention``: per user, flag r0 = cond0 matched by any
    event; r_i (i>0) = r0 AND cond_i matched. One conditional
    aggregation — no joins, one shuffle on the user key."""
    if not conditions:
        raise ValueError("need at least one condition")
    aggs = [
        F.max(F.when(c, F.lit(1)).otherwise(F.lit(0))).alias(f"m{i}")
        for i, c in enumerate(conditions)
    ]
    per_user = events.groupBy(F.col(user_col).alias("user_id")).agg(*aggs)
    out = [F.col("m0").alias("r0")]
    for i in range(1, len(conditions)):
        out.append(((F.col("m0") == 1) & (F.col(f"m{i}") == 1)).cast("int").alias(f"r{i}"))
    return per_user.select("user_id", *out)
