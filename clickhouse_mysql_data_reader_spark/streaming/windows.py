"""Streaming window aggregates with watermarks — the [B]-surface
streaming operators (SURVEY §2.4 last rows).

The reference batches by wall clock only (bbpool.py:108-118 flush
timer) and has no event-time semantics at all; these helpers provide
the real thing: tumbling/sliding/session windows over event time with
late-data handling via watermark.

Each helper works on BOTH a streaming and a batch DataFrame (Spark's
unified semantics) — tests exercise the streaming path with
``trigger(availableNow=True)`` + memory sink, and the batch path is
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Non-overlapping event-time windows; late rows beyond the
    watermark are dropped and state is garbage-collected — the property
    that keeps an infinite stream's state finite."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    keys = [F.window(ts_col, width).alias("win")] + [F.col(c) for c in group_cols or []]
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *(group_cols or []),
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Overlapping windows (each event lands in width/slide windows)."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, width, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n_events",
        )
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "2 hours",
    within: str = "1 hour",
    right_prefix: str = "r_",
) -> DataFrame:
    """Watermarked stream-stream INNER join: each left event pairs with
    same-key right events whose timestamp falls in
    ``[left_ts, left_ts + within]`` — the attribution/enrichment join
    (impression -> click, order -> payment) as a true streaming
    operator rather than a batch twin.

    Right-side columns come back prefixed (``r_``) so both sides'
    payloads survive without ambiguity. Both sides get the watermark
    (when streaming): with an equality key AND a bounded event-time
    range, Spark can expire buffered state on both sides —
    watermark + ``within`` bound exactly how long a row waits for a
    match, which is what keeps an infinite join's state finite. Works
    unchanged on batch frames (unified semantics), so the same
    composition is oracle-checkable as a plain range join.
    """
    r = right.select(
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]
    )
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(f"{right_prefix}{right_ts}", watermark)
    rts = F.col(f"{right_prefix}{right_ts}")
    cond = (
        (F.col(key) == F.col(f"{right_prefix}{key}"))
        & (rts >= F.col(left_ts))
        & (rts <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return left.join(r, cond, "inner")


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "10 minutes",
    watermark: str = "30 minutes",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows: a session closes after ``gap`` of inactivity
    per key. Dynamic-length state, merged incrementally by Spark."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key_col,
            "n_events",
        )
    )


def dedup_within_watermark(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state — the streaming twin of
    the batch content-hash dedup (at-least-once sources like the CDC
    pump or a replayed Kafka offset range re-deliver rows; this drops
    the re-deliveries).

    ``dropDuplicates`` on a stream keeps every key seen FOREVER (state
    grows without bound — the thing that kills a month-long query);
    ``dropDuplicatesWithinWatermark`` expires a key's state once the
    watermark passes it, so state is bounded by keys-per-horizon. The
    contract: duplicates arriving within ``watermark`` of the first
    occurrence are dropped, later re-occurrences are treated as new —
    exactly the replay window an at-least-once source needs.

    On a BATCH frame this falls back to plain ``dropDuplicates`` over
    the same keys. The two paths agree only when every duplicate
    arrives within the horizon of its first occurrence (the replay
    case this operator targets); for a key RE-occurring beyond the
    horizon they intentionally diverge — the stream re-admits it (its
    state expired), the batch fallback still collapses it (a batch has
    no arrival order, so "beyond the horizon" is undefined). A
    kappa-style batch backfill of a streaming output therefore
    under-counts re-occurring keys; if those matter, backfill with an
    event-time-bucketed dedup instead.
    """
    if not df.isStreaming:
        return df.dropDuplicates(key_cols)
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)
