"""O7 telemetry: observed batch row counts (no extra pass) and the
streaming rows/sec listener."""

from __future__ import annotations

import json

import pytest
import time

from pyspark.sql import types as T

from clickhouse_mysql_data_reader_spark.telemetry import (
    BatchRate,
    RateListener,
    observed_rows,
)


def test_observed_rows_piggybacks_on_action(spark):
    df = spark.range(10_000).toDF("id")
    observed, obs = observed_rows(df)
    observed.write.format("noop").mode("overwrite").save()
    rate = BatchRate().report(obs)
    assert rate["rows"] == 10_000
    assert rate["rows_per_sec"] > 0


def test_stream_rate_listener_counts_rows(spark, tmp_path):
    listener = RateListener()
    spark.streams.addListener(listener)
    try:
        src = tmp_path / "tele_src"
        src.mkdir()
        with open(src / "a.json", "w") as f:
            for i in range(500):
                f.write(json.dumps({"id": i}) + "\n")
        schema = T.StructType([T.StructField("id", T.LongType(), True)])
        q = (
            spark.readStream.schema(schema)
            .json(str(src))
            .writeStream.format("noop")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener events are delivered asynchronously
        deadline = time.time() + 30
        while listener.total_rows < 500 and time.time() < deadline:
            time.sleep(0.5)
        assert listener.total_rows == 500
    finally:
        spark.streams.removeListener(listener)


def test_suggest_shuffle_partitions_scales_and_clamps(spark, tmp_path):
    import pyspark.sql.functions as F

    from clickhouse_mysql_data_reader_spark.util import suggest_shuffle_partitions

    p = str(tmp_path / "t")
    # incompressible pad (hash text) so the parquet files are genuinely
    # multi-MB — a constant pad would compress to nothing and the
    # size-based suggestion would legitimately be 1 at every target
    spark.range(0, 50_000).select(
        "id",
        F.repeat(F.sha2(F.col("id").cast("string"), 256), 8).alias("pad"),
    ).write.parquet(p)
    df = spark.read.parquet(p)
    at_1mb = suggest_shuffle_partitions(df, target_mb=1)
    at_big = suggest_shuffle_partitions(df, target_mb=10_000)
    assert at_1mb > at_big == 1          # more partitions at smaller targets
    # halving the target ~doubles the suggestion (ceil rounding aside)
    assert suggest_shuffle_partitions(df, 2) <= at_1mb <= 2 * suggest_shuffle_partitions(df, 2) + 1
    assert suggest_shuffle_partitions(df, 1, min_partitions=at_1mb + 7) == at_1mb + 7
    assert suggest_shuffle_partitions(df, 1, max_partitions=2) == 2
    with pytest.raises(ValueError, match="target_mb"):
        suggest_shuffle_partitions(df, 0)


def test_rate_listener_reports_watermark_drops_and_state(spark, tmp_path):
    """A watermarked aggregate that receives a too-late row must surface
    it in the listener's rows_dropped_by_watermark — the silent-loss
    channel an operator alerts on — plus the state row count."""
    import pyspark.sql.functions as F

    listener = RateListener()
    spark.streams.addListener(listener)
    try:
        src = tmp_path / "wm_src"
        src.mkdir()
        chk = str(tmp_path / "wm_chk")
        # batch 1: establish event-time up to 10:59 (watermark -> 10:49)
        with open(src / "b1.json", "w") as f:
            for m in (30, 45, 59):
                f.write(json.dumps({"ts": f"2024-01-01 10:{m}:00", "v": 1}) + "\n")
        schema = T.StructType(
            [T.StructField("ts", T.StringType()), T.StructField("v", T.LongType())]
        )

        def run_once():
            q = (
                spark.readStream.schema(schema)
                .json(str(src))
                .withColumn("ts", F.col("ts").cast("timestamp"))
                .withWatermark("ts", "10 minutes")
                .groupBy(F.window("ts", "5 minutes"))
                .agg(F.sum("v").alias("s"))
                .writeStream.format("noop")
                .option("checkpointLocation", chk)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_once()
        # batch 2: one row far behind the committed watermark -> dropped
        with open(src / "b2.json", "w") as f:
            f.write(json.dumps({"ts": "2024-01-01 09:00:00", "v": 1}) + "\n")
            f.write(json.dumps({"ts": "2024-01-01 11:05:00", "v": 1}) + "\n")
        run_once()

        deadline = time.time() + 30
        while (
            sum(r["rows_dropped_by_watermark"] for r in listener.progress) < 1
            and time.time() < deadline
        ):
            time.sleep(0.5)
        assert sum(r["rows_dropped_by_watermark"] for r in listener.progress) == 1
        assert any(r["state_rows"] > 0 for r in listener.progress)
    finally:
        spark.streams.removeListener(listener)
