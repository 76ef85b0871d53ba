"""O7 telemetry: observed batch row counts (no extra pass) and the
streaming rows/sec listener."""

from __future__ import annotations

import json
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
