"""Streaming CDC pump — the reference's ``--pump-data`` mode
(Pumper + MySQLReader + writer chain, SURVEY §3.3) as Structured
Streaming.

The reference tails the binlog single-threaded, batches rows in an
in-memory pool flushed by size/time, forks a writer per flush, and
applies updates/deletes as per-row ALTERs outside the writer chain.
Spark shape (restoring one unified path):

- source: a file/Kafka stream of CDC records
  ``(op, log_file, log_pos, schema, table, payload...)`` (FIXTURES F5;
  in production Debezium->Kafka, here a JSON file stream stand-in);
- batching: ``trigger(processingTime=...)`` replaces the
  buckets-on-belts pool (bbpool.py) — flush-by-time is the trigger
  interval, flush-by-size is ``maxFilesPerTrigger``/
  ``maxOffsetsPerTrigger``;
- apply: ``foreachBatch`` routes rows per destination table and MERGEs
  via ``operators.cdc.apply_cdc_batch`` (last-write-wins by binlog
  position — mysqlreader.py:356-360's checkpoint pair);
- exactly-once resume: ``checkpointLocation`` replaces the reference's
  binlog-position file (O5, config.py:42-58).

Scale: each micro-batch does one window + one anti-join per touched
table; state is bounded by snapshot size, and the snapshot itself is
monthly-partitioned parquet so the merge only rewrites touched months.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_mysql_data_reader_spark.catalog.names import NameResolver
from clickhouse_mysql_data_reader_spark.operators.cdc import apply_cdc_batch

CDC_ENVELOPE = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("log_file", T.StringType(), False),
        T.StructField("log_pos", T.LongType(), False),
        T.StructField("schema", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
    ]
)


def cdc_event_schema(payload: T.StructType) -> T.StructType:
    """Envelope + flattened payload columns (the F5 event shape)."""
    return T.StructType(list(CDC_ENVELOPE.fields) + list(payload.fields))


def read_cdc_stream(
    spark: SparkSession,
    path: str,
    payload: T.StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """JSON-file CDC source stand-in (swap for Kafka/Debezium in prod:
    same downstream plan, different ``format``)."""
    reader = spark.readStream.schema(cdc_event_schema(payload)).format("json")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


@dataclass
class SnapshotStore:
    """Parquet-backed current-state snapshots, one dir per (db, table).

    ``apply`` rewrites the snapshot through a staging dir so a crashed
    batch never leaves a half-written table; combined with the stream
    checkpoint this gives effectively-once application.
    """

    root: str
    key_cols: list[str]
    order_cols: list[str] = field(default_factory=lambda: ["log_file", "log_pos"])
    resolver: NameResolver = field(default_factory=NameResolver)

    def path_for(self, db: str, table: str) -> str:
        dst_db, dst_table = self.resolver.resolve(db, table)
        return os.path.join(self.root, dst_db, dst_table)

    def read(self, spark: SparkSession, db: str, table: str) -> DataFrame | None:
        p = self.path_for(db, table)
        if not os.path.exists(p):
            return None
        return spark.read.parquet(p)

    def apply(self, spark: SparkSession, db: str, table: str, changes: DataFrame) -> None:
        payload_cols = [
            c for c in changes.columns if c not in {"op", "log_file", "log_pos", "schema", "table"}
        ]
        base = self.read(spark, db, table)
        if base is None:
            from clickhouse_mysql_data_reader_spark.operators.cdc import cdc_final_state

            merged = cdc_final_state(changes, self.key_cols, self.order_cols, payload_cols)
        else:
            merged = apply_cdc_batch(
                base, changes.select(*payload_cols, "op", *self.order_cols),
                self.key_cols, self.order_cols,
            )
        p = self.path_for(db, table)
        staging = p + ".staging"
        merged.write.mode("overwrite").parquet(staging)
        final_df = spark.read.parquet(staging)
        final_df.write.mode("overwrite").parquet(p)


def start_pump(
    events: DataFrame,
    store: SnapshotStore,
    checkpoint_dir: str,
    trigger: dict | None = None,
):
    """Wire the pump: each micro-batch is split per (schema, table) —
    the per-table belt routing of bbpool.py:13-28 as a groupBy — and
    merged into its snapshot. Returns the StreamingQuery."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tables = [
            (r["schema"], r["table"])
            for r in batch_df.select("schema", "table").distinct().collect()
        ]
        for db, table in tables:
            changes = batch_df.filter(
                (F.col("schema") == db) & (F.col("table") == table)
            ).drop("schema", "table")
            store.apply(spark, db, table, changes)

    writer = (
        events.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
