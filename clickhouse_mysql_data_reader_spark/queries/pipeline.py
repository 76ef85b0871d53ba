"""Pipeline surface [A] — oracle-checked queries for the operators the
reference implements itself (SURVEY §2.1-2.3, §2.6): scan pruning,
table filtering, type coercion, null policy, fan-in, last-write-wins
dedup, and the unified CDC merge the reference's pump mode lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_mysql_data_reader_spark.operators.cdc import cdc_final_state
from clickhouse_mysql_data_reader_spark.operators.dedup import latest_wins_view
from clickhouse_mysql_data_reader_spark.queries.registry import register
from clickhouse_mysql_data_reader_spark.sinks.batch import fan_in, with_month_partition
from clickhouse_mysql_data_reader_spark.sources.parquet import load_table
from clickhouse_mysql_data_reader_spark.transforms.row_ops import (
    apply_defaults,
    empty_string_to_null,
    filter_tables,
)


@register(
    "scan_prune_filter",
    """
    SELECT l_orderkey, l_extendedprice
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-06-01 00:00:00' AND l_discount > 0.08
    """,
    doc="S2/T1/T2 — projection + predicate reaching the parquet scan. "
    "The plan must show PushedFilters and a 4-column ReadSchema "
    "(verified in tests/test_plans.py); reading all columns for a "
    "2-column projection would be wrong at any scale.",
)
def scan_prune_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") < F.lit("1996-06-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") > 0.08)
    ).select("l_orderkey", "l_extendedprice")


@register(
    "table_name_filter",
    """
    SELECT event_type, count(*) AS n_events
    FROM events
    WHERE event_type IN ('click', 'view') OR event_type LIKE 'sig%'
    GROUP BY event_type
    """,
    doc="T3 — listened-tables routing (exact list OR prefix), one "
    "pushdown-able predicate (mysqlreader.py:155-174 semantics).",
)
def table_name_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        filter_tables(ev, "event_type", tables=["click", "view"], prefixes=["sig"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "type_coercion_parity",
    """
    SELECT o_orderkey,
           CAST(CAST(o_orderkey AS DECIMAL(20,0)) AS VARCHAR) AS okey_u64,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str,
           CAST(o_orderdate AS DATE) AS odate,
           CAST(year(o_orderdate) AS INT) AS o_year_u16
    FROM orders
    WHERE o_orderkey % 97 = 0
    """,
    doc="T4/§1.2 — the type map in action: unsigned-BIGINT widening to "
    "DECIMAL(20,0) (UInt64 max overflows long), strict-parity "
    "DECIMAL-as-string (tablesqlbuilder.py:293-294), DATETIME->DATE, "
    "YEAR->int.",
)
def type_coercion_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    return orders.select(
        "o_orderkey",
        # DECIMAL(20,0) is the UInt64-widening type; surfaced as its
        # digit string so the compare is representation-stable
        F.col("o_orderkey").cast("decimal(20,0)").cast("string").alias("okey_u64"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("price_str"),
        F.col("o_orderdate").cast("date").alias("odate"),
        F.year("o_orderdate").cast("int").alias("o_year_u16"),
    )


@register(
    "null_policy",
    """
    SELECT event_id,
           coalesce(nullif(props, ''), '{}') AS props_defaulted,
           CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS et_nullable,
           coalesce(CASE WHEN event_type = 'error' THEN NULL ELSE event_type END,
                    'unknown') AS et_defaulted
    FROM events
    WHERE event_id < 2000
    """,
    doc="T5/T6 — empty-string->NULL normalization + per-column NULL "
    "defaulting (csvreadconverter.py / csvwriteconverter.py semantics) "
    "as whole-column expressions.",
)
def null_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    df = ev.withColumn("props_defaulted", F.col("props"))
    df = empty_string_to_null(df, ["props_defaulted"])
    df = df.withColumn(
        "et_nullable",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("event_type")),
    ).withColumn("et_defaulted", F.col("et_nullable"))
    df = apply_defaults(df, {"props_defaulted": "{}", "et_defaulted": "unknown"})
    return df.select("event_id", "props_defaulted", "et_nullable", "et_defaulted")


@register(
    "rename_fanin_union",
    """
    SELECT _src_table,
           count(*) AS n_rows,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
    FROM (
      SELECT 'orders_1995' AS _src_table, o_totalprice FROM orders
      WHERE year(o_orderdate) = 1995
      UNION ALL
      SELECT 'orders_1996' AS _src_table, o_totalprice FROM orders
      WHERE year(o_orderdate) = 1996
    )
    GROUP BY _src_table
    """,
    doc="T9 — many-sources fan-in to one destination with source tagging "
    "(the log_* -> logunified flow, docs/manual.md:531-553).",
)
def rename_fanin_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_totalprice")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_totalprice")
    unified = fan_in(spark, [y95, y96], ["orders_1995", "orders_1996"])
    return unified.groupBy("_src_table").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("sum_price"),
    )


@register(
    "partition_month_key",
    """
    SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT) AS _yyyymm,
           count(*) AS n_orders
    FROM orders
    GROUP BY 1
    """,
    doc="K8 partition layout — the toYYYYMM(date) partition key the "
    "reference puts in every CREATE TABLE (tablesqlbuilder.py:393-398), "
    "materialized by the write path for partition pruning.",
)
def partition_month_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        with_month_partition(orders, "o_orderdate")
        .groupBy("_yyyymm")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "dedup_latest_wins",
    """
    SELECT user_id, event_type, event_id AS latest_event_id,
           value AS latest_value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
    doc="ReplacingMergeTree FINAL semantics — last-write-wins per key "
    "(the destination contract the reference sets up, "
    "tablesqlbuilder.py:393), as a reusable dedup view.",
)
def dedup_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return latest_wins_view(ev, ["user_id", "event_type"], ["ts", "event_id"]).select(
        "user_id",
        "event_type",
        F.col("event_id").alias("latest_event_id"),
        F.col("value").alias("latest_value"),
    )


@register(
    "cdc_apply_final_state",
    """
    SELECT user_id, event_id AS last_event_id,
           value AS last_value
    FROM (
      SELECT user_id, event_id, value,
             CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1 AND op <> 'delete'
    """,
    doc="K6/K7 — unified CDC merge: events reinterpreted as a change log "
    "keyed on user_id ordered by (ts, event_id); final state keeps the "
    "latest upsert, drops keys whose last op is a delete. Fixes the "
    "reference's per-row ALTER kludge (mysqlreader.py:312-354) with one "
    "declarative window + filter.",
)
def cdc_apply_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    changes = ev.select(
        "user_id",
        "event_id",
        "value",
        "ts",
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
    )
    final = cdc_final_state(
        changes,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        payload_cols=["user_id", "event_id", "value"],
    )
    return final.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
    )
