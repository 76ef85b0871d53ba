"""JDBC batch source — the Spark-native form of the reference's bulk
migration scan (S2: tablemigrator.py:180-224), catalog discovery (S4:
tableprocessor.py:63-144), and schema introspection (S5:
tablesqlbuilder.py:173-213).

The reference streams `SELECT <pruned cols> FROM db.table [WHERE ...]`
through a server-side cursor in 100k-row chunks, single-threaded. Spark
replaces the chunk loop with a *partitioned* JDBC scan: N executors
each issue a bounded-range slice of the same query concurrently, and
`fetchsize` plays the server-side-cursor role within each slice. At
100 TB the parallel scan — not the chunk size — is the throughput lever.

Pure plan-building (SQL/option construction, table matching, cast
layer) is separated from the connected read so it is unit-testable
without a MySQL server (none exists in this container); `read_table`
composes the pieces into `spark.read.jdbc`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from clickhouse_mysql_data_reader_spark.catalog.names import (
    create_full_table_name,
    table_matches_prefix,
)
from clickhouse_mysql_data_reader_spark.schema.typemap import (
    ColumnSpec,
    mysql_description_to_schema,
)
from clickhouse_mysql_data_reader_spark.transforms.row_ops import cast_to_schema

DEFAULT_FETCH_SIZE = 100_000  # the reference's pool_max_rows_num (tablemigrator.py:21)


@dataclass(frozen=True)
class JdbcSourceConfig:
    """Connection settings (the reference's connection_settings dict,
    config.py) plus Spark-side read tuning."""

    url: str  # e.g. jdbc:mysql://host:3306
    user: str = ""
    password: str = ""
    driver: str = "com.mysql.cj.jdbc.Driver"
    fetch_size: int = DEFAULT_FETCH_SIZE
    extra_options: dict[str, str] = field(default_factory=dict)

    def base_options(self) -> dict[str, str]:
        opts = {
            "url": self.url,
            "user": self.user,
            "password": self.password,
            "driver": self.driver,
            # server-side-cursor equivalent: stream each slice instead
            # of materializing it (SSDictCursor, tablemigrator.py:67)
            "fetchsize": str(self.fetch_size),
        }
        opts.update(self.extra_options)
        return opts


def build_select(
    db: str,
    table: str,
    columns: list[str] | None = None,
    skip_columns: list[str] | None = None,
    where: str | None = None,
) -> str:
    """The migration SELECT, mirroring tablemigrator.py:190-194: pruned
    column list (column_skip, tablemigrator.py:226-237) + optional WHERE
    pushed to the source. Passed to Spark as ``option("query", ...)`` so
    pruning/filtering happen server-side, before any network transfer."""
    skip = set(skip_columns or [])
    cols = ",".join(f"`{c}`" for c in columns if c not in skip) if columns else "*"
    sql = f"SELECT {cols} FROM {create_full_table_name(db, table)}"
    if where:
        sql += f" WHERE {where}"
    return sql


def partition_options(
    partition_column: str | None,
    lower_bound: int | None,
    upper_bound: int | None,
    num_partitions: int,
) -> dict[str, str]:
    """Parallel-scan slicing. With a numeric key (the elected PK field),
    Spark issues num_partitions range-bounded queries concurrently —
    the scale-out replacement for the reference's single SSDictCursor."""
    if partition_column is None:
        return {"numPartitions": str(num_partitions)}
    if lower_bound is None or upper_bound is None:
        raise ValueError("partition_column requires lower_bound and upper_bound")
    return {
        "partitionColumn": partition_column,
        "lowerBound": str(lower_bound),
        "upperBound": str(upper_bound),
        "numPartitions": str(num_partitions),
    }


def match_tables(
    all_tables: dict[str, list[str]],
    dbs: list[str] | None = None,
    tables: list[str] | None = None,
    prefixes: list[str] | None = None,
) -> dict[str, list[str]]:
    """S4 discovery filter (tableprocessor.py:63-144): expand db-only
    specs to all their tables; keep explicit tables; apply `log_*`-style
    prefix matching (tables_match, tableprocessor.py:132-144)."""
    out: dict[str, list[str]] = {}
    for db, tbls in all_tables.items():
        if dbs and db not in dbs:
            continue
        keep = []
        for t in tbls:
            if tables and t in tables:
                keep.append(t)
            elif prefixes and table_matches_prefix(t, prefixes):
                keep.append(t)
            elif not tables and not prefixes:
                keep.append(t)
        if keep:
            out[db] = sorted(keep)
    return out


def scan_options(
    cfg: JdbcSourceConfig,
    db: str,
    table: str,
    columns: list[str] | None = None,
    skip_columns: list[str] | None = None,
    where: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
) -> dict[str, str]:
    """The complete JDBC reader option set for one table scan (pure —
    unit-testable without a server).

    Spark forbids ``query`` together with ``partitionColumn``; the
    partitioned path therefore ships the pruned/filtered SELECT as a
    ``dbtable`` subquery (same server-side pushdown, legal with range
    slicing)."""
    sql = build_select(db, table, columns, skip_columns, where)
    opts = cfg.base_options()
    if partition_column is not None:
        opts["dbtable"] = f"({sql}) AS __scan"
    else:
        opts["query"] = sql
    opts.update(
        partition_options(partition_column, lower_bound, upper_bound, num_partitions)
    )
    return opts


def read_table(
    spark: SparkSession,
    cfg: JdbcSourceConfig,
    db: str,
    table: str,
    columns: list[str] | None = None,
    skip_columns: list[str] | None = None,
    where: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    description: list[ColumnSpec] | None = None,
) -> DataFrame:
    """S2 — partitioned JDBC scan with server-side pruning/filtering.

    ``description`` (from `DESC table`, S5) applies the §1.2 MySQL→Spark
    type map as a post-read cast layer: PySpark cannot register a custom
    JdbcDialect, so unsigned widening (UInt64 → DECIMAL(20,0)) happens
    here instead (SURVEY.md §4 custom-work item 2).
    """
    reader = spark.read.format("jdbc")
    for k, v in scan_options(
        cfg,
        db,
        table,
        columns,
        skip_columns,
        where,
        partition_column,
        lower_bound,
        upper_bound,
        num_partitions,
    ).items():
        reader = reader.option(k, v)
    df = reader.load()
    if description is not None:
        df = cast_to_schema(df, mysql_description_to_schema(description))
    return df


def discover_tables(
    spark: SparkSession,
    cfg: JdbcSourceConfig,
    dbs: list[str],
    tables: list[str] | None = None,
    prefixes: list[str] | None = None,
) -> dict[str, list[str]]:
    """S4 — SHOW TABLES per db via information_schema (one tiny JDBC
    query; the result is driver-side metadata, never row data)."""
    db_list = ",".join(f"'{d}'" for d in dbs)
    reader = spark.read.format("jdbc")
    for k, v in cfg.base_options().items():
        reader = reader.option(k, v)
    meta = reader.option(
        "query",
        "SELECT table_schema, table_name FROM information_schema.tables "
        f"WHERE table_schema IN ({db_list})",
    ).load()
    found: dict[str, list[str]] = {}
    for row in meta.collect():
        found.setdefault(row[0], []).append(row[1])
    return match_tables(found, dbs=dbs, tables=tables, prefixes=prefixes)
