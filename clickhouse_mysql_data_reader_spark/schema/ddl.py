"""DDL generation: StructType -> Spark SQL CREATE TABLE text/JSON.

Re-expresses the reference's TableSQLBuilder outputs (K8,
tablesqlbuilder.py:15-171, 370-398) for a Spark catalog:

- ``CREATE TABLE ... USING parquet PARTITIONED BY (...)`` replaces
  ``ENGINE = ReplacingMergeTree() PARTITION BY toYYYYMM(date) ORDER BY pk``.
- Partition-key election mirrors ``fetch_primary_date_field``
  (tablesqlbuilder.py:215-227): first DATE/DATETIME column becomes the
  monthly partition key.
- Primary-key election mirrors ``fetch_primary_key_fields``
  (tablesqlbuilder.py:229-240): MySQL Key-flagged columns, falling back
  to the date field (tablesqlbuilder.py:133-136). The PK drives the
  last-write-wins dedup view (operators/dedup.py), which is our
  ReplacingMergeTree-FINAL equivalent.
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

from clickhouse_mysql_data_reader_spark.schema.typemap import ColumnSpec, mysql_description_to_schema


def elect_partition_date_field(columns: list[ColumnSpec]) -> str | None:
    for c in columns:
        base = c.mysql_type.strip().lower().split("(")[0]
        if base in ("date", "datetime", "timestamp"):
            return c.field_name
    return None


def elect_primary_key_fields(columns: list[ColumnSpec]) -> list[str]:
    keys = [c.field_name for c in columns if c.is_key]
    if not keys:
        date_field = elect_partition_date_field(columns)
        if date_field:
            keys = [date_field]
    return keys


def _quote(ident: str) -> str:
    return f"`{ident}`"


def create_table_ddl(
    db: str,
    table: str,
    columns: list[ColumnSpec],
    strict_parity: bool = False,
    using: str = "parquet",
    location: str | None = None,
) -> str:
    """Spark SQL DDL with a derived monthly partition column.

    The reference partitions the destination by ``toYYYYMM(date)``
    (tablesqlbuilder.py:393-398); here the writer materializes a
    ``_yyyymm`` column (sinks/batch.py) and the table partitions on it —
    partition pruning then works for any month-range predicate.
    """
    schema = mysql_description_to_schema(columns, strict_parity)
    col_lines = [f"  {_quote(f.name)} {f.dataType.simpleString().upper()}" for f in schema.fields]
    date_field = elect_partition_date_field(columns)
    if date_field:
        col_lines.append("  `_yyyymm` INT")
    lines = [f"CREATE TABLE IF NOT EXISTS {_quote(db)}.{_quote(table)} ("]
    lines.append(",\n".join(col_lines))
    lines.append(f") USING {using}")
    if date_field:
        lines.append("PARTITIONED BY (`_yyyymm`)")
    if location:
        lines.append(f"LOCATION '{location}'")
    return "\n".join(lines)


def create_database_ddl(db: str) -> str:
    return f"CREATE DATABASE IF NOT EXISTS {_quote(db)}"


def create_table_json(db: str, table: str, columns: list[ColumnSpec], **kw) -> str:
    """JSON template mode (reference main.py:108-126 IPC output)."""
    schema = mysql_description_to_schema(columns, kw.get("strict_parity", False))
    return json.dumps(
        {
            "database": db,
            "table": table,
            "partition_by": elect_partition_date_field(columns),
            "primary_key": elect_primary_key_fields(columns),
            "schema": json.loads(schema.json()),
            "ddl": create_table_ddl(db, table, columns, **kw),
        },
        indent=2,
    )


def schema_to_columns(schema: T.StructType) -> list[ColumnSpec]:
    """Reverse direction: a Spark schema (e.g. from a JDBC read) into
    ColumnSpecs, for round-tripping DDL of already-landed tables."""
    reverse = {
        T.ByteType(): "tinyint",
        T.ShortType(): "smallint",
        T.IntegerType(): "int",
        T.LongType(): "bigint",
        T.FloatType(): "float",
        T.DoubleType(): "double",
        T.DateType(): "date",
        T.TimestampType(): "datetime",
        T.BooleanType(): "bool",
        T.BinaryType(): "blob",
        T.StringType(): "text",
    }
    out = []
    for f in schema.fields:
        if isinstance(f.dataType, T.DecimalType):
            mysql_t = f"decimal({f.dataType.precision},{f.dataType.scale})"
        else:
            mysql_t = reverse.get(f.dataType, "text")
        out.append(ColumnSpec(field_name=f.name, mysql_type=mysql_t, nullable=f.nullable))
    return out
