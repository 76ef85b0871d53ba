"""MySQL type-string -> Spark DataType mapping.

Semantic parity with the reference's string-matching map
(``TableSQLBuilder.map_type``, tablesqlbuilder.py:264-351, nullable
wrapper :353-368; documented table docs/manual.md:775-826), re-derived
for Spark's type system per SURVEY.md §1.2:

- unsigned ints widen one tier (Spark has no unsigned types);
  unsigned BIGINT / SERIAL -> DecimalType(20,0) because UInt64 max
  (18446744073709551615) overflows a signed 64-bit long.
- DECIMAL maps to real DecimalType(p,s) (improvement over the
  reference, which degrades it to String); ``strict_parity=True``
  reproduces the reference's String behavior exactly.
- TIME / BIT / SET keep the reference's stringly representation in
  strict-parity mode; improved mode uses richer types.

Pure function, no Spark session required — unit-tested against the
FIXTURES.md boundary rows.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T


@dataclass(frozen=True)
class ColumnSpec:
    """One column of a MySQL table description (mirrors the dict the
    reference builds in tablesqlbuilder.py:175-186)."""

    field_name: str
    mysql_type: str  # e.g. "int(11) unsigned", "decimal(3,2)", "varchar(255)"
    nullable: bool = True
    is_key: bool = False
    default: str | None = None
    extra: str = ""
    spark_type: T.DataType = field(default_factory=T.StringType, compare=False)


_DECIMAL_RE = re.compile(r"(?:decimal|dec|fixed|numeric)\s*(?:\((\d+)\s*(?:,\s*(\d+))?\))?", re.I)


def map_type(mysql_type: str, strict_parity: bool = False) -> T.DataType:
    """Map a MySQL column type string to a Spark DataType."""
    t = mysql_type.strip().lower()
    unsigned = "unsigned" in t
    # MySQL < 8.0.19 prints `bigint(20) unsigned`, newer prints
    # `bigint unsigned` — strip display width AND attribute words so
    # both forms resolve to the same base type.
    base = t.split("(")[0].replace("unsigned", "").replace("zerofill", "").strip()

    if base == "bit":
        return T.StringType() if strict_parity else T.BinaryType()
    if base in ("bool", "boolean"):
        # reference: UInt8 (tablesqlbuilder.py:281-282)
        return T.ShortType() if strict_parity else T.BooleanType()
    if base == "tinyint":
        return T.ShortType() if unsigned else T.ByteType()
    if base == "smallint":
        return T.IntegerType() if unsigned else T.ShortType()
    if base in ("mediumint", "int", "integer"):
        return T.LongType() if unsigned else T.IntegerType()
    if base == "bigint":
        return T.DecimalType(20, 0) if unsigned else T.LongType()
    if base == "serial":  # alias for BIGINT UNSIGNED AUTO_INCREMENT
        return T.DecimalType(20, 0)
    if base in ("decimal", "dec", "fixed", "numeric"):
        if strict_parity:
            # reference degrades DECIMAL to String (tablesqlbuilder.py:293-294)
            return T.StringType()
        m = _DECIMAL_RE.match(t)
        prec = int(m.group(1)) if m and m.group(1) else 10
        scale = int(m.group(2)) if m and m.group(2) else 0
        return T.DecimalType(min(prec, 38), min(scale, 38))
    if base == "float":
        return T.FloatType()
    if base in ("double", "real"):
        return T.DoubleType()
    if base == "date":
        return T.DateType()
    if base in ("datetime", "timestamp"):
        return T.TimestampType()
    if base == "time":
        # no sub-day-interval column type with MySQL TIME's +/-838h range
        return T.StringType()
    if base == "year":
        return T.IntegerType()
    if base in ("char", "varchar", "tinytext", "text", "mediumtext", "longtext", "enum"):
        return T.StringType()
    if base in ("binary", "varbinary", "tinyblob", "blob", "mediumblob", "longblob"):
        return T.StringType() if strict_parity else T.BinaryType()
    if base == "set":
        return T.StringType() if strict_parity else T.ArrayType(T.StringType())
    if base == "json":
        # JSON carried as text; analytics parse with from_json/get_json_object.
        # (The reference's CDC path destroys JSON values -> '0',
        # mysqlreader.py:253-262 — deliberately NOT reproduced.)
        return T.StringType()
    # unknown types fall back to String, like the reference's default branch
    return T.StringType()


def column_to_struct_field(col: ColumnSpec, strict_parity: bool = False) -> T.StructField:
    """Nullable handling mirrors map_type_nullable + the reference's rule
    that primary-key/partition columns are forced non-nullable
    (tablesqlbuilder.py:133-142, 353-368)."""
    nullable = col.nullable and not col.is_key
    return T.StructField(col.field_name, map_type(col.mysql_type, strict_parity), nullable)


def mysql_description_to_schema(
    columns: list[ColumnSpec], strict_parity: bool = False
) -> T.StructType:
    return T.StructType([column_to_struct_field(c, strict_parity) for c in columns])
