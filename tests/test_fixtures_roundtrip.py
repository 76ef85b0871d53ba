"""FIXTURES.md type-domain round-trips — the reference's own correctness
methodology (docs/manual.md:947-1142: every MySQL scalar type exercised
with MIN- and MAX-boundary rows), applied to OUR map: MySQL type string
-> Spark type (§1.2) -> parquet write -> read back bit-exact."""

from __future__ import annotations

from datetime import date, datetime
from decimal import Decimal

from pyspark.sql import types as T

from clickhouse_mysql_data_reader_spark.schema.typemap import (
    ColumnSpec,
    map_type,
    mysql_description_to_schema,
)

# F1 `datatypes`: (column, mysql type, min boundary, max boundary)
F1 = [
    ("tinyint_1", "tinyint", -128, 127),
    ("u_tinyint_1", "tinyint unsigned", 0, 255),
    ("smallint_1", "smallint", -32768, 32767),
    ("u_smallint_1", "smallint unsigned", 0, 65535),
    ("mediumint_1", "mediumint", -8388608, 8388607),
    ("u_mediumint_1", "mediumint unsigned", 0, 16777215),
    ("int_1", "int", -2147483648, 2147483647),
    ("u_int_1", "int unsigned", 0, 4294967295),
    ("bigint_1", "bigint", -9223372036854775808, 9223372036854775807),
    (
        "u_bigint_1",
        "bigint unsigned",
        Decimal(0),
        Decimal("18446744073709551615"),
    ),
    ("serial_1", "serial", Decimal(0), Decimal("18446744073709551615")),
    ("decimal_1", "decimal(3,2)", Decimal("-9.99"), Decimal("9.99")),
    ("float_1", "float", -3.402823466e38, 3.402823466e38),
    ("double_1", "double", -1.7976931348623157e308, 1.7976931348623157e308),
    ("date_1", "date", date(1970, 1, 1), date(2149, 6, 1)),
    (
        "datetime_1",
        "datetime",
        datetime(1970, 1, 1, 0, 0, 0),
        datetime(2106, 2, 1, 23, 59, 59),
    ),
    (
        "timestamp_1",
        "timestamp",
        datetime(1970, 1, 1, 0, 0, 1),
        datetime(2038, 1, 19, 3, 14, 7),
    ),
    ("time_1", "time", "-838:59:59", "838:59:59"),
    ("year_1", "year", 1901, 2155),
    ("char_1", "char(255)", "", "a" * 255),
    ("varchar_1", "varchar(1)", "", "a"),
    ("text_1", "longtext", "", "a"),
    ("blob_1", "longblob", b"", b"\xff" * 255),
    ("json_1", "json", "{}", '{"a":1, "b":2, "c":3}'),
    ("enum_1", "enum('a','b','c','d','e','f')", None, "a"),
    ("set_1", "set('a','b','c','d','e','f')", [], ["a", "b", "c"]),
]


def _fixture_frame(spark):
    desc = [ColumnSpec(name, mtype, nullable=True) for name, mtype, _, _ in F1]
    schema = mysql_description_to_schema(desc)
    min_row = tuple(mn for _, _, mn, _ in F1)
    max_row = tuple(mx for _, _, _, mx in F1)
    null_row = tuple(None for _ in F1)
    return spark.createDataFrame([min_row, max_row, null_row], schema), schema


def test_boundary_rows_roundtrip_parquet(spark, tmp_path):
    df, schema = _fixture_frame(spark)
    path = str(tmp_path / "datatypes")
    df.write.parquet(path)
    back = spark.read.schema(schema).parquet(path)
    assert back.schema == schema
    got = sorted(
        ([None if v is None else v for v in row] for row in back.collect()),
        key=repr,
    )
    want = sorted(([None if v is None else v for v in row] for row in df.collect()), key=repr)
    assert got == want


def test_uint64_and_serial_survive_exactly(spark):
    df, _ = _fixture_frame(spark)
    vals = {str(r["u_bigint_1"]) for r in df.collect() if r["u_bigint_1"] is not None}
    assert "18446744073709551615" in vals  # would overflow LongType


def test_strict_parity_mode_degrades_like_reference():
    # DECIMAL -> String (tablesqlbuilder.py:293-294), SET -> String,
    # BINARY family -> String (chwriteconverter.py:19,39)
    assert map_type("decimal(3,2)", strict_parity=True) == T.StringType()
    assert map_type("set('a','b')", strict_parity=True) == T.StringType()
    assert map_type("longblob", strict_parity=True) == T.StringType()
    # improved mode keeps real types
    assert map_type("decimal(3,2)") == T.DecimalType(3, 2)
    assert map_type("set('a','b')") == T.ArrayType(T.StringType())
    assert map_type("longblob") == T.BinaryType()


def test_f2_special_tables_map(spark):
    # enum/set/json/long-varchar/long-varbinary single-column tables
    specs = {
        "enum_datatypes": ColumnSpec("enum_1", "enum('a','b','c','d','e','f')", True),
        "set_datatypes": ColumnSpec("set_1", "set('a','b','c','d','e','f')", True),
        "json_datatypes": ColumnSpec("json_1", "json", True),
        "long_varchar_datatypes": ColumnSpec("varchar_2", "varchar(65532)", True),
        "long_varbinary_datatypes": ColumnSpec("varbinary_2", "varbinary(65532)", True),
    }
    got = {k: map_type(v.mysql_type) for k, v in specs.items()}
    assert got == {
        "enum_datatypes": T.StringType(),
        "set_datatypes": T.ArrayType(T.StringType()),
        "json_datatypes": T.StringType(),
        "long_varchar_datatypes": T.StringType(),
        "long_varbinary_datatypes": T.BinaryType(),
    }
