"""Row-level transform surface (SURVEY §2.3), columnar-style.

The reference applies these per-row in Python loops
(converter/chwriteconverter.py, csvwriteconverter.py, csvreadconverter.py);
here each is a whole-column Catalyst expression — vectorized, codegen'd,
and pushdown-friendly. The custom-converter plug-in (T8,
util.py:40-48 class_from_file) becomes a registry of
``DataFrame -> DataFrame`` callables.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

Transform = Callable[[DataFrame], DataFrame]


def skip_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """T2 — column skip-list (tablesqlbuilder.py:199-201,
    tablemigrator.py:226-237). ``drop`` prunes all the way into the scan."""
    return df.drop(*[c for c in cols if c in df.columns])


def apply_defaults(df: DataFrame, defaults: dict[str, object]) -> DataFrame:
    """T5 — NULL -> configured default (csvwriteconverter.py:19-33)."""
    return df.fillna({k: v for k, v in defaults.items() if k in df.columns})


def empty_string_to_null(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """T6 — '' -> NULL on ingest (csvreadconverter.py:10-22)."""
    targets = cols or [f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]
    for c in targets:
        df = df.withColumn(c, F.nullif(F.col(c), F.lit("")))
    return df


def cast_to_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """T4 — coerce columns to the §1.2-mapped types. The reference does
    per-value Python casts at write time (chwriteconverter.py:17-72);
    here it is one projection the optimizer folds into the scan."""
    by_name = {f.name: f.dataType for f in schema.fields}
    return df.select(
        *[
            F.col(c).cast(by_name[c]).alias(c) if c in by_name else F.col(c)
            for c in df.columns
        ]
    )


def filter_tables(df: DataFrame, table_col: str, tables: list[str] | None = None,
                  prefixes: list[str] | None = None) -> DataFrame:
    """T3 — keep events for listened tables (mysqlreader.py:155-174):
    exact list OR prefix match, as one pushdown-able predicate."""
    cond = F.lit(False)
    if tables:
        cond = cond | F.col(table_col).isin(tables)
    for p in prefixes or []:
        cond = cond | F.col(table_col).startswith(p)
    return df.filter(cond)


class TransformRegistry:
    """T8 — user-pluggable transform chain, the Spark-shaped version of
    the reference's runtime-loaded converter class (config.py:339-349).
    Prefer native expressions in registered callables; pandas UDFs only
    when unavoidable."""

    def __init__(self) -> None:
        self._transforms: dict[str, Transform] = {}

    def register(self, name: str, fn: Transform) -> None:
        self._transforms[name] = fn

    def apply(self, df: DataFrame, names: list[str] | None = None) -> DataFrame:
        for name in names if names is not None else list(self._transforms):
            df = self._transforms[name](df)
        return df


def parse_date_column(df: DataFrame, col: str, fmt: str = "yyyy-MM-dd") -> DataFrame:
    """The reference's example custom converter parses a `day` string to
    date via strptime (clickhouse_mysql_converter/chwritedataconverter.py:7-15);
    native equivalent."""
    return df.withColumn(col, F.to_date(F.col(col), fmt))
