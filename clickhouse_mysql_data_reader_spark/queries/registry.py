"""Registry machinery for oracle-checked queries.

Each entry couples a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with an equivalent ANSI-SQL string DuckDB can execute over the same parquet
tables. The driver hash-compares both sides (order-insensitive, columns
sorted by name), so builders alias every computed column to the exact name
used in the oracle and keep numeric results hash-stable:

- exact-arithmetic ``DECIMAL`` casts for sums of money-like columns,
- ``round(.., N)`` for ratios/averages computed in floating point,
- identical deterministic tie-breaks wherever ``LIMIT``/top-k appears.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    build: Builder
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    doc: str = ""


QUERIES: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[Builder], Builder]:
    def wrap(fn: Builder) -> Builder:
        QUERIES[name] = QueryDef(name=name, build=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def query_map() -> dict[str, Builder]:
    return {name: q.build for name, q in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
