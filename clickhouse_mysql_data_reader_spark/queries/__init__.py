"""Query registry: every operator from SURVEY.md §2 declared as a
(Spark builder, DuckDB oracle SQL) pair consumed by ``__spark_entry__``."""

from __future__ import annotations

from clickhouse_mysql_data_reader_spark.queries.registry import (  # noqa: F401
    QUERIES,
    QueryDef,
    oracle_sql_map,
    query_map,
    register,
)
