"""JDBC-destination CDC merge — the reference's live UPDATE/DELETE
apply (reader/mysqlreader.py:312-354) done Spark-first.

The reference replays updates/deletes as per-row ``ALTER TABLE ...
UPDATE/DELETE`` statements against the destination, hardcoded to a
column named ``id`` (its author's "super kludge"). That is O(1 round
trip per row) and unusable at scale. The Spark shape:

1. collapse the CDC batch to one winner per key in binlog order
   (operators.cdc.latest_change_per_key — the only Spark shuffle);
2. bulk-stage the winners into a scratch table through the parallel
   JDBC append writer (all row data flows executor->destination, never
   through the driver);
3. issue a FIXED number of server-side set statements — delete all
   touched keys, insert the surviving winners, drop the stage — inside
   one transaction.

Per batch the driver executes O(1) statements regardless of row count;
the destination's own engine does the keyed work. Statement texts are
pure functions (dialect-parameterized) so they unit-test without a
server, and both the stage write and the statement execution are
injectable seams — the tests drive a real sqlite3 destination through
them; production wires ``write_jdbc`` + a JDBC/DBAPI executor.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_mysql_data_reader_spark.catalog.names import create_full_table_name
from clickhouse_mysql_data_reader_spark.operators.cdc import (
    OP_DELETE,
    latest_change_per_key,
)

StatementExecutor = Callable[[list[str]], None]
StageWriter = Callable[[DataFrame, str], None]


def stage_table_name(table: str, batch_id: int | str = 0) -> str:
    return f"_stg_{table}_{batch_id}"


def merge_statements(
    db: str,
    table: str,
    stage: str,
    key_cols: list[str],
    payload_cols: list[str],
    op_col: str = "op",
    dialect: str = "mysql",
) -> list[str]:
    """The transaction body applying a staged winner-set to the live
    table: delete every touched key, re-insert non-delete winners, drop
    the stage. Pure text — unit-testable without a connection.

    ``dialect='mysql'`` uses the multi-table DELETE JOIN form;
    ``dialect='ansi'`` uses correlated EXISTS (works on sqlite, H2,
    Postgres). Both are set-based: statement count is constant in the
    batch size.
    """
    t = create_full_table_name(db, table)
    s = create_full_table_name(db, stage)
    on = " AND ".join(f"t.`{k}` = s.`{k}`" for k in key_cols)
    cols = ", ".join(f"`{c}`" for c in payload_cols)
    if dialect == "mysql":
        delete = f"DELETE t FROM {t} AS t JOIN {s} AS s ON {on}"
    elif dialect == "ansi":
        delete = (
            f"DELETE FROM {t} AS t WHERE EXISTS "
            f"(SELECT 1 FROM {s} AS s WHERE {on})"
        )
    else:
        raise ValueError(f"unknown dialect: {dialect}")
    insert = (
        f"INSERT INTO {t} ({cols}) SELECT {cols} FROM {s} "
        f"WHERE `{op_col}` <> '{OP_DELETE}'"
    )
    return [delete, insert, f"DROP TABLE {s}"]


def write_jdbc_merge(
    changes: DataFrame,
    db: str,
    table: str,
    key_cols: list[str],
    stage_writer: StageWriter,
    execute: StatementExecutor,
    order_cols: list[str] | None = None,
    op_col: str = "op",
    batch_id: int | str = 0,
    dialect: str = "mysql",
) -> None:
    """Apply a CDC batch (op + order + payload columns) to a live JDBC
    destination table: K6/K7 against a real database, replacing the
    reference's per-row mutation loop (mysqlreader.py:312-354).

    ``stage_writer(df, stage_table)`` bulk-loads the winner rows
    (payload + op) into the scratch table — in production a closure
    over :func:`clickhouse_mysql_data_reader_spark.sinks.batch.write_jdbc`.
    ``execute(statements)`` runs the returned statements in ONE
    transaction; re-delivery of the same batch is idempotent because
    the winner set is deterministic and delete-then-insert converges.
    """
    order_cols = order_cols or ["log_file", "log_pos"]
    payload_cols = [
        c for c in changes.columns
        if c not in {op_col, "schema", "table", *order_cols}
    ]
    winners = latest_change_per_key(changes, key_cols, order_cols).select(
        *payload_cols, op_col
    )
    stage = stage_table_name(table, batch_id)
    stage_writer(winners, stage)
    execute(
        merge_statements(db, table, stage, key_cols, payload_cols, op_col, dialect)
    )


def sqlite_executor(conn) -> StatementExecutor:
    """DBAPI executor running all statements in one transaction —
    the test/reference-free seam (sqlite ships with CPython)."""

    def run(statements: list[str]) -> None:
        cur = conn.cursor()
        try:
            for s in statements:
                cur.execute(s.replace("`", '"'))
            conn.commit()
        except Exception:
            conn.rollback()
            raise

    return run
