"""JDBC-destination CDC merge (VERDICT r2 'What's missing' #1):
write_jdbc_merge applies insert/update/delete batches to a live SQL
destination with the same final-state semantics as apply_cdc_batch.

Driven end-to-end against sqlite3 (the container has no JDBC driver
jars) through the stage-writer/executor seams; the statement texts are
additionally checked as pure functions for the mysql dialect.
"""

from __future__ import annotations

import sqlite3

import pytest

from clickhouse_mysql_data_reader_spark.operators.cdc import apply_cdc_batch
from clickhouse_mysql_data_reader_spark.sinks.merge import (
    merge_statements,
    sqlite_executor,
    stage_table_name,
    write_jdbc_merge,
)


@pytest.fixture
def dest():
    conn = sqlite3.connect(":memory:")
    conn.execute('CREATE TABLE "main"."users" (id INTEGER, day TEXT, str TEXT)')
    conn.executemany(
        'INSERT INTO "main"."users" VALUES (?, ?, ?)',
        [(1, "2018-01-01", "one"), (2, "2018-01-01", "two")],
    )
    conn.commit()
    yield conn
    conn.close()


def _sqlite_stage_writer(conn):
    """Test stand-in for the production write_jdbc closure: lands the
    winner frame into the scratch table via executemany."""

    def write(df, stage):
        cols = df.columns
        conn.execute(
            f'CREATE TABLE "main"."{stage}" ({", ".join(f"{c} TEXT" for c in cols)})'
        )
        rows = [tuple(r[c] for c in cols) for r in df.collect()]
        conn.executemany(
            f'INSERT INTO "main"."{stage}" VALUES ({", ".join("?" * len(cols))})', rows
        )
        conn.commit()

    return write


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "op string, log_file string, log_pos long, id long, day string, str string"
    )


CHANGES = [
    ("insert", "f1", 10, 3, "2018-01-02", "three"),
    ("update", "f1", 11, 1, "2018-01-01", "one-v2"),
    ("update", "f1", 12, 1, "2018-01-01", "one-v3"),  # later wins
    ("delete", "f1", 13, 2, "2018-01-01", "two"),
]


def _apply(spark, conn, rows, batch_id=0):
    write_jdbc_merge(
        _changes(spark, rows),
        "main",
        "users",
        key_cols=["id"],
        stage_writer=_sqlite_stage_writer(conn),
        execute=sqlite_executor(conn),
        batch_id=batch_id,
        dialect="ansi",
    )


def _table_state(conn):
    return {
        int(r[0]): (r[1], r[2])
        for r in conn.execute('SELECT id, day, str FROM "main"."users"')
    }


def test_merge_matches_spark_cdc_semantics(spark, dest):
    _apply(spark, dest, CHANGES)
    base = spark.createDataFrame(
        [(1, "2018-01-01", "one"), (2, "2018-01-01", "two")],
        "id long, day string, str string",
    )
    expected = {
        r["id"]: (r["day"], r["str"])
        for r in apply_cdc_batch(
            base, _changes(spark, CHANGES), ["id"], ["log_file", "log_pos"]
        ).collect()
    }
    assert _table_state(dest) == expected == {
        1: ("2018-01-01", "one-v3"),
        3: ("2018-01-02", "three"),
    }


def test_merge_redelivery_idempotent(spark, dest):
    _apply(spark, dest, CHANGES, batch_id=0)
    once = _table_state(dest)
    _apply(spark, dest, CHANGES, batch_id=1)
    assert _table_state(dest) == once


def test_stage_dropped_and_constant_statement_count(spark, dest):
    _apply(spark, dest, CHANGES)
    stages = dest.execute(
        "SELECT name FROM sqlite_master WHERE name LIKE '_stg_%'"
    ).fetchall()
    assert stages == []  # transaction dropped the scratch table
    stmts = merge_statements("db", "t", stage_table_name("t"), ["id"], ["id", "v"])
    assert len(stmts) == 3  # O(1) statements regardless of batch size


def test_failed_transaction_rolls_back(spark, dest):
    """A failing statement mid-transaction leaves the destination
    untouched (the executor's single-transaction contract)."""
    pre = _table_state(dest)

    def broken_stage_writer(df, stage):
        pass  # stage table never created -> DELETE statement fails

    with pytest.raises(sqlite3.OperationalError):
        write_jdbc_merge(
            _changes(spark, CHANGES), "main", "users", ["id"],
            stage_writer=broken_stage_writer,
            execute=sqlite_executor(dest),
            dialect="ansi",
        )
    assert _table_state(dest) == pre


def test_mysql_dialect_statement_shapes():
    stmts = merge_statements(
        "db", "users", "_stg_users_0", ["id"], ["id", "day", "str"]
    )
    assert stmts[0] == (
        "DELETE t FROM `db`.`users` AS t JOIN `db`.`_stg_users_0` AS s "
        "ON t.`id` = s.`id`"
    )
    assert "WHERE `op` <> 'delete'" in stmts[1]
    assert stmts[2] == "DROP TABLE `db`.`_stg_users_0`"


def test_composite_key_join_clause():
    stmts = merge_statements(
        "db", "t", "s", ["a", "b"], ["a", "b", "v"], dialect="ansi"
    )
    assert "t.`a` = s.`a` AND t.`b` = s.`b`" in stmts[0]
