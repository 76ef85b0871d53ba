"""Every registered query with an oracle must match DuckDB at sf0.01 —
the same check the driver runs (CORRECTNESS gate)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_utils import compare, duck_connection


@pytest.fixture(scope="module")
def duck(sf_correct):
    con = duck_connection(sf_correct)
    yield con
    con.close()


def _oracle_cases():
    oracles = entrymod.oracle_sql()
    return [(name, fn) for name, fn in entrymod.queries().items() if name in oracles]


@pytest.mark.parametrize("name", [n for n, _ in _oracle_cases()])
def test_query_matches_oracle(name, spark, sf_correct, duck):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    df = fn(spark, sf_correct)
    result = compare(df, duck, sql)
    assert result["rowcount_match"], result
    assert result["colnames_match"], result
    assert result["values_match"], result


def test_rows_only_queries_run(spark, sf_correct):
    oracles = entrymod.oracle_sql()
    for name, fn in entrymod.queries().items():
        if name not in oracles:
            df = fn(spark, sf_correct)
            assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty"}
