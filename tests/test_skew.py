"""Skew operators: salted aggregate/join semantics guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_mysql_data_reader_spark.operators.skew import (
    _row_salt,
    salted_aggregate,
    salted_join,
)


def test_row_salt_spreads_identical_rows(spark):
    """VERDICT r2 item 7: a hot key made of IDENTICAL rows must still
    spread over multiple salts (a pure content hash collapses them all
    onto one reducer)."""
    dup = spark.createDataFrame([("hot", 1)] * 2000, "k string, v int").repartition(4)
    n_salts = (
        dup.withColumn("_salt", _row_salt(dup, 8))
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_salts >= 2


def test_salted_aggregate_correct_on_duplicate_rows(spark):
    dup = spark.createDataFrame([("hot", 2)] * 1000, "k string, v int")
    out = salted_aggregate(
        dup, ["k"], {"n": ("v", "count"), "s": ("v", "sum")}, num_salts=8
    ).collect()
    assert [(r["k"], r["n"], r["s"]) for r in out] == [("hot", 1000, 2000)]


def test_salted_count_honors_null_semantics(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 3), ("b", None)], "k string, v int"
    )
    out = {
        r["k"]: (r["n_v"], r["sum_v"])
        for r in salted_aggregate(
            df, ["k"], {"n_v": ("v", "count"), "sum_v": ("v", "sum")}, num_salts=4
        ).collect()
    }
    # count(v) excludes nulls — same as the unsalted groupBy
    assert out == {"a": (2, 4), "b": (0, None)}


def test_salted_join_matches_plain_inner(spark):
    left = spark.createDataFrame([(1, "x")] * 50 + [(2, "y")], "k int, a string")
    right = spark.createDataFrame([(1, "R1"), (3, "R3")], "k int, b string")
    got = salted_join(left, right, ["k"], num_salts=4).orderBy("a")
    want = left.join(right, "k").orderBy("a")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_left_preserves_unmatched_left_once(spark):
    left = spark.createDataFrame([(1, "x"), (9, "lonely")], "k int, a string")
    right = spark.createDataFrame([(1, "R1")], "k int, b string")
    rows = salted_join(left, right, ["k"], num_salts=8, how="left").collect()
    lonely = [r for r in rows if r["a"] == "lonely"]
    assert len(lonely) == 1 and lonely[0]["b"] is None


def test_salted_join_rejects_outer_shapes(spark):
    df = spark.createDataFrame([(1, "x")], "k int, a string")
    with pytest.raises(ValueError, match="duplicate unmatched rows"):
        salted_join(df, df, ["k"], how="full")
    with pytest.raises(ValueError, match="duplicate unmatched rows"):
        salted_join(df, df, ["k"], how="right_outer")
