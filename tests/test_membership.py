"""Bloom-filter membership prefilter (operators/membership.py): the
composition must be EXACTLY the plain anti-join, the definite-miss path
must actually bypass the join, and the filter math must be consistent
between the Arrow build and probe sides."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_mysql_data_reader_spark.operators.membership import (
    bloom_prefiltered_anti_join,
    bloom_sizing,
    build_bloom,
    might_contain,
)


def test_bloom_sizing_formulas():
    m, k = bloom_sizing(1000, 0.01)
    # textbook: ~9.59 bits/item at 1% fpp, k ~ 7
    assert 9000 <= m <= 10500 and 6 <= k <= 8
    m2, k2 = bloom_sizing(1000, 0.2)
    assert m2 < m and k2 < k  # looser fpp -> smaller/cheaper filter
    assert m % 8 == 0 and m2 % 8 == 0


def test_build_and_probe_no_false_negatives(spark):
    """Every inserted key MUST probe True (Bloom's hard guarantee);
    false positives are allowed but must be near the configured rate."""
    hist = spark.createDataFrame(
        [(f"key-{i}",) for i in range(500)], "fp string"
    )
    m, k = bloom_sizing(500, 0.01)
    bloom = build_bloom(hist, "fp", m, k)
    probes = spark.createDataFrame(
        [(f"key-{i}",) for i in range(500)]  # all members
        + [(f"other-{i}",) for i in range(2000)],  # all non-members
        "fp string",
    ).withColumn("hit", might_contain(bloom, m, k, F.col("fp")))
    rows = {r["fp"]: r["hit"] for r in probes.collect()}
    assert all(rows[f"key-{i}"] for i in range(500)), "false negative!"
    fp_rate = sum(1 for i in range(2000) if rows[f"other-{i}"]) / 2000
    assert fp_rate <= 0.05, fp_rate  # 5x headroom over the 1% target


def test_prefiltered_anti_join_equals_plain_anti_join(spark):
    """Exactness for any fpp: run with an aggressively small filter
    (high false-positive rate) — the exact join on the maybe side must
    still remove every false positive."""
    new_df = spark.createDataFrame(
        [(i, f"k{i % 40}") for i in range(200)], "id long, fp string"
    )
    hist = spark.createDataFrame([(f"k{i}",) for i in range(0, 40, 2)], "fp string")
    got = bloom_prefiltered_anti_join(new_df, hist, "fp", expected_items=5, fpp=0.5)
    # the plain anti-join reorders the key column first; align for compare
    want = new_df.join(hist, "fp", "left_anti").select(*new_df.columns)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.columns == new_df.columns


def test_null_keys_survive_like_anti_join(spark):
    """A NULL key never equals anything: the plain anti-join keeps the
    row, so the prefiltered form must too."""
    new_df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id long, fp string"
    )
    hist = spark.createDataFrame([("a",)], "fp string")
    got = sorted(r["id"] for r in bloom_prefiltered_anti_join(new_df, hist, "fp").collect())
    want = sorted(r["id"] for r in new_df.join(hist, "fp", "left_anti").collect())
    assert got == want == [2, 3]


def test_definite_misses_bypass_the_join(spark):
    """The point of the operator: with a disjoint batch, the maybe side
    is ~empty and the plan's join input carries only the Bloom-hit
    rows. Verified on the data level: probe column is False for all
    disjoint keys, so the anti-join input has ~fpp x |batch| rows."""
    from clickhouse_mysql_data_reader_spark.operators.membership import bloom_sizing

    hist = spark.createDataFrame([(f"h{i}",) for i in range(300)], "fp string")
    new_df = spark.createDataFrame([(i, f"n{i}") for i in range(300)], "id long, fp string")
    m, k = bloom_sizing(300, 0.01)
    bloom = build_bloom(hist, "fp", m, k)
    maybes = new_df.filter(might_contain(bloom, m, k, F.col("fp"))).count()
    assert maybes <= 15, f"{maybes} of 300 disjoint keys hit the filter"


def test_bloom_rejects_partial_byte_sizing(spark):
    """num_bits that isn't a byte multiple would index past the bit
    array inside the executor UDF — both entry points fail fast
    instead, and CurationState rounds its bloom_bits up front."""
    import pytest
    from pyspark.sql import functions as F

    from clickhouse_mysql_data_reader_spark.curation import CurationState
    from clickhouse_mysql_data_reader_spark.operators.membership import (
        build_bloom,
        might_contain,
    )

    df = spark.range(4)
    with pytest.raises(ValueError, match="multiple of 8"):
        build_bloom(df, "id", num_bits=1001, num_hashes=3)
    with pytest.raises(ValueError, match="multiple of 8"):
        might_contain(b"\x00" * 125, 1001, 3, F.col("id"))
    assert CurationState("/tmp/unused-bloom-round", bloom_bits=1_000_001).bloom_bits == 1_000_008
