"""SRP-LSH (sign random projection) near-dup: determinism of the
md5-derived hyperplanes, the no-false-positive guarantee, and recall
vs the exact all-pairs baseline on planted near-duplicates — the
cosine-metric analogue of the MinHash-LSH exactness pins."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clickhouse_mysql_data_reader_spark.operators.similarity import (
    near_dup_pairs_srp,
    srp_band_table,
    srp_hyperplanes,
)

DIM = 64


def _planted_corpus(spark, n_base=60, n_dups=40, noise=0.02, seed=7):
    """Random unit-ish vectors plus planted clones at cos >= ~0.995.
    Returns (df, expected_pairs) where expected is the EXACT all-pairs
    near-dup set at the test threshold, computed with numpy."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_base, DIM))
    clones = base[:n_dups] + noise * rng.normal(size=(n_dups, DIM))
    vecs = np.vstack([base, clones])
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    normed = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = normed @ normed.T
    thr = 0.95
    expected = {
        (a, b)
        for a in range(len(vecs))
        for b in range(a + 1, len(vecs))
        if round(cos[a, b], 6) >= thr
    }
    return df, expected, thr


def test_hyperplanes_deterministic_and_signed():
    h1 = srp_hyperplanes(DIM, 32)
    h2 = srp_hyperplanes(DIM, 32)
    assert h1 == h2
    assert {v for row in h1 for v in row} == {-1, 1}
    # different seed -> different planes (not a constant function)
    assert srp_hyperplanes(DIM, 32, seed="other") != h1
    # pinned spot values so an accidental hash-recipe change is loud
    assert h1[0][:8] == [
        1 if __import__("hashlib").md5(f"srp:0:{d}".encode()).digest()[0] & 1 else -1
        for d in range(8)
    ]


def test_band_table_shape_and_reproducibility(spark):
    df, _, _ = _planted_corpus(spark, n_base=10, n_dups=0)
    bt = srp_band_table(df, DIM).orderBy("vid", "band_idx")
    rows = bt.collect()
    assert len(rows) == 10 * 4
    assert all(0 <= r["band_val"] <= 255 for r in rows)
    assert [tuple(r) for r in srp_band_table(df, DIM).orderBy("vid", "band_idx").collect()] == [
        tuple(r) for r in rows
    ]


def test_srp_no_false_positives_and_recall(spark):
    df, expected, thr = _planted_corpus(spark)
    got = {
        (r["vec_a"], r["vec_b"])
        for r in near_dup_pairs_srp(df, thr, dim=DIM).collect()
    }
    # verify stage re-scores with the exact cosine: nothing below the
    # threshold can survive, so SRP output is a SUBSET of the truth
    assert got <= expected
    # planted clones sit at cos ~0.995 where the 4x8-bit S-curve gives
    # ~0.997 per-pair collision probability; demand >= 90% of ALL
    # threshold pairs (fixed seed -> deterministic)
    assert expected, "planted corpus must contain near-dup pairs"
    recall = len(got) / len(expected)
    assert recall >= 0.90, f"recall {recall:.2f} over {len(expected)} pairs"


def test_srp_bucket_selectivity(spark):
    """Unrelated vectors almost never share an 8-bit band bucket: the
    candidate join must stay far below all-pairs."""
    df, _, _ = _planted_corpus(spark, n_base=100, n_dups=0)
    bt = srp_band_table(df, DIM)
    cand = (
        bt.alias("a")
        .join(
            bt.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select("a.vid", "b.vid")
        .distinct()
        .count()
    )
    all_pairs = 100 * 99 // 2
    assert cand < all_pairs * 0.25, f"{cand} candidates of {all_pairs} pairs"


def test_srp_rejects_bad_band_split(spark):
    df, _, _ = _planted_corpus(spark, n_base=2, n_dups=0)
    with pytest.raises(ValueError, match="not divisible"):
        srp_band_table(df, DIM, n_bits=32, n_bands=5)


def test_srp_arrow_and_expr_paths_bit_identical(spark):
    """The arrow matmul and the Catalyst expression fold compute the
    SAME exact integer sums (fixed-point quantization), so every band
    value must match bit-for-bit — including negative components and
    values that floor to adjacent integers."""
    df, _, _ = _planted_corpus(spark, n_base=40, n_dups=10, noise=0.3, seed=11)
    expr_bt = sorted(
        tuple(r) for r in srp_band_table(df, DIM, impl="expr").collect()
    )
    arrow_bt = sorted(
        tuple(r) for r in srp_band_table(df, DIM, impl="arrow").collect()
    )
    assert expr_bt == arrow_bt
    with pytest.raises(ValueError, match="impl must be"):
        srp_band_table(df, DIM, impl="numpy")


def test_centroid_drift_numpy_crosscheck_and_edges(spark):
    from clickhouse_mysql_data_reader_spark.operators.similarity import (
        centroid_drift,
    )

    rng = np.random.RandomState(7)
    old_rows = [(int(i % 3), rng.randn(8).astype("float32").tolist()) for i in range(30)]
    new_rows = [(int(i % 3), rng.randn(8).astype("float32").tolist()) for i in range(24)]
    schema = "label int, embedding array<float>"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)

    out = {r["label"]: r for r in centroid_drift(old, new).collect()}
    for lab in (0, 1, 2):
        # numpy reference on the SAME integer ticks the operator uses
        t_old = np.floor(
            np.array([v for l, v in old_rows if l == lab], dtype=np.float64) * 1e9 + 0.5
        ).sum(axis=0)
        t_new = np.floor(
            np.array([v for l, v in new_rows if l == lab], dtype=np.float64) * 1e9 + 0.5
        ).sum(axis=0)
        expect = float(
            t_old @ t_new / np.sqrt((t_old @ t_old) * (t_new @ t_new))
        )
        assert out[lab]["centroid_cos"] == pytest.approx(expect, abs=1e-6)
        assert out[lab]["n_old"] == sum(1 for l, _ in old_rows if l == lab)
        assert out[lab]["n_new"] == sum(1 for l, _ in new_rows if l == lab)

    # identical snapshots: exactly 1.0; zero-vector label: 0.0 guard;
    # labels missing from either side drop (inner join)
    same = centroid_drift(old, old).collect()
    assert all(r["centroid_cos"] == 1.0 for r in same)
    z = spark.createDataFrame([(9, [0.0] * 8)], schema)
    zz = centroid_drift(z, z).collect()
    assert zz[0]["centroid_cos"] == 0.0
    only_old = spark.createDataFrame([(42, [1.0] * 8)], schema)
    assert centroid_drift(only_old, new).count() == 0


def test_srp_expr_path_raises_on_dim_mismatch(spark):
    """zip_with NULL-pads short vectors and the sign fold would silently
    map every bit to 0 (all malformed vectors colliding in one bucket);
    both impls must RAISE instead, identically."""
    from clickhouse_mysql_data_reader_spark.operators.similarity import (
        srp_band_table,
    )

    bad = spark.createDataFrame(
        [(1, [0.5] * 8), (2, [0.5] * 4)], "vec_id long, embedding array<float>"
    )
    for impl in ("expr", "arrow"):
        with pytest.raises(Exception, match="dim|shape|length"):
            srp_band_table(bad, dim=8, n_bits=8, n_bands=2, impl=impl).collect()
