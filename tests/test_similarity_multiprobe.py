"""Multi-probe IVF recall: the documented single-probe caveat —
near-dup pairs split across a cell border are missed — and the
multi-probe fix that restores them."""

from __future__ import annotations

from clickhouse_mysql_data_reader_spark.operators.similarity import (
    near_dup_pairs,
    near_dup_pairs_multiprobe,
)


def _corpus(spark):
    # three cells; x (id 5) is labeled B but sits between A and B, so
    # its 2nd probe lands in A — the cross-border near-dup with a1
    rows = [
        (1, "A", [1.00, 0.00]),   # a1
        (2, "A", [0.99, 0.01]),   # a2
        (3, "B", [0.80, 0.60]),   # b1
        (4, "B", [0.79, 0.61]),   # b2
        (5, "B", [0.92, 0.39]),   # x: cos(a1, x) ~ 0.921 >= 0.9
        (6, "C", [0.00, 1.00]),
        (7, "C", [0.01, 0.99]),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )


def test_multiprobe_restores_cross_border_pair(spark):
    e = _corpus(spark)
    single = {
        (r["vec_a"], r["vec_b"]) for r in near_dup_pairs(e, threshold=0.9).collect()
    }
    multi = {
        (r["vec_a"], r["vec_b"])
        for r in near_dup_pairs_multiprobe(e, threshold=0.9, n_probe=2).collect()
    }
    # single-probe finds exactly the within-cell near-dups
    assert single == {(1, 2), (3, 4), (3, 5), (4, 5), (6, 7)}
    # multi-probe adds exactly the cross-border pairs of x with cell A
    # (x's 2nd probe) and loses nothing; far cells stay unpaired
    assert multi == single | {(1, 5), (2, 5)}


def test_kmeans_iterate_recovers_planted_clusters(spark):
    """Three well-separated planted clusters in 2D: after a few Lloyd
    iterations from the deterministic hash init, every cluster's points
    share a cell and no cell mixes clusters."""
    from clickhouse_mysql_data_reader_spark.operators.similarity import (
        assign_cells,
        kmeans_iterate,
    )

    pts = []
    for i, (cx, cy) in enumerate([(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)]):
        for j in range(6):
            pts.append((i * 10 + j, [cx + 0.1 * j, cy - 0.1 * j]))
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    cents = kmeans_iterate(df, k=3, n_iter=4)
    assign = {
        r["vec_id"]: r["cell"] for r in assign_cells(df, cents).collect()
    }
    clusters = [{assign[i * 10 + j] for j in range(6)} for i in range(3)]
    assert all(len(c) == 1 for c in clusters), clusters
    assert len(set().union(*clusters)) == 3, clusters
    # deterministic: a second run lands identical centroids
    again = kmeans_iterate(df, k=3, n_iter=4)
    a = sorted(map(str, cents.collect()))
    b = sorted(map(str, again.collect()))
    assert a == b


def test_kmeans_iterate_keeps_terminally_empty_cells(spark):
    """Carry-forward applies to the RETURNED table, not only the
    intermediate assignments: with k well above the natural cluster
    count, Lloyd assignment collapses most points onto a few strong
    centroids, leaving many cells empty in the FINAL re-center. The
    returned quantizer must still hold every cell that ever had a
    centroid (the init-populated set), each with its last known value
    — not silently shrink k to the terminally-populated cells."""
    from pyspark.sql import functions as F

    from clickhouse_mysql_data_reader_spark.operators.similarity import (
        kmeans_iterate,
    )

    k = 6
    pts = []
    for i, (cx, cy) in enumerate([(0.0, 0.0), (50.0, 50.0)]):
        for j in range(6):
            pts.append((i * 10 + j, [cx + 0.01 * j, cy - 0.01 * j]))
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    init_cells = {
        r["c"]
        for r in df.select(
            F.pmod(F.xxhash64("vec_id"), F.lit(k)).cast("int").alias("c")
        ).distinct().collect()
    }
    assert len(init_cells) > 2, "fixture must spread init over >2 cells"
    cents = kmeans_iterate(df, k=k, n_iter=3).collect()
    returned = {r["cell"] for r in cents}
    # every cell that ever held a centroid survives in the output ...
    assert returned == init_cells, (sorted(returned), sorted(init_cells))
    # ... with a real centroid of the right dimensionality
    assert all(r["centroid"] is not None and len(r["centroid"]) == 2 for r in cents)


def test_multiprobe_recall_ge_095_at_nprobe2_vs_brute_force(spark):
    """Quantitative recall on a planted fixture, not just the superset
    property: 6 angular clusters (30 deg apart) of unit vectors, each
    base point paired with a jittered near-dup copy; ~30% of the copies
    are deliberately MISLABELED into the adjacent cell (the quantizer-
    border effect). Ground truth = exact brute-force cosine pairs,
    computed in pure Python. Assert multiprobe recall >= 0.95 at
    n_probe=2 (the bound in the test name) and that it strictly beats
    single-probe, which loses every mislabeled copy's pairs."""
    import math

    threshold = 0.95
    rng_bits = 0x9E3779B97F4A7C15  # fixed LCG-ish seed, no RNG state
    angles: list[tuple[int, float, int]] = []  # (vec_id, angle_deg, cell)
    vid = 0
    for c in range(6):
        for j in range(8):
            # deterministic jitter in [-3, 3] deg from integer hashing
            h = (rng_bits * (c * 97 + j * 13 + 1)) % 6001
            base = c * 30.0 + (h / 1000.0) - 3.0
            angles.append((vid, base, c))
            vid += 1
            h2 = (rng_bits * (c * 31 + j * 7 + 5)) % 2001
            partner = base + (h2 / 1000.0) - 1.0  # within 1 deg of base
            mislabel = ((rng_bits * (vid * 3 + 11)) % 10) < 3  # ~30%
            cell = (c + 1) % 6 if mislabel else c
            angles.append((vid, partner, cell))
            vid += 1

    rows = [
        (i, f"cell{cell}", [math.cos(math.radians(a)), math.sin(math.radians(a))])
        for i, a, cell in angles
    ]
    truth = {
        (a[0], b[0])
        for i, a in enumerate(angles)
        for b in angles[i + 1 :]
        if math.cos(math.radians(a[1] - b[1])) >= threshold
    }
    assert len(truth) > 500  # the fixture really plants dense truth

    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    multi = {
        (r["vec_a"], r["vec_b"])
        for r in near_dup_pairs_multiprobe(df, threshold=threshold, n_probe=2).collect()
    }
    single = {
        (r["vec_a"], r["vec_b"])
        for r in near_dup_pairs(df, threshold=threshold).collect()
    }
    # no false positives on either path (both verify exact cosine)
    assert multi <= truth and single <= truth
    recall_multi = len(multi & truth) / len(truth)
    recall_single = len(single & truth) / len(truth)
    assert recall_multi >= 0.95, (recall_multi, recall_single)
    assert recall_multi > recall_single, (recall_multi, recall_single)


def test_multiprobe_scores_each_pair_once(spark):
    """The DISTINCT before scoring: both vectors of a pair can share
    BOTH probed cells, which without dedup would emit the pair twice."""
    e = _corpus(spark)
    out = near_dup_pairs_multiprobe(e, threshold=0.0, n_probe=2).collect()
    pairs = [(r["vec_a"], r["vec_b"]) for r in out]
    assert len(pairs) == len(set(pairs))
