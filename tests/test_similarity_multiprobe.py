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


def test_multiprobe_scores_each_pair_once(spark):
    """The DISTINCT before scoring: both vectors of a pair can share
    BOTH probed cells, which without dedup would emit the pair twice."""
    e = _corpus(spark)
    out = near_dup_pairs_multiprobe(e, threshold=0.0, n_probe=2).collect()
    pairs = [(r["vec_a"], r["vec_b"]) for r in out]
    assert len(pairs) == len(set(pairs))
