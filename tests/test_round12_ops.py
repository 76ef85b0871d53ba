"""Round-12 operator additions: Reciprocal Rank Fusion (the hybrid-RAG
retrieval fusion member next to MMR), exercised at the operator seam —
the oracle-paired rag_rrf_fuse query covers the end-to-end composition
with the BM25 + hashed-BoW retrievers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_mysql_data_reader_spark.operators.similarity import rrf_fuse

SCALE = 10**12


def _ranking(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, rank int")


def test_rrf_exact_integer_scores_and_consensus_wins(spark):
    """A doc ranked mid-list by BOTH retrievers outranks a doc that
    tops only one — the point of RRF — and every score_u equals the
    hand-computed exact integer sum."""
    r1 = _ranking(spark, [(1, 1), (2, 2), (3, 3)])
    r2 = _ranking(spark, [(4, 1), (2, 2), (3, 4)])
    got = {
        r["doc_id"]: (r["rank"], r["n_rankers"], r["score_u"])
        for r in rrf_fuse([r1, r2], k=60, top_k=10).collect()
    }
    c = lambda rk: SCALE // (60 + rk)
    assert got[2] == (1, 2, c(2) + c(2))  # consensus #2 wins overall
    assert got[3] == (2, 2, c(3) + c(4))
    # single-ranking docs trail both consensus docs
    assert got[1] == (3, 1, c(1)) and got[4] == (4, 1, c(1))
    # deterministic tie-break: 1 and 4 tie on score_u, smaller id first


def test_rrf_top_k_and_rrf_score_division(spark):
    r1 = _ranking(spark, [(i, i) for i in range(1, 8)])
    out = rrf_fuse([r1], k=60, top_k=3).collect()
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3]
    for r in out:
        assert r["rrf_score"] == r["score_u"] / float(SCALE)


def test_rrf_validates_inputs(spark):
    r_ok = _ranking(spark, [(1, 1)])
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="rank"):
        rrf_fuse([r_ok.select("doc_id")])
    with pytest.raises(ValueError, match="top_k"):
        rrf_fuse([r_ok], top_k=0)


def test_rrf_three_rankers_and_custom_id(spark):
    rows = [("a", 1), ("b", 2)]
    rs = [
        spark.createDataFrame(rows, "url string, rank int")
        for _ in range(3)
    ]
    got = {
        r["url"]: (r["n_rankers"], r["score_u"])
        for r in rrf_fuse(rs, id_col="url", k=0, top_k=5).collect()
    }
    assert got == {
        "a": (3, 3 * (SCALE // 1)),
        "b": (3, 3 * (SCALE // 2)),
    }


def test_resolve_entities_transitive_merge_and_golden_record(spark):
    """a~b and b~c merge into ONE component even though
    levenshtein(a, c) exceeds the gate (the closure step the pair
    report can't express), the highest-frequency spelling wins the
    election, and singletons become their own canonical."""
    from clickhouse_mysql_data_reader_spark.operators.linkage import (
        resolve_entities,
    )

    rows = (
        [("acme corp",)] * 5
        + [("acme korp",)] * 2    # dist 1 from 'acme corp'
        + [("acme korpa",)] * 9   # dist 1 from 'acme korp', 2 from 'acme corp'
        + [("zebra ltd",)] * 3    # different block, singleton
    )
    df = spark.createDataFrame(rows, "name string")
    out = resolve_entities(
        df,
        "name",
        block_fn=lambda c: F.split(c, " ").getItem(0),
        max_dist=1,
    )
    got = {
        r["name"]: (
            r["component"],
            r["canonical"],
            r["is_canonical"],
            r["n_names"],
            r["n_rows"],
        )
        for r in out.collect()
    }
    # all three corp/korp spellings share one component (min name) and
    # elect the 9-row spelling even though it is lexicographically last
    assert {got[n][0] for n in ("acme corp", "acme korp", "acme korpa")} == {
        "acme corp"
    }
    assert {got[n][1] for n in ("acme corp", "acme korp", "acme korpa")} == {
        "acme korpa"
    }
    assert got["acme korpa"][2] == 1 and got["acme corp"][2] == 0
    assert got["acme corp"][3] == 3 and got["acme corp"][4] == 16
    # the singleton never enters the graph and canonicalizes to itself
    assert got["zebra ltd"] == ("zebra ltd", "zebra ltd", 1, 1, 3)


def test_resolve_entities_tie_breaks_lexicographically(spark):
    from clickhouse_mysql_data_reader_spark.operators.linkage import (
        resolve_entities,
    )

    rows = [("blue box",)] * 4 + [("blux box",)] * 4
    df = spark.createDataFrame(rows, "name string")
    got = {
        r["name"]: r["canonical"]
        for r in resolve_entities(
            df, "name", block_fn=lambda c: F.split(c, " ").getItem(1), max_dist=2
        ).collect()
    }
    assert got == {"blue box": "blue box", "blux box": "blue box"}


def test_cluster_safe_split_no_leakage_and_degenerate_parity(spark):
    """Every near-dup component shares ONE split label; docs without a
    near-dup neighbor get exactly the plain hash_split assignment
    (same salt, same thresholds) — the degenerate-parity contract."""
    from clickhouse_mysql_data_reader_spark.operators.sampling import (
        cluster_safe_split,
        hash_split,
    )

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    docs = spark.createDataFrame([(i,) for i in range(60)], "doc_id long")
    # two chains (transitive) + one direct pair; the rest singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "doc_a long, doc_b long",
    )
    out = cluster_safe_split(docs, pairs, fr).collect()
    by_comp: dict = {}
    by_id = {}
    for r in out:
        by_comp.setdefault(r["component"], set()).add(r["split"])
        by_id[r["doc_id"]] = (r["component"], r["split"])
    # one split per component, chains fully merged onto the min id
    assert all(len(s) == 1 for s in by_comp.values())
    assert by_id[3][0] == 1 and by_id[23][0] == 20
    assert by_id[1][1] == by_id[2][1] == by_id[3][1]
    # singletons == plain hash_split of their own id
    plain = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", hash_split(F.col("doc_id"), fr).alias("s")
        ).collect()
    }
    clustered = {1, 2, 3, 10, 11, 20, 21, 22, 23}
    for i in range(60):
        if i not in clustered:
            assert by_id[i] == (i, plain[i])
    # cluster members inherit the COMPONENT label's plain assignment
    assert by_id[2][1] == plain[1] and by_id[23][1] == plain[20]


def test_cluster_safe_split_rejects_column_collisions(spark):
    from clickhouse_mysql_data_reader_spark.operators.sampling import (
        cluster_safe_split,
    )

    docs = spark.createDataFrame([(1, "x")], "doc_id long, split string")
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    with pytest.raises(ValueError, match="split"):
        cluster_safe_split(docs, pairs, {"train": 1.0})


def _split_corpus(spark):
    """Near-dup clusters with quality-gate-proof text: docs 1/2/3 are
    one cluster (3 is longest, 1 is min id), 10/11 another; 20+ are
    singletons."""
    base = "the of and is to in that it was for " + " ".join(
        f"w{j} common body text shared across near duplicates" for j in range(12)
    )
    rows = [
        (1, "web", base + " tail-a"),
        (2, "web", base + " tail-b"),
        (3, "web", base + " tail-c extra extra extra words making it longest"),
        (10, "web", base.replace("common", "other") + " u1"),
        (11, "web", base.replace("common", "other") + " u2"),
    ] + [
        (20 + i, "web", f"singleton {i} " + " ".join(f"s{i}x{j}" for j in range(40)))
        for i in range(6)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


_SPLIT_CFG = dict(
    min_quality_score=0.0, drop_repetitive=False, redact_pii=False,
    split_fractions=(("train", 0.8), ("val", 0.1), ("test", 0.1)),
)


def test_curate_split_assignments_cover_survivors_and_are_keeper_invariant(spark):
    """split_assignments covers exactly the final survivors, hashes the
    COMPONENT (so which member the keeper election kept cannot change
    the cluster's split), and singletons equal the plain hash_split."""
    from clickhouse_mysql_data_reader_spark.curation import (
        CurationConfig,
        curate,
    )
    from clickhouse_mysql_data_reader_spark.operators.sampling import hash_split

    docs = _split_corpus(spark)
    res_min = curate(docs, cfg=CurationConfig(**_SPLIT_CFG, near_dup_keeper="min_id"))
    res_long = curate(docs, cfg=CurationConfig(**_SPLIT_CFG, near_dup_keeper="longest"))
    a_min = {r["doc_id"]: (r["component"], r["split"])
             for r in res_min.split_assignments.collect()}
    a_long = {r["doc_id"]: (r["component"], r["split"])
              for r in res_long.split_assignments.collect()}
    # coverage == final survivors, exactly
    surv_min = {r["doc_id"] for r in res_min.after_mixture.collect()}
    assert set(a_min) == surv_min
    # the two keeper policies keep DIFFERENT members of cluster {1,2,3}
    assert 1 in a_min and 1 not in a_long and 3 in a_long
    # ...but the cluster's split is identical: both hash component 1
    assert a_min[1][0] == a_long[3][0] == 1
    assert a_min[1][1] == a_long[3][1]
    # singletons hash their own id == the plain hash_split
    fr = dict(_SPLIT_CFG["split_fractions"])
    plain = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", hash_split(F.col("doc_id"), fr).alias("s")
        ).collect()
    }
    for i in range(20, 26):
        if i in a_min:
            assert a_min[i] == (i, plain[i])


def test_curate_split_fractions_validated(spark, tmp_path):
    from clickhouse_mysql_data_reader_spark.curation import (
        CurationConfig,
        CurationState,
        curate_increment,
    )

    with pytest.raises(ValueError, match="sum to 1"):
        CurationConfig(split_fractions=(("train", 0.5),))
    with pytest.raises(ValueError, match="pairs"):
        CurationConfig(split_fractions=(("train",),))
    # JSON-shaped lists (the CLI path) are accepted
    cfg = CurationConfig(**{**_SPLIT_CFG, "split_fractions": [["train", 1.0]]})
    docs = _split_corpus(spark)
    state = CurationState(str(tmp_path / "state"))
    # increments land assignments as state — a stateless call has
    # nowhere to put them and must refuse (round 13 turned the old
    # batch-only refusal into the landed `splits` table; the full
    # incremental contract is pinned in test_incremental_split.py)
    with pytest.raises(ValueError, match="update_state"):
        curate_increment(docs, state, cfg, update_state=False)
    # and unset => the result field stays None
    from clickhouse_mysql_data_reader_spark.curation import curate

    res = curate(docs, cfg=CurationConfig(min_quality_score=0.0))
    assert res.split_assignments is None
