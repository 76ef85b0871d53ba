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
