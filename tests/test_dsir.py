"""DSIR importance resampling: numpy-reference weights, domain-tilt
ranking, frozen-estimator reuse, deterministic selection."""

from __future__ import annotations

import hashlib
import math

import numpy as np

from clickhouse_mysql_data_reader_spark.operators.dsir import (
    dsir_logratios,
    dsir_select,
    dsir_weights,
)

COOK = [
    "stir the butter into the warm sauce and add salt to the pan",
    "bake the bread in the oven and let the crust turn golden brown",
    "chop the onion and fry it with garlic oil in a hot pan",
]
TECH = [
    "the executor shuffles the partition into the join stage of the plan",
    "broadcast the small table and prune the scan columns in the query",
    "the stream checkpoint commits the offset after the micro batch",
]


def _mk(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def _bucket(tok: str, dim: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % dim


def _features(text: str) -> list[str]:
    tk = text.lower().split()
    feats = list(tk)
    if len(tk) >= 2:
        feats += [" ".join(tk[i : i + 2]) for i in range(len(tk) - 1)]
    return feats  # <2 real tokens -> unigrams only (no bogus bigram)


def _np_weights(raw_texts, tgt_texts, dim, scale):
    def counts(texts):
        c = np.zeros(dim, dtype=np.int64)
        for t in texts:
            for f in _features(t):
                c[_bucket(f, dim)] += 1
        return c

    cr, ct = counts(raw_texts), counts(tgt_texts)
    nr, nt = cr.sum(), ct.sum()
    llr = np.array(
        [
            # HALF_UP like Spark's round(); inputs are irrational so the
            # .5 boundary is never exactly hit
            math.floor(
                scale
                * (
                    math.log((ct[b] + 1) / (nt + dim))
                    - math.log((cr[b] + 1) / (nr + dim))
                )
                + 0.5
            )
            for b in range(dim)
        ],
        dtype=np.int64,
    )
    out = {}
    for i, t in enumerate(raw_texts):
        c = np.zeros(dim, dtype=np.int64)
        for f in _features(t):
            c[_bucket(f, dim)] += 1
        out[i] = (int(c.sum()), float((c * llr).sum()) / scale)
    return out


def test_dsir_weights_match_numpy(spark):
    dim, scale = 128, 1_000_000
    raw = _mk(spark, COOK + TECH)
    tgt = _mk(spark, COOK[:2], start=100)
    got = {
        r["doc_id"]: (r["n_features"], r["logw"])
        for r in dsir_weights(raw, tgt, dim=dim, scale=scale).collect()
    }
    want = _np_weights(COOK + TECH, COOK[:2], dim, scale)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], f"n_features doc {i}"
        # llr table is integer on both sides; only libm 1-ulp drift at a
        # rounding boundary could differ -> allow one scaled unit per feature
        assert abs(got[i][1] - want[i][1]) <= want[i][0] / scale, f"logw doc {i}"


def test_dsir_ranks_target_domain_up(spark):
    raw = _mk(spark, COOK + TECH)
    tgt = _mk(spark, COOK[:2], start=100)
    w = {r["doc_id"]: r["logw"] for r in dsir_weights(raw, tgt).collect()}
    # docs 0/1 are in-domain for the 2-doc target; doc 2 shares only
    # generic words with it, so it is NOT expected to outrank tech
    in_domain, tech_ids = {0, 1}, {3, 4, 5}
    assert min(w[i] for i in in_domain) > max(w[i] for i in tech_ids)

    sel = dsir_select(raw, tgt, k=2)
    assert sel.columns == ["doc_id", "text", "logw"]
    assert {r["doc_id"] for r in sel.collect()} == in_domain


def test_dsir_frozen_logratios_reuse(spark):
    raw = _mk(spark, COOK + TECH)
    tgt = _mk(spark, COOK[:2], start=100)
    llr = dsir_logratios(raw, tgt, dim=256)
    assert llr.count() == 256  # every bucket has a row (smoothed mass)
    a = sorted(
        (r["doc_id"], r["logw"])
        for r in dsir_weights(raw, tgt, dim=256, logratios=llr).collect()
    )
    b = sorted(
        (r["doc_id"], r["logw"]) for r in dsir_weights(raw, tgt, dim=256).collect()
    )
    assert a == b  # frozen estimator == derived-from-corpus estimator

    # a NEW batch scored against the frozen estimator: deterministic
    batch = _mk(spark, ["fry the onion in butter", "shuffle the join plan"], start=10)
    x = sorted(dsir_weights(batch, tgt, dim=256, logratios=llr).collect())
    y = sorted(dsir_weights(batch, tgt, dim=256, logratios=llr).collect())
    assert x == y
    wx = {r["doc_id"]: r["logw"] for r in x}
    assert wx[10] > wx[11]


def test_dsir_select_plan_shape(spark):
    """Selection lowers to TakeOrderedAndProject (per-partition heaps,
    no global sort) and the dim-row estimator assembly broadcasts —
    no sort-merge join anywhere in the pipeline."""
    raw = _mk(spark, COOK + TECH)
    tgt = _mk(spark, COOK[:2], start=100)
    df = dsir_select(raw, tgt, k=2)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_dsir_empty_docs_have_no_features(spark):
    """Empty/whitespace docs contribute zero features — no weight row,
    no corpus-count skew (regression: the 1-token bigram guard used to
    emit '' as a feature for blank docs)."""
    raw = _mk(spark, COOK + ["", "   ", "solo"])
    tgt = _mk(spark, COOK[:1], start=100)
    w = {r["doc_id"]: r for r in dsir_weights(raw, tgt, dim=64).collect()}
    assert 3 not in w and 4 not in w, "blank docs must produce no weight row"
    assert w[5]["n_features"] == 1  # 'solo': unigram only, no bigram
