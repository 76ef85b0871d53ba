"""Incremental leakage-safe train/val/test split: CurationConfig.
split_fractions in ``curate_increment`` / ``curate_stream`` lands every
kept doc's (doc_id, component, split) immutably in the state's
``splits`` table — stable across daily batches because landed
assignments are never recomputed and history-wins drops later
near-twins (so no cluster can straddle splits). Pins batch-over-
concatenation parity (the line_dedup_increment idiom), stability,
the fractions manifest, and streaming replay idempotence — round-12
verdict item #4."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_mysql_data_reader_spark.curation import (
    CurationConfig,
    CurationState,
    curate,
    curate_increment,
    curation_epoch_apply,
)

_FR = (("train", 0.6), ("val", 0.2), ("test", 0.2))


def _cfg(**kw):
    base = dict(
        min_quality_score=0.0,
        drop_repetitive=False,
        redact_pii=False,
        split_fractions=_FR,
    )
    base.update(kw)
    return CurationConfig(**base)


_BASE = "the of and is to in that it was for " + " ".join(
    f"w{j} common body text shared across near duplicates" for j in range(12)
)


def _b1(spark):
    # cluster {1, 2} (within batch 1) + singleton 20
    return spark.createDataFrame(
        [
            (1, "web", _BASE + " tail-a"),
            (2, "web", _BASE + " tail-b"),
            (20, "web", "singleton zero " + " ".join(f"s0x{j}" for j in range(40))),
        ],
        "doc_id long, source string, text string",
    )


def _b2(spark):
    # 30 is a near-dup of LANDED doc 1 (cross-batch); 31/32 a fresh
    # within-batch cluster; 40 a singleton
    return spark.createDataFrame(
        [
            (30, "web", _BASE + " tail-d"),
            (31, "web", _BASE.replace("common", "other") + " u1"),
            (32, "web", _BASE.replace("common", "other") + " u2"),
            (40, "web", "singleton one " + " ".join(f"s1x{j}" for j in range(40))),
        ],
        "doc_id long, source string, text string",
    )


@pytest.mark.slow
def test_increment_split_lands_and_matches_batch_over_concatenation(
    spark, tmp_path
):
    """The parity contract: with batch-ordered ids, bootstrap +
    increment produce exactly the (doc_id, component, split) rows a
    single batch curate() over the concatenated corpus assigns to the
    same survivors — the cross-batch near-dup (30) is dropped by
    history-wins and needs no split, and the surviving cluster labels
    are the min member ids either way."""
    cfg = _cfg()
    res = curate(_b1(spark).unionByName(_b2(spark)), cfg=cfg)
    batch_assign = {
        r["doc_id"]: (r["component"], r["split"])
        for r in res.split_assignments.collect()
    }
    res.unpersist()

    state = CurationState(str(tmp_path / "st"))
    k1 = {r["doc_id"] for r in curate_increment(_b1(spark), state, cfg=cfg).collect()}
    k2 = {r["doc_id"] for r in curate_increment(_b2(spark), state, cfg=cfg).collect()}
    assert k1 == {1, 20} and k2 == {31, 40}  # keepers: min_id; 30 drops vs history

    landed = {
        r["doc_id"]: (r["component"], r["split"])
        for r in state.split_assignments(spark).collect()
    }
    assert landed == batch_assign
    # cluster members hash the component label (min id), singletons
    # their own id
    assert landed[1][0] == 1 and landed[31][0] == 31
    assert landed[20][0] == 20 and landed[40][0] == 40


@pytest.mark.slow
def test_increment_split_landed_assignments_are_stable(spark, tmp_path):
    """A later batch must not change any landed assignment — the
    stability contract the old batch-only refusal existed to protect."""
    cfg = _cfg()
    state = CurationState(str(tmp_path / "st"))
    curate_increment(_b1(spark), state, cfg=cfg)
    before = {
        r["doc_id"]: (r["component"], r["split"])
        for r in state.split_assignments(spark).collect()
    }
    curate_increment(_b2(spark), state, cfg=cfg)
    after = {
        r["doc_id"]: (r["component"], r["split"])
        for r in state.split_assignments(spark).collect()
    }
    for doc_id, assign in before.items():
        assert after[doc_id] == assign
    assert set(after) == set(before) | {31, 40}


@pytest.mark.slow
def test_increment_split_no_cluster_straddles(spark, tmp_path):
    """Leakage-safety across batches: the near-twin of a landed doc is
    dropped, so the corpus + splits table never contain two members of
    one near-dup cluster — by construction no cluster straddles."""
    cfg = _cfg()
    state = CurationState(str(tmp_path / "st"))
    curate_increment(_b1(spark), state, cfg=cfg)
    kept2 = {r["doc_id"] for r in curate_increment(_b2(spark), state, cfg=cfg).collect()}
    assert 30 not in kept2
    assigned = {r["doc_id"] for r in state.split_assignments(spark).collect()}
    assert 30 not in assigned  # dropped docs get no assignment


@pytest.mark.slow
def test_increment_split_fractions_manifest_pinned(spark, tmp_path):
    cfg = _cfg()
    state = CurationState(str(tmp_path / "st"))
    curate_increment(_b1(spark), state, cfg=cfg)
    drifted = _cfg(split_fractions=(("train", 0.5), ("test", 0.5)))
    with pytest.raises(ValueError, match="pinned|fractions"):
        curate_increment(_b2(spark), state, cfg=drifted)


def test_increment_split_requires_landing_path(spark, tmp_path):
    state = CurationState(str(tmp_path / "st"))
    with pytest.raises(ValueError, match="update_state|splits_out"):
        curate_increment(_b1(spark), state, cfg=_cfg(), update_state=False)


@pytest.mark.slow
def test_stream_split_replay_idempotent(spark, tmp_path):
    """The at-least-once contract with splits on: a replayed epoch
    re-appends IDENTICAL assignment rows (deduplicated by the reader),
    and a later epoch's survivors extend the table without touching
    earlier rows."""
    cfg = _cfg()
    state = CurationState(str(tmp_path / "state"))
    out = str(tmp_path / "out")
    apply_fn = curation_epoch_apply(state, out, cfg=cfg)

    apply_fn(_b1(spark), 0)
    first = {
        r["doc_id"]: (r["component"], r["split"])
        for r in state.split_assignments(spark).collect()
    }
    assert set(first) == {1, 20}
    apply_fn(_b1(spark), 0)  # full replay of epoch 0
    replay = {
        r["doc_id"]: (r["component"], r["split"])
        for r in state.split_assignments(spark).collect()
    }
    assert replay == first, "replayed epoch changed or duplicated assignments"
    # reader collapses the double-append exactly (identical rows)
    n_rows = state.split_assignments(spark).count()
    assert n_rows == 2

    apply_fn(_b2(spark), 1)
    final = {
        r["doc_id"]: (r["component"], r["split"])
        for r in state.split_assignments(spark).collect()
    }
    assert set(final) == {1, 20, 31, 40}
    for doc_id, assign in first.items():
        assert final[doc_id] == assign


@pytest.mark.slow
def test_split_state_compaction_and_growth(spark, tmp_path):
    cfg = _cfg()
    state = CurationState(str(tmp_path / "st"))
    curate_increment(_b1(spark), state, cfg=cfg, epoch_id=0)
    report = state.compact(spark)
    assert "splits" in report
    curate_increment(_b2(spark), state, cfg=cfg, epoch_id=1)
    g = state.growth_report(spark)
    assert g["splits"]["docs"] == 4  # 1, 20, 31, 40
    assigned = {r["doc_id"] for r in state.split_assignments(spark).collect()}
    assert assigned == {1, 20, 31, 40}
