"""Calibrated quality gating in the curation pipeline: the batch-only
window form (quality_calibrate_pctile), the frozen per-source
thresholds deployment form (quality_thresholds), and their exact
parity — the frozen==direct idiom (text_bm25_frozen, psi_drift_frozen)
applied to the quality gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_mysql_data_reader_spark.curation import (
    CurationConfig,
    curate,
    curate_increment,
    curate_stream,
    CurationState,
)
from clickhouse_mysql_data_reader_spark.operators.text import (
    calibrated_quality_thresholds,
)


def _two_source_corpus(spark):
    """20 docs per source with distinct within-source quality scores;
    'reference' scores sit uniformly BELOW every 'forums' score (see
    test_round11b_ops for the arithmetic)."""
    rows = []
    for i in range(20):
        forum_junk = " ".join(f"q{j}x" for j in range(15 + i))
        ref_junk = " ".join(f"q{j}x" for j in range(30 + i))
        rows.append((i, "forums", "the of and is " + forum_junk))
        rows.append((100 + i, "reference", "the " + ref_junk))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


# gates OFF except quality so the calibrated stage is what's measured
_BASE = dict(
    min_quality_score=0.0,
    drop_repetitive=False,
    redact_pii=False,
)


def test_batch_calibrated_gate_is_source_fair(spark):
    docs = _two_source_corpus(spark)
    res = curate(docs, cfg=CurationConfig(**_BASE, quality_calibrate_pctile=0.2))
    kept = res.quality_gated.groupBy("source").count().collect()
    by_src = {r["source"]: r["count"] for r in kept}
    # percent_rank >= 0.2 over 20 distinct scores keeps ranks 4..19
    assert by_src == {"forums": 16, "reference": 16}
    # a raw global threshold at the same overall keep volume would have
    # zeroed out 'reference' (all its scores are below all of forums')


def test_frozen_thresholds_equal_window_form(spark):
    """Thresholds frozen from the same population keep EXACTLY the same
    doc set as the window gate — the deployment-parity contract."""
    docs = _two_source_corpus(spark)
    thr = {
        r["source"]: r["q_threshold"]
        for r in calibrated_quality_thresholds(
            docs, "text", "source", keep_pctile=0.2
        ).collect()
    }
    direct = curate(
        docs, cfg=CurationConfig(**_BASE, quality_calibrate_pctile=0.2)
    )
    frozen = curate(
        docs,
        cfg=CurationConfig(
            **_BASE, quality_thresholds=tuple(sorted(thr.items()))
        ),
    )
    ids_direct = {r["doc_id"] for r in direct.quality_gated.collect()}
    ids_frozen = {r["doc_id"] for r in frozen.quality_gated.collect()}
    assert ids_direct == ids_frozen and len(ids_direct) == 32


def test_thresholds_pass_unknown_sources(spark):
    docs = _two_source_corpus(spark).withColumn(
        "source", F.lit("brand_new_source")
    )
    res = curate(
        docs,
        cfg=CurationConfig(**_BASE, quality_thresholds=(("forums", 0.99),)),
    )
    # no doc is from 'forums': the map misses -> everything passes
    assert res.quality_gated.count() == 40


def test_increment_and_stream_refuse_window_form(spark, tmp_path):
    docs = _two_source_corpus(spark)
    state = CurationState(str(tmp_path / "state"))
    cfg = CurationConfig(**_BASE, quality_calibrate_pctile=0.2)
    with pytest.raises(ValueError, match="batch-only"):
        curate_increment(docs, state, cfg)
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    with pytest.raises(ValueError, match="batch-only"):
        curate_stream(stream, state, str(tmp_path / "out"), cfg)


def test_increment_applies_frozen_thresholds(spark, tmp_path):
    """The frozen gate is stateless, so it runs identically in
    increment mode: below-threshold docs never reach the state."""
    docs = _two_source_corpus(spark)
    thr = {
        r["source"]: r["q_threshold"]
        for r in calibrated_quality_thresholds(
            docs, "text", "source", keep_pctile=0.2
        ).collect()
    }
    state = CurationState(str(tmp_path / "state"))
    cfg = CurationConfig(
        **_BASE, quality_thresholds=tuple(sorted(thr.items()))
    )
    kept = {r["doc_id"] for r in curate_increment(docs, state, cfg).collect()}
    # batch==increment parity through the frozen gate: the stateless
    # threshold map composes with the within-batch dedup stages exactly
    # like batch mode (this corpus is deliberately near-dup-heavy, so
    # the LSH stage prunes hard in BOTH modes)
    batch = {
        r["doc_id"]
        for r in curate(docs, cfg=cfg).after_near_dedup.collect()
    }
    assert kept == batch and kept
    # and the calibration-dropped docs never reach the state: the 4
    # lowest-ranked per source are forums i=16..19 (scores fall with i)
    # and reference i=100..103 (scores rise with i)
    dropped = {16, 17, 18, 19, 100, 101, 102, 103}
    assert not (kept & dropped)


def test_tied_and_singleton_sources_kept_whole_and_in_parity(spark):
    """Degenerate sources — all-tied scores and single-doc sources —
    are kept WHOLE by both forms (round-11 advice): percent_rank is 0
    for every row there, so the old raw pr-cut dropped 100% of such a
    source while the frozen gate (which emitted no threshold row)
    passed 100%, violating the parity contract. The threshold
    construction (min score clearing the cut, source-min fallback)
    makes both forms agree on every population."""
    text = "the of and is " + " ".join(f"q{j}x" for j in range(20))
    rows = (
        [(i, "tied", text) for i in range(5)]  # identical docs => tied scores
        + [(50, "solo", text)]  # single-doc source
        + [
            (
                100 + i,
                "varied",
                "the " + " ".join(f"q{j}x" for j in range(30 + i)),
            )
            for i in range(10)
        ]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    thr = {
        r["source"]: r["q_threshold"]
        for r in calibrated_quality_thresholds(
            docs, "text", "source", keep_pctile=0.2
        ).collect()
    }
    # EVERY source gets a threshold row, degenerate ones included
    assert set(thr) == {"tied", "solo", "varied"}
    direct = curate(
        docs, cfg=CurationConfig(**_BASE, quality_calibrate_pctile=0.2)
    )
    frozen = curate(
        docs,
        cfg=CurationConfig(**_BASE, quality_thresholds=tuple(sorted(thr.items()))),
    )
    ids_direct = {r["doc_id"] for r in direct.quality_gated.collect()}
    ids_frozen = {r["doc_id"] for r in frozen.quality_gated.collect()}
    assert ids_direct == ids_frozen
    # tied + solo sources keep 100%; varied keeps its top 80%
    assert set(range(5)) <= ids_direct and 50 in ids_direct
    assert len({i for i in ids_direct if i >= 100}) == 8
    # the operator-level window form agrees: kept=1 on every tied row
    from clickhouse_mysql_data_reader_spark.operators.text import (
        quality_calibrated,
    )

    op = quality_calibrated(docs, "text", "doc_id", "source", keep_pctile=0.2)
    tied_kept = {
        r["kept"] for r in op.filter(F.col("source") != "varied").collect()
    }
    assert tied_kept == {1}


def test_calibrate_pctile_validated(spark):
    with pytest.raises(ValueError, match="percent_rank"):
        CurationConfig(quality_calibrate_pctile=1.5)
    with pytest.raises(ValueError, match="pairs"):
        CurationConfig(quality_thresholds=(("web", "high"),))
    # JSON-shaped lists (the CLI path) are accepted
    CurationConfig(quality_thresholds=[["web", 0.3]])
