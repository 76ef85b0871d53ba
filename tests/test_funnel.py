"""Unit tests for the funnel/retention operators — the ordering, window
and greedy-start semantics the histogram oracle can't isolate."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from clickhouse_mysql_data_reader_spark.operators.funnel import (
    funnel_levels,
    retention_flags,
)

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    data = [(u, BASE + dt.timedelta(seconds=s), t) for (u, s, t) in rows]
    return spark.createDataFrame(
        data, "user_id long, ts timestamp, event_type string"
    )


def _levels(spark, rows, window_seconds=100):
    df = funnel_levels(
        _ev(spark, rows), ["view", "click", "purchase"], window_seconds
    )
    return {r["user_id"]: r["funnel_level"] for r in df.collect()}


def test_funnel_full_chain_and_partials(spark):
    got = _levels(
        spark,
        [
            # user 1: complete chain in order, inside window
            (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
            # user 2: purchase BEFORE click -> stops at level 2
            (2, 0, "view"), (2, 5, "purchase"), (2, 10, "click"),
            # user 3: view only
            (3, 0, "view"),
            # user 4: click without view -> level 0
            (4, 0, "click"), (4, 1, "purchase"),
        ],
    )
    assert got == {1: 3, 2: 2, 3: 1, 4: 0}


def test_funnel_window_cutoff_from_chain_start(spark):
    # click inside window, purchase at start+150 > window=100 -> level 2;
    # the window anchors at the FIRST step, not the previous one
    got = _levels(
        spark,
        [(1, 0, "view"), (1, 90, "click"), (1, 150, "purchase")],
        window_seconds=100,
    )
    assert got == {1: 2}


def test_funnel_greedy_earliest_start(spark):
    # documented greedy semantics: the chain anchors at the EARLIEST
    # view (t=0), so the click at t=250 is out of window even though a
    # later view (t=200) would have completed the chain
    got = _levels(
        spark,
        [(1, 0, "view"), (1, 200, "view"), (1, 250, "click")],
        window_seconds=100,
    )
    assert got == {1: 1}


def test_funnel_strictly_after_previous_step(spark):
    # click exactly at the view's timestamp does not count (strict >)
    got = _levels(spark, [(1, 0, "view"), (1, 0, "click")])
    assert got == {1: 1}


def test_funnel_rejects_bad_steps(spark):
    with pytest.raises(ValueError, match="steps"):
        funnel_levels(_ev(spark, [(1, 0, "view")]), [], 100)


def test_retention_and_chain(spark):
    ev = _ev(
        spark,
        [
            (1, 0, "signup"), (1, 10, "click"),
            (2, 0, "click"), (2, 10, "purchase"),  # no signup -> all 0
            (3, 0, "signup"),
        ],
    )
    flags = retention_flags(
        ev,
        [
            F.col("event_type") == "signup",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
    )
    got = {r["user_id"]: (r["r0"], r["r1"], r["r2"]) for r in flags.collect()}
    assert got == {1: (1, 1, 0), 2: (0, 0, 0), 3: (1, 0, 0)}


def test_funnel_and_retention_single_shuffle(spark, sf_correct):
    import __spark_entry__ as entrymod
    from tests.test_plans import _formatted, _n_exchanges

    plan = _formatted(entrymod.queries()["funnel_window_3step"](spark, sf_correct))
    # fold on user + final histogram agg: two keyed exchanges, NO joins
    assert _n_exchanges(plan) <= 2, plan
    assert "Join" not in plan
    plan = _formatted(entrymod.queries()["retention_cohorts"](spark, sf_correct))
    assert _n_exchanges(plan) == 1, plan
    assert "Join" not in plan
