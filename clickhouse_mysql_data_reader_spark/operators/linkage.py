"""Blocked fuzzy record linkage (entity resolution primitives).

A training-data pipeline constantly reconciles noisy string identities
— source names, site hosts, product/entity mentions — where exact
dedup misses one-edit variants. The classic scale answer is BLOCKED
matching: compare only within a cheap blocking key (a token, a prefix,
a phonetic code), never all-pairs. This is the string-edit sibling of
the shingle/LSH near-dup family (operators/dedup.py): same
candidate-bounding idea, Levenshtein instead of Jaccard, and — the
load-bearing trick — matching runs over the DISTINCT-VALUE DICTIONARY
(with carried frequencies), not the row stream, so a 100 TB corpus
with a few million distinct names pairs millions, not trillions.

Within a block the candidate set is O(|block|^2): the operator is for
dictionary-sized relations (names, hosts, titles), and skewed blocks
should be tightened (two-token keys) rather than salted — salting
cannot split a quadratic self-join's hot block without losing pairs.

Levenshtein is a JVM built-in expression on Spark (and a native
function in DuckDB), so the whole plan is scan + one dictionary
groupBy + one blocked self-join — no Python, no UDF.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["fuzzy_match_pairs", "fuzzy_link_best"]


def _dictionary(
    df: DataFrame, text_col: str, block_fn: Callable[[Column], Column]
) -> DataFrame:
    """Distinct values of ``text_col`` with occurrence counts and the
    blocking key — one map-side-combined groupBy; the dictionary is
    what every later stage joins, the row stream is never self-joined."""
    return (
        df.where(F.col(text_col).isNotNull())
        .groupBy(F.col(text_col).alias("name"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("name", "n", block_fn(F.col("name")).alias("blk"))
    )


def fuzzy_match_pairs(
    df: DataFrame,
    text_col: str,
    block_fn: Callable[[Column], Column],
    max_dist: int = 2,
) -> DataFrame:
    """All near-match pairs among the distinct values of ``text_col``:
    same blocking key, Levenshtein(a, b) <= max_dist, emitted once with
    ``name_a < name_b``. Returns (name_a, name_b, dist, n_a, n_b) where
    n_* are the row frequencies each name stands for — a reviewable
    merge proposal, the entity-resolution analogue of the near-dup pair
    reports."""
    d = _dictionary(df, text_col, block_fn)
    a = d.select(
        F.col("name").alias("name_a"), F.col("n").alias("n_a"), "blk"
    )
    b = d.select(
        F.col("name").alias("name_b"), F.col("n").alias("n_b"), "blk"
    )
    return (
        a.join(b, "blk")
        .where(F.col("name_a") < F.col("name_b"))
        .where(F.levenshtein("name_a", "name_b") <= max_dist)
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("int").alias("dist"),
            "n_a",
            "n_b",
        )
    )


def fuzzy_link_best(
    probe: DataFrame,
    reference: DataFrame,
    text_col: str,
    block_fn: Callable[[Column], Column],
    max_dist: int = 2,
) -> DataFrame:
    """Link each distinct probe value to its BEST reference value:
    same block, distance <= max_dist, winner = min (dist, ref_name) —
    the deterministic min(struct) election the keeper operators use
    (operators/dedup.py), so ties never flap between runs. Returns
    (name, n, match, dist); unmatched probes keep NULL match (left
    join), so the caller sees coverage, not just hits."""
    p = _dictionary(probe, text_col, block_fn)
    r = _dictionary(reference, text_col, block_fn).select(
        F.col("name").alias("ref_name"), "blk"
    )
    cand = p.join(r, "blk", "left").withColumn(
        "dist",
        F.when(
            F.col("ref_name").isNotNull(),
            F.levenshtein("name", "ref_name"),
        ),
    )
    # the distance gate lives INSIDE the aggregate: a probe whose block
    # candidates all miss the gate must still come out (match = NULL),
    # and a WHERE would silently drop it
    best = F.min(
        F.when(F.col("dist") <= max_dist, F.struct("dist", "ref_name"))
    )
    return (
        cand.groupBy("name", "n")
        .agg(best.alias("best"))
        .select(
            "name",
            "n",
            F.col("best.ref_name").alias("match"),
            F.col("best.dist").cast("int").alias("dist"),
        )
    )
