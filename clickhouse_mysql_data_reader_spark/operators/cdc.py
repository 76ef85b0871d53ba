"""CDC apply semantics — the unified merge path the reference lacks.

The reference replays binlog events with three divergent paths:
inserts go through the writer chain (mysqlreader.py:247-310) while
updates/deletes bypass it entirely as per-row ``ALTER TABLE``
mutations hardcoded to a column named ``id``
(mysqlreader.py:312-354, the author's own "super kludge").

Here all three ops flow through one declarative merge with explicit
ordering — correct under batching, parallelism, and re-delivery:

- events carry ``(op, log_file, log_pos, before, after)`` (FIXTURES F5);
- within a batch, the LAST event per key in binlog order wins
  (the reference gets this ordering for free by being single-threaded;
  distributed we must sort explicitly — SURVEY §7 'hard parts');
- a trailing delete removes the key; re-delivery of the same position
  is idempotent because ordering is total and deterministic.

Scale: one shuffle on the key for the window, one shuffle for the
outer merge join. State never exceeds |base| + |batch keys|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

OP_INSERT = "insert"
OP_UPDATE = "update"
OP_DELETE = "delete"


def latest_change_per_key(
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Collapse a CDC batch to the winning (latest) event per key.

    ``order_cols`` is the binlog total order, e.g. ``[log_file, log_pos]``
    (mysqlreader.py:356-360 checkpoints exactly this pair).
    """
    w = W.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_cdc_batch(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """MERGE a batch of row-level changes into a snapshot.

    - delete wins  -> key removed
    - insert/update -> row replaced by the event's payload columns
    - untouched keys pass through

    ``changes`` must carry the payload columns (same names as ``base``)
    plus ``op_col`` and ``order_cols``.
    """
    winner = latest_change_per_key(changes, key_cols, order_cols)
    payload_cols = [c for c in base.columns]
    upserts = winner.filter(F.col(op_col) != OP_DELETE).select(*payload_cols)
    touched_keys = winner.select(*key_cols)
    survivors = base.join(touched_keys, on=key_cols, how="left_anti")
    return survivors.unionByName(upserts)


def cdc_final_state(
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    payload_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Fold a complete change log (no prior base) into its final state:
    latest event per key, dropping keys whose last op is a delete.
    This is the ReplacingMergeTree-with-deletes contract in one pass."""
    winner = latest_change_per_key(changes, key_cols, order_cols)
    return winner.filter(F.col(op_col) != OP_DELETE).select(*payload_cols)
