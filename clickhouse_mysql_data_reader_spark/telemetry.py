"""O7 — throughput telemetry (SURVEY §2.5).

The reference logs rows/sec every 100k rows from its reader loop
(mysqlreader.py:135-153, 229-239) and buckets/sec per pool rotation
(bbpool.py:159-177). Spark equivalents:

- batch: ``pyspark.sql.Observation`` — metrics collected ON the
  executors during the normal pass (zero extra jobs, unlike count()),
- streaming: a ``StreamingQueryListener`` reading each progress event's
  input-rate counters.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

log = logging.getLogger(__name__)


def observed_rows(df: DataFrame, name: str = "telemetry") -> tuple[DataFrame, Observation]:
    """Attach a row-count observation to a batch plan. After ANY action
    on the returned frame, ``obs.get["n_rows"]`` holds the exact count —
    piggybacked on the action, no second pass over the data."""
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("n_rows")), obs


@dataclass
class BatchRate:
    """rows/sec wrapper for a batch write: measure around an action."""

    started_at: float = field(default_factory=time.perf_counter)

    def report(self, obs: Observation) -> dict[str, float]:
        elapsed = time.perf_counter() - self.started_at
        n = int(obs.get["n_rows"])
        rate = n / elapsed if elapsed > 0 else 0.0
        log.info("batch telemetry: %d rows in %.2fs (%.0f rows/sec)", n, elapsed, rate)
        return {"rows": n, "seconds": elapsed, "rows_per_sec": rate}


class RateListener(StreamingQueryListener):
    """Streaming rows/sec per micro-batch — the reference's
    performance_report cadence, driven by Spark's own progress events
    instead of hand-counted rows. Attach with
    ``spark.streams.addListener(listener)``."""

    def __init__(self) -> None:
        self.progress: list[dict[str, float]] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        rec = {
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "rows_per_sec": p.processedRowsPerSecond or 0.0,
            # watermark-drop + state-size observability: late rows a
            # watermarked aggregate/dedup silently discards are the #1
            # silent-data-loss channel in a streaming pipeline — surface
            # them per batch so an alert can fire when the late fraction
            # spikes (e.g. an upstream producer's clock drifted)
            "rows_dropped_by_watermark": sum(
                int(so.numRowsDroppedByWatermark or 0)
                for so in (p.stateOperators or [])
            ),
            "state_rows": sum(
                int(so.numRowsTotal or 0) for so in (p.stateOperators or [])
            ),
        }
        self.progress.append(rec)
        log.info(
            "stream telemetry: batch=%s rows=%s (%.0f rows/sec)",
            rec["batch_id"],
            rec["num_input_rows"],
            rec["rows_per_sec"],
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    @property
    def total_rows(self) -> int:
        return int(sum(r["num_input_rows"] for r in self.progress))
