#!/usr/bin/env python
"""Capture .explain("formatted") for registered queries.

Usage: python plans/r15/capture_plans.py <outdir> <suffix> [names...]
Writes <outdir>/<query>_<suffix>.txt for each query (all registered
queries when no names are given). Plan capture only — nothing executes
(explain is lazy), so this is safe to run alongside other work.

Round-15 hygiene (r14 ADVICE): the repo root is derived from __file__
instead of a hardcoded path, and the capture goes through the public
DataFrame.explain() (stdout redirect) rather than the private
PythonSQLUtils JVM hook.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    os.makedirs(outdir, exist_ok=True)

    from clickhouse_mysql_data_reader_spark.session import get_spark

    spark = get_spark(app_name="plan_capture", master="local[2]",
                      shuffle_partitions=32)
    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    for name, fn in qmap.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001 - record the failure, keep going
            plan = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(name, flush=True)


if __name__ == "__main__":
    main()
