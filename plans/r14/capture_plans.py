#!/usr/bin/env python
"""Capture .explain("formatted") for every registered query.

Usage: python plans/r14/capture_plans.py <outdir> <suffix> [names...]
Writes <outdir>/<query>_<suffix>.txt for each query (all registered
queries when no names are given). Plan capture only — nothing executes
(explain is lazy), so this is safe to run alongside other work.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

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
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - record the failure, keep going
            plan = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(name, flush=True)


if __name__ == "__main__":
    main()
