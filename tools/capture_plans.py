#!/usr/bin/env python
"""Capture .explain("formatted") output for catalog queries.

Usage:
    python tools/capture_plans.py <out_dir> <suffix> [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` for each query (default: the
bench blocks' union).  Plans are captured against $SPARK_GRAFT_SF_DIR
(default sf0.1) — planning only, nothing is executed, so this is cheap
and safe to run alongside other work.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)

    from squirreldb_spark.queries import CATALOG
    from squirreldb_spark.session import get_session

    if not names:
        import bench

        names = (
            bench.BENCH_QUERIES + bench.SECONDARY_QUERIES + bench.ITERATIVE_QUERIES
        )

    spark = get_session("squirreldb-spark-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = CATALOG[name].fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - record the failure, keep going
            plan = f"PLAN CAPTURE FAILED: {exc!r}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"captured {name}")
    spark.stop()


if __name__ == "__main__":
    main()
