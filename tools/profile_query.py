#!/usr/bin/env python
"""Per-stage profile of catalog queries via the UI REST API.

Usage: python tools/profile_query.py <query> [query ...]

Runs each query with the noop sink (guide §1.4), 4 reps after a
sf0.001 plan warm-up, and prints per-rep wall time plus the per-stage
breakdown of the final rep (submission->completion wall, executor run
time, task count, stage name) from the local UI's REST API — the
scripted stand-in for the Stages tab (guide §7.1).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/{path}") as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1:]
    os.environ.setdefault("SPARK_GRAFT_UI", "1")

    from pyspark.sql import SparkSession
    from squirreldb_spark.queries import CATALOG
    from squirreldb_spark.session import configure_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.appName("squirreldb-spark-profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    configure_session(spark)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    for name in names:
        CATALOG[name].fn(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
        reps = []
        first_stage_of_last_rep = 0
        for rep in range(4):
            before = _rest(spark, "stages")
            max_sid = max((s["stageId"] for s in before), default=-1)
            t0 = time.perf_counter()
            df = CATALOG[name].fn(spark, SF_DIR)
            t_ctor = time.perf_counter() - t0
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t1
            reps.append((t_ctor, dt))
            first_stage_of_last_rep = max_sid + 1
        print(f"\n=== {name}: (ctor, exec) per rep:",
              [(round(c, 3), round(d, 3)) for c, d in reps], flush=True)
        stages = [
            s for s in _rest(spark, "stages")
            if s["stageId"] >= first_stage_of_last_rep
            and s["status"] in ("COMPLETE", "FAILED")
        ]
        stages.sort(key=lambda s: s["stageId"])
        total_exec = sum(s.get("executorRunTime", 0) for s in stages)
        print(f"    last rep: {len(stages)} stages, "
              f"executorRunTime total {total_exec} ms")
        for s in stages:
            sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
            comp = s.get("completionTime")
            wall = ""
            try:
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                wall = round((datetime.strptime(comp, fmt)
                              - datetime.strptime(sub, fmt)).total_seconds(), 3)
            except Exception:
                pass
            print(
                f"      s{s['stageId']}: wall={wall}s run={s.get('executorRunTime')}ms "
                f"tasks={s.get('numCompleteTasks')} in={s.get('inputBytes')}B "
                f"sh_r={s.get('shuffleReadBytes')}B sh_w={s.get('shuffleWriteBytes')}B "
                f"| {s['name'].splitlines()[0][:70]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
