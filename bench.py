#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop-format write (full computation,
no driver collect overhead). Wall time per query plus the total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: headline set: TSDB hot paths + relational joins + pre-agg routing
BENCH_QUERIES = [
    "ts_rate",
    "ts_instant_selector",
    "ts_downsample_5m",
    "ts_agg_sum_by",
    "ts_topk",
    "ts_quantile_over_time",
    "ts_preagg_route_rate",
    "ts_stitch_preagg_raw",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    # PromQL-string path (parser + planner -> one Catalyst plan)
    "promql_rate_sum",
    # bounded /query_range: time-bound pushdown prunes the fact scan
    "api_bounded_scan",
    # LLM-data pipeline operators
    "doc_exact_dedup",
    "doc_minhash_lsh_pairs",
    "doc_simhash",
    "emb_cosine_knn",
    "emb_ann_ivf",
]


def main() -> None:
    import glob

    from squirreldb_spark.queries import CATALOG
    from squirreldb_spark.session import get_session

    spark = get_session("squirreldb-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM once so timings measure execution, not first-run codegen:
    # run the two dominant plan shapes (windowed range-agg, exact
    # percentile) against the tiny sf0.001 data. Production query services
    # are warm; cold-start JIT is not the thing this benchmark tracks.
    for warm in ("ts_rate", "ts_quantile_over_time"):
        CATALOG[warm].fn(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
    # Warm the OS page cache for the bench SF's parquet (round-2 diagnosis:
    # a cold cache inflated first-in-list queries up to 1.9x; the r1-vs-r2
    # per-query deltas reproduced as pure IO-cache state, identical plans).
    # A production cluster reads hot storage/OS cache; cold-disk IO is a
    # property of the box, not of the query plans this tracks.
    for f in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass

    # Two timed repetitions per query, report the faster (steady state):
    # a single sample conflates GC pauses and stage-scheduling jitter with
    # plan cost, which is what burned the round-2 comparison.
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best = float("inf")
        for _ in range(2):
            df = CATALOG[name].fn(spark, SF_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
