#!/usr/bin/env python
"""Empirical scaling check: time the most expensive catalog operators at
sf0.1 vs the generated 10x sf1 and report per-operator scaling exponents.

VERDICT r9 #4: SCALE.md's 100 TB claims are analytic (plan-shape tests +
docstrings); this measures the one thing analysis can't — the actual
sf0.1 -> sf1 wall-clock ratio. exponent = log(t_sf1 / t_sf0.1) / log(10):
~1.0 is linear in data volume, >1 names the next perf target. (A
sub-linear exponent is possible too: fixed per-query overhead — session,
planning, stage scheduling — still dominates some ops at sf0.1.)

Prereq: python tools/gen_scale_data.py   (writes _scale/sf1, gitignored)
Usage:  python tools/scale_check.py      (prints one JSON line; paste the
        table into docs/SCALE.md's "Measured scaling" section)

Same measurement discipline as bench.py: 48g heap, JVM warm-up, OS
page-cache warm for both dirs, noop-format writes, best of 2 reps with
construction bracketed (the iterative CC ops materialize passes eagerly
inside fn()).
"""

from __future__ import annotations

import glob
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

#: the five operators the r9 verdict named as most expensive, plus the
#: round-9 simhash near-dup it asked to include
OPS = [
    "emb_threshold_sweep",
    "doc_novelty",
    "mm_video_neardup",
    "doc_dedup_clusters",
    "emb_semantic_dedup",
    "doc_simhash_neardup",
    # round-10 operators over the documents/embeddings tables
    "doc_lsh_s_curve",
    "doc_minhash_k_sweep",
    "doc_source_drift",
    "doc_packing_efficiency",
    "doc_lang_confusion",
    "emb_dim_variance",
    "emb_pq_distortion",
    # round-11 operators with data-volume-bound kernels
    "doc_repetition_profile",
    "doc_minhash_containment",
    "emb_centroid_drift",
    # round-11 session-2: the four data-volume-bound additions (the
    # three ev_* additions reduce to the daily rollup immediately)
    "emb_hubness",
    "emb_intrinsic_dim",
    "doc_dedup_threshold_sweep",
    "doc_lexical_diversity",
    # round-11 session-3: the three data-volume-bound additions (the
    # three ev_* additions reduce to weekly/daily rollups immediately)
    "doc_detector_agreement",
    "emb_knn_purity",
    "emb_isotropy",
    # round-13: the three data-volume-bound additions (the two ev_*
    # additions reduce to user rollups immediately and measure on the
    # adversarial pair below; promql_at_subquery reduces to the events
    # grid after the pinned instant select)
    "doc_oph_minhash",
    "emb_effective_rank",
    "mm_phash_dct",
]

#: VERDICT r10 #4: the two window-bounded event operators, measured on
#: the ADVERSARIAL continuous-gap / zipf-user events pair (nearly
#: all-distinct ms gaps — the case the r10 DISTINCT collapse didn't
#: bound).  gen_scale_data.py --events writes the pair:
#:   python tools/gen_scale_data.py --events 100000  --events-only --out _scale/adv01
#:   python tools/gen_scale_data.py --events 1000000 --events-only --out _scale/adv1
EV_ADV_OPS = ["ev_interarrival", "ev_user_concentration",
              # round-13: the zipf-user axis is the adversarial case for
              # the per-user experiment folds; the pinned subquery is
              # grid-bound and measures on the same pair
              "ev_power_mde", "ev_diff_in_diff", "promql_at_subquery"]

SF01 = "/root/testdata/sf0.1"
_SCALE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "_scale")
SF1 = os.path.join(_SCALE, "sf1")
ADV01 = os.path.join(_SCALE, "adv01")
ADV1 = os.path.join(_SCALE, "adv1")


def warm_page_cache(d: str) -> None:
    for f in glob.glob(os.path.join(d, "*.parquet")):
        if os.path.isfile(f):
            with open(f, "rb") as fh:
                while fh.read(1 << 24):
                    pass


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--base", help="small-scale dir (default sf0.1 + adv01)")
    ap.add_argument("--big", help="large-scale dir (default _scale/sf1 + adv1)")
    ap.add_argument("--factor", type=float, default=10.0,
                    help="data-volume ratio big/base (exponent denominator)")
    ap.add_argument("--ops", help="comma-separated op subset")
    args = ap.parse_args()

    from squirreldb_spark.queries import CATALOG
    from squirreldb_spark.session import get_session

    spark = get_session("squirreldb-spark-scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    for warm in ("doc_simhash", "emb_cosine_knn"):
        CATALOG[warm].fn(spark, "/root/testdata/sf0.001").write.format(
            "noop").mode("overwrite").save()

    def run(name: str, sf_dir: str, reps: int = 2) -> float:
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = CATALOG[name].fn(spark, sf_dir)  # CC ops compute here
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        return round(min(runs), 3)

    if args.base and args.big:
        pairs = [(args.ops.split(","), args.base, args.big, args.factor)]
    else:
        pairs = [(args.ops.split(",") if args.ops else OPS, SF01, SF1, 10.0)]
        if os.path.isdir(ADV01) and os.path.isdir(ADV1) and not args.ops:
            pairs.append((EV_ADV_OPS, ADV01, ADV1, 10.0))

    out = {}
    for ops, base, big, factor in pairs:
        warm_page_cache(base)
        warm_page_cache(big)
        for name in ops:
            t01 = run(name, base)
            t1 = run(name, big)
            out[name] = {
                "base_sec": t01,
                "big_sec": t1,
                "base": os.path.basename(base.rstrip("/")),
                "big": os.path.basename(big.rstrip("/")),
                "ratio": round(t1 / t01, 2),
                "exponent": round(math.log(t1 / t01) / math.log(factor), 2),
            }
            print(f"# {name} [{out[name]['base']}->{out[name]['big']}]: "
                  f"{t01}s -> {t1}s  ratio {out[name]['ratio']}"
                  f"  exponent {out[name]['exponent']}", flush=True)
    print(json.dumps({"metric": "scale_check", "ops": out}))


if __name__ == "__main__":
    main()
