#!/usr/bin/env python
"""Append/refresh a round's headline basis in docs/BENCH_HISTORY.json.

VERDICT r10 #1: round-over-round bench deltas must be computed against a
COMMITTED per-round basis, not remembered across verdicts.  Two entry
kinds:

- builder entries (default): taken from the repo-root bench_detail.json
  + the final bench line written by the builder's end-of-round
  `python bench.py` run.  `--round rNN` labels it.
- driver reconciliation (`--from-driver BENCH_rNN.json`): at the next
  round's open, the driver's own record for the closed round replaces
  the builder's preliminary entry (same frozen basis, authoritative
  source).

Usage:
  python bench.py > /tmp/bench_out.txt          # writes bench_detail.json
  python tools/update_bench_history.py --round r11 \
      --final-line "$(tail -1 /tmp/bench_out.txt)"
  python tools/update_bench_history.py --round r11 --from-driver BENCH_r11.json
"""

from __future__ import annotations

import argparse
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HIST = os.path.join(ROOT, "docs", "BENCH_HISTORY.json")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", required=True, help="e.g. r11")
    ap.add_argument("--final-line", help="the final JSON line bench.py printed")
    ap.add_argument("--from-driver", help="path to the driver's BENCH_rNN.json")
    args = ap.parse_args()

    hist = json.load(open(HIST))
    if args.from_driver:
        rec = json.load(open(args.from_driver))
        parsed = rec.get("parsed") or rec
        if parsed is None or "queries" not in parsed:
            raise SystemExit(f"{args.from_driver}: parsed is null — nothing "
                             "to reconcile; keep the builder entry")
        source = "driver"
        out = parsed
        median = parsed.get("value_median")
    elif args.final_line:
        out = json.loads(args.final_line)
        source = "builder"
        median = out.get("value_median")
    else:
        raise SystemExit("need --final-line or --from-driver")

    entry = {
        "source": source,
        "value": out["value"],
        "value_median": median,
        "value_min": out.get("value_min"),
        "queries": out["queries"],
        "ingest_samples_per_s": (out.get("ingest") or {}).get("samples_per_s"),
        # VERDICT r12 noted "no committed QPS basis yet" — the final
        # line's qps dict becomes one
        "qps": out.get("qps"),
    }
    # VERDICT r11 #1: the secondary block gets a committed per-round basis
    # too (per-query medians), read from the builder's bench_detail.json.
    # The driver's BENCH_rNN.json carries only the headline line, so a
    # driver reconciliation keeps the builder's secondary medians.
    # VERDICT r12 #1 adds the iterative block to the same treatment.
    prior = hist["rounds"].get(args.round, {})
    for key in ("secondary_median", "iterative_median"):
        if source == "builder":
            try:
                detail = json.load(
                    open(os.path.join(ROOT, "bench_detail.json")))
                entry[key] = detail[key]
            except Exception:
                entry[key] = prior.get(key)
        else:
            entry[key] = prior.get(key)
    hist["rounds"][args.round] = entry
    with open(HIST, "w") as fh:
        json.dump(hist, fh, indent=1, sort_keys=True)
    print(f"{args.round} <- {source}: value={out['value']} median={median}")


if __name__ == "__main__":
    main()
