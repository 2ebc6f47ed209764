#!/usr/bin/env python
"""Compute the verify-window backfill queue from the driver's records.

The driver attests the FIRST 50 catalog entries each round
(CORRECTNESS_r{N}.json). The standing ratchet rule (queries.py, comment
above _VERIFY_FIRST) rotates the window by priority: (0) never-attested
entries, (1) rows whose kernels changed after their newest green row,
(2) oldest-attestation backfill. This tool computes (0) and (2) exactly
— (1) is the builder's knowledge of what the current round touched.

Usage: python tools/verify_window_queue.py
Prints the per-round newest-attestation histogram and the oldest
cohorts in catalog order, ready to paste into _VERIFY_FIRST.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections import Counter, defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    newest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        for name, v in json.load(open(f)).items():
            ok = (
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match") in (True, None)
                and not v.get("err")
            )
            if ok:
                newest[name] = max(newest.get(name, 0), rnd)

    from squirreldb_spark.queries import CATALOG

    never = [n for n in CATALOG if n not in newest]
    hist = Counter(newest[n] for n in CATALOG if n in newest)
    print("newest-attestation histogram:",
          dict(sorted(hist.items())), f"never={len(never)}")
    if never:
        print("\n(0) never attested:")
        for n in never:
            print(f"    \"{n}\",")
    by_round: dict[int, list[str]] = defaultdict(list)
    for n in CATALOG:
        if n in newest:
            by_round[newest[n]].append(n)
    for rnd in sorted(by_round)[:3]:
        rows = by_round[rnd]
        print(f"\n(2) r{rnd} cohort ({len(rows)} rows):")
        for n in sorted(rows):
            print(f"    \"{n}\",")


if __name__ == "__main__":
    main()
