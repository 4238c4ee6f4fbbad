#!/usr/bin/env python
"""Check-rotation ledger (round-11 judge item 2): print the driver's
projected check queue — per-query last-driver-checked round, verified
status, and whether the query sits inside the next driver run's
50-check budget — and optionally publish it into SURVEY.md §8.1.

The ordering itself lives in ``registry.all_specs()`` (unverified
first, then verified stalest-first), so this script is a pure VIEW of
the queue the driver will actually walk; it can't drift from it.

Usage:
  python scripts/check_queue.py             # print the queue
  python scripts/check_queue.py --survey    # also regenerate SURVEY §8
  python scripts/check_queue.py --json FILE # machine-readable ledger
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--survey", action="store_true", help="rewrite SURVEY.md §8")
    ap.add_argument("--json", metavar="FILE", help="write the ledger as JSON")
    args = ap.parse_args()

    from etl_showcase_spark.registry import check_ledger

    rows = check_ledger()
    print(f"{'pos':>4} {'last-checked':>12} {'verified':>8}  name")
    for r in rows:
        if not r["in_budget"]:
            continue
        rnd = f"r{r['last_checked_round']}" if r["last_checked_round"] else "never"
        print(f"{r['pos']:>4} {rnd:>12} {str(r['verified']):>8}  {r['name']}")
    tail = [r for r in rows if not r["in_budget"]]
    by_round = Counter(r["last_checked_round"] for r in tail)
    print(f"--- budget cut: 50/{len(rows)} ---")
    print(
        "past budget by last-checked round: "
        + ", ".join(f"r{k}:{v}" for k, v in sorted(by_round.items()))
    )
    stale_unverified = [r for r in rows if not r["verified"] and not r["in_budget"]]
    if stale_unverified:
        print(
            "WARNING: unverified queries past the budget (will NOT be "
            f"checked next round): {[r['name'] for r in stale_unverified]}"
        )

    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"wrote {args.json}")
    if args.survey:
        from gen_survey_status import main as survey_main

        survey_main()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
