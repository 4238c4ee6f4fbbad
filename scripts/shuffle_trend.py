#!/usr/bin/env python
"""Shuffle-efficiency trend (round-13): turn the per-query shuffle
counters bench.py lands in SHUFFLE_BENCH.json into the two numbers
that matter for a 100 TB plan review, per headline query:

  - amplification = shuffle_write_bytes / input_bytes — how many bytes
    cross the wire per byte scanned. The scale-efficiency headline: a
    query that scans 100 TB with amplification 0.001 shuffles 100 GB;
    one with amplification 1.0 shuffles the lake.
  - budget_utilization = shuffle_write_bytes / pinned budget
    (tests/test_pipeline_integrity.py SHUFFLE_BUDGETS) — headroom
    before the CI regression gate trips.

Writes SHUFFLE_TREND_r{N}.json and, when a prior round's trend file
exists in the repo root, a round-over-round delta per query so a
creeping Exchange shows up as a NUMBER across rounds, not just a
one-round budget pass.

Usage: python scripts/shuffle_trend.py [--round N] [--in FILE]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=13)
    ap.add_argument("--in", dest="infile", default=os.path.join(REPO, "SHUFFLE_BENCH.json"))
    args = ap.parse_args()

    from tests.test_pipeline_integrity import SHUFFLE_BUDGETS

    with open(args.infile) as fh:
        doc = json.load(fh)
    shuffle = doc["shuffle"]

    rows = {}
    for name, s in sorted(shuffle.items()):
        inp = s.get("input_bytes", 0)
        wr = s.get("shuffle_write_bytes", 0)
        budget = SHUFFLE_BUDGETS.get(name)
        rows[name] = {
            "shuffle_write_bytes": wr,
            "shuffle_write_records": s.get("shuffle_write_records", 0),
            "input_bytes": inp,
            "amplification": round(wr / inp, 6) if inp else None,
            "budget_bytes": budget,
            "budget_utilization": round(wr / budget, 3) if budget else None,
            "spill_bytes": s.get("disk_spill_bytes", 0) + s.get("memory_spill_bytes", 0),
        }

    # round-over-round: diff against the newest prior trend file
    prior_files = sorted(
        f
        for f in glob.glob(os.path.join(REPO, "SHUFFLE_TREND_r*.json"))
        if (m := re.search(r"r(\d+)", os.path.basename(f))) and int(m.group(1)) < args.round
    )
    deltas = None
    if prior_files:
        with open(prior_files[-1]) as fh:
            prior = json.load(fh)["queries"]
        deltas = {
            name: {
                "write_bytes_delta": r["shuffle_write_bytes"]
                - prior[name]["shuffle_write_bytes"],
                "amplification_prev": prior[name]["amplification"],
            }
            for name, r in rows.items()
            if name in prior
        }

    out = {
        "round": args.round,
        "conditioning": doc.get("conditioning"),
        "sf": doc.get("sf"),
        "queries": rows,
        "deltas_vs_prior_round": deltas,
        "reading": (
            "amplification = shuffle bytes per scanned byte (the 100 TB "
            "headline); utilization = fraction of the CI-pinned budget. "
            "spill_bytes must stay 0 (also pinned in tests)."
        ),
    }
    path = os.path.join(REPO, f"SHUFFLE_TREND_r{args.round:02d}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    worst = max(
        (r["amplification"], n) for n, r in rows.items() if r["amplification"]
    )
    print(f"wrote {path}; worst amplification: {worst[1]} = {worst[0]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
