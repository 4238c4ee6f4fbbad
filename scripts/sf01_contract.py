#!/usr/bin/env python
"""Summarize a full drive_driver_contract.py sweep log into the
per-round SF01_CONTRACT_r{N}.json artifact (the builder's own
full-registry proof at sf0.1 — the scale the driver's bench runs at but
its 50-query correctness budget never covers).

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    python scripts/drive_driver_contract.py > sweep.log 2>&1
  python scripts/sf01_contract.py sweep.log --round 12
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--sf", default="sf0.1")
    args = ap.parse_args()

    text = open(args.log, errors="replace").read()
    rows = re.findall(
        r"^\s+(\w+): (MATCH|rows-only \(\d+ rows\)|MISMATCH.*|ERROR.*)$",
        text,
        re.MULTILINE,
    )
    match = sorted(n for n, s in rows if s == "MATCH")
    rows_only = sorted(n for n, s in rows if s.startswith("rows-only"))
    bad = {n: s for n, s in rows if not (s == "MATCH" or s.startswith("rows-only"))}
    result = re.search(r"^RESULT: (.*)$", text, re.MULTILINE)

    out = {
        "probe": (
            f"builder full-registry driver-contract sweep at {args.sf} on "
            "session HEAD (every queries() entry vs its DuckDB oracle: "
            "rows + schema + order-insensitive value hash)"
        ),
        "result": result.group(1) if result else "INCOMPLETE",
        "n_queries": len(rows),
        "n_hash_match": len(match),
        "rows_only": rows_only,
        "failures": bad,
    }
    path = os.path.join(REPO, f"SF01_CONTRACT_r{args.round:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {out['result']} ({len(match)} hash, {len(rows_only)} rows-only, {len(bad)} bad)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
