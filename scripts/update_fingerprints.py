#!/usr/bin/env python
"""Bless VERIFIED_FINGERPRINTS.json — the content identities that driver
CORRECTNESS rows attest to (closes the stale-verification loophole the
round-3 judge found: a query edited after its green row kept verified
status and could dodge re-checking forever).

Default mode (run at ROUND START, before touching any query code):
  for every query with a green/rows-only row in the LATEST
  CORRECTNESS_r*.json, stamp its CURRENT fingerprint. This is sound
  because the latest round's rows were computed against the committed
  tree, which is exactly the tree at round start. Names absent from the
  latest round keep their previously blessed fingerprint — if their
  code changed since, the mismatch keeps them un-verified (re-queued),
  which is the point.

--bootstrap mode (one-time migration): stamp every query that has any
  verified row across ALL rounds, minus --exclude names known to have
  been edited after their green row.

Usage:
  python scripts/update_fingerprints.py
  python scripts/update_fingerprints.py --bootstrap \
      --exclude join_anti_no_orders q5_local_supplier_volume
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from etl_showcase_spark import registry  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bootstrap", action="store_true")
    ap.add_argument("--exclude", nargs="*", default=[])
    ap.add_argument(
        "--unbless",
        nargs="+",
        metavar="NAME",
        help="remove the named fingerprints (run after EDITING a blessed "
        "query mid-round: its green row attests the OLD code, so the "
        "query must re-queue for a fresh driver check)",
    )
    args = ap.parse_args()

    specs = dict(registry.all_specs())
    stored = registry._stored_fingerprints()
    verified = registry._driver_verified()  # union of all rounds

    if args.unbless:
        missing = [n for n in args.unbless if n not in stored]
        if missing:
            sys.exit(f"not blessed: {missing}")
        out = {n: fp for n, fp in stored.items() if n not in set(args.unbless)}
        registry._FINGERPRINT_PATH.write_text(
            json.dumps(dict(sorted(out.items())), indent=1) + "\n"
        )
        print(f"un-blessed {len(args.unbless)}: {sorted(args.unbless)}")
        return

    if args.bootstrap:
        bless = set(verified) - set(args.exclude)
    else:
        rounds = sorted(REPO.glob("CORRECTNESS_r*.json"))
        if not rounds:
            sys.exit("no CORRECTNESS_r*.json files found")
        latest = json.loads(rounds[-1].read_text())
        bless = {
            name
            for name, row in latest.items()
            if isinstance(row, dict)
            and (
                row.get("hash_match") is True
                or (row.get("err") == "no_oracle" and row.get("spark_rows") is not None)
            )
        } - set(args.exclude)

    out = {n: fp for n, fp in stored.items() if n in specs}  # prune dead names
    fresh = 0
    for name in sorted(bless):
        if name not in specs:
            continue
        fp = registry.query_fingerprint(specs[name])
        if out.get(name) != fp:
            fresh += 1
        out[name] = fp

    registry._FINGERPRINT_PATH.write_text(
        json.dumps(dict(sorted(out.items())), indent=1) + "\n"
    )
    unverified = [
        n
        for n in specs
        if n in verified and out.get(n) != registry.query_fingerprint(specs[n])
    ]
    print(f"blessed {len(out)} fingerprints ({fresh} new/changed)")
    if unverified:
        print(f"re-queued (green row but stale/absent fingerprint): {unverified}")


if __name__ == "__main__":
    main()
