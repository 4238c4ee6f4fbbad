#!/usr/bin/env python
"""Capture `explain('formatted')` per bench query into per-query files
(`plans/r{N}/<query>_{suffix}.txt`) — the optimization round's
before/after plan evidence, at the bench's own scale and core count so
the plan (partition counts, AQE inputs) is the one the bench times.

Run: python scripts/gen_round_plans.py <out_dir> <suffix> [sf_dir] [cpus] [names...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    cpus = sys.argv[4] if len(sys.argv) > 4 else "32"
    only = set(sys.argv[5:])

    from etl_showcase_spark.registry import all_specs, bench_specs
    from etl_showcase_spark.session import get_spark

    spark = get_spark(
        app_name="round-plans",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.maxMetadataStringLength": "500",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    # explicit names may target ANY registered query (r14: the round's
    # targets are mostly non-bench paths); default stays the bench set
    specs = all_specs() if only else bench_specs()
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        df = spec.build(spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} @ {sf} local[{cpus}] ({suffix})\n\n{plan}")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
