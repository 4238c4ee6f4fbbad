#!/usr/bin/env python
"""Regenerate the plan gallery (default PLANS_r06.md): the `explain('formatted')` capture of every
bench-headline query — committed so plan quality is reviewable as an
artifact (pushed filters, pruned ReadSchema, broadcast dims, codegen
spans), not just asserted by scripts/audit_plans.py's checks.

Run: python scripts/gen_plan_gallery.py [sf_dir] [out_md]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from etl_showcase_spark.registry import bench_specs
    from etl_showcase_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS_r06.md"
    )
    spark = get_spark(
        app_name="plan-gallery",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.maxMetadataStringLength": "500",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    import re as _re

    base = os.path.basename(out_path)
    m = _re.match(r"PLANS_r(\d+)\.md", base)
    title_round = f" (round {int(m.group(1))})" if m else ""
    out = [
        f"# Physical plans — bench headline suite{title_round}",
        "",
        "`df.explain('formatted')` capture for every bench query at sf0.01,",
        "regenerated with `python scripts/gen_plan_gallery.py`. What to look",
        "for per the design rules (README): `PushedFilters` on filtered scans,",
        "pruned `ReadSchema`, broadcast joins on dims, no CartesianProduct",
        "outside the documented baselines, WholeStageCodegen spans around",
        "expression-heavy stages.",
        "",
    ]
    for name, spec in sorted(bench_specs().items()):
        df = spec.build(spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out.append(f"## {name}\n\n```\n{plan.rstrip()}\n```\n")
    with open(out_path, "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
