#!/usr/bin/env python
"""Per-stage wall-time profile of one registered query (guide §1:
measure first, attribute time to stages before touching anything).

Runs the query end-to-end with the noop sink (2 untimed warm-ups, then
one metered run) and prints, for every stage of the metered run:
submission→completion wall ms, task count, shuffle read/write bytes,
and the first line of the stage's name (which names the boundary
operator). Reads the driver's AppStatusStore — no UI needed, no extra
jobs.

Run: python scripts/profile_query.py <query_name> [sf_dir] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = sys.argv[3] if len(sys.argv) > 3 else os.environ.get("SPARK_GRAFT_CPUS", "32")

    from etl_showcase_spark.caching import release_all
    from etl_showcase_spark.registry import all_specs
    from etl_showcase_spark.session import get_spark

    spark = get_spark(
        app_name=f"profile-{name}",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spec = all_specs()[name]

    # same conditioning as bench.py: warm the Python worker pool, then
    # two untimed warm-ups so codegen/JIT reach steady state
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").write.mode(
        "overwrite"
    ).format("noop").save()
    for _ in range(2):
        spec.build(spark, sf_dir).write.mode("overwrite").format("noop").save()

    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    jvm, gw = sc._jvm, sc._gateway

    def stage_rows():
        stages = store.stageList(
            jvm.java.util.ArrayList(), False, False,
            gw.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
        )
        rows = {}
        for i in range(stages.size()):
            s = stages.apply(i)
            sub = s.submissionTime()
            comp = s.completionTime()
            if sub.isEmpty() or comp.isEmpty():
                continue
            ms = comp.get().getTime() - sub.get().getTime()
            rows[(s.stageId(), s.attemptId())] = (
                ms,
                s.numCompleteTasks(),
                s.shuffleReadBytes(),
                s.shuffleWriteBytes(),
                (s.name() or "").splitlines()[0][:90],
            )
        return rows

    before = set(stage_rows())
    t0 = time.perf_counter()
    spec.build(spark, sf_dir).write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0
    rows = {k: v for k, v in stage_rows().items() if k not in before}

    print(f"query={name} wall={wall:.3f}s stages={len(rows)}")
    total_ms = sum(v[0] for v in rows.values())
    print(f"sum(stage wall)={total_ms} ms (stages overlap; gaps = driver/plan time)")
    print(f"{'stage':>8} {'ms':>7} {'tasks':>5} {'shufR':>10} {'shufW':>10}  name")
    for (sid, att), (ms, ntask, srb, swb, nm) in sorted(rows.items()):
        print(f"{sid:>8} {ms:>7} {ntask:>5} {srb:>10} {swb:>10}  {nm}")
    release_all()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
