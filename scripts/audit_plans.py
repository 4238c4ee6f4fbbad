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
    # --all audits every registered query (slower); default = bench set
    audit_all = "--all" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--all"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    from etl_showcase_spark.registry import all_specs, bench_specs
    from etl_showcase_spark.session import get_spark

    spark = get_spark(
        app_name="plan-audit",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={
            "spark.ui.enabled": "false",
            # default 100-char metadata truncation cuts ReadSchema mid-
            # column and breaks width counting
            "spark.sql.maxMetadataStringLength": "2000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    specs = all_specs() if audit_all else bench_specs()
    for name, spec in sorted(specs.items()):
        try:
            df = spec.build(spark, sf_dir)
        except Exception as e:
            # a registered query that cannot even BUILD is a failure,
            # not a skip — the audit gate must stay red until it plans
            failures.append(name)
            print(f"{name:28s} BUILD FAILED ({type(e).__name__})")
            continue
        plan = df._jdf.queryExecution().executedPlan().toString()
        # cartesian check: only the documented all-pairs baselines and
        # the bounded broadcast-NLJ top-k may cross-join
        allowed_cartesian = {
            "embedding_neardup_allpairs",  # small-n oracle baseline by design
            "join_cross_pairs",  # J8: cross join IS the operator
        }
        if "CartesianProduct" in plan and name not in allowed_cartesian:
            failures.append(name)
            print(f"{name:28s} CARTESIAN PRODUCT in plan")
            continue
        if name == "join_fact_revenue_bucketed":
            # the point of the bucketed twin: both fact scans carry the
            # bucket distribution, so NO Exchange may touch the order
            # key — the only allowed shuffle is the tiny priority
            # rollup. (The audit session leaves broadcast on; a
            # BroadcastExchange of the orders side is not an order-key
            # repartition and passes.)
            bad = [
                ln
                for ln in plan.splitlines()
                if "Exchange hashpartitioning" in ln and "orderkey" in ln
            ]
            if "Bucketed: true" not in plan or bad:
                failures.append(name)
                print(f"{name:28s} BUCKETING NOT USED ({bad or 'no bucketed scan'})")
                continue
        scans = re.findall(r"ReadSchema: struct<([^>\n]*)>", plan)
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
    if not probe_runtime_bloom(spark, sf_dir):
        failures.append("runtime_bloom_probe")
        print("runtime_bloom_probe          NO might_contain IN FACT SCAN")
    else:
        print("runtime_bloom_probe          ok (bloom filter injected)")
    if not probe_dynamic_partition_pruning(spark, sf_dir):
        failures.append("dpp_probe")
        print("dpp_probe                    NO dynamicpruning IN PARTITION FILTERS")
    else:
        print("dpp_probe                    ok (partition filter injected)")
    if not probe_aqe_skew_join(spark):
        failures.append("skew_join_probe")
        print("skew_join_probe              NO skew=true IN ADAPTIVE JOIN")
    else:
        print("skew_join_probe              ok (AQE split the hot partition)")
    spark.stop()
    if failures:
        print(f"AUDIT FAILURES: {failures}")
        return 1
    print("AUDIT: all plans pruned")
    return 0


def probe_runtime_bloom(spark, sf_dir: str) -> bool:
    """Assert Spark injects a runtime bloom filter into the fact scan
    for the at-scale star-join shape (selective dim, shuffle join —
    session.runtime_filter_conf documents the knobs). Test-scale
    thresholds + a forced shuffle join make the 100 TB plan visible on
    local data; confs are restored afterwards."""
    from pyspark.sql import functions as F

    from etl_showcase_spark.session import runtime_filter_conf

    tuned = dict(runtime_filter_conf(test_scale=True))
    tuned["spark.sql.autoBroadcastJoinThreshold"] = "-1"  # at-scale: no BHJ
    saved = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        o = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_extendedprice"
        )
        j = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy()
            .agg(F.sum("l_extendedprice").alias("rev"))
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        return "might_contain" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def probe_dynamic_partition_pruning(spark, sf_dir: str) -> bool:
    """Assert dynamic partition pruning fires on a date-partitioned
    lake: fact partitioned by year, dim filtered on a NON-join column —
    the partition filter is only knowable at runtime, so Catalyst must
    inject a dynamicpruning expression into the fact scan (at 100 TB
    this is the difference between scanning one year and scanning the
    whole lake). Writes a tiny partitioned copy of orders to a temp
    dir; cleaned up afterwards."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    lake = tempfile.mkdtemp(prefix="dpp_probe_")
    try:
        (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .withColumn("o_year", F.year("o_orderdate"))
            .write.mode("overwrite")
            .partitionBy("o_year")
            .parquet(f"{lake}/orders_by_year")
        )
        fact = spark.read.parquet(f"{lake}/orders_by_year")
        dim = spark.createDataFrame(
            [(y, "odd" if y % 2 else "even") for y in range(1992, 2002)],
            "d_year int, parity string",
        )
        j = (
            fact.join(dim, fact["o_year"] == dim["d_year"])
            .filter(F.col("parity") == "even")
            .groupBy("o_year")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        return "dynamicpruning" in plan.lower()
    finally:
        shutil.rmtree(lake, ignore_errors=True)


def probe_aqe_skew_join(spark) -> bool:
    """Assert AQE's skew-join split actually fires (not just that the
    conf is on): a deliberately skewed left side (one hot key holding
    ~97% of rows) through a forced sort-merge join must execute with
    SortMergeJoin(skew=true) in the final adaptive plan — at 100 TB
    this is what keeps one hot customer/shingle from serializing a
    stage. Test-scale thresholds; confs restored afterwards."""
    from pyspark.sql import functions as F

    tuned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "8KB",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        hot = spark.range(300_000).select(
            F.lit(0).alias("k"), F.col("id").alias("v")
        )
        cold = spark.range(9_900).select(
            (F.col("id") % 99 + 1).alias("k"), F.col("id").alias("v")
        )
        right = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("w")
        )
        j = (
            hot.union(cold)
            .join(right, "k")
            .groupBy()
            .agg(F.sum(F.col("v") + F.col("w")).alias("s"))
        )
        j.collect()  # the skew split only exists in the EXECUTED plan
        return "skew=true" in j._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


if __name__ == "__main__":
    raise SystemExit(main())
