#!/usr/bin/env python
"""FROZEN bench calibration canary — DO NOT EDIT.

This file is the pinned-code, JVM-only reference workload that bench.py
times first in every run. Its single purpose is cross-round calibration:
because this code never changes, any movement in its wall time measures
the *box* (CPU contention, JVM/GC state, IO), not the engine. bench.py
reports every query time both raw and normalized by the canary so a
round-over-round comparison can separate plan regressions from machine
variance without the interleaved A/B re-time ritual.

Design constraints (all deliberate):
- Self-contained: imports only pyspark.sql.functions; nothing from
  etl_showcase_spark, so no living-code edit can alter the canary plan.
- Pure JVM: a lineitem scan + filter + hash aggregate that stays inside
  WholeStageCodegen end-to-end. No Python workers, no Arrow, no UDFs —
  the canary must not inherit the pandas-worker variance it exists to
  factor out.
- Deterministic plan: fixed predicate constants, fixed column set, one
  exchange (partial -> final agg). Small enough to run in ~100-300 ms at
  sf0.1 yet large enough to exercise scan + codegen + shuffle.

Pinned by tests/test_pipeline_integrity.py::test_bench_canary_frozen
(source-hash check) so an accidental edit fails the suite.
"""

from __future__ import annotations

from pyspark.sql import functions as F


CANARY_SOURCE_SHA256 = None  # computed over this file by the pin test


def canary_query(spark, sf_dir: str):
    """TPC-H q6-shaped scan-agg: the calibration workload."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1994-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-01-01"))
            & (F.col("l_discount").between(0.03, 0.09))
            & (F.col("l_quantity") < F.lit(25))
        )
        .groupBy(F.col("l_returnflag"))
        .agg(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("rev"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )
