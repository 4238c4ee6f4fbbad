"""tracked_persist / release_all semantics (etl_showcase_spark/caching.py):
the FIFO must bound cache lifetime without ever double-registering the
same logical plan, and release must leave Spark storage empty."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_showcase_spark import caching
from etl_showcase_spark.caching import release_all, tracked_persist


def _storage_count(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def test_release_all_empties_storage(spark):
    release_all()
    df = tracked_persist(spark.range(100).withColumn("x", F.col("id") * 2))
    df.count()  # materialize the cache
    assert _storage_count(spark) >= 1
    release_all()
    assert len(caching._TRACKED) == 0
    assert _storage_count(spark) == 0


def test_same_plan_registers_once(spark):
    release_all()
    a = tracked_persist(spark.range(50).withColumn("y", F.col("id") + 1))
    b = tracked_persist(spark.range(50).withColumn("y", F.col("id") + 1))
    # semantically identical rebuild: same CacheManager entry, ONE
    # tracked registration — eviction must not be able to pull the rug
    # from under a live alias
    assert len(caching._TRACKED) == 1
    a.count()
    b.count()
    release_all()


def test_fifo_cap_evicts_oldest(spark):
    release_all()
    frames = [
        tracked_persist(spark.range(10).withColumn("z", F.col("id") + i))
        for i in range(caching._CAP + 5)
    ]
    for f in frames:
        f.count()
    # the FIFO never exceeds its cap; the overflow was unpersisted
    assert len(caching._TRACKED) == caching._CAP
    assert _storage_count(spark) <= caching._CAP
    release_all()
    assert _storage_count(spark) == 0


@pytest.mark.slow
def test_ktruss_fixed_rounds_reach_fixpoint(spark):
    """On this corpus the 6-round peel IS the k-truss: one more support
    pass over the returned core must drop nothing."""
    from etl_showcase_spark.plans.curation import (
        _TRUSS_K,
        _edge_triangle_support,
        ktruss_core_copurchase,
    )

    from .conftest import SF_ORACLE

    core = ktruss_core_copurchase(spark, SF_ORACLE)
    e = core.select(
        F.col("part_a").alias("u"), F.col("part_b").alias("v")
    )
    resup = _edge_triangle_support(e)
    n_core = core.count()
    n_stable = resup.filter(F.col("s") >= _TRUSS_K - 2).count()
    assert n_core > 0
    assert n_stable == n_core, "6-round peel had not converged on the testdata"
