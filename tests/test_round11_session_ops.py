"""Round-11 session additions: the dsum 2^53 sweep regression proof.

Round 10 established that DuckDB converts DECIMAL(p,s)→DOUBLE as
int_repr/10^s — TWO roundings once the scaled integer passes 2^53 —
while Spark's BigDecimal→double rounds once, and fixed the scale-4
PRODUCT sums with d2d(). Round 11 swept the scale-2 MONEY sums
(dsum/davg/sql_dsum/sql_davg plus every inline oracle spelling, ~48
blessed queries) through the same floor/fraction decomposition. These
tests pin the sweep on synthetic data whose sum actually crosses the
boundary: they fail on the pre-sweep spelling and pass on the swept
one, independent of testdata scale factor.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_showcase_spark.functions.numeric import (
    d2d,
    davg,
    dec2,
    dsum,
    sql_d2d,
    sql_davg,
    sql_dsum,
)

# 20_001 rows of ~1e10 dollars with a deterministic odd-cents mix:
# sum ≈ 2.0e14 dollars, scaled integer ≈ 2.0e16 > 2^53 ≈ 9.007e15.
# Both engines build the IDENTICAL exact decimal rows (integer cents
# via exact decimal multiplication — no division, which DuckDB would
# run in double).
_N = 20_001
_BASE_CENTS = 899_999_999_942


def _spark_money(spark, sign=1):
    return spark.range(_N).select(
        (
            (F.lit(sign * _BASE_CENTS) + F.col("id") % 97).cast("decimal(18,0)")
            * F.lit("0.01").cast("decimal(3,2)")
        ).alias("v")
    )


def _duck_money_sql(sign=1):
    return (
        f"SELECT CAST({sign * _BASE_CENTS} + range % 97 AS DECIMAL(18,0))"
        f" * CAST('0.01' AS DECIMAL(3,2)) AS v FROM range({_N})"
    )


@pytest.mark.parametrize("sign", [1, -1])
def test_dsum_bit_exact_past_2pow53(spark, sign):
    con = duckdb.connect()
    try:
        exact, duck_new, duck_old = con.execute(
            f"SELECT SUM(v), {sql_dsum('v', 's')},"
            f" CAST(SUM(CAST(v AS DECIMAL(12,2))) AS DOUBLE)"
            f" FROM ({_duck_money_sql(sign)})"
        ).fetchone()
    finally:
        con.close()
    # the fixture really crosses the boundary
    assert abs(int(exact * 100)) > 2**53
    row = _spark_money(spark, sign).agg(
        dsum("v", "s"), F.sum(dec2("v")).cast("double").alias("old")
    ).collect()[0]
    # the sweep: bit-identical across engines at this magnitude
    assert row["s"] == duck_new
    # the hazard is real: the PRE-SWEEP spelling disagrees on this data
    # (this is the assertion that fails if dsum/sql_dsum regress)
    assert row["old"] != duck_old
    # and the swept value is faithful (within 1 ULP of the exact sum)
    assert row["s"] == pytest.approx(float(exact), rel=1e-15)


def test_davg_bit_exact_past_2pow53(spark):
    con = duckdb.connect()
    try:
        (duck_avg,) = con.execute(
            f"SELECT {sql_davg('v', 'a')} FROM ({_duck_money_sql()})"
        ).fetchone()
    finally:
        con.close()
    row = _spark_money(spark).agg(davg("v", "a")).collect()[0]
    assert row["a"] == duck_avg


def test_d2d_window_sum_bit_exact_past_2pow53(spark):
    """The swept WINDOW spelling (rolling_7d_events,
    running_customer_totals, brand_type_revenue_share): a running
    decimal sum d2d-cast per row must match DuckDB row-for-row even
    after the running value crosses 2^53."""
    from pyspark.sql.window import Window

    con = duckdb.connect()
    try:
        duck = con.execute(
            f"SELECT {sql_d2d('SUM(v) OVER (ORDER BY rowid)')} AS r"
            f" FROM (SELECT range AS rowid, CAST({_BASE_CENTS} + range % 97"
            f" AS DECIMAL(18,0)) * CAST('0.01' AS DECIMAL(3,2)) AS v"
            f" FROM range({_N})) ORDER BY rowid"
        ).fetchall()
    finally:
        con.close()
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    got = (
        spark.range(_N)
        .select(
            "id",
            (
                (F.lit(_BASE_CENTS) + F.col("id") % 97).cast("decimal(18,0)")
                * F.lit("0.01").cast("decimal(3,2)")
            ).alias("v"),
        )
        .select(d2d(F.sum("v").over(w), "r"))
        .collect()
    )
    # compare the tail rows — the ones past the boundary
    assert [r["r"] for r in got[-100:]] == [r[0] for r in duck[-100:]]


def test_sweep_left_no_naive_decimal_sum_casts():
    """Source-level guard: no plan file may reintroduce the naive
    CAST(SUM(...decimal...) AS DOUBLE) oracle spelling (sums of
    DECIMAL-cast expressions must go through the floor/fraction
    decomposition). Integer sums (BIGINT/HUGEINT casts) are exempt —
    int64→double is a single rounding in both engines below 2^63,
    where Spark's own sum overflows loudly first."""
    import re
    from pathlib import Path

    plans = Path(__file__).parents[1] / "etl_showcase_spark" / "plans"
    offenders = []
    pat = re.compile(r"CAST\(\s*SUM\((?P<inner>[^()]*(?:\([^()]*\)[^()]*)*)\)\s*AS\s+DOUBLE\s*\)")
    for f in sorted(plans.glob("*.py")):
        for m in pat.finditer(f.read_text()):
            inner = m.group("inner")
            if "DECIMAL" in inner and "FLOOR" not in inner:
                offenders.append(f"{f.name}: CAST(SUM({inner[:60]}...) AS DOUBLE)")
    assert not offenders, offenders


def test_repack_carried_scan_is_dynamically_pruned(spark):
    """The carried side of incremental_pack_repacking consumes the
    materialized COMPLEMENT list as a broadcast semi join, so the
    partitioned v1-manifest scan must carry a dynamicpruning filter
    (DPP never fires for the anti-join spelling — the §7.5 probe)."""
    import os

    from etl_showcase_spark.plans.mlprep import incremental_pack_repacking

    sf = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")
    df = incremental_pack_repacking(spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:1500]
    pdf = df.toPandas()
    # both paths present and disjoint on shard
    flags = pdf.groupby("recomputed")["shard"].apply(set)
    assert True in flags.index and len(flags[True]) > 0
    if False in flags.index:
        assert not (flags[True] & flags[False])
