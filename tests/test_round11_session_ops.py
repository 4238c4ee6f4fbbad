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


def _naive_decimal_sum_casts(text: str) -> list[str]:
    """Find CAST(SUM(<decimal expr>) AS DOUBLE) spellings with a real
    paren-depth walk (a regex caps nesting depth, and every DECIMAL(p,s)
    spelling adds a level — the round-11 regex provably never matched).

    From each ``CAST(`` we walk balanced parens to the matching close,
    then check the balanced body for ``SUM(...)`` whose own balanced
    body mentions DECIMAL without FLOOR, followed by ``AS DOUBLE``."""
    import re

    hits: list[str] = []
    for m in re.finditer(r"CAST\s*\(", text, re.IGNORECASE):
        start = m.end()  # just past the opening paren
        depth = 1
        i = start
        while i < len(text) and depth:
            if text[i] == "(":
                depth += 1
            elif text[i] == ")":
                depth -= 1
            i += 1
        if depth:  # unbalanced tail (e.g. mid-f-string) — not a spelling
            continue
        body = text[start : i - 1]
        sm = re.match(r"\s*SUM\s*\(", body, re.IGNORECASE)
        if not sm:
            continue
        # walk SUM's own balanced body
        j = sm.end()
        depth = 1
        while j < len(body) and depth:
            if body[j] == "(":
                depth += 1
            elif body[j] == ")":
                depth -= 1
            j += 1
        if depth:
            continue
        inner = body[sm.end() : j - 1]
        tail = body[j:]
        if not re.match(r"\s*AS\s+DOUBLE\s*$", tail, re.IGNORECASE):
            continue
        if "DECIMAL" in inner.upper() and "FLOOR" not in inner.upper():
            hits.append(f"CAST(SUM({inner[:60]}...) AS DOUBLE)")
    return hits


def test_naive_decimal_sum_scanner_flags_known_bad():
    """Self-test: the canonical pre-sweep hazard spelling — which the
    round-11 regex silently missed — IS flagged, and the swept/integer
    spellings are not."""
    bad = "CAST(SUM(CAST(x AS DECIMAL(12,2))) AS DOUBLE)"
    assert _naive_decimal_sum_casts(bad), "scanner must flag the 2^53 hazard"
    bad_deep = "CAST(SUM(CAST(a AS DECIMAL(12,2)) * CAST(b AS DECIMAL(12,2))) AS DOUBLE)"
    assert _naive_decimal_sum_casts(bad_deep)
    ok_floor = "CAST(SUM(FLOOR(CAST(x AS DECIMAL(12,2)))) AS DOUBLE)"
    assert not _naive_decimal_sum_casts(ok_floor)
    ok_int = "CAST(SUM(CAST(x AS BIGINT)) AS DOUBLE)"
    assert not _naive_decimal_sum_casts(ok_int)
    ok_not_sum = "CAST(AVG(CAST(x AS DECIMAL(12,2))) AS DOUBLE)"
    assert not _naive_decimal_sum_casts(ok_not_sum)


def test_sweep_left_no_naive_decimal_sum_casts():
    """Source-level guard: no plan file may reintroduce the naive
    CAST(SUM(...decimal...) AS DOUBLE) oracle spelling (sums of
    DECIMAL-cast expressions must go through the floor/fraction
    decomposition). Integer sums (BIGINT/HUGEINT casts) are exempt —
    int64→double is a single rounding in both engines below 2^63,
    where Spark's own sum overflows loudly first."""
    from pathlib import Path

    plans = Path(__file__).parents[1] / "etl_showcase_spark" / "plans"
    offenders = []
    for f in sorted(plans.glob("*.py")):
        for hit in _naive_decimal_sum_casts(f.read_text()):
            offenders.append(f"{f.name}: {hit}")
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
