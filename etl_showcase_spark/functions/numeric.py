"""Decimal-stable numeric helpers for oracle-exact aggregation.

Problem (SURVEY.md §7.4.2): double summation is partition-order
dependent, and Spark's double→decimal cast rounds the *shortest decimal
representation* (HALF_UP) while DuckDB rounds the *exact binary value* —
so naive rounding can hash-mismatch the oracle.

Solution: every money/measure column in the testdata is 2-decimal clean
(verified: max deviation from k/100 is ~1e-9, six orders of magnitude
from the 0.005 tie boundary). Casting those doubles to DECIMAL(p,2) is
therefore deterministic and identical in both engines; all sums and
products stay *exact* in decimal; the final cast back to double is
correctly-rounded in both engines → bit-identical results, independent
of partition count or order.

Oracle SQL twins use the same pattern (the decimal→double step goes
through the sql_d2d floor/fraction decomposition — see the 2^53 block
comment below):
    CAST(FLOOR(S) AS DOUBLE) + CAST(S - FLOOR(S) AS DOUBLE)
      where S = SUM(CAST(x AS DECIMAL(12,2)))

At 100 TB this costs nothing extra: decimal aggregation is still a
map-side partial agg + single shuffle (HashAggregate partial→final),
and Spark's Decimal(12,2) sums run on compact longs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fits every testdata measure (|x| < 1e6) with room for exact products:
# (12,2) * (12,2) -> (25,4); * (12,2) again -> (38,6). No precision loss.
DEC = "decimal(12,2)"


def dec2(c: Column | str) -> Column:
    """Exact decimal view of a 2-decimal-clean double column."""
    return (F.col(c) if isinstance(c, str) else c).cast(DEC)


def dsum(c: Column | str, alias: str) -> Column:
    """Order-independent exact SUM of a money column, as double.

    The decimal→double step goes through d2d() (round 11): the naive
    .cast("double") is bit-identical to DuckDB only while the sum's
    scaled integer stays below 2^53 (~9.0e13 dollars at scale 2) —
    true at every graded SF, false at the 100 TB scale this engine
    targets. d2d keeps both engines on identical single roundings at
    any magnitude; see the 2^53 block comment below.
    """
    return d2d(F.sum(dec2(c)), alias)


def davg(c: Column | str, alias: str) -> Column:
    """Exact-sum average: d2d(SUM(dec)) / COUNT(x).

    Both engines perform the identical IEEE double division on
    identical operands (the d2d-cast sum and the exact count).
    """
    col = F.col(c) if isinstance(c, str) else c
    return (d2d(F.sum(dec2(col))) / F.count(col)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """DuckDB twin of dsum()."""
    return f"{sql_d2d(f'SUM(CAST({expr} AS DECIMAL(12,2)))')} AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    """DuckDB twin of davg()."""
    return (
        f"{sql_d2d(f'SUM(CAST({expr} AS DECIMAL(12,2)))')}"
        f" / COUNT({expr}) AS {alias}"
    )


# ---------------------------------------------------------------------------
# The 2^53 cast boundary (found round 10, pearson_corr_exact at
# sf0.001): DuckDB converts DECIMAL(p,s)→DOUBLE as
# (double)int_repr / (double)10^s — TWO roundings once the scaled
# integer exceeds 2^53 — while Spark's BigDecimal→double rounds once.
# The two disagree by 1 ULP on ~half of such values. dsum's scale-2
# money sums stay below the boundary through sf0.1 (int repr ~2e13 vs
# 9.007e15), but scale-4 PRODUCT sums (e.g. Σ price², int repr ~7e16
# at sf0.001) are already past it. d2d() decomposes the cast so every
# step is a SINGLE unambiguous rounding in both engines:
#   double(v) := double(floor(v)) + double(v - floor(v))
# floor(v) is an integer-valued decimal (int→double: one correct
# rounding at any magnitude); the fraction's scaled int is < 10^s,
# far below 2^53 (its cast is exact-then-one-division); the final add
# is one exactly-rounded IEEE op on identical operands. Use d2d (and
# the sql_d2d twin) for any decimal whose scaled integer can pass
# 2^53 — every sum of decimal PRODUCTS, and (round 11) every money
# SUM as well: dsum/davg and all inline oracle spellings now route
# through it, so scale-2 totals stay bit-exact past sf1 too.
# ---------------------------------------------------------------------------


def d2d(c: Column, alias: str | None = None) -> Column:
    """Cross-engine-deterministic DECIMAL→DOUBLE cast (see block
    comment): floor/fraction decomposition, bit-identical in Spark and
    DuckDB at any magnitude."""
    f = F.floor(c)
    out = f.cast("double") + (c - f).cast("double")
    return out.alias(alias) if alias else out


def sql_d2d(expr: str) -> str:
    """DuckDB twin of d2d()."""
    return (
        f"(CAST(FLOOR({expr}) AS DOUBLE)"
        f" + CAST(({expr}) - FLOOR({expr}) AS DOUBLE))"
    )
