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

Oracle SQL twins use the same pattern:
    CAST(SUM(CAST(x AS DECIMAL(12,2))) AS DOUBLE)

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
    """Order-independent exact SUM of a money column, as double."""
    return F.sum(dec2(c)).cast("double").alias(alias)


def davg(c: Column | str, alias: str) -> Column:
    """Exact-sum average: CAST(SUM(dec) AS DOUBLE) / COUNT(x).

    Both engines perform the identical IEEE double division.
    """
    col = F.col(c) if isinstance(c, str) else c
    return (F.sum(dec2(col)).cast("double") / F.count(col)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """DuckDB twin of dsum()."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(12,2))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    """DuckDB twin of davg()."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(12,2))) AS DOUBLE)"
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
# 2^53 — in practice every sum of decimal PRODUCTS.
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
