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
