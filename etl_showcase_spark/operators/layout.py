"""Z-order (Morton) data-layout clustering ([EXT] — no reference
analog; the Parquet-lake answer to the reference's multi-column btree
access paths, sql/create_weather_tables.sql:108-110).

Interleaving the bits of two scan keys gives a single sort key whose
ranges are simultaneously tight in BOTH dimensions, so range-
partitioning + sorting files by the z-value lets parquet row-group
min/max stats prune scans filtered on either key — the same idea as
Delta/Iceberg OPTIMIZE ZORDER, built from nothing but deterministic
integer bit math (exactly reproducible in any engine).

Scale shape: computing z is a narrow map; `zorder_layout` is one
range-shuffle (the same cost as any repartition) after which every
output file covers a small rectangle of the key space forever.

Key-domain note: the 16-bit interleave covers 65,536 distinct values
per dimension. Keys wider than that should be range-bucketed into the
16-bit domain first (e.g. `ntile`/`width_bucket` over the key, or the
key's top 16 bits) rather than taken modulo — modulo aliases distant
key ranges into one bucket and costs locality; bucketing preserves
order. 16+16 bits is the sweet spot for FILE-level pruning (a 100 TB
table has far fewer than 2^32 files); widen the spread masks to
24/32-bit if row-group-level granularity ever demands it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# classic 16->32 bit spread masks (public-domain "Interleave bits by
# Binary Magic Numbers" technique)
_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread_bits16(c: Column) -> Column:
    """Spread the low 16 bits of a non-negative int across 32 bits
    (bit i moves to position 2i). The input is masked to its low 16
    bits first — without the mask, bits 16-23 survive the first
    0x00FF00FF step and alias wider keys into wrong z-values."""
    x = c.cast("bigint").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_value(a: Column, b: Column) -> Column:
    """32-bit Morton code of two 16-bit keys (a in even bits, b odd)."""
    return spread_bits16(a).bitwiseOR(F.shiftleft(spread_bits16(b), 1))


def sql_spread_bits16(expr: str) -> str:
    """DuckDB twin of spread_bits16 (textual substitution per step)."""
    x = f"(CAST({expr} AS BIGINT) & 65535)"
    for shift, mask in _SPREAD_STEPS:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def sql_zorder_value(a: str, b: str) -> str:
    return f"({sql_spread_bits16(a)} | ({sql_spread_bits16(b)} << 1))"


def zorder_layout(df: DataFrame, z: Column, num_partitions: int) -> DataFrame:
    """Cluster rows for at-rest layout: range-partition by the z-value
    and sort inside each partition, so every written file covers one
    tight z-range (=> tight min/max on both underlying keys)."""
    return df.withColumn("__z", z).repartitionByRange(
        num_partitions, "__z"
    ).sortWithinPartitions("__z").drop("__z")
