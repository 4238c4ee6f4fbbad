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


# ---------------------------------------------------------------------------
# Hilbert-curve layout ([EXT] — the locality upgrade over z-order:
# consecutive Hilbert codes are ALWAYS adjacent cells (unit L1 step),
# where the Morton curve takes long diagonal jumps at power-of-two
# boundaries, so Hilbert-clustered files have strictly tighter
# worst-case key rectangles — the reason Delta/Iceberg added HILBERT
# beside ZORDER. Encoding is the classic top-down rotation recurrence
# (the public Wikipedia/Hacker's-Delight xy2d):
#
#   for s = 2^(bits-1) .. 1:            rx = [x & s > 0], ry = [y & s > 0]
#       d += s·s·((3·rx) XOR ry)
#       if ry == 0:                     # rotate quadrant
#           if rx == 1: x, y = s-1-x, s-1-y
#           x, y = y, x
#
# Pure integer branches — bit-identical in any engine. The recurrence
# carries rotation STATE level to level, so it unrolls as a chain of
# `bits` projections with NAMED intermediate columns (each level reads
# the previous level's x/y more than once; naming keeps Catalyst from
# inlining the chain into a 3^bits-node expression) and as the same
# number of chained CTEs in SQL.
# ---------------------------------------------------------------------------


def with_hilbert(
    df: DataFrame, x: Column, y: Column, out: str = "hval", bits: int = 16
) -> DataFrame:
    """df + column `out` = Hilbert d of the two `bits`-bit keys.
    Inputs are masked to their low `bits` bits (same domain contract
    as spread_bits16: range-bucket wider keys first, never modulo)."""
    mask = (1 << bits) - 1
    df = df.withColumn("__hx", x.cast("bigint").bitwiseAND(F.lit(mask)))
    df = df.withColumn("__hy", y.cast("bigint").bitwiseAND(F.lit(mask)))
    df = df.withColumn("__hd", F.lit(0).cast("bigint"))
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = F.when(F.col("__hx").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ry = F.when(F.col("__hy").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        df = df.withColumn("__rx", rx).withColumn("__ry", ry)
        df = df.withColumn(
            "__hd",
            F.col("__hd")
            + F.lit(s).cast("bigint")
            * F.lit(s)
            * (F.col("__rx") * 3).bitwiseXOR(F.col("__ry")),
        )
        flip = F.col("__rx") == 1
        nx = F.when(
            F.col("__ry") == 0,
            F.when(flip, F.lit(s - 1) - F.col("__hy")).otherwise(F.col("__hy")),
        ).otherwise(F.col("__hx"))
        ny = F.when(
            F.col("__ry") == 0,
            F.when(flip, F.lit(s - 1) - F.col("__hx")).otherwise(F.col("__hx")),
        ).otherwise(F.col("__hy"))
        df = df.withColumn("__nx", nx).withColumn("__ny", ny)
        df = (
            df.drop("__hx", "__hy", "__rx", "__ry")
            .withColumnRenamed("__nx", "__hx")
            .withColumnRenamed("__ny", "__hy")
        )
    return df.withColumnRenamed("__hd", out).drop("__hx", "__hy")


def sql_hilbert_cte(
    source_cte: str, x_expr: str, y_expr: str, keys: str, bits: int = 16
) -> str:
    """DuckDB twin: chained CTEs h0..h{bits} carrying (keys, x, y, d)
    through the identical rotation recurrence. `keys` is the
    comma-separated passthrough column list; the final CTE is named
    `hfinal` with column `hval`."""
    mask = (1 << bits) - 1
    parts = [
        f"h0 AS (SELECT {keys}, CAST(({x_expr}) AS BIGINT) & {mask} AS x,"
        f" CAST(({y_expr}) AS BIGINT) & {mask} AS y,"
        f" CAST(0 AS BIGINT) AS d FROM {source_cte})"
    ]
    step = 0
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        prev, cur = f"h{step}", f"h{step + 1}"
        rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
        nx = (
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
            f" THEN {s - 1} - y ELSE y END) ELSE x END"
        )
        ny = (
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
            f" THEN {s - 1} - x ELSE x END) ELSE y END"
        )
        parts.append(
            f"{cur} AS (SELECT {keys}, {nx} AS x, {ny} AS y,"
            f" d + CAST({s} AS BIGINT) * {s} * xor({rx} * 3, {ry}) AS d"
            f" FROM {prev})"
        )
        step += 1
    parts.append(f"hfinal AS (SELECT {keys}, d AS hval FROM h{step})")
    return ",\n".join(parts)


def hilbert_xy2d_py(x: int, y: int, bits: int = 16) -> int:
    """Plain-Python reference of the same recurrence (test oracle for
    the locality property tests; matches the published algorithm)."""
    x &= (1 << bits) - 1
    y &= (1 << bits) - 1
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d
