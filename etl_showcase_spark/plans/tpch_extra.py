"""TPC-H completion set: the 11 query shapes (q2, q7, q8, q9, q11, q13,
q15, q16, q17, q20, q21) not covered by plans/analytics.py, adapted to
the driver testdata's schema (no partsupp table, no
commit/receipt/shipmode columns — substitutions documented per query).

Together with analytics.py (q1 lives in plans/core.py) this makes all
22 canonical TPC-H shapes available, widening SURVEY.md §2.5/§2.6 the
same way the reference's analytical views (reference
sql/create_weather_tables.sql:93-160) widen its two-table star schema.

Scale discipline shared by every query here:
- nation/region are the only broadcast-hinted relations (fixed 25/5
  rows); part/supplier/customer grow with scale factor, so AQE picks
  their join strategy at runtime.
- the partsupp substitute (distinct/aggregated (l_partkey, l_suppkey)
  pairs from lineitem) is built with ONE hash aggregation — map-side
  partial combine makes it a |partsupp|-sized shuffle, never a raw
  lineitem shuffle.
- quantity sums stay exact in double (integer-valued ≤ 50 per row,
  far under 2^53), money goes through DECIMAL(12,2) per
  functions/numeric.py, so every oracle comparison is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..functions.numeric import d2d, dec2, sql_d2d
from ..registry import register

# Exact discounted revenue: DECIMAL(12,2) * DECIMAL(13,2), no float.
_SQL_VOL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"
)
# the same volume over the `l.` table alias, summed and decimal→double
# cast through the single-rounding decomposition (2^53 discipline)
_SQL_VOL_L = _SQL_VOL.replace("l_extendedprice", "l.l_extendedprice").replace(
    "l_discount", "l.l_discount"
)


def _vol() -> F.Column:
    one = F.lit(1).cast("decimal(12,2)")
    return dec2("l_extendedprice") * (one - dec2("l_discount"))


# ---------------------------------------------------------------------------
# Q2: minimum-cost supplier. partsupp's supply cost is substituted by
# MIN(l_extendedprice) per (part, supplier) pair observed in lineitem —
# decimal-exact, so the correlated-minimum equality is too. The
# correlated scalar subquery is evaluated as a window MIN over the
# already-joined frame (one pass; the subquery's region scope equals
# the outer query's, so the rewrite is exact).
# ---------------------------------------------------------------------------

_Q2_ORACLE = f"""
WITH supply AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost
  FROM lineitem
  GROUP BY 1, 2
)
SELECT CAST(CAST(s.s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal,
       s.s_name AS sname,
       n.n_name AS nation,
       p.p_partkey AS partkey,
       CAST(sp.cost AS DOUBLE) AS cost
FROM part p
JOIN supply sp ON p.p_partkey = sp.l_partkey
JOIN supplier s ON sp.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE p.p_type = 'STANDARD' AND p.p_size = 15 AND r.r_name = 'EUROPE'
  AND sp.cost = (
    SELECT MIN(sp2.cost)
    FROM supply sp2
    JOIN supplier s2 ON sp2.l_suppkey = s2.s_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE sp2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
ORDER BY acctbal DESC, nation ASC, sname ASC, partkey ASC
LIMIT 100
"""


@register("q2_min_cost_supplier", oracle=_Q2_ORACLE, tags=("J1", "J2", "W1", "G3"))
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(dec2("l_extendedprice")).alias("cost")
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") == 15)
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    joined = (
        supply.join(p, supply["l_partkey"] == p["p_partkey"])
        .join(s, supply["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("min_cost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("min_cost"))
        .select(
            dec2("s_acctbal").cast("double").alias("acctbal"),
            F.col("s_name").alias("sname"),
            F.col("n_name").alias("nation"),
            F.col("p_partkey").alias("partkey"),
            F.col("cost").cast("double").alias("cost"),
        )
        .orderBy(
            F.col("acctbal").desc(),
            F.col("nation").asc(),
            F.col("sname").asc(),
            F.col("partkey").asc(),
        )
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q7: volume shipping between two nations, by year — the double-sided
# nation-pair disjunction over supplier nation × customer nation.
# ---------------------------------------------------------------------------

_Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       {sql_d2d(f"SUM({_SQL_VOL_L})")} AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE l.l_shipdate >= DATE '1995-01-01' AND l.l_shipdate <= DATE '1996-12-31'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
ORDER BY supp_nation, cust_nation, l_year
"""


@register("q7_nation_volume", oracle=_Q7_ORACLE, tags=("J1", "J2", "G1", "F9"))
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("l_shipdate") <= F.lit("1996-12-31").cast("date"))
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    # The two-nation filter is pushed INTO the broadcast dims before the
    # fact join, so non-matching customers/suppliers drop pre-shuffle.
    n1 = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    n2 = n1.select(
        F.col("n_nationkey").alias("n2_nationkey"), F.col("n_name").alias("n2_name")
    )
    pair_ok = (
        (F.col("n_name") == "NATION_1") & (F.col("n2_name") == "NATION_2")
    ) | ((F.col("n_name") == "NATION_2") & (F.col("n2_name") == "NATION_1"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == n1["n_nationkey"])
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("n2_nationkey"))
        .filter(pair_ok)
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.col("n2_name").alias("cust_nation"),
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(d2d(F.sum(_vol()), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8: national market share — NATION_1's share of ECONOMY-part revenue
# sold to ASIA customers, per order year. The share division is one
# IEEE double op over two decimal-exact sums, identical in both engines.
# ---------------------------------------------------------------------------

_Q8_ORACLE = f"""
SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       (CAST(FLOOR(SUM(CASE WHEN n1.n_name = 'NATION_1' THEN {_SQL_VOL.replace("l_extendedprice", "l.l_extendedprice").replace("l_discount", "l.l_discount")} ELSE CAST(0 AS DECIMAL(12,2)) END)) AS DOUBLE) + CAST((SUM(CASE WHEN n1.n_name = 'NATION_1' THEN {_SQL_VOL.replace("l_extendedprice", "l.l_extendedprice").replace("l_discount", "l.l_discount")} ELSE CAST(0 AS DECIMAL(12,2)) END)) - FLOOR(SUM(CASE WHEN n1.n_name = 'NATION_1' THEN {_SQL_VOL.replace("l_extendedprice", "l.l_extendedprice").replace("l_discount", "l.l_discount")} ELSE CAST(0 AS DECIMAL(12,2)) END)) AS DOUBLE))
       / {sql_d2d(f"SUM({_SQL_VOL_L})")}
       AS mkt_share
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n2.n_regionkey
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
  AND o.o_orderdate >= DATE '1995-01-01' AND o.o_orderdate <= DATE '1996-12-31'
GROUP BY 1
ORDER BY o_year
"""


@register("q8_market_share", oracle=_Q8_ORACLE, tags=("J1", "J2", "G6", "F9"))
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31").cast("date"))
    )
    c = table(spark, sf_dir, "customer")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_nationkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    zero = F.lit(0).cast("decimal(12,2)")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n2), c["c_nationkey"] == n2["n_nationkey"])
        .join(F.broadcast(r), n2["n_regionkey"] == r["r_regionkey"])
        .join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("n1_nationkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                d2d(
                    F.sum(
                        F.when(
                            F.col("supp_nation") == "NATION_1", _vol()
                        ).otherwise(zero)
                    )
                )
                / d2d(F.sum(_vol()))
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9: product-type profit by supplier nation and year. Without
# partsupp's supply cost, profit reduces to discounted revenue on
# 'red%'-named parts (adaptation documented; the join/agg shape —
# name-LIKE part filter fanned across the full star — is preserved).
# ---------------------------------------------------------------------------

_Q9_ORACLE = f"""
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       {sql_d2d(f"SUM({_SQL_VOL_L})")} AS profit
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE 'red%'
GROUP BY 1, 2
ORDER BY nation ASC, o_year DESC
"""


@register("q9_product_profit", oracle=_Q9_ORACLE, tags=("J2", "G1", "F9", "F11"))
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(d2d(F.sum(_vol()), "profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q11: important parts — per-part shipped value for NATION_3 suppliers,
# kept where value exceeds 1/1000 of that scope's total. The fraction
# compare is done as value*1000 > total: integer×decimal, exact in both
# engines, no decimal-fraction literal needed.
# ---------------------------------------------------------------------------

_Q11_ORACLE = f"""
SELECT l.l_partkey AS partkey,
       {sql_d2d(f"SUM({_SQL_VOL_L})")} AS value
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_3'
GROUP BY 1
HAVING SUM({_SQL_VOL.replace("l_extendedprice", "l.l_extendedprice").replace("l_discount", "l.l_discount")}) * 1000 > (
  SELECT SUM({_SQL_VOL.replace("l_extendedprice", "l2.l_extendedprice").replace("l_discount", "l2.l_discount")})
  FROM lineitem l2
  JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
  JOIN nation nx ON nx.n_nationkey = s2.s_nationkey
  WHERE nx.n_name = 'NATION_3')
ORDER BY value DESC, partkey ASC
"""


@register("q11_important_parts", oracle=_Q11_ORACLE, tags=("J2", "G1", "G4"))
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    per_part = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(_vol()).alias("value_dec"))
    )
    # scalar total re-derived from the per-part sums (same decimal-exact
    # value as the oracle's direct scan, one less lineitem pass)
    total = per_part.agg(F.sum("value_dec").alias("total_dec"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_dec") * F.lit(1000) > F.col("total_dec"))
        .select("partkey", d2d(F.col("value_dec"), "value"))
        .orderBy(F.col("value").desc(), F.col("partkey").asc())
    )


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution. The comment-LIKE exclusion is
# substituted with an order-priority exclusion inside the LEFT JOIN's ON
# clause — the load-bearing part of the shape (filter must not turn the
# outer join inner).
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q13_order_distribution", oracle=_Q13_ORACLE, tags=("J5", "G5", "G7"))
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c["c_custkey"] == o["o_custkey"])
            & (o["o_orderpriority"] != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q15: top supplier by 3-month revenue. The scalar MAX is a 1-row
# aggregate broadcast back over the per-supplier totals — two passes
# over an |supplier|-sized frame, never a global sort.
# ---------------------------------------------------------------------------

_Q15_ORACLE = f"""
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no,
         SUM({_SQL_VOL}) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey AS suppkey,
       s.s_name AS sname,
       (CAST(FLOOR(r.total_revenue) AS DOUBLE)
        + CAST(r.total_revenue - FLOOR(r.total_revenue) AS DOUBLE))
         AS total_revenue
FROM supplier s
JOIN revenue0 r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
ORDER BY suppkey
"""


@register("q15_top_supplier", oracle=_Q15_ORACLE, tags=("G1", "G3", "J1"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    revenue0 = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_vol()).alias("rev_dec")
    )
    best = revenue0.agg(F.max("rev_dec").alias("max_dec"))
    s = table(spark, sf_dir, "supplier")
    return (
        revenue0.join(F.broadcast(best))
        .filter(F.col("rev_dec") == F.col("max_dec"))
        .join(s, F.col("supplier_no") == s["s_suppkey"])
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("sname"),
            d2d(F.col("rev_dec"), "total_revenue"),
        )
        .orderBy("suppkey")
    )


# ---------------------------------------------------------------------------
# Q16: supplier counts by part attribute. partsupp := distinct
# (l_partkey, l_suppkey) pairs; the complaints exclusion becomes a
# negative-balance supplier exclusion, kept as a true anti join.
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p.p_brand AS brand,
       p.p_type AS type,
       p.p_size AS size,
       CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps
JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, brand ASC, type ASC, size ASC
"""


@register("q16_supplier_part_counts", oracle=_Q16_ORACLE, tags=("J3", "G9", "G5"))
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45)
    )
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        ps.join(p, ps["l_partkey"] == p["p_partkey"])
        .join(bad, ps["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("brand").asc(),
            F.col("type").asc(),
            F.col("size").asc(),
        )
    )


# ---------------------------------------------------------------------------
# Q17: small-quantity-order revenue. The correlated per-part average
# becomes an aggregate-then-rejoin (computed only over the filtered
# parts' lineitems — the same set the correlated form touches).
# l_quantity is integer-valued so its double sums are exact and the
# 0.2*avg threshold is bit-identical cross-engine.
# ---------------------------------------------------------------------------

_Q17_ORACLE = """
SELECT (CAST(FLOOR(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)))) AS DOUBLE) + CAST((SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)))) - FLOOR(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)))) AS DOUBLE)) / 7.0
       AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#2' AND p.p_size < 10
  AND l.l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey)
"""


@register("q17_small_qty_revenue", oracle=_Q17_ORACLE, tags=("J2", "G2", "P10"))
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#2") & (F.col("p_size") < 10)
    )
    matched = li.join(p, li["l_partkey"] == p["p_partkey"]).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_qty = matched.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        matched.join(avg_qty, F.col("l_partkey") == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (d2d(F.sum(dec2("l_extendedprice"))) / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


# ---------------------------------------------------------------------------
# Q20: suppliers with excess shipments — the semi-join chain. availqty
# is substituted by 1995 shipped quantity per (supplier, part) of
# 'red%' parts, thresholded; supplier scope = NATION_7.
# ---------------------------------------------------------------------------

_Q20_ORACLE = """
SELECT s.s_suppkey AS suppkey, s.s_name AS sname
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_7'
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE 'red%'
      AND l.l_shipdate >= DATE '1995-01-01' AND l.l_shipdate < DATE '1996-01-01'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING SUM(l.l_quantity) > 50)
ORDER BY sname, suppkey
"""


@register("q20_excess_shipments", oracle=_Q20_ORACLE, tags=("J4", "G4", "F11"))
def q20_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("date"))
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    heavy = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(heavy, s["s_suppkey"] == heavy["l_suppkey"], "left_semi")
        .select(F.col("s_suppkey").alias("suppkey"), F.col("s_name").alias("sname"))
        .orderBy("sname", "suppkey")
    )


# ---------------------------------------------------------------------------
# Q21: suppliers who kept orders waiting. Late := shipped more than 60
# days after the order date (no receipt/commit dates in this schema);
# the EXISTS / NOT EXISTS pair is evaluated as one per-order distinct
# count — a supplier waits an order iff the order has >1 supplier and
# exactly one late supplier (them).
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
WITH flagged AS (
  SELECT l.l_orderkey, l.l_suppkey,
         CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
              THEN 1 ELSE 0 END AS late
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
),
per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supps,
         COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late
  FROM flagged
  GROUP BY 1
)
SELECT s.s_name AS sname, CAST(COUNT(*) AS BIGINT) AS numwait
FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM flagged WHERE late = 1) fl
JOIN per_order po ON po.l_orderkey = fl.l_orderkey
                  AND po.n_supps > 1 AND po.n_late = 1
JOIN supplier s ON s.s_suppkey = fl.l_suppkey
GROUP BY s.s_name
ORDER BY numwait DESC, sname ASC
LIMIT 20
"""


@register("q21_waiting_suppliers", oracle=_Q21_ORACLE, tags=("J2", "J4", "J3", "G5"))
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    flagged = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey",
        "l_suppkey",
        F.when(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"), 1
        )
        .otherwise(0)
        .alias("late"),
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("n_late"),
    )
    late_pairs = (
        flagged.filter(F.col("late") == 1).select("l_orderkey", "l_suppkey").distinct()
    )
    s = table(spark, sf_dir, "supplier")
    return (
        late_pairs.join(
            per_order.filter((F.col("n_supps") > 1) & (F.col("n_late") == 1)),
            "l_orderkey",
        )
        .join(s, late_pairs["l_suppkey"] == s["s_suppkey"])
        .groupBy(F.col("s_name").alias("sname"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("sname").asc())
        .limit(20)
    )
