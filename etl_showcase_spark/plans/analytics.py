"""Analytics surface extensions: multi-dimensional grouping (CUBE),
pivot, exact percentiles, correlated scalar subqueries via the Spark SQL
entry point, and the TPC-H Q3-shaped join-agg-topk headline.

These widen SURVEY.md §2.5 G9 (cube/grouping sets) and §3.3 (the SQL
text entry point: reference README.md:199-205 runs its two analytical
views through psql; here the same lifecycle runs through spark.sql over
registered temp views).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.numeric import d2d, dec2, dsum
from ..registry import register

# ---------------------------------------------------------------------------
# G9: CUBE over (status, priority). Sentinel 'ALL' via COALESCE keeps the
# subtotal rows unambiguous (statuses are non-null in the data) and
# engine-portable — no reliance on GROUPING_ID numbering.
# ---------------------------------------------------------------------------

_CUBE_ORACLE = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders,
       (CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(12,2)))) AS DOUBLE) + CAST((SUM(CAST(o_totalprice AS DECIMAL(12,2)))) - FLOOR(SUM(CAST(o_totalprice AS DECIMAL(12,2)))) AS DOUBLE)) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("cube_status_priority", oracle=_CUBE_ORACLE, tags=("G9",))
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


# ---------------------------------------------------------------------------
# Pivot: order counts per year × status. Spark's relational pivot with an
# explicit value list (never the implicit distinct scan at scale); the
# SQL twin is the classic conditional-aggregation spelling.
# ---------------------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT EXTRACT(year FROM o_orderdate) AS order_year,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
FROM orders
GROUP BY 1
"""


@register("pivot_year_status", oracle=_PIVOT_ORACLE, tags=("G9",))
def pivot_year_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    p = (
        o.withColumn("order_year", F.year("o_orderdate").cast("long"))
        .groupBy("order_year")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return p.select(
        "order_year",
        F.coalesce("F", F.lit(0)).alias("n_f"),
        F.coalesce("O", F.lit(0)).alias("n_o"),
        F.coalesce("P", F.lit(0)).alias("n_p"),
    )


# ---------------------------------------------------------------------------
# Exact percentiles (type-7 linear interpolation in both engines).
# Why THIS query is safe while winsorized_event_stats needed the
# round-11 exact-integer rewrite (plans/events.py): exactness needs
# BOTH (a) binary-exact interpolation fractions and (b) exactly
# representable products. Here q ∈ {0.25, 0.5, 0.75} → frac ∈
# {0, .25, .5, .75} (exact powers of two) and l_quantity is a small
# integer, so Spark's (1-g)·lo + g·hi and DuckDB's lo + (hi-lo)·g are
# both computed without rounding and agree identically. q = k/10
# fractions (0.1 is not binary-exact) void (a) — those go through the
# milli-cent integer construction instead.
# ---------------------------------------------------------------------------

_QUANTILE_ORACLE = """
SELECT l_returnflag,
       MEDIAN(l_quantity) AS med_qty,
       QUANTILE_CONT(l_quantity, 0.25) AS q1_qty,
       QUANTILE_CONT(l_quantity, 0.75) AS q3_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


@register("quantiles_quantity", oracle=_QUANTILE_ORACLE, tags=("G1", "G9"))
def quantiles_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("med_qty"),
        F.percentile("l_quantity", F.lit(0.25)).alias("q1_qty"),
        F.percentile("l_quantity", F.lit(0.75)).alias("q3_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# Correlated scalar subqueries through the SQL text entry point
# (spark.sql over temp views — the reference's psql view lifecycle,
# README.md:199-205). Customers above their nation's average balance;
# the predicate is rewritten as bal*count > sum so both engines compare
# exact decimals (no AVG rounding at the boundary).
# ---------------------------------------------------------------------------

_ABOVE_AVG_SQL = """
SELECT c.c_custkey AS custkey, c.c_name AS name,
       CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal
FROM {customer} c
WHERE CAST(c.c_acctbal AS DECIMAL(12,2))
      * (SELECT COUNT(*) FROM {customer} c2
         WHERE c2.c_nationkey = c.c_nationkey)
      > (SELECT SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) FROM {customer} c2
         WHERE c2.c_nationkey = c.c_nationkey)
"""


@register(
    "above_nation_avg_balance",
    oracle=_ABOVE_AVG_SQL.format(customer="customer"),
    tags=("J2", "G2"),
)
def above_nation_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "customer").createOrReplaceTempView("__an_customer")
    return spark.sql(_ABOVE_AVG_SQL.format(customer="__an_customer"))


# ---------------------------------------------------------------------------
# TPC-H Q3-shaped shipping-priority headline: the canonical
# fact⋈fact⋈dim join + filtered aggregation + top-k, decimal-exact.
# ---------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT l.l_orderkey AS orderkey,
       (CAST(FLOOR(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))) AS DOUBLE) + CAST((SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))) - FLOOR(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))) AS DOUBLE)) AS revenue,
       CAST(o.o_orderdate AS DATE) AS orderdate,
       o.o_orderpriority AS priority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1995-03-15'
  AND l.l_shipdate > DATE '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, orderdate ASC, orderkey ASC
LIMIT 10
"""


@register("q3_shipping_priority", oracle=_Q3_ORACLE, tags=("J1", "J2", "G1", "O3"), bench=True)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    # fanout=False (r13 optimization): the filtered orders side is
    # broadcast by AQE at bench scale — fanning it out first only adds
    # a wasted exchange before the BroadcastExchange re-collects it; at
    # shuffle-join scale the join's own exchange supplies the spread.
    o = table(spark, sf_dir, "orders", fanout=False).filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("date")
    )
    # fanout_chunk (r13 optimization, guide §2.2/§2.4): this frame flows
    # straight into the orders join — broadcast-probed at bench scale
    # (the probe is ~ns/row, no spread needed), re-shuffled by the
    # join's own exchange when orders outgrows the broadcast threshold.
    # The partition count derives from input size, so the exchange
    # disappears at bench scale and returns at 10-100×.
    li = table(spark, sf_dir, "lineitem", fanout_chunk=16 << 20).filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("date")
    )
    one = F.lit(1).cast("decimal(12,2)")
    # customer grows with scale factor — no broadcast hint; AQE picks
    # broadcast at small SF and falls back to shuffle join at 100×
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            d2d(
                F.sum(dec2("l_extendedprice") * (one - dec2("l_discount"))),
                "revenue",
            )
        )
        .select("orderkey", "revenue", "orderdate", "priority")
        .orderBy(F.col("revenue").desc(), F.col("orderdate").asc(), F.col("orderkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H Q5-shaped local-supplier volume: the full 6-relation star join
# (region→nation→{customer,supplier}→orders→lineitem) with the
# same-nation customer/supplier constraint — the canonical test of join
# ordering + broadcast selection over the whole schema.
# ---------------------------------------------------------------------------

_Q5_ORACLE = """
SELECT n.n_name AS nation,
       (CAST(FLOOR(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))) AS DOUBLE) + CAST((SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))) - FLOOR(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))) AS DOUBLE)) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= DATE '1995-01-01'
  AND o.o_orderdate < DATE '1996-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, nation ASC
"""


@register(
    "q5_local_supplier_volume",
    oracle=_Q5_ORACLE,
    tags=("J1", "J2", "G1", "G4", "O1"),
    bench=True,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    # 1995 window: the testdata's order dates start 1995-01-01, so the
    # canonical 1994 window would make the whole query vacuous.
    # fanout=False: same rationale as q3 — this side is broadcast at
    # bench scale, so a pre-broadcast fan-out exchange is pure waste.
    o = table(spark, sf_dir, "orders", fanout=False).filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
    )
    # fanout_chunk: same rationale as q3 — join-bound probe side
    li = table(spark, sf_dir, "lineitem", fanout_chunk=16 << 20)
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    one = F.lit(1).cast("decimal(12,2)")
    # customer/supplier are sf-proportional: hint only the fixed-size
    # nation/region dims and let AQE size the rest at runtime
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            s,
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            d2d(
                F.sum(dec2("l_extendedprice") * (one - dec2("l_discount"))),
                "revenue",
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("nation").asc())
    )


# ---------------------------------------------------------------------------
# W3/W4 depth: ntile quartiles + nth_value + cume_dist over customer
# balances within each nation (full analytic-function battery with a
# deterministic total order).
# ---------------------------------------------------------------------------

_NTILE_ORACLE = """
SELECT c_custkey AS custkey,
       c_nationkey AS nationkey,
       NTILE(4) OVER w AS balance_quartile,
       CAST(CAST(FIRST_VALUE(c_acctbal) OVER w AS DECIMAL(12,2)) AS DOUBLE) AS top_bal,
       CAST(CAST(NTH_VALUE(c_acctbal, 2) OVER w AS DECIMAL(12,2)) AS DOUBLE) AS second_bal,
       CUME_DIST() OVER w AS bal_cume
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


@register("ntile_balance_quartiles", oracle=_NTILE_ORACLE, tags=("W3", "W4"))
def ntile_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    c = table(spark, sf_dir, "customer")
    order = [F.col("c_acctbal").desc(), F.col("c_custkey").asc()]
    w = Window.partitionBy("c_nationkey").orderBy(*order)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_nationkey").alias("nationkey"),
        F.ntile(4).over(w).alias("balance_quartile"),
        dec2(F.first("c_acctbal").over(wf)).cast("double").alias("top_bal"),
        dec2(F.nth_value("c_acctbal", 2).over(wf)).cast("double").alias("second_bal"),
        F.cume_dist().over(w).alias("bal_cume"),
    )


# ---------------------------------------------------------------------------
# F11 depth: edit-distance fuzzy match (levenshtein is built into both
# engines) — nearest nation name for a probe list of misspellings.
# ---------------------------------------------------------------------------

_FUZZY_ORACLE = """
WITH probes AS (
  SELECT * FROM (VALUES ('CHINNA'), ('JAPPAN'), ('FRANC'), ('BRAZL'), ('KENIA')) p(probe)
),
scored AS (
  SELECT p.probe, n.n_name,
         levenshtein(p.probe, n.n_name) AS dist,
         ROW_NUMBER() OVER (PARTITION BY p.probe
                            ORDER BY levenshtein(p.probe, n.n_name) ASC,
                                     n.n_name ASC) AS rn
  FROM probes p CROSS JOIN nation n
)
SELECT probe, n_name AS best_match, dist
FROM scored WHERE rn = 1
"""


@register("fuzzy_nation_match", oracle=_FUZZY_ORACLE, tags=("F11", "J8", "W1"))
def fuzzy_nation_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import topk_per_group

    n = table(spark, sf_dir, "nation")
    probes = spark.createDataFrame(
        [("CHINNA",), ("JAPPAN",), ("FRANC",), ("BRAZL",), ("KENIA",)], ["probe"]
    )
    scored = probes.crossJoin(F.broadcast(n.select("n_name"))).select(
        "probe", "n_name", F.levenshtein("probe", "n_name").alias("dist")
    )
    best = topk_per_group(
        scored, ["probe"], [F.col("dist").asc(), F.col("n_name").asc()], 1, rank_col="rn"
    )
    return best.select("probe", F.col("n_name").alias("best_match"), "dist")


# ---------------------------------------------------------------------------
# TPC-H Q18-shaped large-volume customers: aggregate-HAVING feeding a
# semi join (J4) back into a 3-way join + rollup — the "filter by a
# property of the group" pattern.
# ---------------------------------------------------------------------------

_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > CAST(200 AS DECIMAL(12,2))
)
SELECT c.c_name AS name,
       o.o_orderkey AS orderkey,
       CAST(o.o_orderdate AS DATE) AS orderdate,
       CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price,
       (CAST(FLOOR(SUM(CAST(l.l_quantity AS DECIMAL(12,2)))) AS DOUBLE) + CAST((SUM(CAST(l.l_quantity AS DECIMAL(12,2)))) - FLOOR(SUM(CAST(l.l_quantity AS DECIMAL(12,2)))) AS DOUBLE)) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY total_price DESC, orderkey ASC
LIMIT 20
"""


@register("q18_large_volume_customers", oracle=_Q18_ORACLE, tags=("J4", "G1", "G4", "O3"))
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single lineitem pass: because o_orderkey is a grouping key of the
    # final rollup, the per-group quantity sum IS the per-order sum — so
    # the HAVING filter and the output measure come from one aggregate,
    # and the textbook plan's second lineitem scan + second aggregation
    # (what the SQL spelling literally describes) disappears. The IN
    # (semi join) is subsumed by the inner join on the filtered rollup.
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec2("l_quantity")).alias("__q"))
        .filter(F.col("__q") > F.lit(200).cast("decimal(12,2)"))
    )
    # customer is sf-proportional — no broadcast hint, AQE decides
    return (
        o.join(big, o["o_orderkey"] == big["l_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_name").alias("name"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").cast("date").alias("orderdate"),
            dec2("o_totalprice").cast("double").alias("total_price"),
            d2d(F.col("__q"), "total_qty"),
        )
        .orderBy(F.col("total_price").desc(), F.col("orderkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q6-shaped revenue change: a pure scan-filter-aggregate with three
# range predicates, all of which must reach the parquet reader as
# PushedFilters (date + two numeric bands) — at 100 TB this query is
# row-group pruning or nothing. Decimal product keeps the sum exact.
# ---------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT (CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) + CAST((SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2)))) - FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
  AND CAST(l_discount AS DECIMAL(12,2)) BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_revenue_change", oracle=_Q6_ORACLE, tags=("P8", "P10", "G4"), bench=True)
def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fanout=False (r13 optimization, guide §2.4): the pushed filters
    # keep ~2% of rows at every scale factor, so the fan-out exchange
    # would spread a few thousand survivors over all slots for one
    # scalar aggregate — the exchange costs more than the sum it
    # parallelizes, at bench scale and at 100× alike.
    li = table(spark, sf_dir, "lineitem", fanout=False)
    lo = F.lit("0.05").cast("decimal(12,2)")
    hi = F.lit("0.07").cast("decimal(12,2)")
    return (
        li.filter(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
            # bracketing raw-double band reaches the reader as a
            # PushedFilter (row-group stats pruning); the decimal band is
            # the exact predicate (the cast blocks its pushdown)
            & F.col("l_discount").between(0.04, 0.08)
            & dec2("l_discount").between(lo, hi)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            d2d(F.sum(dec2("l_extendedprice") * dec2("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q10-shaped returned-item report: who returned the most revenue
# in a quarter. Two fact joins shuffle on their keys; customer carries
# its grouping attributes through the aggregate (no re-join after), and
# nation is a broadcast. Top-20 by revenue.
# ---------------------------------------------------------------------------

_Q10_ORACLE = """
SELECT c.c_custkey AS custkey,
       c.c_name AS name,
       (CAST(FLOOR(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))) AS DOUBLE) + CAST((SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))) - FLOOR(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))) AS DOUBLE)) AS revenue,
       CAST(c.c_acctbal AS DOUBLE) AS acctbal,
       n.n_name AS nation
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o.o_orderdate AS DATE) < DATE '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY custkey, name, acctbal, nation
ORDER BY revenue DESC, custkey ASC
LIMIT 20
"""


@register("q10_returned_items", oracle=_Q10_ORACLE, tags=("J1", "J2", "G1", "O3"))
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-04-01").cast("date"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    one = F.lit(1).cast("decimal(12,2)")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").cast("double").alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            d2d(
                F.sum(dec2("l_extendedprice") * (one - dec2("l_discount"))),
                "revenue",
            )
        )
        .select("custkey", "name", "revenue", "acctbal", "nation")
        .orderBy(F.col("revenue").desc(), F.col("custkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q12-shaped late-shipment priority split (adapted: the testdata
# lineitem has no commit/receipt dates or shipmode, so "late" = shipped
# >60 days after the order date). Conditional two-way count per ship
# year over the orders⋈lineitem join — the map-side CASE folds into the
# partial aggregate, so the shuffle carries one row per year.
# ---------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT EXTRACT(year FROM l.l_shipdate) AS ship_year,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY
GROUP BY ship_year
ORDER BY ship_year
"""


@register("q12_late_shipment_priority", oracle=_Q12_ORACLE, tags=("J2", "G6", "P10"))
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(
            F.col("l_shipdate").cast("date")
            > F.date_add(F.col("o_orderdate").cast("date"), 60)
        )
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


# ---------------------------------------------------------------------------
# TPC-H Q14-shaped promo-revenue share per month: broadcast part into
# lineitem, then one aggregate computes both the PROMO-only and the
# total revenue (filtered-sum pattern); the share is an IEEE double
# division both engines perform identically on the exact decimal sums.
# ---------------------------------------------------------------------------

_Q14_ORACLE = """
SELECT EXTRACT(month FROM l.l_shipdate) AS ship_month,
       CAST(100.0 * (CAST(FLOOR(SUM(CASE WHEN p.p_type = 'PROMO' THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))) ELSE CAST(0 AS DECIMAL(25,4)) END)) AS DOUBLE) + CAST((SUM(CASE WHEN p.p_type = 'PROMO' THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))) ELSE CAST(0 AS DECIMAL(25,4)) END)) - FLOOR(SUM(CASE WHEN p.p_type = 'PROMO' THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))) ELSE CAST(0 AS DECIMAL(25,4)) END)) AS DOUBLE))
            / (CAST(FLOOR(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))) AS DOUBLE) + CAST((SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))) - FLOOR(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))) AS DOUBLE)) AS DOUBLE) AS promo_share
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE CAST(l.l_shipdate AS DATE) >= DATE '1997-01-01'
  AND CAST(l.l_shipdate AS DATE) < DATE '1998-01-01'
GROUP BY ship_month
ORDER BY ship_month
"""


@register("q14_promo_share", oracle=_Q14_ORACLE, tags=("J1", "G6", "F9"))
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01").cast("date"))
    )
    one = F.lit(1).cast("decimal(12,2)")
    rev = dec2("l_extendedprice") * (one - dec2("l_discount"))
    zero = F.lit(0).cast("decimal(25,4)")
    # part is sf-proportional and unfiltered here — no broadcast hint;
    # AQE broadcasts while it fits and degrades to shuffle join at 100×
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy(F.month("l_shipdate").cast("long").alias("ship_month"))
        .agg(
            (
                F.lit(100.0)
                * d2d(F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)))
                / d2d(F.sum(rev))
            )
            .cast("double")
            .alias("promo_share")
        )
        .orderBy("ship_month")
    )


# ---------------------------------------------------------------------------
# TPC-H Q19-shaped disjunctive-band revenue (adapted to the columns the
# testdata part table has: brand + size bands × quantity bands). The
# OR-of-ANDs predicate straddles the join — brand/size conjuncts push to
# the part scan, quantity bounds (1..30 overall) push to lineitem, and
# the residual disjunction evaluates post-join in codegen.
# ---------------------------------------------------------------------------

_Q19_ORACLE = """
SELECT (CAST(FLOOR(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))) AS DOUBLE) + CAST((SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))) - FLOOR(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))) AS DOUBLE)) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@register("q19_disjunctive_bands", oracle=_Q19_ORACLE, tags=("J1", "P10", "G4"))
def q19_disjunctive_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    # Per-side implications of the OR-of-ANDs, made explicit so they
    # reach both parquet scans as pushed filters; the exact disjunction
    # still evaluates post-join. part shrinks to 3 brands — small enough
    # that AQE broadcasts it without a hard-coded hint.
    p_side = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#14") & F.col("p_size").between(1, 15))
    )
    one = F.lit(1).cast("decimal(12,2)")
    return (
        li.filter(q.between(1, 30))
        .join(p.filter(p_side), li["l_partkey"] == p["p_partkey"])
        .filter(band)
        .agg(
            d2d(
                F.sum(dec2("l_extendedprice") * (one - dec2("l_discount"))),
                "revenue",
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q4-shaped order-priority check (adapted: "late" = some lineitem
# shipped >60 days after the order date, since the testdata carries no
# commit/receipt dates). The EXISTS is a left-semi join — the lineitem
# side reduces to a distinct orderkey set before the shuffle.
# ---------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o.o_orderpriority AS priority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY
)
GROUP BY priority
ORDER BY priority
"""


@register("q4_order_priority_check", oracle=_Q4_ORACLE, tags=("J4", "G5"))
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    # the correlation touches o_orderdate, so the predicate must ride
    # the join condition (a plain semi join on orderkey would lose it)
    return (
        o.join(
            li,
            (o["o_orderkey"] == li["l_orderkey"])
            & (
                li["l_shipdate"].cast("date")
                > F.date_add(o["o_orderdate"].cast("date"), 60)
            ),
            "left_semi",
        )
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# TPC-H Q22-shaped idle-rich-customers (adapted: no phone country codes
# in the testdata, and every customer has SOME order, so "idle" means
# no order since 1998 — otherwise the anti join is vacuously empty and
# the correctness row proves nothing): customers with above-global-
# average positive balance and no recent orders — a scalar aggregate
# subquery feeding a filter, then an anti join against the (filtered)
# fact table, rolled up per nation.
# ---------------------------------------------------------------------------

_Q22_ORACLE = """
WITH threshold AS (
  SELECT (CAST(FLOOR(SUM(CAST(c_acctbal AS DECIMAL(12,2)))) AS DOUBLE) + CAST((SUM(CAST(c_acctbal AS DECIMAL(12,2)))) - FLOOR(SUM(CAST(c_acctbal AS DECIMAL(12,2)))) AS DOUBLE)) / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT n.n_name AS nation,
       COUNT(*) AS n_customers,
       (CAST(FLOOR(SUM(CAST(c.c_acctbal AS DECIMAL(12,2)))) AS DOUBLE) + CAST((SUM(CAST(c.c_acctbal AS DECIMAL(12,2)))) - FLOOR(SUM(CAST(c.c_acctbal AS DECIMAL(12,2)))) AS DOUBLE)) AS total_balance
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE CAST(c.c_acctbal AS DOUBLE) > (SELECT avg_bal FROM threshold)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND CAST(o.o_orderdate AS DATE) >= DATE '1998-01-01')
GROUP BY nation
ORDER BY nation
"""


@register("q22_idle_rich_customers", oracle=_Q22_ORACLE, tags=("J3", "G2"))
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    # scalar aggregate subquery as a broadcast cross join of the 1-row
    # aggregate — fully lazy (no driver collect at plan-build time), one
    # tiny broadcast regardless of scale. The threshold is an exact
    # DECIMAL sum divided once — a double AVG would be summation-order
    # dependent across partition layouts and engines
    threshold = c.filter(F.col("c_acctbal") > 0).agg(
        (d2d(F.sum(dec2("c_acctbal"))) / F.count(F.lit(1))).alias(
            "__avg_bal"
        )
    )
    recent = o.filter(
        F.col("o_orderdate").cast("date") >= F.lit("1998-01-01").cast("date")
    )
    return (
        c.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal").cast("double") > F.col("__avg_bal"))
        .drop("__avg_bal")
        .join(recent, c["c_custkey"] == recent["o_custkey"], "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            d2d(F.sum(dec2("c_acctbal")), "total_balance"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# G10 sketch family beyond HLL, sketch-then-exact-refine spelling (the
# frequent_terms_exact discipline applied to quantiles): sketch
# internals differ per engine, but the sketch's DECISIONS are
# deterministic and oracle-checkable.
#   Pass 1 (full scan, mergeable map-side sketches): per returnflag, a
#     GK quantile sketch (percentile_approx, accuracy A → rank error
#     <= n/A) proposes VALUE WINDOWS [lo, hi] guaranteed to bracket the
#     exact rank-k element for k = ceil(q·n), plus an HLL distinct
#     estimate and the exact distinct count.
#   Pass 2 (rank-bounded refinement): count elements below each window,
#     then row_number only the ~8·n/A rows INSIDE the window and pick
#     the element at local rank k - c_lt — the exact discrete quantile,
#     computed without ever fully sorting a group. At 100 TB this is
#     the sketch scan plus two cheap passes (a counting aggregate and
#     the window over the sketch-bounded candidates — a few dozen rows
#     per group); a full per-group sort would shuffle everything. The
#     3-row sketch aggregate is persisted so its scan runs once, not
#     once per consumer.
#   The HLL estimate is emitted as its deterministic decision — a
#   within-5%-of-exact boolean (HLL lgK=12 RSE ~1.6%, so 5% ≈ 3σ; the
#   hash is stable because Spark's HLL is deterministic for fixed
#   data) — which DuckDB asserts as literal TRUE.
# If a GK bound ever failed (true rank-k element outside [lo, hi]),
# the pick filter rn == k - c_lt matches nothing for that measure and
# the pivot leaves the group's median/p99 NULL — the group ROW still
# survives, so the failure signal is the oracle VALUE-hash mismatch
# (NULL vs the exact quantile), not a row-count drop. The external
# comparison still flags it deterministically.
# ---------------------------------------------------------------------------

_SKETCH_QUANT_ORACLE = """
WITH ranked AS (
  SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS x,
         ROW_NUMBER() OVER (
           PARTITION BY l_returnflag ORDER BY CAST(l_extendedprice AS DOUBLE)
         ) AS r,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
),
q AS (
  SELECT l_returnflag,
         MAX(n) AS n,
         MAX(CASE WHEN r = (n + 1) // 2 THEN x END) AS median_price,
         MAX(CASE WHEN r = (99 * n + 99) // 100 THEN x END) AS p99_price
  FROM ranked GROUP BY l_returnflag
),
d AS (
  SELECT l_returnflag,
         CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders_exact
  FROM lineitem GROUP BY l_returnflag
)
SELECT q.l_returnflag,
       CAST(q.n AS BIGINT) AS n_rows,
       q.median_price,
       q.p99_price,
       d.n_orders_exact,
       TRUE AS hll_within_5pct
FROM q JOIN d USING (l_returnflag)
ORDER BY l_returnflag
"""


@register("sketch_quantiles_hll", oracle=_SKETCH_QUANT_ORACLE, tags=("G10",))
def sketch_quantiles_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    A = 10_000  # GK accuracy: rank error <= n/A (~6 rows/group at sf0.01)
    eps4 = 4.0 / A  # 4x the guarantee band — a few dozen extra window rows
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").cast("double").alias("x"),
        "l_orderkey",
    )
    pcts = F.array(
        F.lit(max(0.0, 0.50 - eps4)),
        F.lit(min(1.0, 0.50 + eps4)),
        F.lit(max(0.0, 0.99 - eps4)),
        F.lit(min(1.0, 0.99 + eps4)),
    )
    from ..caching import tracked_persist

    # 3 rows, but its subtree is the full sketch scan — persist so the
    # bounds branch and the final join don't each re-run it
    sk = tracked_persist(
        li.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n"),
            F.percentile_approx("x", pcts, F.lit(A)).alias("b"),
            F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey")).alias("hll_est"),
            F.countDistinct("l_orderkey").alias("n_orders_exact"),
        )
    )
    two = F.lit(2).cast("bigint")
    hundred = F.lit(100).cast("bigint")
    bounds = sk.select(
        "l_returnflag",
        F.explode(
            F.array(
                F.struct(
                    F.lit("p50").alias("measure"),
                    F.call_function("div", F.col("n") + 1, two).alias("k"),
                    F.col("b")[0].alias("lo"),
                    F.col("b")[1].alias("hi"),
                ),
                F.struct(
                    F.lit("p99").alias("measure"),
                    F.call_function("div", F.lit(99) * F.col("n") + 99, hundred).alias(
                        "k"
                    ),
                    F.col("b")[2].alias("lo"),
                    F.col("b")[3].alias("hi"),
                ),
            )
        ).alias("mm"),
    ).select("l_returnflag", "mm.*")
    j = li.join(F.broadcast(bounds), "l_returnflag")
    c_lt = j.groupBy("l_returnflag", "measure").agg(
        F.sum((F.col("x") < F.col("lo")).cast("bigint")).alias("c_lt")
    )
    w = Window.partitionBy("l_returnflag", "measure").orderBy("x")
    picked = (
        j.filter((F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi")))
        .withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(c_lt), ["l_returnflag", "measure"])
        .filter(F.col("rn") == F.col("k") - F.col("c_lt"))
        .select("l_returnflag", "measure", F.col("x").alias("v"))
    )
    vals = picked.groupBy("l_returnflag").pivot("measure", ["p50", "p99"]).agg(
        F.first("v")
    )
    return (
        sk.join(vals, "l_returnflag")
        .select(
            "l_returnflag",
            F.col("n").cast("bigint").alias("n_rows"),
            F.col("p50").alias("median_price"),
            F.col("p99").alias("p99_price"),
            F.col("n_orders_exact").cast("bigint").alias("n_orders_exact"),
            (
                F.abs(F.col("hll_est") - F.col("n_orders_exact")) * 100
                <= F.col("n_orders_exact") * 5
            ).alias("hll_within_5pct"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Spark 4 recursive CTE: a month date-spine LEFT-joined to order counts
# — the gap-filling analytics pattern (months with zero orders appear
# with n_orders = 0, which no plain GROUP BY can produce). The spine is
# 80 rows of driver-free recursion; the join is an equi-join on the
# month-truncated order date, so the fact side shuffles on a
# low-cardinality bounded key at any scale factor.
# ---------------------------------------------------------------------------

_RECURSIVE_SPINE_SQL = """
WITH RECURSIVE spine(m) AS (
  SELECT TIMESTAMP '1995-01-01 00:00:00'
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM spine WHERE m < TIMESTAMP '2001-08-01 00:00:00'
)
SELECT spine.m AS month_start,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
FROM spine
LEFT JOIN {orders} o ON DATE_TRUNC('MONTH', o.o_orderdate) = spine.m
GROUP BY spine.m
ORDER BY month_start
"""


@register(
    "recursive_month_spine",
    oracle=_RECURSIVE_SPINE_SQL.format(orders="orders"),
    tags=("J5", "G5", "F9"),
)
def recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("__rec_orders")
    return spark.sql(_RECURSIVE_SPINE_SQL.format(orders="__rec_orders"))


# ---------------------------------------------------------------------------
# UNPIVOT/melt: wide measure columns to long (measure, value) rows —
# the inverse of the G9 pivot, one narrow shuffle per measure group.
# Oracle is the engine-portable UNION ALL spelling.
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
SELECT measure,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       (CAST(FLOOR(SUM(CAST(value AS DECIMAL(14,2)))) AS DOUBLE) + CAST((SUM(CAST(value AS DECIMAL(14,2)))) - FLOOR(SUM(CAST(value AS DECIMAL(14,2)))) AS DOUBLE)) AS total
FROM (
  SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT 'l_discount', l_discount FROM lineitem
)
GROUP BY measure
ORDER BY measure
"""


@register("unpivot_measures", oracle=_UNPIVOT_ORACLE, tags=("G9", "U1"))
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    long = li.select("l_quantity", "l_extendedprice", "l_discount").melt(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="value",
    )
    return (
        long.groupBy("measure")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            d2d(F.sum(F.col("value").cast("decimal(14,2)")), "total"),
        )
        .orderBy("measure")
    )


# ---------------------------------------------------------------------------
# Q3-adjacent warehouse op: SCD Type-2 dimension history ([EXT] — the
# slowly-changing-dimension build every warehouse load runs; the
# reference's upsert (dags/weather_etl_pipeline.py ON CONFLICT) only
# keeps the LATEST row — this derives the full validity-interval
# history from the change log). Source: each customer's daily order
# priority (last order wins within a day) treated as an attribute
# change stream; output one row per priority CHANGE with
# [effective_from, effective_to] and an is_current flag.
# Two windows over one customer-keyed shuffle: a lag() to drop
# no-change days, a lead() to close intervals. At 100 TB both windows
# share the same partitioning — one Exchange total, no self-join (the
# naive interval build joins changes to changes; lead() is free here).
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH snap AS (
  SELECT o_custkey AS custkey, CAST(o_orderdate AS DATE) AS d,
         MAX_BY(o_orderpriority, o_orderkey) AS priority
  FROM orders GROUP BY 1, 2
),
chg AS (
  SELECT custkey, d, priority,
         LAG(priority) OVER (PARTITION BY custkey ORDER BY d) AS prev_p
  FROM snap
),
hist AS (
  SELECT custkey, priority, d AS effective_from,
         LEAD(d) OVER (PARTITION BY custkey ORDER BY d) - 1 AS next_from
  FROM chg WHERE prev_p IS NULL OR prev_p <> priority
)
SELECT custkey, priority, effective_from,
       next_from AS effective_to,
       next_from IS NULL AS is_current
FROM hist
"""


@register("scd2_priority_history", oracle=_SCD2_ORACLE, tags=("Q3", "W3"))
def scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = table(spark, sf_dir, "orders")
    snap = o.groupBy(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).agg(F.max_by("o_orderpriority", "o_orderkey").alias("priority"))
    w = Window.partitionBy("custkey").orderBy("d")
    chg = snap.withColumn("prev_p", F.lag("priority").over(w)).filter(
        F.col("prev_p").isNull() | (F.col("prev_p") != F.col("priority"))
    )
    hist = chg.withColumn("next_from", F.date_sub(F.lead("d").over(w), 1))
    return hist.select(
        "custkey",
        "priority",
        F.col("d").alias("effective_from"),
        F.col("next_from").alias("effective_to"),
        F.col("next_from").isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# G9 completion: explicit GROUPING SETS — the arbitrary-subtotal form
# CUBE/ROLLUP are shorthands of (one aggregation pass computes the
# status totals, the priority totals, and the grand total; no UNION of
# three scans). Same sentinel discipline as cube_status_priority.
# ---------------------------------------------------------------------------

_GSETS_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders,
       (CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(12,2)))) AS DOUBLE) + CAST((SUM(CAST(o_totalprice AS DECIMAL(12,2)))) - FLOOR(SUM(CAST(o_totalprice AS DECIMAL(12,2)))) AS DOUBLE)) AS total_price
FROM {orders}
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register(
    "grouping_sets_totals",
    oracle=_GSETS_SQL.format(orders="orders"),
    tags=("G9",),
)
def grouping_sets_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("__gs_orders")
    return spark.sql(_GSETS_SQL.format(orders="__gs_orders"))


# ---------------------------------------------------------------------------
# J7 × SCD2 composition: point-in-time dimension lookup ([EXT] — the
# canonical warehouse temporal pattern: attach to each fact row the
# dimension version valid at the fact's timestamp). Facts = orders;
# dimension history = the SCD2 priority intervals derived above; the
# lookup is the union-sort as-of join (operators/relational.py:53 —
# one customer-keyed shuffle, no range-join candidate blowup at 100 TB).
# ---------------------------------------------------------------------------

_PIT_ORACLE = """
WITH snap AS (
  SELECT o_custkey AS custkey, CAST(o_orderdate AS DATE) AS d,
         MAX_BY(o_orderpriority, o_orderkey) AS priority
  FROM orders GROUP BY 1, 2
),
chg AS (
  SELECT custkey, d, priority,
         LAG(priority) OVER (PARTITION BY custkey ORDER BY d) AS prev_p
  FROM snap
),
hist AS (
  SELECT custkey, priority, d AS effective_from
  FROM chg WHERE prev_p IS NULL OR prev_p <> priority
)
SELECT orderkey, custkey, orderdate, priority_asof, effective_from_asof
FROM (
  SELECT o.o_orderkey AS orderkey, o.o_custkey AS custkey,
         CAST(o.o_orderdate AS DATE) AS orderdate,
         h.priority AS priority_asof,
         h.effective_from AS effective_from_asof,
         ROW_NUMBER() OVER (PARTITION BY o.o_orderkey
                            ORDER BY h.effective_from DESC) AS rn
  FROM orders o
  JOIN hist h ON h.custkey = o.o_custkey
             AND h.effective_from <= CAST(o.o_orderdate AS DATE)
) WHERE rn = 1
"""


@register("orders_priority_point_in_time", oracle=_PIT_ORACLE, tags=("J7", "Q3"))
def orders_priority_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import asof_join

    hist = scd2_priority_history(spark, sf_dir).select(
        "custkey", "priority", "effective_from"
    )
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").cast("date").alias("orderdate"),
    )
    return asof_join(
        o,
        hist,
        on=["custkey"],
        left_ts="orderdate",
        right_ts="effective_from",
        right_vals=["priority"],
    ).select(
        "orderkey",
        "custkey",
        "orderdate",
        "priority_asof",
        F.col("effective_from_asof"),
    )


# ---------------------------------------------------------------------------
# Z-order layout buckets ([EXT] — operators/layout.py; the lake-side
# twin of the reference's composite btree access paths,
# sql/create_weather_tables.sql:108-110). Buckets are the top 16 bits
# of the 32-bit Morton code of (custkey, orderdate-day), i.e. the file
# grains a z-ordered write would produce; per-bucket key min/maxes ARE
# the parquet row-group stats a pruned scan would consult, and their
# tightness in both dimensions at once is the whole point of the
# layout. Pure integer bit math — bit-identical in any engine.
# ---------------------------------------------------------------------------

_Z_EPOCH = "1992-01-01"


def _zorder_oracle() -> str:
    from ..operators.layout import sql_zorder_value

    z = sql_zorder_value(
        "o_custkey % 65536",
        f"DATE_DIFF('day', DATE '{_Z_EPOCH}', CAST(o_orderdate AS DATE)) % 65536",
    )
    return f"""
WITH z AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS od, {z} AS zval
  FROM orders
)
SELECT CAST(zval >> 16 AS INT) AS z_bucket,
       COUNT(*) AS n_orders,
       MIN(o_custkey) AS custkey_min, MAX(o_custkey) AS custkey_max,
       MIN(od) AS orderdate_min, MAX(od) AS orderdate_max,
       MIN(zval) AS z_min, MAX(zval) AS z_max
FROM z GROUP BY 1
"""


@register("zorder_layout_buckets", oracle=_zorder_oracle(), tags=("G7", "O1"))
def zorder_layout_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import zorder_value

    o = table(spark, sf_dir, "orders")
    z = zorder_value(
        F.col("o_custkey") % 65536,
        F.datediff(F.col("o_orderdate").cast("date"), F.lit(_Z_EPOCH).cast("date"))
        % 65536,
    )
    zf = o.select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("od"), z.alias("zval")
    )
    return zf.groupBy(
        F.shiftright("zval", 16).cast("int").alias("z_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_custkey").alias("custkey_min"),
        F.max("o_custkey").alias("custkey_max"),
        F.min("od").alias("orderdate_min"),
        F.max("od").alias("orderdate_max"),
        F.min("zval").alias("z_min"),
        F.max("zval").alias("z_max"),
    )


# ---------------------------------------------------------------------------
# ANALYZE-style table profiler ([EXT] — the statistics-collection pass
# a warehouse runs before planning; the engine-side analog of the
# reference's implicit reliance on Postgres table stats for its
# indexed access paths). ONE scan produces per-column null counts,
# exact distinct counts, and min/max, then pivots to one row per
# column map-side (array-of-structs explode — no second shuffle).
# Exact COUNT(DISTINCT) over 4 columns costs a 4-way Expand at scale;
# that is the oracle-checkable twin of the production path, which
# swaps in approx_count_distinct per column (G10) at 100 TB.
# ---------------------------------------------------------------------------

_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name,
       COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       MIN({c}) AS min_value,
       MAX({c}) AS max_value
FROM lineitem"""
    for c in _PROFILE_COLS
)


@register("table_profile_lineitem", oracle=_PROFILE_ORACLE, tags=("G5", "G9", "G10"))
def table_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in _PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__ndv"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
        ]
    row = li.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("__rows").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__ndv").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")


# ---------------------------------------------------------------------------
# RFM customer scoring ([EXT] — the classic CRM segmentation: per
# customer Recency = days since last order at the dataset's frontier
# date, Frequency = order count, Monetary = exact-decimal lifetime
# spend; each dimension quartiled with NTILE over a deterministic
# total order (metric + custkey tie-break), concatenated to a 3-digit
# segment). One shuffle on custkey builds all three metrics; the
# frontier date folds in as a broadcast 1-row aggregate, not a driver
# action.
# ---------------------------------------------------------------------------

_RFM_ORACLE = """
WITH frontier AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
base AS (
  SELECT o_custkey AS custkey,
         DATE_DIFF('day', MAX(CAST(o_orderdate AS DATE)),
                   (SELECT maxd FROM frontier)) AS recency_days,
         COUNT(*) AS frequency,
         (CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(12,2)))) AS DOUBLE) + CAST((SUM(CAST(o_totalprice AS DECIMAL(12,2)))) - FLOOR(SUM(CAST(o_totalprice AS DECIMAL(12,2)))) AS DOUBLE)) AS monetary
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT *,
         NTILE(4) OVER (ORDER BY recency_days ASC, custkey ASC) AS r_score,
         NTILE(4) OVER (ORDER BY frequency DESC, custkey ASC) AS f_score,
         NTILE(4) OVER (ORDER BY monetary DESC, custkey ASC) AS m_score
  FROM base
)
SELECT custkey, CAST(recency_days AS INT) AS recency_days, frequency, monetary,
       CAST(r_score AS INT) AS r_score,
       CAST(f_score AS INT) AS f_score,
       CAST(m_score AS INT) AS m_score,
       CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS rfm_segment
FROM scored
"""


@register("rfm_customer_scores", oracle=_RFM_ORACLE, tags=("W3", "W4", "G1"))
def rfm_customer_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import with_global_ntile

    o = table(spark, sf_dir, "orders")
    frontier = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("__maxd"))
    base = (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("__lastd"),
            F.count(F.lit(1)).alias("frequency"),
            d2d(F.sum(dec2("o_totalprice")), "monetary"),
        )
        .crossJoin(F.broadcast(frontier))
        .select(
            "custkey",
            F.datediff("__maxd", "__lastd").cast("int").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    # global NTILE WITHOUT the single-reducer sort: each dimension is
    # a distributed rank (range-partition + per-partition offsets —
    # operators/relational.py:with_global_ntile) whose integer tile
    # math is bit-identical to the oracle's NTILE, so this stays
    # hash-checked while every pass runs parallel at any scale
    scored = with_global_ntile(
        base, [F.asc("recency_days"), F.asc("custkey")], 4, "r_score"
    )
    scored = with_global_ntile(
        scored, [F.desc("frequency"), F.asc("custkey")], 4, "f_score"
    )
    scored = with_global_ntile(
        scored, [F.desc("monetary"), F.asc("custkey")], 4, "m_score"
    )
    return scored.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
    ).withColumn(
        "rfm_segment",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")).cast(
            "int"
        ),
    )


# ---------------------------------------------------------------------------
# Windowed share-of-total ([EXT] — W4 depth: each part type's revenue
# share within its brand, a partitioned-window ratio with NO self-join:
# the denominator is a window SUM over the already-aggregated
# (brand, type) grain. Sums are exact decimal, the share is one double
# division of exact aggregates — bit-identical cross-engine.
# ---------------------------------------------------------------------------

_SHARE_ORACLE = """
WITH g AS (
  SELECT p.p_brand AS brand, p.p_type AS type,
         SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS rev
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
)
SELECT brand, type,
       (CAST(FLOOR(rev) AS DOUBLE) + CAST(rev - FLOOR(rev) AS DOUBLE)) AS revenue,
       (CAST(FLOOR(rev) AS DOUBLE) + CAST(rev - FLOOR(rev) AS DOUBLE))
         / (CAST(FLOOR(SUM(rev) OVER (PARTITION BY brand)) AS DOUBLE)
            + CAST((SUM(rev) OVER (PARTITION BY brand))
                   - FLOOR(SUM(rev) OVER (PARTITION BY brand)) AS DOUBLE))
         AS brand_share
FROM g
"""


@register("brand_type_revenue_share", oracle=_SHARE_ORACLE, tags=("W4", "G4", "J1"))
def brand_type_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type")
    rev = dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))
    g = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"), F.col("p_type").alias("type"))
        .agg(F.sum(rev).alias("__rev"))
    )
    w = Window.partitionBy("brand")
    return g.select(
        "brand",
        "type",
        d2d(F.col("__rev"), "revenue"),
        (d2d(F.col("__rev")) / d2d(F.sum("__rev").over(w))).alias(
            "brand_share"
        ),
    )


# ---------------------------------------------------------------------------
# Exact-decimal Pearson correlation ([EXT] — G-family statistical
# depth). Spark's corr()/covar() run double accumulators whose
# partition-order drift would never hash-match an oracle; instead all
# five moments (n, Σx, Σy, Σxy, Σx², Σy²) accumulate as EXACT
# decimals, and the final correlation is computed from them in one
# deterministic double expression — same single shuffle as any
# multi-measure agg. The moment casts use d2d/sql_d2d (round 10): the
# scale-4 PRODUCT sums put their scaled integers past 2^53 already at
# sf0.001, where DuckDB's naive DECIMAL→DOUBLE double-rounds and
# drifts 1 ULP from Spark's single rounding (functions/numeric.py
# block comment; caught by the CI fixture-scale sweep).
# ---------------------------------------------------------------------------


def _corr_oracle() -> str:
    from ..functions.numeric import sql_d2d

    def m(expr: str) -> str:
        return sql_d2d(f"SUM({expr})")

    q = "CAST(l_quantity AS DECIMAL(12,2))"
    p = "CAST(l_extendedprice AS DECIMAL(12,2))"
    # first factor widened to DECIMAL(19,2): DuckDB multiplies two
    # precision-12 decimals in their int64 reprs and OVERFLOWS once a
    # money value passes ~3e9 (int repr past sqrt(2^63)) — caught by the
    # round-12 boundary-lake sweep; precision 19 forces int128 ops.
    # Values are unchanged (same scale arithmetic), so Spark needs no
    # edit — its DECIMAL(12,2)^2 is DECIMAL(25,4) already.
    qw = f"CAST(l_quantity AS DECIMAL(19,2))"
    pw = f"CAST(l_extendedprice AS DECIMAL(19,2))"
    return f"""
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         {m(q)} AS sx,
         {m(p)} AS sy,
         {m(f"{qw} * {p}")} AS sxy,
         {m(f"{qw} * {q}")} AS sxx,
         {m(f"{pw} * {p}")} AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (n * sxy - sx * sy)
         / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy))
         AS corr_qty_price
FROM m
"""


@register("pearson_corr_exact", oracle=_corr_oracle(), tags=("G1", "G8"))
def pearson_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import d2d

    li = table(spark, sf_dir, "lineitem")
    x, y = dec2("l_quantity"), dec2("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        d2d(F.sum(x), "__sx"),
        d2d(F.sum(y), "__sy"),
        d2d(F.sum(x * y), "__sxy"),
        d2d(F.sum(x * x), "__sxx"),
        d2d(F.sum(y * y), "__syy"),
    )
    corr = (F.col("n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")) / (
        F.sqrt(F.col("n") * F.col("__sxx") - F.col("__sx") * F.col("__sx"))
        * F.sqrt(F.col("n") * F.col("__syy") - F.col("__sy") * F.col("__sy"))
    )
    return m.select("l_returnflag", "n", corr.alias("corr_qty_price"))


# ---------------------------------------------------------------------------
# SQL LATERAL correlated subquery ([EXT] — the remaining SQL join
# surface after LATERAL VIEW/explode: a per-row dependent subquery
# with its own ORDER BY + LIMIT, the "top-N per key without window
# functions" spelling). Catalyst rewrites the correlated LIMIT into a
# per-key ranked join — the same physical shape as the window-based
# top3_orders_per_customer twin — so the SQL-text surface costs
# nothing extra at scale. DuckDB runs the identical text.
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
SELECT c.c_custkey AS custkey, t.o_orderkey AS orderkey,
       CAST(CAST(t.o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS totalprice
FROM {customer} c,
LATERAL (SELECT o_orderkey, o_totalprice FROM {orders} o
         WHERE o.o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) t
"""


@register(
    "lateral_top2_orders",
    oracle=_LATERAL_SQL.format(customer="customer", orders="orders"),
    tags=("O3", "W1"),
)
def lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    cv, ov = "lat_customer", "lat_orders"
    c.createOrReplaceTempView(cv)
    o.createOrReplaceTempView(ov)
    return spark.sql(_LATERAL_SQL.format(customer=cv, orders=ov))


# ---------------------------------------------------------------------------
# Recursive CTE, graph-shaped ([EXT] — beyond recursive_month_spine's
# linear 80-row generator: a hierarchy WALK whose working set is data-
# sized). Users form an implicit binary hierarchy (parent = id div 2,
# the org-chart/BOM shape); the recursion enumerates every
# (user, ancestor) pair and the rollup reports each node's subtree
# member count and event mass — the classic "roll results up the
# management chain" query, runnable IDENTICALLY as one SQL statement
# in Spark 4 and DuckDB. Depth is log2(max id) (~20 rounds at any
# realistic id domain), each round one distributed self-projection;
# the ancestor fan-out is n·depth rows, shuffled once for the final
# groupBy — no driver-side iteration.
# ---------------------------------------------------------------------------

_SUBTREE_SQL = """
WITH RECURSIVE base AS (
  SELECT user_id, COUNT(*) AS n_events FROM {events} GROUP BY user_id
),
anc(user_id, node) AS (
  SELECT user_id, user_id FROM base
  UNION ALL
  SELECT user_id, node {div} 2 FROM anc WHERE node > 1
)
SELECT a.node AS node_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(b.n_events) AS BIGINT) AS subtree_events
FROM anc a JOIN base b USING (user_id)
GROUP BY a.node
"""


@register(
    "recursive_subtree_rollup",
    oracle=_SUBTREE_SQL.format(events="events", div="//"),
    tags=("G7", "W3", "G5"),
)
def recursive_subtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "events").createOrReplaceTempView("__rec_events")
    return spark.sql(_SUBTREE_SQL.format(events="__rec_events", div="DIV"))


# ---------------------------------------------------------------------------
# G8/O1 join-key skew diagnostic: Gini coefficient of the per-key row
# distribution ([EXT] — the one-number answer to "will this key
# shuffle skew at 100 TB?"; ops dashboards track it per ingest). Key
# counts are exact integers; the Lorenz-order rank comes from the
# distributed global ROW_NUMBER (range partition + prefix offsets —
# no single-reducer sort over the key table), and Gini reduces to
# (2·Σ(i·x_i) − (n+1)·Σx) / (n·Σx) — every sum an exact BIGINT, ONE
# final double division spelled identically in both engines. Output
# also carries the max-key share (same single-division discipline).
# ---------------------------------------------------------------------------

_GINI_ORACLE = """
WITH kc AS (
  SELECT l_partkey AS k, COUNT(*) AS x FROM lineitem GROUP BY l_partkey
),
r AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY x ASC, k ASC) AS i FROM kc
),
m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(i * x) AS BIGINT) AS six,
         CAST(MAX(x) AS BIGINT) AS mx
  FROM r
)
SELECT CAST(n AS BIGINT) AS n_keys,
       sx AS total_rows,
       mx AS max_key_rows,
       (2 * CAST(six AS DOUBLE) - (CAST(n AS DOUBLE) + 1) * CAST(sx AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) AS gini,
       CAST(mx AS DOUBLE) / CAST(sx AS DOUBLE) AS max_key_share
FROM m
"""


@register("join_key_skew_gini", oracle=_GINI_ORACLE, tags=("G8", "O1", "W3"))
def join_key_skew_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import with_global_row_number

    li = table(spark, sf_dir, "lineitem").select("l_partkey")
    kc = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).alias("x")
    )
    r = with_global_row_number(kc, [F.asc("x"), F.asc("k")], "i")
    m = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("i") * F.col("x")).cast("long").alias("six"),
        F.max("x").cast("long").alias("mx"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    return m.select(
        F.col("n").cast("long").alias("n_keys"),
        F.col("sx").alias("total_rows"),
        F.col("mx").alias("max_key_rows"),
        (
            (2 * F.col("six").cast("double") - (nd + 1) * sxd) / (nd * sxd)
        ).alias("gini"),
        (F.col("mx").cast("double") / sxd).alias("max_key_share"),
    )


# ---------------------------------------------------------------------------
# W3 completion: PERCENT_RANK + CUME_DIST per event type ([EXT] — the
# remaining analytic ranking functions after rank/lag/lead/NTILE; the
# quantile-normalization step feature pipelines apply before training).
# Both are rationals of integer counts ((rank−1)/(n−1), n_le/n) that
# each engine computes as the same single double division, so results
# hash-match without any float games. Value ties are real (cents) —
# PERCENT_RANK/CUME_DIST are tie-stable by definition, no tie-break
# column needed. At 100 TB: one window per event_type partition, the
# same keyed-window envelope as every W query here.
# ---------------------------------------------------------------------------

_PCTRANK_ORACLE = """
SELECT event_id, event_type,
       CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_cents,
       PERCENT_RANK() OVER (PARTITION BY event_type
                            ORDER BY FLOOR(value * 100 + 0.5)) AS pct_rank,
       CUME_DIST() OVER (PARTITION BY event_type
                         ORDER BY FLOOR(value * 100 + 0.5)) AS cume
FROM events
"""


@register("event_value_percentile_ranks", oracle=_PCTRANK_ORACLE, tags=("W3",))
def event_value_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = table(spark, sf_dir, "events")
    vc = F.floor(F.col("value") * 100 + F.lit(0.5))
    w = Window.partitionBy("event_type").orderBy(vc)
    return e.select(
        "event_id",
        "event_type",
        vc.cast("long").alias("value_cents"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


# ---------------------------------------------------------------------------
# W4/G8 maximum drawdown of the daily revenue series ([EXT] — the
# classic running-peak-to-trough stress metric; one window pass
# instead of the naive O(n²) pairs scan). Daily revenue aggregates as
# exact DECIMAL cents (keyed shuffle); the running max and drawdown
# stay integer; the final ordering picks the single worst trough with
# a deterministic (drawdown DESC, day ASC) tie-break. The only global
# window runs over the DAY-grain frame — calendar-bounded (a few
# thousand rows at any data scale), the same boundedness argument as
# gapfill_daily_totals.
# ---------------------------------------------------------------------------

_DRAWDOWN_ORACLE = """
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS rev_c
  FROM orders GROUP BY 1
),
r AS (
  SELECT day, rev_c,
         MAX(rev_c) OVER (ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS peak_c
  FROM d
),
dd AS (
  SELECT day, rev_c, peak_c, peak_c - rev_c AS draw_c,
         ROW_NUMBER() OVER (ORDER BY peak_c - rev_c DESC, day ASC) AS rn
  FROM r
)
SELECT day AS trough_day,
       CAST(rev_c AS BIGINT) AS trough_revenue_cents,
       CAST(peak_c AS BIGINT) AS peak_revenue_cents,
       CAST(draw_c AS BIGINT) AS max_drawdown_cents,
       CAST(draw_c AS DOUBLE) / 100 AS max_drawdown
FROM dd WHERE rn = 1
"""


@register("revenue_max_drawdown", oracle=_DRAWDOWN_ORACLE, tags=("W4", "G8", "O2"))
def revenue_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        (F.sum(dec2("o_totalprice")) * 100).cast("long").alias("rev_c")
    )
    wrun = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    r = d.select(
        "day", "rev_c", F.max("rev_c").over(wrun).alias("peak_c")
    ).withColumn("draw_c", F.col("peak_c") - F.col("rev_c"))
    wpick = Window.orderBy(F.desc("draw_c"), F.asc("day"))
    return (
        r.withColumn("rn", F.row_number().over(wpick))
        .filter(F.col("rn") == 1)
        .select(
            F.col("day").alias("trough_day"),
            F.col("rev_c").cast("long").alias("trough_revenue_cents"),
            F.col("peak_c").cast("long").alias("peak_revenue_cents"),
            F.col("draw_c").cast("long").alias("max_drawdown_cents"),
            (F.col("draw_c").cast("double") / 100).alias("max_drawdown"),
        )
    )


# ---------------------------------------------------------------------------
# W4/G8 ABC (Pareto) supplier classification ([EXT] — the 80/15/5
# cumulative-revenue banding every procurement/analytics team runs;
# the canonical "cumulative share with exact money" window op).
# Revenue accumulates as exact quarter-cent integers (DECIMAL(12,2)
# product has scale 4 — ×10000 keeps it integral), the running total
# comes from the DISTRIBUTED global running sum
# (operators/relational.py:with_global_running_sum — range partition
# on the total order, local cumsum, broadcast prefix sums; no
# single-reducer window even for an unbounded supplier dimension),
# and the class thresholds are integer cross-multiplications
# (cum·100 <= 80·total), so the whole banding is division-free; the
# reported share is ONE double division.
# ---------------------------------------------------------------------------

_ABC_ORACLE = """
WITH r AS (
  SELECT l_suppkey AS suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(12,2)))) * 10000 AS BIGINT)
           AS rev_c4
  FROM lineitem GROUP BY l_suppkey
),
w AS (
  SELECT suppkey, rev_c4,
         SUM(rev_c4) OVER (ORDER BY rev_c4 DESC, suppkey ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_c4,
         SUM(rev_c4) OVER () AS total_c4
  FROM r
)
SELECT suppkey,
       CAST(rev_c4 AS DOUBLE) / 10000 AS revenue,
       CAST(rev_c4 AS DOUBLE) / CAST(total_c4 AS DOUBLE) AS revenue_share,
       CASE WHEN CAST(cum_c4 AS HUGEINT) * 100 <= 80 * CAST(total_c4 AS HUGEINT)
              THEN 'A'
            WHEN CAST(cum_c4 AS HUGEINT) * 100 <= 95 * CAST(total_c4 AS HUGEINT)
              THEN 'B'
            ELSE 'C' END AS abc_class
FROM w
"""


@register("abc_supplier_classification", oracle=_ABC_ORACLE, tags=("W4", "G8", "G4"))
def abc_supplier_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import with_global_running_sum

    li = table(spark, sf_dir, "lineitem")
    rev = dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))
    r = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        (F.sum(rev) * 10000).cast("long").alias("rev_c4")
    )
    total = r.agg(F.sum("rev_c4").alias("total_c4"))
    w = with_global_running_sum(
        r, [F.desc("rev_c4"), F.asc("suppkey")], "rev_c4", "cum_c4"
    ).crossJoin(F.broadcast(total))
    # the banding cross-multiplication in DECIMAL(20,0): cum*100 passes
    # int64 once the grand total exceeds ~9.2e16 quarter-cents (ANSI
    # long overflow — caught by the round-12 boundary-lake sweep); the
    # decimal compare is exact at any magnitude (oracle: HUGEINT)
    cum = F.col("cum_c4").cast("decimal(20,0)")
    tot = F.col("total_c4").cast("decimal(20,0)")
    return w.select(
        "suppkey",
        (F.col("rev_c4").cast("double") / 10000).alias("revenue"),
        (F.col("rev_c4").cast("double") / F.col("total_c4").cast("double")).alias(
            "revenue_share"
        ),
        F.when(cum * 100 <= 80 * tot, "A")
        .when(cum * 100 <= 95 * tot, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


# ---------------------------------------------------------------------------
# G8/W3 exact per-group median ([EXT] — approx-percentile sketches
# (sketch_quantiles_hll, quantiles_quantity) answer the at-scale
# question; dashboards and SLA gates still want the EXACT median per
# group, and it is computable with one keyed window pass: rank values
# within each event_type, keep the one/two middle positions, reduce.
# Everything stays integer — values as cents, and the median is
# reported as median_cents_x2 (sum of the two middle values; twice the
# middle value when n is odd) so even-n interpolation never divides;
# the double `median_cents` is x2/2, exact in IEEE. The DuckDB oracle
# deliberately uses the INDEPENDENT spelling (built-in MEDIAN =
# interpolated quantile_cont) rather than replaying the window
# arithmetic. At 100 TB: one event_type-keyed shuffle for the window,
# one keyed agg — no global sort anywhere.
# ---------------------------------------------------------------------------

_MEDIAN_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(2 * MEDIAN(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS median_cents_x2,
       CAST(MEDIAN(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
         AS median_cents
FROM events
GROUP BY event_type
"""


@register("event_value_median_exact", oracle=_MEDIAN_ORACLE, tags=("G8", "W3", "G1"))
def event_value_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = table(spark, sf_dir, "events")
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    base = e.select("event_type", "event_id", vc.alias("cents"))
    wtype = Window.partitionBy("event_type")
    wrank = wtype.orderBy(F.asc("cents"), F.asc("event_id"))
    ranked = base.select(
        "event_type",
        "cents",
        F.row_number().over(wrank).alias("rn"),
        F.count(F.lit(1)).over(wtype).alias("n"),
    )
    lo = F.floor((F.col("n") + 1) / 2)
    hi = F.floor((F.col("n") + 2) / 2)
    mid = ranked.filter((F.col("rn") >= lo) & (F.col("rn") <= hi))
    x2 = F.when(
        F.max("n") % 2 == 1, 2 * F.sum("cents")
    ).otherwise(F.sum("cents"))
    return mid.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_events"),
        x2.cast("long").alias("median_cents_x2"),
        (x2.cast("double") / 2).alias("median_cents"),
    )


# ---------------------------------------------------------------------------
# O1/W4 Pareto frontier (skyline) of parts on (price low, size high)
# ([EXT] — the multi-objective shortlist query: keep every part not
# DOMINATED by another that is both no-pricier and no-smaller, strict
# on one axis. The scalable spelling is prune-then-resolve: (1) a
# coarse price-bucket pre-aggregation computes, per bucket, the max
# size in all STRICTLY CHEAPER buckets (bucket-grain window — the
# frame is #buckets-sized, broadcast back), and rows at or below that
# running max are provably dominated and dropped WITHOUT any global
# sort of the fact table; (2) the exact frontier condition collapses
# the candidates to the PRICE GRAIN (one keyed agg: max size per
# exact price), takes the strictly-cheaper running max on that frame
# — bounded by the PRICE DOMAIN (distinct cent values), not data
# volume, the same boundedness class as the day-grain windows — and
# broadcasts it back, so no data-sized frame ever enters a global
# window even in the all-points-on-frontier worst case. A row is on
# the frontier iff its size beats every strictly-cheaper price's max
# AND equals its own price's max. Duplicates (same price AND size)
# are both kept — neither dominates, nothing is strict. The DuckDB
# oracle uses the INDEPENDENT quadratic NOT EXISTS spelling, so the
# window algebra is cross-checked against the definition itself.
# ---------------------------------------------------------------------------

_PARETO_ORACLE = """
WITH p AS (
  SELECT p_partkey,
         CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c,
         CAST(p_size AS BIGINT) AS size
  FROM part
)
SELECT a.p_partkey, a.price_c, a.size
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.price_c <= a.price_c AND b.size >= a.size
    AND (b.price_c < a.price_c OR b.size > a.size)
)
"""


@register("pareto_frontier_parts", oracle=_PARETO_ORACLE, tags=("O1", "W4"))
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    p = table(spark, sf_dir, "part").select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_c"),
        F.col("p_size").cast("long").alias("size"),
    )
    # bounded-domain precondition: the stage-2 window frame is keyed by
    # price_c, so its size is the DISTINCT-PRICE domain — bounded only
    # because the grain is quantized to integer cents above. A
    # continuous (float/double) grain would silently make that frame
    # data-sized; this check makes the misuse loud instead.
    if dict(p.dtypes)["price_c"] not in ("bigint", "int"):
        raise TypeError("skyline price grain must be quantized to an integer domain")
    # stage 1: bucket-grain prune — max size per 10-dollar price bucket,
    # running max over strictly cheaper buckets (bounded bucket frame)
    p = p.withColumn("bucket", F.expr("price_c div 1000"))
    bmax = p.groupBy("bucket").agg(F.max("size").alias("bmax"))
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    cheaper = bmax.select(
        "bucket", F.max("bmax").over(wb).alias("cheaper_bucket_max")
    )
    cand = p.join(F.broadcast(cheaper), "bucket").filter(
        F.col("cheaper_bucket_max").isNull()
        | (F.col("size") > F.col("cheaper_bucket_max"))
    )
    # stage 2: exact frontier via the price-grain frame — one keyed agg,
    # a running max over the (price-domain-bounded) distinct-price
    # table, broadcast back to the candidates
    pm = cand.groupBy("price_c").agg(F.max("size").alias("max_same"))
    wlt = Window.orderBy("price_c").rowsBetween(Window.unboundedPreceding, -1)
    grain = pm.select(
        "price_c",
        "max_same",
        F.max("max_same").over(wlt).alias("max_cheaper"),
    )
    scored = cand.join(F.broadcast(grain), "price_c")
    return scored.filter(
        (F.col("max_cheaper").isNull() | (F.col("size") > F.col("max_cheaper")))
        & (F.col("size") == F.col("max_same"))
    ).select("p_partkey", "price_c", "size")


# ---------------------------------------------------------------------------
# G8/W4 CUSUM changepoint on the daily order volume ([EXT] — the
# classic Page-style drift detector every ingest monitor runs: the
# day where the cumulative deviation from the series mean peaks is
# the most likely level-shift point. The float spelling (mean
# subtraction) dies on cross-engine rounding, so deviations are
# CROSS-MULTIPLIED into exact integers: d_i = c_i·D − T (D = number
# of days, T = total orders) makes Σd_i a BIGINT running sum whose
# argmax |·| is the changepoint; the normalized statistic divides
# once at the end. The running sum and the argmax pick run on the
# DAY-grain frame — calendar-bounded at any fact volume, the same
# argument as revenue_max_drawdown.
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1
),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(c) AS BIGINT) AS t FROM d),
s AS (
  SELECT day, c,
         SUM(c * m.nd - m.t) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum,
         m.nd AS nd, m.t AS t
  FROM d, m
),
pick AS (
  SELECT day, c, cusum, nd, t,
         ROW_NUMBER() OVER (ORDER BY ABS(cusum) DESC, day ASC) AS rn
  FROM s
)
SELECT day AS changepoint_day,
       c AS day_orders,
       CAST(cusum AS BIGINT) AS cusum_peak,
       CAST(nd AS BIGINT) AS n_days,
       CAST(t AS BIGINT) AS total_orders,
       CAST(ABS(cusum) AS DOUBLE) / (CAST(nd AS DOUBLE) * CAST(t AS DOUBLE))
         AS cusum_stat
FROM pick WHERE rn = 1
"""


@register("orders_volume_changepoint", oracle=_CUSUM_ORACLE, tags=("G8", "W4"))
def orders_volume_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    m = d.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("c").cast("long").alias("t"),
    )
    wrun = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    s = d.crossJoin(F.broadcast(m)).select(
        "day",
        "c",
        "nd",
        "t",
        F.sum(F.col("c") * F.col("nd") - F.col("t")).over(wrun).alias("cusum"),
    )
    wpick = Window.orderBy(F.desc(F.abs(F.col("cusum"))), F.asc("day"))
    return (
        s.withColumn("rn", F.row_number().over(wpick))
        .filter(F.col("rn") == 1)
        .select(
            F.col("day").alias("changepoint_day"),
            F.col("c").alias("day_orders"),
            F.col("cusum").cast("long").alias("cusum_peak"),
            F.col("nd").alias("n_days"),
            F.col("t").alias("total_orders"),
            (
                F.abs(F.col("cusum")).cast("double")
                / (F.col("nd").cast("double") * F.col("t").cast("double"))
            ).alias("cusum_stat"),
        )
    )


# ---------------------------------------------------------------------------
# Hilbert-curve layout buckets ([EXT] — the locality upgrade beside
# zorder_layout_buckets, same keys and same output shape so the two
# layouts' per-bucket key rectangles compare row for row: consecutive
# Hilbert codes are always L1-adjacent cells, so bucket rectangles
# have strictly better worst-case tightness than Morton's power-of-two
# diagonal jumps (the reason Delta/Iceberg ship HILBERT beside
# ZORDER). Encoding is the unrolled 16-level rotation recurrence in
# operators/layout.py — pure integer CASE/XOR arithmetic, replayed
# level by level in the oracle's chained CTEs, so every bucket row
# hash-checks. Scale shape: a narrow 16-projection map (no shuffle)
# then one bucket-keyed agg; the layout write itself is one range
# shuffle exactly like zorder_layout.
# ---------------------------------------------------------------------------


def _hilbert_oracle() -> str:
    from ..operators.layout import sql_hilbert_cte

    chain = sql_hilbert_cte(
        "src",
        "o_custkey % 65536",
        f"DATE_DIFF('day', DATE '{_Z_EPOCH}', CAST(o_orderdate AS DATE)) % 65536",
        keys="o_custkey, od",
        bits=16,
    )
    return f"""
WITH src AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS od, o_orderdate FROM orders
),
{chain}
SELECT CAST(hval >> 16 AS INT) AS h_bucket,
       COUNT(*) AS n_orders,
       MIN(o_custkey) AS custkey_min, MAX(o_custkey) AS custkey_max,
       MIN(od) AS orderdate_min, MAX(od) AS orderdate_max,
       MIN(hval) AS h_min, MAX(hval) AS h_max
FROM hfinal GROUP BY 1
"""


@register("hilbert_layout_buckets", oracle=_hilbert_oracle(), tags=("G7", "O1"))
def hilbert_layout_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import with_hilbert

    o = table(spark, sf_dir, "orders")
    src = o.select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("od")
    )
    hf = with_hilbert(
        src,
        F.col("o_custkey") % 65536,
        F.datediff(F.col("od"), F.lit(_Z_EPOCH).cast("date")) % 65536,
        out="hval",
        bits=16,
    )
    return hf.groupBy(
        F.shiftright("hval", 16).cast("int").alias("h_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_custkey").alias("custkey_min"),
        F.max("o_custkey").alias("custkey_max"),
        F.min("od").alias("orderdate_min"),
        F.max("od").alias("orderdate_max"),
        F.min("hval").alias("h_min"),
        F.max("hval").alias("h_max"),
    )


# ---------------------------------------------------------------------------
# Layout-locality comparison ([EXT] — the measurable claim behind
# shipping Hilbert beside z-order: over NON-ALIGNED code ranges (the
# file grains an arbitrary range-partitioned write produces), the
# per-bucket key bounding boxes of Hilbert clustering are tighter than
# Morton's, because consecutive Hilbert codes never take the
# power-of-two diagonal jumps Morton takes. (Aligned 4^k blocks are
# identical squares under both curves — the difference only exists off
# alignment, so buckets here are code DIV a prime, not a bit shift.)
# Per layout: bucket the curve code, take each bucket's key-rectangle
# SEMIPERIMETER (custkey extent + day extent — the row-group min/max
# stats a pruned scan consults), aggregate. On the sf0.01 lake
# Hilbert's average is ~12% tighter and its worst bucket ~42% tighter
# (the Morton jump tail, quantified); on the tiny sf0.001 slab the
# prime bucketing happens to favor Morton — the curve-level guarantee
# is unit-step adjacency of CONSECUTIVE codes (proved exhaustively in
# tests/test_round8_session_ops.py), and this query is the measuring
# instrument a layout decision reads per dataset, not a theorem.
# Everything is the same integer bit math as the two layout queries,
# replayed verbatim in SQL.
# ---------------------------------------------------------------------------

_LOC_BUCK = 99991  # prime: deliberately NOT a power of four (see above)


def _layout_locality_oracle() -> str:
    from ..operators.layout import sql_hilbert_cte, sql_zorder_value

    chain = sql_hilbert_cte(
        "src", "o_custkey % 65536", "dd % 65536", keys="o_custkey, dd", bits=16
    )
    z = sql_zorder_value("o_custkey % 65536", "dd % 65536")
    return f"""
WITH src AS (
  SELECT o_custkey,
         DATE_DIFF('day', DATE '{_Z_EPOCH}', CAST(o_orderdate AS DATE)) AS dd
  FROM orders
),
{chain},
hb AS (
  SELECT hval // {_LOC_BUCK} AS b,
         MAX(o_custkey)-MIN(o_custkey) + MAX(dd)-MIN(dd) AS sp
  FROM hfinal GROUP BY 1
),
zb AS (
  SELECT ({z}) // {_LOC_BUCK} AS b,
         MAX(o_custkey)-MIN(o_custkey) + MAX(dd)-MIN(dd) AS sp
  FROM src GROUP BY 1
),
u AS (
  SELECT 'hilbert' AS layout, sp FROM hb
  UNION ALL
  SELECT 'morton' AS layout, sp FROM zb
)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(sp) AS BIGINT) AS sum_semiperim,
       CAST(SUM(sp) AS DOUBLE) / COUNT(*) AS avg_semiperim,
       CAST(MAX(sp) AS BIGINT) AS max_semiperim
FROM u GROUP BY 1
"""


@register(
    "layout_locality_compare", oracle=_layout_locality_oracle(), tags=("G7", "O1")
)
def layout_locality_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import with_hilbert, zorder_value

    o = table(spark, sf_dir, "orders")
    src = o.select(
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit(_Z_EPOCH).cast("date")).alias(
            "dd"
        ),
    )
    hf = with_hilbert(
        src, F.col("o_custkey") % 65536, F.col("dd") % 65536, out="code", bits=16
    )
    zf = src.withColumn(
        "code", zorder_value(F.col("o_custkey") % 65536, F.col("dd") % 65536)
    )

    def buckets(frame: DataFrame, layout: str) -> DataFrame:
        return (
            frame.groupBy(
                F.expr(f"div(code, {_LOC_BUCK})").alias("b")
            )
            .agg(
                (
                    F.max("o_custkey")
                    - F.min("o_custkey")
                    + F.max("dd")
                    - F.min("dd")
                ).alias("sp")
            )
            .select(F.lit(layout).alias("layout"), "sp")
        )

    u = buckets(hf, "hilbert").unionByName(buckets(zf, "morton"))
    return u.groupBy("layout").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum("sp").cast("bigint").alias("sum_semiperim"),
        (F.sum("sp").cast("double") / F.count(F.lit(1))).alias("avg_semiperim"),
        F.max("sp").cast("bigint").alias("max_semiperim"),
    )
