"""Join surface (SURVEY.md §2.4 J1-J8).

The reference's joins are implicit in its star schema (fact_daily_weather
↔ dim_city/dim_weather_code, reference sql/create_weather_tables.sql:42-105;
upsert-as-join dags/weather_etl_pipeline.py:183-190). Here they are made
explicit against the driver's star schema, each with the physical
strategy you'd want at 100 TB: broadcast for dims, shuffle/sort-merge
for fact×fact, anti/semi for existence, broadcast-NLJ for bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.numeric import d2d, davg, dec2, dsum, sql_davg, sql_dsum
from ..operators.relational import asof_join, band_join
from ..registry import register

# ---------------------------------------------------------------------------
# J1: broadcast hash equi-join — fact × small dims (dim_city role).
# ---------------------------------------------------------------------------

_BCAST_ORACLE = f"""
SELECT
  r.r_name AS region_name,
  n.n_name AS nation_name,
  COUNT(*) AS n_customers,
  {sql_dsum("c.c_acctbal", "total_acctbal")},
  {sql_davg("c.c_acctbal", "avg_acctbal")}
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""


@register("join_broadcast_dims", oracle=_BCAST_ORACLE, tags=("J1", "G1"))
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal", "total_acctbal"),
            davg("c_acctbal", "avg_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# J2: shuffle/sort-merge equi-join — fact × fact (orders × lineitem),
# revenue per priority. The lineitem side is pre-aggregated by key
# BEFORE the join (map-side reduction), so the join input shrinks from
# |lineitem| to |orders| rows — the shuffle that matters at 100 TB.
# ---------------------------------------------------------------------------

_SMJ_ORACLE = """
SELECT
  o.o_orderpriority AS priority,
  COUNT(DISTINCT o.o_orderkey) AS n_orders,
  (CAST(FLOOR(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))) AS DOUBLE) + CAST((SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))) - FLOOR(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))) AS DOUBLE)) AS revenue
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
"""


@register("join_fact_revenue", oracle=_SMJ_ORACLE, tags=("J2", "G1"), bench=True)
def join_fact_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fanout=False (r13 optimization): this frame flows straight into a
    # join where AQE broadcasts it at bench scale — a fan-out exchange
    # ahead of a BroadcastExchange is pure waste (the broadcast
    # re-collects whatever distribution it gets), and when orders is
    # big enough to shuffle instead, the join's own keyed exchange
    # provides the spread. Plan: 150k-row RoundRobin exchange removed.
    o = table(spark, sf_dir, "orders", fanout=False)
    li = table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(12,2)")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(dec2("l_extendedprice") * (one - dec2("l_discount"))).alias("__rev")
    )
    return (
        o.join(per_order, o.o_orderkey == per_order.l_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            # the join is 1:1 (both sides unique on the order key), so a
            # plain count equals the oracle's COUNT(DISTINCT) without
            # the two-phase distinct expansion
            F.count(F.lit(1)).alias("n_orders"),
            d2d(F.sum("__rev"), "revenue"),
        )
    )


# ---------------------------------------------------------------------------
# J2 at rest: the same fact × fact join over BUCKETED storage. Both
# facts are hash-clustered and sorted by their order key at write time
# (sources/io.write_bucketed), so the per-order pre-aggregation AND the
# sort-merge join read co-located, pre-sorted data — zero Exchange (and
# zero Sort) on the join key at read time. This is the shape that
# removes the worst headline shuffle at 100 TB: the order-key shuffle
# is paid ONCE when the table lands, amortized over every subsequent
# join/aggregate on that key. scripts/audit_plans.py asserts the
# no-order-key-Exchange property on the physical plan.
# ---------------------------------------------------------------------------


@register("join_fact_revenue_bucketed", oracle=_SMJ_ORACLE, tags=("J2", "G1", "S8"))
def join_fact_revenue_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, li = _bucketed_fact_tables(spark, sf_dir)
    one = F.lit(1).cast("decimal(12,2)")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(dec2("l_extendedprice") * (one - dec2("l_discount"))).alias("__rev")
    )
    return (
        o.join(per_order, o.o_orderkey == per_order.l_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            d2d(F.sum("__rev"), "revenue"),
        )
    )


def _bucketed_fact_tables(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Land orders + lineitem as bucketed managed tables and return
    them as DataFrames whose scan carries the bucket distribution.
    Always rewritten (overwrite): the source parquet can change between
    runs, and serving a stale bucketed copy would be silently wrong —
    in a real deployment the landing job owns this write and readers
    only ever spark.table() it. Table names embed the sf tag so scale
    factors never alias. 8 buckets matches the test scale; at cluster
    scale the bucket count is sized so one bucket ≈ one executor-core's
    worth of data — the code path is identical."""
    from ..sources.io import write_bucketed

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_").replace("-", "_")
    names = (f"bkt_orders_{tag}", f"bkt_lineitem_{tag}")
    for tbl, name, key in (
        ("orders", names[0], "o_orderkey"),
        ("lineitem", names[1], "l_orderkey"),
    ):
        write_bucketed(table(spark, sf_dir, tbl), name, [key], 8)
    return spark.table(names[0]), spark.table(names[1])


# ---------------------------------------------------------------------------
# J2 under skew: the same fact-side equi-join through the salting
# operator (operators/relational.salted_join) — each left key spreads
# over 16 sub-partitions, the right side replicates 16×, and results
# are IDENTICAL to the plain join (the oracle proves it: plain SQL, no
# salt). This is the pre-spread answer for pathological hot keys that
# AQE's post-hoc skew split can't save (one key = half the table), and
# for non-AQE sinks like bucketed writes.
# ---------------------------------------------------------------------------

_SALTED_ORACLE = """
SELECT
  c.c_mktsegment AS segment,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  (CAST(FLOOR(SUM(CAST(o.o_totalprice AS DECIMAL(12,2)))) AS DOUBLE) + CAST((SUM(CAST(o.o_totalprice AS DECIMAL(12,2)))) - FLOOR(SUM(CAST(o.o_totalprice AS DECIMAL(12,2)))) AS DOUBLE)) AS total_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


@register("join_skew_salted", oracle=_SALTED_ORACLE, tags=("J2",))
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import salted_join

    o = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    return (
        salted_join(o, c, ["custkey"], salt=16)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            d2d(F.sum(dec2("o_totalprice")), "total_price"),
        )
    )


# scoped to URGENT orders: in this testdata every customer has at
# least one order, so the unscoped NOT EXISTS would be vacuous (0 rows
# proves nothing about the anti join)
_ANTI_ORACLE = """
SELECT c.c_mktsegment AS segment, COUNT(*) AS n_without_urgent
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c.c_mktsegment
"""


@register("join_anti_no_orders", oracle=_ANTI_ORACLE, tags=("J3",))
def join_anti_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_without_urgent"))
    )


_SEMI_ORACLE = """
SELECT n.n_name AS nation_name, COUNT(*) AS n_active_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY n.n_name
"""


@register("join_semi_active", oracle=_SEMI_ORACLE, tags=("J4", "J1"))
def join_semi_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.count(F.lit(1)).alias("n_active_customers"))
    )


# ---------------------------------------------------------------------------
# J5: left outer join — dim lookup where the key may be absent
# (dim_weather_code gaps, reference spark_jobs/transform_weather.py:131-138).
# ---------------------------------------------------------------------------

_LEFT_ORACLE = f"""
SELECT
  c.c_custkey AS customer_id,
  COUNT(o.o_orderkey) AS n_orders,
  {sql_dsum("o.o_totalprice", "lifetime_value")}
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
"""


@register("join_left_lifetime", oracle=_LEFT_ORACLE, tags=("J5",))
def join_left_lifetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy(F.col("c_custkey").alias("customer_id"))
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum("o_totalprice", "lifetime_value"),
        )
    )


# ---------------------------------------------------------------------------
# J6: range/band θ-join — the weather-code CASE thresholds as a band
# lookup table (transform_weather.py:133-136 ↔ band [lo,hi) → category).
# ---------------------------------------------------------------------------

_SIZE_BANDS = [(0, 10, "XS"), (10, 20, "S"), (20, 30, "M"), (30, 40, "L"), (40, 100, "XL")]

_BAND_ORACLE = """
SELECT p.p_partkey AS part_id, p.p_size AS size, b.band AS size_band
FROM part p
LEFT JOIN (VALUES (0,10,'XS'),(10,20,'S'),(20,30,'M'),(30,40,'L'),(40,100,'XL'))
  AS b(lo, hi, band)
  ON p.p_size >= b.lo AND p.p_size < b.hi
"""


@register("join_band_sizes", oracle=_BAND_ORACLE, tags=("J6",))
def join_band_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    bands = spark.createDataFrame(_SIZE_BANDS, ["lo", "hi", "band"])
    return band_join(p, bands, "p_size").select(
        F.col("p_partkey").alias("part_id"),
        F.col("p_size").alias("size"),
        F.col("band").alias("size_band"),
    )


# ---------------------------------------------------------------------------
# J7: as-of join — latest signup at-or-before each purchase, per user
# (generalized v_latest_weather, reference sql/create_weather_tables.sql:139-148).
# Spark side uses the union-sort operator (no range-join blowup).
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
SELECT
  p.event_id,
  p.user_id,
  p.ts AS purchase_ts,
  MAX(s.ts) AS ts_asof
FROM events p
LEFT JOIN events s
  ON s.user_id = p.user_id AND s.event_type = 'signup' AND s.ts <= p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id, p.ts
"""


@register("join_asof_signup", oracle=_ASOF_ORACLE, tags=("J7",))
def join_asof_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    )
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts")
    return asof_join(
        purchases,
        signups,
        on=["user_id"],
        left_ts="purchase_ts",
        right_ts="ts",
        right_vals=[],
    )


# ---------------------------------------------------------------------------
# J8: cross join — small-side cartesian (all-pairs baseline shape for
# similarity search; here kept tiny: regions × order statuses).
# ---------------------------------------------------------------------------

_CROSS_ORACLE = """
SELECT r.r_name AS region_name, s.o_orderstatus AS status
FROM region r
CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
"""


@register("join_cross_pairs", oracle=_CROSS_ORACLE, tags=("J8",))
def join_cross_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region")
    statuses = table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(statuses).select(
        F.col("r_name").alias("region_name"),
        F.col("o_orderstatus").alias("status"),
    )


# ---------------------------------------------------------------------------
# J7 value-carrying variant: each purchase joined as-of to the user's
# LATEST prior (or same-instant) view, carrying that view's id and
# value. Exercises the union-sort operator's struct-carried payload
# path (join_asof_signup carries no values). Oracle ties break exactly
# like the operator: max ts, then max event_id — the struct's own
# total order.
# ---------------------------------------------------------------------------

_ASOF_VIEW_ORACLE = """
SELECT p.event_id AS purchase_id,
       p.user_id AS user_id,
       (SELECT v.event_id FROM events v
         WHERE v.event_type = 'view' AND v.user_id = p.user_id AND v.ts <= p.ts
         ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS view_id_asof,
       (SELECT v.value FROM events v
         WHERE v.event_type = 'view' AND v.user_id = p.user_id AND v.ts <= p.ts
         ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS view_value_asof
FROM events p
WHERE p.event_type = 'purchase'
ORDER BY purchase_id
"""


@register("join_asof_last_view", oracle=_ASOF_VIEW_ORACLE, tags=("J7",))
def join_asof_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        "ts",
        F.col("value").alias("view_value"),
    )
    return (
        asof_join(
            purchases,
            views,
            on=["user_id"],
            left_ts="purchase_ts",
            right_ts="ts",
            right_vals=["view_id", "view_value"],
        )
        .select("purchase_id", "user_id", "view_id_asof", "view_value_asof")
        .orderBy("purchase_id")
    )
