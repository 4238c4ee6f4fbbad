"""Window-function surface (SURVEY.md §2.6 W1-W4, §2.7 O3).

v_latest_weather (top-1 per key) and v_weekly_trends (trailing window)
are the reference's two user-facing analytical views (reference
sql/create_weather_tables.sql:139-160) — generalized here to the events
time series plus ranking/lag/frame extensions.

Scale notes: every window partitions by a real key (user/customer/
year), never a global ORDER BY over the fact table; rolling sums stay
in DECIMAL inside the frame so reassociation across frame evaluation
order cannot perturb the result (oracle exactness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.numeric import d2d, dec2
from ..operators.relational import latest_per_key, topk_per_group
from ..registry import register

# ---------------------------------------------------------------------------
# W1: latest row per key — DISTINCT ON twin with deterministic tie-break.
# ---------------------------------------------------------------------------

_LATEST_ORACLE = """
SELECT user_id, ts, event_type, value
FROM (
  SELECT user_id, ts, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
"""


@register("latest_event_per_user", oracle=_LATEST_ORACLE, tags=("W1", "O3"))
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return latest_per_key(
        ev, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
    ).select("user_id", "ts", "event_type", "value")


# ---------------------------------------------------------------------------
# O3: top-k per group with rank column.
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
SELECT o_custkey AS customer_id, o_orderkey AS order_id,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price,
       CAST(rnk AS INT) AS rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders
)
WHERE rnk <= 3
"""


@register("top3_orders_per_customer", oracle=_TOPK_ORACLE, tags=("O3", "W1"))
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return topk_per_group(
        o, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], 3
    ).select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderkey").alias("order_id"),
        dec2("o_totalprice").cast("double").alias("total_price"),
        F.col("rnk").cast("int").alias("rnk"),
    )


# ---------------------------------------------------------------------------
# W3: lag/lead — day-over-day revenue deltas ("7-day weather trends"
# day-over-day generalization, SURVEY.md §2.6 W3). Partitioned by year
# so no single-reducer global sort at scale.
# ---------------------------------------------------------------------------

_LAG_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS order_day,
         CAST(YEAR(o_orderdate) AS INT) AS order_year,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
  FROM orders
  GROUP BY 1, 2
)
SELECT
  order_day,
  CAST(rev AS DOUBLE) AS revenue,
  CAST(LAG(rev) OVER w AS DOUBLE) AS prev_revenue,
  CAST(rev - LAG(rev) OVER w AS DOUBLE) AS delta
FROM daily
WINDOW w AS (PARTITION BY order_year ORDER BY order_day)
"""


@register("daily_revenue_delta", oracle=_LAG_ORACLE, tags=("W3",))
def daily_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("order_day"),
        F.year("o_orderdate").cast("int").alias("order_year"),
    ).agg(F.sum(dec2("o_totalprice")).alias("rev"))
    w = Window.partitionBy("order_year").orderBy("order_day")
    prev = F.lag("rev").over(w)
    return daily.select(
        "order_day",
        F.col("rev").cast("double").alias("revenue"),
        prev.cast("double").alias("prev_revenue"),
        (F.col("rev") - prev).cast("double").alias("delta"),
    )


# ---------------------------------------------------------------------------
# W2/W4: trailing 7-day rolling aggregate over the daily event series —
# v_weekly_trends (sql/create_weather_tables.sql:151-160) as a true
# per-row rolling window (rangeBetween on day numbers). Sums stay in
# DECIMAL across the frame → exact regardless of evaluation order.
# ---------------------------------------------------------------------------

_ROLLING_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num,
         SUM(CAST(value AS DECIMAL(12,2))) AS day_value,
         COUNT(*) AS day_events
  FROM events
  GROUP BY 1, 2
)
SELECT
  day,
  (CAST(FLOOR(day_value) AS DOUBLE)
   + CAST(day_value - FLOOR(day_value) AS DOUBLE)) AS day_value,
  day_events,
  (CAST(FLOOR(SUM(day_value) OVER w) AS DOUBLE)
   + CAST((SUM(day_value) OVER w) - FLOOR(SUM(day_value) OVER w) AS DOUBLE))
    AS rolling_7d_value,
  CAST(SUM(day_events) OVER w AS BIGINT) AS rolling_7d_events
FROM daily
WINDOW w AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


@register("rolling_7d_events", oracle=_ROLLING_ORACLE, tags=("W2", "W4"))
def rolling_7d_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("day"),
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias(
            "day_num"
        ),
    ).agg(
        F.sum(dec2("value")).alias("day_value"),
        F.count(F.lit(1)).alias("day_events"),
    )
    w = Window.orderBy("day_num").rangeBetween(-6, Window.currentRow)
    return daily.select(
        "day",
        d2d(F.col("day_value"), "day_value"),
        "day_events",
        d2d(F.sum("day_value").over(w), "rolling_7d_value"),
        F.sum("day_events").over(w).cast("bigint").alias("rolling_7d_events"),
    )


# ---------------------------------------------------------------------------
# W3: rank / dense_rank / ntile over a deterministic total order.
# ---------------------------------------------------------------------------

_RANK_ORACLE = """
SELECT
  c_custkey AS customer_id,
  c_nationkey AS nation_id,
  CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal,
  CAST(RANK() OVER w AS INT) AS bal_rank,
  CAST(DENSE_RANK() OVER w AS INT) AS bal_dense_rank,
  CAST(NTILE(4) OVER w AS INT) AS bal_quartile
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
"""


@register("customer_balance_ranks", oracle=_RANK_ORACLE, tags=("W3",))
def customer_balance_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_nationkey").alias("nation_id"),
        dec2("c_acctbal").cast("double").alias("acctbal"),
        F.rank().over(w).cast("int").alias("bal_rank"),
        F.dense_rank().over(w).cast("int").alias("bal_dense_rank"),
        F.ntile(4).over(w).cast("int").alias("bal_quartile"),
    )


# ---------------------------------------------------------------------------
# W4: explicit frames — running cumulative sum + first/last per partition.
# ---------------------------------------------------------------------------

_CUM_ORACLE = """
SELECT
  o_custkey AS customer_id,
  o_orderkey AS order_id,
  (CAST(FLOOR(rsum) AS DOUBLE) + CAST(rsum - FLOOR(rsum) AS DOUBLE))
    AS running_total,
  CAST(FIRST_VALUE(o_totalprice)
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE)
    AS first_order_price,
  CAST(LAST_VALUE(o_totalprice)
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE)
    AS last_order_price
FROM (
  SELECT *,
         SUM(CAST(o_totalprice AS DECIMAL(12,2)))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rsum
  FROM orders
)
"""


@register("running_customer_totals", oracle=_CUM_ORACLE, tags=("W4",))
def running_customer_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    wrun = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderkey").alias("order_id"),
        d2d(F.sum(dec2("o_totalprice")).over(wrun), "running_total"),
        F.first("o_totalprice").over(wall).cast("double").alias("first_order_price"),
        F.last("o_totalprice").over(wall).cast("double").alias("last_order_price"),
    )


# ---------------------------------------------------------------------------
# W4/T6-adjacent: per-user integer EWMA over the ordered event stream
# ([EXT] — the classic smoothed-activity signal; alpha = 1/2 so each
# step is e = (v + e_prev) >> 1, a PURE-INTEGER left fold over cents,
# bit-identical in any engine — float EWMA would hinge on rounding
# order). This is the batch twin of a per-key stateful fold (the
# applyInPandasWithState shape) spelled with the engines' own ordered
# array folds: Spark sort_array + aggregate(), DuckDB
# list(... ORDER BY) + list_reduce — both fold left from the first
# element, so the recursion replays exactly. At 100 TB: one keyed
# shuffle; per-user event lists are session-bounded (the same
# boundedness contract every collect_list session op here relies on),
# and the fold itself is O(events) with no further exchange.
# ---------------------------------------------------------------------------

_EWMA_ORACLE = """
WITH v AS (
  SELECT user_id, event_id, ts,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc
  FROM events
),
g AS (
  SELECT user_id,
         COUNT(*) AS n_events,
         list(vc ORDER BY ts, event_id) AS vals
  FROM v GROUP BY user_id
)
SELECT user_id,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(list_reduce(vals, (acc, x) -> (acc + x) >> 1) AS BIGINT)
         AS ewma_cents,
       CAST(list_reduce(vals, (acc, x) -> (acc + x) >> 1) AS DOUBLE) / 100
         AS ewma_value
FROM g
"""


@register("ewma_user_value", oracle=_EWMA_ORACLE, tags=("W4", "T6"))
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    rows = e.select(
        "user_id", F.struct("ts", "event_id", vc.alias("vc")).alias("s")
    )
    g = rows.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.transform(
            F.sort_array(F.collect_list("s")), lambda s: s["vc"]
        ).alias("vals"),
    )
    # fold left from the first element (list_reduce semantics): init =
    # vals[1], fold the tail; arithmetic shift >>1 = div-2 on the
    # non-negative cent values, identical in both engines
    ewma = F.aggregate(
        F.slice(F.col("vals"), 2, F.greatest(F.size("vals") - 1, F.lit(0))),
        F.element_at(F.col("vals"), 1),
        lambda acc, x: F.shiftright(acc + x, 1),
    )
    return g.select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        ewma.cast("long").alias("ewma_cents"),
        (ewma.cast("double") / 100).alias("ewma_value"),
    )
