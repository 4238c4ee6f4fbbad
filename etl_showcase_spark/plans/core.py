"""Core relational surface: projections, filters, CASE, aggregates, sorts.

Covers SURVEY.md §2.2 (P1-P11), §2.5 (G1-G8), §2.7 (O1-O3), §2.9
scalar functions — the reference's transform job recast onto the driver
star schema (reference spark_jobs/transform_weather.py:64-163).

Every query here is expressed declaratively so Catalyst gets full
predicate pushdown + column pruning; money aggregates use the exact
DECIMAL discipline from functions/numeric.py for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.numeric import d2d, davg, dec2, dsum, sql_d2d, sql_davg, sql_dsum
from ..registry import register

# ---------------------------------------------------------------------------
# Flagship: pricing summary (TPC-H Q1-shaped).
# Reference dataflow analog: derived metrics + multi-measure hash aggregate
# (spark_jobs/transform_weather.py:116-163); P3 derived column, P7 filter,
# G1-G8 aggregate, O1 sort.
# ---------------------------------------------------------------------------

_SQL_DISC_PRICE_SUM = (
    "SUM(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))"
)
_SQL_CHARGE_SUM = (
    "SUM(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"
    " * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2))))"
)

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum("l_quantity", "sum_qty")},
  {sql_dsum("l_extendedprice", "sum_base_price")},
  {sql_d2d(_SQL_DISC_PRICE_SUM)} AS sum_disc_price,
  {sql_d2d(_SQL_CHARGE_SUM)} AS sum_charge,
  {sql_davg("l_quantity", "avg_qty")},
  {sql_davg("l_extendedprice", "avg_price")},
  {sql_davg("l_discount", "avg_disc")},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_ORACLE, tags=("S9", "P3", "P7", "G1", "G2", "G3", "G4", "G5", "G8", "F1", "F2", "O1"), bench=True)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan out on a consumed high-cardinality column instead of
    # l_orderkey (r14, guide §2.3): q1 never joins or groups on the
    # order key, so keying the spread by it shipped 8 ballast bytes per
    # row through the exchange (~4.6 MB of a 600k-row shuffle at
    # sf0.1). l_extendedprice is consumed by three aggregates and is
    # near-unique (§2.5's 20-100× rule) — same spread, narrower rows.
    li = table(spark, sf_dir, "lineitem", fanout_cols=["l_extendedprice"])
    one = F.lit(1).cast("decimal(12,2)")
    disc_price = dec2("l_extendedprice") * (one - dec2("l_discount"))
    charge = disc_price * (one + dec2("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            d2d(F.sum(disc_price), "sum_disc_price"),
            d2d(F.sum(charge), "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# P1/P2: projection + rename (the reference's flatten projection renames
# API fields to warehouse names, transform_weather.py:88-110).
# ---------------------------------------------------------------------------

_PROJ_ORACLE = """
SELECT
  o_orderkey AS order_id,
  o_custkey AS customer_id,
  o_orderstatus AS status,
  CAST(o_orderdate AS DATE) AS order_date,
  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price
FROM orders
"""


@register("project_rename", oracle=_PROJ_ORACLE, tags=("P1", "P2", "F5"))
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        dec2("o_totalprice").cast("double").alias("total_price"),
    )


# ---------------------------------------------------------------------------
# P5: CASE/WHEN bucketing — the weather-code → category mapping
# (transform_weather.py:131-138) recast onto quantity thresholds.
# ---------------------------------------------------------------------------

_CASE_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  l_quantity,
  CASE
    WHEN l_quantity < 10 THEN 'Small'
    WHEN l_quantity < 25 THEN 'Medium'
    WHEN l_quantity < 40 THEN 'Large'
    WHEN l_quantity < 48 THEN 'Bulk'
    ELSE 'Jumbo'
  END AS qty_category
FROM lineitem
"""


@register("case_bucket", oracle=_CASE_ORACLE, tags=("P5", "P10"))
def case_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = F.col("l_quantity")
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.when(q < 10, "Small")
        .when(q < 25, "Medium")
        .when(q < 40, "Large")
        .when(q < 48, "Bulk")
        .otherwise("Jumbo")
        .alias("qty_category"),
    )


# ---------------------------------------------------------------------------
# P4/P9: null repair via coalesce — precipitation NULL→0.0
# (transform_weather.py:127-130). Testdata has no nulls, so nulls are
# manufactured with NULLIF then repaired, exercising isNull + coalesce.
# ---------------------------------------------------------------------------

_NULLFILL_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  NULLIF(l_discount, 0.0) IS NULL AS was_null,
  COALESCE(NULLIF(l_discount, 0.0), 0.0) AS discount_filled
FROM lineitem
"""


@register("null_fill", oracle=_NULLFILL_ORACLE, tags=("P4", "P9"))
def null_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    nulled = F.nullif(F.col("l_discount"), F.lit(0.0))
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        nulled.isNull().alias("was_null"),
        F.coalesce(nulled, F.lit(0.0)).alias("discount_filled"),
    )


# ---------------------------------------------------------------------------
# P7/P8: equality + trailing-range date predicates — the per-ds load filter
# (dags/weather_etl_pipeline.py:182) and the 7-day trends window
# (sql/create_weather_tables.sql:159), anchored to a fixed date for
# oracle determinism (no wall clock, SURVEY.md §7.4.5).
# ---------------------------------------------------------------------------

_RANGE_ORACLE = """
SELECT event_id, ts, user_id, event_type, value
FROM events
WHERE ts >= TIMESTAMP '2024-01-24 00:00:00'
  AND ts < TIMESTAMP '2024-01-31 00:00:00'
"""


@register("filter_trailing_7d", oracle=_RANGE_ORACLE, tags=("P7", "P8"))
def filter_trailing_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.filter(
        (F.col("ts") >= F.lit("2024-01-24 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-31 00:00:00").cast("timestamp"))
    ).select("event_id", "ts", "user_id", "event_type", "value")


# ---------------------------------------------------------------------------
# P11/G6: filtered count — COUNT(*) FILTER (WHERE category='Rain') as
# rainy_days (sql/create_weather_tables.sql:157).
# ---------------------------------------------------------------------------

_FILTCOUNT_ORACLE = f"""
SELECT
  event_type,
  COUNT(*) AS n_events,
  COUNT(*) FILTER (WHERE value > 100.0) AS n_big,
  {sql_dsum("value", "total_value")}
FROM events
GROUP BY event_type
"""


@register("filtered_count", oracle=_FILTCOUNT_ORACLE, tags=("P11", "G6"))
def filtered_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_if(F.col("value") > 100.0).alias("n_big"),
            dsum("value", "total_value"),
        )
    )


# ---------------------------------------------------------------------------
# G7/F9: multi-key monthly rollup grain — agg_monthly_weather
# (sql/create_weather_tables.sql:118-131) on orders.
# ---------------------------------------------------------------------------

_MONTHLY_ORACLE = f"""
SELECT
  o_orderstatus,
  CAST(YEAR(o_orderdate) AS INT) AS order_year,
  CAST(MONTH(o_orderdate) AS INT) AS order_month,
  COUNT(*) AS n_orders,
  {sql_dsum("o_totalprice", "total_revenue")},
  {sql_davg("o_totalprice", "avg_order_value")}
FROM orders
GROUP BY o_orderstatus, CAST(YEAR(o_orderdate) AS INT), CAST(MONTH(o_orderdate) AS INT)
"""


@register("monthly_rollup", oracle=_MONTHLY_ORACLE, tags=("G7", "F9"))
def monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            "o_orderstatus",
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_revenue"),
            davg("o_totalprice", "avg_order_value"),
        )
    )


# ---------------------------------------------------------------------------
# G9: distinct + ROLLUP grouping sets.
# ---------------------------------------------------------------------------

_DISTINCT_ORACLE = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


@register("distinct_flags", oracle=_DISTINCT_ORACLE, tags=("G9",))
def distinct_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


_ROLLUP_ORACLE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@register("rollup_counts", oracle=_ROLLUP_ORACLE, tags=("G9",))
def rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# G10: distinct cardinality. The HLL sketch (approx_count_distinct) is
# engine-specific, so the oracle checks the exact twin; the approx path
# is exercised in tests (operators parity within rsd).
# ---------------------------------------------------------------------------

_CARD_ORACLE = """
SELECT
  COUNT(DISTINCT o_custkey) AS n_customers,
  COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS n_days
FROM orders
"""


@register("distinct_cardinality", oracle=_CARD_ORACLE, tags=("G10",))
def distinct_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct(F.col("o_orderdate").cast("date")).alias("n_days"),
    )


# ---------------------------------------------------------------------------
# O1-O3: multi-key sort + limit (deterministic via unique key prefix).
# ---------------------------------------------------------------------------

_TOPN_ORACLE = """
SELECT o_orderkey, o_custkey, CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 25
"""


@register("order_limit_topn", oracle=_TOPN_ORACLE, tags=("O1", "O2"))
def order_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select(
            "o_orderkey",
            "o_custkey",
            dec2("o_totalprice").cast("double").alias("total_price"),
        )
        .limit(25)
    )


# ---------------------------------------------------------------------------
# F1-F9 scalar function surface: string / date / math, in one projection
# each so the oracle checks per-row semantics exactly.
# ---------------------------------------------------------------------------

_STRING_ORACLE = """
SELECT
  doc_id,
  LENGTH(text) AS text_len,
  UPPER(SUBSTR(text, 1, 10)) AS head10_upper,
  LOWER(lang) AS lang_lower,
  CONCAT_WS('|', lang, source) AS lang_source,
  CONTAINS(text, 'spark') AS mentions_spark,
  REGEXP_EXTRACT(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
  TRIM('  ' || lang || ' ') AS lang_trimmed,
  REPLACE(source, 'src', 'source_') AS source_renamed
FROM documents
"""


@register("scalar_string_funcs", oracle=_STRING_ORACLE, tags=("F11",))
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length("text").alias("text_len"),
        F.upper(F.substring("text", 1, 10)).alias("head10_upper"),
        F.lower("lang").alias("lang_lower"),
        F.concat_ws("|", "lang", "source").alias("lang_source"),
        F.col("text").contains("spark").alias("mentions_spark"),
        F.regexp_extract("text", r"([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.trim(F.concat(F.lit("  "), F.col("lang"), F.lit(" "))).alias("lang_trimmed"),
        F.replace(F.col("source"), F.lit("src"), F.lit("source_")).alias("source_renamed"),
    )


_DATE_ORACLE = """
SELECT
  event_id,
  CAST(YEAR(ts) AS INT) AS y,
  CAST(MONTH(ts) AS INT) AS m,
  CAST(DAY(ts) AS INT) AS d,
  CAST(HOUR(ts) AS INT) AS h,
  DATE_TRUNC('day', ts) AS day_ts,
  CAST(ISODOW(ts) AS INT) AS iso_dow,
  CAST(DATE_DIFF('day', CAST(ts AS DATE), DATE '2024-02-01') AS INT) AS days_to_feb,
  CAST(CAST(ts AS DATE) + INTERVAL 7 DAY AS DATE) AS week_later
FROM events
"""


@register("scalar_date_funcs", oracle=_DATE_ORACLE, tags=("F4", "F8", "F9"))
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.year("ts").cast("int").alias("y"),
        F.month("ts").cast("int").alias("m"),
        F.dayofmonth("ts").cast("int").alias("d"),
        F.hour("ts").cast("int").alias("h"),
        F.date_trunc("day", F.col("ts")).alias("day_ts"),
        (F.weekday("ts") + F.lit(1)).cast("int").alias("iso_dow"),
        F.datediff(F.lit("2024-02-01").cast("date"), F.col("ts").cast("date"))
        .cast("int")
        .alias("days_to_feb"),
        F.date_add(F.col("ts").cast("date"), 7).alias("week_later"),
    )


_CAST_ORACLE = """
SELECT
  doc_id,
  CAST(n_chars AS VARCHAR) AS n_chars_str,
  CAST(n_chars AS DOUBLE) AS n_chars_d,
  CAST(FLOOR(n_chars / 100.0) AS INT) AS n_chars_hundreds,
  CAST(CAST(n_chars AS DECIMAL(18,2)) AS DOUBLE) AS n_chars_dec
FROM documents
"""


@register("scalar_casts", oracle=_CAST_ORACLE, tags=("F5", "F6", "F7"))
def scalar_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("n_chars").cast("string").alias("n_chars_str"),
        F.col("n_chars").cast("double").alias("n_chars_d"),
        F.floor(F.col("n_chars") / 100.0).cast("int").alias("n_chars_hundreds"),
        F.col("n_chars").cast("decimal(18,2)").cast("double").alias("n_chars_dec"),
    )
