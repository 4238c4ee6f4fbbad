"""Ingest/landing queries exercising the sources surface (SURVEY.md
§2.1): schema-pinned JSON scan (S1), Hive-partitioned landing sink
(S4), partition-scoped keyed upsert (Q3 at file level, §4.3.1), and the
HTTP fan-out extractor shape (S3).

Each query is self-contained: it stages files under a fresh temp dir,
runs the io op, and returns a deterministic relation the DuckDB oracle
can reproduce from the original parquet (the landing roundtrip must be
value-preserving, which is exactly what's being tested).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import table
from ..functions.numeric import d2d, dec2
from ..registry import register
from ..sources.io import (
    WEATHER_RAW_SCHEMA,
    http_fanout_source,
    merge_upsert_partitioned,
    read_json,
    write_partitioned,
)

# ---------------------------------------------------------------------------
# S1 + S4: partitioned JSON landing roundtrip. Write nation⋈region as a
# Hive-partitioned JSON landing (the raw/weather/{ds}/ shape,
# dags/weather_etl_pipeline.py:55-56), read it back with an explicit
# schema (spark_jobs/transform_weather.py:34-59), and aggregate. The
# oracle computes the same relation straight from parquet — equality
# proves the landing is value-preserving.
# ---------------------------------------------------------------------------

_LANDING_ORACLE = """
SELECT r.r_name AS region_name,
       COUNT(*) AS n_nations,
       CAST(SUM(n.n_nationkey) AS BIGINT) AS key_sum,
       MIN(n.n_name) AS first_nation
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY region_name
"""

_LANDING_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.LongType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("region_name", T.StringType()),
    ]
)


@register("json_ingest_landing", oracle=_LANDING_ORACLE, tags=("S1", "S2", "S4"))
def json_ingest_landing(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    landing = (
        n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("n_nationkey", "n_name", F.col("r_name").alias("region_name"))
    )
    path = tempfile.mkdtemp(prefix="landing_")
    write_partitioned(landing, path, ["region_name"], fmt="json")
    back = read_json(spark, path, schema=_LANDING_SCHEMA)
    return (
        back.groupBy("region_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.sum("n_nationkey").alias("key_sum"),
            F.min("n_name").alias("first_nation"),
        )
        .orderBy("region_name")
    )


# ---------------------------------------------------------------------------
# Q3 on files: partition-scoped keyed upsert. Target = orders partitioned
# by order year; updates = 5% price bump on open orders. Only the touched
# year partitions are read and rewritten (§4.4: the reference's
# full-table staging overwrite doesn't survive 100 TB).
# ---------------------------------------------------------------------------

_PART_UPSERT_ORACLE = """
WITH t AS (
  SELECT o_orderkey AS order_id,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(14,4)) AS total_price,
         EXTRACT(year FROM o_orderdate) AS order_year,
         o_orderstatus AS status
  FROM orders
),
u AS (
  -- price has 2 decimals, so price*1.05 has exactly <=4 decimals:
  -- DECIMAL(14,4) holds it EXACTLY — no rounding step, no HALF_UP vs
  -- HALF_EVEN divergence between engines
  SELECT order_id,
         CAST(total_price * CAST(1.05 AS DECIMAL(4,2)) AS DECIMAL(14,4)) AS total_price,
         order_year, 'U' AS status
  FROM t WHERE status = 'O'
),
merged AS (
  SELECT * FROM t WHERE order_id NOT IN (SELECT order_id FROM u)
  UNION ALL SELECT * FROM u
)
SELECT order_year,
       COUNT(*) AS n_orders,
       (CAST(FLOOR(SUM(total_price)) AS DOUBLE)
        + CAST(SUM(total_price) - FLOOR(SUM(total_price)) AS DOUBLE)) AS revenue,
       COUNT(*) FILTER (WHERE status = 'U') AS n_updated
FROM merged
GROUP BY order_year
ORDER BY order_year
"""


@register("partitioned_upsert_orders", oracle=_PART_UPSERT_ORACLE, tags=("Q3", "S4", "J3"))
def partitioned_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    target = o.select(
        F.col("o_orderkey").alias("order_id"),
        dec2("o_totalprice").cast("decimal(14,4)").alias("total_price"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.col("o_orderstatus").alias("status"),
    )
    path = tempfile.mkdtemp(prefix="upsert_target_")
    write_partitioned(target, path, ["order_year"])
    updates = target.filter(F.col("status") == "O").select(
        "order_id",
        (F.col("total_price") * F.lit(1.05).cast("decimal(4,2)"))
        .cast("decimal(14,4)")
        .alias("total_price"),
        "order_year",
        F.lit("U").alias("status"),
    )
    merge_upsert_partitioned(spark, path, updates, ["order_id"], "order_year")
    merged = spark.read.parquet(path)
    return (
        merged.groupBy("order_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            d2d(F.sum("total_price"), "revenue"),
            F.count(F.when(F.col("status") == "U", 1)).alias("n_updated"),
        )
        .orderBy("order_year")
    )


# ---------------------------------------------------------------------------
# S3: HTTP fan-out extract → schema-pinned parse → flatten → aggregate:
# the reference's whole extract+transform dataflow
# (dags/weather_etl_pipeline.py:45-92 → spark_jobs/transform_weather.py:64-113)
# as one distributed plan. The fetch is the deterministic in-container
# stub (proven over real loopback sockets in tests/test_sources.py).
# HASH-CHECKED since round 6: the stub payload is a pure integer
# formula of the url string (polynomial hash → shifted residues in
# tenths), so DuckDB replays fetch → parse → flatten → aggregate from
# the nation table alone. The aggregates quantize the parsed doubles
# back to EXACT integer tenths (the payload's own grid) so sums and
# the half-up average are order-independent and engine-identical.
# ---------------------------------------------------------------------------


def _weather_rollup(raw: DataFrame) -> DataFrame:
    """Shared parse → flatten → aggregate tail of the HTTP extract
    dataflow (transform_weather.py:64-113), applied to any (url,
    payload) source frame."""
    parsed = raw.select(F.from_json("payload", WEATHER_RAW_SCHEMA).alias("w"))
    # extracted_at rides the flatten row-by-row exactly as in the
    # reference (transform_weather.py:92,103)
    flat = parsed.select(
        F.col("w.city").alias("city"),
        F.col("w.extracted_at").alias("extracted_at"),
        F.explode(
            F.arrays_zip(
                F.col("w.daily.time").alias("time"),
                F.col("w.daily.temperature_2m_max").alias("tmax"),
                F.col("w.daily.temperature_2m_min").alias("tmin"),
                F.col("w.daily.precipitation_sum").alias("prec"),
            )
        ).alias("d"),
    ).select("city", "extracted_at", "d.time", "d.tmax", "d.tmin", "d.prec")
    # the payload's values live on a 0.1 grid: recover the exact integer
    # tenths (floor(x*10 + 0.5) absorbs the double-parse epsilon), so
    # the per-city sum is exact and the 1-decimal average is a single
    # half-up integer rounding — bit-identical in any engine, in any
    # aggregation order
    tenths = flat.select(
        "city",
        "extracted_at",
        F.floor(F.col("tmax") * 10 + F.lit(0.5)).cast("long").alias("t10"),
        F.floor(F.col("prec") * 10 + F.lit(0.5)).cast("long").alias("p10"),
    )
    return (
        tenths.groupBy("city")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            (
                F.floor(
                    F.sum("t10").cast("double") / F.count(F.lit(1)) + F.lit(0.5)
                )
                / 10.0
            ).alias("avg_tmax"),
            (F.sum("p10").cast("double") / 10.0).alias("total_prec"),
            F.max("extracted_at").alias("last_extracted_at"),
        )
        .orderBy("city")
    )


_ENDPOINT_PREFIX = "https://api.example.com/v1/forecast?city="


def _http_weather_oracle() -> str:
    """DuckDB replay of the whole HTTP dataflow: url construction, the
    stub fetcher's polynomial url hash (sources/io.py:_make_fake_fetch
    — (h*1000003 + ord(ch)) & 0x7FFFFFFF, i.e. mod 2^31), the shifted
    integer-tenths daily values, and the same flatten + exact-tenths
    aggregate as _weather_rollup."""
    t_days = ", ".join(f"((h >> {s}) % 400) - 100" for s in (1, 3, 5))
    p_days = ", ".join(f"(h >> {s}) % 250" for s in (2, 4, 6))
    return f"""
WITH u AS (
  SELECT n_name AS city, '{_ENDPOINT_PREFIX}' || n_name AS url FROM nation
),
hh AS (
  SELECT city,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(range(1, LENGTH(url) + 1),
                            i -> CAST(ascii(substr(url, i, 1)) AS BIGINT))),
           (a, c) -> (a * 1000003 + c) % 2147483648) AS h
  FROM u
),
days AS (
  SELECT city,
         UNNEST([{t_days}]) AS t10,
         UNNEST([{p_days}]) AS p10
  FROM hh
)
SELECT city,
       COUNT(*) AS n_days,
       FLOOR(CAST(SUM(t10) AS DOUBLE) / COUNT(*) + 0.5) / 10.0 AS avg_tmax,
       CAST(SUM(p10) AS DOUBLE) / 10.0 AS total_prec,
       '2026-01-04T00:00:00+00:00' AS last_extracted_at
FROM days
GROUP BY city
ORDER BY city
"""


@register("http_fanout_weather", oracle=_http_weather_oracle(), tags=("S3", "A1", "A2", "A3"))
def http_fanout_weather(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    endpoints = n.select(
        F.concat(F.lit(_ENDPOINT_PREFIX), F.col("n_name")).alias("url")
    )
    return _weather_rollup(http_fanout_source(endpoints))


@register("http_fanout_pyds", oracle=_http_weather_oracle(), tags=("S3", "A1", "A2", "A3"))
def http_fanout_pyds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 via the Spark 4 Python Data Source API: same endpoints, same
    payloads, same rollup as http_fanout_weather, but the fan-out is a
    real partitioned scan (one input partition per endpoint — task
    retry and speculation per URL). Equivalence with the mapInPandas
    path is pytest-asserted; rows-only here (an HTTP source isn't
    SQL-expressible)."""
    from ..sources.io import http_pyds_source_for

    endpoints = table(spark, sf_dir, "nation").select(
        F.concat(F.lit(_ENDPOINT_PREFIX), F.col("n_name")).alias("url")
    )
    return _weather_rollup(http_pyds_source_for(endpoints))


# ---------------------------------------------------------------------------
# Incremental materialized-rollup maintenance (agg_monthly_weather,
# sql/create_weather_tables.sql:118-131, kept fresh in O(delta)): build
# the monthly rollup from pre-1997 history, fold the 1997+ delta in
# incrementally, and return the result — which must equal the oracle's
# from-scratch rollup exactly (algebraic decimal sums).
# ---------------------------------------------------------------------------

_INCR_ROLLUP_ORACLE = """
SELECT EXTRACT(year FROM o_orderdate) AS order_year,
       EXTRACT(month FROM o_orderdate) AS order_month,
       (CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(12,2)))) AS DOUBLE) + CAST((SUM(CAST(o_totalprice AS DECIMAL(12,2)))) - FLOOR(SUM(CAST(o_totalprice AS DECIMAL(12,2)))) AS DOUBLE)) AS total_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY 1, 2
ORDER BY order_year, order_month
"""


def _monthly_partials(o) -> DataFrame:
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_month"),
        )
        .agg(
            F.sum(dec2("o_totalprice")).alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register("incremental_monthly_rollup", oracle=_INCR_ROLLUP_ORACLE, tags=("G7", "Q3", "S4"))
def incremental_monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.io import incremental_rollup

    o = table(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="rollup_")
    base = _monthly_partials(o.filter(F.year("o_orderdate") < 1997))
    write_partitioned(base, path, ["order_year"])
    delta = _monthly_partials(o.filter(F.year("o_orderdate") >= 1997))
    incremental_rollup(
        spark,
        path,
        delta,
        keys=["order_year", "order_month"],
        sum_cols=["total_price"],
        count_col="n_orders",
        partition_col="order_year",
    )
    return (
        spark.read.parquet(path)
        .select(
            "order_year",
            "order_month",
            d2d(F.col("total_price"), "total_price"),
            "n_orders",
        )
        .orderBy("order_year", "order_month")
    )


# ---------------------------------------------------------------------------
# S10: columnar-interchange roundtrip over the two remaining Spark-native
# file formats — supplier lands as schema-pinned CSV (the classic
# extract-dump shape), customer as ORC (the other columnar format a
# warehouse migration typically hands us) — then a join-aggregate proves
# both landings are value-preserving. The oracle computes the same
# relation straight from the original parquet.
# ---------------------------------------------------------------------------

_FORMATS_ORACLE = """
WITH sc AS (
  SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1
),
cc AS (
  SELECT c_nationkey,
         COUNT(*) AS n_customers,
         (CAST(FLOOR(SUM(CAST(c_acctbal AS DECIMAL(12,2)))) AS DOUBLE) + CAST((SUM(CAST(c_acctbal AS DECIMAL(12,2)))) - FLOOR(SUM(CAST(c_acctbal AS DECIMAL(12,2)))) AS DOUBLE)) AS customer_balance
  FROM customer GROUP BY 1
)
SELECT n.n_name AS nation, sc.n_suppliers, cc.n_customers, cc.customer_balance
FROM nation n
JOIN sc ON sc.s_nationkey = n.n_nationkey
JOIN cc ON cc.c_nationkey = n.n_nationkey
ORDER BY nation
"""

_SUPPLIER_CSV_SCHEMA = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.LongType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)


@register("csv_orc_landing_roundtrip", oracle=_FORMATS_ORACLE, tags=("S10",))
def csv_orc_landing_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.io import read_csv

    n = table(spark, sf_dir, "nation")
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")

    csv_path = tempfile.mkdtemp(prefix="supplier_csv_")
    s.write.mode("overwrite").option("header", "true").csv(csv_path)
    s_back = read_csv(spark, csv_path, schema=_SUPPLIER_CSV_SCHEMA)

    orc_path = tempfile.mkdtemp(prefix="customer_orc_")
    c.write.mode("overwrite").orc(orc_path)
    c_back = spark.read.orc(orc_path)

    # aggregate each side to nation grain BEFORE joining — joining the
    # raw sides would cross-product suppliers×customers within a nation
    sc = s_back.groupBy("s_nationkey").agg(F.count(F.lit(1)).alias("n_suppliers"))
    cc = c_back.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        d2d(F.sum(dec2("c_acctbal")), "customer_balance"),
    )
    return (
        F.broadcast(n)
        .join(sc, sc["s_nationkey"] == n["n_nationkey"])
        .join(cc, cc["c_nationkey"] == n["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            "n_suppliers",
            "n_customers",
            "customer_balance",
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# S8: DDL entry point — idempotent CREATE TABLE IF NOT EXISTS + seeded
# insert through spark.sql (the reference's create_tables task,
# dags/weather_etl_pipeline.py:162-166 running
# sql/create_weather_tables.sql:9-131), then a catalog-table read. Runs
# the DDL TWICE to prove idempotence (the reference re-runs it every
# DAG cycle). The oracle recomputes the same relation from parquet.
# ---------------------------------------------------------------------------

_DDL_ORACLE = """
SELECT o_orderstatus AS status,
       COUNT(*) AS n_orders,
       (CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(12,2)))) AS DOUBLE) + CAST((SUM(CAST(o_totalprice AS DECIMAL(12,2)))) - FLOOR(SUM(CAST(o_totalprice AS DECIMAL(12,2)))) AS DOUBLE)) AS total_price
FROM orders
WHERE EXTRACT(year FROM o_orderdate) = 1997
GROUP BY status
ORDER BY status
"""


@register("ddl_table_roundtrip", oracle=_DDL_ORACLE, tags=("S8",))
def ddl_table_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    # unique name + explicit fresh LOCATION: a managed table's files
    # outlive the in-memory catalog entry across sessions, so a fixed
    # name would hit LOCATION_ALREADY_EXISTS on the second process
    tbl = f"orders_1997_ddl_{uuid.uuid4().hex[:8]}"
    loc = tempfile.mkdtemp(prefix="ddl_tbl_")
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {tbl} (
          o_orderkey BIGINT,
          o_orderstatus STRING,
          o_totalprice DOUBLE,
          o_orderdate DATE
        ) USING parquet LOCATION '{loc}'
        """
    )
    # idempotent re-run: second DDL must be a no-op, like the
    # reference's per-DAG-cycle CREATE TABLE IF NOT EXISTS
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {tbl} (o_orderkey BIGINT) USING parquet"
    )
    o = table(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1997)
    o.select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double"),
        F.col("o_orderdate").cast("date"),
    ).write.mode("overwrite").insertInto(tbl)
    return (
        spark.table(tbl)
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            d2d(F.sum(dec2("o_totalprice")), "total_price"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# S10 extension: XML landing roundtrip (Spark 4's built-in XML source,
# the spark-xml module folded into core). Region dim writes to an XML
# landing zone with explicit row tags and reads back schema-pinned —
# the legacy-feed ingest shape (XML is still the interchange format of
# exactly the enterprise systems a lakehouse lands from). Oracle
# recomputes the same relation from parquet: the roundtrip must be
# lossless.
# ---------------------------------------------------------------------------

_XML_ORACLE = """
SELECT r.r_name AS region, CAST(COUNT(*) AS BIGINT) AS n_nations
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
GROUP BY 1
ORDER BY region
"""


@register("xml_landing_roundtrip", oracle=_XML_ORACLE, tags=("S10",))
def xml_landing_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")

    xml_path = tempfile.mkdtemp(prefix="region_xml_")
    (
        r.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "regions")
        .option("rowTag", "region")
        .save(xml_path)
    )
    r_back = (
        spark.read.format("xml")
        .schema("r_regionkey INT, r_name STRING")
        .option("rowTag", "region")
        .load(xml_path)
    )
    return (
        F.broadcast(r_back)
        .join(n, n["n_regionkey"] == r_back["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"))
        .agg(F.count(F.lit(1)).alias("n_nations"))
        .orderBy("region")
    )


# ---------------------------------------------------------------------------
# S4/Q3 snapshot time travel ([EXT] — sources/io.py write_snapshot):
# two immutable versions of an orders extract (v1 = 1995 only, v2 =
# 1995+1996), then a time-travel read of BOTH: the historical v1 must
# still serve its original contents after v2 lands. Oracle replays
# both version predicates declaratively.
# ---------------------------------------------------------------------------

_SNAPSHOT_ORACLE = """
SELECT 1 AS version, CAST(YEAR(o_orderdate) AS INT) AS o_year,
       COUNT(*) AS n_orders
FROM orders WHERE YEAR(o_orderdate) = 1995 GROUP BY 2
UNION ALL
SELECT 2 AS version, CAST(YEAR(o_orderdate) AS INT) AS o_year,
       COUNT(*) AS n_orders
FROM orders WHERE YEAR(o_orderdate) IN (1995, 1996) GROUP BY 2
"""


@register("snapshot_time_travel", oracle=_SNAPSHOT_ORACLE, tags=("S4", "Q3"))
def snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.io import read_snapshot, write_snapshot

    o = table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    base = tempfile.mkdtemp(prefix="snapshots_") + "/orders"
    v1 = write_snapshot(o.filter(F.col("o_year") == 1995), base)
    v2 = write_snapshot(o.filter(F.col("o_year").isin(1995, 1996)), base)
    frames = []
    for v in (v1, v2):
        frames.append(
            read_snapshot(spark, base, version=v)
            .groupBy("o_year")
            .agg(F.count(F.lit(1)).alias("n_orders"))
            .select(F.lit(v).alias("version"), "o_year", "n_orders")
        )
    return frames[0].unionByName(frames[1])


# ---------------------------------------------------------------------------
# S4/Q3 snapshot compaction ([EXT] — sources/io.py compact_snapshot):
# the lake-maintenance op for the small-file debt the reference's
# daily landing accrues (dags/weather_etl_pipeline.py:55,87). A
# customer-grain rollup lands as v=1 fragmented into 24 files, is
# bin-packed to target size as v=2 through the committed-marker swap
# (readers of v=1 undisturbed; a torn compaction is invisible), and
# the query returns the COMPACTED version's rows — the oracle hash
# proves contents survive compaction bit-for-bit, and pytest asserts
# the file-count/sort-stats side (tests/test_round5_fixes.py).
# ---------------------------------------------------------------------------

_COMPACT_ORACLE = """
SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
       (CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(12,2)))) AS DOUBLE) + CAST((SUM(CAST(o_totalprice AS DECIMAL(12,2)))) - FLOOR(SUM(CAST(o_totalprice AS DECIMAL(12,2)))) AS DOUBLE)) AS total_price
FROM orders GROUP BY 1
"""


@register("compacted_snapshot_roundtrip", oracle=_COMPACT_ORACLE, tags=("S4", "Q3"))
def compacted_snapshot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import dsum
    from ..sources.io import compact_snapshot, read_snapshot, write_snapshot

    rollup = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total_price"))
    )
    base = tempfile.mkdtemp(prefix="compact_snap_") + "/rollup"
    write_snapshot(rollup.repartition(24), base)  # the fragmented landing
    v2 = compact_snapshot(
        spark, base, target_file_bytes=256 * 1024 * 1024, sort_cols=["custkey"]
    )
    return read_snapshot(spark, base, version=v2).select(
        "custkey", "n_orders", "total_price"
    )


# ---------------------------------------------------------------------------
# S5/S6 JDBC warehouse roundtrip — oracle-checked ([EXT] upgrade of the
# pytest-only Derby proof): the reference's staging-table load
# (transform_weather.py:166-174, df.write.jdbc overwrite) against a
# REAL embedded database. The priority rollup writes to a fresh Derby
# database over actual JDBC (Derby ships in Spark's jars — no network,
# same driver-registration path as Postgres would use), reads back
# through read_jdbc, and must hash-match the declarative oracle —
# proving type round-tripping (VARCHAR/BIGINT/DOUBLE) end to end.
# ---------------------------------------------------------------------------

_JDBC_ORACLE = """
SELECT o_orderpriority AS priority,
       CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS order_month,
       COUNT(*) AS n_orders,
       (CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(12,2)))) AS DOUBLE) + CAST((SUM(CAST(o_totalprice AS DECIMAL(12,2)))) - FLOOR(SUM(CAST(o_totalprice AS DECIMAL(12,2)))) AS DOUBLE)) AS total_price
FROM orders GROUP BY 1, 2
"""


@register("jdbc_warehouse_roundtrip", oracle=_JDBC_ORACLE, tags=("S5", "S6"))
def jdbc_warehouse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import dsum
    from ..sources.io import read_jdbc, write_jdbc

    o = table(spark, sf_dir, "orders")
    agg = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        # VARCHAR + DATE + BIGINT + DOUBLE all round-trip through the
        # warehouse's SQL types
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("order_month"),
    ).agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total_price"))
    dbdir = tempfile.mkdtemp(prefix="derby_wh_")
    # keep derby.log out of the CWD/repo: Derby writes it to
    # derby.system.home, which defaults to user.dir. Setting the JVM
    # property before the engine first loads routes it to the temp dir
    # (a no-op if Derby already booted elsewhere this JVM).
    spark._jvm.java.lang.System.setProperty("derby.system.home", dbdir)
    url = f"jdbc:derby:{dbdir}/wh;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    write_jdbc(agg, url, "priority_rollup", properties=props, mode="overwrite")
    return read_jdbc(spark, url, "priority_rollup", properties=props).select(
        "priority", "order_month", "n_orders", "total_price"
    )


# ---------------------------------------------------------------------------
# S4 via the Spark 4 Python Data Source WRITER ([EXT] —
# sources/io.py:jsonl_pyds_sink): supplier rows stream through the
# two-phase-commit JSONL sink (per-task temp files, driver-side
# rename + marker), are read back with a pinned schema, and must
# reproduce the per-nation rollup bit-for-bit — proving the custom
# writer is value-preserving end to end.
# ---------------------------------------------------------------------------

_PYDS_SINK_ORACLE = """
SELECT n.n_name AS nation,
       COUNT(*) AS n_suppliers,
       (CAST(FLOOR(SUM(CAST(s.s_acctbal AS DECIMAL(12,2)))) AS DOUBLE) + CAST((SUM(CAST(s.s_acctbal AS DECIMAL(12,2)))) - FLOOR(SUM(CAST(s.s_acctbal AS DECIMAL(12,2)))) AS DOUBLE)) AS total_acctbal,
       MIN(s.s_name) AS first_supplier
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1
"""


@register("pyds_jsonl_sink_roundtrip", oracle=_PYDS_SINK_ORACLE, tags=("S4", "S7"))
def pyds_jsonl_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import dsum
    from ..sources.io import jsonl_pyds_sink, read_json

    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    rows = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
        F.col("n_name").alias("nation"),
        "s_name",
        F.col("s_acctbal").cast("string").alias("acctbal_str"),
    )
    path = tempfile.mkdtemp(prefix="pyds_sink_") + "/suppliers"
    jsonl_pyds_sink(rows, path)
    schema = T.StructType(
        [
            T.StructField("nation", T.StringType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("acctbal_str", T.StringType()),
        ]
    )
    back = read_json(spark, f"{path}/*.jsonl", schema=schema)
    return back.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        dsum(F.col("acctbal_str").cast("decimal(12,2)"), "total_acctbal"),
        F.min("s_name").alias("first_supplier"),
    )


# ---------------------------------------------------------------------------
# S1/S2/Q1 malformed-input robustness ([EXT] — any API-fed landing
# (the reference ingests live HTTP JSON) eventually contains garbage
# lines; at 100 TB a single corrupt record must neither kill the job
# nor silently vanish). A JSONL landing is seeded with nation rows
# PLUS deliberately broken lines; the PERMISSIVE read routes breakage
# into _corrupt_record, and the query accounts for every line: good
# rows aggregate per region, corrupt rows are counted under their own
# label. The oracle reproduces the good-row aggregate from parquet
# and the corrupt count from the fixture constant.
# ---------------------------------------------------------------------------

_N_CORRUPT_LINES = 3

_CORRUPT_ORACLE = f"""
SELECT r.r_name AS bucket, COUNT(*) AS n_rows,
       CAST(SUM(n.n_nationkey) AS BIGINT) AS key_sum
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1
UNION ALL
SELECT '__corrupt__', {_N_CORRUPT_LINES}, NULL
"""


@register("json_corrupt_record_audit", oracle=_CORRUPT_ORACLE, tags=("S1", "S2", "Q1"))
def json_corrupt_record_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    good = n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]).select(
        "n_nationkey", F.col("r_name").alias("region_name")
    )
    path = tempfile.mkdtemp(prefix="corrupt_landing_")
    # Good rows land distributed (no driver collect); the corrupt lines
    # go in as a separate hand-written part file beside Spark's output.
    good.write.mode("overwrite").json(path)
    with open(os.path.join(path, "part-zcorrupt.json"), "w") as fh:
        fh.write('{"n_nationkey": 999, "region_name": \n')  # truncated
        fh.write("not json at all\n")
        fh.write('{"n_nationkey": "}\n')  # unterminated string
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.LongType()),
            T.StructField("region_name", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return back.groupBy(
        F.coalesce(
            F.when(F.col("_corrupt_record").isNotNull(), F.lit("__corrupt__")),
            F.col("region_name"),
        ).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("_corrupt_record").isNull(), F.col("n_nationkey"))).alias(
            "key_sum"
        ),
    )


# ---------------------------------------------------------------------------
# S9/S4 schema evolution ([EXT] — every long-lived lake hits it: a new
# pipeline version starts writing an extra column, and readers must
# keep working across the old and new file generations). Two parquet
# generations land in one dataset — the 1995-96 files WITHOUT
# o_orderpriority, the 1997+ files WITH it — and the read uses
# mergeSchema so Spark's parquet source unions the footers into one
# evolved schema (old files surface NULL for the new column). The
# oracle recomputes the same relation from the original table with the
# generation rule inlined. At 100 TB: schema merge happens on file
# FOOTERS at planning time, the data itself is never rewritten — the
# exact reason mergeSchema (not a backfill) is the evolution story.
# ---------------------------------------------------------------------------

_EVOLUTION_ORACLE = """
SELECT EXTRACT(year FROM o_orderdate) AS order_year,
       COUNT(*) AS n_orders,
       (CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(12,2)))) AS DOUBLE) + CAST((SUM(CAST(o_totalprice AS DECIMAL(12,2)))) - FLOOR(SUM(CAST(o_totalprice AS DECIMAL(12,2)))) AS DOUBLE)) AS revenue,
       COUNT(CASE WHEN EXTRACT(year FROM o_orderdate) >= 1997
                  THEN o_orderpriority END) AS n_with_priority,
       MIN(CASE WHEN EXTRACT(year FROM o_orderdate) >= 1997
                THEN o_orderpriority END) AS first_priority
FROM orders
GROUP BY 1
ORDER BY order_year
"""


@register("schema_evolution_mergeread", oracle=_EVOLUTION_ORACLE, tags=("S9", "S4", "P4"))
def schema_evolution_mergeread(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        dec2("o_totalprice").alias("o_totalprice"),
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        "o_orderpriority",
    )
    path = tempfile.mkdtemp(prefix="evolving_lake_")
    # generation 1: the original writer never knew about priority
    o.filter(F.year("o_orderdate") < 1997).drop("o_orderpriority").write.mode(
        "append"
    ).parquet(path)
    # generation 2: the upgraded writer adds the column
    o.filter(F.year("o_orderdate") >= 1997).write.mode("append").parquet(path)
    evolved = spark.read.option("mergeSchema", "true").parquet(path)
    return (
        evolved.groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            d2d(F.sum("o_totalprice"), "revenue"),
            F.count("o_orderpriority").alias("n_with_priority"),
            F.min("o_orderpriority").alias("first_priority"),
        )
        .orderBy("order_year")
    )


# ---------------------------------------------------------------------------
# S4/Q3 dynamic partition overwrite ([EXT] — INSERT OVERWRITE semantics
# done right at scale: the default "static" overwrite mode would WIPE
# the whole table before writing, so re-running one day's batch deletes
# every other day; dynamic mode replaces ONLY the partitions present in
# the incoming frame). A year-partitioned orders table gets its 1997
# partition re-published with a 5% price bump via a dynamic-mode
# overwrite — every other year's files are untouched (pytest asserts
# file-identity on an unrelated partition), and the read-back must show
# exactly one bumped year. The decimal bump is exact (price has 2
# decimals, ×1.05 fits DECIMAL(14,4)), so the oracle replays the final
# table state from the original parquet.
# ---------------------------------------------------------------------------

_DYN_OVERWRITE_ORACLE = """
SELECT EXTRACT(year FROM o_orderdate) AS order_year,
       COUNT(*) AS n_orders,
       (CAST(FLOOR(SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1997 THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(1.05 AS DECIMAL(4,2)) AS DECIMAL(14,4)) ELSE CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(14,4)) END)) AS DOUBLE) + CAST((SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1997 THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(1.05 AS DECIMAL(4,2)) AS DECIMAL(14,4)) ELSE CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(14,4)) END)) - FLOOR(SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1997 THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(1.05 AS DECIMAL(4,2)) AS DECIMAL(14,4)) ELSE CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(14,4)) END)) AS DOUBLE)) AS revenue
FROM orders
GROUP BY 1
ORDER BY order_year
"""


@register("dynamic_partition_overwrite", oracle=_DYN_OVERWRITE_ORACLE, tags=("S4", "Q3", "S8"))
def dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        dec2("o_totalprice").cast("decimal(14,4)").alias("total_price"),
        F.year(F.col("o_orderdate").cast("date")).cast("long").alias("order_year"),
    )
    path = tempfile.mkdtemp(prefix="dyn_overwrite_")
    o.write.mode("overwrite").partitionBy("order_year").parquet(path)
    bumped = o.filter(F.col("order_year") == 1997).withColumn(
        "total_price",
        (F.col("total_price") * F.lit(1.05).cast("decimal(4,2)")).cast(
            "decimal(14,4)"
        ),
    )
    # dynamic mode: ONLY the 1997 partition directory is replaced
    bumped.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("order_year").parquet(path)
    back = spark.read.parquet(path)
    return (
        back.groupBy("order_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            d2d(F.sum("total_price"), "revenue"),
        )
        .orderBy("order_year")
    )


# ---------------------------------------------------------------------------
# S9/L5 binary-file source ([EXT] — Spark's `binaryFile` format is the
# standard on-ramp for raw media/blob corpora: each file becomes one
# row of (path, modificationTime, length, content) with NO parsing on
# read, so decode stays a downstream Arrow-batched stage — exactly the
# multimodal ingestion shape in operators/multimodal.py. The fixture
# is a deterministic set of ASCII payload files (pure formula of the
# file index, regenerated idempotently, no driver collect) and the
# oracle REBUILDS every payload with SQL string machinery and md5s it
# — so filename routing, byte lengths, and content integrity of the
# whole scan path are hash-checked without the oracle touching the
# filesystem. At 100 TB: one row per file, content bytes never leave
# the executor (md5/length reduce them in the scan stage); listing
# cost is the known driver-side concern and the production pattern is
# partitioned manifest dirs, noted here.
# ---------------------------------------------------------------------------

_N_BINARY_FILES = 16

_BINARYFILE_ORACLE = f"""
SELECT printf('part_%02d.bin', t.i) AS file_name,
       CAST(LENGTH(printf('payload %02d', t.i) || chr(10)
                   || repeat('x', 100 + 7 * t.i) || chr(10)) AS BIGINT)
         AS n_bytes,
       md5(printf('payload %02d', t.i) || chr(10)
           || repeat('x', 100 + 7 * t.i) || chr(10)) AS content_md5,
       printf('payload %02d', t.i) AS header_line
FROM range(0, {_N_BINARY_FILES}) AS t(i)
"""


@register("binaryfile_blob_scan", oracle=_BINARYFILE_ORACLE, tags=("S9", "L5"))
def binaryfile_blob_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    path = tempfile.mkdtemp(prefix="binary_blobs_")
    for i in range(_N_BINARY_FILES):
        payload = ("payload %02d\n" % i) + "x" * (100 + 7 * i) + "\n"
        with open(os.path.join(path, "part_%02d.bin" % i), "wb") as fh:
            fh.write(payload.encode("ascii"))
    scan = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(path)
    )
    content_str = F.col("content").cast("string")
    return scan.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length").cast("long").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
        F.split(content_str, "\n").getItem(0).alias("header_line"),
    )


# ---------------------------------------------------------------------------
# S11/Q2 vacuum-policy audit ([EXT] — SURVEY §7.5 idea bank): the
# janitor's dashboard that completes the snapshot lake lifecycle
# (write → compact → torn writer → vacuum). A deterministic six-version
# history is landed over documents (initial load, compaction, full
# upsert, an EXPIRED torn writer below the newest commit, the current
# version, and an IN-FLIGHT torn writer above it), then
# sources/io.py:audit_vacuum_policy — the same decision engine
# vacuum_snapshots deletes from — classifies every version dir. The
# relation carries the oracle-expressible half (version, committed,
# row count, decision, reclaimable); the byte/file-count half and the
# audit≡vacuum agreement are asserted in
# tests/test_round10_session_ops.py. At 100 TB the audit is pure
# driver-side file-listing metadata (O(versions) stat calls) and each
# row count is a parquet footer-only COUNT(*) scan — no data pages
# move for the dashboard.
# ---------------------------------------------------------------------------

_VACUUM_AUDIT_ORACLE = """
SELECT 1 AS version, TRUE AS committed,
       (SELECT COUNT(*) FROM documents WHERE doc_id % 4 <> 0) AS n_rows,
       'reclaimable' AS decision, TRUE AS reclaimable
UNION ALL
SELECT 2, TRUE,
       (SELECT COUNT(*) FROM documents WHERE doc_id % 4 <> 0),
       'reclaimable', TRUE
UNION ALL
SELECT 3, TRUE, (SELECT COUNT(*) FROM documents), 'retained', FALSE
UNION ALL
SELECT 4, FALSE,
       (SELECT COUNT(*) FROM documents WHERE doc_id % 3 = 0),
       'torn_expired', TRUE
UNION ALL
SELECT 5, TRUE,
       (SELECT COUNT(*) FROM documents WHERE doc_id % 7 <> 0),
       'retained', FALSE
UNION ALL
SELECT 6, FALSE,
       (SELECT COUNT(*) FROM documents WHERE doc_id % 5 = 0),
       'torn_inflight', FALSE
"""


def build_vacuum_history(spark: SparkSession, sf_dir: str) -> str:
    """The deterministic six-version snapshot history shared by
    vacuum_policy_audit and the streaming janitor twin
    (streaming/jobs.py:stream_vacuum_janitor_state); returns the base.

    v1 initial load (doc_id % 4 <> 0, fragmented into 4 files) →
    v2 compact_snapshot of v1 (same rows, bin-packed) →
    v3 full upsert (all documents) →
    v4 TORN below the newest commit (marker removed; grace 0 ⇒ expired) →
    v5 current (doc_id % 7 <> 0) →
    v6 TORN above the newest commit (an in-flight writer — protected
    regardless of age)."""
    import atexit
    import os
    import shutil

    from ..sources.io import compact_snapshot, write_snapshot

    d = table(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    root = tempfile.mkdtemp(prefix="vacuum_audit_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    base = root + "/docs"
    write_snapshot(d.filter(F.col("doc_id") % 4 != 0).repartition(4), base)
    compact_snapshot(spark, base, target_file_bytes=256 * 1024 * 1024)
    write_snapshot(d, base)
    v4 = write_snapshot(d.filter(F.col("doc_id") % 3 == 0), base)
    os.remove(os.path.join(base, f"v={v4}", "_COMMITTED"))
    write_snapshot(d.filter(F.col("doc_id") % 7 != 0), base)
    v6 = write_snapshot(d.filter(F.col("doc_id") % 5 == 0), base)
    os.remove(os.path.join(base, f"v={v6}", "_COMMITTED"))
    return base


@register("vacuum_policy_audit", oracle=_VACUUM_AUDIT_ORACLE, tags=("S11", "Q2"))
def vacuum_policy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lake-retention dashboard over the deterministic snapshot history
    of build_vacuum_history. keep_last=2 retains {v3, v5}; v1/v2 age
    out; v4 is reclaimable torn debt; v6 must never be touched. Row
    counts come from per-version parquet scans (COUNT(*) is
    footer-metadata-only), so the oracle can recompute every column
    from the documents view plus the declared policy."""
    from ..sources.io import audit_vacuum_policy

    base = build_vacuum_history(spark, sf_dir)
    audit = audit_vacuum_policy(base, keep_last=2, torn_grace_seconds=0.0)
    vacuum_policy_audit.last_base = base  # for the byte-level pytest half
    meta = spark.createDataFrame(
        [
            (
                r["version"],
                r["committed"],
                r["decision"],
                r["decision"] in ("reclaimable", "torn_expired"),
            )
            for r in audit
        ],
        "version int, committed boolean, decision string, reclaimable boolean",
    )
    counts = None
    for r in audit:
        c = (
            spark.read.parquet(f"{base}/v={r['version']}")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
            .select(F.lit(r["version"]).cast("int").alias("version"), "n_rows")
        )
        counts = c if counts is None else counts.unionByName(c)
    return (
        meta.join(counts, "version")
        .select("version", "committed", "n_rows", "decision", "reclaimable")
        .orderBy("version")
    )


# ---------------------------------------------------------------------------
# S11 snapshot-lineage diff ([EXT] — SURVEY §7.5 round-11 candidate,
# landed round 10): "what changed since yesterday" between two
# committed versions of a snapshot base, computed through the REAL
# snapshot machinery (write_snapshot -> read_snapshot both sides). A
# deterministic two-version history lands over documents — v1 keeps
# doc_id % 3 <> 0; v2 keeps doc_id % 5 <> 0 and rewrites the text of
# docs with doc_id % 7 = 0 (a marker prefix) — then the diff is one
# doc_id-keyed full outer join classifying every key: added (B only),
# deleted (A only), updated (both, md5(text) differs). Unchanged rows
# are excluded — at 100 TB the diff relation is change-sized, not
# corpus-sized, and the join is one co-partitioned shuffle on the
# natural key (bucketed snapshot layouts make it exchange-free). The
# oracle replays the predicates straight off the documents view.
# ---------------------------------------------------------------------------

_LINEAGE_ORACLE = """
WITH a AS (
  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 3 <> 0
),
b AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 7 = 0 THEN '[rev2] ' || text ELSE text END) AS h
  FROM documents WHERE doc_id % 5 <> 0
)
SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
       CASE WHEN a.doc_id IS NULL THEN 'added'
            WHEN b.doc_id IS NULL THEN 'deleted'
            ELSE 'updated' END AS status,
       a.h AS old_md5, b.h AS new_md5
FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
WHERE a.doc_id IS NULL OR b.doc_id IS NULL OR a.h <> b.h
"""


@register("snapshot_lineage_diff", oracle=_LINEAGE_ORACLE, tags=("S11", "Q2"))
def snapshot_lineage_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil

    from ..sources.io import read_snapshot, write_snapshot

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="lineage_diff_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    base = root + "/docs"
    v_a = write_snapshot(d.filter(F.col("doc_id") % 3 != 0), base)
    v_b = write_snapshot(
        d.filter(F.col("doc_id") % 5 != 0).select(
            "doc_id",
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.lit("[rev2] "), F.col("text"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        ),
        base,
    )
    a = read_snapshot(spark, base, v_a).select(
        F.col("doc_id").alias("a_id"), F.md5("text").alias("old_md5")
    )
    b = read_snapshot(spark, base, v_b).select(
        F.col("doc_id").alias("b_id"), F.md5("text").alias("new_md5")
    )
    j = a.join(b, a["a_id"] == b["b_id"], "full_outer")
    return (
        j.filter(
            F.col("a_id").isNull()
            | F.col("b_id").isNull()
            | (F.col("old_md5") != F.col("new_md5"))
        )
        .select(
            F.coalesce("a_id", "b_id").alias("doc_id"),
            F.when(F.col("a_id").isNull(), F.lit("added"))
            .when(F.col("b_id").isNull(), F.lit("deleted"))
            .otherwise(F.lit("updated"))
            .alias("status"),
            "old_md5",
            "new_md5",
        )
    )


# ---------------------------------------------------------------------------
# S11/J2 bucketed-lake lineage ([EXT] — SURVEY §7.5; the
# join_fact_revenue_bucketed discipline applied to the snapshot diff):
# the same added/deleted/updated relation as snapshot_lineage_diff, but
# with both versions landed as doc_id-bucketed managed tables, so the
# full-outer diff join reads co-located, pre-sorted buckets — ZERO
# Exchange anywhere in the plan (pytest-asserted). At 100 TB this is
# how a lake owner runs the nightly diff: the bucket shuffle is paid
# once when each version lands, and every subsequent diff/join on the
# natural key is shuffle-free. Same oracle as the plain twin — the
# layout must not change a single row.
# ---------------------------------------------------------------------------


@register("snapshot_lineage_diff_bucketed", oracle=_LINEAGE_ORACLE, tags=("S11", "J2"))
def snapshot_lineage_diff_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.io import write_bucketed

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_").replace("-", "_")
    names = (f"bkt_lineage_a_{tag}", f"bkt_lineage_b_{tag}")
    write_bucketed(
        d.filter(F.col("doc_id") % 3 != 0).select(
            "doc_id", F.md5("text").alias("old_md5")
        ),
        names[0],
        ["doc_id"],
        8,
    )
    write_bucketed(
        d.filter(F.col("doc_id") % 5 != 0).select(
            "doc_id",
            F.md5(
                F.when(
                    F.col("doc_id") % 7 == 0,
                    F.concat(F.lit("[rev2] "), F.col("text")),
                ).otherwise(F.col("text"))
            ).alias("new_md5"),
        ),
        names[1],
        ["doc_id"],
        8,
    )
    a = spark.table(names[0]).withColumnRenamed("doc_id", "a_id")
    b = spark.table(names[1]).withColumnRenamed("doc_id", "b_id")
    j = a.join(b, a["a_id"] == b["b_id"], "full_outer")
    return (
        j.filter(
            F.col("a_id").isNull()
            | F.col("b_id").isNull()
            | (F.col("old_md5") != F.col("new_md5"))
        )
        .select(
            F.coalesce("a_id", "b_id").alias("doc_id"),
            F.when(F.col("a_id").isNull(), F.lit("added"))
            .when(F.col("b_id").isNull(), F.lit("deleted"))
            .otherwise(F.lit("updated"))
            .alias("status"),
            "old_md5",
            "new_md5",
        )
    )


# ---------------------------------------------------------------------------
# S11/Q3/G7 incremental materialized-view maintenance ([EXT] — the
# reference claims "Materialized views for performance" (README.md:52)
# and refreshes them by full recompute (sql/transform_weather.sql);
# at 100 TB a full refresh rescans the fact table nightly. This is the
# incremental spelling over the snapshot protocol: the priority-grain
# revenue rollup lands as MV v=1 over the base orders (o_orderkey % 4
# <> 0), the delta (remaining quarter) arrives, and v=2 is produced by
# DELTA-APPLY — aggregate ONLY the delta rows, full-outer merge with
# the O(groups) MV v1, write_snapshot — never rescanning the base. The
# oracle recomputes the rollup over ALL orders from scratch: hash
# equality IS the maintenance-correctness proof (exact decimal sums
# merge exactly; the double cast happens once at read). Cost at scale:
# |delta| scan + O(groups) merge, vs the reference's full rescan.
# ---------------------------------------------------------------------------

_MV_ORACLE = """
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       (CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(12,2)))) AS DOUBLE) + CAST((SUM(CAST(o_totalprice AS DECIMAL(12,2)))) - FLOOR(SUM(CAST(o_totalprice AS DECIMAL(12,2)))) AS DOUBLE)) AS revenue,
       CAST(COUNT(*) FILTER (WHERE o_orderkey % 4 = 0) AS BIGINT)
         AS n_from_delta,
       2 AS mv_version
FROM orders GROUP BY o_orderpriority
"""


@register("incremental_mv_maintenance", oracle=_MV_ORACLE, tags=("S11", "Q3", "G7"))
def incremental_mv_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil

    from ..sources.io import read_snapshot, write_snapshot

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="mv_maint_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    base = root + "/mv_priority_revenue"

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("o_orderpriority").alias("priority")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(dec2("o_totalprice")).alias("__rev"),  # stays DECIMAL
        )

    write_snapshot(rollup(o.filter(F.col("o_orderkey") % 4 != 0)), base)
    # the nightly delta lands: aggregate ONLY it, merge at the group grain
    delta = rollup(o.filter(F.col("o_orderkey") % 4 == 0)).select(
        "priority",
        F.col("n_orders").alias("d_orders"),
        F.col("__rev").alias("d_rev"),
    )
    mv1 = read_snapshot(spark, base, version=1)
    merged = (
        mv1.join(delta, "priority", "full_outer")
        .select(
            "priority",
            (F.coalesce("n_orders", F.lit(0)) + F.coalesce("d_orders", F.lit(0)))
            .cast("bigint")
            .alias("n_orders"),
            (
                F.coalesce(F.col("__rev"), F.lit(0).cast("decimal(12,2)"))
                + F.coalesce(F.col("d_rev"), F.lit(0).cast("decimal(12,2)"))
            ).alias("__rev"),
            F.coalesce("d_orders", F.lit(0)).cast("bigint").alias("n_from_delta"),
        )
    )
    v2 = write_snapshot(merged, base)
    return read_snapshot(spark, base, version=v2).select(
        "priority",
        "n_orders",
        d2d(F.col("__rev"), "revenue"),
        "n_from_delta",
        F.lit(v2).cast("int").alias("mv_version"),
    )


# ---------------------------------------------------------------------------
# S11/S4 file-grain snapshot lineage ([EXT] — SURVEY §7.5 round-11
# candidate: "which bucket files changed between versions — the
# incremental-recompute planner's input"). Both versions land through
# write_snapshot_partitioned with a deterministic bucket = doc_id % 16
# Hive partition column, so the row diff can be attributed to the
# PARTITION DIRECTORIES that physically hold the rows. The relation is
# the planner's work list: per bucket, how many rows were added /
# deleted / updated / unchanged between v1 and v2 and whether the
# bucket needs recomputing at all — at 100 TB the planner reprocesses
# ONLY the needs_recompute=true directories and skips the rest
# wholesale (the same economics as join_fact_revenue_bucketed: pay the
# layout once at land time, skip shuffles and rescans forever after).
# The oracle derives the identical relation semantically from the
# documents table (the %3/%5/%7 version model shared with
# snapshot_lineage_diff); equality proves the partitioned lake
# roundtrip is value-preserving at the bucket grain. The PHYSICAL half
# (flagged buckets are exactly the partition dirs whose parquet
# content differs) is pytest-asserted via the exposed `last_base`.
# ---------------------------------------------------------------------------

_LINEAGE_FILES_ORACLE = """
WITH a AS (SELECT doc_id FROM documents WHERE doc_id % 3 <> 0),
     b AS (SELECT doc_id FROM documents WHERE doc_id % 5 <> 0),
     j AS (
       SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
              CASE WHEN a.doc_id IS NULL THEN 'added'
                   WHEN b.doc_id IS NULL THEN 'deleted'
                   WHEN COALESCE(a.doc_id, b.doc_id) % 7 = 0 THEN 'updated'
                   ELSE 'unchanged' END AS status
       FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
     )
SELECT doc_id % 16 AS bucket,
       CAST(COUNT(*) FILTER (WHERE status <> 'added') AS BIGINT) AS n_docs_a,
       CAST(COUNT(*) FILTER (WHERE status <> 'deleted') AS BIGINT) AS n_docs_b,
       CAST(COUNT(*) FILTER (WHERE status = 'added') AS BIGINT) AS n_added,
       CAST(COUNT(*) FILTER (WHERE status = 'deleted') AS BIGINT) AS n_deleted,
       CAST(COUNT(*) FILTER (WHERE status = 'updated') AS BIGINT) AS n_updated,
       CAST(COUNT(*) FILTER (WHERE status = 'unchanged') AS BIGINT)
         AS n_unchanged,
       COUNT(*) FILTER (WHERE status <> 'unchanged') > 0 AS needs_recompute
FROM j GROUP BY doc_id % 16
"""


@register(
    "snapshot_lineage_files", oracle=_LINEAGE_FILES_ORACLE, tags=("S11", "S4", "J2")
)
def snapshot_lineage_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil

    from ..sources.io import read_snapshot, write_snapshot_partitioned

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.pmod("doc_id", F.lit(16)).alias("bucket")
    )
    root = tempfile.mkdtemp(prefix="lineage_files_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    base = root + "/docs"
    snapshot_lineage_files.last_base = base
    v_a = write_snapshot_partitioned(d.filter(F.col("doc_id") % 3 != 0), base, ["bucket"])
    v_b = write_snapshot_partitioned(
        d.filter(F.col("doc_id") % 5 != 0).select(
            "doc_id",
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.lit("[rev2] "), F.col("text"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
            "bucket",
        ),
        base,
        ["bucket"],
    )
    # the honest lake comparison: statuses come from the WRITTEN bytes,
    # not the in-memory frames — md5 over the read-back text
    a = read_snapshot(spark, base, v_a).select(
        F.col("doc_id").alias("a_id"),
        F.col("bucket").cast("bigint").alias("a_bucket"),
        F.md5("text").alias("a_md5"),
    )
    b = read_snapshot(spark, base, v_b).select(
        F.col("doc_id").alias("b_id"),
        F.col("bucket").cast("bigint").alias("b_bucket"),
        F.md5("text").alias("b_md5"),
    )
    status = (
        F.when(F.col("a_id").isNull(), F.lit("added"))
        .when(F.col("b_id").isNull(), F.lit("deleted"))
        .when(F.col("a_md5") != F.col("b_md5"), F.lit("updated"))
        .otherwise(F.lit("unchanged"))
    )
    j = a.join(b, a["a_id"] == b["b_id"], "full_outer").select(
        F.coalesce("a_bucket", "b_bucket").alias("bucket"),
        status.alias("status"),
    )
    agg = [
        F.sum((F.col("status") == s).cast("bigint")).alias(n)
        for s, n in [
            ("added", "n_added"),
            ("deleted", "n_deleted"),
            ("updated", "n_updated"),
            ("unchanged", "n_unchanged"),
        ]
    ]
    return j.groupBy("bucket").agg(
        F.sum((F.col("status") != "added").cast("bigint")).alias("n_docs_a"),
        F.sum((F.col("status") != "deleted").cast("bigint")).alias("n_docs_b"),
        *agg,
        (F.sum((F.col("status") != "unchanged").cast("bigint")) > 0).alias(
            "needs_recompute"
        ),
    )


# ---------------------------------------------------------------------------
# S11/S4/G7 incremental bucket recompute ([EXT] — SURVEY §7.5: the
# executor for snapshot_lineage_files' work list, closing the loop the
# file-grain lineage opened). The per-bucket rollup (n_docs,
# sum_chars) is maintained across versions WITHOUT rescanning v2:
# compute the rollup once over v1, diff the versions at the bucket
# grain, then re-aggregate ONLY the needs_recompute partition
# directories of v2 (a static bucket IN (...) filter — the changed-
# bucket list is bounded by the 16-bucket layout, metadata not data,
# so the collect is O(1) and the scan shows PartitionFilters) and
# merge with the untouched buckets' v1 rows. Hash equality with the
# oracle's FULL v2 recompute is the maintenance-correctness proof —
# incremental_mv_maintenance's argument at the partition grain. Cost
# at scale: |changed buckets| scan + O(buckets) merge vs a full v2
# rescan.
# ---------------------------------------------------------------------------

_RECOMPUTE_ORACLE = """
WITH a AS (SELECT doc_id FROM documents WHERE doc_id % 3 <> 0),
     b AS (SELECT doc_id FROM documents WHERE doc_id % 5 <> 0),
     j AS (
       SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
              CASE WHEN a.doc_id IS NULL THEN 'added'
                   WHEN b.doc_id IS NULL THEN 'deleted'
                   WHEN COALESCE(a.doc_id, b.doc_id) % 7 = 0 THEN 'updated'
                   ELSE 'unchanged' END AS status
       FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
     ),
chg AS (
  SELECT doc_id % 16 AS bucket FROM j WHERE status <> 'unchanged' GROUP BY 1
),
v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN '[rev2] ' || text ELSE text END AS text
  FROM documents WHERE doc_id % 5 <> 0
)
SELECT v2.doc_id % 16 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_chars,
       v2.doc_id % 16 IN (SELECT bucket FROM chg) AS recomputed
FROM v2 GROUP BY v2.doc_id % 16
"""


@register(
    "incremental_bucket_recompute",
    oracle=_RECOMPUTE_ORACLE,
    tags=("S11", "S4", "G7"),
)
def incremental_bucket_recompute(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil

    from ..sources.io import read_snapshot, write_snapshot_partitioned

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.pmod("doc_id", F.lit(16)).alias("bucket")
    )
    root = tempfile.mkdtemp(prefix="bucket_recompute_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    base = root + "/docs"
    incremental_bucket_recompute.last_base = base
    v_a = write_snapshot_partitioned(
        d.filter(F.col("doc_id") % 3 != 0), base, ["bucket"]
    )
    v_b = write_snapshot_partitioned(
        d.filter(F.col("doc_id") % 5 != 0).select(
            "doc_id",
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.lit("[rev2] "), F.col("text"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
            "bucket",
        ),
        base,
        ["bucket"],
    )

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("bucket").cast("bigint").alias("bucket")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.length("text")).cast("bigint").alias("sum_chars"),
        )

    v1 = read_snapshot(spark, base, v_a)
    v2 = read_snapshot(spark, base, v_b)
    v1_roll = rollup(v1)
    # the work list: buckets whose content differs (same diff as
    # snapshot_lineage_files, reduced to the changed set)
    a = v1.select(F.col("doc_id").alias("a_id"), F.md5("text").alias("a_md5"))
    b = v2.select(F.col("doc_id").alias("b_id"), F.md5("text").alias("b_md5"))
    diff = a.join(b, a["a_id"] == b["b_id"], "full_outer").filter(
        F.col("a_id").isNull()
        | F.col("b_id").isNull()
        | (F.col("a_md5") != F.col("b_md5"))
    )
    # the work list is MATERIALIZED, the production shape: the lineage
    # stage emits (bucket, needs_recompute) to disk — 16 rows, the
    # snapshot_lineage_files relation reduced to the planner's input —
    # and the recompute job consumes it from disk. No driver collect
    # (the repo-wide plans-stay-lazy rule), and crucially no
    # self-reference: a work list derived inline from the v2 scan
    # cannot prune that same scan (probed — the DPP rule refuses the
    # cycle), while the disk roundtrip makes the semi join on the
    # PARTITION column a clean dynamicpruning site (pytest-asserted).
    per_bucket = (
        diff.groupBy(
            F.pmod(F.coalesce("a_id", "b_id"), F.lit(16)).cast("int").alias("bucket")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_changed"))
    )
    per_bucket.write.parquet(root + "/worklist")
    # n_changed > 0 is the planner's filter (a comparison, so the DPP
    # rule treats the side as selective — a bare boolean is ignored)
    worklist = (
        spark.read.parquet(root + "/worklist")
        .filter(F.col("n_changed") > 0)
        .select("bucket")
    )
    recomputed = rollup(v2.join(F.broadcast(worklist), "bucket", "left_semi"))
    carried = v1_roll.join(
        F.broadcast(worklist.select(F.col("bucket").cast("bigint").alias("bucket"))),
        "bucket",
        "left_anti",
    )
    return carried.withColumn("recomputed", F.lit(False)).unionByName(
        recomputed.withColumn("recomputed", F.lit(True))
    )
