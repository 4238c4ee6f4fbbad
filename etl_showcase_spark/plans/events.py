"""Time-series / streaming-twin surface (SURVEY.md §2.10 T1-T7).

The reference's "streaming" is a daily-cron micro-batch with an
idempotent keyed upsert (dags/weather_etl_pipeline.py:123,183-190).
Here: true event-time tumbling/sliding/session windows over `events`,
each as a batch query (oracle-checkable) whose streaming twin lives in
etl_showcase_spark/streaming/jobs.py and is equivalence-tested in
tests/test_streaming.py.

Window alignment notes: Spark's window() starts are epoch-aligned, so
1-day tumbling == DATE_TRUNC('day') and the 7d/1d slide assigns each
event to the 7 day-aligned windows covering it — both reproduced
literally in the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.numeric import dsum, sql_dsum
from ..operators.relational import latest_per_key
from ..registry import register

# ---------------------------------------------------------------------------
# T2: tumbling 1-day window aggregate (the fact table's daily grain,
# reference sql/create_weather_tables.sql:93).
# ---------------------------------------------------------------------------

_TUMBLING_ORACLE = f"""
SELECT
  DATE_TRUNC('day', ts) AS window_start,
  DATE_TRUNC('day', ts) + INTERVAL 1 DAY AS window_end,
  event_type,
  COUNT(*) AS n_events,
  {sql_dsum("value", "total_value")}
FROM events
GROUP BY 1, 2, 3
"""


@register("tumbling_daily_by_type", oracle=_TUMBLING_ORACLE, tags=("T1", "T2", "T5"), bench=True)
def tumbling_daily_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# T3: sliding 7-day window, 1-day slide (v_weekly_trends recomputed per
# day, reference sql/create_weather_tables.sql:151-160).
# ---------------------------------------------------------------------------

_SLIDING_ORACLE = f"""
SELECT
  DATE_TRUNC('day', e.ts) - TO_DAYS(CAST(g.i AS INT)) AS window_start,
  DATE_TRUNC('day', e.ts) - TO_DAYS(CAST(g.i AS INT)) + INTERVAL 7 DAY AS window_end,
  COUNT(*) AS n_events,
  {sql_dsum("e.value", "total_value")}
FROM events e
CROSS JOIN generate_series(0, 6) AS g(i)
GROUP BY 1, 2
"""


@register("sliding_7d_windows", oracle=_SLIDING_ORACLE, tags=("T3",))
def sliding_7d_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "7 days", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# T4: session windows — 30-minute inactivity gap per user. Spark's
# session_window(end = last event + gap) reproduced in SQL with the
# classic lag + cumulative-sum sessionization.
# ---------------------------------------------------------------------------

_SESSION_ORACLE = f"""
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_num
  FROM marked
)
SELECT
  user_id,
  MIN(ts) AS session_start,
  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
  COUNT(*) AS n_events,
  {sql_dsum("value", "total_value")}
FROM sessions
GROUP BY user_id, session_num
"""


@register("session_windows_30m", oracle=_SESSION_ORACLE, tags=("T4",))
def session_windows_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Batch twin of the custom stateful operator
# (streaming/jobs.py:stream_user_profile_state): per-user cross-session
# rollup — event count, exact value total, session count at a 30-minute
# gap. Same new-session rule as session_windows_30m.
# ---------------------------------------------------------------------------

_PROFILE_ORACLE = f"""
WITH marked AS (
  SELECT user_id, value,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_events,
       {sql_dsum("value", "total_value")},
       CAST(SUM(is_new) AS BIGINT) AS n_sessions
FROM marked
GROUP BY user_id
"""


@register("user_session_stats", oracle=_PROFILE_ORACLE, tags=("T4", "W3"))
def user_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # Interval arithmetic (not unix_micros) so the predicate resolves for
    # both TIMESTAMP and TIMESTAMP_NTZ reads of the parquet `ts` column —
    # the driver's untuned session infers naive parquet timestamps as
    # TIMESTAMP_NTZ (Spark 4 default), which unix_micros() rejects. This
    # also exactly mirrors the oracle's `ts - LAG(ts) > INTERVAL` form.
    marked = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    )
    return marked.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "total_value"),
        F.sum("is_new").cast("long").alias("n_sessions"),
    )


# ---------------------------------------------------------------------------
# T6: stateful dedup twin — first event per (user, type), deterministic
# order; the streaming version is dropDuplicatesWithinWatermark.
# ---------------------------------------------------------------------------

_DEDUP_ORACLE = """
SELECT user_id, event_type, ts, event_id
FROM (
  SELECT user_id, event_type, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts ASC, event_id ASC) AS rn
  FROM events
)
WHERE rn = 1
"""


@register("first_event_per_user_type", oracle=_DEDUP_ORACLE, tags=("T6", "W1"))
def first_event_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return latest_per_key(
        ev, ["user_id", "event_type"], [F.col("ts").asc(), F.col("event_id").asc()]
    ).select("user_id", "event_type", "ts", "event_id")


# ---------------------------------------------------------------------------
# T8: stream-stream interval join twin — purchases matched to same-user
# clicks in the preceding hour. The streaming version
# (streaming/jobs.py:stream_click_purchase_join) is a dual-watermark
# stream-stream inner join whose state eviction is bounded by the
# 1-hour interval + watermark; this batch twin is the oracle surface.
# ---------------------------------------------------------------------------

_CLICK_PURCHASE_ORACLE = """
SELECT p.event_id AS purchase_id,
       c.event_id AS click_id,
       p.user_id AS user_id
FROM events p
JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase'
 AND c.event_type = 'click'
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 1 HOUR
ORDER BY purchase_id, click_id
"""


@register("click_purchase_interval_join", oracle=_CLICK_PURCHASE_ORACLE, tags=("J6", "T8"))
def click_purchase_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    return (
        p.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select("purchase_id", "click_id", F.col("p_user").alias("user_id"))
        .orderBy("purchase_id", "click_id")
    )
