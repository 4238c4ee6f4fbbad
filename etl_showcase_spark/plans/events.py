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


# ---------------------------------------------------------------------------
# W3/G7 cohort retention ([EXT] — the classic product-analytics rollup:
# users cohorted by first-active ISO week, retention = distinct active
# users per (cohort_week, week_offset)). Shuffle story: ONE wide
# shuffle on user_id produces both the cohort assignment and the
# per-user active-week set (groupBy user + collect_set), the explode is
# map-side, and the final rollup groups ~|weeks|^2 rows — at 100 TB the
# fact table crosses the network once, keyed by user.
# ---------------------------------------------------------------------------

_COHORT_ORACLE = """
WITH wk AS (
  SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', ts) AS DATE) AS week FROM events
),
coh AS (SELECT user_id, MIN(week) AS cohort_week FROM wk GROUP BY user_id),
act AS (
  SELECT c.cohort_week,
         CAST(DATE_DIFF('day', c.cohort_week, w.week) // 7 AS INT) AS week_offset
  FROM wk w JOIN coh c USING (user_id)
),
ret AS (
  SELECT cohort_week, week_offset, COUNT(*) AS n_active
  FROM act GROUP BY 1, 2
)
SELECT cohort_week, week_offset, n_active,
       MAX(CASE WHEN week_offset = 0 THEN n_active END)
         OVER (PARTITION BY cohort_week) AS cohort_size,
       CAST(n_active AS DOUBLE)
         / CAST(MAX(CASE WHEN week_offset = 0 THEN n_active END)
                OVER (PARTITION BY cohort_week) AS DOUBLE) AS retention_pct
FROM ret
"""


@register("cohort_retention", oracle=_COHORT_ORACLE, tags=("W3", "G7"))
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    wk = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    )
    # one shuffle on user_id: cohort week AND the distinct active-week
    # set come out of the same hash aggregate
    per_user = wk.groupBy("user_id").agg(
        F.min("week").alias("cohort_week"),
        F.collect_set("week").alias("__weeks"),
    )
    act = per_user.select(
        "cohort_week", F.explode("__weeks").alias("week")
    ).select(
        "cohort_week",
        (F.datediff("week", "cohort_week") / 7).cast("int").alias("week_offset"),
    )
    ret = act.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    w = Window.partitionBy("cohort_week")
    size = F.max(F.when(F.col("week_offset") == 0, F.col("n_active"))).over(w)
    return ret.select(
        "cohort_week",
        "week_offset",
        "n_active",
        size.alias("cohort_size"),
        (F.col("n_active").cast("double") / size.cast("double")).alias(
            "retention_pct"
        ),
    )


# ---------------------------------------------------------------------------
# G8/P10 z-score outlier detection ([EXT] — per-event-type standardized
# anomaly flagging). Mean/variance come from ORDER-INDEPENDENT exact
# decimal sums (functions/numeric.py pattern: sum, sum-of-squares and
# count are decimal/integer-exact, so the final double mean/std are
# bit-identical in any engine at any partition count); the per-type
# stats frame is tiny and broadcast back onto the facts, so the fact
# table never shuffles — the whole operator is one partial+final agg
# plus a map-side join.
# ---------------------------------------------------------------------------

# (ss uses sql_d2d: the scale-4 squared sum's scaled integer crosses the
# 2^53 single-rounding boundary around sf1 — see functions/numeric.py)
from ..functions.numeric import sql_d2d as _sql_d2d  # noqa: E402

_ZSCORE_ORACLE = f"""
WITH st AS (
  SELECT event_type,
         COUNT(value) AS n,
         (CAST(FLOOR(SUM(CAST(value AS DECIMAL(12,2)))) AS DOUBLE) + CAST((SUM(CAST(value AS DECIMAL(12,2)))) - FLOOR(SUM(CAST(value AS DECIMAL(12,2)))) AS DOUBLE)) AS s,
         {_sql_d2d("SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2)))")} AS ss
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       (e.value - st.s / st.n)
         / SQRT(st.ss / st.n - (st.s / st.n) * (st.s / st.n)) AS zscore
FROM events e JOIN st USING (event_type)
WHERE st.n >= 2
  AND st.ss / st.n - (st.s / st.n) * (st.s / st.n) > 0
  AND ABS((e.value - st.s / st.n)
          / SQRT(st.ss / st.n - (st.s / st.n) * (st.s / st.n))) > 3
"""


@register("zscore_outlier_events", oracle=_ZSCORE_ORACLE, tags=("G8", "P10", "J1"))
def zscore_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import d2d, dec2

    ev = table(spark, sf_dir, "events")
    st = ev.groupBy("event_type").agg(
        F.count("value").alias("__n"),
        d2d(F.sum(dec2("value")), "__s"),
        d2d(F.sum(dec2("value") * dec2("value")), "__ss"),
    )
    mean = F.col("__s") / F.col("__n")
    var = F.col("__ss") / F.col("__n") - mean * mean
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        ev.join(F.broadcast(st), "event_type")
        .filter((F.col("__n") >= 2) & (var > 0) & (F.abs(z) > 3))
        .select("event_id", "event_type", "value", z.alias("zscore"))
    )


# ---------------------------------------------------------------------------
# W1/G1 OHLC bars ([EXT] — the finance-style daily rollup: per (day,
# event_type) open/high/low/close of `value`). Open/close are
# first/last BY EVENT TIME with event_id as the total-order tie-break
# (same determinism discipline as every ranking here); both engines
# compute them as rank-1 rows from the same window, so the result is
# bit-identical. One shuffle on (day, type); high/low/volume ride the
# same hash aggregate.
# ---------------------------------------------------------------------------

_OHLC_ORACLE = f"""
WITH e AS (
  SELECT DATE_TRUNC('day', ts) AS day, event_type, value, ts, event_id FROM events
),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY day, event_type
                            ORDER BY ts, event_id) AS rn_open,
         ROW_NUMBER() OVER (PARTITION BY day, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn_close
  FROM e
)
SELECT day, event_type,
       MAX(CASE WHEN rn_open = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_close = 1 THEN value END) AS close,
       COUNT(*) AS n_events,
       {sql_dsum("value", "volume")}
FROM r GROUP BY day, event_type
"""


@register("ohlc_daily_bars", oracle=_OHLC_ORACLE, tags=("W1", "G1", "T2"))
def ohlc_daily_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type",
        "value",
        "ts",
        "event_id",
    )
    w_open = Window.partitionBy("day", "event_type").orderBy("ts", "event_id")
    w_close = Window.partitionBy("day", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    r = ev.withColumn("rn_open", F.row_number().over(w_open)).withColumn(
        "rn_close", F.row_number().over(w_close)
    )
    return r.groupBy("day", "event_type").agg(
        F.max(F.when(F.col("rn_open") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_close") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "volume"),
    )


# ---------------------------------------------------------------------------
# W4 gap filling / forward fill ([EXT] — the time-series repair step:
# a dense day spine per event type, daily totals left-joined on, and
# missing days forward-filled with the last observed total). The
# spine is sequence()+explode over each type's own [min_day, max_day]
# — no driver dates; the fill is last(ignorenulls) over an
# unbounded-preceding window, evaluated per type partition (one
# shuffle at the type grain, already reduced).
# ---------------------------------------------------------------------------

_GAPFILL_ORACLE = f"""
WITH daily AS (
  SELECT event_type, DATE_TRUNC('day', ts) AS day,
         {sql_dsum("value", "day_total")}
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(day) AS lo, MAX(day) AS hi FROM daily GROUP BY 1
),
spine AS (
  SELECT b.event_type, t.day
  FROM bounds b, UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS t(day)
)
SELECT s.event_type, s.day,
       d.day_total IS NOT NULL AS observed,
       LAST_VALUE(d.day_total IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS filled_total
FROM spine s LEFT JOIN daily d
  ON s.event_type = d.event_type AND s.day = d.day
"""


@register("gapfill_daily_totals", oracle=_GAPFILL_ORACLE, tags=("W4", "F4", "A2"))
def gapfill_daily_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(dsum("value", "day_total"))
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("__lo"), F.max("day").alias("__hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence("__lo", "__hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.col("day_total").isNotNull().alias("observed"),
            F.last("day_total", ignorenulls=True).over(w).alias("filled_total"),
        )
    )


# ---------------------------------------------------------------------------
# W3 path analysis ([EXT] — the behavioral-sequence rollup: each
# user's event stream in (ts, event_id) order yields sliding 3-event
# paths via lead(); the corpus-wide path frequencies rank the most
# common funnels. One shuffle on user_id for the sequence windows,
# one reduced-grain count; ranking tie-breaks on the path string for
# a deterministic total order.
# ---------------------------------------------------------------------------

_PATHS_ORACLE = """
WITH s AS (
  SELECT user_id, event_type,
         LEAD(event_type, 1) OVER w AS e2,
         LEAD(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
paths AS (
  SELECT event_type || '>' || e2 || '>' || e3 AS path
  FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
),
counted AS (SELECT path, COUNT(*) AS n_paths FROM paths GROUP BY path)
SELECT path, n_paths, CAST(rnk AS INT) AS rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY n_paths DESC, path ASC) AS rnk
  FROM counted
)
WHERE rnk <= 20
"""


@register("event_path_trigrams", oracle=_PATHS_ORACLE, tags=("W3", "O3"))
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("__e2"),
        F.lead("event_type", 2).over(w).alias("__e3"),
    ).filter(F.col("__e2").isNotNull() & F.col("__e3").isNotNull())
    counted = s.select(
        F.concat_ws(">", "event_type", "__e2", "__e3").alias("path")
    ).groupBy("path").agg(F.count(F.lit(1)).alias("n_paths"))
    # global top-k as TakeOrdered (orderBy+limit) — see
    # token_cooccurrence_pairs; the rank window then runs on <= 20 rows
    topk = counted.orderBy(F.desc("n_paths"), F.asc("path")).limit(20)
    wr = Window.orderBy(F.desc("n_paths"), F.asc("path"))
    return topk.withColumn("rnk", F.row_number().over(wr).cast("int"))


# ---------------------------------------------------------------------------
# W3 gaps-and-islands / streak detection ([EXT] — longest run of
# CONSECUTIVE active days per user, the canonical island idiom:
# day - row_number() is constant within a consecutive run, so one
# dense per-user day list + one window + two grouped counts finds
# every streak with no self-join. Both shuffles run at reduced grain
# (distinct user-days, then user-islands).
# ---------------------------------------------------------------------------

_STREAK_ORACLE = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(DATE_TRUNC('day', ts) AS DATE) AS day FROM events
),
r AS (
  SELECT user_id, day,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
  FROM d
),
islands AS (
  SELECT user_id, day - TO_DAYS(CAST(rn AS INT)) AS grp, COUNT(*) AS streak_len,
         MIN(day) AS streak_start
  FROM r GROUP BY user_id, grp
)
SELECT user_id,
       CAST(MAX(streak_len) AS INT) AS longest_streak_days,
       MIN(CASE WHEN streak_len = ms THEN streak_start END) AS best_streak_start,
       CAST(COUNT(*) AS INT) AS n_streaks
FROM (SELECT *, MAX(streak_len) OVER (PARTITION BY user_id) AS ms FROM islands)
GROUP BY user_id
"""


@register("activity_streaks", oracle=_STREAK_ORACLE, tags=("W3", "G7"))
def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    d = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).distinct()
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("day"))
    r = d.withColumn("__rn", rn)
    islands = r.groupBy(
        "user_id", F.date_sub("day", F.col("__rn")).alias("__grp")
    ).agg(
        F.count(F.lit(1)).alias("streak_len"), F.min("day").alias("streak_start")
    )
    ms = F.max("streak_len").over(Window.partitionBy("user_id"))
    return (
        islands.withColumn("__ms", ms)
        .groupBy("user_id")
        .agg(
            F.max("streak_len").cast("int").alias("longest_streak_days"),
            F.min(
                F.when(F.col("streak_len") == F.col("__ms"), F.col("streak_start"))
            ).alias("best_streak_start"),
            F.count(F.lit(1)).cast("int").alias("n_streaks"),
        )
    )


# ---------------------------------------------------------------------------
# G8/P10 robust outliers via MAD ([EXT] — the median-based sibling of
# zscore_outlier_events: median and median-absolute-deviation are
# immune to the very outliers they hunt, the standard robust
# alternative when the mean/stddev gate is polluted). Two reduced
# aggregation passes (median, then median of |x-med|), each joined
# back broadcast so facts never shuffle; exact-percentile parity is
# engine-identical (same interpolation on the same sorted doubles —
# proven by quantiles_quantity). The 1.4826 normal-consistency factor
# is deliberately omitted: the threshold is 6·MAD directly, keeping
# every comparison on raw engine-identical arithmetic.
# ---------------------------------------------------------------------------

_MAD_ORACLE = """
WITH med AS (
  SELECT event_type, MEDIAN(value) AS med FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, MEDIAN(ABS(e.value - m.med)) AS mad
  FROM events e JOIN med m USING (event_type) GROUP BY e.event_type
)
SELECT e.event_id, e.event_type, e.value,
       m.med AS type_median, d.mad AS type_mad
FROM events e
JOIN med m USING (event_type)
JOIN mad d USING (event_type)
WHERE d.mad > 0 AND ABS(e.value - m.med) > 6 * d.mad
"""


@register("mad_outlier_events", oracle=_MAD_ORACLE, tags=("G8", "P10", "J1"))
def mad_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("median(value)").alias("type_median")
    )
    dev = ev.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type").agg(
        F.expr("median(abs(value - type_median))").alias("type_mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(
            (F.col("type_mad") > 0)
            & (F.abs(F.col("value") - F.col("type_median")) > 6 * F.col("type_mad"))
        )
        .select("event_id", "event_type", "value", "type_median", "type_mad")
    )


# ---------------------------------------------------------------------------
# J4/T8 interval-EXISTS conversion rate ([EXT] — the product funnel
# KPI: of each day's purchases, how many had a same-user view in the
# preceding hour). The EXISTS is a LEFT SEMI join with a time-band
# condition (the interval-join state shape, batch form); the daily
# rollup is exact integers + one double division. The semi join keeps
# the purchase side slim — no view columns survive the match.
# ---------------------------------------------------------------------------

_CONVERSION_ORACLE = """
WITH p AS (
  SELECT event_id, user_id, ts, DATE_TRUNC('day', ts) AS day
  FROM events WHERE event_type = 'purchase'
),
v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
conv AS (
  SELECT p.day, p.event_id
  FROM p
  WHERE EXISTS (
    SELECT 1 FROM v
    WHERE v.user_id = p.user_id
      AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
  )
)
SELECT p.day,
       COUNT(*) AS n_purchases,
       COUNT(c.event_id) AS n_converted,
       CAST(COUNT(c.event_id) AS DOUBLE) / COUNT(*) AS conversion_rate
FROM p LEFT JOIN conv c ON p.day = c.day AND p.event_id = c.event_id
GROUP BY p.day
"""


@register("daily_view_purchase_conversion", oracle=_CONVERSION_ORACLE, tags=("J4", "T8", "G6"))
def daily_view_purchase_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.date_trunc("day", F.col("ts")).alias("day")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    converted = p.join(
        v,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("ts") >= F.col("v_ts"))
        & (F.col("ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_semi",
    ).select("day", "event_id")
    daily_p = p.groupBy("day").agg(F.count(F.lit(1)).alias("n_purchases"))
    daily_c = converted.groupBy("day").agg(F.count(F.lit(1)).alias("n_converted"))
    return (
        daily_p.join(daily_c, "day", "left")
        .select(
            "day",
            "n_purchases",
            F.coalesce("n_converted", F.lit(0)).alias("n_converted"),
            (
                F.coalesce("n_converted", F.lit(0)).cast("double")
                / F.col("n_purchases").cast("double")
            ).alias("conversion_rate"),
        )
    )


# ---------------------------------------------------------------------------
# G8 robust stats, part 3 ([EXT] — winsorization, completing the
# z-score / MAD trio): clamp each event type's values at its exact
# p10/p90 and report the winsorized mean. Exactness discipline
# (hardened in round 11 — the money-boundary lake caught the old
# interpolated spelling): type-7 quantiles at q = k/10 are EXACT
# RATIONALS over integer cents — pos = (n-1)·k/10, so
# p = lo + (hi-lo)·((k·(n-1)) mod 10)/10 has an exact MILLI-CENT
# integer representation. Thresholds are therefore pure bigint
# arithmetic, every tail comparison is an exact integer compare
# (cents·10 vs milli-cents), and the reported double is ONE identical
# int→double cast + division in both engines — engine-identical by
# construction, not by interpolation luck (Spark's (1-g)·lo + g·hi
# and DuckDB's lo + (hi-lo)·g round differently off clean values).
# The middle mass is summed in DECIMAL (order-proof, d2d cast); the
# clamped tails contribute count×threshold — fixed arithmetic over
# exact aggregates. Scale: the rank selection is a per-type window
# (partition-bounded), facts shuffle once, thresholds broadcast.
# ---------------------------------------------------------------------------

_WINSOR_ORACLE = """
WITH c AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM events
),
ranked AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM c
),
th AS (
  SELECT event_type, MAX(n) AS n,
         MAX(CASE WHEN rn = (n-1)//10 + 1 THEN cents END) AS lo10,
         MAX(CASE WHEN rn = LEAST((n-1)//10 + 2, n) THEN cents END) AS hi10,
         MAX(CASE WHEN rn = (9*(n-1))//10 + 1 THEN cents END) AS lo90,
         MAX(CASE WHEN rn = LEAST((9*(n-1))//10 + 2, n) THEN cents END) AS hi90
  FROM ranked GROUP BY event_type
),
q AS (
  SELECT event_type,
         lo10*10 + (hi10-lo10) * ((n-1) % 10) AS p10_mc,
         lo90*10 + (hi90-lo90) * ((9*(n-1)) % 10) AS p90_mc
  FROM th
)
SELECT e.event_type,
       COUNT(*) AS n_events,
       COUNT(*) FILTER (WHERE e.cents*10 < q.p10_mc) AS n_low,
       COUNT(*) FILTER (WHERE e.cents*10 > q.p90_mc) AS n_high,
       CAST(q.p10_mc AS DOUBLE) / 1000.0 AS p10,
       CAST(q.p90_mc AS DOUBLE) / 1000.0 AS p90,
       ((CAST(FLOOR(SUM(CASE WHEN e.cents*10 >= q.p10_mc AND e.cents*10 <= q.p90_mc THEN CAST(e.cents AS DECIMAL(20,0)) * CAST('0.01' AS DECIMAL(3,2)) END)) AS DOUBLE) + CAST((SUM(CASE WHEN e.cents*10 >= q.p10_mc AND e.cents*10 <= q.p90_mc THEN CAST(e.cents AS DECIMAL(20,0)) * CAST('0.01' AS DECIMAL(3,2)) END)) - FLOOR(SUM(CASE WHEN e.cents*10 >= q.p10_mc AND e.cents*10 <= q.p90_mc THEN CAST(e.cents AS DECIMAL(20,0)) * CAST('0.01' AS DECIMAL(3,2)) END)) AS DOUBLE))
        + COUNT(*) FILTER (WHERE e.cents*10 < q.p10_mc) * (CAST(q.p10_mc AS DOUBLE) / 1000.0)
        + COUNT(*) FILTER (WHERE e.cents*10 > q.p90_mc) * (CAST(q.p90_mc AS DOUBLE) / 1000.0))
       / COUNT(*) AS winsorized_mean
FROM c e JOIN q USING (event_type)
GROUP BY e.event_type, q.p10_mc, q.p90_mc
"""


@register("winsorized_event_stats", oracle=_WINSOR_ORACLE, tags=("G8", "G1", "J1"))
def winsorized_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import d2d, dec2

    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    c = ev.select(
        "event_type", (dec2("value") * 100).cast("bigint").alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("cents")
    wn = Window.partitionBy("event_type")
    ranked = c.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    th = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max(F.when(F.expr("rn = (n-1) div 10 + 1"), F.col("cents"))).alias("lo10"),
        F.max(
            F.when(F.expr("rn = least((n-1) div 10 + 2, n)"), F.col("cents"))
        ).alias("hi10"),
        F.max(
            F.when(F.expr("rn = (9*(n-1)) div 10 + 1"), F.col("cents"))
        ).alias("lo90"),
        F.max(
            F.when(F.expr("rn = least((9*(n-1)) div 10 + 2, n)"), F.col("cents"))
        ).alias("hi90"),
    )
    q = th.select(
        "event_type",
        (
            F.col("lo10") * 10
            + (F.col("hi10") - F.col("lo10")) * F.pmod(F.col("n") - 1, F.lit(10))
        ).alias("p10_mc"),
        (
            F.col("lo90") * 10
            + (F.col("hi90") - F.col("lo90"))
            * F.pmod(9 * (F.col("n") - 1), F.lit(10))
        ).alias("p90_mc"),
    )
    j = c.join(F.broadcast(q), "event_type")
    dec_cents = F.col("cents").cast("decimal(20,0)") * F.lit("0.01").cast(
        "decimal(3,2)"
    )
    return (
        j.groupBy("event_type", "p10_mc", "p90_mc")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("cents") * 10 < F.col("p10_mc"), 1)).alias("n_low"),
            F.count(F.when(F.col("cents") * 10 > F.col("p90_mc"), 1)).alias(
                "n_high"
            ),
            d2d(
                F.sum(
                    F.when(
                        (F.col("cents") * 10 >= F.col("p10_mc"))
                        & (F.col("cents") * 10 <= F.col("p90_mc")),
                        dec_cents,
                    )
                ),
                "__mid",
            ),
        )
        .select(
            "event_type",
            "n_events",
            "n_low",
            "n_high",
            (F.col("p10_mc").cast("double") / 1000.0).alias("p10"),
            (F.col("p90_mc").cast("double") / 1000.0).alias("p90"),
            (
                (
                    F.col("__mid")
                    + F.col("n_low") * (F.col("p10_mc").cast("double") / 1000.0)
                    + F.col("n_high") * (F.col("p90_mc").cast("double") / 1000.0)
                )
                / F.col("n_events")
            ).alias("winsorized_mean"),
        )
    )


# ---------------------------------------------------------------------------
# W3/G6 three-step funnel ([EXT] — the canonical product-analytics
# funnel: view → click → purchase, each step strictly after the
# user's previous step). Deterministic by construction: every step is
# a per-user MIN timestamp (first view, first click at/after it,
# first purchase at/after that), so the whole funnel is exact and
# SQL-replayable. One shuffle on user_id (two Window passes over the
# same partitioning — no second exchange), then a reduced cohort-day
# rollup; conversion is one double division of exact counts.
# ---------------------------------------------------------------------------

_FUNNEL3_ORACLE = """
WITH u AS (
  SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS v1
  FROM events GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS c1
  FROM events e JOIN u ON u.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts >= u.v1
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS p1
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.c1
  GROUP BY e.user_id
)
SELECT CAST(u.v1 AS DATE) AS cohort_day,
       COUNT(*) AS n_viewed,
       COUNT(c.c1) AS n_clicked,
       COUNT(p.p1) AS n_purchased,
       COUNT(p.p1) * 1.0 / COUNT(*) AS full_conversion
FROM u
LEFT JOIN c ON c.user_id = u.user_id
LEFT JOIN p ON p.user_id = u.user_id
WHERE u.v1 IS NOT NULL
GROUP BY 1
"""


@register("funnel_view_click_purchase", oracle=_FUNNEL3_ORACLE, tags=("W3", "G6", "J5"))
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    # pass 1: first view per user rides every row of that user
    v1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    with_v1 = ev.withColumn("__v1", v1)
    # pass 2 (same partitioning — Catalyst reuses the exchange):
    # first click at/after the first view, then first purchase after it
    c1 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") >= F.col("__v1")),
            F.col("ts"),
        )
    ).over(w)
    with_c1 = with_v1.withColumn("__c1", c1)
    p1 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("__c1")),
            F.col("ts"),
        )
    ).over(w)
    per_user = (
        with_c1.withColumn("__p1", p1)
        .groupBy("user_id")
        .agg(
            F.first("__v1").alias("v1"),
            F.first("__c1").alias("c1"),
            F.first("__p1").alias("p1"),
        )
        .filter(F.col("v1").isNotNull())
    )
    return per_user.groupBy(F.col("v1").cast("date").alias("cohort_day")).agg(
        F.count(F.lit(1)).alias("n_viewed"),
        F.count("c1").alias("n_clicked"),
        F.count("p1").alias("n_purchased"),
        (F.count("p1") * F.lit(1.0) / F.count(F.lit(1))).alias("full_conversion"),
    )


# ---------------------------------------------------------------------------
# T2/W-family strict ordered funnel ([EXT] — the windowFunnel
# conversion question every product-analytics engine answers: of the
# users who VIEWED, how many then CLICKED, then PURCHASED, strictly in
# order and all within one hour of the first view). Pure conditional
# aggregation — three filtered keyed MIN-aggs chained by join, no UDF
# and no per-user sort: each stage is a map-side-combinable agg plus a
# user-keyed join, so the plan is three linear passes at any scale.
# Timestamp comparisons stay in interval arithmetic (timestamp-type-
# agnostic, see module notes). Distinct from cogroup_user_funnel,
# which exercises the cogrouped-UDF surface for per-user stats; this
# is the JVM-only ordered-sequence conversion count.
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(v.t1) AS t1, MIN(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1
    AND e.ts <= v.t1 + INTERVAL 1 HOUR
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
    AND e.ts <= c.t1 + INTERVAL 1 HOUR
  GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view_users,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click_users,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase_users,
       CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
         / (SELECT COUNT(*) FROM v) AS click_through,
       CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
         / (SELECT COUNT(*) FROM v) AS purchase_through
"""


@register("event_funnel_conversion", oracle=_FUNNEL_ORACLE, tags=("T2", "G5"))
def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    hour = F.expr("INTERVAL 1 HOUR")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + hour))
        .groupBy("user_id")
        .agg(F.min("t1").alias("t1"), F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t1") + hour))
        .groupBy("user_id")
        .agg(F.lit(1).alias("_one"))
    )
    nv = v.agg(F.count(F.lit(1)).cast("bigint").alias("n_view_users"))
    nc = c.agg(F.count(F.lit(1)).cast("bigint").alias("n_click_users"))
    np_ = p.agg(F.count(F.lit(1)).cast("bigint").alias("n_purchase_users"))
    return (
        nv.crossJoin(nc)
        .crossJoin(np_)
        .select(
            "n_view_users",
            "n_click_users",
            "n_purchase_users",
            (F.col("n_click_users").cast("double") / F.col("n_view_users")).alias(
                "click_through"
            ),
            (F.col("n_purchase_users").cast("double") / F.col("n_view_users")).alias(
                "purchase_through"
            ),
        )
    )
