"""Structured Streaming jobs over the events table (SURVEY.md §2.10).

The reference's daily-cron + idempotent-upsert loop (reference
dags/weather_etl_pipeline.py:123,169-192) maps to: file-source
readStream → event-time windows + watermark → exactly-once sink via
foreachBatch merge. Each job runs with Trigger.availableNow (the T1
micro-batch trigger) so batch replays are deterministic and the results
can be asserted against the batch twins in plans/events.py.

At scale these are the same plans Spark runs continuously: watermark
state eviction bounds memory; the foreachBatch merge pairs with dynamic
partition overwrite for idempotent re-delivery.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.numeric import dsum

# Explicit source schema (schema-pinned ingest, reference
# spark_jobs/transform_weather.py:34-59). ts arrives as raw parquet
# NANOS int64 (read via nanosAsLong) and is truncated to micros exactly
# like the batch catalog does.
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The streaming file source requires a directory; select just the
    # events file out of the testdata dir with a glob filter.
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def _run_available_now(result: DataFrame, name: str) -> DataFrame:
    """Run a streaming frame to completion into a memory sink, return
    the materialized table (complete mode → final state)."""
    spark = result.sparkSession
    qname = f"{name}_{uuid.uuid4().hex[:8]}"
    q = (
        result.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)


def stream_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1+T2+T5: tumbling 1-day window counts with a 1-hour watermark."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
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
    return _run_available_now(agg, "stream_tumbling")


def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4+T5: 30-minute-gap session windows per user with watermark."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
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
    return _run_available_now(agg, "stream_sessions")


def stream_dedup_first_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: stateful dedup on (user_id, event_type) within the watermark.

    Streaming dropDuplicates keeps the FIRST arrival per key; with a
    single ordered source file this matches the batch
    first_event_per_user_type twin on the keyset (arrival order within
    a micro-batch is partition order, so only the keyset is contracted).
    """
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    dedup = ev.dropDuplicatesWithinWatermark(["user_id", "event_type"]).select(
        "user_id", "event_type", "ts", "event_id"
    )
    spark_q = dedup.writeStream.format("memory")
    qname = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = spark_q.queryName(qname).outputMode("append").trigger(availableNow=True).start()
    q.awaitTermination()
    return ev.sparkSession.table(qname)


def stream_upsert_to_parquet(
    spark: SparkSession, sf_dir: str, target_dir: str, checkpoint_dir: str
) -> None:
    """T7: exactly-once-style sink — foreachBatch keyed merge into a
    parquet target (the ON CONFLICT upsert of
    dags/weather_etl_pipeline.py:174-190 as a streaming sink).

    Each micro-batch merges on (window_start, event_type): rows for
    already-present keys are replaced, new keys appended — idempotent
    under batch replay, which is what checkpoint + availableNow give us.
    """
    from ..operators.relational import merge_upsert

    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        try:
            target = s.read.parquet(target_dir)
            merged = merge_upsert(target, batch_df, ["window_start", "event_type"])
        except Exception:  # first batch: no target yet
            merged = batch_df
        merged.write.mode("overwrite").parquet(target_dir + "_tmp")
        s.read.parquet(target_dir + "_tmp").write.mode("overwrite").parquet(target_dir)

    q = (
        agg.writeStream.foreachBatch(merge_batch)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
