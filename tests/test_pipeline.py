"""Q4/Q5 pipeline runner: golden end-to-end replay of the reference's
extract → validate → transform → load → quality_check chain on the
synthetic lake, plus retry/gate semantics."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from etl_showcase_spark.pipeline import (
    QualityGateError,
    Stage,
    gate,
    run_pipeline,
)

from .conftest import SF_SMOKE


def test_retry_then_success_and_gate_no_retry():
    calls = {"flaky": 0, "gate_runs": 0}

    def flaky(ctx):
        calls["flaky"] += 1
        if calls["flaky"] < 3:
            raise OSError("transient")
        ctx["ok"] = True

    ctx, report = run_pipeline([Stage("flaky", flaky, retries=3)])
    assert ctx["ok"] and report.attempts["flaky"] == 3

    def bad(ctx):
        calls["gate_runs"] += 1
        return False

    with pytest.raises(QualityGateError):
        run_pipeline([gate("g", bad)])
    assert calls["gate_runs"] == 1  # gates never retry


def test_weather_shape_pipeline_end_to_end(spark):
    """The reference dataflow recast: HTTP fan-out extract → cardinality
    gate → struct-of-arrays flatten + derived metrics → partitioned
    merge-upsert load → row-count gate → golden assertions."""
    from etl_showcase_spark.catalog import table
    from etl_showcase_spark.sources.io import (
        WEATHER_RAW_SCHEMA,
        http_fanout_source,
        merge_upsert_partitioned,
        write_partitioned,
    )

    target = tempfile.mkdtemp(prefix="pipe_target_")

    def extract(ctx):
        n = table(spark, SF_SMOKE, "nation")
        urls = n.select(
            F.concat(F.lit("https://api.example.com/v1/forecast?city="), "n_name").alias("url")
        )
        ctx["raw"] = http_fanout_source(urls)

    def transform(ctx):
        parsed = ctx["raw"].select(F.from_json("payload", WEATHER_RAW_SCHEMA).alias("w"))
        flat = parsed.select(
            F.col("w.city").alias("city"),
            F.explode(
                F.arrays_zip(
                    F.col("w.daily.time").alias("time"),
                    F.col("w.daily.temperature_2m_max").alias("tmax"),
                    F.col("w.daily.temperature_2m_min").alias("tmin"),
                )
            ).alias("d"),
        ).select(
            "city",
            F.col("d.time").alias("date"),
            F.round(F.col("d.tmax") - F.col("d.tmin"), 1).alias("temp_range"),
        )
        ctx["fact"] = flat

    def load(ctx):
        first = ctx["fact"].filter(F.col("date") == "2026-01-01")
        write_partitioned(first, target, ["date"])
        rest = ctx["fact"].filter(F.col("date") != "2026-01-01")
        # second landing arrives as an upsert (idempotent re-run shape)
        merge_upsert_partitioned(spark, target, rest, ["city", "date"], "date")
        merge_upsert_partitioned(spark, target, rest, ["city", "date"], "date")
        ctx["loaded"] = spark.read.parquet(target)

    stages = [
        Stage("extract", extract),
        gate("validate", lambda c: c["raw"].count() == 25, "expected 25 cities"),
        Stage("transform", transform),
        Stage("load", load, retries=1),
        gate("quality", lambda c: c["loaded"].count() == 75, "expected 25 cities x 3 days"),
    ]
    ctx, report = run_pipeline(stages)
    assert report.succeeded == ["extract", "validate", "transform", "load", "quality"]
    got = ctx["loaded"]
    # idempotent: double merge left exactly one row per (city, date)
    assert got.groupBy("city", "date").count().filter("count > 1").count() == 0
    # golden value: temp_range is non-negative by construction of the fake feed
    assert got.filter(F.col("temp_range") < 0).count() == 0


def test_observation_gate_single_pass(spark, tmp_path):
    """Quality metrics ride the write action via df.observe — the gate
    reads them without any second pass over the data."""
    from pyspark.sql import functions as F

    from etl_showcase_spark.pipeline import (
        QualityGateError,
        Stage,
        observation_gate,
        observe_quality,
        run_pipeline,
    )

    df = spark.range(100).withColumn(
        "v", F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id"))
    )
    observed, obs = observe_quality(
        df,
        "load_metrics",
        {"n_rows": F.count(F.lit(1)), "n_null_v": F.count_if(F.col("v").isNull())},
    )

    out = str(tmp_path / "obs_out")

    def load(ctx):
        observed.write.mode("overwrite").parquet(out)

    ctx, report = run_pipeline(
        [
            Stage("load", load),
            observation_gate("rows_present", obs, lambda m: m["n_rows"] > 0),
        ]
    )
    assert report.succeeded == ["load", "rows_present"]
    assert obs.get == {"n_rows": 100, "n_null_v": 10}

    # a failing gate raises QualityGateError with the metrics in hand
    df2, obs2 = observe_quality(
        spark.range(5), "empty_check", {"n": F.count_if(F.col("id") > 100)}
    )
    import pytest

    with pytest.raises(QualityGateError):
        run_pipeline(
            [
                Stage("act", lambda ctx: (df2.count(), None)[1]),
                observation_gate("nonzero", obs2, lambda m: m["n"] > 0),
            ]
        )
