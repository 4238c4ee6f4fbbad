"""Nested-data surface (SURVEY.md §2.3 A1-A3, §2.9 F10/F12/F13).

The reference's signature move is struct-of-parallel-arrays → rows:
arrays_zip + explode (reference spark_jobs/transform_weather.py:74-95).
The testdata is flat, so the roundtrip is proven in both directions:
rebuild the nested shape with collect_list/transform, then flatten it
back with arrays_zip+explode and recover the original relation exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

# ---------------------------------------------------------------------------
# A1+A2+A3: build struct-of-arrays per user (the weather_raw shape,
# FIXTURES.md §1), then arrays_zip + explode back to rows. The oracle is
# the identity relation — exact recovery proves the roundtrip.
# ---------------------------------------------------------------------------

_ROUNDTRIP_ORACLE = """
SELECT user_id, ts, event_id, event_type, value FROM events
"""


@register("nested_flatten_roundtrip", oracle=_ROUNDTRIP_ORACLE, tags=("A1", "A2", "A3"))
def nested_flatten_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # Nest: one row per user, `daily`-style parallel arrays (sorted for
    # determinism; struct sort orders by ts then event_id).
    nested = (
        ev.groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "event_type", "value"))
            ).alias("series")
        )
        .select(
            "user_id",
            F.transform("series", lambda s: s.ts).alias("ts_arr"),
            F.transform("series", lambda s: s.event_id).alias("id_arr"),
            F.transform("series", lambda s: s.event_type).alias("type_arr"),
            F.transform("series", lambda s: s.value).alias("value_arr"),
        )
    )
    # Flatten: zip the parallel arrays into array<struct>, explode, project
    # nested fields out (transform_weather.py:74-110 recast).
    return (
        nested.select(
            "user_id",
            F.explode(
                F.arrays_zip(
                    F.col("ts_arr").alias("ts"),
                    F.col("id_arr").alias("event_id"),
                    F.col("type_arr").alias("event_type"),
                    F.col("value_arr").alias("value"),
                )
            ).alias("day"),
        )
        .select(
            "user_id",
            F.col("day.ts").alias("ts"),
            F.col("day.event_id").alias("event_id"),
            F.col("day.event_type").alias("event_type"),
            F.col("day.value").alias("value"),
        )
    )


# ---------------------------------------------------------------------------
# F10: JSON field access on the events.props JSON-string column (the raw
# API payload role, reference dags/weather_etl_pipeline.py:75-89).
# ---------------------------------------------------------------------------

_JSON_ORACLE = """
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
  json_extract_string(props, '$.missing') IS NULL AS missing_is_null
FROM events
"""


@register("json_props_extract", oracle=_JSON_ORACLE, tags=("F10",))
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
    )


# ---------------------------------------------------------------------------
# F10c: the Spark 4 VARIANT type — parse_json into the binary
# semi-structured encoding, then typed variant_get path extraction.
# Same answers as the string-path functions above, but the parse
# happens once per row and every extraction reads the compact encoded
# form (the open-format answer to shredding JSON at 100 TB: no
# per-extraction re-parse, and column stats/pushdown apply to the
# extracted columns). Oracle: identical typed extractions in DuckDB
# JSON — VARIANT is an encoding choice, not a semantics change.
# ---------------------------------------------------------------------------

_VARIANT_ORACLE = """
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
  CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS k_doubled,
  json_extract_string(props, '$.missing') IS NULL AS missing_is_null
FROM events
"""


@register("variant_props_extract", oracle=_VARIANT_ORACLE, tags=("F10", "S1"))
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_int"),
        (F.variant_get(v, "$.k", "int") * 2).alias("k_doubled"),
        F.variant_get(v, "$.missing", "string").isNull().alias("missing_is_null"),
    )


# ---------------------------------------------------------------------------
# F10b: full from_json parse with explicit schema — the schema-pinned
# ingest discipline (transform_weather.py:34-59) applied to props.
# ---------------------------------------------------------------------------

_FROMJSON_ORACLE = """
SELECT
  event_id,
  CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed
FROM events
"""


@register("json_schema_parse", oracle=_FROMJSON_ORACLE, tags=("F10", "S1"))
def json_schema_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k BIGINT")
    return ev.select("event_id", parsed.getField("k").alias("k_typed"))


# ---------------------------------------------------------------------------
# F12: array functions over the embedding vectors (scalar outputs keep
# float ops in an explicit, engine-identical order).
# ---------------------------------------------------------------------------

_ARRAY_ORACLE = """
SELECT
  vec_id,
  CAST(LEN(embedding) AS INT) AS dim,
  CAST(embedding[1] AS DOUBLE) AS first_component,
  CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
    + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE) AS head4_sum,
  CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS max_component
FROM embeddings
"""


@register("array_funcs_embeddings", oracle=_ARRAY_ORACLE, tags=("F12",))
def array_funcs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    el = lambda i: F.element_at("embedding", i).cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        el(1).alias("first_component"),
        (el(1) + el(2) + el(3) + el(4)).alias("head4_sum"),
        F.array_max("embedding").cast("double").alias("max_component"),
    )


# ---------------------------------------------------------------------------
# F12b: array construction / slicing / membership returned as arrays
# (testing harness compares nested values structurally).
# ---------------------------------------------------------------------------

_SLICE_ORACLE = """
SELECT
  vec_id,
  CAST(embedding[1:4][1] AS DOUBLE) AS head_1,
  CAST(embedding[1:4][2] AS DOUBLE) AS head_2,
  CAST(embedding[1:4][3] AS DOUBLE) AS head_3,
  CAST(embedding[1:4][4] AS DOUBLE) AS head_4,
  LIST_CONTAINS(embedding, embedding[1]) AS contains_first
FROM embeddings
"""


@register("array_slice_contains", oracle=_SLICE_ORACLE, tags=("F12",))
def array_slice_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array slice + membership (F12b).

    The sliced array is unpacked to scalar DOUBLE columns on BOTH sides:
    the driver's canonicalizer sorts result frames in pandas, which
    cannot hash raw list cells (round-1 CORRECTNESS error), and JSON
    serialization of float32 differs between engines (DuckDB renders the
    full double expansion, Spark the shortest float form). Scalar
    columns only in oracle-checked output.
    """
    e = table(spark, sf_dir, "embeddings")
    sl = F.slice("embedding", 1, 4)
    return e.select(
        "vec_id",
        *[F.element_at(sl, i).cast("double").alias(f"head_{i}") for i in range(1, 5)],
        F.array_contains("embedding", F.element_at("embedding", 1)).alias(
            "contains_first"
        ),
    )


# ---------------------------------------------------------------------------
# F13: map functions — build a map per row, read it back by key.
# ---------------------------------------------------------------------------

_MAP_ORACLE = """
SELECT
  doc_id,
  lang AS lang_from_map,
  source AS source_from_map,
  2 AS map_size
FROM documents
"""


@register("map_funcs", oracle=_MAP_ORACLE, tags=("F13",))
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    m = F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source"))
    return d.select(
        "doc_id",
        F.element_at(m, "lang").alias("lang_from_map"),
        F.element_at(m, "source").alias("source_from_map"),
        F.size(m).cast("int").alias("map_size"),
    )
