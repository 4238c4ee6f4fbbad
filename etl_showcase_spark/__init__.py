"""etl_showcase_spark — a PySpark-native analytics engine.

Re-expresses the full query/data-processing capability surface of the
reference ETL pipeline (clarklwilliamson/etl-showcase: Airflow + Spark +
Postgres weather warehouse) as an idiomatic PySpark library, extended
with LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Layout:
  session    — SparkSession builder (scale-tuned defaults)
  catalog    — parquet table loading / temp-view registration
  registry   — QuerySpec registry: every operator ships a Spark builder
               plus a DuckDB-oracle ANSI SQL twin, kept side by side
  functions/ — numeric (decimal-stable agg), vector, text helpers
  operators/ — reusable DataFrame->DataFrame ops (merge, windows, dedup...)
  plans/     — registered queries over the driver testdata
  streaming/ — Structured Streaming jobs over the events table
"""

__version__ = "0.1.0"
