"""Query registry: the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers here as a
QuerySpec carrying BOTH its Spark builder and its DuckDB-oracle ANSI SQL
twin, so the two stay in sync in one place. ``__spark_entry__.py`` just
re-exports this registry.

Oracle-parity ground rules (SURVEY.md §7.4):
- alias every computed column identically in Spark and SQL;
- money math goes through exact DECIMAL (functions/numeric.py) so
  aggregates are bit-identical regardless of partition order;
- every ranking has a deterministic total-order tie-break;
- no wall-clock (current_timestamp) columns in oracle-checked output.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # part of the bench.py headline set


_REGISTRY: dict[str, QuerySpec] = {}

# plans modules self-register on import
_PLAN_MODULES = (
    "etl_showcase_spark.plans.core",
    "etl_showcase_spark.plans.joins",
    "etl_showcase_spark.plans.windows",
    "etl_showcase_spark.plans.nested",
    "etl_showcase_spark.plans.events",
    "etl_showcase_spark.plans.pipeline_ops",
    "etl_showcase_spark.plans.llm_text",
    "etl_showcase_spark.plans.llm_vector",
    "etl_showcase_spark.plans.multimodal",
    "etl_showcase_spark.plans.ingest",
    "etl_showcase_spark.plans.analytics",
    "etl_showcase_spark.plans.curation",
)


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, tuple(tags), bench)
        return fn

    return deco


def _ensure_loaded() -> None:
    for mod in _PLAN_MODULES:
        importlib.import_module(mod)


def all_specs() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {n: s.build for n, s in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in all_specs().items() if s.oracle is not None}


def bench_specs() -> dict[str, QuerySpec]:
    return {n: s for n, s in all_specs().items() if s.bench}
