"""The primary correctness gate: every registered query vs its DuckDB
oracle at the driver's correctness scale factor (sf0.01), exactly as the
driver's verify does (SURVEY.md §5.3)."""

from __future__ import annotations

import pytest

from etl_showcase_spark.registry import all_specs
from etl_showcase_spark.testing import compare_frames

from .conftest import SF_ORACLE

SPECS = all_specs()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck, name):
    spec = SPECS[name]
    actual = spec.build(spark, SF_ORACLE).toPandas()
    expected = duck.execute(spec.oracle).fetchdf()
    problems = compare_frames(actual, expected)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(spark, name):
    spec = SPECS[name]
    df = spec.build(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
