"""Static pipeline/plan integrity lint — the reference lints its DAG
files for orchestration hygiene (reference
tests/test_dag_integrity.py:13-105: docstrings, no import *, retries
present, timeout configured); this is the same gate re-targeted at the
Spark engine's plan modules and pipeline runner. Pure source checks, no
SparkSession needed.
"""

from __future__ import annotations

from pathlib import Path

import pytest

PKG = Path(__file__).resolve().parents[1] / "etl_showcase_spark"


def _py_files() -> list[Path]:
    return [p for p in PKG.rglob("*.py") if p.name != "__init__.py"]


def test_package_files_exist():
    assert len(_py_files()) > 10


def test_modules_have_docstrings():
    for p in _py_files():
        stripped = p.read_text().lstrip()
        assert stripped.startswith(('"""', "'''", 'r"""')), (
            f"{p.relative_to(PKG)} missing module docstring"
        )


def test_no_import_star():
    for p in _py_files():
        assert "import *" not in p.read_text(), (
            f"{p.relative_to(PKG)} uses 'import *'"
        )


def test_pipeline_runner_has_retry_and_gate_semantics():
    # the reference's default_args retries + hard-failing quality_check
    # (dags/weather_etl_pipeline.py:38-41,195-215) map to Stage.retries
    # and QualityGateError here — both must stay present
    src = (PKG / "pipeline.py").read_text()
    assert "retries" in src
    assert "retry_delay" in src
    assert "QualityGateError" in src


def test_plans_do_no_datasized_driver_collects():
    # driver-side .collect() in a plan module means the operator is not
    # distributed; every former scalar-subquery collect now rides the
    # plan as a broadcast 1-row aggregate, so NO plan may collect
    for p in (PKG / "plans").glob("*.py"):
        n = p.read_text().count(".collect()")
        assert n == 0, f"{p.name} has {n} .collect() calls — plans must stay lazy"


def test_plans_take_sf_dir_not_hardcoded_paths():
    # every query must read via its sf_dir argument so the driver can
    # point it at any scale factor; a literal testdata path in code
    # (not comments) would pin the scale
    for p in (PKG / "plans").glob("*.py"):
        for i, line in enumerate(p.read_text().splitlines(), 1):
            code = line.split("#", 1)[0]
            assert "/root/testdata" not in code, f"{p.name}:{i} hardcodes a data path"


def test_every_registered_query_is_tagged_and_unique():
    from etl_showcase_spark.registry import all_specs

    specs = all_specs()
    assert len(specs) >= 95
    for name, spec in specs.items():
        assert spec.tags, f"{name} has no SURVEY.md §2 tags"
        assert spec.build is not None


def test_oracle_sql_has_no_wall_clock():
    # wall-clock in oracle-checked output can never hash-match
    from etl_showcase_spark.registry import all_specs

    for name, spec in all_specs().items():
        if spec.oracle:
            low = spec.oracle.lower()
            assert "current_timestamp" not in low and "now()" not in low, (
                f"{name} oracle contains wall-clock"
            )


def test_bench_set_is_oracle_or_property_checked():
    from etl_showcase_spark.registry import all_specs, bench_specs

    specs = all_specs()
    for name in bench_specs():
        assert name in specs


def test_all_specs_is_cached_and_stable():
    # the driver reads queries() order to pick its 50-query check
    # budget; repeated calls must never reshuffle it mid-run
    from etl_showcase_spark import registry

    first = registry.all_specs()
    assert list(first) == list(registry.all_specs())
    assert registry.all_specs() is first  # one computation per process


def test_unproven_order_is_registration_order(monkeypatch):
    # within the unproven group the sort is stable, so with NO blessed
    # fingerprints the order is exactly registration order — protects
    # the driver's check budget from accidental reshuffles
    from etl_showcase_spark import registry

    registry.all_specs()  # ensure plans are loaded
    monkeypatch.setattr(registry, "_stored_fingerprints", dict)
    monkeypatch.setattr(registry, "_SPECS_CACHE", None)
    assert list(registry.all_specs()) == list(registry._REGISTRY)


def test_edited_query_loses_verified_status(monkeypatch):
    # the round-3 loophole: a query edited after its green CORRECTNESS
    # row must RE-QUEUE (sort to the front), not coast on the stale row
    from etl_showcase_spark import registry

    baseline = registry.all_specs()
    pinned = registry._stored_fingerprints()
    assert pinned, "VERIFIED_FINGERPRINTS.json missing or empty"
    # fingerprints must attest to the code actually in the tree
    stale = {
        n: fp
        for n, fp in pinned.items()
        if n in baseline and fp != registry.query_fingerprint(baseline[n])
    }
    assert not stale, f"blessed fingerprints don't match tree: {sorted(stale)}"

    victim = max(pinned)  # any blessed query; max() = deterministic pick
    poisoned = dict(pinned)
    poisoned[victim] = "0" * 32  # simulate an edit after the green row
    monkeypatch.setattr(registry, "_stored_fingerprints", lambda: poisoned)
    monkeypatch.setattr(registry, "_SPECS_CACHE", None)
    reordered = list(registry.all_specs())
    n_unproven = sum(1 for n in baseline if n not in pinned) + 1
    assert reordered.index(victim) < n_unproven, (
        f"{victim} kept verified status despite a content change"
    )


def test_runtime_bloom_filter_injected(spark):
    # the 100 TB star-join knob (session.runtime_filter_conf): with a
    # selective dim and a forced shuffle join, Spark must push a
    # might_contain(xxhash64(key)) runtime filter into the fact scan
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
    )
    from audit_plans import probe_runtime_bloom

    from .conftest import SF_ORACLE

    assert probe_runtime_bloom(spark, SF_ORACLE)


def test_dynamic_partition_pruning_injected(spark):
    # date-partitioned lake + dim filtered on a non-join column: the
    # partition filter only exists at runtime, so the fact scan must
    # carry a dynamicpruning expression (scan one year, not the lake)
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
    )
    from audit_plans import probe_dynamic_partition_pruning

    from .conftest import SF_ORACLE

    assert probe_dynamic_partition_pruning(spark, SF_ORACLE)
