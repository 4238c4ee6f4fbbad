#!/usr/bin/env python
"""Standing 2^53 money-boundary ritual (round-12, VERDICT item 4): one
command that (re)builds the value-scaled boundary lake and runs every
money-touching oracle-checked query through the driver contract against
it, writing BOUNDARY_CONTRACT_r{N}.json. Any money-math edit must
re-run this; round 11 proved the class of bug it catches (two latent
1-ULP engine splits invisible at the graded scales).

Query selection is by CONTENT, not by this-round's-edits: every
registered query whose oracle SQL references a scaled money column
(l_extendedprice, o_totalprice, c_acctbal, s_acctbal, events.value) is
swept, so a future money query is in scope the day it lands — the
round-11 set (51 fingerprint-changed queries) is a subset.

Usage:
  python scripts/boundary_sweep.py [--round N] [--lake DIR] [--keep-lake]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

MONEY_COLS = (
    "l_extendedprice",
    "o_totalprice",
    "c_acctbal",
    "s_acctbal",
)
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Defensive completeness contract (round-13, VERDICT item 7): every
# floating/decimal testdata column must be either SWEPT (scaled by the
# boundary lake and regex-selected above) or EXPLICITLY exempted here
# with the reason it cannot drive a sum past 2^53 — so a future table
# or column addition can't silently dodge the sweep.
# events.value is swept via the FROM-events + value regex in
# money_queries(); the four MONEY_COLS via the column regex.
SWEPT_COLS = set(MONEY_COLS) | {"value"}
EXEMPT_NUMERIC_COLS = {
    ("lineitem", "l_quantity"): "unit count 1..50, not money; magnitude growth is row-count-bound and covered by the replica-lake stress",
    ("lineitem", "l_discount"): "fraction in [0, 0.10]; sums bounded by 0.1 * rowcount",
    ("lineitem", "l_tax"): "fraction in [0, 0.08]; sums bounded by 0.08 * rowcount",
    ("part", "p_retailprice"): "bounded ~2e3 per part; consumed only as exact integer cents (~2e5) in rank/bucket queries — 2^53/2e5 > 4e10 parts of headroom",
    ("embeddings", "element"): "unit-scale embedding component; cosine/dot math, not money",
}


def unswept_numeric_columns(sf_dir: str = "/root/testdata/sf0.01") -> list[tuple]:
    """(table, column, type) for every DECIMAL/DOUBLE/FLOAT leaf in the
    testdata lake that is neither swept nor exempted. Must be empty —
    pinned by tests/test_boundary_guard.py."""
    import duckdb

    bad = []
    for t in TABLES:
        rows = duckdb.sql(
            f"SELECT name, type FROM parquet_schema('{sf_dir}/{t}.parquet') "
            "WHERE type LIKE 'DECIMAL%' OR type IN ('DOUBLE', 'FLOAT')"
        ).fetchall()
        for name, typ in rows:
            if name in SWEPT_COLS or (t, name) in EXEMPT_NUMERIC_COLS:
                continue
            bad.append((t, name, typ))
    return bad


def money_queries() -> list[str]:
    from etl_showcase_spark.registry import all_specs

    names = []
    for name, spec in all_specs().items():
        if spec.oracle is None:
            continue
        if re.search(r"\b(" + "|".join(MONEY_COLS) + r")\b", spec.oracle, re.IGNORECASE):
            names.append(name)
            continue
        # events.value: the oracle must read the events table AND touch
        # its (scaled) value column
        if re.search(r"\bFROM\s+events\b|\bJOIN\s+events\b", spec.oracle, re.IGNORECASE) and re.search(
            r"\bvalue\b", spec.oracle, re.IGNORECASE
        ):
            names.append(name)
    return names


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=12)
    ap.add_argument("--lake", default="/tmp/spark_graft_scratch/boundary_lake")
    ap.add_argument(
        "--keep-lake",
        action="store_true",
        help="reuse an existing lake dir instead of rebuilding",
    )
    args = ap.parse_args()

    # 1. (re)build the lake — build_boundary_lake.main() prints the
    #    past-2^53 proof totals; recompute them here for the artifact
    if not (args.keep_lake and os.path.isdir(args.lake)):
        import build_boundary_lake

        sys.argv = ["build_boundary_lake.py", args.lake]
        build_boundary_lake.main()

    import duckdb

    con = duckdb.connect()
    orders_cents = con.execute(
        f"SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS HUGEINT)"
        f" FROM read_parquet('{args.lake}/orders.parquet')"
    ).fetchone()[0]
    revenue_e4 = con.execute(
        f"SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))"
        f" * (1 - CAST(l_discount AS DECIMAL(12,2)))) * 10000 AS HUGEINT)"
        f" FROM read_parquet('{args.lake}/lineitem.parquet')"
    ).fetchone()[0]
    con.close()
    assert abs(orders_cents) > 2**53 and abs(revenue_e4) > 2**53, (
        "lake does not cross the boundary — wrong source or multiplier"
    )

    # 2. run the selected queries through the driver contract on the lake
    names = money_queries()
    print(f"sweeping {len(names)} money-touching queries against {args.lake}")

    from pyspark.sql import SparkSession

    from etl_showcase_spark.caching import release_all
    from etl_showcase_spark.registry import all_specs
    from etl_showcase_spark.testing import compare_frames

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("boundary-sweep")
        .getOrCreate()
    )

    def fresh_duck():
        c = duckdb.connect()
        c.execute("PRAGMA temp_directory='/tmp/duck_spill'")
        for t in TABLES:
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{args.lake}/{t}.parquet')"
            )
        return c

    con = fresh_duck()
    specs = all_specs()
    results: dict[str, str] = {}
    fails = 0
    for name in sorted(names):
        try:
            actual = specs[name].build(spark, args.lake).toPandas()
            expected = con.execute(specs[name].oracle).fetchdf()
            problems = compare_frames(actual, expected)
            if problems:
                fails += 1
                results[name] = f"MISMATCH: {problems}"
            elif len(actual) == 0:
                results[name] = "MATCH (0 rows — vacuous, inspect)"
            else:
                results[name] = "MATCH"
        except Exception as e:
            fails += 1
            results[name] = f"ERROR {type(e).__name__}: {str(e)[:200]}"
            try:
                con.close()
            except Exception:
                pass
            con = fresh_duck()
        print(f"  {name}: {results[name]}")
        release_all()
    spark.stop()

    out = {
        "probe": (
            "standing 2^53 money-boundary sweep: every oracle-checked query "
            "touching a scaled money column, run through the driver contract "
            "against the value-scaled lake whose real sums cross the "
            "DECIMAL->DOUBLE rounding boundary"
        ),
        "lake": {
            "builder": "scripts/build_boundary_lake.py",
            "multiplier": 5997,
            "orders_grand_total_cents": int(orders_cents),
            "lineitem_revenue_scaled_int_x10000": int(revenue_e4),
            "both_past_2pow53": True,
        },
        "selection": (
            "content-based: oracle SQL references l_extendedprice / "
            "o_totalprice / c_acctbal / s_acctbal, or reads events and its "
            "value column (scripts/boundary_sweep.py:money_queries)"
        ),
        "n_queries": len(names),
        "result": "ALL-MATCH" if fails == 0 else f"{fails} FAILURES",
        "queries": results,
    }
    path = os.path.join(REPO, f"BOUNDARY_CONTRACT_r{args.round:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {out['result']} ({len(names)} queries)")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
