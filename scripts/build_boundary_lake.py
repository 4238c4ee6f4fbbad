#!/usr/bin/env python
"""Build the 2^53 MONEY-BOUNDARY lake: sf0.1 testdata with every money
column scaled by an exact decimal multiplier so that REAL query sums
cross the DECIMAL→DOUBLE single-vs-double-rounding boundary the
round-11 dsum sweep fixed.

Why value-scaling, not row-replication: the replica lakes
(scale_stress.py) grow volume, but even x100 keeps scale-2 money sums
(~2e15 scaled cents) under 2^53 ≈ 9.007e15; an x1000 lake would cross
but costs ~60 GB. Scaling VALUES by 5997 pushes the sf0.1 grand-total
money sums to ~1.4e16 scaled cents — past the boundary — while every
individual value stays inside DECIMAL(12,2) (max o_totalprice ≈ 3.6e9
< 1e10) and stays 2-decimal-clean (k·5997 cents is an exact integer;
the parquet double deviates from it by <1e-6, six orders of magnitude
from the 0.005 cast-tie boundary, so dec2() stays deterministic in
both engines — the same argument as functions/numeric.py).

5997 deliberately NOT divisible by 100: scaled values keep a nonzero
fraction, so the d2d floor/fraction decomposition is exercised on both
components at scale.

Usage: python scripts/build_boundary_lake.py [out_dir]
Then:  SPARK_GRAFT_SF_DIR=<out_dir> python scripts/drive_driver_contract.py <swept queries...>
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = os.environ.get("SPARK_GRAFT_BOUNDARY_SRC", "/root/testdata/sf0.1")
MULT = 5997

# money columns per table; every other column (and table) is verbatim
MONEY = {
    "lineitem": ["l_extendedprice"],
    "orders": ["o_totalprice"],
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "events": ["value"],
}
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


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scratch/boundary_lake"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        cols = MONEY.get(t)
        if not cols:
            if os.path.isfile(src):
                shutil.copyfile(src, dst)
            else:  # directory-style parquet: rewrite through duckdb
                con.execute(
                    f"COPY (SELECT * FROM read_parquet('{src}/**/*.parquet'))"
                    f" TO '{dst}' (FORMAT parquet)"
                )
            print(f"  {t}: copied")
            continue
        others = con.execute(
            f"SELECT column_name FROM (DESCRIBE SELECT * FROM read_parquet('{src}'))"
        ).fetchall()
        sel = ", ".join(
            f"CAST(CAST({n} AS DECIMAL(12,2)) * {MULT} AS DOUBLE) AS {n}"
            if n in cols
            else n
            for (n,) in others
        )
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src}'))"
            f" TO '{dst}' (FORMAT parquet)"
        )
        print(f"  {t}: scaled {cols} by {MULT}")
    # boundary proof: the grand-total scaled-cent magnitudes vs 2^53
    for label, sql in [
        (
            "orders_total_cents",
            f"SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS HUGEINT)"
            f" FROM read_parquet('{out}/orders.parquet')",
        ),
        (
            "lineitem_revenue_scaled_int",
            f"SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))"
            f" * (1 - CAST(l_discount AS DECIMAL(12,2)))) * 10000 AS HUGEINT)"
            f" FROM read_parquet('{out}/lineitem.parquet')",
        ),
    ]:
        v = con.execute(sql).fetchone()[0]
        print(f"  {label}: {v} ({'PAST' if abs(v) > 2**53 else 'below'} 2^53)")
    con.close()
    print(f"boundary lake at {out}")


if __name__ == "__main__":
    main()
