#!/usr/bin/env python
"""Delta-sized scale stress for incremental_pack_repacking (round-12,
VERDICT item 5): the round-11 x10 exponent (α=0.74) was dominated by
the nested ExactSubstr chain recomputed on a replica lake that
multiplies DUPLICATES by construction — not by the repack itself. This
harness drives the factored repack core
(plans/mlprep.py:_repack_v2_from_per_doc) with the op's actual
production shape: a FIXED change set (5 changed shards) over a base
that grows x10, measuring

  - the full v2 maintenance phase (work list + DPP-carried manifest
    scan + changed-shard recompute), and
  - the recomputed-side subplan alone,

and reporting α = log(t_x10/t_x1)/log(10) for each. The recompute side
must be ~flat (α ≈ 0: its input is the 5 changed shards at any base
size); the full phase's residual slope is the O(#packs) metadata scan
of the carried manifest — linear in base but at the pack grain
(3 orders of magnitude below the token grain the trainer pays).

Writes a 'repack_delta' entry merged into SCALE_STRESS_NEWOPS_r{N}.json
(or a standalone file with --out).

Usage: python scripts/repack_delta_stress.py [--out FILE] [--docs 65536]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHANGED_SHARDS = [3, 77, 501, 1203, 1999]  # fixed at ANY base size
SCRATCH = "/tmp/spark_graft_scratch/repack_delta"


def build_per_doc(spark, n_docs: int, path: str) -> None:
    """Synthetic per-doc removal frame: deterministic token counts,
    removals confined to the fixed changed shards (every 3rd doc there
    loses 40 tokens) — the shape exact_substr_span_removal produces,
    without the replica-lake duplicate explosion."""
    import pyspark.sql.functions as F

    from etl_showcase_spark.plans.mlprep import _REPACK_SHARD

    changed = ", ".join(str(s) for s in CHANGED_SHARDS)
    (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            (100 + F.col("id") % 50).cast("bigint").alias("n_tokens"),
        )
        .withColumn(
            "n_removed",
            F.when(
                F.expr(f"doc_id div {_REPACK_SHARD}").isin(
                    *CHANGED_SHARDS
                )
                & (F.col("doc_id") % 3 == 0),
                F.lit(40),
            )
            .otherwise(F.lit(0))
            .cast("bigint"),
        )
        .withColumn("n_kept", (F.col("n_tokens") - F.col("n_removed")).cast("bigint"))
        .write.mode("overwrite")
        .parquet(path)
    )
    _ = changed


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=65536)
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default=None)
    ap.add_argument("--round", type=int, default=12)
    args = ap.parse_args()

    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from etl_showcase_spark.plans.mlprep import _repack_v2_from_per_doc
    from etl_showcase_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="repack-delta-stress",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    os.makedirs(SCRATCH, exist_ok=True)
    sizes = {"x1": args.docs, f"x{args.mult}": args.docs * args.mult}
    timings: dict[str, dict] = {}
    for label, n in sizes.items():
        pd_path = f"{SCRATCH}/per_doc_{label}"
        build_per_doc(spark, n, pd_path)
        per_doc = spark.read.parquet(pd_path)

        def run_full():
            root = tempfile.mkdtemp(prefix=f"repack_delta_{label}_")
            try:
                df = _repack_v2_from_per_doc(spark, per_doc, root)
                df.write.mode("overwrite").format("noop").save()
            finally:
                shutil.rmtree(root, ignore_errors=True)

        def run_recompute_only():
            root = tempfile.mkdtemp(prefix=f"repack_rec_{label}_")
            try:
                df = _repack_v2_from_per_doc(spark, per_doc, root).filter(
                    F.col("recomputed")
                )
                df.write.mode("overwrite").format("noop").save()
            finally:
                shutil.rmtree(root, ignore_errors=True)

        for phase, fn in (("full_v2", run_full), ("recompute_side", run_recompute_only)):
            fn()  # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            timings.setdefault(label, {})[phase] = round(best, 3)

        # invariant: the recomputed pack set is identical at any base
        root = tempfile.mkdtemp(prefix=f"repack_chk_{label}_")
        try:
            v2 = _repack_v2_from_per_doc(spark, per_doc, root)
            rec = v2.filter(F.col("recomputed"))
            timings[label]["n_recomputed_packs"] = rec.count()
            timings[label]["n_total_packs"] = v2.count()
            timings[label]["recomputed_shards"] = sorted(
                r["shard"] for r in rec.select("shard").distinct().collect()
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
        print(f"  {label}: {timings[label]}")
    spark.stop()

    big = f"x{args.mult}"
    assert timings["x1"]["recomputed_shards"] == timings[big]["recomputed_shards"] == sorted(
        CHANGED_SHARDS
    ), "change set leaked beyond the fixed shards"
    assert timings["x1"]["n_recomputed_packs"] == timings[big]["n_recomputed_packs"]

    def alpha(phase: str) -> float:
        return round(
            math.log(max(timings[big][phase], 1e-3) / max(timings["x1"][phase], 1e-3))
            / math.log(args.mult),
            2,
        )

    entry = {
        "methodology": (
            "fixed 5-shard change set over a base growing x"
            f"{args.mult} (synthetic per-doc removal frames driven through "
            "the factored repack core) — the op's production shape, free of "
            "the replica lake's by-construction duplicate explosion"
        ),
        "base_docs": args.docs,
        "timings": timings,
        "alpha_full_v2": alpha("full_v2"),
        "alpha_recompute_side": alpha("recompute_side"),
        "reading": (
            "recompute side is bounded by the changed shards (flat pack "
            "counts, α≈0 expected); the full phase's slope is the carried "
            "manifest's pack-grain metadata scan"
        ),
    }
    print(json.dumps(entry, indent=1))

    out_path = args.out or os.path.join(
        REPO, f"SCALE_STRESS_NEWOPS_r{args.round:02d}.json"
    )
    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged["repack_delta"] = entry
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {out_path} (repack_delta entry)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
