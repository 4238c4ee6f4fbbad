"""Round-13 session ops: FIM span-corruption plan, mojibake repair
audit, and the snapshot file-manifest read path. The hash checks live
in the driver contract; these tests pin the properties a hash alone
could satisfy vacuously, plus the physical halves.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_showcase_spark.registry import all_specs

from .conftest import SF_SMOKE

SPECS = all_specs()


def test_fim_plan_invariants(spark):
    pdf = SPECS["fim_span_corruption_plan"].build(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    # both document orderings drawn (the md5 mode split is not vacuous)
    assert set(pdf["mode"]) == {"psm", "spm"}
    # somewhere a real middle span exists, and ppm stays a fraction
    assert pdf["sum_middle"].sum() > 0
    assert (pdf["max_middle_ppm"] <= 1_000_000).all()
    assert ((pdf["avg_middle_ppm"] >= 0) & (pdf["avg_middle_ppm"] <= 1_000_000)).all()
    # conservation: the three segments partition every planned document
    total = (pdf["sum_prefix"] + pdf["sum_middle"] + pdf["sum_suffix"]).sum()
    want = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter(F.col("n_chars") >= 2)
        .agg(F.sum("n_chars"))
        .first()[0]
    )
    assert int(total) == int(want)


def test_mojibake_repair_is_total_and_exact(spark):
    pdf = SPECS["mojibake_repair_audit"].build(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    # the injection reached every source and the detector saw it
    assert (pdf["n_mojibake"] > 0).all(), "no mojibake injected — vacuous"
    assert pdf["n_seq_a"].sum() > 0 and pdf["n_seq_e"].sum() > 0
    # the repair is TOTAL: every document's repaired text is
    # byte-identical to the independently built expected text
    assert (pdf["n_repaired_ok"] == pdf["n_docs"]).all()
    # every repaired sequence shrinks 2 chars -> 1
    assert (pdf["chars_recovered"] == pdf["n_seq_a"] + pdf["n_seq_e"]).all()


def test_filelist_read_matches_directory_read(spark, tmp_path):
    # the snapshot commit protocol's _FILELIST.json: the manifest-driven
    # read returns the same rows as directory discovery, recovers the
    # partition column, and falls back cleanly when no manifest exists
    from etl_showcase_spark.sources.io import land_filelist, read_filelist_parquet

    p = str(tmp_path / "lake")
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).cast("int").alias("part")
    )
    df.write.partitionBy("part").parquet(p)
    n = land_filelist(p)
    assert n >= 7  # at least one file per partition dir
    via_manifest = read_filelist_parquet(spark, p).orderBy("k").toPandas()
    via_dir = spark.read.parquet(p).orderBy("k").toPandas()
    assert sorted(via_manifest.columns) == sorted(via_dir.columns)
    assert via_manifest[sorted(via_manifest.columns)].equals(
        via_dir[sorted(via_dir.columns)]
    )
    # fallback: a layout without the manifest still reads
    os.remove(os.path.join(p, "_FILELIST.json"))
    assert read_filelist_parquet(spark, p).count() == 100


def test_snapshot_commit_lands_filelist(spark, tmp_path):
    from etl_showcase_spark.sources.io import read_snapshot, write_snapshot

    base = str(tmp_path / "snap")
    v = write_snapshot(spark.range(10).select(F.col("id").alias("k")), base)
    assert os.path.exists(os.path.join(base, f"v={v}", "_FILELIST.json"))
    assert read_snapshot(spark, base, v).count() == 10


def test_jpeg_ahash_neardup_not_vacuous(spark):
    # decode -> feature -> dedup composition: collisions must actually
    # occur at smoke scale (the HAVING >= 2 filter is not vacuous), and
    # every hash is a 64-char bitstring
    pdf = SPECS["jpeg_ahash_neardup"].build(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0, "no ahash collisions at smoke scale — vacuous"
    assert (pdf["n_images"] >= 2).all()
    assert pdf["ahash"].str.fullmatch("[01]{64}").all()
