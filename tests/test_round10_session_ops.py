"""Round-10 session additions: regression tests for the two round-9
ADVICE fixes (the IVF/two-level empty-fine-cell fallback and the
zero-token temperature-mix guard), plus the stream≡batch agreement
proof on the fallback route itself (this round's ADVICE: the batch
twin must not silently drop vectors the stream COALESCEs)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_showcase_spark.registry import all_specs

from .conftest import SF_SMOKE

SPECS = all_specs()


# ---------------------------------------------------------------------------
# Empty-fine-cell fallback: a coarse cell with no fine seeds must route
# (c2=0, coarse-centroid distance) identically in the streaming kernel
# and the batch frozen-index assigner — and must not KeyError (the
# original round-9 ADVICE defect).
# ---------------------------------------------------------------------------


def _toy_index(spark):
    """2-D frozen index: coarse cell 0 at (0,0) with two fine seeds,
    coarse cell 1 at (1000,1000)·1000 with NO fine seeds — the
    fallback-eligible shape that never occurs when index == data
    (fseeds ⊆ members), but does when new data arrives."""
    cent_full = spark.createDataFrame(
        [(0, [0, 0]), (1, [1_000_000, 1_000_000])],
        "c1 int, c array<bigint>",
    )
    fcent_full = spark.createDataFrame(
        [(0, 0, [0, 0]), (0, 1, [500_000, 500_000])],
        "c1 int, c2 int, fc array<bigint>",
    )
    # quantized (UNscaled) arriving vectors: 900/901 land in the
    # fine-less cell 1; 7/8 in cell 0 (one per fine seed side)
    vecs = spark.createDataFrame(
        [(10, [900, 900]), (11, [1001, 999]), (12, [7, 7]), (13, [400, 480])],
        "vec_id long, x array<bigint>",
    )
    return cent_full, fcent_full, vecs


def test_empty_fine_cell_fallback_agrees(spark):
    from etl_showcase_spark.plans.mlprep import _frozen_index_assign
    from etl_showcase_spark.streaming.jobs import frozen_two_level_route

    cent_full, fcent_full, vecs = _toy_index(spark)
    coarse = sorted(
        (int(r["c1"]), [int(v) for v in r["c"]]) for r in cent_full.collect()
    )
    fine: dict[int, list[tuple[int, list[int]]]] = {}
    for r in fcent_full.collect():
        fine.setdefault(int(r["c1"]), []).append(
            (int(r["c2"]), [int(v) for v in r["fc"]])
        )

    # the exact shipped streaming kernel, driven as a static mapInPandas
    # (the kernel is micro-batch-agnostic by construction)
    streamed = (
        vecs.mapInPandas(
            frozen_two_level_route(coarse, fine),
            "vec_id long, c1 int, c2 int, d2 long",
        )
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    batch = (
        _frozen_index_assign(
            vecs.select(
                "vec_id", F.transform("x", lambda y: y * 1000).alias("x2")
            ),
            cent_full,
            fcent_full,
        )
        .select("vec_id", "c1", "c2", "d2")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    # no vector dropped on either path (the original batch inner join
    # would have silently lost vec 10 and 11)
    assert len(streamed) == 4 and len(batch) == 4
    # the fallback actually fired: fine-less cell 1 serves c2=0
    fb = streamed[streamed["c1"] == 1]
    assert len(fb) == 2 and (fb["c2"] == 0).all()
    # vec 11 sits (1,-1) off the coarse centroid in quantized units:
    # d2 = (1000^2 + 1000^2) exactly — the coarse-as-fine distance
    assert int(streamed.set_index("vec_id").loc[11, "d2"]) == 2_000_000
    # bit-identical stream ≡ batch on every routed row, fallback included
    assert streamed.equals(batch)


def test_frozen_assign_reduces_to_two_level_assign(spark):
    # when the arriving data IS the index data, fseeds ⊆ members makes
    # the fallback unreachable and the total left-join spelling must
    # coincide with the blessed inner-join helper row-for-row
    from etl_showcase_spark.plans.mlprep import (
        _SEM2_K1,
        _SEM2_K2,
        _frozen_index_assign,
        _two_level_assign,
        _two_level_index,
    )

    cent_full, fcent_full, m = _two_level_index(spark, SF_SMOKE, _SEM2_K1, _SEM2_K2)
    frozen = (
        _frozen_index_assign(m.select("vec_id", "x2"), cent_full, fcent_full)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    blessed = (
        _two_level_assign(spark, SF_SMOKE, _SEM2_K1, _SEM2_K2)
        .select("vec_id", "c1", "c2", "d2")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(frozen) > 0
    assert frozen.equals(blessed)


# ---------------------------------------------------------------------------
# Zero-token source guard in temperature_scaled_mix (round-9 ADVICE
# fix, plans/mlprep.py): a source whose documents all tokenize to
# nothing must be EXCLUDED (not divide-by-zero under ANSI mode), and
# the exclusion must match the oracle's HAVING guard exactly.
# ---------------------------------------------------------------------------


@pytest.fixture()
def zero_token_sf_dir(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMOKE}/documents.parquet")
    base = t.slice(0, 60)
    extra = pa.table(
        {
            "doc_id": pa.array([100000, 100001, 100002], pa.int64()),
            "text": pa.array(["", "   ", "\t\n "], pa.string()),
            "lang": pa.array(["xx"] * 3, pa.string()),
            "source": pa.array(["ZERO_TOKEN_SRC"] * 3, pa.string()),
            "n_chars": pa.array([0, 3, 3], pa.int64()),
        }
    )
    merged = pa.concat_tables(
        [base.select(extra.column_names), extra]
    )
    pq.write_table(merged, os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def test_temperature_mix_excludes_zero_token_source(spark, zero_token_sf_dir):
    import duckdb

    from etl_showcase_spark.testing import compare_frames

    spec = SPECS["temperature_scaled_mix"]
    actual = spec.build(spark, zero_token_sf_dir).toPandas()
    # the guard, not an ANSI divide-by-zero, handles the empty source
    assert len(actual) > 0
    assert "ZERO_TOKEN_SRC" not in set(actual["source"])
    # and real sources survive
    assert len(set(actual["source"])) >= 2

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{zero_token_sf_dir}/documents.parquet')"
        )
        expected = con.execute(spec.oracle).fetchdf()
    finally:
        con.close()
    problems = compare_frames(actual, expected)
    assert not problems, "; ".join(problems)


# ---------------------------------------------------------------------------
# Vacuum-policy audit (round-10, SURVEY §7.5): the oracle checks the
# logical half (rows/decisions); this asserts the physical half — the
# audit's file/byte stats match the disk, and vacuum_snapshots deletes
# EXACTLY what the audit marks reclaimable, never the protected dirs.
# ---------------------------------------------------------------------------


def test_vacuum_audit_matches_disk_and_vacuum_agrees(spark):
    import os

    from etl_showcase_spark.plans.ingest import vacuum_policy_audit
    from etl_showcase_spark.sources.io import (
        audit_vacuum_policy,
        read_snapshot,
        snapshot_versions,
        vacuum_snapshots,
    )

    pdf = SPECS["vacuum_policy_audit"].build(spark, SF_SMOKE).toPandas()
    base = vacuum_policy_audit.last_base

    # physical half: n_files/bytes in the audit == the actual tree
    audit = {r["version"]: r for r in audit_vacuum_policy(base, 2, 0.0)}
    for v, row in audit.items():
        disk_files = disk_bytes = 0
        for root, _, fs in os.walk(os.path.join(base, f"v={v}")):
            for f in fs:
                disk_files += 1
                disk_bytes += os.path.getsize(os.path.join(root, f))
        assert row["n_files"] == disk_files and row["bytes"] == disk_bytes

    # the dashboard's reclaim set is exactly what vacuum deletes
    expect_deleted = sorted(
        v for v, r in audit.items() if r["decision"] in ("reclaimable", "torn_expired")
    )
    assert expect_deleted == sorted(
        pdf[pdf["reclaimable"]]["version"].tolist()
    )
    deleted = vacuum_snapshots(base, keep_last=2, torn_grace_seconds=0.0)
    assert deleted == expect_deleted

    # safety: retained + in-flight survive, latest still serves
    survivors = {int(p[2:]) for p in os.listdir(base) if p.startswith("v=")}
    assert survivors == {3, 5, 6}  # retained, retained, torn_inflight
    assert snapshot_versions(base) == [3, 5]
    assert read_snapshot(spark, base).count() > 0
    # a re-audit after vacuum has nothing left to reclaim
    post = audit_vacuum_policy(base, 2, 0.0)
    assert all(r["decision"] in ("retained", "torn_inflight") for r in post)


# ---------------------------------------------------------------------------
# ann_lsh_topk variance reduction (round-10): the query-side signatures
# moved from the pandas-UDF GEMM to pure JVM integer expressions. The
# two spellings must stay bit-identical on every vector — this is the
# contract that let the swap keep the blessed hash.
# ---------------------------------------------------------------------------


def test_lsh_expression_keys_equal_gemm_keys(spark):
    from etl_showcase_spark.operators.similarity import (
        lsh_bucket_key,
        lsh_bucket_keys_gemm,
        quantize,
    )

    n_planes, dim, n_tables = 4, 64, 8
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(300)
    qv = quantize(F.col("embedding"))
    both = e.select(
        "vec_id",
        F.array(
            *[lsh_bucket_key(qv, n_planes, dim, t) for t in range(n_tables)]
        ).alias("expr_keys"),
        lsh_bucket_keys_gemm("embedding", n_planes, dim, n_tables).alias(
            "gemm_keys"
        ),
    )
    diff = both.filter(F.col("expr_keys") != F.col("gemm_keys")).count()
    assert diff == 0
    assert both.count() == 300


# ---------------------------------------------------------------------------
# The 2^53 decimal→double cast boundary (round-10, caught by the CI
# fixture-scale sweep): DuckDB double-rounds DECIMAL→DOUBLE once the
# scaled integer passes 2^53; d2d/sql_d2d force both engines through
# identical single roundings. Pin the hazard AND the fix on the real
# value that exposed it.
# ---------------------------------------------------------------------------


def test_d2d_agrees_across_engines_past_2pow53(spark):
    import duckdb

    from etl_showcase_spark.functions.numeric import d2d, sql_d2d

    # scaled int 7096786968835_8685 > 2^53: the naive casts disagree
    lit = "7096786968835.8685"
    s = spark.sql(f"SELECT CAST('{lit}' AS DECIMAL(38,4)) v").select(
        d2d(F.col("v"), "dec"), F.col("v").cast("double").alias("naive")
    ).collect()[0]
    con = duckdb.connect()
    try:
        dec_sql = sql_d2d("v")
        duck = con.execute(
            f"SELECT {dec_sql}, CAST(v AS DOUBLE) "
            f"FROM (SELECT CAST('{lit}' AS DECIMAL(38,4)) v)"
        ).fetchone()
    finally:
        con.close()
    # the fix: bit-identical across engines
    assert s["dec"] == duck[0]
    # the hazard is real: the naive casts actually disagree on this value
    assert s["naive"] != duck[1]
    # and d2d is value-faithful (within the two correctly-rounded ULPs)
    assert abs(s["dec"] - float(lit)) <= abs(float(lit)) * 1e-15


def test_bucketed_lineage_diff_has_zero_exchange(spark):
    # the whole point of the bucketed twin: both versions land
    # doc_id-bucketed, so the full-outer diff join carries NO Exchange
    # anywhere in the physical plan — the shuffle was paid at landing
    from etl_showcase_spark.plans.ingest import (
        snapshot_lineage_diff_bucketed,
    )

    df = snapshot_lineage_diff_bucketed(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    assert "SortMergeJoin" in plan and "FullOuter" in plan
    # and the relation itself is the real diff, not vacuous
    pdf = df.toPandas()
    assert set(pdf["status"]) == {"added", "deleted", "updated"}


def test_lineage_files_flags_match_physical_partition_dirs(spark):
    # file-grain lineage contract: a bucket is flagged needs_recompute
    # exactly when the (doc_id, text) CONTENT of its v=1 vs v=2
    # partition directories differs — checked here against the written
    # parquet bytes, independently of the query's own join
    import glob
    import os

    import duckdb

    from etl_showcase_spark.plans.ingest import snapshot_lineage_files

    pdf = snapshot_lineage_files(spark, SF_SMOKE).toPandas()
    base = snapshot_lineage_files.last_base
    assert sorted(pdf["bucket"]) == list(range(16))
    con = duckdb.connect()
    for _, row in pdf.iterrows():
        sides = []
        for v in (1, 2):
            d = os.path.join(base, f"v={v}", f"bucket={int(row['bucket'])}")
            files = glob.glob(d + "/*.parquet")
            assert files, f"missing partition dir {d}"
            sides.append(
                set(
                    con.execute(
                        "SELECT doc_id, text FROM read_parquet(?)", [files]
                    ).fetchall()
                )
            )
        assert bool(row["needs_recompute"]) == (sides[0] != sides[1]), row
        assert len(sides[0]) == row["n_docs_a"] and len(sides[1]) == row["n_docs_b"]


def test_write_snapshot_partitioned_commit_protocol(spark, tmp_path):
    # version allocation must skip torn (uncommitted) dirs, and
    # read_snapshot must recover the partition column
    import os

    from etl_showcase_spark.sources.io import (
        read_snapshot,
        snapshot_versions,
        write_snapshot_partitioned,
    )

    base = str(tmp_path / "snap")
    df = spark.range(10).select(
        F.col("id").alias("k"), F.pmod("id", F.lit(2)).alias("p")
    )
    v1 = write_snapshot_partitioned(df, base, ["p"])
    assert v1 == 1 and snapshot_versions(base) == [1]
    os.makedirs(base + "/v=2")  # torn write: dir exists, no _COMMITTED
    v3 = write_snapshot_partitioned(df, base, ["p"])
    assert v3 == 3 and snapshot_versions(base) == [1, 3]
    back = read_snapshot(spark, base, v3)
    assert sorted(back.columns) == ["k", "p"]
    assert back.count() == 10


def test_seeded_epoch_shuffle_permutes_and_partitions(spark):
    from etl_showcase_spark.plans.mlprep import (
        _EPOCH_SHUFFLE_BATCH,
        seeded_epoch_shuffle,
    )

    pdf = seeded_epoch_shuffle(spark, SF_SMOKE).toPandas()
    n_docs = spark.read.parquet(SF_SMOKE + "/documents.parquet").count()
    for e in (1, 2):
        ep = pdf[pdf["epoch"] == e]
        # batches partition the corpus: full batches + one remainder
        assert ep["n_docs"].sum() == n_docs
        assert sorted(ep["batch_id"]) == list(range(len(ep)))
        full = ep[ep["batch_id"] < len(ep) - 1]
        assert (full["n_docs"] == _EPOCH_SHUFFLE_BATCH).all()
    # the two epochs are genuinely different permutations: the batch
    # head docs disagree somewhere (md5-keyed orders are independent)
    heads = pdf.pivot_table(index="batch_id", columns="epoch", values="head_doc")
    assert (heads[1] != heads[2]).any()
    # determinism: a second run is bit-identical (no RNG anywhere)
    again = seeded_epoch_shuffle(spark, SF_SMOKE).toPandas()
    key = ["epoch", "batch_id"]
    assert pdf.sort_values(key).reset_index(drop=True).equals(
        again.sort_values(key).reset_index(drop=True)
    )


def test_contrastive_sides_and_exactness(spark):
    import numpy as np

    from etl_showcase_spark.plans.llm_vector import (
        _CONTRASTIVE_K,
        contrastive_hard_negatives,
    )

    pdf = contrastive_hard_negatives(spark, SF_SMOKE).toPandas()
    emb = spark.read.parquet(SF_SMOKE + "/embeddings.parquet").toPandas()
    labels = dict(zip(emb["vec_id"], emb["label"]))
    # side contract: 'pos' shares the anchor's label, 'neg' never does
    for _, r in pdf.iterrows():
        same = labels[r["q_id"]] == labels[r["c_id"]]
        assert (r["side"] == "pos") == same
        assert 1 <= r["rnk"] <= _CONTRASTIVE_K
    # exactness vs a local quantized brute force for one anchor/side
    q_id = int(pdf["q_id"].iloc[0])
    V = np.floor(np.stack(emb["embedding"].to_numpy()).astype("float64") * 1000 + 0.5)
    ids = emb["vec_id"].to_numpy()
    qv = V[ids == q_id][0]
    cos = (V @ qv) / (np.sqrt((V * V).sum(1)) * np.sqrt((qv * qv).sum()))
    neg = (ids != q_id) & (emb["label"].to_numpy() != labels[q_id])
    order = sorted(zip(-cos[neg], ids[neg]))[:_CONTRASTIVE_K]
    expect = [int(i) for _, i in order]
    got = pdf[(pdf["q_id"] == q_id) & (pdf["side"] == "neg")].sort_values("rnk")
    assert list(got["c_id"]) == expect


def test_pii_redaction_is_a_fixpoint_and_total(spark):
    # re-applying the redaction chain to the CLEAN text must change
    # nothing (no pattern survives one pass), and every injected doc
    # must actually have been hit
    from pyspark.sql import functions as F

    from etl_showcase_spark.operators import textops
    from etl_showcase_spark.plans.llm_text import pii_redact_rewrite

    pdf = pii_redact_rewrite(spark, SF_SMOKE).toPandas()
    hit = pdf[pdf["doc_id"] % 4 == 0]
    assert (hit["n_emails"] >= 1).all()
    assert (pdf[pdf["doc_id"] % 6 == 0]["n_urls"] >= 1).all()
    assert (pdf[pdf["doc_id"] % 5 == 0]["n_digit_runs"] >= 1).all()
    untouched = pdf[
        (pdf["doc_id"] % 4 != 0) & (pdf["doc_id"] % 6 != 0) & (pdf["doc_id"] % 5 != 0)
    ]
    assert len(untouched) and (untouched["char_delta"] == 0).all()
    assert (
        untouched[["n_emails", "n_urls", "n_digit_runs"]].to_numpy() == 0
    ).all()
    # fixpoint: counts on a redacted sample are zero in-engine
    docs = spark.read.parquet(SF_SMOKE + "/documents.parquet")
    sid = F.col("doc_id").cast("string")
    raw = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit(" contact user"), sid, F.lit("@example.com now")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 6 == 0,
            F.concat(F.lit(" see https://ex.example/p/"), sid, F.lit("?s=1")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(" ref 00"), sid, F.lit("4242 done")),
        ).otherwise(F.lit("")),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(raw, textops.EMAIL_RE, "[EMAIL]"),
            textops.URL_RE,
            "[URL]",
        ),
        textops.DIGIT_RUN_RE,
        "[NUM]",
    )
    leftover = docs.select(
        (
            F.regexp_count(clean, F.lit(textops.EMAIL_RE))
            + F.regexp_count(clean, F.lit(textops.URL_RE))
            + F.regexp_count(clean, F.lit(textops.DIGIT_RUN_RE))
        ).alias("n")
    ).agg(F.sum("n").alias("total")).collect()[0]["total"]
    assert leftover == 0


def test_redaction_spans_match_python_ground_truth(spark):
    # every emitted (kind, occ, span_start, span_len) must equal
    # re.finditer on the same injected raw text — and substring(raw)
    # at the span must BE a pattern match (offsets are real, not
    # plausible)
    import re

    from etl_showcase_spark.operators import textops
    from etl_showcase_spark.plans.llm_text import (
        _pii_raw_col,
        pii_redaction_spans,
    )

    pdf = pii_redaction_spans(spark, SF_SMOKE).toPandas()
    raws = dict(
        spark.read.parquet(SF_SMOKE + "/documents.parquet")
        .select("doc_id", _pii_raw_col().alias("raw"))
        .collect()
    )
    res = {"email": textops.EMAIL_RE, "url": textops.URL_RE,
           "num": textops.DIGIT_RUN_RE}
    truth = {
        (d, k): [(m.start() + 1, len(m.group())) for m in re.finditer(rx, raw)]
        for d, raw in raws.items()
        for k, rx in res.items()
    }
    got = {}
    for _, r in pdf.iterrows():
        got.setdefault((r["doc_id"], r["kind"]), {})[r["occ"]] = (
            int(r["span_start"]),
            int(r["span_len"]),
        )
    n_spans = 0
    for key, spans in truth.items():
        emitted = got.get(key, {})
        assert len(emitted) == len(spans), key
        for occ, t in enumerate(spans, start=1):
            assert emitted[occ] == t, (key, occ, emitted[occ], t)
        n_spans += len(spans)
    assert n_spans > 100  # the injection must actually exercise this


def test_curated_manifest_composes_its_gates(spark):
    # the manifest's doc population must be EXACTLY soft-dedup kept ∩
    # gopher keep=1, and batches must tile it in the epoch-1 order
    from etl_showcase_spark.plans.llm_text import cluster_weighted_sampling
    from etl_showcase_spark.plans.mlprep import (
        _EPOCH_SHUFFLE_BATCH,
        curated_training_manifest,
    )
    from etl_showcase_spark.registry import all_specs

    man = curated_training_manifest(spark, SF_SMOKE).toPandas()
    cw = set(cluster_weighted_sampling(spark, SF_SMOKE).toPandas()["doc_id"])
    gq = all_specs()["gopher_quality_gate"].build(spark, SF_SMOKE).toPandas()
    keep = set(gq[gq["keep"] == 1]["doc_id"])
    expected_n = len(cw & keep)
    assert man["n_docs"].sum() == expected_n
    assert 0 < expected_n < len(gq)  # both gates actually bite
    full = man[man["batch_id"] < man["batch_id"].max()]
    assert (full["n_docs"] == _EPOCH_SHUFFLE_BATCH).all()
    assert sorted(man["batch_id"]) == list(range(len(man)))


def test_bucket_recompute_prunes_partitions_and_equals_full(spark):
    # the incremental path must (a) touch only the changed partition
    # dirs — PartitionFilters on the v2 scan — and (b) land on exactly
    # the full-recompute rollup
    from etl_showcase_spark.plans.ingest import incremental_bucket_recompute
    from etl_showcase_spark.sources.io import read_snapshot

    df = incremental_bucket_recompute(spark, SF_SMOKE)
    pdf = df.toPandas().sort_values("bucket").reset_index(drop=True)
    # the %3/%5/%7 version model decides which buckets changed: every
    # doc added (%3-excluded, %5-kept), deleted (%5-excluded, %3-kept)
    # or updated (%7, kept in both) marks its bucket
    docs = spark.read.parquet(SF_SMOKE + "/documents.parquet").toPandas()
    ids = docs["doc_id"]
    in_a, in_b = ids % 3 != 0, ids % 5 != 0
    touched = (in_a != in_b) | (in_a & in_b & (ids % 7 == 0))
    changed = set(ids[touched] % 16)
    assert 0 < len(changed) <= 16
    # the v2 scan must be dynamically pruned to the work-list buckets
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:1500]
    # equality with the independent full recompute of v2
    base = incremental_bucket_recompute.last_base
    v2 = read_snapshot(spark, base, 2)
    full = (
        v2.groupBy(F.col("bucket").cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.length("text")).cast("bigint").alias("sum_chars"),
        )
        .toPandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    got = pdf[["bucket", "n_docs", "sum_chars"]]
    assert got.equals(full[["bucket", "n_docs", "sum_chars"]])
    assert set(pdf[pdf["recomputed"]]["bucket"]) == set(changed)
