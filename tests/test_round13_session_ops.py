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


def test_hybrid_rrf_fuses_both_systems(spark):
    pdf = SPECS["hybrid_rrf_retrieval"].build(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    # the fusion is not vacuous: some candidates are found by BOTH legs
    # and some by exactly one (RRF's whole point is combining them)
    both = (pdf["lex_rnk"] > 0) & (pdf["sem_rnk"] > 0)
    assert both.any(), "no candidate surfaced by both systems — vacuous fusion"
    assert ((pdf["lex_rnk"] > 0) & (pdf["sem_rnk"] == 0)).any()
    assert ((pdf["lex_rnk"] == 0) & (pdf["sem_rnk"] > 0)).any()
    # rrf_ppm is exactly the integer formula over the two ranks
    def contrib(r):
        return 0 if r == 0 else 1_000_000 // (60 + r)
    want = pdf["lex_rnk"].map(contrib) + pdf["sem_rnk"].map(contrib)
    assert (pdf["rrf_ppm"] == want).all()
    # per query: at most 10 rows, ranks contiguous from 1, ordered by
    # (rrf_ppm DESC, c_id ASC)
    for _, g in pdf.groupby("q_id"):
        g = g.sort_values("rnk")
        assert list(g["rnk"]) == list(range(1, len(g) + 1))
        assert len(g) <= 10
        key = list(zip(-g["rrf_ppm"], g["c_id"]))
        assert key == sorted(key)


def test_mmr_rerank_diversifies(spark):
    pdf = SPECS["mmr_diverse_rerank"].build(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    n_div = 0
    for _, g in pdf.groupby("q_id"):
        g = g.sort_values("sel_rank")
        assert list(g["sel_rank"]) == list(range(1, len(g) + 1))
        # greedy init: the first pick is pure relevance (λ-scaled)
        first = g.iloc[0]
        assert first["rel_dot"] == g["rel_dot"].max()
        assert first["mmr_score"] == 7 * first["rel_dot"]
        # diversification is not vacuous when the emission order differs
        # from the pure-relevance order
        by_rel = g.sort_values(["rel_dot", "c_id"], ascending=[False, True])
        if list(g["c_id"]) != list(by_rel["c_id"]):
            n_div += 1
    assert n_div > 0, "MMR never reordered vs pure relevance — vacuous"


def test_ann_recall_eval_metrics_consistent(spark):
    pdf = SPECS["ann_recall_eval"].build(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    assert pdf["n_hits"].between(0, 10).all()
    assert (pdf["recall_ppm"] == 1_000_000 * pdf["n_hits"] // 10).all()
    hit = pdf["first_hit_rnk"] > 0
    assert (pdf.loc[hit, "mrr_ppm"] == 1_000_000 // pdf.loc[hit, "first_hit_rnk"]).all()
    assert (pdf.loc[~hit, "mrr_ppm"] == 0).all()
    assert (pdf.loc[~hit, "n_hits"] == 0).all()
    # the OR-amplified LSH index actually works at smoke scale
    assert pdf["recall_ppm"].mean() >= 500_000, "LSH recall collapsed"


def test_chunk_neighbors_exclude_own_document(spark):
    pdf = SPECS["chunk_neighbor_topk"].build(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    # the RETRO rule: no neighbor comes from the query's own document
    assert (pdf["q_doc_id"] != pdf["c_doc_id"]).all()
    assert (pdf["dot"] > 0).all()  # only chunks sharing a hash bucket score
    for _, g in pdf.groupby(["q_doc_id", "q_chunk_idx"]):
        g = g.sort_values("rnk")
        assert list(g["rnk"]) == list(range(1, len(g) + 1))
        assert len(g) <= 5
        # emission order is the declared total order
        key = list(zip(-g["cosine"], g["c_doc_id"], g["c_chunk_idx"]))
        assert key == sorted(key)


def test_water_fill_spends_exactly_the_budget(spark):
    pdf = SPECS["source_budget_water_fill"].build(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    total = int(pdf["avail_tokens"].sum())
    budget = total * 6 // 10
    # the allocation is feasible and spends exactly min(budget, total)
    assert (pdf["alloc_tokens"] <= pdf["avail_tokens"]).all()
    assert int(pdf["alloc_tokens"].sum()) == min(budget, total)
    # uncapped sources keep everything; capped sources sit at the water
    # line (or +1 from the remainder round)
    unc = pdf[~pdf["capped"]]
    assert (unc["alloc_tokens"] == unc["avail_tokens"]).all()
    cap = pdf[pdf["capped"]]
    assert len(cap) > 0, "no source capped at smoke scale — vacuous"
    assert cap["water_level"].nunique() == 1
    lvl = int(cap["water_level"].iloc[0])
    assert cap["alloc_tokens"].isin([lvl, lvl + 1]).all()
    assert (cap["avail_tokens"] > lvl).all()


def test_embedding_dim_stats_cover_every_dim(spark):
    pdf = SPECS["embedding_dim_robust_stats"].build(spark, SF_SMOKE).toPandas()
    assert len(pdf) == 64  # one row per embedding dimension
    assert pdf["n"].nunique() == 1  # every dim sees every vector
    assert (pdf["mad"] >= 0).all()
    assert (pdf["min_x"] <= pdf["med"]).all() and (pdf["med"] <= pdf["max_x"]).all()
    # the 6-MAD screen is a screen, not a sieve: outliers are rare
    assert (pdf["n_outliers"] <= pdf["n"] // 10).all()


def test_bpe_apply_merges_segmentation_conserves_chars(spark):
    pdf = SPECS["bpe_apply_merges"].build(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    # merges actually fired, including the chained ones (th -> the)
    assert (pdf["subword_len"] > 1).any()
    assert "the" in set(pdf["subword"])
    # conservation: subwords partition every word's characters exactly
    got = int((pdf["subword_len"] * pdf["n_occurrences"]).sum())
    want = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .agg(F.sum(F.length("w")))
        .first()[0]
    )
    assert got == int(want)


def test_incremental_chunk_refresh_equals_full_rebuild(spark):
    # the monotone-top-k identity the refresh relies on:
    # topk(base ∪ delta) must equal rerank(topk(base) ∪ topk(delta))
    from etl_showcase_spark.plans.llm_text import (
        _chunk_dense,
        _chunk_gemm_topk,
        _cnb_arrival_col,
        _CNB_K,
    )

    inc = (
        SPECS["incremental_chunk_index_refresh"].build(spark, SF_SMOKE).toPandas()
    )
    assert len(inc) > 0
    assert inc["from_delta"].any(), "no delta neighbor displaced a base one — vacuous"
    assert (~inc["from_delta"]).any()

    # full rebuild over base+delta with the SAME standing panel
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    base = d.filter(~_cnb_arrival_col())
    dense_b = _chunk_dense(base)
    stride = base.agg(
        F.greatest(F.lit(50).cast("long"), (F.count(F.lit(1)) / 100).cast("long"))
        .alias("__stride")
    )
    qpd = (
        dense_b.crossJoin(F.broadcast(stride))
        .filter((F.col("doc_id") % F.col("__stride") == 0) & (F.col("chunk_idx") == 0))
        .select("doc_id", "chunk_idx", "v")
        .toPandas()
    )
    full = _chunk_gemm_topk(spark, _chunk_dense(d), qpd, _CNB_K).toPandas()
    cols = ["q_doc_id", "q_chunk_idx", "c_doc_id", "c_chunk_idx", "dot", "rnk"]
    a = inc[cols].sort_values(cols).reset_index(drop=True)
    b = full[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b), "incremental refresh diverges from full rebuild"


def test_context_pack_respects_budget_and_rank_contiguity(spark):
    pdf = SPECS["retrieval_context_budget_pack"].build(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    assert (pdf["cum_tokens"] <= 120).all()
    n_ctx = pdf.groupby("q_id").size()
    assert (n_ctx >= 1).all()  # every panel query gets SOME context
    assert (n_ctx < 10).any(), "budget never truncated a context — vacuous"
    for _, g in pdf.groupby("q_id"):
        g = g.sort_values("rnk")
        # prefix-stop: the included ranks are exactly 1..n (contiguous)
        assert list(g["rnk"]) == list(range(1, len(g) + 1))
        # the running total is the pairwise cumsum of the included costs
        assert (g["cum_tokens"] == g["n_toks"].cumsum()).all()


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
