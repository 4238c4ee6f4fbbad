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


# Queries whose OUTPUT is legitimately empty below the driver's sf0.01
# (the hash still must match): at fixture scale (the CI fallback lake,
# tests/fixtures/sf0.001) these find no qualifying pairs — a data
# property, not a regression. The vacuity gate stays HARD at sf0.01.
FIXTURE_SCALE_VACUOUS = {
    "er_weighted_field_agreement",  # no field-agreeing pairs survive blocking
    "kcore_copurchase",  # the 3-core is empty on the tiny co-purchase graph
    "q20_excess_shipments",  # no supplier exceeds the excess threshold
    "q22_idle_rich_customers",  # no above-avg-balance idle customers
    "q7_nation_volume",  # the two named nations never trade at sf0.001
}

_AT_DRIVER_SCALE = SF_ORACLE.rstrip("/").endswith("sf0.01")


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck, name):
    spec = SPECS[name]
    actual = spec.build(spark, SF_ORACLE).toPandas()
    expected = duck.execute(spec.oracle).fetchdf()
    problems = compare_frames(actual, expected)
    assert not problems, f"{name}: " + "; ".join(problems)
    # a zero-row MATCH proves nothing — every registered query must
    # exercise real data at the driver's correctness scale
    if _AT_DRIVER_SCALE or name not in FIXTURE_SCALE_VACUOUS:
        assert len(actual) > 0, f"{name} returned 0 rows — vacuous MATCH"


# ---------------------------------------------------------------------------
# Rows-only gate. A query with no oracle must still prove something:
# non-empty output PLUS a per-query invariant (accuracy vs an exact
# twin, structural bounds, or frame-equality with an oracle-checked
# sibling). "Runs and returns anything" is not verification.
# ---------------------------------------------------------------------------


def _inv_ann_ivf_topk(spark, pdf):
    # recall@10 vs the exact GEMM top-k on the same strided query set
    exact = SPECS["ann_cosine_topk"].build(spark, SF_ORACLE).toPandas()
    truth = exact.groupby("q_id")["c_id"].apply(set)
    approx = pdf.groupby("q_id")["c_id"].apply(set)
    recalls = [
        len(truth[q] & approx.get(q, set())) / len(truth[q]) for q in truth.index
    ]
    assert sum(recalls) / len(recalls) >= 0.7, f"IVF recall@10 {sum(recalls)/len(recalls):.2f} < 0.7"


def _inv_minhash_lsh_neardup(spark, pdf):
    # emitted pairs are exact-Jaccard-verified above the threshold,
    # canonically ordered, and unique
    assert (pdf["jaccard"] >= 0.3).all() and (pdf["jaccard"] <= 1.0).all()
    assert (pdf["id_a"] < pdf["id_b"]).all()
    assert not pdf.duplicated(["id_a", "id_b"]).any()


def _inv_simhash_neardup(spark, pdf):
    assert (pdf["hamming"] <= 3).all() and (pdf["hamming"] >= 0).all()
    assert (pdf["id_a"] < pdf["id_b"]).all()
    assert not pdf.duplicated(["id_a", "id_b"]).any()


# multimodal_decode_resize / multimodal_png_decode are oracle-checked
# since round 6 (full SQL replay of the text-tiled pixels + integer
# resize gather); their former structural invariants are subsumed by
# the hash check, and the PNG-vs-PPM bit-equality lives in
# tests/test_multimodal.py::test_png_decode_resize_matches_ppm_path.


# http_fanout_weather / http_fanout_pyds are oracle-checked since
# round 6 (full SQL replay of the stub fetch + rollup); the
# mapInPandas-vs-PyDS frame equality lives in
# tests/test_sources.py::test_http_pyds_matches_mapinpandas_path, and
# the real-socket proof in test_http_fanout_over_real_loopback_sockets.


def test_audit_timestamp_flags_not_vacuous(spark):
    # audit_timestamp_injection is oracle-checked since round 13
    # (deterministic derived audit facts; raw wall-clock values can't
    # hash-match). The hash check alone could pass vacuously if BOTH
    # engines rendered the flags as 0 (e.g. both regexes wrong the same
    # way) — this pins the facts to their intended TRUE values.
    pdf = SPECS["audit_timestamp_injection"].build(spark, SF_ORACLE).toPandas()
    assert len(pdf) == 25  # one audit row per nation
    assert (pdf["audit_present"] == 1).all()
    assert (pdf["audit_iso_valid"] == 1).all()
    assert (pdf["audit_single_stamp"] == 1).all()


def _inv_approx_top_terms(spark, pdf):
    # sketch capacity (100k) far exceeds the corpus vocabulary, so the
    # approximate heavy hitters must EQUAL the exact groupBy-count
    # top-10 (same counts; term set identical under count ties)
    from pyspark.sql import functions as F

    from etl_showcase_spark.catalog import table
    from etl_showcase_spark.operators import textops

    exact = (
        table(spark, SF_ORACLE, "documents")
        .select(F.explode(textops.tokens("text")).alias("term"))
        .groupBy("term")
        .count()
        .toPandas()
        .sort_values(["count", "term"], ascending=[False, True])
    )
    assert len(pdf) == 10
    got = dict(zip(pdf["term"], pdf["approx_count"]))
    truth = dict(zip(exact["term"], exact["count"]))
    # every reported count is the true count, and the reported terms
    # are a valid top-10 (counts match the exact 10 largest counts)
    assert all(truth.get(t) == c for t, c in got.items()), "sketch count drift"
    top_counts = sorted(exact["count"].tolist(), reverse=True)[:10]
    assert sorted(got.values(), reverse=True) == top_counts


def test_wav_features_match_waveform_formula(spark):
    # multimodal_wav_features is oracle-checked since round 6, but this
    # numpy recomputation stays: it proves the decoder parsed the actual
    # little-endian PCM bytes (the oracle replays the FORMULA; this
    # replays the formula against the BYTES-derived output independently)
    import numpy as np

    pdf = SPECS["multimodal_wav_features"].build(spark, SF_ORACLE).toPandas()
    assert (pdf["sample_rate"] == 8000).all()
    for _, r in pdf.sample(n=min(50, len(pdf)), random_state=7).iterrows():
        did = int(r["doc_id"])
        n = 64 + did % 64
        i = np.arange(n, dtype=np.int64)
        s = (did * 31 + i * 17) % 2048 - 1024
        assert r["n_samples"] == n
        assert r["sample_sum"] == int(s.sum())
        assert r["peak"] == int(np.abs(s).max())
        assert r["zero_crossings"] == int(((s[:-1] < 0) != (s[1:] < 0)).sum())
        assert r["rms"] == float(np.sqrt(int((s * s).sum()) / n))


# The two cluster emissions are oracle-checked (DuckDB recursive-CTE
# closure) since round 6; these equivalence checks against the
# pair-built paths remain as standalone tests below because they prove
# a DIFFERENT property — that the scalable spelling equals the O(g²)
# spelling — which the oracle alone does not.


def test_scalable_clusters_match_pair_built(spark):
    # the O(n·bands) star-edge clustering must reproduce the clusters
    # of the O(g²) verified-pair build exactly on the testdata corpus.
    # The pair-built reference is constructed inline from the operators
    # (it is deliberately no longer any registered query's build path).
    from pyspark.sql import functions as F

    from etl_showcase_spark.catalog import table
    from etl_showcase_spark.operators.dedup import minhash_lsh_pairs_md5
    from etl_showcase_spark.operators.graph import connected_components
    from etl_showcase_spark.plans.llm_text import _MH_BANDS, _MH_HASHES, _MH_THRESH

    pdf = SPECS["neardup_clusters_scalable"].build(spark, SF_ORACLE).toPandas()
    d = table(spark, SF_ORACLE, "documents")
    pairs = minhash_lsh_pairs_md5(
        d,
        "doc_id",
        "text",
        num_hashes=_MH_HASHES,
        bands=_MH_BANDS,
        shingle_n=3,
        jaccard_threshold=_MH_THRESH,
    )
    cc = connected_components(pairs, "id_a", "id_b").toPandas()
    label = dict(zip(cc["id"].astype(int), cc["component"].astype(int)))
    got = dict(zip(pdf["doc_id"].astype(int), pdf["cluster_id"].astype(int)))
    expect = {i: label.get(i, i) for i in got}
    assert got == expect, "star-edge clusters diverge from pair-built clusters"
    # structural checks that hold regardless of the reference build
    assert (pdf.groupby("cluster_id")["is_canonical"].sum() == 1).all()
    sizes = pdf.groupby("cluster_id").size().to_dict()
    assert (
        pdf["cluster_size"] == pdf["cluster_id"].map(sizes)
    ).all()


def test_embedding_clusters_match_pair_union_find(spark):
    # CC clusters must equal union-find over the FULL verified
    # pair set (the O(g²) path) on the testdata
    pdf = SPECS["embedding_neardup_clusters"].build(spark, SF_ORACLE).toPandas()
    pairs = SPECS["embedding_neardup_pairs"].build(spark, SF_ORACLE).toPandas()
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {
        int(r.vec_id): find(int(r.vec_id)) if int(r.vec_id) in parent else int(r.vec_id)
        for r in pdf.itertuples()
    }
    got = dict(zip(pdf["vec_id"].astype(int), pdf["cluster_id"].astype(int)))
    assert got == expect, "star-edge vector clusters diverge from pair union-find"
    assert (pdf.groupby("cluster_id")["is_canonical"].sum() == 1).all()


def _inv_contrastive_ivf_negatives(spark, pdf):
    # recall@5 vs the exact GEMM miner's 'neg' side on the same
    # strided anchor panel, plus the side contract itself: no emitted
    # candidate may share its anchor's label
    emb = spark.read.parquet(SF_ORACLE + "/embeddings.parquet").toPandas()
    labels = dict(zip(emb["vec_id"], emb["label"]))
    assert all(labels[q] != labels[c] for q, c in zip(pdf["q_id"], pdf["c_id"]))
    exact = SPECS["contrastive_hard_negatives"].build(spark, SF_ORACLE).toPandas()
    truth = exact[exact["side"] == "neg"].groupby("q_id")["c_id"].apply(set)
    approx = pdf.groupby("q_id")["c_id"].apply(set)
    recalls = [
        len(truth[q] & approx.get(q, set())) / len(truth[q]) for q in truth.index
    ]
    r = sum(recalls) / len(recalls)
    assert r >= 0.7, f"IVF negative-mining recall@5 {r:.2f} < 0.7"


INVARIANTS = {
    "ann_ivf_topk": _inv_ann_ivf_topk,
    "contrastive_ivf_negatives": _inv_contrastive_ivf_negatives,
    "minhash_lsh_neardup": _inv_minhash_lsh_neardup,
    "simhash_neardup": _inv_simhash_neardup,
    "approx_top_terms": _inv_approx_top_terms,
}


def test_every_rows_only_query_has_an_invariant():
    # a NEW rows-only query cannot ship without declaring what it proves
    missing = set(ROWS_ONLY_NAMES) - set(INVARIANTS)
    assert not missing, f"rows-only queries without invariants: {sorted(missing)}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(spark, name):
    spec = SPECS[name]
    pdf = spec.build(spark, SF_ORACLE).toPandas()
    assert len(pdf) > 0, f"{name} returned 0 rows — vacuous"
    assert len(pdf.columns) > 0
    INVARIANTS[name](spark, pdf)
