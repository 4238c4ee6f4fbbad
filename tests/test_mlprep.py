"""Invariants for the round-7 ML-prep family (plans/mlprep.py) beyond
the automatic DuckDB oracle parity in test_oracle_parity.py: algorithm-
quality checks the SQL twin can't express (eigenvector alignment), the
floor-division lemma three queries share, and accounting identities."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_showcase_spark.registry import all_specs

from .conftest import SF_SMOKE

SPECS = all_specs()


# ---------------------------------------------------------------------------
# the pmod floor-division lemma used by Lloyd requantization, power
# iteration, and their oracles: (a - pmod(a,b)) / b == floor(a/b)
# ---------------------------------------------------------------------------


@given(
    a=st.integers(min_value=-(10**15), max_value=10**15),
    b=st.integers(min_value=1, max_value=10**9),
)
@settings(max_examples=300, deadline=None)
def test_pmod_floordiv_lemma(a, b):
    assert (a - ((a % b) + b) % b) // b == math.floor(a / b) == a // b


def test_power_iteration_rayleigh_quality(spark):
    """The fixed-point loading vector must climb the spectrum of XᵀX:
    its Rayleigh quotient must reach >= 0.85·λmax and clearly beat the
    isotropic average (trace/dim — what a random direction scores).
    This is the quality bar the oracle's bit-replay can't see: both
    engines could agree on a uselessly wrong direction. (The synthetic
    embeddings are near-isotropic, λ1/λ2 ≈ 1.07, so exact-alignment
    assertions are not meaningful at any fixed round count; Rayleigh
    mass is.)"""
    import numpy as np
    import pandas as pd

    pdf = SPECS["power_iteration_principal_dim"].build(spark, SF_SMOKE).toPandas()
    v = pdf.sort_values("dim_i")["loading"].to_numpy().astype("float64")

    raw = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    X = np.stack(raw["embedding"].to_numpy()).astype("float64")
    # same quantization the query uses, so we compare like with like
    Xq = np.floor(X * 100 + 0.5)
    A = Xq.T @ Xq
    lmax = np.linalg.eigvalsh(A)[-1]
    ray = (v @ A @ v) / (v @ v)
    assert ray >= 0.85 * lmax, f"rayleigh {ray / lmax:.3f}·λmax < 0.85"
    assert ray > 1.2 * np.trace(A) / A.shape[0], "no better than a random direction"
    # normalization contract: max|loading| == scale exactly
    assert int(np.abs(v).max()) == 100


def test_kmeans_sizes_partition_the_corpus(spark):
    import pandas as pd

    pdf = SPECS["kmeans_lloyd_clusters"].build(spark, SF_SMOKE).toPandas()
    n = len(pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet"))
    assert pdf["n_vecs"].sum() == n
    assert (pdf["inertia"] >= 0).all()
    assert pdf["cluster"].is_unique


def test_semdedup_accounting_identity(spark):
    import pandas as pd

    pdf = SPECS["semantic_dedup_prune"].build(spark, SF_SMOKE).toPandas()
    assert ((pdf["n_kept"] + pdf["n_dropped"]) == pdf["n_vecs"]).all()
    n = len(pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet"))
    assert pdf["n_vecs"].sum() == n
    # dropping is strictly optional: at least one representative stays
    assert (pdf["n_kept"] >= 1).all()


def test_duplicate_span_coverage_bounded(spark):
    pdf = SPECS["duplicate_span_coverage"].build(spark, SF_SMOKE).toPandas()
    assert ((pdf["dup_coverage"] >= 0) & (pdf["dup_coverage"] <= 1)).all()
    assert (pdf["covered_tokens"] <= pdf["total_tokens"]).all()


def test_token_budget_epochs_consistent(spark):
    pdf = SPECS["source_token_budget_epochs"].build(spark, SF_SMOKE).toPandas()
    # oversampled <=> needs more than one epoch (exact integer ceil-div)
    assert (pdf["oversampled"] == (pdf["epochs_needed"] > 1)).all()
    assert (pdf["share_ppm"].sum() <= 1_000_000) and pdf["share_ppm"].sum() > 999_000


def test_semdedup_drops_planted_duplicates(spark):
    """Semantic-dedup semantics the oracle can't see: PLANT exact
    duplicate vectors and assert the pruner drops all but one copy of
    each planted group (identical vectors share cluster, adjacent
    ranks, cosine 1.0 > tau)."""
    import pandas as pd

    from etl_showcase_spark.plans.mlprep import semantic_dedup_prune

    raw = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    n = len(raw)
    planted = raw.head(10).copy()
    planted["vec_id"] = planted["vec_id"] + n  # copies of vecs 0..9
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        pd.concat([raw, planted]).to_parquet(f"{tmp}/embeddings.parquet")
        after = semantic_dedup_prune(spark, tmp).toPandas()
        # Assert the planted semantics directly: each planted pair is an
        # exact duplicate (cosine 1.0 > tau, same cluster, adjacent
        # ranks), so at least one member of each pair must be dropped —
        # i.e. total drops >= planted count. (Do NOT compare against the
        # unplanted baseline: planting shifts the round-1 centroid
        # update, so drops among the ORIGINAL corpus can legitimately
        # decrease — a baseline-delta inequality is empirical on the
        # current fixed testdata, not an invariant.)
        assert after["n_dropped"].sum() >= len(planted), (
            "planted exact duplicates survived the prune"
        )
        assert after["n_vecs"].sum() == n + len(planted)


def test_duplicate_span_removal_roundtrip(spark):
    """The removal transform must (a) keep every token of a document
    with no cross-document 8-grams (kept_fraction == 1) and (b) agree
    with duplicate_span_coverage on the removed mass per source."""
    rem = SPECS["duplicate_span_removal"].build(spark, SF_SMOKE).toPandas()
    assert ((rem["n_kept"] + rem["n_removed"]) == rem["n_tokens"]).all()
    assert ((rem["kept_fraction"] >= 0) & (rem["kept_fraction"] <= 1)).all()
    cov = SPECS["duplicate_span_coverage"].build(spark, SF_SMOKE).toPandas()
    # total removed tokens == total covered tokens (same position sets)
    assert rem["n_removed"].sum() == cov["covered_tokens"].sum()
    # untouched docs rebuild to their full token stream
    full = rem[rem["n_removed"] == 0]
    assert (full["kept_fraction"] == 1.0).all()


def test_fdiv_exact_past_2_53(spark):
    """_fdiv must be exact over the full int64 range: the old
    ((a - pmod) / b).cast('long') spelling went through a double and
    returned 126 on the witness below (true floor 127) once the
    numerator crossed 2^53."""
    from pyspark.sql import functions as F

    from etl_showcase_spark.plans.mlprep import _fdiv

    row = (
        spark.range(1)
        .select(
            _fdiv(
                F.lit(5033222943549319568), F.lit(39631676720860784)
            ).alias("q"),
            _fdiv(F.lit(-7), F.lit(2)).alias("neg"),
        )
        .first()
    )
    assert row.q == 5033222943549319568 // 39631676720860784 == 127
    assert row.neg == -4  # true floor, not truncation


def test_exact_substr_maximal_run_invariants(spark):
    """Lee et al. ExactSubstr semantics the oracle replay can't prove
    on its own: the >= 50-token maximal-run removal must be a SUBSET of
    the 8-gram coverage removal, every removed run must contribute at
    least the threshold's worth of tokens, and sub-threshold docs must
    survive intact."""
    from etl_showcase_spark.plans.mlprep import _EXSUB_MIN_RUN

    ex = (
        SPECS["exact_substr_span_removal"]
        .build(spark, SF_SMOKE)
        .toPandas()
        .set_index("doc_id")
    )
    rem = (
        SPECS["duplicate_span_removal"]
        .build(spark, SF_SMOKE)
        .toPandas()
        .set_index("doc_id")
    )
    assert ((ex["n_kept"] + ex["n_removed"]) == ex["n_tokens"]).all()
    j = ex.join(rem, lsuffix="_ex", rsuffix="_cov")
    assert len(j) == len(ex) == len(rem)
    # maximal-run removal excises a subset of the covered positions
    assert (j["n_removed_ex"] <= j["n_removed_cov"]).all()
    # islands are disjoint, each removed one is >= the threshold long
    assert (ex["n_removed"] >= _EXSUB_MIN_RUN * ex["n_removed_runs"]).all()
    # max run below threshold => nothing removed, text intact
    short = ex[ex["max_run_len"] < _EXSUB_MIN_RUN]
    assert (short["n_removed"] == 0).all()
    assert (short["kept_fraction"] == 1.0).all()
    # where the 8-gram pass removed nothing, both transforms rebuild
    # the identical full token stream (md5-equal)
    untouched = j[j["n_removed_cov"] == 0]
    assert (
        untouched["kept_text_md5_ex"] == untouched["kept_text_md5_cov"]
    ).all()
    # the smoke lake actually exercises the removal branch
    assert (ex["n_removed_runs"] > 0).any()
    assert ((ex["n_removed_runs"] > 0) & (ex["n_kept"] > 0)).any()


@given(n=st.integers(min_value=1, max_value=2**52 - 1))
@settings(max_examples=2000, deadline=None)
def test_isqrt_floor_contract(n):
    """The seed/Newton/correct integer-sqrt spelling both engines
    replay must equal floor(sqrt(n)) on the full documented domain."""
    s0 = max(1, math.floor(math.sqrt(float(n))))
    s1 = (s0 + n // s0) // 2
    r = s1 - (1 if s1 * s1 > n else 0)
    assert r == math.isqrt(n)


def test_temperature_mix_limits(spark):
    """alpha=0 must reproduce the equal-share budget table exactly;
    alpha=1 must reproduce corpus-proportional shares; alpha=1/2 must
    sit between them (smaller sources gain share as alpha falls)."""
    mix = SPECS["temperature_scaled_mix"].build(spark, SF_SMOKE).toPandas()
    eq = (
        SPECS["source_token_budget_epochs"]
        .build(spark, SF_SMOKE)
        .toPandas()
        .set_index("source")
    )
    a0 = mix[mix["alpha_halves"] == 0].set_index("source")
    assert (a0["target_tokens"] == eq["target_tokens"]).all()
    assert (a0["epochs_needed"] == eq["epochs_needed"]).all()
    assert (a0["oversampled"] == eq["oversampled"]).all()
    a1 = mix[mix["alpha_halves"] == 2].set_index("source")
    tot = int(a1["tokens"].sum())
    assert (a1["share_ppm"] == a1["tokens"] * 1_000_000 // tot).all()
    # alpha=1/2 weights are exact integer square roots
    ah = mix[mix["alpha_halves"] == 1].set_index("source")
    w = ah["mix_weight"]
    assert ((w * w <= ah["tokens"]) & ((w + 1) * (w + 1) > ah["tokens"])).all()
    # Monotonicity in alpha holds for the EXTREME sources only
    # (d/dalpha log share_i = log p_i - E_w[log p], which has a fixed
    # sign only when p_i is the max or min; mid-distribution sources
    # can move non-monotonically — observed on the smoke lake):
    # the largest source's share rises with alpha, the smallest falls.
    big = ah["tokens"].idxmax()
    small = ah["tokens"].idxmin()
    assert (
        a0.loc[big, "share_ppm"]
        <= ah.loc[big, "share_ppm"] + 1
        <= a1.loc[big, "share_ppm"] + 2
    )
    assert (
        a0.loc[small, "share_ppm"] + 2
        >= ah.loc[small, "share_ppm"] + 1
        >= a1.loc[small, "share_ppm"]
    )


def test_semdedup_2level_accounting_and_planted(spark):
    """Two-level SemDeDup must partition the corpus exactly like the
    flat variant (accounting identity, unique cells), and planted
    exact-duplicate vectors must be pruned: identical vectors get
    identical coarse AND fine assignments (equal distances, same
    tie-breaks), adjacent ranks, cosine 1.0 > tau."""
    import tempfile

    import pandas as pd

    from etl_showcase_spark.plans.mlprep import semantic_dedup_prune_2level

    pdf = SPECS["semantic_dedup_prune_2level"].build(spark, SF_SMOKE).toPandas()
    assert ((pdf["n_kept"] + pdf["n_dropped"]) == pdf["n_vecs"]).all()
    raw = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    n = len(raw)
    assert pdf["n_vecs"].sum() == n
    assert not pdf.duplicated(["cluster_coarse", "cluster_fine"]).any()
    assert (pdf["n_kept"] >= 1).all()

    planted = raw.head(10).copy()
    planted["vec_id"] = planted["vec_id"] + n
    with tempfile.TemporaryDirectory() as tmp:
        pd.concat([raw, planted]).to_parquet(f"{tmp}/embeddings.parquet")
        after = semantic_dedup_prune_2level(spark, tmp).toPandas()
        assert after["n_dropped"].sum() >= len(planted), (
            "planted exact duplicates survived the two-level prune"
        )
        assert after["n_vecs"].sum() == n + len(planted)
