"""Round-8 session additions: Hilbert layout (bijection, unit-step
locality, Spark-vs-reference equality), the longest-duplicate-span
audit, and cross-checks the DuckDB oracles can't express."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etl_showcase_spark.operators.layout import hilbert_xy2d_py
from etl_showcase_spark.registry import all_specs

from .conftest import SF_SMOKE

SPECS = all_specs()


def test_hilbert_reference_bijection_and_locality():
    # exhaustive at 5 bits: every cell hit exactly once, every step of
    # the curve moves to an L1-ADJACENT cell — the property Morton
    # lacks and the whole reason Hilbert layout exists
    bits = 5
    n = 1 << bits
    inv = {}
    for x in range(n):
        for y in range(n):
            inv[hilbert_xy2d_py(x, y, bits)] = (x, y)
    assert len(inv) == n * n
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_morton_has_jumps_hilbert_does_not():
    # the locality separation, stated as a deterministic fact: the
    # Morton curve jumps |dx|+|dy| > 1 at power-of-two boundaries
    # (d=3 -> d=4 goes (1,1) -> (0,2)... in interleave order), while
    # the Hilbert walk above proved unit steps everywhere
    def unspread(z: int) -> int:
        x = z & 0x55555555
        x = (x | (x >> 1)) & 0x33333333
        x = (x | (x >> 2)) & 0x0F0F0F0F
        x = (x | (x >> 4)) & 0x00FF00FF
        x = (x | (x >> 8)) & 0x0000FFFF
        return x

    jumps = 0
    for d in range(255):
        x1, y1 = unspread(d), unspread(d >> 1)
        x2, y2 = unspread(d + 1), unspread((d + 1) >> 1)
        if abs(x1 - x2) + abs(y1 - y2) > 1:
            jumps += 1
    assert jumps > 0, "Morton should jump at power-of-two boundaries"


def test_with_hilbert_matches_python_reference(spark):
    from etl_showcase_spark.operators.layout import with_hilbert

    rng = random.Random(8)
    vals = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(200)]
    vals += [(0, 0), (65535, 65535), (0, 65535), (65535, 0), (1, 0), (0, 1)]
    df = spark.createDataFrame(vals, ["a", "b"])
    out = with_hilbert(df, F.col("a"), F.col("b"), out="h", bits=16).collect()
    for r in out:
        assert r["h"] == hilbert_xy2d_py(r["a"], r["b"], 16), (r["a"], r["b"])


def test_hilbert_buckets_partition_orders(spark):
    pdf = SPECS["hilbert_layout_buckets"].build(spark, SF_SMOKE).toPandas()
    import pandas as pd

    n = len(pd.read_parquet(f"{SF_SMOKE}/orders.parquet"))
    assert pdf["n_orders"].sum() == n
    assert pdf["h_bucket"].is_unique
    # bucket id is exactly the code's top bits: h_min/h_max confirm
    # (// 65536 == >> 16 on non-negative codes; this pandas build has
    # no Series.__rshift__)
    assert ((pdf["h_min"] // 65536) == pdf["h_bucket"]).all()
    assert ((pdf["h_max"] // 65536) == pdf["h_bucket"]).all()


def test_longest_spans_agree_with_exact_substr(spark):
    top = SPECS["longest_duplicate_spans"].build(spark, SF_SMOKE).toPandas()
    ex = SPECS["exact_substr_span_removal"].build(spark, SF_SMOKE).toPandas()
    assert len(top) > 0
    # the global argmax run length must equal the per-doc max's max
    assert top["run_len"].max() == ex["max_run_len"].max()
    # every reported run is a real maximal run of its document
    m = ex.set_index("doc_id")["max_run_len"]
    assert (top["run_len"] <= top["doc_id"].map(m)).all()
    # k-bounded output
    assert len(top) <= 20


def test_budget_sample_never_exceeds_target(spark):
    """The deterministic prefix sampler must (a) never exceed any
    source's token target, (b) land within one document of it when the
    source has enough tokens, and (c) pin a non-empty sample for every
    source with a positive target on this lake."""
    pdf = SPECS["temperature_mix_budget_sample"].build(spark, SF_SMOKE).toPandas()
    assert (pdf["sampled_tokens"] <= pdf["target_tokens"]).all()
    assert ((pdf["fill_ratio"] >= 0) & (pdf["fill_ratio"] <= 1)).all()
    # max doc length on this lake is 99 tokens: for any source with
    # enough tokens to fill its target, a fill gap larger than one
    # document means the prefix rule was violated
    supplied = pdf[pdf["source_tokens"] >= pdf["target_tokens"]]
    gap = supplied["target_tokens"] - supplied["sampled_tokens"]
    assert (gap <= 99).all()
    assert (pdf.loc[pdf["target_tokens"] > 0, "n_docs_sampled"] > 0).all()


def test_incremental_coverage_consistent_with_full(spark):
    """Delta-vs-base coverage can only see FEWER covered positions
    than the all-corpus duplicate_span_coverage sees for the same
    documents (the base index is a subset of 'some other document')."""
    inc = (
        SPECS["incremental_span_coverage"]
        .build(spark, SF_SMOKE)
        .toPandas()
        .set_index("doc_id")
    )
    assert ((inc["known_tokens"] <= inc["n_tokens"])).all()
    assert (inc["fully_known"] == (inc["known_tokens"] == inc["n_tokens"])).all()
    # the replica-heavy smoke lake must surface at least one arriving
    # document that is already fully known to the base corpus
    assert inc["fully_known"].any()


def test_bpe_second_merge_semantics(spark):
    """After applying the arg-max merge, the merged pair can no longer
    exist as an adjacency (greedy left-to-right replacement consumes
    every occurrence), and recounted pairs are spaced symbol pairs."""
    pdf = SPECS["bpe_second_merge"].build(spark, SF_SMOKE).toPandas()
    assert 0 < len(pdf) <= 10
    assert pdf["merged_pair"].nunique() == 1
    merged = pdf["merged_pair"].iloc[0]
    spaced = f"{merged[0]} {merged[1]}"
    assert spaced not in set(pdf["pair"])
    # every recounted pair is two space-separated symbols
    assert (pdf["pair"].str.count(" ") == 1).all()
    # counts are positive and sorted output is deterministic
    assert (pdf["n_occurrences"] > 0).all()


def test_layout_locality_compare_shape(spark):
    """One row per layout, bucket accounting consistent; direction is
    dataset-dependent (Hilbert wins on sf0.01, Morton on the tiny
    sf0.001 slab), so no inequality is asserted — the curve-level
    locality guarantee is the exhaustive unit-step test above."""
    pdf = SPECS["layout_locality_compare"].build(spark, SF_SMOKE).toPandas()
    assert sorted(pdf["layout"]) == ["hilbert", "morton"]
    assert (pdf["n_buckets"] > 0).all()
    assert (pdf["max_semiperim"] >= 0).all()
    assert (pdf["sum_semiperim"] >= pdf["max_semiperim"]).all()
    eps = 1e-9
    assert (
        (pdf["avg_semiperim"] - pdf["sum_semiperim"] / pdf["n_buckets"]).abs() < eps
    ).all()


def test_post_dedup_report_consistent_with_per_doc(spark):
    """The corpus report must aggregate the per-doc removal exactly:
    token accounting ties out, surviving counts match, and the corpus
    pin changes iff any document's surviving text changes."""
    rep = SPECS["post_dedup_corpus_report"].build(spark, SF_SMOKE).toPandas()
    ex = SPECS["exact_substr_span_removal"].build(spark, SF_SMOKE).toPandas()
    assert rep["n_docs"].sum() == len(ex)
    assert rep["total_tokens"].sum() == ex["n_tokens"].sum()
    assert rep["kept_tokens"].sum() == ex["n_kept"].sum()
    assert rep["removed_tokens"].sum() == ex["n_removed"].sum()
    assert (rep["kept_tokens"] + rep["removed_tokens"] == rep["total_tokens"]).all()
    assert (rep["n_surviving"] <= rep["n_docs"]).all()
    assert rep["corpus_md5"].nunique() == len(rep)  # distinct per source
