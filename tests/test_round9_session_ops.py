"""Round-9 session additions: the VARCHAR(n) check-constraint gate,
the sketch-then-exact-refine quantiles (GK window must bracket the
true rank), LSH tombstone-delete serving, the evolving gram-index
snapshot, GPT-style sequence packing (manifest + pieces table), and
edge cases the DuckDB oracles can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_showcase_spark.operators.relational import assert_max_length
from etl_showcase_spark.registry import all_specs

from .conftest import SF_SMOKE

SPECS = all_specs()


def test_assert_max_length_counts_and_nulls(spark):
    df = spark.createDataFrame(
        [("abc", "x"), ("abcdef", None), (None, "toolong"), ("ab", "ok")],
        ["a", "b"],
    )
    pdf = (
        assert_max_length(df, {"a": 3, "b": 2})
        .toPandas()
        .set_index("col_name")
    )
    # 'abcdef' violates a<=3; NULL satisfies any width (VARCHAR semantics)
    assert pdf.loc["a", "n_violations"] == 1
    assert pdf.loc["a", "max_len"] == 6
    assert not pdf.loc["a", "passed"]
    # 'toolong' (7) violates b<=2, 'x'/'ok' pass, NULL ignored
    assert pdf.loc["b", "n_violations"] == 1
    assert pdf.loc["b", "max_len"] == 7
    assert (pdf["n_rows"] == 4).all()


def test_assert_max_length_all_null_column(spark):
    df = spark.createDataFrame([(None,), (None,)], "a string")
    pdf = assert_max_length(df, {"a": 5}).toPandas()
    assert pdf.loc[0, "n_violations"] == 0
    assert bool(pdf.loc[0, "passed"])
    # max over an all-NULL column is NULL, not 0 — don't invent data
    assert pdf.loc[0, "max_len"] is None or str(pdf.loc[0, "max_len"]) == "nan"


def test_varchar_contract_exercises_violation_path(spark):
    pdf = SPECS["quality_varchar_contract"].build(spark, SF_SMOKE).toPandas()
    by_col = pdf.set_index("col_name")
    # the deliberately-narrow proposed width must actually fail
    assert not by_col.loc["o_orderpriority", "passed"]
    assert by_col.loc["o_orderpriority", "n_violations"] > 0
    # the declared widths must hold
    assert bool(by_col.loc["o_orderstatus", "passed"])
    assert bool(by_col.loc["lang", "passed"])


def test_sketch_refine_picks_true_rank_elements(spark):
    # the refined quantiles must equal a brute-force exact sort at the
    # same rank definition k = ceil(q*n) — the property the oracle
    # checks at sf0.01, re-asserted here against an in-Spark exact twin
    pdf = SPECS["sketch_quantiles_hll"].build(spark, SF_SMOKE).toPandas()
    from etl_showcase_spark.catalog import table

    li = (
        table(spark, SF_SMOKE, "lineitem")
        .select("l_returnflag", F.col("l_extendedprice").cast("double").alias("x"))
        .toPandas()
    )
    for flag, grp in li.groupby("l_returnflag"):
        xs = sorted(grp["x"])
        n = len(xs)
        got = pdf.set_index("l_returnflag")
        assert got.loc[flag, "n_rows"] == n
        assert got.loc[flag, "median_price"] == xs[(n + 1) // 2 - 1]
        assert got.loc[flag, "p99_price"] == xs[(99 * n + 99) // 100 - 1]
        assert bool(got.loc[flag, "hll_within_5pct"])


def test_tombstone_delete_excludes_deleted_ids(spark):
    # the serving index must answer from the DISK snapshot minus the
    # tombstones: no deleted id (vec_id % 7 == 3) may appear on either
    # side of any emitted pair, and the query must not be vacuous
    pdf = SPECS["lsh_index_tombstone_delete"].build(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    assert not (pdf["q_id"] % 7 == 3).any()
    assert not (pdf["c_id"] % 7 == 3).any()


def test_gram_index_snapshot_evolves(spark):
    # v2 must strictly contain v1 (the delta introduces new grams in
    # this corpus), and coverage must never exceed the doc's length
    pdf = SPECS["incremental_gram_index_snapshot"].build(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    assert (pdf["n_index_grams_after"] >= pdf["n_base_grams"]).all()
    assert (pdf["n_index_grams_after"] > pdf["n_base_grams"]).any()
    assert (pdf["known_tokens"] <= pdf["n_tokens"]).all()


def test_sequence_packing_invariants(spark):
    # every pack except the last must be exactly full; token mass must
    # be conserved; a pack's carryover count can only be 0 or 1 (one
    # doc can span INTO a pack from the left)
    pdf = (
        SPECS["sequence_packing"].build(spark, SF_SMOKE).toPandas()
        .sort_values("pack_id").reset_index(drop=True)
    )
    assert len(pdf) > 1
    assert (pdf["n_tokens"].iloc[:-1] == 512).all()
    assert 0 < pdf["n_tokens"].iloc[-1] <= 512
    assert pdf["n_carryover_docs"].isin([0, 1]).all()
    from etl_showcase_spark.catalog import table
    from etl_showcase_spark.operators import textops

    total = (
        table(spark, SF_SMOKE, "documents")
        .select(F.size(textops.tokens("text")).alias("n"))
        .filter(F.col("n") > 0)
        .groupBy().sum("n").collect()[0][0]
    )
    assert int(pdf["n_tokens"].sum()) == int(total)


def test_packing_pieces_rollup_equals_manifest(spark):
    # the row-level pieces table must roll up to the pack manifest:
    # token masses, doc counts, and carryover flags all agree
    pieces = SPECS["sequence_packing_pieces"].build(spark, SF_SMOKE).toPandas()
    packs = (
        SPECS["sequence_packing"].build(spark, SF_SMOKE).toPandas()
        .set_index("pack_id").sort_index()
    )
    roll = pieces.groupby("pack_id").agg(
        n_docs=("doc_id", "count"),
        n_tokens=("length", "sum"),
        first_doc=("doc_id", "min"),
        last_doc=("doc_id", "max"),
        n_carryover_docs=("doc_offset", lambda s: int((s > 0).sum())),
    )
    for col in roll.columns:
        assert (roll[col] == packs[col]).all(), col
    # within every pack, pieces tile [0, n_tokens) without gaps
    for pid, grp in pieces.groupby("pack_id"):
        g = grp.sort_values("start_offset")
        assert g["start_offset"].iloc[0] == 0
        ends = (g["start_offset"] + g["length"]).tolist()
        assert ends[:-1] == g["start_offset"].iloc[1:].tolist()


def test_packed_clean_corpus_conserves_kept_tokens(spark):
    # the composed dedup->pack pipeline must conserve exactly the
    # SURVIVING token mass, in full packs except the tail
    packs = (
        SPECS["packed_clean_corpus"].build(spark, SF_SMOKE).toPandas()
        .sort_values("pack_id").reset_index(drop=True)
    )
    kept_total = (
        SPECS["exact_substr_span_removal"].build(spark, SF_SMOKE).toPandas()
        ["n_kept"].sum()
    )
    assert int(packs["n_tokens"].sum()) == int(kept_total)
    assert (packs["n_tokens"].iloc[:-1] == 512).all()
    # the corpus has >=50-token duplicated runs at smoke scale, so the
    # clean manifest must differ from the raw one (the composition is
    # not a no-op)
    raw = SPECS["sequence_packing"].build(spark, SF_SMOKE).toPandas()
    assert int(packs["n_tokens"].sum()) < int(raw["n_tokens"].sum())


def test_gram_compaction_reduces_files_and_preserves_probe(spark):
    # the compaction must actually pay down the deliberately fragmented
    # v=2 landing (24 files -> few), and the probe numbers must be
    # sane (coverage bounded by doc length, index non-empty)
    import glob

    from etl_showcase_spark.plans.mlprep import gram_index_compaction_probe

    pdf = SPECS["gram_index_compaction_probe"].build(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    assert (pdf["known_tokens"] <= pdf["n_tokens"]).all()
    assert (pdf["n_index_grams"] > 0).all()
    # THIS build's snapshot base, exposed by the query fn — a /tmp-wide
    # glob could match a stale or foreign run and mask a regression
    base = gram_index_compaction_probe.last_base
    files = {
        v.rsplit("=", 1)[1]: len(glob.glob(v + "/*.parquet"))
        for v in glob.glob(base + "/v=*")
    }
    # the fragmented landing: .repartition(24) yields AT MOST 24 part
    # files — fewer if some partitions land empty (fewer distinct grams
    # than partitions), so pin genuine fragmentation, not the exact count
    assert 2 <= files["2"] <= 24
    assert files["3"] < files["2"]  # compaction paid it down
