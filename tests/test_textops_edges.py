"""Edge-case behavior of the curation-quality text operators: empty /
whitespace-only / too-short documents must hit the NULL guards (not
divide-by-zero, which ANSI mode escalates to an error), and the flag
semantics must match the documented Gopher bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_showcase_spark.operators import textops

from .conftest import SF_SMOKE


def _one(spark, text, col):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(col.alias("v"))
        .collect()[0]["v"]
    )


def test_repetition_ratio_degenerate_docs(spark):
    # no 2-gram exists → NULL, never 0/0
    for text in ("", "   ", "one"):
        assert _one(spark, text, textops.repetition_ratio(F.col("text"), 2)) is None


def test_repetition_ratio_values(spark):
    # "a b a b a" → grams [a b, b a, a b, b a]: 4 total, 2 distinct
    got = _one(spark, "a b a b a", textops.repetition_ratio(F.col("text"), 2))
    assert got == pytest.approx(0.5)
    # all-distinct grams → ratio 0
    got = _one(spark, "w x y z", textops.repetition_ratio(F.col("text"), 2))
    assert got == pytest.approx(0.0)


def test_gopher_flags_empty_doc(spark):
    flags = textops.gopher_quality_flags(F.col("text"))
    df = spark.createDataFrame([("",), ("   ",)], "text string").select(
        *[c.alias(n) for n, c in flags.items()]
    )
    for r in df.collect():
        assert r["n_tokens"] == 0
        assert r["mean_word_len"] is None
        assert r["flag_word_count"] == 0
        assert r["flag_mean_word_len"] == 0
        assert r["keep"] == 0


def test_gopher_keep_requires_all_flags(spark):
    flags = textops.gopher_quality_flags(F.col("text"))
    good = " ".join(["word"] * 60)  # 60 tokens, mean len 4, no symbols
    bad_len = " ".join(["w"] * 60)  # mean len 1 < 3
    df = spark.createDataFrame([(good,), (bad_len,)], "text string").select(
        "text", *[c.alias(n) for n, c in flags.items()]
    )
    rows = {r["text"]: r for r in df.collect()}
    assert rows[good]["keep"] == 1
    assert rows[bad_len]["keep"] == 0
    assert rows[bad_len]["flag_mean_word_len"] == 0
    assert rows[bad_len]["flag_word_count"] == 1


def test_pii_counts(spark):
    counts = textops.pii_pattern_counts(F.col("text"))
    text = (
        "mail a@b.com and c.d+x@e.org, see https://example.com/x?q=1 "
        "card 1234567890 short 12345"
    )
    df = spark.createDataFrame([(text,)], "text string").select(
        *[c.alias(n) for n, c in counts.items()]
    )
    r = df.collect()[0]
    assert r["n_emails"] == 2
    assert r["n_urls"] == 1
    assert r["n_digit_runs"] == 1  # 6+ digits only; '12345' excluded


def test_simhash_md5_empty_docs_pair_safely(spark):
    from etl_showcase_spark.operators.dedup import simhash_md5_pairs

    df = spark.createDataFrame(
        [(1, ""), (2, ""), (3, "real content here with words")],
        "doc_id long, text string",
    )
    out = simhash_md5_pairs(df, "doc_id", "text").collect()
    # both empty docs have signature 0 → hamming 0 pair; no crash
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in out}
    assert pairs.get((1, 2)) == 0


def test_grouped_rank_trend_arrow_twin_equality(spark):
    # the applyInArrow binding must produce bit-identical results to
    # the applyInPandas one on real data (incl. NULL values and ties)
    from pyspark.sql import functions as F

    from etl_showcase_spark.catalog import table
    from etl_showcase_spark.operators.textops import (
        grouped_rank_trend,
        grouped_rank_trend_arrow,
    )

    ev = table(spark, SF_SMOKE, "events")
    a = {
        r["key"]: (r["n_obs"], r["slope_per_event"])
        for r in grouped_rank_trend(ev, "user_id", "ts", "event_id", "value").collect()
    }
    b = {
        r["key"]: (r["n_obs"], r["slope_per_event"])
        for r in grouped_rank_trend_arrow(
            ev, "user_id", "ts", "event_id", "value"
        ).collect()
    }
    assert a == b and len(a) > 0
