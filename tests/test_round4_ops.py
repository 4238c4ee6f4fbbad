"""Operator-level tests for the round-4 additions: context-window
chunking, int8 quantization, z-order layout, cohort retention, z-score
outliers. The oracle-parity gate (test_oracle_parity.py) proves these
against DuckDB at sf0.01; here we pin the operator semantics on
hand-computable fixtures, the reference's own test style
(tests/test_spark_transform.py:104-218)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_showcase_spark.registry import all_specs

from .conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# doc_chunks_overlap
# ---------------------------------------------------------------------------


def test_chunking_boundaries(spark):
    from etl_showcase_spark.plans.llm_text import _CHUNK, _STRIDE

    texts = [
        (1, "a" * 10),              # shorter than a chunk -> 1 chunk
        (2, "b" * _CHUNK),          # exactly one chunk
        (3, "c" * (_CHUNK + 1)),    # one char over -> 2 chunks
        (4, "d" * (_CHUNK + _STRIDE)),  # exactly 2 full strides
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    n_chunks = F.lit(1) + F.when(F.length("text") <= _CHUNK, F.lit(0)).otherwise(
        F.expr(f"(length(text) - {_CHUNK} + {_STRIDE} - 1) div {_STRIDE}")
    )
    got = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", n_chunks.alias("n")).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 2}


def test_chunking_overlap_property(spark):
    # consecutive chunks of the same doc share CHUNK-STRIDE characters
    from etl_showcase_spark.plans.llm_text import _CHUNK, _STRIDE

    text = "".join(chr(ord("a") + (i % 26)) for i in range(1000))
    chunks = [text[i * _STRIDE : i * _STRIDE + _CHUNK] for i in range(5) if i * _STRIDE < len(text)]
    for prev, nxt in zip(chunks, chunks[1:]):
        assert prev[_STRIDE:] == nxt[: _CHUNK - _STRIDE]
    # every chunk the operator emits matches the slice formula
    spec = all_specs()["doc_chunks_overlap"]
    out = spec.build(spark, SF_SMOKE)
    assert out.filter(F.col("chunk_len") > _CHUNK).count() == 0
    assert out.filter((F.col("chunk_idx") > 0) & (F.col("chunk_len") <= 0)).count() == 0


# ---------------------------------------------------------------------------
# int8 quantization
# ---------------------------------------------------------------------------


def test_int8_quantize_bounds_and_error(spark):
    from etl_showcase_spark.operators.similarity import int8_quantize, int8_scale

    vecs = [
        (1, [0.5, -1.0, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),  # all-zero: scale 0, q all 0
        (3, [100.0, -0.001, 3.14, -99.9]),
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    scale = int8_scale(F.col("embedding"))
    out = df.select(
        "vec_id",
        "embedding",
        scale.alias("scale"),
        int8_quantize(F.col("embedding"), scale).alias("q"),
    ).collect()
    for r in out:
        assert all(-127 <= q <= 127 for q in r["q"])
        if r["scale"] == 0:
            assert all(q == 0 for q in r["q"])
        else:
            # round-half-up: |x - q*scale| <= scale/2
            for x, q in zip(r["embedding"], r["q"]):
                assert abs(x - q * r["scale"]) <= r["scale"] / 2 + 1e-12


def test_int8_rerank_recall_vs_exact(spark):
    # int8 candidates + exact re-rank must recover most of the exact
    # top-10 (quantization is 4x compression, not a free lunch — but
    # recall collapse would mean the candidate stage is broken)
    exact = all_specs()["ann_cosine_topk"].build(spark, SF_SMOKE).toPandas()
    got = all_specs()["ann_int8_rerank_topk"].build(spark, SF_SMOKE).toPandas()
    truth = exact.groupby("q_id")["c_id"].apply(set)
    approx = got.groupby("q_id")["c_id"].apply(set)
    recalls = [
        len(truth[q] & approx.get(q, set())) / len(truth[q]) for q in truth.index
    ]
    assert sum(recalls) / len(recalls) >= 0.9


# ---------------------------------------------------------------------------
# z-order layout
# ---------------------------------------------------------------------------


def _py_spread16(x: int) -> int:
    x &= 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def test_spread_bits_matches_python_reference(spark):
    from etl_showcase_spark.operators.layout import spread_bits16, zorder_value

    vals = [(0, 0), (1, 2), (65535, 65535), (12345, 54321), (256, 255)]
    df = spark.createDataFrame(vals, ["a", "b"])
    out = df.select(
        "a",
        "b",
        spread_bits16(F.col("a")).alias("sa"),
        zorder_value(F.col("a"), F.col("b")).alias("z"),
    ).collect()
    for r in out:
        assert r["sa"] == _py_spread16(r["a"])
        assert r["z"] == _py_spread16(r["a"]) | (_py_spread16(r["b"]) << 1)


def test_zorder_layout_partitions_are_z_ranges(spark):
    from etl_showcase_spark.operators.layout import zorder_layout, zorder_value

    df = spark.range(0, 4096).select(
        (F.col("id") * 7919 % 65536).alias("a"), (F.col("id") * 104729 % 65536).alias("b")
    )
    z = zorder_value(F.col("a"), F.col("b"))
    laid = zorder_layout(df, z, num_partitions=8)
    # re-derive z per row with its partition id: partitions must cover
    # disjoint, sorted z-ranges (the repartitionByRange+sort contract
    # that makes written files prunable)
    withz = laid.withColumn("__z", zorder_value(F.col("a"), F.col("b"))).withColumn(
        "__pid", F.spark_partition_id()
    )
    stats = (
        withz.groupBy("__pid")
        .agg(F.min("__z").alias("lo"), F.max("__z").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    for prev, nxt in zip(stats, stats[1:]):
        assert prev["hi"] <= nxt["lo"]


def test_zorder_buckets_are_rectangles(spark):
    # each z bucket's key ranges must be tight rectangles: the span of
    # custkey%65536 and day%65536 inside one top-16-bit bucket is at
    # most 2^8 in each dimension (8 interleaved bits remain per key)
    pdf = all_specs()["zorder_layout_buckets"].build(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 1
    assert (pdf["n_orders"] > 0).all()
    # z ranges of distinct buckets never overlap
    pdf = pdf.sort_values("z_min")
    assert (pdf["z_max"].values[:-1] <= pdf["z_min"].values[1:]).all()


# ---------------------------------------------------------------------------
# cohort retention / z-score outliers
# ---------------------------------------------------------------------------


def test_cohort_retention_invariants(spark):
    pdf = all_specs()["cohort_retention"].build(spark, SF_SMOKE).toPandas()
    base = pdf[pdf["week_offset"] == 0]
    assert (base["retention_pct"] == 1.0).all()
    assert (base["n_active"] == base["cohort_size"]).all()
    assert (pdf["retention_pct"] <= 1.0).all() and (pdf["retention_pct"] > 0).all()
    assert (pdf["week_offset"] >= 0).all()


def test_zscore_matches_pandas(spark):
    import numpy as np

    spec = all_specs()["zscore_outlier_events"]
    got = spec.build(spark, SF_SMOKE).toPandas()
    from etl_showcase_spark.catalog import table

    ev = table(spark, SF_SMOKE, "events").select("event_id", "event_type", "value").toPandas()
    flagged = set()
    for t, g in ev.groupby("event_type"):
        mu, sd = g["value"].mean(), g["value"].std(ddof=0)
        if sd > 0:
            flagged |= set(g.loc[np.abs((g["value"] - mu) / sd) > 3, "event_id"])
    assert set(got["event_id"]) == flagged


# ---------------------------------------------------------------------------
# fixed-point PageRank
# ---------------------------------------------------------------------------


def test_pagerank_matches_python_reference(spark):
    from etl_showcase_spark.operators.graph import pagerank_fixed_point

    # small directed graph incl. a hub; both directions added so every
    # node is a src
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (4, 5)]
    edges = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["rank"]
        for r in pagerank_fixed_point(df, iterations=4).collect()
    }

    SCALE = 10**12
    nodes = sorted({x for e in edges for x in e})
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    n = len(nodes)
    rank = {v: SCALE // n for v in nodes}
    for _ in range(4):
        incoming = {v: 0 for v in nodes}
        for u, nbrs in out.items():
            f = rank[u] // len(nbrs)
            for v in nbrs:
                incoming[v] += f
        rank = {
            v: (15 * (SCALE // n)) // 100 + (85 * incoming[v]) // 100 for v in nodes
        }
    assert got == rank
    # the hub (node 1, degree 3) outranks the leaf (node 5, degree 1)
    assert got[1] > got[5]


def test_cogroup_funnel_survives_count_only_plan(spark):
    # Catalyst prunes cogroup inputs to the grouping key when only
    # cardinality is consumed; the UDF must tolerate the starved frame
    # (regression: KeyError 'ts' under .count())
    from etl_showcase_spark.catalog import table

    spec = all_specs()["cogroup_user_funnel"]
    expected = (
        table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type").isin("purchase", "view"))
        .select("user_id")
        .distinct()
        .count()
    )
    assert expected > 0
    assert spec.build(spark, SF_SMOKE).count() == expected


def test_persist_cache_entries_do_not_accumulate(spark):
    # the multi-consumer persist pattern relies on Spark's CacheManager
    # keying entries by logical plan: rebuilding the same registered
    # query must REUSE its cache entry, not add one per build
    from etl_showcase_spark.caching import release_all

    release_all()  # start from a clean tracked-FIFO state
    fn = all_specs()["minhash_md5_neardup"].build
    fn(spark, SF_SMOKE).write.format("noop").mode("overwrite").save()
    jsc = spark.sparkContext._jsc.sc()
    after_first = len(jsc.getRDDStorageInfo())
    for _ in range(3):
        fn(spark, SF_SMOKE).write.format("noop").mode("overwrite").save()
    after_rebuilds = len(jsc.getRDDStorageInfo())
    assert after_rebuilds == after_first, (
        f"cache grew {after_first} -> {after_rebuilds} across identical rebuilds"
    )


def test_random_projection_gemm_equals_fold(spark):
    # the Arrow-GEMM projection must produce the identical exact
    # integers as the JVM fold spelling on the same matrix
    from etl_showcase_spark.catalog import table
    from etl_showcase_spark.operators.similarity import (
        quantize,
        random_projection,
        random_projection_gemm,
    )
    from etl_showcase_spark.plans.llm_vector import _jl_matrix

    e = table(spark, SF_SMOKE, "embeddings").limit(100)
    m = _jl_matrix()
    q = e.select("vec_id", quantize(F.col("embedding")).alias("qv"))
    a = q.select("vec_id", random_projection(F.col("qv"), m).alias("p")).collect()
    b = q.select("vec_id", random_projection_gemm(F.col("qv"), m).alias("p")).collect()
    da = {r["vec_id"]: list(r["p"]) for r in a}
    db = {r["vec_id"]: list(r["p"]) for r in b}
    assert da == db


def test_zorder_written_files_have_tight_stats(spark, tmp_path):
    # the actual pruning claim, measured: write the same rows laid out
    # z-ordered vs arbitrarily, read back each parquet file's column
    # min/max (what row-group pruning consults), and compare the mean
    # normalized bounding-rectangle area per file. Z-order must shrink
    # it by a wide margin in BOTH dimensions at once.
    import glob

    import pyarrow.parquet as pq

    from etl_showcase_spark.catalog import table
    from etl_showcase_spark.operators.layout import zorder_layout, zorder_value

    o = table(spark, SF_SMOKE, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 65536).alias("ck"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date"))
        .alias("dd"),
    )
    stats = o.agg(
        F.min("ck"), F.max("ck"), F.min("dd"), F.max("dd")
    ).collect()[0]
    ck_span = stats[1] - stats[0] or 1
    dd_span = stats[3] - stats[2] or 1

    def mean_rect_area(path):
        areas = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo = {"ck": None, "dd": None}
            hi = {"ck": None, "dd": None}
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                for ci in range(row_group.num_columns):
                    col = row_group.column(ci)
                    name = col.path_in_schema
                    if name in lo and col.statistics is not None:
                        s = col.statistics
                        lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                        hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
            if lo["ck"] is None or lo["dd"] is None:
                continue
            areas.append(
                ((hi["ck"] - lo["ck"]) / ck_span) * ((hi["dd"] - lo["dd"]) / dd_span)
            )
        assert areas, f"no parquet stats found under {path}"
        return sum(areas) / len(areas)

    z = zorder_value(F.col("ck"), F.col("dd"))
    laid = zorder_layout(o, z, num_partitions=8)
    laid.write.mode("overwrite").parquet(str(tmp_path / "zordered"))
    # arbitrary layout: hash-repartition by an unrelated key
    o.repartition(8, "o_orderkey").write.mode("overwrite").parquet(
        str(tmp_path / "hashed")
    )
    a_z = mean_rect_area(str(tmp_path / "zordered"))
    a_h = mean_rect_area(str(tmp_path / "hashed"))
    # hashed files each cover ~the whole key rectangle (area ~1);
    # z-ordered files must cover a small fraction of it
    assert a_h > 0.5, f"hashed layout unexpectedly tight ({a_h:.3f})"
    assert a_z < a_h / 3, f"z-order area {a_z:.3f} not >3x tighter than {a_h:.3f}"
