"""Regression tests for the round-5 ADVICE fixes: each reproduces the
reported failure mode (overflow, dangling node, wide key, torn write)
and asserts the corrected behavior against an independent reference.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# textops.grouped_rank_trend: int64 envelope must bound the SUM, not
# just max|cents| — huge values must route to the bigint path
# ---------------------------------------------------------------------------


def test_grouped_rank_trend_huge_cents_exact(spark):
    from etl_showcase_spark.operators.textops import grouped_rank_trend

    # |cents| ~ 1e13 passes the old max|cents| < 2^40 gate, but with
    # n=2000 the rank-weighted sum reaches ~2e19 > 2^63 — the old numpy
    # path wrapped silently. Alternating signs maximize cancellation
    # error if wrap occurs.
    n = 2000
    rows = [
        (1, i, i, float((-1) ** i) * 1.0e11 + i)  # cents ~ 1e13
        for i in range(1, n + 1)
    ]
    df = spark.createDataFrame(rows, ["key", "ts", "ord", "val"])
    got = grouped_rank_trend(df, "key", "ts", "ord", "val").collect()[0]

    # independent Python-bigint reference
    sx = n * (n + 1) // 2
    sxx = n * (n + 1) * (2 * n + 1) // 6
    cents = [round((((-1) ** i) * 1.0e11 + i) * 100) for i in range(1, n + 1)]
    sy = sum(cents)
    sxy = sum(r * c for r, c in zip(range(1, n + 1), cents))
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    expect = (float(num) / float(den)) / 100.0
    assert got["n_obs"] == n
    assert got["slope_per_event"] == expect


# ---------------------------------------------------------------------------
# graph.pagerank_fixed_point: nodes with zero in-degree must keep their
# teleport rank and keep pushing outflow every iteration
# ---------------------------------------------------------------------------


def test_pagerank_dangling_in_degree_zero(spark):
    from etl_showcase_spark.operators.graph import pagerank_fixed_point

    # directed: node 1 has NO incoming edges but fans out to 2,3; node 4
    # feeds 5 which feeds back to 4 (a cycle), 3 -> 5. Every node
    # appears as src (contract), but 1 never appears as dst.
    edges = [(1, 2), (1, 3), (2, 5), (3, 5), (4, 5), (5, 4)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["rank"] for r in pagerank_fixed_point(df, iterations=4).collect()
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
    # node 1 is present with exactly the teleport floor after iter 1+
    assert got[1] == (15 * (SCALE // n)) // 100


# ---------------------------------------------------------------------------
# curation.pps_weighted_sample: decimal keep-test must not wrap for
# weights >= 2^31
# ---------------------------------------------------------------------------


def test_pps_weighted_sample_large_weights_exact(spark):
    from etl_showcase_spark.operators.curation import pps_weighted_sample

    big = 1 << 33  # max(weight): the old bigint product u*maxw wrapped
    rows = [(f"doc{i}", (i + 1) * (big // 64)) for i in range(64)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    kept = {
        r["doc_id"] for r in pps_weighted_sample(df, "doc_id", "w").collect()
    }

    maxw = max(w for _, w in rows)
    expect = set()
    for k, w in rows:
        u = int(hashlib.md5(f"{k}|pps".encode()).hexdigest()[:8], 16)
        if u * maxw < w * 16**8:  # Python bigints: the exact semantics
            expect.add(k)
    assert kept == expect
    # the top-weight doc is always kept (P = 1), so the set is non-empty
    assert "doc63" in kept


# ---------------------------------------------------------------------------
# layout.spread_bits16: wide keys must truncate to the low 16 bits, in
# both the Spark column and the SQL twin
# ---------------------------------------------------------------------------


def _py_spread16(x: int) -> int:
    x &= 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def test_spread_bits16_masks_wide_keys(spark):
    import duckdb

    from etl_showcase_spark.operators.layout import spread_bits16, sql_spread_bits16

    wide = [65536, 65537, (1 << 20) + 123, (1 << 31) - 1]
    df = spark.createDataFrame([(v,) for v in wide], ["a"])
    out = {
        r["a"]: r["sa"]
        for r in df.select("a", spread_bits16(F.col("a")).alias("sa")).collect()
    }
    con = duckdb.connect()
    for v in wide:
        assert out[v] == _py_spread16(v)  # == spread of v & 0xFFFF
        sql_val = con.execute(f"SELECT {sql_spread_bits16(str(v))}").fetchone()[0]
        assert sql_val == _py_spread16(v)
    con.close()


# ---------------------------------------------------------------------------
# io.write_snapshot: a torn (uncommitted) v=N directory must not wedge
# subsequent writers
# ---------------------------------------------------------------------------


def test_write_snapshot_skips_torn_version(spark, tmp_path):
    import os

    from etl_showcase_spark.sources.io import (
        read_snapshot,
        snapshot_versions,
        write_snapshot,
    )

    base = str(tmp_path / "snap")
    df1 = spark.createDataFrame([(1, "a")], ["id", "s"])
    assert write_snapshot(df1, base) == 1
    # simulate a torn write: v=2 exists with data but no _COMMITTED
    torn = os.path.join(base, "v=2")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-00000.parquet"), "wb") as fh:
        fh.write(b"garbage")
    # the next writer must allocate v=3 (past the torn dir), not retry
    # v=2 and die on errorifexists forever
    df2 = spark.createDataFrame([(2, "b")], ["id", "s"])
    assert write_snapshot(df2, base) == 3
    assert snapshot_versions(base) == [1, 3]  # torn v=2 invisible
    assert read_snapshot(spark, base).collect()[0]["id"] == 2


# ---------------------------------------------------------------------------
# relational.with_global_ntile: distributed rank must equal the
# single-reducer NTILE bit-for-bit
# ---------------------------------------------------------------------------


def test_with_global_ntile_matches_window_ntile(spark):
    from pyspark.sql import Window

    from etl_showcase_spark.operators.relational import with_global_ntile

    # heavy ties in the order key (forces the tie-break path), sizes
    # chosen so n % 4 != 0, plus an n < n_tiles edge case
    for n in (3, 97, 1000):
        df = spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        )
        got = {
            r["k"]: r["t"]
            for r in with_global_ntile(
                df, [F.desc("v"), F.asc("k")], 4, "t"
            ).collect()
        }
        ref = {
            r["k"]: r["t"]
            for r in df.select(
                "k",
                F.ntile(4)
                .over(Window.orderBy(F.desc("v"), F.asc("k")))
                .cast("int")
                .alias("t"),
            ).collect()
        }
        assert got == ref, f"n={n}"


# ---------------------------------------------------------------------------
# io.compact_snapshot: bin-packs files, preserves sort clustering, and
# leaves the prior version readable
# ---------------------------------------------------------------------------


def test_compact_snapshot_binpacks_and_preserves_sort(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from etl_showcase_spark.sources.io import (
        compact_snapshot,
        read_snapshot,
        snapshot_versions,
        write_snapshot,
    )

    base = str(tmp_path / "tbl")
    df = spark.range(0, 20000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 1000).alias("v")
    )
    write_snapshot(df.repartition(24), base)  # fragmented landing
    v2 = compact_snapshot(spark, base, target_file_bytes=1 << 30, sort_cols=["k"])
    assert v2 == 2 and snapshot_versions(base) == [1, 2]

    def files(v):
        return [
            f
            for f in glob.glob(f"{base}/v={v}/*.parquet")
            if not f.split("/")[-1].startswith("_")
        ]

    assert len(files(1)) == 24
    assert len(files(2)) == 1  # 20k bigints << 1 GiB target
    # contents identical across the swap, old version untouched
    assert read_snapshot(spark, base, 2).orderBy("k").collect() == df.orderBy(
        "k"
    ).collect()
    assert read_snapshot(spark, base, 1).count() == 20000

    # sort preservation: compact to SEVERAL files and require their
    # per-file [min,max] ranges of k to be disjoint (the property file-
    # stat pruning depends on; a hash-shuffle rewrite would overlap all)
    base2 = str(tmp_path / "tbl2")
    write_snapshot(df.repartition(24), base2)
    # pick a target that yields multiple output files
    sz = sum(
        __import__("os").path.getsize(f)
        for f in glob.glob(f"{base2}/v=1/*.parquet")
        if not f.split("/")[-1].startswith("_")
    )
    compact_snapshot(spark, base2, target_file_bytes=max(1, sz // 4), sort_cols=["k"])
    ranges = []
    for f in glob.glob(f"{base2}/v=2/*.parquet"):
        md = pq.ParquetFile(f).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == "k" and col.statistics is not None:
                    los.append(col.statistics.min)
                    his.append(col.statistics.max)
        if los:
            ranges.append((min(los), max(his)))
    assert len(ranges) >= 3, f"expected multiple output files, got {len(ranges)}"
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"file ranges overlap: ({lo1},{hi1}) vs ({lo2},{hi2})"


# ---------------------------------------------------------------------------
# io.jsonl_pyds_sink: two-phase commit — a failed job publishes nothing
# ---------------------------------------------------------------------------


def test_jsonl_pyds_sink_commit_and_abort(spark, tmp_path):
    import glob
    import os

    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from etl_showcase_spark.sources.io import jsonl_pyds_sink

    # happy path: all rows land, marker present
    ok = str(tmp_path / "ok")
    df = spark.range(0, 100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    jsonl_pyds_sink(df, ok)
    assert os.path.exists(os.path.join(ok, "_SUCCESS"))
    back = spark.read.json(f"{ok}/*.jsonl")
    assert back.count() == 100 and back.agg(F.sum("v")).collect()[0][0] == 9900

    # failing job: one row poisons the write; nothing becomes visible
    bad = str(tmp_path / "bad")
    poison = df.withColumn(
        "v", F.when(F.col("id") == 57, F.raise_error("boom")).otherwise(F.col("v"))
    )
    with _pytest.raises(Py4JJavaError):
        jsonl_pyds_sink(poison, bad)
    assert not os.path.exists(os.path.join(bad, "_SUCCESS"))
    assert glob.glob(f"{bad}/*.jsonl") == []  # no published data files


def test_vacuum_snapshots_retention_and_safety(spark, tmp_path):
    import os

    from etl_showcase_spark.sources.io import (
        read_snapshot,
        snapshot_versions,
        vacuum_snapshots,
        write_snapshot,
    )

    base = str(tmp_path / "vac")
    for i in range(4):
        write_snapshot(spark.createDataFrame([(i,)], "v int"), base)
    # torn debris OLDER than latest commit (strip v2's marker), and an
    # in-flight dir NEWER than the latest commit
    os.rename(os.path.join(base, "v=2", "_COMMITTED"), os.path.join(base, "v=2", "_X"))
    os.makedirs(os.path.join(base, "v=9"))  # in-flight writer, no marker
    # freshly-written torn dir is protected by the grace window even
    # though a newer version committed first (slow-concurrent-writer
    # safety): only committed v1 is old enough to go
    deleted = vacuum_snapshots(base, keep_last=2)
    assert deleted == [1]
    assert os.path.isdir(os.path.join(base, "v=2"))
    # once quiescent past the grace window, the torn debris is removed
    deleted = vacuum_snapshots(base, keep_last=2, torn_grace_seconds=0.0)
    assert deleted == [2]
    assert snapshot_versions(base) == [3, 4]
    assert os.path.isdir(os.path.join(base, "v=9"))  # in-flight untouched
    assert read_snapshot(spark, base).collect()[0]["v"] == 3
    import pytest as _p

    with _p.raises(ValueError):
        vacuum_snapshots(base, keep_last=0)
