"""Sources/sinks surface: landing roundtrips, partition-scoped upsert,
HTTP fan-out determinism (SURVEY.md §2.1)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from etl_showcase_spark.sources.io import (
    WEATHER_RAW_SCHEMA,
    http_fanout_source,
    merge_upsert_partitioned,
    read_json,
    write_partitioned,
)

from .conftest import SF_SMOKE


def test_partitioned_json_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "x"), (3, "c", "y")], ["k", "v", "p"]
    )
    path = tempfile.mkdtemp(prefix="t_landing_")
    write_partitioned(df, path, ["p"], fmt="json")
    assert sorted(os.listdir(path) + []) >= ["p=x", "p=y"]
    back = read_json(spark, path)
    assert back.count() == 3
    assert set(back.columns) == {"k", "v", "p"}


def test_dynamic_overwrite_touches_only_written_partitions(spark):
    path = tempfile.mkdtemp(prefix="t_dyn_")
    df = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "p"])
    write_partitioned(df, path, ["p"])
    # second write only touches p=x; p=y must survive
    write_partitioned(spark.createDataFrame([(9, "x")], ["k", "p"]), path, ["p"])
    rows = {(r.k, r.p) for r in spark.read.parquet(path).collect()}
    assert rows == {(9, "x"), (2, "y")}


def test_merge_upsert_partitioned(spark):
    path = tempfile.mkdtemp(prefix="t_upsert_")
    target = spark.createDataFrame(
        [(1, 10.0, 2024), (2, 20.0, 2024), (3, 30.0, 2025)],
        ["id", "val", "yr"],
    )
    write_partitioned(target, path, ["yr"])
    updates = spark.createDataFrame([(2, 99.0, 2024), (4, 40.0, 2024)], ["id", "val", "yr"])
    merge_upsert_partitioned(spark, path, updates, ["id"], "yr")
    rows = {(r.id, r.val, r.yr) for r in spark.read.parquet(path).collect()}
    assert rows == {(1, 10.0, 2024), (2, 99.0, 2024), (4, 40.0, 2024), (3, 30.0, 2025)}


def test_http_fanout_deterministic_and_parseable(spark):
    urls = spark.createDataFrame(
        [(f"https://api.example.com/v1/forecast?city=C{i}",) for i in range(6)],
        ["url"],
    )
    a = {tuple(r) for r in http_fanout_source(urls).collect()}
    b = {tuple(r) for r in http_fanout_source(urls).collect()}
    assert a == b and len(a) == 6
    parsed = (
        http_fanout_source(urls)
        .select(F.from_json("payload", WEATHER_RAW_SCHEMA).alias("w"))
        .select("w.city", F.size("w.daily.time").alias("n"))
        .collect()
    )
    assert all(r.n == 3 for r in parsed)
    assert {r.city for r in parsed} == {f"C{i}" for i in range(6)}


def test_http_pyds_matches_mapinpandas_path(spark):
    """The Python Data Source spelling of the HTTP fan-out must produce
    exactly the mapInPandas spelling's rows — same endpoints, same
    deterministic fetch, different execution surface."""
    from etl_showcase_spark.plans.ingest import http_fanout_pyds, http_fanout_weather

    from .conftest import SF_SMOKE

    a = [tuple(r) for r in http_fanout_weather(spark, SF_SMOKE).collect()]
    b = [tuple(r) for r in http_fanout_pyds(spark, SF_SMOKE).collect()]
    assert a == b and len(a) > 0


def test_http_pyds_empty_endpoint_list(spark):
    # zero endpoints must yield an empty frame, not a worker crash:
    # the reader plans a sentinel partition (Spark's Python data source
    # rejects an empty partition plan)
    from etl_showcase_spark.sources.io import http_pyds_source

    assert http_pyds_source(spark, []).collect() == []


def test_gemm_topk_empty_query_set(spark):
    from etl_showcase_spark.operators.similarity import gemm_exact_topk

    q = spark.createDataFrame([], "vec_id long, embedding array<float>")
    c = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    out = gemm_exact_topk(q, c, "vec_id", "vec_id", "embedding", 5)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["q_id", "c_id", "cosine", "rnk"]


def test_http_pyds_one_partition_per_endpoint(spark):
    from etl_showcase_spark.sources.io import http_pyds_source

    urls = [f"https://api.example.com/v1/forecast?city=C{i}" for i in range(6)]
    raw = http_pyds_source(spark, urls)
    assert raw.rdd.getNumPartitions() == 6
    assert {r.url for r in raw.collect()} == set(urls)


def test_ingest_queries_smoke(spark):
    from etl_showcase_spark.plans.ingest import (
        http_fanout_weather,
        json_ingest_landing,
        partitioned_upsert_orders,
    )

    assert json_ingest_landing(spark, SF_SMOKE).count() == 5
    up = partitioned_upsert_orders(spark, SF_SMOKE)
    assert up.filter(F.col("n_updated") > 0).count() > 0
    assert http_fanout_weather(spark, SF_SMOKE).count() == 25


def test_bucketed_join_has_no_shuffle(spark):
    import shutil

    from etl_showcase_spark.catalog import table as cat_table
    from etl_showcase_spark.sources.io import write_bucketed

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("t_orders_b", "t_lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    o = cat_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    li = cat_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(o, "t_orders_b", ["o_orderkey"], 8)
    write_bucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"), "t_lineitem_b", ["o_orderkey"], 8)
    # force the shuffle-based strategy (tiny test tables would broadcast)
    # to prove bucketing removes the shuffle itself
    j = (
        spark.table("t_orders_b")
        .hint("merge")
        .join(spark.table("t_lineitem_b").hint("merge"), "o_orderkey")
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Bucketed: true" in plan, plan
    assert j.count() > 0


def test_merge_upsert_preserves_null_partition(spark):
    # isin() never matches NULL: without a null-safe touched-partition
    # filter, existing rows in __HIVE_DEFAULT_PARTITION__ are excluded
    # from the merge while dynamic overwrite still rewrites that
    # directory — silent data loss
    target_path = tempfile.mkdtemp(prefix="t_nullpart_")
    base = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", None), (3, "c", None)], ["k", "v", "p"]
    )
    write_partitioned(base, target_path, ["p"])
    updates = spark.createDataFrame([(2, "B", None), (4, "d", "p1")], ["k", "v", "p"])
    merge_upsert_partitioned(spark, target_path, updates, ["k"], "p")
    got = {
        (r.k, r.v, r.p) for r in spark.read.parquet(target_path).collect()
    }
    assert got == {
        (1, "a", "p1"),
        (2, "B", None),  # updated in the null partition
        (3, "c", None),  # PRESERVED in the null partition
        (4, "d", "p1"),
    }


def test_jdbc_roundtrip_embedded_derby(spark):
    # S5 end-to-end against a REAL database: the Derby embedded engine
    # ships in Spark's jars, so write_jdbc/read_jdbc run the actual
    # JDBC code path (driver class load, batched INSERTs, typed
    # readback) — the same API lines up against Postgres with
    # session.py's jdbc_packages registration (S6)
    from etl_showcase_spark.sources.io import read_jdbc, write_jdbc

    dbdir = tempfile.mkdtemp(prefix="derby_")
    url = f"jdbc:derby:{dbdir}/t;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", -2.25), (3, "gamma", 0.0)],
        ["id", "name", "score"],
    )
    write_jdbc(df, url, "events_t", properties=props, mode="overwrite")
    back = read_jdbc(spark, url, "events_t", properties=props)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # partitioned parallel read: same rows through range cursors
    par = read_jdbc(
        spark, url, "events_t", properties=props,
        partition_column="id", lower_bound=1, upper_bound=4, num_partitions=3,
    )
    assert par.rdd.getNumPartitions() == 3
    assert sorted(map(tuple, par.collect())) == sorted(map(tuple, df.collect()))


def test_salted_join_matches_plain_join(spark):
    from etl_showcase_spark.operators.relational import salted_join
    from etl_showcase_spark.catalog import table as cat_table

    o = cat_table(spark, SF_SMOKE, "orders").select("o_custkey", "o_totalprice")
    c = cat_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_name").withColumnRenamed("c_custkey", "o_custkey")
    plain = o.join(c, "o_custkey")
    salted = salted_join(o, c, ["o_custkey"], salt=8)
    assert salted.count() == plain.count()
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.collect()}
    assert a == b


def test_salted_join_left_and_anti_match_plain(spark):
    from etl_showcase_spark.operators.relational import salted_join
    from etl_showcase_spark.catalog import table as cat_table

    o = cat_table(spark, SF_SMOKE, "orders").select("o_custkey", "o_totalprice")
    # drop half the customers so left/anti actually exercise unmatched rows
    c = (
        cat_table(spark, SF_SMOKE, "customer")
        .filter(F.col("c_custkey") % 2 == 0)
        .select("c_custkey", "c_name")
        .withColumnRenamed("c_custkey", "o_custkey")
    )
    for how in ("left", "left_anti"):
        plain = {tuple(r) for r in o.join(c, "o_custkey", how).collect()}
        salted = {tuple(r) for r in salted_join(o, c, ["o_custkey"], how=how, salt=8).collect()}
        assert salted == plain, how


def test_salted_join_rejects_outer_modes(spark):
    import pytest

    from etl_showcase_spark.operators.relational import salted_join
    from etl_showcase_spark.catalog import table as cat_table

    o = cat_table(spark, SF_SMOKE, "orders").select("o_custkey")
    c = cat_table(spark, SF_SMOKE, "customer").withColumnRenamed("c_custkey", "o_custkey")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(o, c, ["o_custkey"], how=how)


def test_apply_cdc_partitioned_cleans_emptied_buckets(spark, tmp_path):
    """A tombstone batch that empties a bucket partition must remove the
    stale directory — dynamic overwrite alone never rewrites a
    partition it writes zero files for."""
    from pyspark.sql import functions as F

    from etl_showcase_spark.sources.io import apply_cdc_partitioned

    target = str(tmp_path / "cdc")
    base = spark.createDataFrame(
        [(1, 10.0, 0), (2, 20.0, 0), (3, 30.0, 1)],
        "k bigint, v double, bucket int",
    )
    base.write.partitionBy("bucket").parquet(target)

    # delete every key in bucket 0; update the key in bucket 1
    changes = spark.createDataFrame(
        [
            (1, None, 1, "D", 0),
            (2, None, 1, "D", 0),
            (3, 33.0, 1, "U", 1),
        ],
        "k bigint, v double, seq int, op string, bucket int",
    )
    apply_cdc_partitioned(
        spark, target, changes, ["k"], ["seq"], "op", "bucket"
    )
    got = {(r.k, r.v) for r in spark.read.parquet(target).select("k", "v").collect()}
    assert got == {(3, 33.0)}
    assert not (tmp_path / "cdc" / "bucket=0").exists()
    # idempotent re-apply: same winners, same snapshot
    apply_cdc_partitioned(
        spark, target, changes, ["k"], ["seq"], "op", "bucket"
    )
    again = {(r.k, r.v) for r in spark.read.parquet(target).select("k", "v").collect()}
    assert again == {(3, 33.0)}


def test_compact_partitions_rewrites_only_fragmented(spark, tmp_path):
    from pyspark.sql import functions as F

    from etl_showcase_spark.sources.io import compact_partitions

    path = str(tmp_path / "lake")
    # partition a: 8 small files; partition b: 1 healthy file
    a = spark.range(100).select(
        F.col("id"), F.lit("a").alias("p")
    ).repartition(8)
    a.write.partitionBy("p").parquet(path)
    b = spark.range(100, 150).select(F.col("id"), F.lit("b").alias("p")).coalesce(1)
    b.write.mode("append").partitionBy("p").parquet(path)

    def files_in(part):
        d = tmp_path / "lake" / f"p={part}"
        return [f for f in d.iterdir() if f.name.endswith(".parquet")]

    assert len(files_in("a")) == 8
    before = {r.id for r in spark.read.parquet(path).collect()}

    res = compact_partitions(spark, path, "p", target_file_bytes=1 << 30)
    assert res["compacted"] == ["a"] and res["skipped"] == ["b"]
    assert len(files_in("a")) == 1
    assert len(files_in("b")) == 1
    after = {r.id for r in spark.read.parquet(path).collect()}
    assert after == before


def test_snapshot_versioning_protocol(spark, tmp_path):
    import os

    from etl_showcase_spark.sources.io import (
        read_snapshot,
        snapshot_versions,
        write_snapshot,
    )

    base = str(tmp_path / "snaps")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    df2 = spark.createDataFrame([(1, "a"), (2, "B"), (3, "c")], ["k", "v"])
    assert write_snapshot(df1, base) == 1
    assert write_snapshot(df2, base) == 2
    assert snapshot_versions(base) == [1, 2]
    # snapshot isolation: v1 still serves its original contents
    assert sorted(read_snapshot(spark, base, 1).collect()) == sorted(df1.collect())
    assert read_snapshot(spark, base).count() == 3  # latest = v2
    # a torn write (no _COMMITTED marker) is invisible to readers
    df1.write.parquet(f"{base}/v=3")
    assert snapshot_versions(base) == [1, 2]
    assert read_snapshot(spark, base).count() == 3
    # committed versions are immutable: re-writing v=2 must refuse
    import pytest as _pytest

    with _pytest.raises(Exception):
        df1.write.mode("errorifexists").parquet(f"{base}/v=2")
    # pinning an uncommitted version fails loudly
    with _pytest.raises(FileNotFoundError):
        read_snapshot(spark, base, 3)
    os.path.isdir(base)


def test_schema_evolution_mergeschema_read(spark, tmp_path):
    # lake reality: later loads add columns; readers must see the
    # union schema with nulls for pre-evolution partitions
    base = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], ["k", "v"]).write.parquet(f"{base}/ds=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], ["k", "v", "score"]
    ).write.parquet(f"{base}/ds=2")
    df = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(df.columns) == {"k", "v", "score", "ds"}
    rows = {r["k"]: r for r in df.collect()}
    assert rows[1]["score"] is None
    assert rows[2]["score"] == 9.5


def test_http_fanout_over_real_loopback_sockets(spark):
    """Live-socket proof of the S3 fan-out (reference analog:
    dags/weather_etl_pipeline.py:72 actually fetches): an in-process
    http.server serves the deterministic payloads; the executor-side
    fetch performs a REAL urllib GET over 127.0.0.1 from the Python
    workers. Both execution surfaces (mapInPandas + Python Data
    Source) must return byte-identical rows to the fake-fetch path."""
    import http.server
    import threading
    from urllib.parse import unquote

    from etl_showcase_spark.sources.io import (
        _make_fake_fetch,
        http_pyds_source_for,
    )

    payload_for = _make_fake_fetch()

    class _Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            # the original endpoint url rides percent-encoded in the path
            body = payload_for(unquote(self.path[1:])).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # keep pytest output clean
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:

        def real_fetch(url, _port=port):
            # runs in executor Python workers; pickled by value
            from urllib.parse import quote
            from urllib.request import urlopen

            proxied = f"http://127.0.0.1:{_port}/{quote(url, safe='')}"
            with urlopen(proxied, timeout=10) as resp:
                return resp.read().decode()

        urls = spark.createDataFrame(
            [(f"https://api.example.com/v1/forecast?city=C{i}",) for i in range(6)],
            ["url"],
        )
        via_fake = sorted(tuple(r) for r in http_fanout_source(urls).collect())
        via_net = sorted(
            tuple(r) for r in http_fanout_source(urls, fetch=real_fetch).collect()
        )
        assert via_net == via_fake and len(via_net) == 6
        via_pyds = sorted(
            tuple(r)
            for r in http_pyds_source_for(urls, fetch=real_fetch).collect()
        )
        assert via_pyds == via_fake
    finally:
        srv.shutdown()
        srv.server_close()


def test_dynamic_overwrite_touches_only_incoming_partitions(spark, tmp_path):
    """partitionOverwriteMode=dynamic must replace ONLY the partitions
    present in the incoming frame — file identity of every other
    partition is preserved (static mode would wipe the whole table)."""
    import glob
    import os

    path = str(tmp_path / "dyn")
    df = spark.createDataFrame(
        [(1, 10.0, 1995), (2, 20.0, 1996), (3, 30.0, 1997)], ["k", "v", "yr"]
    )
    df.write.mode("overwrite").partitionBy("yr").parquet(path)

    def files(yr):
        return sorted(
            (f, os.path.getmtime(f))
            for f in glob.glob(f"{path}/yr={yr}/*.parquet")
        )

    before_95, before_96 = files(1995), files(1996)
    upd = spark.createDataFrame([(3, 99.0, 1997)], ["k", "v", "yr"])
    upd.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("yr").parquet(path)
    assert files(1995) == before_95 and files(1996) == before_96
    rows = {(r.k, r.v, r.yr) for r in spark.read.parquet(path).collect()}
    assert rows == {(1, 10.0, 1995), (2, 20.0, 1996), (3, 99.0, 1997)}
