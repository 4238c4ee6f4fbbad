"""Training-data curation queries (SURVEY.md §2.13, tags L6/L7): the
selection → split → balance → pack layer over `documents`, plus
near-dup-cluster resolution via distributed connected components.

Every sampling decision is an md5 function of the row key, so the
DuckDB oracle replays each sample bit-exactly (no RNG, no
partition-order dependence) — see operators/curation.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.curation import (
    deterministic_sample,
    per_group_cap,
    sequence_pack,
    train_val_test_split,
)
from ..registry import register

# ---------------------------------------------------------------------------
# L6: deterministic hash sample — ~16% of documents (md5 prefix <
# 0x29), rolled up per language. Reproducible across runs/engines.
# ---------------------------------------------------------------------------

_SAMPLE_ORACLE = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR) || '|smpl'), 1, 2) < '29'
GROUP BY lang
ORDER BY lang
"""


@register("deterministic_sample_docs", oracle=_SAMPLE_ORACLE, tags=("L6",))
def deterministic_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        deterministic_sample(d, "doc_id", "29", salt="smpl")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# L6: stable train/val/test split (≈80/10/10) — a doc's split never
# changes as the corpus grows (no leakage across re-runs).
# ---------------------------------------------------------------------------

_SPLIT_ORACLE = """
SELECT CASE WHEN h < 'cc' THEN 'train' WHEN h < 'e6' THEN 'val' ELSE 'test' END AS split,
       lang,
       COUNT(*) AS n_docs
FROM (
  SELECT lang, substring(md5(CAST(doc_id AS VARCHAR) || '|split'), 1, 2) AS h
  FROM documents
)
GROUP BY split, lang
ORDER BY split, lang
"""


@register("train_val_test_split_counts", oracle=_SPLIT_ORACLE, tags=("L6",))
def train_val_test_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        train_val_test_split(d, "doc_id")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "lang")
    )


# ---------------------------------------------------------------------------
# L6: class-balanced cap — at most 100 docs per language, selected by
# hashed-key order; per-doc output so the oracle checks the exact
# selected SET, not just counts.
# ---------------------------------------------------------------------------

_CAP_ORACLE = """
SELECT lang, doc_id
FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR) || '|cap'), doc_id
         ) AS rk
  FROM documents
)
WHERE rk <= 100
ORDER BY lang, doc_id
"""


@register("balanced_lang_cap", oracle=_CAP_ORACLE, tags=("L6",))
def balanced_lang_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        per_group_cap(d, ["lang"], "doc_id", 100, salt="cap")
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    )


# ---------------------------------------------------------------------------
# L7: sequence packing — documents packed into 8192-char bins per
# language shard (running-prefix assignment; the per-shard window is
# the scale path, a global ORDER BY would be a single-reducer
# bottleneck). Bin profile per (lang, bin).
# ---------------------------------------------------------------------------

_PACK_ORACLE = """
SELECT lang, bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM (
  SELECT lang, n_chars,
         CAST(FLOOR(
           COALESCE(SUM(n_chars) OVER (
             PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) / 8192.0
         ) AS BIGINT) AS bin_id
  FROM documents
)
GROUP BY lang, bin_id
ORDER BY lang, bin_id
"""


@register("sequence_packing_bins", oracle=_PACK_ORACLE, tags=("L7", "W4"))
def sequence_packing_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        sequence_pack(d, "doc_id", "n_chars", 8192, partition_cols=["lang"])
        .groupBy("lang", "bin_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("lang", "bin_id")
    )


# ---------------------------------------------------------------------------
# L7: connected components over an edge list — near-dup pairs →
# duplicate clusters. The edge set here is "consecutive same-user
# events within 5 minutes", which makes each component a session — so
# the generic iterative CC operator is oracle-checked against an
# INDEPENDENT derivation (gap-based sessionization in SQL), the
# strongest check an iterative algorithm can get.
# ---------------------------------------------------------------------------

_CC_ORACLE = """
WITH g AS (
  SELECT event_id, user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   <= INTERVAL 5 MINUTE
              THEN 0 ELSE 1 END AS new_s
  FROM events
), s AS (
  SELECT event_id, user_id,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT MIN(event_id) AS component, COUNT(*) AS n_members
FROM s
GROUP BY user_id, sid
ORDER BY component
"""


@register("session_components", oracle=_CC_ORACLE, tags=("L7", "W3"))
def session_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators.graph import connected_components

    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.withColumn("prev_id", F.lag("event_id").over(w))
        .withColumn("prev_ts", F.lag("ts").over(w))
        # Interval comparison, not unix_micros(): NTZ-safe (the driver's
        # session reads naive parquet timestamps as TIMESTAMP_NTZ) and
        # identical to the oracle's `ts - LAG(ts) <= INTERVAL 5 MINUTE`.
        .filter(
            F.col("prev_id").isNotNull()
            & (F.col("ts") <= F.col("prev_ts") + F.expr("INTERVAL 5 MINUTES"))
        )
        .select(F.col("prev_id").alias("src"), F.col("event_id").alias("dst"))
    )
    cc = connected_components(edges)
    # isolated events (singleton sessions) have no edges — they are
    # their own component
    labeled = ev.join(cc, ev["event_id"] == cc["id"], "left").select(
        "event_id", F.coalesce("component", "event_id").alias("component")
    )
    return (
        labeled.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy("component")
    )


# ---------------------------------------------------------------------------
# L6 training-mix rebalancing: per-(lang, source) inverse-frequency
# sampling weights ([EXT] — the data-mixing step before corpus
# assembly: upweight rare strata toward a uniform mix, capped so no
# stratum repeats more than 4 epochs). weight = min(cap, N/(K*n_g)) —
# exact integer inputs, one division, so the doubles hash cross-engine.
# Two tiny aggregations + a broadcast scalar; the weights table is
# K rows regardless of corpus size.
# ---------------------------------------------------------------------------

_MIX_ORACLE = """
WITH g AS (
  SELECT lang, source, COUNT(*) AS n_docs FROM documents GROUP BY 1, 2
),
tot AS (
  SELECT CAST(SUM(n_docs) AS DOUBLE) AS n_total,
         CAST(COUNT(*) AS DOUBLE) AS n_strata
  FROM g
)
SELECT g.lang, g.source, CAST(g.n_docs AS BIGINT) AS n_docs,
       LEAST(4.0, tot.n_total / (tot.n_strata * g.n_docs)) AS sample_weight
FROM g CROSS JOIN tot
"""


@register("training_mix_weights", oracle=_MIX_ORACLE, tags=("L6",))
def training_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    g = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = g.agg(
        F.sum("n_docs").cast("double").alias("n_total"),
        F.count(F.lit(1)).cast("double").alias("n_strata"),
    )
    return g.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.least(
            F.lit(4.0), F.col("n_total") / (F.col("n_strata") * F.col("n_docs"))
        ).alias("sample_weight"),
    )


# ---------------------------------------------------------------------------
# L4/G9 distribution profiling: equi-width document-length histogram
# via width_bucket ([EXT] — the length-distribution check behind
# truncation/packing decisions). Bucket edges are fixed constants, so
# bucket ids are exact integers in both engines.
# ---------------------------------------------------------------------------

_HIST_ORACLE = """
-- DuckDB has no width_bucket; the closed-form twin of Spark's
-- width_bucket(x, 0, 2000, 20): 1 + floor(x/100), clamped to 21 for
-- x >= 2000 (n_chars is non-negative, so the 0 underflow bucket
-- can't occur)
SELECT CAST(LEAST(FLOOR(n_chars / 100.0) + 1, 21) AS INT) AS bucket,
       COUNT(*) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY 1
"""


@register("doc_length_histogram", oracle=_HIST_ORACLE, tags=("L4", "G9"))
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.groupBy(
        F.width_bucket("n_chars", F.lit(0), F.lit(2000), F.lit(20))
        .cast("int")
        .alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


# ---------------------------------------------------------------------------
# L7 iterative ranking: fixed-point PageRank over the part↔supplier
# bipartite graph ([EXT] — operators/graph.py pagerank_fixed_point).
# All arithmetic is integer floor division, so the distributed result
# is bit-identical at any parallelism AND the oracle replays all three
# iterations exactly (unrolled CTE chain — float PageRank could never
# hash-match across engines).
# ---------------------------------------------------------------------------

_PR_SCALE, _PR_ITERS = 10**12, 3


def _pagerank_oracle() -> str:
    head = f"""
WITH pairs AS (
  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b FROM lineitem
),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL SELECT b AS src, a AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
n AS (SELECT COUNT(*) AS n FROM deg),
pr0 AS (
  SELECT src AS node, CAST({_PR_SCALE} // n.n AS BIGINT) AS rank FROM deg, n
)"""
    step = """,
pr{i} AS (
  SELECT e.dst AS node,
         CAST((15 * ({scale} // (SELECT n FROM n))) // 100
              + (85 * SUM(p.rank // d.deg)) // 100 AS BIGINT) AS rank
  FROM pr{j} p JOIN deg d ON p.node = d.src JOIN edges e ON e.src = p.node
  GROUP BY e.dst
)"""
    body = "".join(
        step.format(i=i, j=i - 1, scale=_PR_SCALE) for i in range(1, _PR_ITERS + 1)
    )
    return head + body + f"\nSELECT node, rank FROM pr{_PR_ITERS}"


@register("pagerank_part_supplier", oracle=_pagerank_oracle(), tags=("L7", "J2"))
def pagerank_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank_fixed_point

    li = table(spark, sf_dir, "lineitem")
    pairs = li.select(
        (F.col("l_partkey") * 2).alias("a"), (F.col("l_suppkey") * 2 + 1).alias("b")
    ).distinct()
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    return pagerank_fixed_point(edges, iterations=_PR_ITERS, scale=_PR_SCALE)


# ---------------------------------------------------------------------------
# L6 PPS sampling ([EXT] — operators/curation.py pps_weighted_sample):
# documents kept with probability proportional to length, the
# counter-weight to boilerplate/short-doc over-representation. The
# oracle replays the integer keep test verbatim.
# ---------------------------------------------------------------------------

_PPS_ORACLE = """
WITH mx AS (SELECT MAX(n_chars) AS maxw FROM documents)
SELECT doc_id, lang, source, n_chars
FROM documents, mx
WHERE CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || '|pps'), 1, 8) AS BIGINT)
        * maxw
      < n_chars * 4294967296
"""


@register("pps_weighted_sample_docs", oracle=_PPS_ORACLE, tags=("L6",))
def pps_weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import pps_weighted_sample

    d = table(spark, sf_dir, "documents")
    return pps_weighted_sample(d, "doc_id", "n_chars").select(
        "doc_id", "lang", "source", "n_chars"
    )


# ---------------------------------------------------------------------------
# L6/L2 entity resolution ([EXT] — blocked fuzzy record linkage, the
# curation step that reconciles "the same thing spelled differently"
# across catalogs; no reference analog). Classic two-stage shape:
# (1) EXACT-dedup to one row per distinct name (the same
# dedupe-before-fuzzy principle as embedding_neardup_clusters — fuzzy
# work must never scale with duplicate volume), (2) BLOCK on the first
# name token and verify candidates with exact Levenshtein distance —
# both Spark and DuckDB implement the identical classic edit-distance
# integer, so the whole match set is hash-checked. At 100 TB: the
# distinct-name frame is vocabulary-sized, the block join is a keyed
# shuffle (no all-pairs stage), and the O(len²) Levenshtein DP runs
# only inside blocks. MULTI-PASS blocking (first token AND last token,
# candidates unioned then deduped) is the recall amplifier — the same
# OR-amplification idea as LSH tables: a true match is missed only if
# the misspelling corrupts BOTH its first and last token.
# ---------------------------------------------------------------------------

_ER_MAX_DIST = 3

_ER_ORACLE = f"""
WITH names AS (
  SELECT p_name, COUNT(*) AS n_parts, MIN(p_partkey) AS min_partkey
  FROM part GROUP BY p_name
),
t AS (SELECT p_name, string_split(p_name, ' ') AS toks FROM names),
keys AS (
  SELECT p_name, 'first' AS bt, toks[1] AS blk FROM t
  UNION ALL
  SELECT p_name, 'last', toks[LEN(toks)] FROM t
),
cand AS (
  SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
  FROM keys a JOIN keys b
    ON a.bt = b.bt AND a.blk = b.blk AND a.p_name < b.p_name
)
SELECT c.name_a, c.name_b,
       CAST(levenshtein(c.name_a, c.name_b) AS INT) AS edit_distance,
       CAST(x.n_parts AS BIGINT) AS n_parts_a,
       CAST(y.n_parts AS BIGINT) AS n_parts_b,
       CAST(x.min_partkey AS BIGINT) AS canonical_key
FROM cand c
JOIN names x ON c.name_a = x.p_name
JOIN names y ON c.name_b = y.p_name
WHERE levenshtein(c.name_a, c.name_b) <= {_ER_MAX_DIST}
"""


@register("entity_resolution_part_names", oracle=_ER_ORACLE, tags=("L6", "L2", "J2"))
def entity_resolution_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import tracked_persist

    p = table(spark, sf_dir, "part")
    names = p.groupBy("p_name").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("p_partkey").alias("min_partkey"),
    ).transform(tracked_persist)  # consumed by the key explode + 2 rejoins
    toks = F.split(F.col("p_name"), " ")
    keys = names.select(
        "p_name",
        F.explode(
            F.array(
                F.struct(F.lit("first").alias("bt"), toks[0].alias("blk")),
                F.struct(
                    F.lit("last").alias("bt"),
                    F.element_at(toks, F.size(toks)).alias("blk"),
                ),
            )
        ).alias("k"),
    ).select("p_name", "k.bt", "k.blk")
    a, b = keys.alias("a"), keys.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bt") == F.col("b.bt"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_name").alias("name_a"), F.col("b.p_name").alias("name_b")
        )
        .dropDuplicates(["name_a", "name_b"])
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    x = names.select(
        F.col("p_name").alias("name_a"),
        F.col("n_parts").alias("n_parts_a"),
        F.col("min_partkey").alias("canonical_key"),
    )
    y = names.select(
        F.col("p_name").alias("name_b"), F.col("n_parts").alias("n_parts_b")
    )
    return (
        cand.filter(dist <= _ER_MAX_DIST)
        .join(F.broadcast(x), "name_a")
        .join(F.broadcast(y), "name_b")
        .select(
            "name_a",
            "name_b",
            dist.cast("int").alias("edit_distance"),
            F.col("n_parts_a").cast("long").alias("n_parts_a"),
            F.col("n_parts_b").cast("long").alias("n_parts_b"),
            F.col("canonical_key").cast("long").alias("canonical_key"),
        )
    )


# ---------------------------------------------------------------------------
# L7 graph analytics: per-node triangle counts on the co-purchase
# graph ([EXT] — parts appearing in the same order are linked; the
# triangle count is the classic cohesion/community signal and THE
# canonical "joins explode if you're naive" graph kernel). Spark runs
# the DEGREE-ORDERED node-iterator: every edge is oriented from its
# lower-(degree, id) endpoint to the higher one, wedges are enumerated
# only at each edge's low-degree side, and a wedge closes iff the
# oriented closing edge exists — bounding wedge fan-out by arboricity
# (sum of min-degree² instead of max-degree²), the standard
# MapReduce-era fix for power-law hubs. The oracle replays the naive
# id-ordered 3-way self-join: the triangle SET is orientation-
# independent, so hash equality proves the optimized enumeration
# exact. At 100 TB: edges come from a per-basket pair expansion (one
# groupBy shuffle — baskets are small, so the in-array pair generation
# is O(k²) with tiny k, never a fact×fact join), and triangles come
# from the EDGE-ITERATOR: out-neighbor arrays are intersected per
# oriented edge, so the wedge set is never materialized or shuffled —
# the classic wedge-join blowup (sum of out-degree² rows through an
# exchange) becomes an in-memory array_intersect per edge, with array
# sizes bounded by the degree ordering (≈ sqrt(2m) worst case).
# ---------------------------------------------------------------------------

_TRIANGLE_ORACLE = """
WITH e0 AS (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e0 e1
  JOIN e0 e2 ON e2.a = e1.b
  JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
),
nodes AS (
  SELECT x AS v FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT v AS part_key, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM nodes GROUP BY v
"""


@register("triangle_count_copurchase", oracle=_TRIANGLE_ORACLE, tags=("L7", "J2", "G1"))
def triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _node_triangle_counts(_copurchase_edges(spark, sf_dir)).select(
        "part_key", "n_triangles"
    )


def _node_triangle_counts(e0: DataFrame) -> DataFrame:
    """Per-node triangle counts (part_key, n_triangles) for nodes in
    >= 1 triangle, via the degree-ordered edge-iterator (see the
    design note above triangle_count_copurchase — wedges are array
    intersections, never a shuffled wedge join)."""
    from ..caching import tracked_persist

    deg = (
        e0.select(F.col("u").alias("node"))
        .unionAll(e0.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        # total order: degree then id — ids are unique so ranks never tie
        .select("node", (F.col("deg") * F.lit(1 << 32) + F.col("node")).alias("rank"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("rank").alias("ru"))
    dv = deg.select(F.col("node").alias("v"), F.col("rank").alias("rv"))
    oriented = (
        e0.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(F.col("ru") < F.col("rv"), F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(F.col("ru") < F.col("rv"), F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        .transform(tracked_persist)  # consumed by adjacency AND the edge scan
    )
    # edge-iterator: triangles through oriented edge (u, v) are exactly
    # |N+(u) ∩ N+(v)| — each triangle {r1<r2<r3} is found once, at its
    # (r1, r2) base edge
    adj = oriented.groupBy("src").agg(F.collect_list("dst").alias("nb"))
    au = adj.select(F.col("src").alias("u"), F.col("nb").alias("nu"))
    av = adj.select(F.col("src").alias("v"), F.col("nb").alias("nv"))
    common = F.array_intersect(
        F.col("nu"), F.coalesce(F.col("nv"), F.array().cast("array<bigint>"))
    )
    et = (
        oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(au, "u")
        .join(av, "v", "left")  # a sink node has no out-neighbor row
        .select("u", "v", common.alias("ws"))
        .filter(F.size("ws") > 0)
    )
    # each triangle (u, v, w) credits all three corners
    nodes = (
        et.select(F.col("u").alias("part_key"), F.size("ws").cast("long").alias("n"))
        .unionAll(et.select(F.col("v").alias("part_key"), F.size("ws").cast("long")))
        .unionAll(et.select(F.explode("ws").alias("part_key"), F.lit(1).cast("long")))
    )
    return nodes.groupBy("part_key").agg(F.sum("n").cast("long").alias("n_triangles"))


# ---------------------------------------------------------------------------
# L7 graph analytics, part 2: per-EDGE triangle support on the same
# co-purchase graph ([EXT] — the k-truss building block: an edge's
# support is how many triangles contain it, and iteratively peeling
# edges with support < k-2 yields the k-truss community core). Same
# edge-iterator enumeration as triangle_count_copurchase, but each
# found triangle (u, v, w) credits its THREE edges — normalized back
# to id order — instead of its corners. The oracle recounts edge
# support from the naive 3-way-join triangle set. Output is capped to
# edges with support >= the 95th-percentile-ish floor via a plain
# threshold (support >= 8) so the row set stays bounded and the query
# doubles as the "strong-tie subgraph" extraction a curation pipeline
# actually materializes.
# ---------------------------------------------------------------------------

_EDGE_SUPPORT_MIN = 8

_EDGE_SUPPORT_ORACLE = f"""
WITH e0 AS (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e0 e1
  JOIN e0 e2 ON e2.a = e1.b
  JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
),
tri_edges AS (
  SELECT x AS u, y AS v FROM tri
  UNION ALL SELECT x, z FROM tri
  UNION ALL SELECT y, z FROM tri
)
SELECT u AS part_a, v AS part_b, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM tri_edges
GROUP BY u, v
HAVING COUNT(*) >= {_EDGE_SUPPORT_MIN}
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct co-purchase edges (u < v by id) via per-basket pair
    expansion — one groupBy shuffle, O(k²) in-array pair generation per
    small basket, never a fact×fact self-join."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    pair_expr = F.expr(
        "flatten(transform(parts, (x, i) -> "
        "transform(slice(parts, i + 2, size(parts)), y -> struct(x AS u, y AS v))))"
    )
    return (
        baskets.select(F.explode(pair_expr).alias("p"))
        .select("p.u", "p.v")
        .dropDuplicates(["u", "v"])
    )


def _edge_triangle_support(e0: DataFrame) -> DataFrame:
    """Per-edge triangle support (u, v, s) for edges in >= 1 triangle,
    via the degree-ordered edge-iterator (see triangle_count_copurchase
    — wedges are array intersections, never a shuffled wedge join)."""
    from ..caching import tracked_persist

    deg = (
        e0.select(F.col("u").alias("node"))
        .unionAll(e0.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .select("node", (F.col("deg") * F.lit(1 << 32) + F.col("node")).alias("rank"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("rank").alias("ru"))
    dv = deg.select(F.col("node").alias("v"), F.col("rank").alias("rv"))
    oriented = (
        e0.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(F.col("ru") < F.col("rv"), F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(F.col("ru") < F.col("rv"), F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        .transform(tracked_persist)
    )
    adj = oriented.groupBy("src").agg(F.collect_list("dst").alias("nb"))
    au = adj.select(F.col("src").alias("u"), F.col("nb").alias("nu"))
    av = adj.select(F.col("src").alias("v"), F.col("nb").alias("nv"))
    common = F.array_intersect(
        F.col("nu"), F.coalesce(F.col("nv"), F.array().cast("array<bigint>"))
    )
    tri = (
        oriented.select(F.col("src").alias("tu"), F.col("dst").alias("tv"))
        .join(au, F.col("tu") == F.col("u"))
        .join(av, F.col("tv") == F.col("v"), "left")
        .select("tu", "tv", F.explode(common).alias("tw"))
    )
    # credit all three edges, normalized to id order (oracle's spelling)
    lo, hi = F.least, F.greatest
    tri_edges = (
        tri.select(lo("tu", "tv").alias("pa"), hi("tu", "tv").alias("pb"))
        .unionAll(tri.select(lo("tu", "tw").alias("pa"), hi("tu", "tw").alias("pb")))
        .unionAll(tri.select(lo("tv", "tw").alias("pa"), hi("tv", "tw").alias("pb")))
    )
    return tri_edges.groupBy(
        F.col("pa").alias("u"), F.col("pb").alias("v")
    ).agg(F.count(F.lit(1)).cast("long").alias("s"))


@register("edge_triangle_support", oracle=_EDGE_SUPPORT_ORACLE, tags=("L7", "J2", "G6"))
def edge_triangle_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = _edge_triangle_support(_copurchase_edges(spark, sf_dir))
    return sup.select(
        F.col("u").alias("part_a"),
        F.col("v").alias("part_b"),
        F.col("s").alias("n_triangles"),
    ).filter(F.col("n_triangles") >= _EDGE_SUPPORT_MIN)


# ---------------------------------------------------------------------------
# L7 graph analytics, part 3: k-truss core extraction ([EXT] — the
# community-core peel: iteratively delete edges in fewer than k-2
# triangles until stable; what survives is the densely-knit co-purchase
# core that basket-analysis and fraud-ring pipelines actually keep).
# The registered query runs a FIXED number of peel rounds (6) so the
# oracle can UNROLL them — six support→filter blocks, the same
# fixed-iteration discipline as the PageRank oracle — while Spark runs
# the identical six rounds with the edge-iterator support kernel and a
# localCheckpoint between rounds (truncating the lineage the way every
# iterative Spark algorithm must). On this corpus the peel reaches its
# fixpoint in 4 rounds (asserted in tests), so the fixed-round result
# IS the k-truss; on a corpus that needs more rounds the query is the
# documented 6-round peel — rerun with more rounds for the fixpoint.
# ---------------------------------------------------------------------------

_TRUSS_K = 12  # edge survives iff in >= k-2 = 10 triangles
_TRUSS_ROUNDS = 6


def _ktruss_oracle() -> str:
    blocks = []
    prev = "e0"
    for r in range(_TRUSS_ROUNDS):
        # AS MATERIALIZED is load-bearing: each round references the
        # previous edge set three times, so inlined CTEs would expand
        # 3^rounds lineitem scans
        blocks.append(f"""
tri{r} AS MATERIALIZED (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM {prev} e1
  JOIN {prev} e2 ON e2.u = e1.v
  JOIN {prev} e3 ON e3.u = e1.u AND e3.v = e2.v
),
sup{r} AS MATERIALIZED (
  SELECT u, v, COUNT(*) AS s FROM (
    SELECT x AS u, y AS v FROM tri{r}
    UNION ALL SELECT x, z FROM tri{r}
    UNION ALL SELECT y, z FROM tri{r}
  ) GROUP BY u, v
),
e{r + 1} AS MATERIALIZED (SELECT u, v FROM sup{r} WHERE s >= {_TRUSS_K - 2})""")
        prev = f"e{r + 1}"
    return f"""
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),{",".join(blocks)}
SELECT u AS part_a, v AS part_b, CAST(s AS BIGINT) AS support
FROM sup{_TRUSS_ROUNDS - 1} WHERE s >= {_TRUSS_K - 2}
"""


@register("ktruss_core_copurchase", oracle=_ktruss_oracle(), tags=("L7", "J2", "G6"))
def ktruss_core_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_edges(spark, sf_dir)
    sup = None
    prev = None
    for _ in range(_TRUSS_ROUNDS):
        sup = _edge_triangle_support(e).localCheckpoint()
        e = sup.filter(F.col("s") >= _TRUSS_K - 2).select("u", "v")
        # Fixed-point early exit (r13 optimization, guide §1.2): each
        # round's edge set is a SUBSET of the previous one, so an
        # unchanged count proves an unchanged set, and support is a
        # deterministic function of the edge set — every remaining
        # round would recompute the identical checkpointed `sup`. The
        # count is one cheap job over the checkpointed support; the
        # peel converges after 3 of 6 rounds at sf0.1 (measured), and
        # convergence-at-cap equals the oracle's fixed unroll exactly.
        n = e.count()
        if n == prev:
            break
        prev = n
    return sup.filter(F.col("s") >= _TRUSS_K - 2).select(
        F.col("u").alias("part_a"),
        F.col("v").alias("part_b"),
        F.col("s").alias("support"),
    )


# ---------------------------------------------------------------------------
# L7 graph analytics, part 4: degree assortativity of the co-purchase
# graph ([EXT] — the one-number mixing summary: do high-degree parts
# co-occur with other hubs (r > 0) or with the periphery (r < 0)?
# Newman's r is the Pearson correlation of endpoint degrees over all
# directed edge ends). Degrees are exact integers, all five moments
# accumulate as exact BIGINT sums, and by end-symmetry Σx=Σy and
# Σx²=Σy², so r reduces to (n·Σxy − Σx²)/(n·Σx² − (Σx)²) — computed
# as ONE double expression of exact integer sums, spelled identically
# in both engines (the pearson_corr_exact recipe, sqrt-free). At
# 100 TB: edges from the per-basket expansion (one shuffle), the
# degree join is node-keyed, the reduce is a single global agg row.
# ---------------------------------------------------------------------------

_ASSORT_ORACLE = """
WITH e0 AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT node, COUNT(*) AS d
  FROM (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
  GROUP BY node
),
ends AS (SELECT u AS x, v AS y FROM e0 UNION ALL SELECT v, u FROM e0),
m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(dx.d) AS BIGINT) AS sx,
         CAST(SUM(dx.d * dy.d) AS BIGINT) AS sxy,
         CAST(SUM(dx.d * dx.d) AS BIGINT) AS sxx
  FROM ends e
  JOIN deg dx ON e.x = dx.node
  JOIN deg dy ON e.y = dy.node
)
SELECT CAST(n AS BIGINT) AS n_edge_ends,
       sx AS sum_deg, sxy AS sum_prod, sxx AS sum_sq,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS assortativity
FROM m
"""


@register("copurchase_degree_assortativity", oracle=_ASSORT_ORACLE, tags=("L7", "G8", "J2"))
def copurchase_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import tracked_persist

    e0 = _copurchase_edges(spark, sf_dir).transform(tracked_persist)
    deg = (
        e0.select(F.col("u").alias("node"))
        .unionAll(e0.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ends = e0.select(F.col("u").alias("x"), F.col("v").alias("y")).unionAll(
        e0.select(F.col("v").alias("x"), F.col("u").alias("y"))
    )
    dx = deg.select(F.col("node").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("node").alias("y"), F.col("d").alias("dy"))
    m = (
        ends.join(dx, "x")
        .join(dy, "y")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("dx").cast("long").alias("sx"),
            F.sum(F.col("dx") * F.col("dy")).cast("long").alias("sxy"),
            F.sum(F.col("dx") * F.col("dx")).cast("long").alias("sxx"),
        )
    )
    nd = F.col("n").cast("double")
    sxd, sxyd, sxxd = (F.col(c).cast("double") for c in ("sx", "sxy", "sxx"))
    return m.select(
        F.col("n").cast("long").alias("n_edge_ends"),
        F.col("sx").alias("sum_deg"),
        F.col("sxy").alias("sum_prod"),
        F.col("sxx").alias("sum_sq"),
        ((nd * sxyd - sxd * sxd) / (nd * sxxd - sxd * sxd)).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# L7 graph analytics, part 5: local clustering coefficient ([EXT] —
# the per-node closure ratio triangles(v) / C(deg(v), 2), the standard
# "how clique-like is this part's neighborhood" signal next to the
# raw triangle count). Reuses the degree-ordered edge-iterator for
# per-node triangle counts (never a wedge join) and the exact integer
# degree; the coefficient is ONE double division of exact integers —
# 2·tri / (deg·(deg−1)) — spelled identically in both engines. Nodes
# with deg < 2 have no wedges and are excluded (the division would be
# 0/0). At 100 TB: same cost envelope as triangle_count_copurchase
# plus one node-keyed join.
# ---------------------------------------------------------------------------

_CLUSTCOEF_ORACLE = """
WITH e0 AS (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT node, COUNT(*) AS d
  FROM (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
  GROUP BY node
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e0 e1
  JOIN e0 e2 ON e2.a = e1.b
  JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
),
tc AS (
  SELECT v, COUNT(*) AS t
  FROM (SELECT x AS v FROM tri UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri)
  GROUP BY v
)
SELECT d.node AS part_key,
       CAST(d.d AS BIGINT) AS degree,
       CAST(COALESCE(tc.t, 0) AS BIGINT) AS n_triangles,
       CAST(2 * COALESCE(tc.t, 0) AS DOUBLE)
         / (CAST(d.d AS DOUBLE) * CAST(d.d - 1 AS DOUBLE))
         AS clustering_coefficient
FROM deg d LEFT JOIN tc ON d.node = tc.v
WHERE d.d >= 2
"""


@register(
    "clustering_coefficient_copurchase",
    oracle=_CLUSTCOEF_ORACLE,
    tags=("L7", "J2", "G8"),
)
def clustering_coefficient_copurchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..caching import tracked_persist

    e0 = _copurchase_edges(spark, sf_dir).transform(tracked_persist)
    deg = (
        e0.select(F.col("u").alias("node"))
        .unionAll(e0.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # per-node triangle counts via the corner-credit enumeration —
    # cheaper than deriving them from per-edge support (each triangle
    # is found once and credits its three corners directly)
    tc = _node_triangle_counts(e0).select(
        F.col("part_key").alias("v"), F.col("n_triangles").alias("t")
    )
    dd = F.col("d").cast("double")
    return (
        deg.join(tc, deg["node"] == tc["v"], "left")
        .filter(F.col("d") >= 2)
        .select(
            F.col("node").alias("part_key"),
            F.col("d").cast("long").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("n_triangles"),
            (
                (2 * F.coalesce(F.col("t"), F.lit(0))).cast("double")
                / (dd * (dd - 1))
            ).alias("clustering_coefficient"),
        )
    )


# ---------------------------------------------------------------------------
# L8/L7 market-basket association rules ([EXT] — the classic
# support/confidence/lift mining pass over co-purchase baskets; the
# product-analytics twin of the co-purchase graph kernels). All three
# measures stay exact: supports are integer basket counts (the pair
# expansion is per-basket, one groupBy shuffle — never a fact×fact
# join), confidence is ONE double division sup(ab)/sup(a), and lift
# multiplies integers BEFORE its single division
# (sup(ab)·N / (sup(a)·sup(b))) so both engines divide the same two
# exact integers. Item supports are vocabulary-sized → broadcast
# joins. Rules emitted in both directions for pairs clearing the
# minimum support.
# ---------------------------------------------------------------------------

_RULES_MIN_SUP = 3

_RULES_ORACLE = f"""
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM b),
item AS (SELECT l_partkey AS it, COUNT(*) AS sup FROM b GROUP BY l_partkey),
pair AS (
  SELECT a.l_partkey AS u, b2.l_partkey AS v, COUNT(*) AS sup_ab
  FROM b a JOIN b b2
    ON a.l_orderkey = b2.l_orderkey AND a.l_partkey < b2.l_partkey
  GROUP BY a.l_partkey, b2.l_partkey
  HAVING COUNT(*) >= {_RULES_MIN_SUP}
),
rules AS (
  SELECT u AS antecedent, v AS consequent, sup_ab FROM pair
  UNION ALL
  SELECT v, u, sup_ab FROM pair
)
SELECT r.antecedent, r.consequent,
       CAST(r.sup_ab AS BIGINT) AS support_ab,
       CAST(ia.sup AS BIGINT) AS support_a,
       CAST(ic.sup AS BIGINT) AS support_b,
       CAST(r.sup_ab AS DOUBLE) / CAST(ia.sup AS DOUBLE) AS confidence,
       CAST(r.sup_ab * n.n_baskets AS DOUBLE)
         / CAST(ia.sup * ic.sup AS DOUBLE) AS lift
FROM rules r
JOIN item ia ON r.antecedent = ia.it
JOIN item ic ON r.consequent = ic.it
CROSS JOIN n
"""


@register(
    "association_rules_copurchase",
    oracle=_RULES_ORACLE,
    tags=("L8", "L7", "G1", "J1"),
)
def association_rules_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    b = li.dropDuplicates(["l_orderkey", "l_partkey"])
    n = b.agg(F.count_distinct("l_orderkey").alias("n_baskets"))
    item = b.groupBy(F.col("l_partkey").alias("it")).agg(
        F.count(F.lit(1)).alias("sup")
    )
    # per-basket pair expansion (k² inside the small sorted basket
    # array), then pair-keyed count — same shape as _copurchase_edges
    # but keeping multiplicity
    baskets = b.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    pair_expr = F.expr(
        "flatten(transform(parts, (x, i) -> "
        "transform(slice(parts, i + 2, size(parts)), y -> struct(x AS u, y AS v))))"
    )
    pair = (
        baskets.select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .agg(F.count(F.lit(1)).alias("sup_ab"))
        .filter(F.col("sup_ab") >= _RULES_MIN_SUP)
    )
    rules = pair.select(
        F.col("u").alias("antecedent"), F.col("v").alias("consequent"), "sup_ab"
    ).unionAll(
        pair.select(
            F.col("v").alias("antecedent"), F.col("u").alias("consequent"), "sup_ab"
        )
    )
    ia = item.select(F.col("it").alias("antecedent"), F.col("sup").alias("sup_a"))
    ic = item.select(F.col("it").alias("consequent"), F.col("sup").alias("sup_b"))
    return (
        rules.join(F.broadcast(ia), "antecedent")
        .join(F.broadcast(ic), "consequent")
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent",
            "consequent",
            F.col("sup_ab").cast("long").alias("support_ab"),
            F.col("sup_a").cast("long").alias("support_a"),
            F.col("sup_b").cast("long").alias("support_b"),
            (F.col("sup_ab").cast("double") / F.col("sup_a").cast("double")).alias(
                "confidence"
            ),
            (
                (F.col("sup_ab") * F.col("n_baskets")).cast("double")
                / (F.col("sup_a") * F.col("sup_b")).cast("double")
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# L6 entity resolution, part 2: Fellegi–Sunter-style weighted field
# agreement ([EXT] — real record linkage scores MULTIPLE fields with
# integer agreement weights instead of a single edit-distance gate;
# the score is the audit trail a data steward reads). The pipeline
# opens with the EXACT-DEDUP PRE-PASS this repo uses for every fuzzy
# stage (cf. embedding_neardup_clusters): byte-identical records
# collapse to one representative (min key) with a multiplicity count
# BEFORE the quadratic stage, so block growth tracks genuine record
# VARIETY, not data volume — measured on the replica lake this takes
# the blocked self-join from alpha 1.14 back to flat, because 100
# replicas of a record score once and re-expand arithmetically via
# n_pairs_represented = n_a*n_b. Candidate pairs then come from exact
# blocking on (p_brand, p_size) — both fields are functions of the
# row, so each pair surfaces in exactly one block — and every weight
# is pure integer: name similarity (10 − min(lev, 10))·5, plus flat
# bonuses for type equality and retail-price proximity (|Δcents| <=
# 100). Both engines share the classic Levenshtein integer, so the
# full scored match set hash-checks. O(len²) DP only inside blocks —
# same envelope as entity_resolution_part_names.
# ---------------------------------------------------------------------------

_FS_MIN_SCORE = 60

_FS_ORACLE = f"""
WITH p AS (
  SELECT MIN(p_partkey) AS rep_key,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         p_name, p_brand, p_type, p_size,
         CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c
  FROM part
  GROUP BY p_name, p_brand, p_type, p_size,
           CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT)
),
cand AS (
  SELECT a.rep_key AS key_a, b.rep_key AS key_b,
         a.n_rows * b.n_rows AS n_pairs_represented,
         (10 - LEAST(levenshtein(a.p_name, b.p_name), 10)) * 5 AS w_name,
         CASE WHEN a.p_type = b.p_type THEN 30 ELSE 0 END AS w_type,
         CASE WHEN ABS(a.price_c - b.price_c) <= 100 THEN 20 ELSE 0 END AS w_price
  FROM p a JOIN p b
    ON a.p_brand = b.p_brand AND a.p_size = b.p_size
   AND a.rep_key < b.rep_key
)
SELECT key_a, key_b,
       CAST(w_name AS INT) AS w_name,
       CAST(w_type AS INT) AS w_type,
       CAST(w_price AS INT) AS w_price,
       CAST(w_name + w_type + w_price AS INT) AS match_score,
       CAST(n_pairs_represented AS BIGINT) AS n_pairs_represented
FROM cand
WHERE w_name + w_type + w_price >= {_FS_MIN_SCORE}
"""


@register("er_weighted_field_agreement", oracle=_FS_ORACLE, tags=("L6", "L2", "J2"))
def er_weighted_field_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        "p_brand",
        "p_type",
        "p_size",
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_c"),
    )
    # exact-dedup pre-pass: one representative per distinct field tuple,
    # multiplicity carried as n_rows (the quadratic stage below then
    # scales with record variety, not corpus volume)
    p = raw.groupBy("p_name", "p_brand", "p_type", "p_size", "price_c").agg(
        F.min("p_partkey").alias("rep_key"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    a, b = p.alias("a"), p.alias("b")
    cand = a.join(
        b,
        (F.col("a.p_brand") == F.col("b.p_brand"))
        & (F.col("a.p_size") == F.col("b.p_size"))
        & (F.col("a.rep_key") < F.col("b.rep_key")),
    )
    w_name = (
        F.lit(10)
        - F.least(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")), F.lit(10))
    ) * 5
    w_type = F.when(F.col("a.p_type") == F.col("b.p_type"), 30).otherwise(0)
    w_price = F.when(
        F.abs(F.col("a.price_c") - F.col("b.price_c")) <= 100, 20
    ).otherwise(0)
    scored = cand.select(
        F.col("a.rep_key").alias("key_a"),
        F.col("b.rep_key").alias("key_b"),
        w_name.cast("int").alias("w_name"),
        w_type.cast("int").alias("w_type"),
        w_price.cast("int").alias("w_price"),
        (F.col("a.n_rows") * F.col("b.n_rows"))
        .cast("long")
        .alias("n_pairs_represented"),
    )
    total = F.col("w_name") + F.col("w_type") + F.col("w_price")
    return (
        scored.withColumn("match_score", total.cast("int"))
        .filter(F.col("match_score") >= _FS_MIN_SCORE)
        .select(
            "key_a",
            "key_b",
            "w_name",
            "w_type",
            "w_price",
            "match_score",
            "n_pairs_represented",
        )
    )


# ---------------------------------------------------------------------------
# L7 graph analytics, part 5: k-CORE decomposition of the co-purchase
# graph ([EXT] — the node-grain sibling of the k-truss edge peel:
# iteratively delete NODES with degree < k; what survives is the
# maximal subgraph of minimum degree k, the standard "dense blob"
# extraction for community seeding and spam/fraud cores). Same
# fixed-round discipline as ktruss_core_copurchase: the registered
# query runs exactly 6 peel rounds so the oracle can UNROLL them —
# degree→keep→semi-join blocks with AS MATERIALIZED (each round reads
# the previous edge set three times; inlined CTEs would expand
# 3^rounds scans) — while Spark runs the identical rounds with a
# localCheckpoint truncating lineage per round. On this corpus k=80
# cascades for 5 rounds and reaches its fixpoint within the 6 (e5 ==
# e6, so the result IS the 80-core); elsewhere it is the documented
# 6-round peel. At 100 TB: per round, one node-keyed degree agg and
# two semi joins — no quadratic stage anywhere.
# ---------------------------------------------------------------------------

_CORE_K = 80
_CORE_ROUNDS = 6


def _kcore_oracle() -> str:
    blocks = []
    prev = "e0"
    for r in range(_CORE_ROUNDS):
        blocks.append(f"""
deg{r} AS MATERIALIZED (
  SELECT node, COUNT(*) AS d
  FROM (SELECT u AS node FROM {prev} UNION ALL SELECT v FROM {prev})
  GROUP BY node
),
keep{r} AS MATERIALIZED (SELECT node FROM deg{r} WHERE d >= {_CORE_K}),
e{r + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM {prev} e
  SEMI JOIN keep{r} ka ON e.u = ka.node
  SEMI JOIN keep{r} kb ON e.v = kb.node
)""")
        prev = f"e{r + 1}"
    return f"""
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),{",".join(blocks)}
SELECT node AS part_key, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM (SELECT u AS node FROM e{_CORE_ROUNDS} UNION ALL SELECT v FROM e{_CORE_ROUNDS})
GROUP BY node
"""


@register("kcore_copurchase", oracle=_kcore_oracle(), tags=("L7", "J2", "G6"))
def kcore_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_edges(spark, sf_dir)
    prev = None
    for _ in range(_CORE_ROUNDS):
        deg = (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= _CORE_K).select("node")
        e = (
            e.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint()
        )
        # Fixed-point early exit (r13, guide §1.2) — same argument as
        # ktruss_core_copurchase: each peel's edge set is a subset of
        # the previous, so an unchanged count proves convergence and
        # every remaining round is an identity recompute. One cheap
        # count job per round over the checkpointed edges.
        n = e.count()
        if n == prev:
            break
        prev = n
    return (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy(F.col("node").alias("part_key"))
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    )


# ---------------------------------------------------------------------------
# L7 label-propagation community detection (synchronous LPA, fixed
# rounds, deterministic min-label tie-break) on the support-thresholded
# co-purchase graph. Classic LPA (Raghavan et al. 2007) is
# tie-broken at random and run to convergence; neither is
# oracle-checkable, so this is the deterministic variant: every node
# starts labelled with its own id, and each synchronous round adopts
# the most frequent label among its neighbours, ties broken by the
# SMALLEST label — a pure function of the graph, replayable in any
# engine. The support>=2 threshold sparsifies the basket graph (at
# sf0.01: 3.6k edges / 1.9k nodes, avg degree ~3.8) so the label
# landscape stays non-trivial (332 communities after 4 rounds, largest
# 82) instead of collapsing into the giant dense-graph community.
#
# Scale posture (100 TB): each round is two keyed shuffles — an
# adjacency⋈labels join on node id and a (node, label) count — both
# O(E); the argmax is a keyed MIN(struct(-count, label)), no windows,
# no driver state. Rounds are a fixed constant and each round's frame
# is localCheckpoint'ed (same lineage-control pattern as
# kcore_copurchase) so the plan never grows with the round count.
# Reference anchor: dags/weather_etl_pipeline.py has no graph surface;
# this extends SURVEY §2.13's curation/graph family.
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 4
_LPA_MIN_SUPPORT = 2


def _copurchase_support_edges(
    spark: SparkSession, sf_dir: str, min_support: int
) -> DataFrame:
    """Co-purchase edges (u < v) kept only when >= min_support distinct
    orders contain both parts — the same one-shuffle per-basket pair
    expansion as _copurchase_edges, with an order-support count instead
    of a dedupe."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    pair_expr = F.expr(
        "flatten(transform(parts, (x, i) -> "
        "transform(slice(parts, i + 2, size(parts)), y -> struct(x AS u, y AS v))))"
    )
    return (
        baskets.select(F.explode(pair_expr).alias("p"))
        .select("p.u", "p.v")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= min_support)
        .select("u", "v")
    )


def _support_graph_sql(min_support: int) -> str:
    """dl/e0/adj CTE chain for the support-thresholded co-purchase
    graph — one SQL spelling shared by the LPA, modularity, and
    link-prediction oracles so the graph definition can never drift."""
    return f"""dl AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
e0 AS MATERIALIZED (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM dl a JOIN dl b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_support}
),
adj AS MATERIALIZED (
  SELECT u AS node, v AS nbr FROM e0 UNION ALL SELECT v, u FROM e0
)"""


def _lpa_oracle() -> str:
    blocks = []
    for r in range(_LPA_ROUNDS):
        blocks.append(f"""
lab{r + 1} AS MATERIALIZED (
  SELECT node, lab FROM (
    SELECT a.node, l.lab,
           ROW_NUMBER() OVER (
             PARTITION BY a.node ORDER BY COUNT(*) DESC, l.lab ASC
           ) AS rn
    FROM adj a JOIN lab{r} l ON a.nbr = l.node
    GROUP BY a.node, l.lab
  ) WHERE rn = 1
)""")
    last = f"lab{_LPA_ROUNDS}"
    return f"""
WITH {_support_graph_sql(_LPA_MIN_SUPPORT)},
lab0 AS MATERIALIZED (SELECT DISTINCT node, node AS lab FROM adj),{",".join(blocks)},
sizes AS (SELECT lab, COUNT(*) AS sz FROM {last} GROUP BY lab)
SELECT CAST(l.node AS BIGINT) AS part_key,
       CAST(l.lab AS BIGINT) AS community,
       CAST(s.sz AS BIGINT) AS community_size
FROM {last} l JOIN sizes s ON l.lab = s.lab
"""


def _lpa_labels(adj: DataFrame, rounds: int) -> DataFrame:
    """Synchronous LPA fold: ``rounds`` rounds of adopt-the-most-
    frequent-neighbour-label with the min-label tie-break, over an
    (node, nbr) adjacency frame. Returns (node, lab)."""
    lab = adj.select("node").distinct().withColumn("lab", F.col("node"))
    for _ in range(rounds):
        # most frequent neighbour label, ties -> smallest label:
        # MIN over struct(-count, label) is exactly that argmax
        lab = (
            adj.join(lab.withColumnRenamed("node", "nbr"), "nbr")
            .groupBy("node", "lab")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("c")).alias("nc"), F.col("lab").alias("lab"))
                ).alias("m")
            )
            .select("node", F.col("m.lab").alias("lab"))
            .localCheckpoint()  # cut per-round lineage (kcore pattern)
        )
    return lab


@register(
    "label_propagation_communities", oracle=_lpa_oracle(), tags=("L7", "J2", "G1")
)
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_support_edges(spark, sf_dir, _LPA_MIN_SUPPORT)
    adj = (
        e.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .unionAll(e.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
        .localCheckpoint()  # materialize once: consumed by all rounds
    )
    lab = _lpa_labels(adj, _LPA_ROUNDS)
    sizes = lab.groupBy("lab").agg(F.count(F.lit(1)).alias("sz"))
    return lab.join(sizes, "lab").select(
        F.col("node").cast("long").alias("part_key"),
        F.col("lab").cast("long").alias("community"),
        F.col("sz").cast("long").alias("community_size"),
    )


# ---------------------------------------------------------------------------
# L7/G8 community-quality audit: Newman modularity of the LPA
# partition ([EXT] — the standard "did the community detection find
# real structure?" number; Q = Σ_c (e_c/m − (D_c/2m)²) over
# communities c with e_c internal edges and total degree D_c). Floats
# die on cross-engine rounding, so the statistic is carried as the
# EXACT integer rational Q·4m² = Σ_c (4·m·e_c − D_c²) (q_num / q_den
# below) with ONE double division at the end — the same fixed-point
# discipline as copurchase_degree_assortativity. The oracle nests the
# full unrolled-CTE LPA replay, so the composition is hash-checked on
# top of the already-proven labels. At 100 TB: e_c is two label joins
# + a keyed agg on the edge list, D_c one keyed agg on the degree
# table — all O(E), no windows, no driver state.
# ---------------------------------------------------------------------------


def _modularity_oracle() -> str:
    lpa = _lpa_oracle()
    # reuse the LPA CTE chain up to lab{rounds}; strip its final SELECT
    body = lpa[: lpa.rindex("sizes AS")]
    last = f"lab{_LPA_ROUNDS}"
    return f"""{body}m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e0),
ec AS (
  SELECT la.lab AS c, CAST(COUNT(*) AS BIGINT) AS e_c
  FROM e0
  JOIN {last} la ON e0.u = la.node
  JOIN {last} lb ON e0.v = lb.node AND la.lab = lb.lab
  GROUP BY 1
),
deg AS (SELECT node, COUNT(*) AS d FROM adj GROUP BY node),
dc AS (
  SELECT l.lab AS c, CAST(SUM(d.d) AS BIGINT) AS d_c
  FROM {last} l JOIN deg d ON l.node = d.node GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
       MIN(m.m) AS m_edges,
       CAST(SUM(4 * m.m * COALESCE(ec.e_c, 0) - dc.d_c * dc.d_c) AS BIGINT)
         AS q_num,
       CAST(4 * MIN(m.m) * MIN(m.m) AS BIGINT) AS q_den,
       CAST(SUM(4 * m.m * COALESCE(ec.e_c, 0) - dc.d_c * dc.d_c) AS DOUBLE)
         / (4 * MIN(m.m) * MIN(m.m)) AS modularity
FROM dc LEFT JOIN ec ON dc.c = ec.c, m
"""


@register("community_modularity", oracle=_modularity_oracle(), tags=("L7", "G8"))
def community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_support_edges(spark, sf_dir, _LPA_MIN_SUPPORT).localCheckpoint()
    adj = (
        e.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .unionAll(e.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
        .localCheckpoint()
    )
    lab = _lpa_labels(adj, _LPA_ROUNDS)
    m = e.agg(F.count(F.lit(1)).cast("long").alias("m"))
    lu = lab.select(F.col("node").alias("u"), F.col("lab").alias("lab_u"))
    lv = lab.select(F.col("node").alias("v"), F.col("lab").alias("lab_v"))
    ec = (
        e.join(lu, "u")
        .join(lv, "v")
        .filter(F.col("lab_u") == F.col("lab_v"))
        .groupBy(F.col("lab_u").alias("c"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_c"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    dc = (
        lab.join(deg, "node")
        .groupBy(F.col("lab").alias("c"))
        .agg(F.sum("d").cast("long").alias("d_c"))
    )
    per_c = dc.join(ec, "c", "left").select(
        "c", F.coalesce("e_c", F.lit(0)).alias("e_c"), "d_c"
    )
    j = per_c.crossJoin(F.broadcast(m))
    term = 4 * F.col("m") * F.col("e_c") - F.col("d_c") * F.col("d_c")
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_communities"),
        F.min("m").alias("m_edges"),
        F.sum(term).cast("long").alias("q_num"),
        (4 * F.min("m") * F.min("m")).cast("long").alias("q_den"),
        (
            F.sum(term).cast("double") / (4 * F.min("m") * F.min("m"))
        ).alias("modularity"),
    )
