"""Vector similarity surface over `embeddings` (SURVEY.md §2.13 L3 +
embedding near-dup): brute-force cosine top-k baseline, LSH-bucketed
ANN scale path, norm statistics.

All oracle-checked variants use integer quantization (operators/
similarity.py) so dot products and norms are exact in both engines and
rankings are bit-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.similarity import (
    brute_force_topk,
    int_dot,
    lsh_ann_topk,
    neardup_pairs_by_cosine,
    quantize,
)
from ..registry import register

_SQL_QUANT = (
    "list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))"
)

# ---------------------------------------------------------------------------
# L3: exact cosine top-k (query set = every 50th vector, k=10).
# ---------------------------------------------------------------------------

_ANN_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS q_id, {_SQL_QUANT} AS qv FROM embeddings WHERE vec_id % 50 = 0
),
c AS (
  SELECT vec_id AS c_id, {_SQL_QUANT} AS cv FROM embeddings
),
scored AS (
  SELECT q_id, c_id,
         CAST(list_dot_product(qv, cv) AS DOUBLE)
           / (SQRT(CAST(list_dot_product(qv, qv) AS DOUBLE))
              * SQRT(CAST(list_dot_product(cv, cv) AS DOUBLE))) AS cosine
  FROM c CROSS JOIN q
  WHERE q_id <> c_id
)
SELECT q_id, c_id, cosine, CAST(rnk AS INT) AS rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rnk
  FROM scored
)
WHERE rnk <= 10
"""


@register("ann_cosine_topk", oracle=_ANN_ORACLE, tags=("L3", "J8"), bench=True)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 50 == 0)
    res = brute_force_topk(queries, e, "vec_id", "vec_id", "embedding", k=10)
    return res.select("q_id", "c_id", "cosine", F.col("rnk").cast("int").alias("rnk"))


# ---------------------------------------------------------------------------
# Embedding near-duplicate pairs (all-pairs baseline with per-row norms
# computed once — one exact integer dot per pair).
# ---------------------------------------------------------------------------

_NEARDUP_ORACLE = f"""
WITH v AS (
  SELECT vec_id, {_SQL_QUANT} AS qv,
         SQRT(CAST(list_dot_product({_SQL_QUANT}, {_SQL_QUANT}) AS DOUBLE)) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(list_dot_product(a.qv, b.qv) AS DOUBLE) / (a.nrm * b.nrm) AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE CAST(list_dot_product(a.qv, b.qv) AS DOUBLE) / (a.nrm * b.nrm) >= 0.35
"""


@register("embedding_neardup_pairs", oracle=_NEARDUP_ORACLE, tags=("L2", "L3"))
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id",
        quantize(F.col("embedding")).alias("qv"),
    ).withColumn("nrm", F.sqrt(int_dot(F.col("qv"), F.col("qv")).cast("double")))
    a, b = v.alias("a"), v.alias("b")
    cos = int_dot(F.col("a.qv"), F.col("b.qv")).cast("double") / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.35)
    )


# ---------------------------------------------------------------------------
# Norm / distribution statistics per label (exact integer sums).
# ---------------------------------------------------------------------------

_NORMS_ORACLE = f"""
WITH v AS (
  SELECT label, list_dot_product({_SQL_QUANT}, {_SQL_QUANT}) AS sqnorm
  FROM embeddings
)
SELECT label,
       COUNT(*) AS n_vectors,
       CAST(SUM(CAST(sqnorm AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_sqnorm,
       CAST(MIN(CAST(sqnorm AS BIGINT)) AS BIGINT) AS min_sqnorm,
       CAST(MAX(CAST(sqnorm AS BIGINT)) AS BIGINT) AS max_sqnorm
FROM v
GROUP BY label
"""


@register("vector_norm_stats", oracle=_NORMS_ORACLE, tags=("L3", "G1"))
def vector_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    v = e.select(
        "label",
        int_dot(quantize(F.col("embedding")), quantize(F.col("embedding"))).alias(
            "sqnorm"
        ),
    )
    return v.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        (F.sum("sqnorm").cast("double") / F.count(F.lit(1))).alias("avg_sqnorm"),
        F.min("sqnorm").alias("min_sqnorm"),
        F.max("sqnorm").alias("max_sqnorm"),
    )


# ---------------------------------------------------------------------------
# L3 scale path: hyperplane-LSH bucketed ANN (engine-specific hashing →
# rows-only; recall vs brute force is property-tested in tests/).
# ---------------------------------------------------------------------------


@register("ann_lsh_topk", oracle=None, tags=("L3",))
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 50 == 0)
    return lsh_ann_topk(
        queries, e, "vec_id", "vec_id", "embedding", k=10, n_planes=4, dim=64, n_tables=8
    )


# ---------------------------------------------------------------------------
# L3 scale path #2: IVF cluster-probe ANN (deterministic index build →
# stable rows, but engine-specific clustering → rows-only; recall vs
# brute force is property-tested in tests/test_dedup.py).
# ---------------------------------------------------------------------------


@register("ann_ivf_topk", oracle=None, tags=("L3",))
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_ann_topk

    e = table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 50 == 0)
    return ivf_ann_topk(
        queries, e, "vec_id", "vec_id", "embedding", k=10, n_centroids=16, n_probe=4
    )
