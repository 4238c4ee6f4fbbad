"""Training-data curation operators (SURVEY.md §2.13 extension): the
selection/splitting/packing layer a large-scale training-data pipeline
runs between dedup and tokenization.

Determinism discipline: every sampling decision is a pure function of
the row's key via md5 — no RNG state, no partition-order dependence —
so samples are reproducible across runs, engines, and cluster sizes,
and the DuckDB oracle can replay them exactly (md5 is identical
everywhere). Comparing on the hex-string prefix keeps the predicate
engine-portable: lexicographic order on hex equals numeric order on
the underlying bits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hash_key(key: Column, salt: str = "") -> Column:
    """Deterministic uniform sampling key: md5 hex of the row key (+
    optional salt so independent samples don't correlate).

    NULL keys hash to NULL (F.concat propagates null like SQL ``||``),
    matching the DuckDB oracle spelling ``md5(key || '|salt')`` — a
    null-skipping concat would collapse every null-key row onto ONE
    hash and move them as a fully-correlated block."""
    return F.md5(F.concat(key.cast("string"), F.lit(f"|{salt}")))


def deterministic_sample(
    df: DataFrame, key_col: str, keep_hex_below: str, salt: str = ""
) -> DataFrame:
    """Keep rows whose hashed key falls below a hex threshold — e.g.
    ``keep_hex_below="29"`` keeps ~16% (0x29/0x100). Sampling is
    per-row and shuffle-free; the fraction is exact in expectation and
    binomial in realization, like any hash sample. Rows with NULL keys
    are dropped (null comparison is never true), as in the SQL twin."""
    if len(keep_hex_below) != 2 or keep_hex_below != keep_hex_below.lower():
        raise ValueError(
            f"keep_hex_below must be 2 lowercase hex chars (md5 output is "
            f"lowercase; uppercase sorts before digits' letters and silently "
            f"skews the fraction): got {keep_hex_below!r}"
        )
    return df.filter(F.substring(hash_key(F.col(key_col), salt), 1, 2) < keep_hex_below)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    train_below: str = "cc",
    val_below: str = "e6",
    salt: str = "split",
) -> DataFrame:
    """Deterministic 3-way split (defaults ≈ 80/10/10 via hex
    thresholds 0xcc≈0.797, 0xe6≈0.898): adds a ``split`` column. A
    document's split never changes as the corpus grows — the property
    that prevents train/test leakage across pipeline re-runs."""
    h = F.substring(hash_key(F.col(key_col), salt), 1, 2)
    return df.withColumn(
        "split",
        F.when(h < train_below, "train").when(h < val_below, "val").otherwise("test"),
    )


def per_group_cap(
    df: DataFrame, group_cols: list[str], key_col: str, cap: int, salt: str = ""
) -> DataFrame:
    """Class-balanced downsampling: at most ``cap`` rows per group,
    chosen by hashed-key order (deterministic, unbiased within group —
    unique within the group: rows tying on BOTH hash and key are
    identical in the sort and interchangeable). One shuffle on the
    group key; the rank is a single window pass."""
    w = Window.partitionBy(*group_cols).orderBy(
        hash_key(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


def sequence_pack(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    budget: int,
    partition_cols: list[str] | None = None,
    global_ok: bool = False,
) -> DataFrame:
    """Streaming sequence packing: assign documents (in deterministic
    key order) to fixed token-budget bins — bin i covers the docs whose
    exclusive running token total lies in [i*budget, (i+1)*budget).

    Packing is contiguous by exclusive running total, not best-fit
    (best-fit is inherently sequential — this is the shape that
    distributes): a doc is assigned to the bin its PREFIX total falls
    in, so a doc straddling a boundary overflows its bin, and bin
    content is bounded by budget + max single-doc length, not by budget
    alone. Consumers needing a hard cap must split oversized docs
    upstream. Determinism requires ``key_col`` to be unique within each
    shard (duplicate keys tie in the sort; ``tokens_col`` is a
    secondary tie-break so equal (key, tokens) rows — which are
    interchangeable — can never flip bin assignments). The running sum
    is per ``partition_cols`` shard (real pipelines pack within shards
    and the bin id is (shard, local_bin)); ``partition_cols`` is
    REQUIRED because an unpartitioned ORDER BY window funnels the
    entire corpus through one reducer — callers who truly want that
    (tiny data only) must say so with ``global_ok=True``. Returns the
    input plus ``bin_id``.
    """
    if not partition_cols and not global_ok:
        raise ValueError(
            "sequence_pack without partition_cols is a single-reducer "
            "global window — pass partition_cols (the scale path) or "
            "explicitly opt in with global_ok=True for small data"
        )
    part = partition_cols or []
    w = (
        Window.partitionBy(*part)
        .orderBy(F.col(key_col), F.col(tokens_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return df.withColumn("bin_id", F.floor(prefix / F.lit(budget)))


def pps_weighted_sample(
    df: DataFrame, key_col: str, weight_col: str, salt: str = "pps"
) -> DataFrame:
    """Probability-proportional-to-size sampling ([EXT] — the curation
    move for over-represented short/boilerplate docs: keep each row
    with P = weight / max(weight), deterministically). The uniform
    draw is the first 8 hex chars of the keyed md5 read as an integer
    u ∈ [0, 16^8); the keep test is the PURE-INTEGER comparison
    u * max_weight < weight * 16^8 — no float thresholds, so any
    engine replays the exact kept set. Both products are computed in
    DECIMAL(38,0): with u up to 2^32 a BIGINT product would silently
    wrap once max(weight) ≥ ~2^31, corrupting the kept set; decimal
    keeps the comparison exact for any weight < 10^28. max(weight)
    folds in as a broadcast 1-row aggregate (no driver action)."""
    u = (
        F.conv(F.substring(hash_key(F.col(key_col), salt), 1, 8), 16, 10)
        .cast("bigint")
        .cast("decimal(38,0)")
    )
    mx = df.agg(F.max(F.col(weight_col)).alias("__maxw"))
    return (
        df.crossJoin(F.broadcast(mx))
        .filter(
            u * F.col("__maxw").cast("decimal(38,0)")
            < F.col(weight_col).cast("decimal(38,0)") * F.lit(16**8).cast("decimal(38,0)")
        )
        .drop("__maxw")
    )
