"""Reusable relational operators beyond the built-in DataFrame surface.

These are the "library-level custom" pieces from SURVEY.md §7.3:
as-of join (J7), top-k per group (O3/W1), latest-per-key (W1 — the
v_latest_weather pattern, reference sql/create_weather_tables.sql:139-148),
band/range join (J6 — the weather-code CASE thresholds as a lookup,
reference spark_jobs/transform_weather.py:131-138).

All are pure DataFrame compositions — no collect(), no Python row loops —
so they scale with the cluster.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..caching import tracked_persist


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
) -> DataFrame:
    """Top-1 row per key under a deterministic total order.

    DISTINCT ON twin (reference sql/create_weather_tables.sql:140-148);
    callers must pass a tie-breaking total order (SURVEY.md §7.4.3).
    Catalyst rewrites rank-then-filter into per-partition top-k, so this
    is a single shuffle on `keys` even at 100 TB.
    """
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def topk_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-k rows per key (deterministic order required), rank included."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_vals: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right_ts <= left_ts for the same key (SURVEY.md §2.4 J7).

    Implemented with the union-sort trick instead of a range join: tag
    both sides, sort within each key by (ts, side) — right rows sort
    before left rows at equal ts so `<=` semantics hold — and carry the
    last-seen right values forward with last(ignorenulls). One shuffle
    on the key, no quadratic candidate pairs, skew-safe under AQE —
    this is the 100 TB-viable plan; a range join would blow up on hot keys.

    All carried values come from ONE right row (they ride a single
    struct), and ties among right rows sharing (key, ts) break by the
    struct's own ordering — a deterministic total order, so the result
    never depends on partition layout.
    """
    from pyspark.sql import types as T

    on = list(on)
    lcols = [c for c in left.columns]
    rfields = {f.name: f.dataType for f in right.schema.fields}
    rv_type = T.StructType(
        [T.StructField(v, rfields[v]) for v in right_vals]
        + [T.StructField("__rts", rfields[right_ts])]
    )
    tagged_l = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rv_type).alias("__rv"),
    )
    tagged_r = right.select(
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) if c not in on else F.col(c) for c in lcols],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            *[F.col(v) for v in right_vals], F.col(right_ts).alias("__rts")
        ).alias("__rv"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__rv").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_l.unionByName(tagged_r).select(
        *lcols,
        "__side",
        F.last(F.col("__rv"), ignorenulls=True).over(w).alias("__rvc"),
    )
    return (
        carried.filter(F.col("__side") == 1)
        .select(
            *lcols,
            *[F.col(f"__rvc.{v}").alias(f"{v}{suffix}") for v in right_vals],
            F.col("__rvc.__rts").alias(f"{right_ts}{suffix}"),
        )
    )


def band_join(
    df: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Range/θ-join of a fact column into [lo, hi) bands (J6).

    The bands side is tiny by construction (a category lookup), so this
    broadcasts and becomes a BroadcastNestedLoopJoin — per-row scan of a
    handful of bands, no shuffle of the fact side.
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return df.join(F.broadcast(bands), cond, "left")


def assert_max_length(df: DataFrame, limits: dict[str, int]) -> DataFrame:
    """VARCHAR(n) check-constraint as a relation (SURVEY §1.2; the
    reference enforces column widths at DDL —
    sql/create_weather_tables.sql:10,13,22,27,44,47 — and postgres
    rejects oversized inserts; Spark's StringType is unbounded, so the
    contract becomes a pre-load quality gate a pipeline raises on,
    like the Q1/Q2 gates in pipeline.py).

    One scan, one 1-row aggregate (a violation counter + max observed
    length per constrained column), exploded to one audit row per
    column — no per-column passes, no shuffle beyond the single
    partial→final agg, so the gate costs the same at 100 TB as the
    narrowest possible full-scan. NULLs satisfy any width, mirroring
    SQL VARCHAR semantics. Returns
    (col_name, declared_max, n_rows, n_violations, max_len, passed).
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c, n in limits.items():
        aggs.append(F.count_if(F.length(F.col(c)) > n).alias(f"__viol_{c}"))
        aggs.append(F.max(F.length(F.col(c))).alias(f"__max_{c}"))
    row = df.agg(*aggs)
    audits = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.lit(n).cast("int").alias("declared_max"),
            F.col(f"__viol_{c}").cast("bigint").alias("n_violations"),
            F.col(f"__max_{c}").cast("int").alias("max_len"),
        )
        for c, n in limits.items()
    ]
    return (
        row.select(
            F.col("__n").cast("bigint").alias("n_rows"),
            F.explode(F.array(*audits)).alias("__a"),
        )
        .select(
            F.col("__a.col_name").alias("col_name"),
            F.col("__a.declared_max").alias("declared_max"),
            "n_rows",
            F.col("__a.n_violations").alias("n_violations"),
            F.col("__a.max_len").alias("max_len"),
            (F.col("__a.n_violations") == 0).alias("passed"),
        )
        .orderBy("col_name")
    )


def merge_upsert(target: DataFrame, updates: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Keyed upsert: rows of `updates` win over rows of `target`.

    Spark twin of INSERT ... ON CONFLICT (k) DO UPDATE (reference
    dags/weather_etl_pipeline.py:174-190): anti-join the target on the
    natural key, then union the updates (SURVEY.md §4.3.1). With both
    sides partitioned by the key this is one shuffle; at the sink,
    pair with dynamic partition overwrite for idempotent re-runs.
    """
    keys = list(keys)
    untouched = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    return untouched.unionByName(updates.select(*target.columns))


def seed_insert(existing: DataFrame, seed: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Conflict-skip insert: add seed rows whose key is absent.

    Twin of INSERT ... ON CONFLICT DO NOTHING (reference
    sql/create_weather_tables.sql:60-82, the WMO code seeding).
    """
    keys = list(keys)
    fresh = seed.join(existing.select(*keys).distinct(), keys, "left_anti")
    return existing.unionByName(fresh.select(*existing.columns))

def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join (SURVEY.md scale posture): a hot key on
    the big `left` side lands in one shuffle partition and serializes
    the stage; salting fans each key out over `salt` sub-partitions.

    left rows get a deterministic salt from their full key hash plus a
    spread component; the (small-relative) `right` side is replicated
    `salt`× via explode. Join keys become (keys..., __salt), so the hot
    key's rows spread across `salt` reducers. Results are identical to
    the unsalted join — salting only changes the physical distribution.

    AQE's skew-join split handles moderate skew automatically; this
    operator is for the pathological case (one key = half the table)
    where pre-spreading beats post-hoc splitting, and for non-AQE sinks
    like bucketed writes.

    Only inner/left/left_semi/left_anti are supported: those are
    identity-preserving under right-side replication (unmatched LEFT
    rows appear once; replicated right rows only ever match). A
    right/full outer join would emit each unmatched right row `salt`
    times — silently wrong — so it raises instead.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower().replace("_", "") not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} only; {how!r} would "
            "duplicate unmatched right rows across salt replicas"
        )
    keys = list(keys)
    l = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()), F.lit(salt)).cast("int"),
    )
    r = right.withColumn("__salt", F.explode(F.array(*[F.lit(s) for s in range(salt)])))
    return l.join(r, keys + ["__salt"], how).drop("__salt")


def apply_cdc_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str,
    delete_value: str = "D",
) -> DataFrame:
    """Apply a CDC changelog to a snapshot (the generalization of
    merge_upsert to insert/update/DELETE streams — the shape a Debezium/
    binlog feed lands as; no reference analog, the reference's ON
    CONFLICT upsert cannot expire rows).

    Per key, the change with the highest ``seq_cols`` wins (ties must
    be broken by including a unique column, e.g. the log offset). A
    winning delete removes the key; any other winning op replaces or
    inserts the row. Two keyed shuffles total at scale: one window over
    ``changes`` keyed on (keys), one anti-join of ``base`` against the
    touched-key set — both on the same key, so AQE/bucketing can
    co-locate them; the changelog is never joined to itself.
    """
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    survivors = base.join(latest.select(*keys).distinct(), keys, "left_anti")
    upserts = latest.filter(F.col(op_col) != delete_value)
    return survivors.unionByName(upserts.select(*base.columns))


def table_diff(
    left: DataFrame, right: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Snapshot reconciliation: classify every key as added / removed /
    changed / unchanged between two tables with identical schemas
    (migration validation, replica drift detection). One full-outer
    join keyed on ``keys``; non-key columns are packed into a struct
    per side and compared null-safely in-row, so the comparison cost
    is one expression, not N joins. Returns (keys..., change_type).
    """
    keys = list(keys)
    val_cols = [c for c in left.columns if c not in keys]
    if set(left.columns) != set(right.columns):
        raise ValueError(
            f"table_diff requires identical schemas; "
            f"left-only={set(left.columns) - set(right.columns)} "
            f"right-only={set(right.columns) - set(left.columns)}"
        )
    l = left.select(*keys, F.struct(*val_cols).alias("__l"))
    r = right.select(*keys, F.struct(*val_cols).alias("__r"))
    return (
        l.join(r, keys, "full_outer")
        .select(
            *keys,
            F.when(F.col("__r").isNull(), F.lit("removed"))
            .when(F.col("__l").isNull(), F.lit("added"))
            .when(~F.col("__l").eqNullSafe(F.col("__r")), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("change_type"),
        )
    )


def with_global_ntile(
    df: DataFrame,
    order: Sequence[Column],
    n_tiles: int,
    out_col: str,
) -> DataFrame:
    """NTILE(n) over a GLOBAL order without the single-reducer sort.

    A partition-less ``Window.orderBy`` funnels every row through one
    reducer — the classic scale killer for global ranking. This is the
    distributed equivalent: range-partition on the total order (so
    partition i holds strictly smaller keys than partition i+1), rank
    locally inside each partition in parallel, and lift local ranks to
    global ones by adding per-partition prefix offsets. The only
    serial step is the prefix-sum over the ~num_shuffle_partitions
    per-partition COUNTS — a broadcast-sized frame regardless of data
    volume.

    The tile is then pure integer arithmetic on (global_rank, n) using
    NTILE's exact bucket rule — the first ``n mod t`` buckets take
    ``n div t + 1`` rows — so results are bit-identical to a
    single-reducer NTILE given a deterministic total order (callers
    must include a tie-break column, same contract as latest_per_key).

    Cost: one range exchange + one pid-hash exchange on ``df`` + one
    broadcast; all parallel. The input is consumed twice (counts +
    rank), so it is persisted here.
    """
    ranked = _with_global_rank(df, order)
    # NTILE's exact rule in pure integer `div` arithmetic (CASE is
    # lazy, so the ELSE's div-by-base never evaluates when base=0,
    # i.e. n < n_tiles — the WHEN then covers every rank)
    t = int(n_tiles)
    tile = F.expr(
        f"CAST(CASE WHEN __rank <= (__n % {t}) * ((__n div {t}) + 1) "
        f"THEN (__rank - 1) div ((__n div {t}) + 1) + 1 "
        f"ELSE (__n % {t}) "
        f"  + (__rank - (__n % {t}) * ((__n div {t}) + 1) - 1) div (__n div {t}) + 1 "
        f"END AS INT)"
    )
    return ranked.withColumn(out_col, tile).drop("__n", "__rank")


def _with_global_rank(df: DataFrame, order: Sequence[Column]) -> DataFrame:
    """Range-partition + prefix-offset global ROW_NUMBER: adds
    ``__rank`` (1-based bigint over the total order) and ``__n``
    (total row count) without a single-reducer sort. The only serial
    step is the prefix-sum over per-partition counts — broadcast-sized
    regardless of data volume."""
    ranked = (
        df.repartitionByRange(*order)
        .withColumn("__pid", F.spark_partition_id())
        .transform(tracked_persist)
    )
    counts = ranked.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    # prefix offsets + total n: the counts frame has one row per
    # shuffle partition — tiny forever — so its global window is fine
    woff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(woff), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(Window.partitionBy()).alias("__n"),
    )
    local = F.row_number().over(Window.partitionBy("__pid").orderBy(*order))
    return (
        ranked.join(F.broadcast(offs), "__pid")
        .withColumn("__rank", (F.col("__off") + local).cast("bigint"))
        .drop("__pid", "__off")
    )


def with_global_row_number(
    df: DataFrame, order: Sequence[Column], out_col: str
) -> DataFrame:
    """Global ROW_NUMBER() over a total order, distributed (the dense
    re-ID / vocab-building primitive). Same contract as
    with_global_ntile: callers must make ``order`` a total order."""
    return (
        _with_global_rank(df, order)
        .withColumnRenamed("__rank", out_col)
        .drop("__n")
    )


def with_global_running_sum(
    df: DataFrame, order: Sequence[Column], value_col: str, out_col: str
) -> DataFrame:
    """Global running SUM(value) over a total order, distributed — the
    cumulative-share primitive (Pareto/ABC banding, Lorenz curves)
    freed from the single-reducer window. Same machinery and contract
    as _with_global_rank: range-partition on the total order, local
    running sum per partition, lift by broadcast per-partition prefix
    sums; ``order`` must be a total order (include a tie-break) for
    bit-identical parity with the partition-less window spelling.

    ``value_col`` must be an EXACT numeric type (integral or decimal):
    the per-partition SUM + broadcast prefix offsets reassociate
    additions, so bit parity with the single-window spelling only holds
    when addition is associative — float/double callers are rejected.
    """
    vtype = df.schema[value_col].dataType.typeName()
    if vtype in ("float", "double"):
        raise TypeError(
            f"with_global_running_sum requires an exact numeric value_col; "
            f"{value_col!r} is {vtype} (reassociated float addition breaks "
            f"bit parity) — cast to decimal first"
        )
    ranked = (
        df.repartitionByRange(*order)
        .withColumn("__pid", F.spark_partition_id())
        .transform(tracked_persist)
    )
    sums = ranked.groupBy("__pid").agg(F.sum(value_col).alias("__psum"))
    # one row per shuffle partition — tiny forever (same argument as
    # _with_global_rank's counts frame)
    woff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = sums.select(
        "__pid",
        F.coalesce(F.sum("__psum").over(woff), F.lit(0)).alias("__off"),
    )
    local = F.sum(value_col).over(
        Window.partitionBy("__pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranked.join(F.broadcast(offs), "__pid")
        .withColumn(out_col, F.col("__off") + local)
        .drop("__pid", "__off")
    )


def exact_deciles_du(df: DataFrame, part_col: str, val_col: str) -> DataFrame:
    """Per-group type-7 deciles (q = k/10, k = 1..9) over an INTEGER
    column, as exact DECI-UNIT integers (round 11 — the winsorized
    construction generalized).

    Type-7 at q = k/10 sits at pos = k·(n-1)/10, an exact rational, so
      p_k = lo + (hi - lo) · ((k·(n-1)) mod 10) / 10
    has the exact integer representation
      p_k·10 = lo·10 + (hi - lo) · ((k·(n-1)) mod 10).
    Everything is bigint arithmetic — no interpolation floats, so
    downstream threshold comparisons and the final one-cast double are
    engine-identical by construction (cf. plans/events.py winsorized:
    Spark's (1-g)·lo + g·hi and DuckDB's lo + (hi-lo)·g round
    differently off clean values).

    One value-ordered window pass (partition-bounded — never a global
    sort) and one group-agg selecting the 18 rank stats. Returns one
    row per group: (part_col, n, thr1_du .. thr9_du)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(part_col).orderBy("__v")
    wn = Window.partitionBy(part_col)
    ranked = df.select(part_col, F.col(val_col).cast("bigint").alias("__v")).withColumn(
        "__rn", F.row_number().over(w)
    ).withColumn("__n", F.count(F.lit(1)).over(wn))
    aggs = [F.max("__n").alias("n")]
    for k in range(1, 10):
        aggs.append(
            F.max(
                F.when(F.expr(f"__rn = ({k}*(__n-1)) div 10 + 1"), F.col("__v"))
            ).alias(f"__lo{k}")
        )
        aggs.append(
            F.max(
                F.when(
                    F.expr(f"__rn = least(({k}*(__n-1)) div 10 + 2, __n)"),
                    F.col("__v"),
                )
            ).alias(f"__hi{k}")
        )
    th = ranked.groupBy(part_col).agg(*aggs)
    out_cols = [F.col(part_col), F.col("n")]
    for k in range(1, 10):
        out_cols.append(
            (
                F.col(f"__lo{k}") * 10
                + (F.col(f"__hi{k}") - F.col(f"__lo{k}"))
                * F.pmod(k * (F.col("n") - 1), F.lit(10))
            ).alias(f"thr{k}_du")
        )
    return th.select(*out_cols)
