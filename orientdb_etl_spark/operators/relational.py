"""Relational transformers — the analytics surface the reference lacks.

SURVEY §2.8: the reference has no aggregation, window, sort, limit or set
operation of any kind; they come with the DataFrame surface. Exposing them
as config transformers makes the engine a complete query engine, not just a
record mover. All of these compile to native Catalyst operators (whole-stage
codegen; no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orientdb_etl_spark.context import PipelineContext
from orientdb_etl_spark.exprs import translate_osql
from orientdb_etl_spark.operators import register


import re


def join_back_null_safe(
    left: DataFrame, right: DataFrame, keys: "list[str]", how: str = "inner"
) -> DataFrame:
    """Join grouped-aggregate results back onto their source on the
    GROUPING keys with NULL-SAFE equality, keeping the left frame's key
    columns. ``groupBy`` makes NULL its own group, but a plain
    ``join(on=keys)`` uses null-unsafe equality and silently drops every
    row of a NULL-keyed group on the way back — the defect class behind
    the round-6 t-closeness fix. Use this whenever a per-group scalar
    (median, total, offset) is attached back to the rows it was computed
    from and the keys are nullable."""
    if not keys:
        return left.crossJoin(right)
    r = right
    for k in keys:
        r = r.withColumnRenamed(k, f"_nsj_{k}")
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(r[f"_nsj_{k}"])
        cond = c if cond is None else (cond & c)
    return left.join(r, cond, how).drop(*[f"_nsj_{k}" for k in keys])


def _exprs(ctx: PipelineContext, items: list[str]) -> list:
    return [F.expr(translate_osql(e, ctx.variables)) for e in items]


_SORT_RE = re.compile(
    r"^(?P<expr>.*?)\s*(?P<dir>ASC|DESC)?\s*(?:NULLS\s+(?P<nulls>FIRST|LAST))?\s*$",
    re.IGNORECASE,
)


def _sort_exprs(
    ctx: PipelineContext | None, items: list[str]
) -> list:
    """Parse `expr [ASC|DESC] [NULLS FIRST|LAST]` — F.expr alone does NOT
    accept ORDER BY modifiers (and silently misparses some forms), so
    every operator taking sort strings must route through here. ctx=None
    skips OSQL variable rendering (pure-function callers)."""
    out = []
    for item in items:
        m = _SORT_RE.match(item.strip())
        col = F.expr(
            translate_osql(m.group("expr"), ctx.variables) if ctx else m.group("expr")
        )
        desc = (m.group("dir") or "").upper() == "DESC"
        nulls = (m.group("nulls") or "").upper()
        if desc:
            col = col.desc_nulls_first() if nulls == "FIRST" else col.desc_nulls_last() if nulls == "LAST" else col.desc()
        elif nulls:
            col = col.asc_nulls_first() if nulls == "FIRST" else col.asc_nulls_last()
        elif m.group("dir"):
            col = col.asc()
        out.append(col)
    return out


@register("select")
def select_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """Projection; entries are SQL expressions with optional ``AS`` alias."""
    return df.selectExpr(
        *[translate_osql(e, ctx.variables) for e in cfg["columns"]]
    )


@register("filter")
def filter_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    return df.filter(F.expr(translate_osql(cfg["condition"], ctx.variables)))


@register("aggregate")
def aggregate_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """groupBy/rollup/cube/groupingSets + aggregate expressions (all
    map-side-combinable built-ins — partial aggregation happens before the
    shuffle; grouping-set expansion multiplies agg state by set count,
    never input size)."""
    keys = cfg.get("groupBy", [])
    mode = str(cfg.get("mode", "groupBy")).lower()
    if mode == "groupingsets":
        # DataFrame API has no groupingSets — route through SQL on a view
        sets = cfg["sets"]  # e.g. [["a", "b"], ["a"], []]
        df.createOrReplaceTempView("_gsets_in")
        sets_sql = ", ".join("(" + ", ".join(s) + ")" for s in sets)
        aggs_sql = ", ".join(
            translate_osql(a, ctx.variables) for a in cfg["aggregations"]
        )
        keys_sql = ", ".join(keys)
        return ctx.spark.sql(
            f"SELECT {keys_sql}, {aggs_sql} FROM _gsets_in "
            f"GROUP BY GROUPING SETS ({sets_sql})"
        )
    aggs = _exprs(ctx, cfg["aggregations"])
    if mode == "rollup":
        grouped = df.rollup(*keys)
    elif mode == "cube":
        grouped = df.cube(*keys)
    else:
        grouped = df.groupBy(*keys)
    return grouped.agg(*aggs)


@register("join")
def join_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """Config join against a registered table / previous `output` branch.
    ``broadcast: true`` hints the small side; otherwise Catalyst/AQE pick
    the physical strategy (broadcast-hash under threshold, else sort-merge)."""
    other_name = cfg["with"]
    other = ctx.outputs.get(other_name) or ctx.tables.get(other_name)
    if other is None:
        other = ctx.spark.table(other_name)
    if cfg.get("broadcast"):
        other = F.broadcast(other)
    how = cfg.get("how", "inner")
    on = cfg["on"]
    if isinstance(on, str) and "=" in on and not on.isidentifier():
        df.createOrReplaceTempView("_join_l")
        other.createOrReplaceTempView("_join_r")
        return ctx.spark.sql(
            f"SELECT * FROM _join_l {how.upper()} JOIN _join_r ON {on}"
        )
    return df.join(other, on, how)


@register("sort")
def sort_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """Total sort (range-partitioned shuffle). Prefer `topk` when a limit
    follows — Spark rewrites sort+limit to TakeOrderedAndProject, which
    avoids the full range shuffle."""
    return df.orderBy(*_sort_exprs(ctx, cfg["by"]))


@register("limit")
def limit_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    return df.limit(int(cfg["n"]))


@register("topk")
def topk_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """ORDER BY ... LIMIT k as one operator → TakeOrderedAndProject
    (per-partition top-k then a single merge; no global sort shuffle)."""
    return df.orderBy(*_sort_exprs(ctx, cfg["by"])).limit(int(cfg["k"]))


@register("distinct")
def distinct_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    cols = cfg.get("columns")
    return df.dropDuplicates(cols) if cols else df.distinct()


@register("union")
def union_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    other_name = cfg["with"]
    other = ctx.outputs.get(other_name) or ctx.tables.get(other_name)
    if other is None:
        other = ctx.spark.table(other_name)
    out = df.unionByName(other, allowMissingColumns=bool(cfg.get("allowMissing")))
    return out.distinct() if cfg.get("distinct") else out


@register("window")
def window_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """Window functions via selectExpr — ``columns`` may contain full
    ``fn() OVER (PARTITION BY ... ORDER BY ...)`` expressions."""
    extra = [translate_osql(e, ctx.variables) for e in cfg["columns"]]
    return df.selectExpr("*", *extra)


def topk_per_group(
    df: DataFrame,
    keys: str | list[str],
    order_by: list[str],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Top-k rows WITHIN each group (the grouped complement of the global
    ``topk`` transformer): rank by ``order_by`` inside each key and keep
    ranks ≤ k.

    The rank-filter shape compiles to Spark's ``WindowGroupLimit`` with a
    PARTIAL pass before the shuffle — each map task pre-prunes to its own
    local top-k per group, so the exchange carries at most
    tasks × groups × k rows instead of everything (same machinery the
    per-domain cap relies on). ``rank_col`` keeps the rank in the output
    when named.
    """
    from pyspark.sql import Window

    keys = [keys] if isinstance(keys, str) else list(keys)
    # _sort_exprs, NOT bare F.expr: "col DESC" needs the modifier parser
    w = Window.partitionBy(*keys).orderBy(*_sort_exprs(None, order_by))
    out = (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= int(k))
    )
    if rank_col:
        return out.withColumnRenamed("_rk", rank_col)
    return out.drop("_rk")


@register("topkPerGroup")
def topk_per_group_transformer(
    ctx: PipelineContext, df: DataFrame, cfg: dict
) -> DataFrame:
    """Config form: {"topkPerGroup": {"by": ["source"],
    "orderBy": ["n_chars DESC"], "k": 3, "rankField": "rank"}}"""
    return topk_per_group(
        df, cfg["by"], list(cfg["orderBy"]), int(cfg["k"]),
        cfg.get("rankField"),
    )


@register("explode")
def explode_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """{"explode": {"field": "tokens", "outField": "token",
    "position": "pos", "outer": false}} — one row per array element
    (posexplode when ``position`` names the index column; outer keeps
    rows with empty/null arrays as a single null row). Pure per-row
    expansion — no shuffle; downstream aggregations see the exploded
    cardinality, so explode as LATE as the plan allows."""
    field = cfg["field"]
    out = cfg.get("outField", field)
    pos = cfg.get("position")
    outer = bool(cfg.get("outer", False))
    if pos:
        fn = F.posexplode_outer if outer else F.posexplode
        gen = fn(F.col(field)).alias(pos, out)
    else:
        fn = F.explode_outer if outer else F.explode
        gen = fn(F.col(field)).alias(out)
    return df.select(*[c for c in df.columns if c != field], gen)


@register("unpivot")
def unpivot_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """{"unpivot": {"ids": ["o_orderkey"], "values": ["a", "b"],
    "varField": "metric", "valueField": "value"}} — wide → long (melt),
    the inverse of the pivot aggregation mode. Compiles to Spark's
    native Expand node: one pass, rows × |values| output, no shuffle."""
    return df.unpivot(
        [F.col(c) for c in cfg["ids"]],
        [F.col(c) for c in cfg["values"]],
        cfg.get("varField", "variable"),
        cfg.get("valueField", "value"),
    )


def merge_rollup(
    parts: list[DataFrame],
    keys: list[str],
    merges: dict[str, str],
) -> DataFrame:
    """Merge partial aggregate tables into the rollup of their union —
    incremental materialized-view maintenance: aggregate each new
    partition/day ONCE, then combine states instead of re-scanning
    history. ``merges`` maps each state column to its combiner:
    ``"sum"`` (counts and sums), ``"min"``/``"max"``. Averages must be
    carried as (sum, count) state pairs and divided after the merge —
    avg states do not combine, which is why this function refuses a
    mean combiner outright. The merge law (merge of partials == rollup
    of the whole) is exactly CMS/HLL linearity applied to relational
    states, and the gate row pins it against a full re-aggregation.

    Plan: union of the (already tiny) partial tables + one groupBy —
    state-sized work, never data-sized.
    """
    allowed = {"sum", "min", "max"}
    bad = {c: m for c, m in merges.items() if m not in allowed}
    if bad:
        raise ValueError(
            f"unmergeable combiners {bad}: only {sorted(allowed)} states "
            "combine (carry avg as sum+count and divide after)"
        )
    if not parts:
        raise ValueError("merge_rollup needs at least one partial table")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    aggs = [getattr(F, m)(c).alias(c) for c, m in merges.items()]
    return out.groupBy(*keys).agg(*aggs)


@register("mergeRollup")
def merge_rollup_transformer(
    ctx: PipelineContext, df: DataFrame, cfg: dict
) -> DataFrame:
    """Config form: {"mergeRollup": {"tables": ["day1_agg"], "keys":
    ["k"], "merges": {"n": "sum", "total": "sum", "mx": "max"}}} — the
    pipeline frame is one partial; ``tables`` name the others."""
    others = [ctx.tables[t] for t in cfg.get("tables", [])]
    return merge_rollup([df, *others], list(cfg["keys"]), dict(cfg["merges"]))


def exclusive_prefix(
    df: DataFrame,
    order_cols: list[str],
    val_col: str,
    agg: str,
    out_col: str,
    pref_type: str,
    partitions: int | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """Exclusive running aggregate (``min`` or ``sum``) of ``val_col``
    over the total order given by ``order_cols`` — WITHOUT the global
    ORDER BY window that would funnel every row through one task.
    ``checkpoint=False`` skips the localCheckpoint that normally stops
    the window recomputing for the partition-total collect — the plan
    stays inspectable (plan tests use this) at the cost of one repeat.

    The distributed-scan pattern: range-partition on the order columns
    (so partition i holds an order-contiguous slice), take each
    partition's exclusive local running aggregate (window partitioned BY
    partition id), collect only the per-partition totals (<=
    shuffle-partition-count rows — the bounded-driver discipline), fold
    their exclusive prefix on the driver and broadcast it back. The
    result is independent of the partition boundaries (associativity),
    which the tests pin. Rows where ``out_col`` is NULL had no
    predecessor (empty prefix); for ``sum`` callers usually coalesce to
    0, for ``min`` NULL is the honest answer.

    NOTE for ``sum`` on floating point: grouped folding is not
    bit-associative — use integer-valued columns (e.g. cents) when the
    result must replay exactly in another engine.
    """
    from pyspark.sql import Window

    if agg not in ("min", "sum"):
        raise ValueError(f"agg must be 'min' or 'sum', got {agg!r}")
    fn = F.min if agg == "min" else F.sum
    spark = df.sparkSession
    n = int(partitions or spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn("_loc", fn(val_col).over(w))
    if checkpoint:
        local = local.localCheckpoint()
    # bounded driver state: one row per range partition
    pid_tot = {
        r["_pid"]: r["_a"]
        for r in local.groupBy("_pid").agg(fn(val_col).alias("_a")).collect()
    }
    pref_rows, acc = [], None
    for pid in sorted(pid_tot):
        pref_rows.append((pid, acc))
        t = pid_tot[pid]
        if t is not None:
            if acc is None:
                acc = t
            else:
                acc = min(acc, t) if agg == "min" else acc + t
    pref = spark.createDataFrame(pref_rows, f"_pid int, _pref {pref_type}")
    combined = (
        F.least(F.col("_loc"), F.col("_pref"))
        if agg == "min"
        else F.when(
            F.col("_loc").isNull() & F.col("_pref").isNull(), F.lit(None)
        ).otherwise(
            F.coalesce(F.col("_loc"), F.lit(0)) + F.coalesce(F.col("_pref"), F.lit(0))
        )
    )
    return (
        local.join(F.broadcast(pref), "_pid", "left")
        .withColumn(out_col, combined)
        .drop("_pid", "_loc", "_pref")
    )


def skyline2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    minimize_x: bool = True,
    minimize_y: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """2-D skyline (Pareto frontier, Börzsönyi et al. ICDE'01): the rows
    no other row dominates, where q dominates p iff q is <= p on both
    axes (after direction normalization) and strictly better on at least
    one. Duplicate points are both kept (neither dominates the other);
    rows with a NULL on either axis are excluded (dominance undefined).

    Plan shape — the 2-D case needs NO pairwise join and NO global
    window. A point p is dominated iff

      min(y over x' < x)  <= y    OR    min(y over x' = x)  <  y

    Both thresholds come from the per-distinct-x frame (one hash
    aggregation). The strictly-smaller-x running minimum is computed
    DISTRIBUTED: range-partition the per-x frame, take each partition's
    exclusive local running min (a window partitioned BY partition id —
    never a single-task global window), collect only the per-partition
    minima (<= shuffle-partition count rows, the same bounded-driver
    discipline as the streaming bucket-id collect) and broadcast their
    exclusive prefix back. Thresholds then join to the input on x —
    co-partitioned with the aggregation's own shuffle. Works unchanged
    at any row count; only |distinct x| touches the prefix machinery.
    """
    sx = F.col(x_col) if minimize_x else (-F.col(x_col))
    sy = F.col(y_col) if minimize_y else (-F.col(y_col))
    keyed = (
        df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .withColumn("_sx", sx.cast("double"))
        .withColumn("_sy", sy.cast("double"))
    )
    perx = keyed.groupBy("_sx").agg(F.min("_sy").alias("_ymin"))
    thresholds = exclusive_prefix(
        perx, ["_sx"], "_ymin", "min", "_mlt", "double", partitions
    ).select("_sx", "_ymin", "_mlt")
    survivors = (
        keyed.join(thresholds, "_sx")
        .filter(
            (F.col("_mlt").isNull() | (F.col("_mlt") > F.col("_sy")))
            & (F.col("_ymin") >= F.col("_sy"))
        )
    )
    return survivors.drop("_sx", "_sy", "_ymin", "_mlt")


@register("skyline")
def skyline_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """Config form: {"skyline": {"x": "p_retailprice", "y": "p_size",
    "maximizeX": false, "maximizeY": false}}."""
    return skyline2d(
        df,
        x_col=cfg["x"],
        y_col=cfg["y"],
        minimize_x=not cfg.get("maximizeX", False),
        minimize_y=not cfg.get("maximizeY", False),
        partitions=int(cfg["partitions"]) if "partitions" in cfg else None,
    )


def abc_classes(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    thresholds: tuple[float, float] = (0.8, 0.95),
    partitions: int | None = None,
) -> DataFrame:
    """ABC (Pareto 80/95) classification: entities ranked by summed
    value descending, classed 'A' while the running cumulative share is
    <= thresholds[0], 'B' while <= thresholds[1], else 'C' — the
    inventory-analysis staple ("which 20% of parts carry 80% of
    revenue?").

    Exactness discipline: per-entity values are fixed to integer CENTS
    (round(sum·100)) before the running sum, so the cumulative total is
    exact integer arithmetic — grouped float folding is not
    bit-associative and a last-ulp wobble at a threshold boundary would
    flip a class between engines. The running sum itself is
    :func:`exclusive_prefix` over (cents DESC, keys) — range-partitioned
    distributed prefix, no single-task global window. Ties are broken by
    the key columns, so the order (and therefore every class) is total
    and engine-portable.

    Returns key columns + ``value`` (the rounded sum), ``cum_share``
    (6dp) and ``abc_class``.
    """
    lo, hi = float(thresholds[0]), float(thresholds[1])
    if not (0.0 < lo < hi <= 1.0):
        raise ValueError(f"thresholds must satisfy 0 < lo < hi <= 1, got {thresholds}")
    per = df.groupBy(*[F.col(k) for k in key_cols]).agg(
        F.expr(f"CAST(round(sum({value_col}) * 100) AS BIGINT)").alias("_cents")
    )
    per = per.withColumn("_ord", -F.col("_cents"))
    total = per.agg(F.sum("_cents").alias("_tot"))
    pre = exclusive_prefix(
        per, ["_ord", *key_cols], "_cents", "sum", "_ex", "bigint", partitions
    )
    cum = (F.coalesce(F.col("_ex"), F.lit(0)) + F.col("_cents")).alias("_cum")
    out = (
        pre.join(F.broadcast(total))
        .withColumn("_cum", cum)
        .withColumn(
            "cum_share",
            F.round(F.col("_cum") / F.col("_tot").cast("double"), 6),
        )
        .withColumn(
            "abc_class",
            F.when(F.col("cum_share") <= lo, F.lit("A"))
            .when(F.col("cum_share") <= hi, F.lit("B"))
            .otherwise(F.lit("C")),
        )
        .withColumn("value", F.round(F.col("_cents") / 100.0, 2))
    )
    return out.select(*key_cols, "value", "cum_share", "abc_class")


@register("abc")
def abc_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """Config form: {"abc": {"keys": ["l_partkey"], "valueField":
    "l_extendedprice", "thresholds": [0.8, 0.95]}}."""
    thr = cfg.get("thresholds", [0.8, 0.95])
    return abc_classes(
        df,
        key_cols=list(cfg["keys"]),
        value_col=cfg["valueField"],
        thresholds=(float(thr[0]), float(thr[1])),
        partitions=int(cfg["partitions"]) if "partitions" in cfg else None,
    )
