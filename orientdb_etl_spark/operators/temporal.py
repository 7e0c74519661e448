"""Temporal joins: as-of (nearest-event) and range (point-in-interval).

Two operators the reference's relational surface lacks but every
event/time-series workload needs. Both are expressed as compositions of
built-in DataFrame ops — no UDFs, no cross products — so Catalyst plans
them like any other declarative query:

- ``asof_join``: the union-tag/window formulation. Instead of a
  non-equi join (which Spark plans as a broadcast-nested-loop or a
  cartesian at scale), both sides are union-tagged into one stream,
  shuffled ONCE on the by-key, and matched with a running
  ``last(right_payload, ignorenulls)`` window. State per key is O(1)
  (the last payload struct), so a 100 TB event stream asof-joined to a
  quote/dimension history costs exactly one shuffle + one sorted window
  pass — the same shape Flink uses for temporal-table joins.
- ``range_join``: interval containment via bucketized equi-join. Each
  interval is exploded onto the fixed-width time buckets it covers, each
  point hashes to its single bucket, and the equi-join on
  (by, bucket) carries a residual containment filter. A point meets an
  interval in exactly one bucket (the one the point falls in), so no
  post-join dedup is needed. Bucket width is the skew/fan-out knob:
  explosion factor = interval_len / width, candidate density = points
  per width. This is the published "binning" strategy for distributed
  interval joins (e.g. Spark's own range-join hints in Databricks
  runtime, Chawda et al. ICDE'14).

Neither exists in the reference (orientdb-etl has only equi-lookups —
OLookupTransformer.java:40-120); they extend SURVEY §2.8's analytics
surface the same way the dedup/ANN family extends §2's ETL surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from orientdb_etl_spark.context import PipelineContext
from orientdb_etl_spark.operators import register


def _as_list(v) -> list[str]:
    if v is None:
        return []
    return [v] if isinstance(v, str) else list(v)


def _and_all(conds: list[Column]) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def _resolve(ctx: PipelineContext, name: str) -> DataFrame:
    other = ctx.outputs.get(name) or ctx.tables.get(name)
    return other if other is not None else ctx.spark.table(name)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str] | None = None,
    direction: str = "backward",
    tolerance: Column | str | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the nearest right row along ``on``.

    ``direction="backward"`` (default) matches the most recent right row
    with ``right.on <= left.on``; ``"forward"`` the earliest right row
    with ``right.on >= left.on`` — pandas ``merge_asof`` semantics,
    left-outer (unmatched left rows keep nulls). ``tolerance`` (an
    INTERVAL expression string, e.g. ``"INTERVAL 30 minutes"``) nulls
    matches farther than the bound, exactly like ``merge_asof``'s.

    One shuffle total: union-tag both sides, window over the by-key
    ordered by (on, side), running ``last(payload, ignorenulls)``.
    Sort-order tie-break makes equal timestamps inclusive: backward
    orders the right row first (visible to a same-ts left row), forward
    orders it last and scans with ``first`` over the following frame.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if direction == "nearest":
        # both candidates from ONE union-tagged window pass (backward
        # layout: an equal-ts right row lands in the preceding frame with
        # distance 0 and wins regardless); equidistant ties prefer the
        # backward match, pandas merge_asof parity
        return _asof_nearest(left, right, on, by, tolerance, right_cols, suffix)
    by = _as_list(by)
    rcols = right_cols or [c for c in right.columns if c != on and c not in by]
    out_names = {c: (c + suffix if c in left.columns else c) for c in rcols}

    # payload carries the right values + the matched timestamp (for the
    # tolerance check); left rows ride along as a struct so arbitrary
    # schemas survive the union untouched
    pay = F.struct(
        F.col(on).alias("_on"), *[F.col(c).alias(c) for c in rcols]
    )
    r_side = 0 if direction == "backward" else 1
    r_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_t"),
        F.lit(r_side).alias("_side"),
        pay.alias("_pay"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_l"),
    )
    l_tagged = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_t"),
        F.lit(1 - r_side).alias("_side"),
        F.lit(None).cast(r_tagged.schema["_pay"].dataType).alias("_pay"),
        F.struct(*left.columns).alias("_l"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy("_t", "_side")
    if direction == "backward":
        matched = F.last("_pay", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        matched = F.first("_pay", ignorenulls=True).over(
            w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
    out = (
        unioned.withColumn("_m", matched)
        .filter(F.col("_l").isNotNull())
        .select("_l", "_m")
    )
    if tolerance is not None:
        tol = F.expr(tolerance) if isinstance(tolerance, str) else tolerance
        in_range = (
            F.col("_m._on") >= F.col("_l." + on) - tol
            if direction == "backward"
            else F.col("_m._on") <= F.col("_l." + on) + tol
        )
        out = out.withColumn(
            "_m", F.when(F.col("_m").isNotNull() & in_range, F.col("_m"))
        )
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(out_names[c]) for c in rcols],
    )


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by,
    tolerance,
    right_cols,
    suffix: str,
) -> DataFrame:
    """merge_asof direction="nearest": same union-tag/single-shuffle
    shape as the directional paths, but BOTH candidates (most recent
    preceding, earliest following) come from the one sorted pass and the
    smaller absolute distance wins — equidistant ties take the backward
    match (pandas parity)."""
    from pyspark.sql.types import TimestampNTZType

    by = _as_list(by)
    rcols = right_cols or [c for c in right.columns if c != on and c not in by]
    out_names = {c: (c + suffix if c in left.columns else c) for c in rcols}

    pay = F.struct(
        F.col(on).alias("_on"), *[F.col(c).alias(c) for c in rcols]
    )
    r_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_t"),
        F.lit(0).alias("_side"),
        pay.alias("_pay"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_l"),
    )
    l_tagged = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tagged.schema["_pay"].dataType).alias("_pay"),
        F.struct(*left.columns).alias("_l"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy("_t", "_side")
    b = F.last("_pay", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    f = F.first("_pay", ignorenulls=True).over(
        w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    out = (
        unioned.withColumn("_b", b)
        .withColumn("_f", f)
        .filter(F.col("_l").isNotNull())
    )

    is_ntz = isinstance(right.schema[on].dataType, TimestampNTZType)

    def _num(c):
        return (c.cast("timestamp") if is_ntz else c).cast("double")

    lts = F.col("_l." + on)
    bd = _num(lts) - _num(F.col("_b._on"))
    fd = _num(F.col("_f._on")) - _num(lts)
    chosen = (
        F.when(F.col("_b").isNull(), F.col("_f"))
        .when(F.col("_f").isNull(), F.col("_b"))
        .when(bd <= fd, F.col("_b"))
        .otherwise(F.col("_f"))
    )
    out = out.withColumn("_m", chosen)
    if tolerance is not None:
        tol = F.expr(tolerance) if isinstance(tolerance, str) else tolerance
        in_range = (F.col("_m._on") >= lts - tol) & (
            F.col("_m._on") <= lts + tol
        )
        out = out.withColumn(
            "_m", F.when(F.col("_m").isNotNull() & in_range, F.col("_m"))
        )
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(out_names[c]) for c in rcols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: str | list[str] | None = None,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join points to the intervals containing them (inclusive bounds).

    Intervals explode onto the fixed-width epoch buckets they overlap;
    points hash to their single bucket; the equi-join on (by, bucket)
    carries the residual ``start <= point <= end`` filter. Pick
    ``bucket_seconds`` near the typical interval length: explosion
    factor stays O(1) and each point only ever meets the intervals
    whose bucket it shares, never the whole table. ``how="left"``
    keeps unmatched points with null interval columns (the exploded
    interval side stays the join's build side either way).
    """
    by = _as_list(by)
    p_epoch = F.col(point_col).cast("double")
    s_epoch = F.col(start_col).cast("double")
    e_epoch = F.col(end_col).cast("double")

    iv = intervals.withColumn(
        "_bk",
        F.explode(
            F.sequence(
                F.floor(s_epoch / bucket_seconds), F.floor(e_epoch / bucket_seconds)
            )
        ),
    )
    pt = points.withColumn("_bk", F.floor(p_epoch / bucket_seconds))
    cond = [pt["_bk"] == iv["_bk"]]
    for c in by:
        cond.append(pt[c] == iv[c])
    residual = (pt[point_col] >= iv[start_col]) & (pt[point_col] <= iv[end_col])
    joined = pt.join(iv, _and_all(cond) & residual, how)
    keep = [pt[c] for c in points.columns] + [
        iv[c].alias(c + "_iv" if c in points.columns else c)
        for c in intervals.columns
        if c not in by
    ]
    return joined.select(*keep)


def resample(
    df: DataFrame,
    ts_col: str,
    bucket_seconds: int,
    keys: str | list[str] | None = None,
    aggs: list[str] | None = None,
    fill: dict | None = None,
) -> DataFrame:
    """Fixed-width time-bucket rollup with gap filling — the hypertable
    `time_bucket` + `generate_series` resample, as two aggregations and
    one narrow explode.

    Pass 1 buckets rows to ``floor(epoch / width)`` and aggregates —
    identical shuffle shape to any groupBy (map-side partial agg first).
    Pass 2 computes each key's [min_bucket, max_bucket] span (tiny — one
    row per key), explodes it into the dense bucket sequence, and left-
    joins the aggregated buckets back, so silent gaps become explicit
    rows. ``fill`` maps column→constant for gap rows (e.g. {"n": 0});
    unfilled columns stay null.

    Scale: the dense side is |keys| × span/width rows of pure bucket ids
    (16 B) — generated, never shuffled from data; the only wide shuffle is
    pass 1's aggregation. Skew follows key cardinality like any groupBy.
    A key spanning the full retention window at tiny widths is the one
    shape to watch (explosion = span/width per key); pick the bucket width
    at the granularity you query, exactly as you would a rollup table.
    """
    keys = _as_list(keys)
    bucket = F.floor(F.col(ts_col).cast("double") / bucket_seconds)
    agg_exprs = [F.expr(a) for a in (aggs or [F.count(F.lit(1)).alias("n_rows")])]
    got = (
        df.withColumn("_bk", bucket)
        .groupBy(*keys, "_bk")
        .agg(*agg_exprs)
    )
    span = got.groupBy(*keys).agg(
        F.min("_bk").alias("_lo"), F.max("_bk").alias("_hi")
    )
    dense = span.select(
        *keys, F.explode(F.sequence("_lo", "_hi")).alias("_bk")
    )
    out = dense.join(got, [*keys, "_bk"], "left")
    out = out.withColumn(
        "bucket_ts", F.timestamp_seconds(F.col("_bk") * bucket_seconds)
    ).drop("_bk")
    for col, v in (fill or {}).items():
        out = out.withColumn(col, F.coalesce(F.col(col), F.lit(v)))
    return out


@register("resample")
def resample_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """Config form: {"resample": {"on": "ts", "bucketSeconds": 3600,
    "by": ["user_id"], "aggregations": ["count(1) AS n"],
    "fill": {"n": 0}}}"""
    return resample(
        df,
        ts_col=cfg["on"],
        bucket_seconds=int(cfg.get("bucketSeconds", 3600)),
        keys=cfg.get("by"),
        aggs=cfg.get("aggregations"),
        fill=cfg.get("fill"),
    )


def rolling_agg(
    df: DataFrame,
    ts_col: str,
    keys: str | list[str] | None,
    aggs: dict[str, str],
    window_seconds: int,
) -> DataFrame:
    """Trailing time-RANGE window aggregation — "rolling 7-day revenue
    per customer": for each row, aggregate all rows of the same key whose
    timestamp lies in ``[ts - window_seconds, ts]`` (inclusive both ends,
    the standard RANGE frame).

    ``aggs`` maps output column → aggregate expression over the frame,
    e.g. ``{"roll_sum": "sum(value)", "roll_n": "count(1)"}``.

    Unlike :func:`resample` (fixed buckets), the frame here slides per
    ROW — no bucketing error at window edges. Implemented as a SQL RANGE
    window over epoch seconds, which both Spark and DuckDB define
    identically (peers at equal timestamps all enter the frame, so ties
    are deterministic).

    Scale shape: ONE shuffle on the partition keys; within a partition
    Spark keeps a sliding frame over the sorted run — state is the frame
    content, bounded by window density, and spillable. An unkeyed rolling
    window (keys=None) would be a single-task global sort — refused here;
    use resample for global time rollups.
    """
    keys = _as_list(keys)
    if not keys:
        raise ValueError(
            "rolling_agg requires partition keys (an unkeyed RANGE window "
            "is a single-task global sort; use resample for global rollups)"
        )
    part = ", ".join(keys)
    # double cast: TIMESTAMP_NTZ (raw parquet) won't cast to LONG
    # directly; NTZ→TIMESTAMP reads the naive value in the session TZ
    # (pinned UTC — session.py:81-87), then →LONG truncates to epoch
    # seconds, matching the oracle's floor(epoch(ts))
    order = f"CAST(CAST({ts_col} AS TIMESTAMP) AS LONG)"
    frame = (
        f"OVER (PARTITION BY {part} ORDER BY {order} "
        f"RANGE BETWEEN {int(window_seconds)} PRECEDING AND CURRENT ROW)"
    )
    exprs = ["*"] + [f"{agg} {frame} AS {alias}" for alias, agg in aggs.items()]
    return df.selectExpr(*exprs)


@register("rollingAgg")
def rolling_agg_transformer(
    ctx: PipelineContext, df: DataFrame, cfg: dict
) -> DataFrame:
    """Config form: {"rollingAgg": {"on": "ts", "by": ["user_id"],
    "windowSeconds": 604800, "aggregations": {"roll_sum": "sum(value)"}}}"""
    return rolling_agg(
        df,
        ts_col=cfg["on"],
        keys=cfg.get("by"),
        aggs=dict(cfg["aggregations"]),
        window_seconds=int(cfg.get("windowSeconds", 86400)),
    )


def scd2_history(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    attr_cols: list[str],
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from a stream of
    observations (key, attrs, ts): collapse consecutive runs of identical
    attribute values per key into validity intervals —
    ``valid_from`` = first observation of the run, ``valid_to`` = start
    of the next run (NULL while current). The standard CDC-to-warehouse
    shape: replaying the observation log yields the same history, and
    point-in-time queries become ``valid_from <= t AND (valid_to > t OR
    valid_to IS NULL)`` range lookups.

    Plan: one keyed shuffle feeds three window passes over the same
    (key, ts) partitioning — change-flag (lag), run-id (running sum),
    then the interval close (lead over run starts) — Spark reuses the
    sort/partitioning across same-spec windows, so it stays ONE exchange
    (no per-run groupBy shuffle: run starts/ends come from window
    endpoints). State per key is the frame row, spillable.
    """
    from pyspark.sql import Window

    keys = [keys] if isinstance(keys, str) else list(keys)
    # tie_cols make same-timestamp observation order deterministic —
    # without them, lag() over tied timestamps is partition-layout
    # dependent and the history is not replayable
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tie_cols or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    same = F.lit(True)
    for a in attr_cols:
        same = same & F.col(a).eqNullSafe(F.lag(a).over(w))
    # the key's FIRST observation always opens a run — even when every
    # attribute is NULL (eqNullSafe(NULL, lag=NULL) would claim "same")
    first_row = F.lag(ts_col).over(w).isNull()
    runs = (
        df.withColumn(
            "_chg",
            F.when(first_row | ~same, F.lit(1)).otherwise(F.lit(0)),
        )
        .withColumn(
            "_run",
            F.sum("_chg").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    wr = Window.partitionBy(*keys).orderBy(F.col("_run").asc())
    first_in_run = runs.filter(F.col("_chg") == 1).select(
        *keys, *attr_cols, F.col(ts_col).alias("valid_from"), "_run"
    )
    return (
        first_in_run.withColumn(
            "valid_to", F.lead("valid_from").over(wr)
        ).drop("_run")
    )


@register("scd2")
def scd2_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """Config form: {"scd2": {"keys": ["user_id"], "on": "ts",
    "attributes": ["plan", "region"], "tieBreakers": ["event_id"]}}"""
    return scd2_history(
        df, cfg["keys"], cfg["on"], list(cfg["attributes"]),
        cfg.get("tieBreakers"),
    )


@register("asofJoin")
def asof_join_transformer(
    ctx: PipelineContext, df: DataFrame, cfg: dict
) -> DataFrame:
    """Config form: {"asofJoin": {"right": "<view>", "on": "ts",
    "by": ["user_id"], "direction": "backward",
    "tolerance": "INTERVAL 30 minutes"}}"""
    right = _resolve(ctx, cfg["right"])
    return asof_join(
        df,
        right,
        on=cfg["on"],
        by=cfg.get("by"),
        direction=cfg.get("direction", "backward"),
        tolerance=cfg.get("tolerance"),
        right_cols=cfg.get("rightFields"),
        suffix=cfg.get("suffix", "_r"),
    )


@register("rangeJoin")
def range_join_transformer(
    ctx: PipelineContext, df: DataFrame, cfg: dict
) -> DataFrame:
    """Config form: {"rangeJoin": {"intervals": "<view>", "point": "ts",
    "start": "w_start", "end": "w_end", "by": ["user_id"],
    "bucketSeconds": 3600}}"""
    iv = _resolve(ctx, cfg["intervals"])
    return range_join(
        df,
        iv,
        point_col=cfg["point"],
        start_col=cfg["start"],
        end_col=cfg["end"],
        by=cfg.get("by"),
        bucket_seconds=int(cfg.get("bucketSeconds", 3600)),
        how=cfg.get("joinType", "inner"),
    )


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: one summary row counting the users who
    completed each step strictly AFTER their first completion of the
    previous step (first view, then a click after that view, then a
    purchase after that click, ...).

    Per step: filter to the step's events, join to the previous step's
    per-user first-completion time, keep later events, take the per-user
    minimum. Each stage is one user-keyed aggregation over an
    already-filtered slice — at scale the event stream shuffles once per
    step on the user key (all partial-aggregated map-side), and the
    per-user frames shrink monotonically down the funnel. The final row
    cross-joins the single-row counts.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    prev = None
    stage_counts = []
    for i, step in enumerate(steps):
        ev = df.filter(F.col(type_col) == step)
        if prev is not None:
            ev = ev.join(prev, user_col).filter(F.col(ts_col) > F.col("_ft"))
        cur = ev.groupBy(user_col).agg(F.min(ts_col).alias("_ft"))
        stage_counts.append(
            cur.agg(F.count(F.lit(1)).alias(f"n{i + 1}_{step}"))
        )
        prev = cur
    out = stage_counts[0]
    for c in stage_counts[1:]:
        out = out.crossJoin(c)
    return out


@register("funnel")
def funnel_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """{"funnel": {"steps": ["view", "click", "purchase"]}} over an event
    frame with user/ts/type columns."""
    return funnel_counts(
        df,
        list(cfg["steps"]),
        user_col=cfg.get("userField", "user_id"),
        ts_col=cfg.get("tsField", "ts"),
        type_col=cfg.get("typeField", "event_type"),
    )


def merge_intervals(
    df: DataFrame,
    keys: str | list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Coalesce overlapping/touching intervals per key (the gaps-and-
    islands problem): an interval starts a new island iff its start
    exceeds the running maximum of all previous ends. Returns one row
    per island: (keys, start, end, n_merged).

    Plan: one keyed shuffle feeding two window passes over the same
    (key, start) ordering — running-max-of-ends (lagged) for the island
    flag, running sum for the island id — then one aggregation per
    island. Same single-exchange discipline as scd2_history; state per
    key is the frame row.
    """
    from pyspark.sql import Window

    keys = [keys] if isinstance(keys, str) else list(keys)
    w = Window.partitionBy(*keys).orderBy(
        F.col(start_col).asc(), F.col(end_col).asc()
    )
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "_new",
        F.when(
            prev_max_end.isNull() | (F.col(start_col) > prev_max_end),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_island",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        flagged.groupBy(*keys, "_island")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("_island")
    )


@register("mergeIntervals")
def merge_intervals_transformer(
    ctx: PipelineContext, df: DataFrame, cfg: dict
) -> DataFrame:
    """Config form: {"mergeIntervals": {"keys": ["user_id"],
    "start": "valid_from", "end": "valid_to"}}"""
    return merge_intervals(df, cfg["keys"], cfg["start"], cfg["end"])


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    bucket_seconds: int = 7 * 86400,
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the time bucket of
    their FIRST event; each cell is how many (and what fraction of) the
    cohort was active ``offset`` buckets later. The product-analytics
    staple, as three aggregations:

    1. first-touch per user (groupBy min — map-side combinable),
    2. distinct active users per (cohort, offset) — the only
       user-cardinality shuffle,
    3. cohort sizes (offset 0) broadcast back for the fraction.

    Returns (cohort_bucket, offset, n_users, frac). frac is rounded to
    6 places; cohort_bucket is the epoch-bucket index (multiply by
    ``bucket_seconds`` for the timestamp).
    """
    # double cast via TIMESTAMP: raw-parquet TIMESTAMP_NTZ won't cast to
    # double directly (session TZ is pinned UTC, same fix as rolling_agg)
    bucket = F.floor(
        F.col(ts_col).cast("timestamp").cast("double") / bucket_seconds
    )
    first = (
        df.groupBy(user_col)
        .agg(F.min(bucket).alias("_cohort"))
    )
    joined = df.join(first, user_col).select(
        F.col("_cohort").alias("cohort_bucket"),
        (bucket - F.col("_cohort")).alias("offset"),
        F.col(user_col),
    )
    cells = joined.groupBy("cohort_bucket", "offset").agg(
        F.count_distinct(F.col(user_col)).alias("n_users")
    )
    sizes = first.groupBy(F.col("_cohort").alias("cohort_bucket")).agg(
        F.count(F.lit(1)).alias("_size")
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_bucket")
        .withColumn("frac", F.round(F.col("n_users") / F.col("_size"), 6))
        .drop("_size")
    )


@register("cohortRetention")
def cohort_retention_transformer(
    ctx: PipelineContext, df: DataFrame, cfg: dict
) -> DataFrame:
    """Config form: {"cohortRetention": {"userField": "user_id",
    "on": "ts", "bucketSeconds": 604800}}"""
    return cohort_retention(
        df, cfg["userField"], cfg["on"],
        int(cfg.get("bucketSeconds", 7 * 86400)),
    )


def _epoch_order(ts_col: str, tiebreak: str | None) -> list[Column]:
    """Deterministic window order: floor-epoch seconds (the NTZ-safe
    double cast, same as :func:`rolling_agg`) plus an explicit tiebreak
    column — with tied timestamps and no tiebreak, lag/cumsum windows
    are nondeterministic across runs and engines."""
    order = [F.expr(f"CAST(CAST({ts_col} AS TIMESTAMP) AS LONG)")]
    if tiebreak:
        order.append(F.col(tiebreak))
    return order


def ewma(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    lookback: int = 8,
    tiebreak: str | None = None,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average over the trailing
    ``lookback`` observations per key (the pandas ``ewm(adjust=True)``
    form truncated to a bounded window):

        y_t = sum_i (1-a)^i * x_{t-i} / sum_i (1-a)^i  (i over present lags)

    Missing lags at a series head (and NULL values) drop out of BOTH the
    numerator and the normalizer, so early rows are exact EWMAs of the
    history that exists — no warm-up bias.

    A bounded window is the scale-safe choice: the unbounded recursive
    EWMA needs sequential per-key state (a stateful scan), while this
    form is ``lookback`` lag() expressions over ONE keyed exchange —
    whole-stage-codegen'd, spillable, identical semantics in any engine
    with window lags. At (1-a)=0.7 and lookback=8 the truncation error
    is <= 0.7^8 ~ 5.8% of the tail weight, and weights are Python float
    literals so engines cannot disagree on them.
    """
    if not 0 < alpha <= 1:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if lookback < 1:
        raise ValueError(f"lookback must be >= 1, got {lookback}")
    keys = _as_list(keys)
    w = Window.partitionBy(*keys).orderBy(*_epoch_order(ts_col, tiebreak))
    v = F.col(value_col).cast("double")
    num, den = F.lit(0.0), F.lit(0.0)
    for i in range(lookback):
        weight = (1.0 - alpha) ** i
        x = v if i == 0 else F.lag(v, i).over(w)
        num = num + F.when(x.isNotNull(), x * F.lit(weight)).otherwise(F.lit(0.0))
        den = den + F.when(x.isNotNull(), F.lit(weight)).otherwise(F.lit(0.0))
    return df.withColumn(
        out_col, F.when(den > 0, num / den).otherwise(F.lit(None))
    )


@register("ewma")
def ewma_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """Config form: {"ewma": {"by": ["user_id"], "on": "ts",
    "valueField": "value", "alpha": 0.3, "lookback": 8,
    "tiebreak": "event_id", "output": "ewma"}}"""
    return ewma(
        df,
        keys=cfg.get("by") or [],
        ts_col=cfg["on"],
        value_col=cfg["valueField"],
        alpha=float(cfg.get("alpha", 0.3)),
        lookback=int(cfg.get("lookback", 8)),
        tiebreak=cfg.get("tiebreak"),
        out_col=cfg.get("output", "ewma"),
    )


def holt_linear(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    lookback: int = 8,
    tiebreak: str | None = None,
    horizon: int = 1,
) -> DataFrame:
    """Brown's double exponential smoothing (Holt-style linear trend)
    per key: smooth once (:func:`ewma`), smooth the smoothed series
    again with the SAME weights, then the closed-form identities

        level_t    = 2·S'_t − S''_t
        trend_t    = α/(1−α) · (S'_t − S''_t)
        forecast_t = level_t + horizon · trend_t

    (Brown 1963 — the h-step-ahead linear forecast a level-only EWMA
    systematically lags on trending series). Adds ``level``, ``trend``,
    ``forecast`` columns.

    Scale shape: two windowed lag-sum passes that share ONE keyed
    exchange (same partition/order — the second Window reuses the
    first's sort), each a fixed chain of lag() expressions inside
    whole-stage codegen. No recursion, no state: the bounded-lookback
    form is what makes double smoothing expressible as plain windows,
    and fixed left-associated expression sums (not grouped folds) are
    how both engines stay bit-identical.
    """
    if not 0 < alpha < 1:
        raise ValueError(
            f"alpha must be in (0, 1) for the trend identity, got {alpha}"
        )
    s1 = ewma(
        df, keys, ts_col, value_col, alpha, lookback, tiebreak, out_col="_s1"
    )
    s2 = ewma(s1, keys, ts_col, "_s1", alpha, lookback, tiebreak, out_col="_s2")
    k = alpha / (1.0 - alpha)
    level = 2.0 * F.col("_s1") - F.col("_s2")
    trend = F.lit(k) * (F.col("_s1") - F.col("_s2"))
    return (
        s2.withColumn("level", level)
        .withColumn("trend", trend)
        .withColumn("forecast", level + F.lit(float(horizon)) * trend)
        .drop("_s1", "_s2")
    )


@register("holt")
def holt_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """Config form: {"holt": {"by": ["user_id"], "on": "ts",
    "valueField": "value", "alpha": 0.3, "lookback": 8,
    "tiebreak": "event_id", "horizon": 1}}"""
    return holt_linear(
        df,
        keys=cfg.get("by") or [],
        ts_col=cfg["on"],
        value_col=cfg["valueField"],
        alpha=float(cfg.get("alpha", 0.3)),
        lookback=int(cfg.get("lookback", 8)),
        tiebreak=cfg.get("tiebreak"),
        horizon=int(cfg.get("horizon", 1)),
    )


def cusum_changepoints(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    value_col: str,
    k: float = 0.5,
    h: float = 5.0,
    tiebreak: str | None = None,
) -> DataFrame:
    """Two-sided CUSUM drift detection per key (Page 1954): standardized
    deviations accumulate in S+/S- and a row is flagged once either side
    exceeds ``h``; ``k`` is the slack (in sigma units) absorbing noise.

    The textbook recursion ``S_t = max(0, S_{t-1} + z_t - k)`` is
    sequential, but has the closed window form

        S_t = C_t - min(0, min_{j<=t} C_j),   C_t = sum_{j<=t} (z_j - k)

    so the whole detector is: per-key mean/stddev (full-frame window),
    one running sum, one running min per side — all over the SAME keyed
    exchange (one shuffle total), no stateful scan, engine-portable.
    Zero-variance keys standardize to z = 0 and never flag.

    Appends ``s_pos``, ``s_neg``, ``changepoint``.
    """
    keys = _as_list(keys)
    full = Window.partitionBy(*keys)
    run = (
        Window.partitionBy(*keys)
        .orderBy(*_epoch_order(ts_col, tiebreak))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    v = F.col(value_col).cast("double")
    mu = F.avg(v).over(full)
    sd = F.stddev_samp(v).over(full)
    z = F.when(sd > 0, (v - mu) / sd).otherwise(F.lit(0.0))
    out = df.withColumn("_zp", z - F.lit(k)).withColumn("_zn", -z - F.lit(k))
    for side, acc in (("s_pos", "_zp"), ("s_neg", "_zn")):
        # materialize C first: a running-min OVER a running-sum would be
        # an (illegal) nested window expression
        out = out.withColumn(f"_c{side}", F.sum(acc).over(run)).withColumn(
            side,
            F.col(f"_c{side}")
            - F.least(F.lit(0.0), F.min(f"_c{side}").over(run)),
        )
    return (
        out.drop("_zp", "_zn", "_cs_pos", "_cs_neg")
        .withColumn(
            "changepoint", (F.col("s_pos") > h) | (F.col("s_neg") > h)
        )
    )


@register("cusum")
def cusum_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """Config form: {"cusum": {"by": ["user_id"], "on": "ts",
    "valueField": "value", "k": 0.5, "h": 5.0, "tiebreak": "event_id"}}"""
    return cusum_changepoints(
        df,
        keys=cfg.get("by") or [],
        ts_col=cfg["on"],
        value_col=cfg["valueField"],
        k=float(cfg.get("k", 0.5)),
        h=float(cfg.get("h", 5.0)),
        tiebreak=cfg.get("tiebreak"),
    )


def transition_counts(
    df: DataFrame,
    seq_col: str,
    state_col: str,
    ts_col: str,
    tiebreak: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over per-sequence event
    streams: for every consecutive (state, next-state) step within a
    sequence, the count ``n`` and the row-normalized probability
    ``p = n / Σ n over the same from_state`` — the "what happens after
    X?" table behind next-event dashboards and behavioral clustering.

    Plan shape: ONE window (lag/lead shuffles once on the sequence key —
    the same partitioning every per-sequence operator here reuses), one
    map-side-combinable pair count, and a from_state total that is tiny
    (|states|² ceiling) and broadcasts back. Ties in ``ts_col`` make
    lead() nondeterministic, so pass ``tiebreak`` whenever timestamps
    can collide (the gate always does).
    """
    w = Window.partitionBy(seq_col).orderBy(*_epoch_order(ts_col, tiebreak))
    steps = (
        df.select(
            F.col(state_col).alias("from_state"),
            F.lead(F.col(state_col)).over(w).alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
    )
    counts = steps.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("from_state").agg(F.sum("n").alias("_tot"))
    return (
        counts.join(F.broadcast(totals), "from_state")
        .withColumn("p", F.round(F.col("n") / F.col("_tot"), round_to))
        .drop("_tot")
    )


@register("transitions")
def transitions_transformer(
    ctx: PipelineContext, df: DataFrame, cfg: dict
) -> DataFrame:
    """Config form: {"transitions": {"by": "user_id", "stateField":
    "event_type", "on": "ts", "tiebreak": "event_id"}}"""
    return transition_counts(
        df,
        seq_col=cfg["by"],
        state_col=cfg["stateField"],
        ts_col=cfg["on"],
        tiebreak=cfg.get("tiebreak"),
        round_to=int(cfg.get("round", 6)),
    )


def rfm_segments(
    df: DataFrame,
    id_col: str,
    ts_col: str,
    value_col: str,
    k: int = 5,
) -> DataFrame:
    """RFM segmentation (Hughes '94, the retention-marketing staple):
    per entity, Recency (seconds since its last event, measured from the
    dataset's max event time), Frequency (event count) and Monetary
    (summed value, rounded to cents), each scored 1..k by exact
    k-quantile bucket — k is best on every axis (most recent / most
    frequent / highest spend) — plus the concatenated segment label.

    Scale shape: one per-entity aggregation (map-side combinable), one
    single-row max that broadcasts back, then three
    :func:`~orientdb_etl_spark.functions.sampling.quantile_bucket`
    scalar-attach passes over the (already tiny relative to events)
    per-entity frame — NO global-ORDER-BY ntile window anywhere, so
    nothing funnels through one task. Quantile ties share a bucket
    (identically in the SQL twin), which is what makes the scoring
    engine-portable; ntile's equal-count split is not.
    """
    from orientdb_etl_spark.functions.sampling import quantile_bucket

    per = df.groupBy(F.col(id_col).alias("entity")).agg(
        F.max(F.expr(f"CAST(CAST({ts_col} AS TIMESTAMP) AS LONG)")).alias("_last"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum(value_col), 2).alias("monetary"),
    )
    mx = per.agg(F.max("_last").alias("_mx"))
    per = (
        per.join(F.broadcast(mx))
        .withColumn("recency_s", (F.col("_mx") - F.col("_last")).cast("long"))
        .drop("_mx", "_last")
    )
    per = quantile_bucket(per, "recency_s", k, "_rb")
    per = quantile_bucket(per, "frequency", k, "_fb")
    per = quantile_bucket(per, "monetary", k, "_mb")
    r = (F.lit(k) - F.col("_rb")).alias("r_score")  # longest-ago bucket -> 1
    f_ = (F.col("_fb") + 1).alias("f_score")
    m = (F.col("_mb") + 1).alias("m_score")
    return per.select(
        "entity",
        "recency_s",
        "frequency",
        "monetary",
        r,
        f_,
        m,
        F.concat_ws(
            "-",
            (F.lit(k) - F.col("_rb")),
            (F.col("_fb") + 1),
            (F.col("_mb") + 1),
        ).alias("segment"),
    )


@register("rfm")
def rfm_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """Config form: {"rfm": {"idField": "user_id", "on": "ts",
    "valueField": "value", "k": 5}}"""
    return rfm_segments(
        df,
        id_col=cfg["idField"],
        ts_col=cfg["on"],
        value_col=cfg["valueField"],
        k=int(cfg.get("k", 5)),
    )


def conversion_lag(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    from_step: str,
    to_step: str,
) -> DataFrame:
    """Time-to-convert: for every entity that completed ``to_step``
    strictly after its FIRST ``from_step``, the epoch-seconds of both
    firsts and the lag between them — the per-user drill-down behind
    :func:`funnel_counts`' aggregate view (same strictly-after
    discipline), feeding lag histograms / percentile dashboards.

    Plan shape: two user-keyed aggregations over type-filtered slices
    (both partial-aggregated map-side, both pushed-down scans at the
    source) and one equi-join on the user key — the frames shrink to
    |converting users| before anything wide happens. Comparisons run on
    floor-epoch seconds (the engine's portable time base), so a
    same-second "conversion" does NOT count as after.
    """
    epoch = F.expr(f"CAST(CAST({ts_col} AS TIMESTAMP) AS LONG)")
    first_a = (
        df.filter(F.col(type_col) == from_step)
        .groupBy(F.col(user_col).alias("entity"))
        .agg(F.min(epoch).alias("t_from"))
    )
    lagged = (
        df.filter(F.col(type_col) == to_step)
        .select(F.col(user_col).alias("entity"), epoch.alias("_tb"))
        .join(first_a, "entity")
        .filter(F.col("_tb") > F.col("t_from"))
        .groupBy("entity", "t_from")
        .agg(F.min("_tb").alias("t_to"))
    )
    return lagged.select(
        "entity", "t_from", "t_to", (F.col("t_to") - F.col("t_from")).alias("lag_s")
    )


@register("conversionLag")
def conversion_lag_transformer(
    ctx: PipelineContext, df: DataFrame, cfg: dict
) -> DataFrame:
    """Config form: {"conversionLag": {"userField": "user_id", "on":
    "ts", "typeField": "event_type", "from": "view", "to": "purchase"}}"""
    return conversion_lag(
        df,
        user_col=cfg["userField"],
        ts_col=cfg["on"],
        type_col=cfg["typeField"],
        from_step=cfg["from"],
        to_step=cfg["to"],
    )


def top_paths(
    df: DataFrame,
    seq_col: str,
    ts_col: str,
    type_col: str,
    max_len: int = 5,
    k: int = 20,
    tiebreak: str | None = None,
) -> DataFrame:
    """Top-k most common event paths: each sequence's first ``max_len``
    event types in time order joined with '>' (``view>click>purchase``),
    counted across sequences — the path-exploration complement of
    :func:`transition_counts` (whole prefixes, not single steps).

    Plan shape: one row_number window on the sequence key, then the
    per-sequence path build is a groupBy on the SAME key — the second
    stage reuses the window's partitioning, so the path construction
    adds no exchange. Path counting is map-side combinable and the
    final top-k is TakeOrderedAndProject (per-partition heads + one
    merge, no global sort). (count DESC, path ASC) is a total order, so
    the k-boundary is deterministic and engine-portable.
    """
    w = Window.partitionBy(seq_col).orderBy(*_epoch_order(ts_col, tiebreak))
    rn = df.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= int(max_len)
    )
    paths = rn.groupBy(seq_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_rn", F.col(type_col).alias("_t")))
                ),
                lambda x: x["_t"],
            ),
            ">",
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.col("n").desc(), F.col("path").asc()).limit(int(k))


@register("topPaths")
def top_paths_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """Config form: {"topPaths": {"by": "user_id", "on": "ts",
    "typeField": "event_type", "maxLen": 5, "k": 20,
    "tiebreak": "event_id"}}"""
    return top_paths(
        df,
        seq_col=cfg["by"],
        ts_col=cfg["on"],
        type_col=cfg["typeField"],
        max_len=int(cfg.get("maxLen", 5)),
        k=int(cfg.get("k", 20)),
        tiebreak=cfg.get("tiebreak"),
    )


def growth_accounting(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    bucket_seconds: int = 604800,
) -> DataFrame:
    """Product-analytics growth accounting: per period, split the
    active-user count into **new** (first-ever period), **retained**
    (also active the previous period) and **resurrected** (active
    before, but not last period), plus **churned** = last period's
    actives who did not return. The per-period identity
    ``churned_p = active_{p-1} − retained_p`` means churn needs NO
    extra user-level join — it falls out of a lag over the tiny
    per-period frame.

    Returns ``(period, active, new_users, retained, resurrected,
    churned)`` ordered by period; ``churned`` is NULL for the first
    period (no predecessor to churn from).

    Scale shape: ONE distinct on (user, period), then a user-keyed
    window (min period + lag period — both over the same partitioning,
    one exchange) classifies every (user, period) row; one period
    aggregate collapses to ≤ time-range/bucket rows and the churn lag
    runs over that by-construction-tiny frame.
    """
    p = F.floor(
        F.unix_timestamp(F.col(ts_col).cast("timestamp")) / F.lit(bucket_seconds)
    )
    pres = (
        df.where(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
        .select(F.col(user_col).alias("_u"), p.alias("_p"))
        .distinct()
    )
    w = Window.partitionBy("_u").orderBy("_p")
    tagged = pres.select(
        "_p",
        (F.min("_p").over(w) == F.col("_p")).alias("_is_new"),
        (F.lag("_p").over(w) == F.col("_p") - 1).alias("_is_ret"),
    )
    agg = tagged.groupBy("_p").agg(
        F.count(F.lit(1)).alias("active"),
        F.sum(F.when(F.col("_is_new"), 1).otherwise(0)).alias("new_users"),
        F.sum(
            F.when(F.coalesce(F.col("_is_ret"), F.lit(False)), 1).otherwise(0)
        ).alias("retained"),
    )
    wp = Window.orderBy("_p")
    # the global window here is over the per-period frame: time-range /
    # bucket rows by construction, not data-sized
    return (
        agg.withColumn("_prev_active", F.lag("active").over(wp))
        .withColumn("_prev_p", F.lag("_p").over(wp))
        .select(
            F.col("_p").alias("period"),
            "active",
            "new_users",
            "retained",
            (F.col("active") - F.col("new_users") - F.col("retained")).alias(
                "resurrected"
            ),
            F.when(
                F.col("_prev_p") == F.col("_p") - 1,
                F.col("_prev_active") - F.col("retained"),
            ).alias("churned"),
        )
        .orderBy("period")
    )


@register("growthAccounting")
def growth_accounting_transformer(
    ctx: PipelineContext, df: DataFrame, cfg: dict
) -> DataFrame:
    """Config form: {"growthAccounting": {"userField": "user_id",
    "on": "ts", "bucketSeconds": 604800}}"""
    return growth_accounting(
        df,
        cfg["userField"],
        cfg["on"],
        int(cfg.get("bucketSeconds", 604800)),
    )


def attribution(
    touches: DataFrame,
    conversions: DataFrame,
    user_col: str,
    touch_ts: str,
    channel_col: str,
    conv_id: str,
    conv_ts: str,
    window_seconds: int,
    model: str = "linear",
    tiebreak: str | None = None,
) -> DataFrame:
    """Multi-touch attribution: distribute each conversion's credit over
    the touchpoints in its trailing window, then total credit per
    channel — ``(channel, conversions_touched, credit)``.

    Models (k = touches in the conversion's window):

    * ``linear`` — 1/k each
    * ``first_touch`` / ``last_touch`` — all credit to one end
    * ``position`` — U-shaped 40/20/40: 0.4 first, 0.4 last, the
      middle k−2 split 0.2 evenly (k=1 → 1.0, k=2 → 0.5/0.5)

    Credit fractions are exact double divisions of small integers, so
    a SQL twin replays them bit-identically; per-conversion rank uses
    ``(touch_ts, tiebreak)`` — pass a unique tiebreak or tied
    timestamps make first/last nondeterministic.

    Scale shape: the touch↔conversion pairing is
    :func:`range_join` (bucketized equi-join — never a cartesian);
    rank/count run in one window over the conversion key; the final
    per-channel aggregate is map-side combinable. Conversions with zero
    touches contribute nothing (no outer join needed for credit).
    """
    if model not in ("linear", "first_touch", "last_touch", "position"):
        raise ValueError(f"unknown attribution model {model!r}")
    t = touches.select(
        F.col(user_col).alias("_u"),
        F.col(touch_ts).alias("_tts"),
        F.col(channel_col).alias("channel"),
        *([F.col(tiebreak).alias("_tb")] if tiebreak else []),
    )
    c = conversions.select(
        F.col(user_col).alias("_u"),
        F.col(conv_id).alias("_cid"),
        (F.col(conv_ts) - F.expr(f"INTERVAL {int(window_seconds)} seconds")).alias(
            "_ws"
        ),
        F.col(conv_ts).alias("_we"),
    )
    # range_join keeps unmatched points with NULL interval columns —
    # only touches that actually fell inside some window earn credit
    paired = range_join(
        t, c, "_tts", "_ws", "_we", by="_u",
        bucket_seconds=max(int(window_seconds), 1),
    ).where(F.col("_cid").isNotNull())
    order = [F.col("_tts")] + ([F.col("_tb")] if tiebreak else [])
    w = Window.partitionBy("_cid").orderBy(*order)
    ranked = (
        paired.withColumn("_rn", F.row_number().over(w))
        .withColumn("_k", F.count(F.lit(1)).over(Window.partitionBy("_cid")))
    )
    if model == "linear":
        credit = F.lit(1.0) / F.col("_k")
    elif model == "first_touch":
        credit = F.when(F.col("_rn") == 1, F.lit(1.0)).otherwise(F.lit(0.0))
    elif model == "last_touch":
        credit = F.when(F.col("_rn") == F.col("_k"), F.lit(1.0)).otherwise(
            F.lit(0.0)
        )
    else:  # position (U-shaped 40/20/40)
        credit = (
            F.when(F.col("_k") == 1, F.lit(1.0))
            .when(F.col("_k") == 2, F.lit(0.5))
            .when(F.col("_rn") == 1, F.lit(0.4))
            .when(F.col("_rn") == F.col("_k"), F.lit(0.4))
            .otherwise(F.lit(0.2) / (F.col("_k") - 2))
        )
    return (
        ranked.withColumn("_cr", credit)
        .groupBy("channel")
        .agg(
            F.count_distinct(F.col("_cid")).alias("conversions_touched"),
            F.round(F.sum("_cr"), 6).alias("credit"),
        )
        .orderBy("channel")
    )


@register("attribution")
def attribution_transformer(
    ctx: PipelineContext, df: DataFrame, cfg: dict
) -> DataFrame:
    """Config form: {"attribution": {"conversions": "conv_view",
    "userField": "user_id", "on": "ts", "channelField": "channel",
    "convId": "conv_id", "convTs": "ts", "windowSeconds": 1800,
    "model": "linear", "tiebreak": "event_id"}}"""
    conv = _resolve(ctx, cfg["conversions"])
    return attribution(
        df,
        conv,
        cfg["userField"],
        cfg["on"],
        cfg["channelField"],
        cfg["convId"],
        cfg["convTs"],
        int(cfg.get("windowSeconds", 1800)),
        model=cfg.get("model", "linear"),
        tiebreak=cfg.get("tiebreak"),
    )


def window_funnel(
    df: DataFrame,
    steps: list[str],
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-bounded ordered funnel (the ClickHouse ``windowFunnel``
    shape, deterministic variant): count users completing each step IN
    ORDER with every step inside ``window_seconds`` of the user's FIRST
    step-1 completion. One summary row ``(n1_<s>, n2_<s>, ...)``.

    Anchoring at the first step-1 event (rather than scanning every
    anchor for the best window) keeps the operator a chain of per-step
    user-keyed aggregations — the :func:`funnel_counts` shape plus one
    deadline column carried down the funnel — instead of a per-user
    sequential scan; the trade-off (a user who fails from the first
    anchor but would succeed from a later one is not counted) is
    documented and replayed exactly by the SQL oracle.

    Scale shape: per step one filtered slice + one user-keyed join +
    one min aggregate; frames shrink monotonically; final row is a
    cross join of single-row counts.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    if window_seconds <= 0:
        raise ValueError(f"window_seconds must be > 0, got {window_seconds}")
    es = F.floor(F.unix_timestamp(F.col(ts_col).cast("timestamp")))
    prev = None
    stage_counts = []
    for i, step in enumerate(steps):
        ev = df.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("_u"), es.alias("_es")
        )
        if prev is None:
            cur = ev.groupBy("_u").agg(F.min("_es").alias("_ft"))
            cur = cur.withColumn(
                "_deadline", F.col("_ft") + F.lit(int(window_seconds))
            )
        else:
            cur = (
                ev.join(prev, "_u")
                .filter(
                    (F.col("_es") > F.col("_ft"))
                    & (F.col("_es") <= F.col("_deadline"))
                )
                .groupBy("_u", "_deadline")
                .agg(F.min("_es").alias("_ft"))
            )
        stage_counts.append(
            cur.agg(F.count(F.lit(1)).alias(f"n{i + 1}_{step}"))
        )
        prev = cur.select("_u", "_ft", "_deadline")
    out = stage_counts[0]
    for c in stage_counts[1:]:
        out = out.crossJoin(c)
    return out


@register("windowFunnel")
def window_funnel_transformer(
    ctx: PipelineContext, df: DataFrame, cfg: dict
) -> DataFrame:
    """Config form: {"windowFunnel": {"steps": ["view", "click",
    "purchase"], "windowSeconds": 3600, "userField": "user_id",
    "on": "ts", "typeField": "event_type"}}"""
    return window_funnel(
        df,
        list(cfg["steps"]),
        int(cfg.get("windowSeconds", 3600)),
        user_col=cfg.get("userField", "user_id"),
        ts_col=cfg.get("on", "ts"),
        type_col=cfg.get("typeField", "event_type"),
    )


def collapse_runs(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    state_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Run-length collapse of per-key event streams: consecutive events
    with the SAME state fold into one row ``(keys..., state, start_es,
    end_es, n_events)`` — the de-chatter step before transition/funnel
    analysis (a sensor reporting "OK" 10,000 times in a row is one run,
    not 10,000 transitions) and the state-duration building block
    ("how long was each machine in ERROR?").

    Gaps-and-islands via the run-id trick: a run starts where the state
    differs from its lag; the running count of starts (a keyed window
    cumsum — integer, exact) is the run id; one groupBy collapses each
    run. Both windows and the aggregate share ONE key exchange. NULL
    states form runs like any other value (lag comparison is
    null-safe).
    """
    keys = _as_list(keys)
    if not keys:
        raise ValueError("collapse_runs needs at least one key column")
    es = F.floor(F.unix_timestamp(F.col(ts_col).cast("timestamp")))
    order = [F.col("_es")] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    run = F.sum(
        F.when(
            F.col(state_col).eqNullSafe(F.lag(state_col).over(w)), 0
        ).otherwise(1)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    base = df.where(F.col(ts_col).isNotNull()).withColumn("_es", es)
    return (
        base.withColumn("_run", run)
        .groupBy(*keys, F.col("_run"), F.col(state_col))
        .agg(
            F.min("_es").alias("start_es"),
            F.max("_es").alias("end_es"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("_run")
        .orderBy(*keys, "start_es")
    )


@register("collapseRuns")
def collapse_runs_transformer(
    ctx: PipelineContext, df: DataFrame, cfg: dict
) -> DataFrame:
    """Config form: {"collapseRuns": {"by": ["user_id"], "on": "ts",
    "stateField": "event_type", "tiebreak": "event_id"}}"""
    return collapse_runs(
        df,
        cfg.get("by") or [],
        cfg["on"],
        cfg["stateField"],
        tiebreak=cfg.get("tiebreak"),
    )


def peak_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    top_k: int = 20,
) -> DataFrame:
    """Sweep-line concurrency over half-open intervals ``[start, end)``:
    how many intervals overlap at each boundary instant, top ``top_k``
    peaks as ``(t, concurrency)`` (ordered concurrency desc, t asc — a
    deterministic tie-break). The capacity-planning primitive: peak
    simultaneous sessions/jobs/connections.

    Scale shape: intervals collapse to a per-distinct-boundary NET delta
    (+1 starts, -1 ends — ties collapse in ONE grouped aggregation, so
    no within-timestamp ordering is ever needed), then the running sum
    is :func:`~orientdb_etl_spark.operators.relational.
    exclusive_prefix` over the boundary frame — range-partitioned, never
    a global ORDER BY window over raw rows. Only the final top-k
    (TakeOrderedAndProject) sees an ordering, and only over the
    already-collapsed boundary frame. Integer deltas make every
    concurrency exact.
    """
    from orientdb_etl_spark.operators.relational import exclusive_prefix

    s, e = F.col(start_col).cast("bigint"), F.col(end_col).cast("bigint")
    both = df.where(s.isNotNull() & e.isNotNull())
    starts = both.select(s.alias("_t"), F.lit(1).alias("_d"))
    ends = both.select(e.alias("_t"), F.lit(-1).alias("_d"))
    deltas = (
        starts.unionAll(ends).groupBy("_t").agg(F.sum("_d").alias("_net"))
    )
    pref = exclusive_prefix(deltas, ["_t"], "_net", "sum", "_before", "bigint")
    conc = pref.select(
        F.col("_t").alias("t"),
        (F.coalesce(F.col("_before"), F.lit(0)) + F.col("_net")).alias(
            "concurrency"
        ),
    )
    return conc.orderBy(F.desc("concurrency"), F.asc("t")).limit(top_k)


def twap(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Time-weighted average value per key over an irregular event
    series: each observation holds until the NEXT event (step
    interpolation), so ``twap = Σ value_i · Δt_i / Σ Δt_i`` — the
    correct mean for sensors/prices sampled at uneven intervals, where
    the arithmetic mean over-weights bursts. One row per key:
    ``(key, n_obs, span_seconds, twap)``; keys with a single event (no
    holding interval) are dropped — their TWAP is undefined.

    Scale shape: ONE window partitioned BY KEY (ordered ts, then
    ``id_col`` as the deterministic tie-break — duplicate timestamps
    otherwise make Δt assignment engine-dependent), one grouped
    aggregate. Values quantize to integer cents so Σ cents·Δt is an
    exact BIGINT and the final division is one deterministic double op
    (the CUPED rule). Never a global window — partitioned windows scale
    with the key cardinality.
    """
    from pyspark.sql import Window

    sec = F.floor(
        F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    ).cast("bigint")
    d = df.where(
        F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
        & F.col(key_col).isNotNull()
    ).select(
        F.col(key_col).alias("_k"),
        sec.alias("_s"),
        F.floor(F.col(value_col) * 100).cast("bigint").alias("_c"),
        F.col(id_col).alias("_id"),
    )
    w = Window.partitionBy("_k").orderBy("_s", "_id")
    stepped = d.withColumn("_dt", F.lead("_s").over(w) - F.col("_s"))
    out = (
        stepped.where(F.col("_dt").isNotNull())
        .groupBy("_k")
        .agg(
            F.count(F.lit(1)).alias("_nh"),
            F.sum("_dt").alias("span_seconds"),
            F.sum(F.col("_c") * F.col("_dt")).alias("_wsum"),
        )
        .where(F.col("span_seconds") > 0)
    )
    return out.select(
        F.col("_k").alias(key_col),
        (F.col("_nh") + 1).alias("n_obs"),
        "span_seconds",
        F.round(
            F.col("_wsum") / F.col("span_seconds") / 100.0, round_to
        ).alias("twap"),
    ).orderBy(key_col)


def ohlc_bars(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    bucket_seconds: int = 3600,
    round_to: int = 6,
) -> DataFrame:
    """OHLC resampling: per (key, time bucket) the open / high / low /
    close of an irregular value series plus the tick count — the
    candlestick aggregation every market-data and sensor warehouse
    ships. One row per occupied bucket: ``(key, bucket_start, open,
    high, low, close, n_ticks)``; empty buckets are absent (gap-fill is
    :func:`resample_gapfill`'s job).

    Scale shape: ONE hash aggregate on (key, bucket) — open/close are
    ``min_by``/``max_by`` over the deterministic total order
    ``epoch·10⁵ + id mod 10⁵`` (the golden_record ordering; duplicate
    timestamps would otherwise make open/close engine-dependent),
    high/low/count are plain map-side-combinable aggregates. No window,
    no join, no driver state.
    """
    sec = F.floor(
        F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    ).cast("bigint")
    d = df.where(
        F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
        & F.col(key_col).isNotNull()
    ).select(
        F.col(key_col).alias("_k"),
        F.floor(sec / F.lit(int(bucket_seconds))).cast("bigint").alias("_b"),
        (sec * F.lit(100000) + F.col(id_col) % F.lit(100000)).alias("_ord"),
        F.col(value_col).cast("double").alias("_v"),
    )
    return (
        d.groupBy("_k", "_b")
        .agg(
            F.min_by("_v", "_ord").alias("_open"),
            F.max("_v").alias("_high"),
            F.min("_v").alias("_low"),
            F.max_by("_v", "_ord").alias("_close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            F.col("_k").alias(key_col),
            (F.col("_b") * F.lit(int(bucket_seconds))).alias("bucket_start"),
            F.round("_open", round_to).alias("open"),
            F.round("_high", round_to).alias("high"),
            F.round("_low", round_to).alias("low"),
            F.round("_close", round_to).alias("close"),
            "n_ticks",
        )
    )


def croston(
    df: DataFrame,
    keys: str | list[str],
    t_col: str,
    demand_col: str,
    alpha: float = 0.3,
    lookback: int = 8,
    round_to: int = 6,
) -> DataFrame:
    """Croston's method for intermittent demand (Croston, Op. Res. Q.
    1972): forecast series that are mostly zeros (spare parts, long-tail
    SKUs, rare events) by smoothing two things separately over the
    NONZERO observations — the demand size and the inter-demand interval
    — and forecasting ``size / interval`` demand per period. Plain
    exponential smoothing (:func:`ewma`/:func:`holt`) biases toward zero
    right after each demand spike; Croston's decomposition is the
    standard fix.

    Input is a bucketed series ``(keys, t, demand)`` with ``t`` an
    integer period index (zero periods may be present or omitted — only
    nonzero rows carry signal; intervals come from the ``t`` gaps).
    Returns one row per key: ``(keys, n_demand_periods, size_level,
    interval_level, forecast)``.

    Both levels use the repo's bounded-lookback EWMA form (``lookback``
    lag() expressions over ONE keyed exchange — no sequential state, the
    :func:`ewma` scale argument), with Python-float-literal weights so
    engines cannot disagree. The first nonzero row has no interval and
    drops out of the interval smoothing's numerator AND normalizer.
    """
    if not 0 < alpha <= 1:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if lookback < 1:
        raise ValueError(f"lookback must be >= 1, got {lookback}")
    keys = _as_list(keys)
    nz = df.where(
        F.col(demand_col).isNotNull()
        & (F.col(demand_col) > 0)
        & F.col(t_col).isNotNull()
    )
    w = Window.partitionBy(*keys).orderBy(F.col(t_col).cast("bigint"))
    gap = (
        F.col(t_col).cast("bigint") - F.lag(F.col(t_col).cast("bigint")).over(w)
    ).cast("double")
    nz = nz.withColumn("_gap", gap)

    def _smooth(col: F.Column) -> F.Column:
        num, den = F.lit(0.0), F.lit(0.0)
        for i in range(lookback):
            weight = (1.0 - alpha) ** i
            x = col if i == 0 else F.lag(col, i).over(w)
            num = num + F.when(
                x.isNotNull(), x * F.lit(weight)
            ).otherwise(F.lit(0.0))
            den = den + F.when(x.isNotNull(), F.lit(weight)).otherwise(
                F.lit(0.0)
            )
        return F.when(den > 0, num / den)

    scored = nz.select(
        *keys,
        F.col(t_col).cast("bigint").alias("_t"),
        _smooth(F.col(demand_col).cast("double")).alias("_z"),
        _smooth(F.col("_gap")).alias("_p"),
        F.row_number()
        .over(
            Window.partitionBy(*keys).orderBy(
                F.col(t_col).cast("bigint").desc()
            )
        )
        .alias("_rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy(*keys))
        .alias("n_demand_periods"),
    )
    return scored.where(F.col("_rn") == 1).select(
        *keys,
        "n_demand_periods",
        F.round("_z", round_to).alias("size_level"),
        F.round("_p", round_to).alias("interval_level"),
        F.round(
            F.when(F.col("_p") > 0, F.col("_z") / F.col("_p")), round_to
        ).alias("forecast"),
    )


@register("croston")
def croston_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """Config form: {"croston": {"by": ["sku"], "on": "t",
    "demandField": "qty", "alpha": 0.3, "lookback": 8}} — intermittent-
    demand forecast per key."""
    return croston(
        df,
        keys=cfg.get("by") or [],
        t_col=cfg["on"],
        demand_col=cfg["demandField"],
        alpha=float(cfg.get("alpha", 0.3)),
        lookback=int(cfg.get("lookback", 8)),
    )


def holt_winters_additive(
    df: DataFrame,
    keys: str | list[str],
    t_col: str,
    value_col: str,
    period: int = 24,
    alpha: float = 0.3,
    lookback: int = 8,
    horizon: int = 1,
    round_to: int = 6,
) -> DataFrame:
    """Additive Holt–Winters with a FIXED seasonal profile (Winters
    1960, the fixed-index variant): per key, estimate the seasonal index
    s(ph) = mean(x | phase) − mean(x) from the whole series (one
    aggregation — the :func:`~orientdb_etl_spark.functions.stats`
    seasonal-profile shape), DESEASONALIZE, run Brown's double smoothing
    (:func:`holt_linear`'s identities) on the adjusted series, and
    re-seasonalize the h-step forecast with the index of the forecast
    phase: ``forecast = level + h·trend + s((t_last + h) mod period)``.

    The fixed profile (not recursively-updated indices) is the
    deterministic, engine-replayable choice: recursive triple smoothing
    needs sequential per-key state, while this decomposition is two hash
    aggregations plus the same bounded-lookback lag-sum windows as
    :func:`holt_linear` — and it degrades gracefully to plain Brown
    smoothing when the series has no seasonality (all indices ≈ 0).

    Input is a bucketed series ``(keys, t, x)`` with integer ``t``;
    returns one row per key: ``(keys, n_periods, level, trend,
    seasonal_next, forecast)`` at the series end.
    """
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    keys = _as_list(keys)
    base = df.where(
        F.col(t_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        *keys,
        F.col(t_col).cast("bigint").alias("_t"),
        F.col(value_col).cast("double").alias("_x"),
    )
    # pmod: a negative bucket index (relative/centered time) must land
    # in the same phase as its positive congruent, not a phantom one
    ph = F.pmod(F.col("_t"), F.lit(period)).alias("_ph")
    prof = (
        base.groupBy(*keys, ph)
        .agg(F.sum("_x").alias("_ps"), F.count(F.lit(1)).alias("_pn"))
    )
    glob = base.groupBy(*keys).agg(
        F.sum("_x").alias("_gs"),
        F.count(F.lit(1)).alias("n_periods"),
    )
    from orientdb_etl_spark.operators.relational import join_back_null_safe

    # NULL-SAFE join-backs: a NULL series key is its own group under
    # groupBy; plain on=keys would silently drop its rows here
    prof = join_back_null_safe(prof, glob, keys).select(
        *keys,
        "_ph",
        "n_periods",
        (
            F.col("_ps") / F.col("_pn")
            - F.col("_gs") / F.col("n_periods").cast("double")
        ).alias("_sidx"),
    )
    deseason = join_back_null_safe(
        base.withColumn("_ph", F.pmod(F.col("_t"), F.lit(period))),
        prof.select(*keys, "_ph", "_sidx"),
        [*keys, "_ph"],
    ).withColumn("_xa", F.col("_x") - F.col("_sidx"))
    w = Window.partitionBy(*keys).orderBy("_t")

    def _smooth(col: F.Column) -> F.Column:
        num, den = F.lit(0.0), F.lit(0.0)
        for i in range(lookback):
            weight = (1.0 - alpha) ** i
            x = col if i == 0 else F.lag(col, i).over(w)
            num = num + F.when(
                x.isNotNull(), x * F.lit(weight)
            ).otherwise(F.lit(0.0))
            den = den + F.when(x.isNotNull(), F.lit(weight)).otherwise(
                F.lit(0.0)
            )
        return F.when(den > 0, num / den)

    s1 = deseason.withColumn("_s1", _smooth(F.col("_xa")))
    s2 = s1.withColumn("_s2", _smooth(F.col("_s1")))
    k = alpha / (1.0 - alpha)
    level = 2.0 * F.col("_s1") - F.col("_s2")
    trend = F.lit(k) * (F.col("_s1") - F.col("_s2"))
    last = s2.withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy(*keys).orderBy(F.col("_t").desc())
        ),
    ).where(F.col("_rn") == 1)
    # unseen forecast phase -> NULL seasonal index and NULL forecast
    # (degrade visibly, never silently drop the key)
    last = last.withColumn(
        "_nph", F.pmod(F.col("_t") + horizon, F.lit(period))
    )
    out = join_back_null_safe(
        last,
        prof.select(
            *keys,
            F.col("_ph").alias("_nph"),
            F.col("_sidx").alias("_snext"),
        ),
        [*keys, "_nph"],
        "left",
    )
    out = join_back_null_safe(out, glob.select(*keys, "n_periods"), keys)
    return out.select(
        *keys,
        "n_periods",
        F.round(level, round_to).alias("level"),
        F.round(trend, round_to).alias("trend"),
        F.round(F.col("_snext"), round_to).alias("seasonal_next"),
        F.round(
            level + F.lit(float(horizon)) * trend + F.col("_snext"), round_to
        ).alias("forecast"),
    )


@register("holtWinters")
def holt_winters_transformer(
    ctx: PipelineContext, df: DataFrame, cfg: dict
) -> DataFrame:
    """Config form: {"holtWinters": {"by": ["key"], "on": "t",
    "valueField": "x", "period": 24, "alpha": 0.3, "lookback": 8,
    "horizon": 1}} — additive Holt-Winters with a fixed seasonal
    profile."""
    return holt_winters_additive(
        df,
        keys=cfg.get("by") or [],
        t_col=cfg["on"],
        value_col=cfg["valueField"],
        period=int(cfg.get("period", 24)),
        alpha=float(cfg.get("alpha", 0.3)),
        lookback=int(cfg.get("lookback", 8)),
        horizon=int(cfg.get("horizon", 1)),
    )
