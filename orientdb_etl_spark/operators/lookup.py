"""Lookup family: merge / link / vertex / edge.

The reference does per-row index-or-query lookups
(``OAbstractLookupTransformer.java:36-106``); at scale that is exactly a
join — broadcast for small dimensions (the "index" fast path), shuffled
hash / sort-merge for large ones. Catalyst+AQE pick the strategy; a
``broadcast: true`` config forces the hint.

``unresolvedLinkAction`` ∈ NOTHING / WARNING / ERROR / SKIP / HALT / CREATE
(``OAbstractLookupTransformer.java:44-46``) maps to join-mode selection +
miss accounting + a two-pass anti-join/union for CREATE.

Batch-snapshot caveat (SURVEY §4.2): the reference's lookups can see rows
loaded earlier in the same run (same DB session). A Spark batch sees a
snapshot — CREATE therefore resolves misses against the *whole batch* in one
anti-join pass rather than incrementally. For true self-referential loads,
pre-aggregate/dedupe the batch first (the `merge` transformer's
``dedupeIncoming`` option) or run chunked.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orientdb_etl_spark.context import PipelineContext
from orientdb_etl_spark.operators import register

_ACTIONS = {"NOTHING", "WARNING", "ERROR", "SKIP", "HALT", "CREATE"}


def _dim_for_join(ctx: PipelineContext, cfg: dict) -> tuple[DataFrame, str, str]:
    dim, key = ctx.resolve_lookup(cfg["lookup"])
    if cfg.get("broadcast"):
        dim = F.broadcast(dim)
    return dim, key, str(cfg.get("unresolvedLinkAction", "NOTHING")).upper()


def _attach_miss_check(
    ctx: PipelineContext,
    joined: DataFrame,
    miss_col,  # column name (null ⇒ miss) or a boolean miss Column
    what: str,
    action: str,
) -> DataFrame:
    """Single-pass miss accounting for HALT/ERROR lookups.

    Instead of re-running the lookup join to probe for misses (a second
    pass over the join at scale), attach an ``observe()`` counter that the
    sink action computes for free, and defer the check to action time —
    HALT is a validation gate on the write (SURVEY §4.3).
    ``Pipeline.run`` resolves the pending checks right after the loader's
    action; for lazy loaders it falls back to a bounded ``limit(1)`` probe
    (the pre-round-2 behavior). ``compile()``-only use never runs an
    action, so HALT fires on ``run()``, not on plan construction.
    """
    if action not in ("HALT", "ERROR"):
        return joined
    from pyspark.sql import Observation

    miss_cond = (
        miss_col if not isinstance(miss_col, str) else F.col(miss_col).isNull()
    )
    obs = Observation()
    out = joined.observe(
        obs, F.count(F.when(miss_cond, F.lit(1))).alias("misses")
    )
    ctx.add_miss_check(obs, what, action, joined.filter(miss_cond))
    return out


def _note_misses(ctx: PipelineContext, action: str, what: str) -> None:
    # Miss *counting* is attached lazily via the join itself; the note
    # records that the budget applies (full counts need an action).
    if action == "WARNING":
        ctx.stats.warn(f"{what}: unresolved lookups tolerated (left join)")
    elif action == "ERROR":
        ctx.stats.error(f"{what}: unresolved lookups counted as errors")
    lsn = ctx.listener
    if action != "NOTHING" and lsn is not None and getattr(lsn, "on_join_not_found", None):
        lsn.on_join_not_found(ctx, what)


# --------------------------------------------------------------------------
# merge — lookup + upsert-style record merge
# --------------------------------------------------------------------------


@register("merge")
def merge_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """≈ OMergeTransformer.java:28-78: look up the existing record by
    ``joinFieldName`` and merge the incoming document into it
    (``ODocument.merge(input, true, false)`` — incoming fields overwrite).

    DataFrame semantics: for columns present in both, incoming wins when
    non-null (``coalesce(incoming, existing)``); existing-only columns are
    carried over; incoming-only columns pass through. Output = one row per
    incoming row (the merged record continues down the pipeline).

    ``dedupeIncoming: <orderCol>`` keeps only the last incoming row per key
    before merging — the documented answer to the reference's within-batch
    self-visibility (same-run upserts; SURVEY §4.2 last row).
    """
    join_field = cfg["joinFieldName"]
    dim, key, action = _dim_for_join(ctx, cfg)

    if cfg.get("dedupeIncoming"):
        from pyspark.sql import Window

        order_col = cfg["dedupeIncoming"]
        w = Window.partitionBy(join_field).orderBy(F.col(order_col).desc())
        df = (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    in_cols = df.columns
    dim_cols = dim.columns
    dim_renamed = dim.select([F.col(c).alias(f"_ex_{c}") for c in dim_cols])
    how = "inner" if action == "SKIP" else "left"
    joined = df.join(
        dim_renamed, df[join_field] == dim_renamed[f"_ex_{key}"], how
    )
    joined = _attach_miss_check(ctx, joined, f"_ex_{key}", "merge", action)
    _note_misses(ctx, action, "merge")

    out_cols = []
    for c in in_cols:
        if c in dim_cols and c != join_field:
            out_cols.append(F.coalesce(F.col(c), F.col(f"_ex_{c}")).alias(c))
        else:
            out_cols.append(F.col(c))
    for c in dim_cols:
        if c not in in_cols:
            out_cols.append(F.col(f"_ex_{c}").alias(c))
    return joined.select(out_cols)


# --------------------------------------------------------------------------
# link — FK resolution
# --------------------------------------------------------------------------


@register("link")
def link_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """≈ OLinkTransformer.java:39-175: resolve ``joinFieldName`` (scalar or
    array — per-element, ``:94-101``) against the dimension and write the
    result into ``linkFieldName``.

    The reference stores a record pointer (RID); Spark has no pointer type,
    so the link value is a dimension column (``linkValueField``, default the
    lookup key itself — i.e. a validated FK). Coercions
    (``:107-128``): LINK → scalar (first match), LINKSET → dedup array,
    LINKLIST → array. ``removeJoinField`` drops the source column
    (``:167-169``); CREATE appends placeholder rows to the dimension
    (``:134-146``) via one anti-join pass.
    """
    join_field = cfg["joinFieldName"]
    link_field = cfg.get("linkFieldName", f"{join_field}_link")
    link_type = str(cfg.get("type", "LINK")).upper()
    dim, key, action = _dim_for_join(ctx, cfg)
    value_field = cfg.get("linkValueField", key)

    is_array = dict(df.dtypes).get(join_field, "").startswith("array")

    dim_small = dim.select(
        F.col(key).alias("_lk_key"), F.col(value_field).alias("_lk_val")
    ).dropDuplicates(["_lk_key"])

    if is_array:
        # explode → join → regroup (keeps the pipeline fully relational)
        row_id = "_lk_row"
        with_id = df.withColumn(row_id, F.monotonically_increasing_id())
        exploded = with_id.select(
            row_id, F.posexplode_outer(join_field).alias("_lk_pos", "_lk_elem")
        )
        if action == "CREATE":
            # per-element CREATE (OLinkTransformer.java:94-146): placeholder
            # dimension rows for unresolved elements, one anti-join pass
            cls = cfg["lookup"].rsplit(".", 1)[0]
            created = (
                exploded.filter(F.col("_lk_elem").isNotNull())
                .join(
                    dim_small,
                    exploded["_lk_elem"] == dim_small["_lk_key"],
                    "left_anti",
                )
                .select(F.col("_lk_elem").alias(key))
                .dropDuplicates([key])
            )
            base = ctx.tables[cls]
            base_types = dict(base.dtypes)
            placeholders = created.select(
                [
                    F.col(key).cast(base_types[key]).alias(key)
                    if c == key
                    else F.lit(None).cast(base_types[c]).alias(c)
                    for c in base.columns
                ]
            )
            ctx.register_table(cls, base.unionByName(placeholders))
            dim_small = (
                ctx.tables[cls]
                .select(
                    F.col(key).alias("_lk_key"),
                    F.col(value_field).alias("_lk_val"),
                )
                .dropDuplicates(["_lk_key"])
            )
        j = exploded.join(
            dim_small, exploded["_lk_elem"] == dim_small["_lk_key"], "left"
        )
        # per-element HALT/ERROR: a miss is a non-null element with no
        # dimension match (empty arrays explode to null elements — not
        # misses)
        j = _attach_miss_check(
            ctx,
            j,
            F.col("_lk_elem").isNotNull() & F.col("_lk_key").isNull(),
            "link",
            action,
        )
        if link_type == "LINKLIST":
            # deterministic: restore source-array element order after the
            # shuffle (collect_list order is otherwise nondeterministic)
            agg = F.expr(
                "transform(array_sort(collect_list(struct(_lk_pos, _lk_val))), x -> x._lk_val)"
            )
        else:  # LINKSET — set semantics, sorted for determinism
            agg = F.array_sort(F.collect_set("_lk_val"))
        links = j.groupBy(row_id).agg(agg.alias(link_field))
        out = with_id.join(links, row_id, "left").drop(row_id)
        if action == "SKIP":
            out = out.filter(F.size(link_field) > 0)
        _note_misses(ctx, action, "link")
    else:
        how = "inner" if action == "SKIP" else "left"
        joined = df.join(dim_small, df[join_field] == dim_small["_lk_key"], how)
        joined = _attach_miss_check(ctx, joined, "_lk_key", "link", action)
        if action == "CREATE":
            cls = cfg["lookup"].rsplit(".", 1)[0]
            created = (
                df.join(dim_small, df[join_field] == dim_small["_lk_key"], "left_anti")
                .select(F.col(join_field).alias(key))
                .dropDuplicates([key])
            )
            base = ctx.tables[cls]
            base_types = dict(base.dtypes)
            placeholders = created.select(
                [
                    F.col(key).cast(base_types[key]).alias(key)
                    if c == key
                    else F.lit(None).cast(base_types[c]).alias(c)
                    for c in base.columns
                ]
            )
            ctx.register_table(cls, base.unionByName(placeholders))
            # re-join so created keys resolve (link value == key for placeholders)
            joined = df.join(
                ctx.tables[cls]
                .select(F.col(key).alias("_lk_key"), F.col(value_field).alias("_lk_val"))
                .dropDuplicates(["_lk_key"]),
                df[join_field] == F.col("_lk_key"),
                "left",
            )
        _note_misses(ctx, action, "link")
        if link_type in ("LINKSET", "LINKLIST"):
            val = F.when(
                F.col("_lk_val").isNotNull(), F.array(F.col("_lk_val"))
            ).otherwise(F.array().cast(f"array<{dict(dim_small.dtypes)['_lk_val']}>"))
        else:
            val = F.col("_lk_val")
        out = joined.withColumn(link_field, val).drop("_lk_key", "_lk_val")

    if cfg.get("removeJoinField"):
        out = out.drop(join_field)
    return out


# --------------------------------------------------------------------------
# vertex / edge — graph construction
# --------------------------------------------------------------------------


@register("vertex")
def vertex_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """≈ OVertexTransformer.java:29-76: tag records as vertices of `class`
    (default V). Output convention: GraphFrames-style — the payload gains a
    `label` column and is appended to the run's vertices set; `idField`
    names the identity column (default: first column)."""
    label = cfg.get("class", "V")
    id_field = cfg.get("idField", df.columns[0])
    out = df.withColumn("label", F.lit(label))
    ctx.vertices.append(
        out.withColumn("id", F.col(id_field).cast("string"))
    )
    return out


@register("edge")
def edge_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """≈ OEdgeTransformer.java:32-145: equi-join the current (source) rows
    against the target vertex class and emit edges (src, dst, label) as a
    side output; the payload passes through unchanged (:130-141).

    direction `in` swaps src/dst (:130-141); unresolvedLinkAction=CREATE
    materializes placeholder target vertices carrying only the key
    (:102-114) via an anti-join, then emits edges for them too.
    """
    join_field = cfg["joinFieldName"]
    label = cfg.get("class", "E")
    direction = str(cfg.get("direction", "out")).lower()
    src_field = cfg.get("sourceIdField", df.columns[0])
    dim, key, action = _dim_for_join(ctx, cfg)
    target_id = cfg.get("targetIdField", key)

    dim_small = dim.select(
        F.col(key).alias("_tgt_key"), F.col(target_id).alias("_tgt_id")
    ).dropDuplicates(["_tgt_key"])

    joined = df.join(dim_small, df[join_field] == dim_small["_tgt_key"], "left")
    joined = _attach_miss_check(ctx, joined, "_tgt_key", "edge", action)
    misses = joined.filter(F.col("_tgt_key").isNull())
    _note_misses(ctx, action, "edge")

    if action == "CREATE":
        placeholder = (
            misses.select(F.col(join_field).alias(key))
            .dropDuplicates([key])
            .withColumn("label", F.lit(cfg["lookup"].rsplit(".", 1)[0]))
            .withColumn("id", F.col(key).cast("string"))
        )
        ctx.vertices.append(placeholder)
        matched = joined.withColumn(
            "_tgt_id", F.coalesce(F.col("_tgt_id"), F.col(join_field))
        )
    else:
        matched = joined.filter(F.col("_tgt_key").isNotNull())

    src = F.col(src_field).cast("string")
    dst = F.col("_tgt_id").cast("string")
    if direction == "in":
        src, dst = dst, src
    ctx.edges.append(
        matched.select(
            src.alias("src"), dst.alias("dst"), F.lit(label).alias("label")
        )
    )
    if action == "SKIP":
        return df.join(dim_small, df[join_field] == dim_small["_tgt_key"], "left_semi")
    return df
