"""Sub-ETL decorrelation — the `etl` transformer.

The reference runs a WHOLE child ETL process per parent row
(``OETLTransformer.java:36-199`` → ``OETLProcessor.executeSubETL``
``OETLProcessor.java:181-187``) and embeds the collected results. Its own
design makes this the most catastrophic cost center (full engine re-entry
per row — SURVEY §3.3); the scalable semantics are a correlated-subquery →
join decorrelation:

    run the child pipeline ONCE as its own DataFrame, then join on the
    correlation key and regroup into the embedded shape:

    EMBEDDEDLIST -> collect_list(struct(...))     (sorted for determinism)
    EMBEDDEDSET  -> array_distinct(collect_list)  (dedup via `contains`,
                                                   OETLTransformer.java:163-178)
    EMBEDDEDMAP  -> map_from_entries(key/value)   (:189-198)
    EMBEDDED     -> first struct (single result,  :180-187)
    LINKLIST/SET -> array of child keys
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orientdb_etl_spark.context import PipelineContext
from orientdb_etl_spark.operators import register


@register("etl")
def subetl_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """Embed a child pipeline's (decorrelated) results per parent row.

    Config:
        pipeline:      child config dict (or ``fileName`` of a JSON config)
        joinFieldName: parent correlation column
        childJoinField: child column to correlate on (default same name)
        fieldName:     embedded output column
        type:          EMBEDDEDLIST|EMBEDDEDSET|EMBEDDEDMAP|EMBEDDED|LINKLIST|LINKSET
        keyField/valueField: for EMBEDDEDMAP
        orderBy:       child column for deterministic element order
    """
    from orientdb_etl_spark.pipeline import Pipeline

    parent_key = cfg["joinFieldName"]
    child_key = cfg.get("childJoinField", parent_key)
    out_field = cfg.get("fieldName", "embedded")
    etype = str(cfg.get("type", "EMBEDDEDLIST")).upper()

    if "pipeline" in cfg:
        child_cfg = cfg["pipeline"]
    else:
        import json

        with open(cfg["fileName"]) as f:
            child_cfg = json.load(f)
    # child runs once, sharing tables/variables — NOT once per row
    child = Pipeline(
        child_cfg, spark=ctx.spark, tables=ctx.tables, variables=dict(ctx.variables)
    )
    child_df = child.compile()

    order_col = cfg.get("orderBy")
    payload_cols = [c for c in child_df.columns if c != child_key]

    if etype == "EMBEDDEDMAP":
        kf, vf = cfg["keyField"], cfg["valueField"]
        entries = child_df.groupBy(child_key).agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct(F.col(kf), F.col(vf))))
            ).alias(out_field)
        )
    elif etype in ("LINKLIST", "LINKSET"):
        vf = cfg.get("valueField", child_key)
        agg = F.collect_list(vf) if etype == "LINKLIST" else F.collect_set(vf)
        entries = child_df.groupBy(child_key).agg(
            F.array_sort(agg).alias(out_field)
        )
    elif etype == "EMBEDDED":
        entries = child_df.groupBy(child_key).agg(
            F.first(F.struct(*payload_cols)).alias(out_field)
        )
    else:  # EMBEDDEDLIST / EMBEDDEDSET
        struct_cols = [order_col, *[c for c in payload_cols if c != order_col]] if order_col else payload_cols
        lst = F.collect_list(F.struct(*struct_cols))
        # array_sort on structs orders by fields left-to-right → put the
        # orderBy column first for deterministic embedding
        lst = F.array_sort(lst)
        if etype == "EMBEDDEDSET":
            lst = F.array_distinct(lst)
        entries = child_df.groupBy(child_key).agg(lst.alias(out_field))

    joined = df.join(
        entries.withColumnRenamed(child_key, "_sub_key"),
        df[parent_key] == F.col("_sub_key"),
        "left",
    ).drop("_sub_key")
    return joined
