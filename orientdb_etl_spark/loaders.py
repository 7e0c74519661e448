"""Loaders (sinks): the terminal side of a pipeline.

Reference set (``etl/loader/``): orientdb / output / memory. Spark-first
mapping: the OrientDB graph/document store becomes table-shaped sinks —
JDBC (the declared spark_approach), parquet, csv, json, console, memory.
Vertices/edges accumulate as two DataFrames and write to two tables.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from orientdb_etl_spark.context import PipelineContext


def run_loader(
    ctx: PipelineContext, df: DataFrame, loader: dict[str, Any] | None
) -> None:
    if loader is None:
        loader = {"memory": {}}
    if len(loader) != 1:
        raise ValueError("loader must be a single-key dict")
    name, cfg = next(iter(loader.items()))
    cfg = cfg or {}

    if name == "output":
        # ≈ OOutputLoader.java:27-52 (stdout per record → bounded show)
        df.show(int(cfg.get("limit", 20)), truncate=bool(cfg.get("truncate", True)))
    elif name == "memory":
        # ≈ OMemoryLoader.java:31-69 (collect for sub-ETL / inspection).
        # Capped: an uncapped driver collect is the one forbidden pattern.
        view = cfg.get("view", "etl_result")
        df.createOrReplaceTempView(view)
        ctx.outputs[view] = df
    elif name == "parquet":
        writer = df.write.mode(cfg.get("mode", "overwrite"))
        if cfg.get("partitionBy"):
            writer = writer.partitionBy(*cfg["partitionBy"])
        writer.parquet(cfg["path"])
    elif name == "csv":
        df.write.mode(cfg.get("mode", "overwrite")).option(
            "header", str(bool(cfg.get("header", True))).lower()
        ).csv(cfg["path"])
    elif name == "json":
        df.write.mode(cfg.get("mode", "overwrite")).json(cfg["path"])
    elif name == "table":
        # managed-table sink with optional bucketing: two tables bucketed
        # on the same key join WITHOUT a shuffle (Exchange elided) — the
        # co-located-join strategy for repeated large-fact joins at scale
        writer = df.write.mode(cfg.get("mode", "overwrite")).format(
            cfg.get("format", "parquet")
        )
        if cfg.get("bucketBy"):
            b = cfg["bucketBy"]
            writer = writer.bucketBy(int(b["n"]), *b["columns"])
            writer = writer.sortBy(*cfg.get("sortBy", b["columns"]))
        writer.saveAsTable(cfg["name"])
    elif name == "jdbc":
        # dbAutoCreate/dbAutoDropIfExists ≈ save modes; batchCommit ≈ batchsize
        # (OOrientDBLoader.java:181-194, 265-301)
        writer = (
            df.write.format("jdbc")
            .mode(cfg.get("mode", "append"))
            .option("url", cfg["url"])
            .option("dbtable", cfg["dbtable"])
            .option("batchsize", str(cfg.get("batchCommit", cfg.get("batchsize", 1000))))
        )
        for k in ("driver", "user", "password", "createTableColumnTypes"):
            if k in cfg:
                writer = writer.option(k, cfg[k])
        writer.save()
    elif name == "orientdb":
        # Graph/document store sink. Without an OrientDB cluster we map the
        # declared classes/indexes to table-shaped outputs: documents →
        # parquet/JDBC-style table; graph mode → vertices + edges tables
        # (≈ OOrientDBLoader.java:145-198 save paths, 406-513 schema/index DDL
        # which becomes sink-side DDL in the JDBC case).
        path = cfg.get("path")
        if path:
            df.write.mode(cfg.get("mode", "overwrite")).parquet(f"{path}/documents")
            if ctx.vertices:
                vertices_df(ctx).write.mode("overwrite").parquet(f"{path}/vertices")
            if ctx.edges:
                edges_df(ctx).write.mode("overwrite").parquet(f"{path}/edges")
        else:
            view = cfg.get("view", "etl_result")
            df.createOrReplaceTempView(view)
            ctx.outputs[view] = df
    else:
        raise ValueError(f"unknown loader {name!r}")


def vertices_df(ctx: PipelineContext) -> DataFrame | None:
    """Union of all vertex classes (allowMissingColumns — classes have
    different property sets, like the schemaless reference)."""
    if not ctx.vertices:
        return None
    out = ctx.vertices[0]
    for v in ctx.vertices[1:]:
        out = out.unionByName(v, allowMissingColumns=True)
    return out


def edges_df(ctx: PipelineContext) -> DataFrame | None:
    if not ctx.edges:
        return None
    out = ctx.edges[0]
    for e in ctx.edges[1:]:
        out = out.unionByName(e, allowMissingColumns=True)
    return out
