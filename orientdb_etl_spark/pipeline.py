"""Pipeline: JSON config → one declarative DataFrame lineage.

The reference's lifecycle (``OETLProcessor.java:105-179, 283-288, 486-514``):
parse config → instantiate components → begin blocks → pull rows through the
transformer chain → loader → end blocks. Ours compiles the same config shape
to a single Catalyst plan:

    {
      "config":       {<context variables>},           # OETLProcessor.java:245-250
      "begin":        [ {let|code|console}, ... ],
      "source":       {file|http|input},
      "extractor":    {row|json|jdbc|csv|parquet|table|query},
      "transformers": [ {name: cfg}, ... ],
      "loader":       {output|memory|parquet|csv|json|jdbc|orientdb},
      "end":          [ blocks ]
    }

Missing source → input, missing loader → memory-style result (the
reference defaults to input/output — ``OETLProcessor.java:134-135,149-150``).
The row loop disappears into the physical plan; parallelism is partition
parallelism (the reference's ``{"config":{"parallel":true}}`` queue —
``OETLProcessor.java:290-378`` — is accepted and advisory here).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from orientdb_etl_spark.blocks import run_block
from orientdb_etl_spark.context import PipelineContext, RunStats
from orientdb_etl_spark.exprs import render_value
from orientdb_etl_spark.loaders import edges_df, run_loader, vertices_df
from orientdb_etl_spark.operators import apply_transformer
from orientdb_etl_spark.sources import resolve_source


@dataclass
class PipelineResult:
    df: DataFrame
    vertices: DataFrame | None
    edges: DataFrame | None
    stats: RunStats
    outputs: dict[str, DataFrame]


class Pipeline:
    """Compile and run one ETL/analytics pipeline config."""

    def __init__(
        self,
        config: dict[str, Any] | str,
        spark: SparkSession | None = None,
        tables: dict[str, DataFrame] | None = None,
        variables: dict[str, Any] | None = None,
        listener: Any = None,
    ) -> None:
        if isinstance(config, str):
            with open(config) as f:
                config = json.load(f)
        self.config = config
        if spark is None:
            from orientdb_etl_spark.session import get_spark

            spark = get_spark()
        self.ctx = PipelineContext(spark=spark)
        self.ctx.listener = listener
        if tables:
            # shared, not copied: sub-pipelines and CREATE actions see updates
            self.ctx.tables = tables
        if variables:
            self.ctx.variables.update(variables)
        # `config` section fields become context variables
        # (OETLProcessor.java:245-250)
        for k, v in (config.get("config") or {}).items():
            self.ctx.variables[k] = v

    def register_table(self, name: str, df: DataFrame) -> "Pipeline":
        self.ctx.register_table(name, df)
        return self

    def compile(self) -> DataFrame:
        """Build the lineage WITHOUT running the loader (lazy, no action)."""
        ctx = self.ctx
        for block in self.config.get("begin") or []:
            run_block(ctx, block)

        source = self.config.get("source")
        extractor = self.config.get("extractor")
        source = render_value(source, ctx.variables, ctx.spark) if source else None
        extractor = (
            render_value(extractor, ctx.variables, ctx.spark) if extractor else None
        )
        df = resolve_source(ctx, source, extractor)

        for t in self.config.get("transformers") or []:
            if not isinstance(t, dict) or len(t) != 1:
                raise ValueError(f"transformer entry must be single-key: {t!r}")
            name, cfg = next(iter(t.items()))
            cfg = render_value(cfg or {}, ctx.variables, ctx.spark)
            df = apply_transformer(ctx, df, name, cfg)
        return df

    def run(self) -> PipelineResult:
        lsn = self.ctx.listener
        if lsn is not None and getattr(lsn, "on_begin", None):
            lsn.on_begin(self.ctx)
        df = self.compile()
        loader = self.config.get("loader")
        if loader is not None:
            loader = render_value(loader, self.ctx.variables, self.ctx.spark)

        # rows-loaded metric via observe() — the Spark-native form of the
        # reference's progress dump (OETLProcessor.java:545-585): collected
        # by the sink action itself, no extra pass over the data. Only
        # attached when the loader runs an action (Observation.get blocks
        # otherwise — memory/view loaders are lazy by design).
        obs = None
        lname = next(iter(loader)) if loader else "memory"
        # `output` (show) is excluded: it short-circuits after N rows, so
        # the observed count would be partial, not the loaded total
        runs_action = lname in ("parquet", "csv", "json", "jdbc", "table") or (
            lname == "orientdb" and (loader or {}).get(lname, {}).get("path")
        )
        # manifest resume pre-flight: recordState needs a loader that
        # durably commits (an action loader) — recording against a lazy
        # loader (memory/view/output) would mark URLs done with nothing
        # written anywhere, silently skipping their data forever. And for
        # action loaders whose sink we cannot read back as parquet, pin
        # the fetched frame ONCE so the sink and the state recording see
        # the SAME materialization: recording from a re-executed fetch
        # could mark a URL done that dead-lettered into the sink but
        # transiently succeeded on the second fetch — its data lost.
        rec_names = [
            s
            for s in ("files", "http")
            if isinstance((self.config.get("source") or {}).get(s), dict)
            and (self.config["source"][s] or {}).get("recordState")
        ]
        if rec_names:
            if not runs_action:
                raise ValueError(
                    "recordState requires an action loader (parquet/csv/"
                    f"json/jdbc/table), got {lname!r} — a lazy loader "
                    "commits nothing durable, so recording state against "
                    "it would silently skip those URLs' data forever"
                )
            lcfg_pre = (loader or {}).get("parquet") or {}
            if not (lname == "parquet" and lcfg_pre.get("path")):
                df = df.localCheckpoint(eager=True)
        if runs_action:
            from pyspark.sql import Observation
            from pyspark.sql import functions as F

            obs = Observation()
            # observe bridge: the top-level "observe" config section
            # ({"observe": {"metric_name": "<sql aggregate>"}}) rides the
            # SAME Observation as rows_loaded — every declared metric is
            # computed by the sink action itself (zero extra passes over
            # the data) and delivered to the listener's on_metrics hook.
            # This is the Spark-native form of the reference's per-row
            # listener counters (ODefaultImporterListener.java:27-55):
            # at 100 TB a per-row callback is impossible, but an observed
            # aggregate is free.
            metric_cols = [F.count(F.lit(1)).alias("rows_loaded")]
            for mname, mexpr in (self.config.get("observe") or {}).items():
                metric_cols.append(F.expr(str(mexpr)).alias(str(mname)))
            df = df.observe(obs, *metric_cols)

        run_loader(self.ctx, df, loader)
        # HALT/ERROR lookup misses: counted by the sink action itself via
        # observe() (single pass); lazy loaders fall back to a bounded probe
        self.ctx.resolve_miss_checks(observed=runs_action)
        if obs is not None:
            metrics = dict(obs.get)
            n = metrics.get("rows_loaded")
            self.ctx.stats.rows_loaded = n
            self.ctx.stats.notes.append(f"rows_loaded: {n}")
            for mname, mval in metrics.items():
                if mname != "rows_loaded":
                    self.ctx.stats.notes.append(f"observe {mname}: {mval}")
            if lsn is not None and getattr(lsn, "on_metrics", None):
                lsn.on_metrics(self.ctx, metrics)
        # manifest resume: {"files"/"http": {..., "statePath": ...,
        # "recordState": true}} records the successful URLs AFTER the
        # sink commit — from the just-written parquet when the loader
        # materialized one (durable read-back, no re-fetch), else from
        # the localCheckpoint pinned above (the SAME materialization the
        # sink wrote — never a re-executed fetch). Recording only what
        # reached the sink is the at-least-once direction: a URL whose
        # rows a transformer filtered away is simply re-fetched next
        # run, never silently skipped.
        src_cfg = self.config.get("source") or {}
        for sname in rec_names:
            mcfg = render_value(
                src_cfg[sname], self.ctx.variables, self.ctx.spark
            )
            state_path = mcfg.get("statePath")
            if not state_path:
                raise ValueError("recordState requires statePath")
            from orientdb_etl_spark.sources.manifest import (
                record_manifest_state,
            )

            lcfg = (loader or {}).get("parquet") or {}
            if lname == "parquet" and lcfg.get("path"):
                frame = self.ctx.spark.read.parquet(lcfg["path"])
            else:
                frame = df
            if "url" not in frame.columns:
                raise ValueError(
                    "recordState needs the 'url' column to survive to the "
                    "sink — keep it through the transformer chain"
                )
            # binary-mode fetches carry dead-letter rows (status = -1) IN
            # the output, so 'status' must survive to the recording point
            # or failures would be marked done; lines mode emits no rows
            # for failures, so a missing status column is success-only
            ext = self.config.get("extractor")
            ext_name = next(iter(ext)) if isinstance(ext, dict) and ext else "row"
            n_rec = record_manifest_state(
                frame, str(state_path), require_status=(ext_name == "binary")
            )
            self.ctx.stats.notes.append(f"manifest state recorded: {n_rec}")
        if lsn is not None and getattr(lsn, "on_end", None):
            lsn.on_end(self.ctx, None)
        for block in self.config.get("end") or []:
            run_block(self.ctx, block)
        return PipelineResult(
            df=df,
            vertices=vertices_df(self.ctx),
            edges=edges_df(self.ctx),
            stats=self.ctx.stats,
            outputs=dict(self.ctx.outputs),
        )
