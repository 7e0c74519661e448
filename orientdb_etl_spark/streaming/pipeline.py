"""Streaming pipeline: the batch config shape over ``readStream``.

Same declarative contract as :class:`orientdb_etl_spark.Pipeline` but the
extractor is a streaming source and the loader is a streaming sink. The
stateless transformer registry is reused verbatim — Catalyst treats the
streaming plan identically until the sink.

``run_available_now`` gives deterministic batch-parity execution: process
everything currently available (as one or more micro-batches), then stop.
That is both the replay/backfill story at scale and what makes streaming
results oracle-checkable against DuckDB in tests.
"""

from __future__ import annotations

import tempfile
from pathlib import Path
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from orientdb_etl_spark.context import PipelineContext
from orientdb_etl_spark.exprs import render_value
from orientdb_etl_spark.operators import apply_transformer

_STREAM_SAFE = {
    "field", "select", "filter", "rename", "flow", "json", "csv", "log",
    # quality (gopher flags / C4 line cleaning / n-gram repetition) is
    # pure per-row expression work — stream-safe by construction; the
    # `curate` composition is NOT (its dedup stages need global state)
    "quality",
}


def stream_parquet(
    spark: SparkSession, path: str, schema=None, ts_nanos_col: str | None = None
) -> DataFrame:
    """File-based streaming source over a parquet file/directory.

    The file source wants a directory it can list; a single-file path is
    staged via symlink into a temp dir (zero-copy). ``ts_nanos_col``
    applies the same dtype-conditional event-time normalization as the
    batch reader (bigint nanos → micros, TIMESTAMP_NTZ → TIMESTAMP,
    TIMESTAMP passthrough).
    """
    from orientdb_etl_spark.session import normalize_ts

    p = Path(path)
    if p.is_file():
        stage = Path(tempfile.mkdtemp(prefix="oetl_stream_"))
        (stage / p.name).symlink_to(p)
        path = str(stage)
    if schema is None:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        schema = spark.read.parquet(path).schema
    df = spark.readStream.schema(schema).parquet(path)
    if ts_nanos_col:
        df = normalize_ts(df, ts_nanos_col)
    return df


class StreamingPipeline:
    """Compile a streaming config; run it with an explicit trigger.

    Config shape::

        {
          "source":       {"parquet": {"path": ...}} | {"rate": {...}}
                          | {"table": {"name": ...}},   # pre-registered stream
          "transformers": [ {name: cfg}, ... ],          # stream-safe subset
          "watermark":    {"column": "ts", "delay": "10 minutes"},
          "sink":         {"memory": {"queryName": ...,
                                      "outputMode": "append"}}
                          | {"console": {...}} | {"foreachBatch": fn}
        }
    """

    def __init__(
        self,
        config: dict[str, Any],
        spark: SparkSession | None = None,
    ) -> None:
        self.config = config
        if spark is None:
            from orientdb_etl_spark.session import get_spark

            spark = get_spark()
        self.ctx = PipelineContext(spark=spark)

    def register_stream(self, name: str, df: DataFrame) -> "StreamingPipeline":
        self.ctx.tables[name] = df
        return self

    def compile(self) -> DataFrame:
        ctx = self.ctx
        src = render_value(self.config.get("source") or {}, ctx.variables, ctx.spark)
        if len(src) != 1:
            raise ValueError(f"source must be single-key: {src!r}")
        kind, cfg = next(iter(src.items()))
        if kind == "parquet":
            df = stream_parquet(
                ctx.spark, cfg["path"], ts_nanos_col=cfg.get("tsNanosColumn")
            )
        elif kind == "rate":
            reader = ctx.spark.readStream.format("rate")
            for k, v in cfg.items():
                reader = reader.option(k, v)
            df = reader.load()
        elif kind == "table":
            df = self.ctx.tables[cfg["name"]]
        else:
            raise ValueError(f"unknown streaming source {kind!r}")

        wm = self.config.get("watermark")
        if wm:
            df = df.withWatermark(wm["column"], wm["delay"])

        for t in self.config.get("transformers") or []:
            name, cfg = next(iter(t.items()))
            if name not in _STREAM_SAFE and name not in (
                "window_agg", "session_agg", "dedup", "enrich", "incremental"
            ):
                raise ValueError(f"transformer {name!r} is not stream-safe")
            cfg = render_value(cfg or {}, ctx.variables, ctx.spark)
            if name == "window_agg":
                from orientdb_etl_spark.streaming.ops import (
                    sliding_window_agg,
                    tumbling_window_agg,
                )

                fn = sliding_window_agg if cfg.get("slide") else tumbling_window_agg
                args = dict(
                    ts_col=cfg.get("column", "ts"),
                    duration=cfg["duration"],
                    keys=cfg.get("groupBy", []),
                    aggs=cfg.get("aggregations", []),
                )
                if cfg.get("slide"):
                    args["slide"] = cfg["slide"]
                df = fn(df, **args)
            elif name == "session_agg":
                from orientdb_etl_spark.streaming.ops import session_window_agg

                df = session_window_agg(
                    df,
                    ts_col=cfg.get("column", "ts"),
                    gap=cfg["gap"],
                    keys=cfg.get("groupBy", []),
                    aggs=cfg.get("aggregations", []),
                )
            elif name == "dedup":
                from orientdb_etl_spark.streaming.ops import streaming_dedup

                df = streaming_dedup(
                    df, cfg["keys"], cfg.get("column"), cfg.get("watermark")
                )
            elif name == "incremental":
                # stream-safe EXACT stage of cross-snapshot dedup: the
                # static curated corpus collapses to broadcast
                # fingerprints, the stream left-joins per micro-batch
                # (near-dup stays a batch compaction pass — see
                # streaming/ops.py::stream_seen_filter)
                from orientdb_etl_spark.streaming.ops import stream_seen_filter

                df = stream_seen_filter(
                    df,
                    self.ctx.tables[cfg["seenTable"]],
                    text_col=cfg.get("textField", "text"),
                    seen_text_col=cfg.get("seenTextField"),
                    mode=cfg.get("mode", "filter"),
                )
            elif name == "enrich":
                df = self._enrich(df, cfg)
            else:
                df = apply_transformer(ctx, df, name, cfg)
        return df

    def _enrich(self, df: DataFrame, cfg: dict[str, Any]) -> DataFrame:
        """Stream-static enrichment: join the stream against a registered
        static dimension (Spark's native stream-static join — the static
        side is re-read per micro-batch, so a refreshed dimension table is
        picked up without restarting the query). Dimensions broadcast by
        default, the same fast path the batch lookup family uses; the
        static-side join keys are dropped after the join.

        Config::

            {"enrich": {"table": "customer",
                        "on": {"user_id": "c_custkey"},
                        "how": "left", "broadcast": true,
                        "select": [...optional projection...]}}
        """
        from pyspark.sql import functions as F

        other = self.ctx.tables[cfg["table"]]
        on = dict(cfg["on"])
        right = F.broadcast(other) if cfg.get("broadcast", True) else other
        cond = None
        for sc, tc in on.items():
            c = df[sc] == other[tc]
            cond = c if cond is None else (cond & c)
        joined = df.join(right, cond, cfg.get("how", "left"))
        for tc in on.values():
            joined = joined.drop(other[tc])
        if cfg.get("select"):
            joined = joined.select(*cfg["select"])
        return joined

    def run_available_now(
        self,
        query_name: str = "oetl_stream",
        output_mode: str = "append",
        foreach_batch: Callable[[DataFrame, int], None] | None = None,
        timeout: int = 120,
        checkpoint: str | None = None,
    ) -> DataFrame | None:
        """Process all currently-available input, then stop.

        Memory sink (default) returns the result table; a ``foreach_batch``
        callable replaces the sink for merge-style side effects.

        ``checkpoint`` makes the run RESUMABLE: source offsets commit to
        the checkpoint location, so a later invocation with the same
        checkpoint processes only files that arrived since the previous
        run — the incremental-ingest pattern (cron-style availableNow
        backfills with exactly-once source accounting, no external
        watermark bookkeeping). Without it, each run gets a fresh
        temporary checkpoint and reprocesses everything.
        """
        df = self.compile()
        writer = df.writeStream.trigger(availableNow=True).outputMode(output_mode)
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        if foreach_batch is not None:
            q = writer.foreachBatch(foreach_batch).start()
            q.awaitTermination(timeout)
            return None
        q = writer.format("memory").queryName(query_name).start()
        q.awaitTermination(timeout)
        return self.ctx.spark.table(query_name)
