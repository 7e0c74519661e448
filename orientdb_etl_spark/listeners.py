"""Run listeners (≈ etl/listener/OImporterListener.java:26-40).

The reference declares per-file/per-line/onJoinNotFound/validate hooks that
nothing in its engine actually invokes (SURVEY §2.6 — legacy surface). The
honest Spark mapping is driver-level lifecycle callbacks: per-row hooks
cannot exist in a distributed declarative engine, and the per-row warn
counting the default listener did (ODefaultImporterListener.java:27-55) is
served by the stats/observe machinery instead.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from orientdb_etl_spark.context import PipelineContext


@dataclass
class RunListener:
    """Driver-side lifecycle callbacks for one pipeline run.

    ``on_begin(ctx)`` fires before the lineage is compiled,
    ``on_end(ctx, result)`` after the loader and end-blocks,
    ``on_join_not_found(ctx, what)`` whenever a lookup transformer records
    unresolved keys (≈ OImporterListener.onJoinNotFound — but per run
    with counters, not per row).
    """

    on_begin: Callable[[PipelineContext], None] | None = None
    on_end: Callable[[PipelineContext, Any], None] | None = None
    on_join_not_found: Callable[[PipelineContext, str], None] | None = None
    #: fires after the sink action with every observed metric —
    #: rows_loaded plus the config's "observe" section — computed by the
    #: action itself via df.observe() (no extra pass; the Spark-native
    #: replacement for the reference's per-row listener counters)
    on_metrics: Callable[[PipelineContext, dict], None] | None = None


@dataclass
class CollectingListener:
    """Default listener: collects lifecycle events (≈ the reference's
    warn-counting ODefaultImporterListener)."""

    events: list[str] = field(default_factory=list)

    def listener(self) -> RunListener:
        return RunListener(
            on_begin=lambda ctx: self.events.append("begin"),
            on_end=lambda ctx, result: self.events.append(
                f"end rows_loaded={ctx.stats.rows_loaded} "
                f"warnings={ctx.stats.warnings} errors={ctx.stats.errors}"
            ),
            on_join_not_found=lambda ctx, what: self.events.append(
                f"join_not_found {what}"
            ),
            on_metrics=lambda ctx, metrics: self.events.append(
                "metrics "
                + " ".join(f"{k}={metrics[k]}" for k in sorted(metrics))
            ),
        )
