"""Shared pipeline state.

The reference threads an ``OCommandContext`` of ``$variables`` through every
component (``OAbstractETLComponent.java:123-152``) and accumulates run stats
(``OETLProcessor.java:75-89``). Our equivalent is driver-side only: variables
are resolved while *compiling* the DataFrame lineage, never per row.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession


@dataclass
class RunStats:
    """≈ OETLProcessorStats (``OETLProcessor.java:75-89``): warning/error
    budget for unresolved-lookup actions and validation gates."""

    warnings: int = 0
    errors: int = 0
    rows_loaded: int | None = None
    notes: list[str] = field(default_factory=list)

    def warn(self, msg: str) -> None:
        self.warnings += 1
        self.notes.append(f"WARNING: {msg}")

    def error(self, msg: str) -> None:
        self.errors += 1
        self.notes.append(f"ERROR: {msg}")


@dataclass
class PipelineContext:
    """Everything a compiling operator can see."""

    spark: SparkSession
    variables: dict[str, Any] = field(default_factory=dict)
    # lookup namespace: "ClassName" -> DataFrame (dimension tables, loaded
    # fixtures, results of previous pipelines). The lookup family resolves
    # "Class.property" against this (≈ OAbstractLookupTransformer.java:74-93).
    tables: dict[str, DataFrame] = field(default_factory=dict)
    # graph accumulation: vertex/edge transformers append here
    vertices: list[DataFrame] = field(default_factory=list)
    edges: list[DataFrame] = field(default_factory=list)
    # `output` attribute side-branches (OAbstractTransformer.java:38-47)
    outputs: dict[str, DataFrame] = field(default_factory=dict)
    stats: RunStats = field(default_factory=RunStats)
    # driver-side lifecycle listener (listeners.RunListener); per-row hooks
    # of the reference's OImporterListener have no distributed analog
    listener: Any = None
    # deferred HALT/ERROR miss checks from lookup transformers:
    # (Observation, what, action, bounded-probe DF). Resolved by
    # Pipeline.run after the sink action (single pass — the observe()
    # counter rides the write job); the probe is the fallback when the
    # loader is lazy and no action runs.
    pending_miss_checks: list = field(default_factory=list)

    def add_miss_check(self, obs: Any, what: str, action: str, probe: DataFrame) -> None:
        self.pending_miss_checks.append((obs, what, action, probe))

    def resolve_miss_checks(self, observed: bool) -> None:
        """HALT-as-validation-gate (SURVEY §4.3): checked at action time.

        ``observed=True`` → an action just ran over the lineage, so each
        Observation holds its miss count for free. ``observed=False`` (lazy
        loader / no action) → fall back to a bounded ``limit(1)`` probe.
        Like the reference's mid-run halt, rows already written by the
        action stay written; HALT aborts the run, not the sink.
        """
        from orientdb_etl_spark.operators.core import ETLHaltError

        checks, self.pending_miss_checks = self.pending_miss_checks, []
        for obs, what, action, probe in checks:
            if observed:
                n = int(obs.get.get("misses", 0))
            elif action == "HALT":
                n = probe.limit(1).count()  # bounded early-exit probe
            else:
                continue  # ERROR counts only ride a real action
            if not n:
                continue
            if action == "HALT":
                msg = f"{what}: unresolved lookup with action=HALT"
                self.stats.error(msg)
                raise ETLHaltError(msg)
            self.stats.error(f"{what}: {n} unresolved lookups (action=ERROR)")

    def register_table(self, name: str, df: DataFrame) -> None:
        self.tables[name] = df
        df.createOrReplaceTempView(name)

    def resolve_lookup(self, lookup: str) -> tuple[DataFrame, str]:
        """Resolve ``"Class.property"`` to (dimension DF, key column).

        ≈ the reference's index-or-query access-path selection
        (``OAbstractLookupTransformer.java:74-93``) — in Spark the "index"
        is simply a (usually broadcast) join on the key column.
        """
        if "." not in lookup:
            raise ValueError(f"lookup must be 'Class.property', got {lookup!r}")
        cls, prop = lookup.rsplit(".", 1)
        if cls in self.tables:
            df = self.tables[cls]
        else:
            try:
                df = self.spark.table(cls)
            except Exception as exc:  # noqa: BLE001
                raise ValueError(f"unknown lookup class {cls!r}") from exc
        if prop not in df.columns:
            raise ValueError(f"lookup property {prop!r} not in {cls!r} columns")
        return df, prop
