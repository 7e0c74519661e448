"""Begin/end blocks: let / code / console (≈ etl/block/*.java).

Blocks are imperative driver-side steps around the declarative lineage —
`begin` runs before extraction, `end` after load
(``OETLProcessor.java:414-418, 435-439``).
"""

from __future__ import annotations

from typing import Any

from orientdb_etl_spark.context import PipelineContext
from orientdb_etl_spark.exprs import render_value, translate_osql


def run_block(ctx: PipelineContext, block: dict[str, Any]) -> None:
    if not isinstance(block, dict) or len(block) != 1:
        raise ValueError(f"block must be a single-key dict, got {block!r}")
    name, cfg = next(iter(block.items()))
    cfg = cfg or {}

    # cross-cutting `if` (OAbstractBlock.java:29-32)
    cond = cfg.get("if")
    if cond is not None:
        sql = translate_osql(str(cond), ctx.variables)
        row = ctx.spark.sql(f"SELECT ({sql}) AS v").collect()[0]
        if not row[0]:
            return

    if name == "let":
        # set a context variable from literal or expression (OLetBlock.java:26-64)
        var = cfg["name"]
        if "expression" in cfg:
            sql = translate_osql(str(cfg["expression"]), ctx.variables)
            ctx.variables[var] = ctx.spark.sql(f"SELECT {sql} AS v").collect()[0][0]
        else:
            ctx.variables[var] = render_value(cfg.get("value"), ctx.variables, ctx.spark)
    elif name == "code":
        # driver-side Python (≈ OCodeBlock.java:33-68 hosting JS)
        fn = cfg.get("callable")
        if callable(fn):
            fn(ctx)
        else:
            exec(  # noqa: S102 — engine-author-supplied config code
                str(cfg.get("code", "")),
                {"ctx": ctx, "spark": ctx.spark, "variables": ctx.variables},
            )
    elif name == "console":
        # command batch → spark.sql DDL/DML (≈ OConsoleBlock.java:32-68)
        commands = cfg.get("commands") or []
        if "file" in cfg:
            with open(cfg["file"]) as f:
                commands = [ln.strip() for ln in f if ln.strip()]
        for cmd in commands:
            ctx.spark.sql(render_value(cmd, ctx.variables, ctx.spark))
    else:
        raise ValueError(f"unknown block {name!r}")
