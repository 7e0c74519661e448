"""Transformer registry + cross-cutting component semantics.

Every transformer is a pure ``(ctx, df, cfg) -> df`` function; the registry
mirrors the reference factory (``OETLComponentFactory.java:55-86``: csv,
field, merge, vertex, edge, flow, link, log, block, code, command, etl,
json, rename) plus this engine's relational extensions (select/filter/
aggregate/join/sort/limit/distinct/window/union — the surface SURVEY §2.8
notes the reference lacks entirely).

Cross-cutting attributes (``OAbstractETLComponent.java:46-96``):

- ``if``: rows failing the condition are *skipped, not dropped* — the
  transformer applies only to matching rows, non-matching rows pass through
  unchanged (missing new columns become null on the skipped side).
- ``output``: the transformer's result is captured as a named side branch
  (context variable / temp view) and the MAIN lineage continues from the
  transformer's input (``OAbstractTransformer.java:38-47``).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orientdb_etl_spark.context import PipelineContext
from orientdb_etl_spark.exprs import translate_osql

TransformFn = Callable[[PipelineContext, DataFrame, dict], DataFrame]

_REGISTRY: dict[str, TransformFn] = {}


def register(name: str) -> Callable[[TransformFn], TransformFn]:
    def deco(fn: TransformFn) -> TransformFn:
        _REGISTRY[name] = fn
        return fn

    return deco


def get_transformer(name: str) -> TransformFn:
    if name not in _REGISTRY:
        raise ValueError(
            f"unknown transformer {name!r}; known: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def apply_transformer(
    ctx: PipelineContext, df: DataFrame, name: str, cfg: dict[str, Any]
) -> DataFrame:
    """Apply one transformer with the cross-cutting `if`/`output` semantics."""
    fn = get_transformer(name)
    cond_sql = cfg.get("if")
    out_name = cfg.get("output")

    if cond_sql is None:
        result = fn(ctx, df, cfg)
    else:
        cond = F.expr(translate_osql(str(cond_sql), ctx.variables))
        matched = fn(ctx, df.filter(cond), cfg)
        skipped = df.filter(~F.coalesce(cond, F.lit(False)))
        if matched.columns == skipped.columns:
            result = matched.unionByName(skipped)
        else:
            result = matched.unionByName(skipped, allowMissingColumns=True)

    if out_name:
        ctx.outputs[out_name] = result
        result.createOrReplaceTempView(out_name)
        ctx.variables[out_name] = result
        return df  # main lineage continues from the input
    return result


# populate the registry
from orientdb_etl_spark.operators import core as _core  # noqa: E402,F401
from orientdb_etl_spark.operators import lookup as _lookup  # noqa: E402,F401
from orientdb_etl_spark.operators import relational as _rel  # noqa: E402,F401
from orientdb_etl_spark.operators import subetl as _subetl  # noqa: E402,F401
from orientdb_etl_spark.operators import mlops as _mlops  # noqa: E402,F401
from orientdb_etl_spark.operators import skew as _skew  # noqa: E402,F401
from orientdb_etl_spark.operators import temporal as _temporal  # noqa: E402,F401
from orientdb_etl_spark.functions import graph as _graph  # noqa: E402,F401
from orientdb_etl_spark.functions import basket as _basket  # noqa: E402,F401
from orientdb_etl_spark.functions import privacy as _privacy  # noqa: E402,F401
from orientdb_etl_spark.functions import objectives as _objectives  # noqa: E402,F401

__all__ = ["apply_transformer", "get_transformer", "register"]
