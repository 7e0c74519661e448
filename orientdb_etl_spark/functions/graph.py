"""Graph analytics over the engine's vertex/edge output.

The reference is an OrientDB loader — vertices and edges are first-class
outputs (OVertexTransformer.java:68-74, OEdgeTransformer.java:130-141) but
the reference can only *store* them; every traversal happens later inside
OrientDB. This module closes that gap Spark-side: degree centrality and
fixed-iteration PageRank as DataFrame programs over the same (src, dst)
edge frame the edge transformer emits.

Scale shape: every iteration is one equi-join (ranks ⋈ edges on the
out-vertex, shuffled on the join key) + one aggregation on the in-vertex —
the standard join-agg PageRank on a distributed engine (the Pregel-style
formulation of Malewicz et al., SIGMOD'10, expressed relationally).
``localCheckpoint`` truncates lineage each iteration so the plan stays
O(1) instead of O(iterations); at real scale the edge frame is the only
large operand and it is shuffle-partitioned once on ``src`` and reused.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orientdb_etl_spark.context import PipelineContext
from orientdb_etl_spark.functions.dedup import connected_component_labels
from orientdb_etl_spark.operators import register

__all__ = ["connected_component_labels", "degrees", "pagerank"]


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(id, out_degree, in_degree) for every vertex that appears on either
    end of an edge. One aggregation per direction + one outer merge; all
    map-side combinable."""
    out_d = edges.groupBy(F.col(src).alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_d = edges.groupBy(F.col(dst).alias("id")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        out_d.join(in_d, "id", "full_outer")
        .na.fill(0, ["out_degree", "in_degree"])
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 8,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank → (id, rank).

    r_{t+1}(v) = (1-d)/N + d · Σ_{u→v} r_t(u) / outdeg(u), with uniform
    r_0 = 1/N. Parallel edges count once (the edge set is deduplicated) and
    dangling-vertex mass is NOT redistributed — rank totals < 1 when sinks
    exist; both choices are deterministic and mirrored exactly by the SQL
    oracle (a recursive CTE driving the same recurrence).

    Fixed ``iterations`` (not convergence-tested) keeps the run
    deterministic and avoids a per-iteration driver action; the
    per-iteration ``localCheckpoint`` bounds lineage, which is what keeps
    iteration N's plan identical in size to iteration 1's at any scale.
    """
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst")).distinct()
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("_src").alias("id"))
        .union(e.select(F.col("_dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    out_deg = e.groupBy(F.col("_src").alias("id")).agg(
        F.count(F.lit(1)).alias("_deg")
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    base = (1.0 - damping) / n_nodes
    for _ in range(iterations):
        contrib = (
            ranks.join(out_deg, "id")
            .join(e, F.col("id") == F.col("_src"))
            .select(
                F.col("_dst").alias("id"),
                (F.col("rank") / F.col("_deg")).alias("_c"),
            )
            .groupBy("id")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes.join(contrib, "id", "left")
            .select(
                "id",
                (F.lit(base) + damping * F.coalesce(F.col("_in"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


@register("degrees")
def degrees_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """Config form: {"degrees": {"src": "src", "dst": "dst"}} over an
    edge-shaped pipeline payload (e.g. the edge transformer's output)."""
    return degrees(df, cfg.get("src", "src"), cfg.get("dst", "dst"))


@register("pagerank")
def pagerank_transformer(ctx: PipelineContext, df: DataFrame, cfg: dict) -> DataFrame:
    """Config form: {"pagerank": {"src": "src", "dst": "dst",
    "iterations": 8, "damping": 0.85}}."""
    return pagerank(
        df,
        cfg.get("src", "src"),
        cfg.get("dst", "dst"),
        int(cfg.get("iterations", 8)),
        float(cfg.get("damping", 0.85)),
    )
