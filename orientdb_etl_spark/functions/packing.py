"""Sequence packing for training-data pipelines.

Packing turns variable-length documents into fixed-capacity training
sequences so the trainer reads near-full batches. Two strategies, matching
the two used in practice:

``pack_offsets``
    Concat-and-chunk (GPT-style pretraining): documents are concatenated in
    a deterministic order inside a shard and the token stream is cut into
    ``capacity``-token sequences; a document may straddle a sequence
    boundary. The assignment is a pure prefix-sum, so the whole operator is
    a single window aggregation — JVM-side, whole-stage-codegen, and
    expressible in ANSI SQL for the oracle.

``pack_greedy``
    Whole-document first-fit-decreasing bin packing inside a shard (no
    document ever splits — the SFT/fine-tuning variant). Bin packing is
    inherently sequential, so it runs per-shard via ``applyInPandas``
    (Arrow batches); shards bound the state and parallelize the work.

Scale: both operators shuffle ONCE on the shard key. Shard count is the
parallelism knob — at 100 TB you pick ``n_shards`` ≈ cluster cores so each
shard holds ~(corpus/n_shards) docs; the window/FFD state is O(shard), not
O(corpus). Deterministic shard + order keys make re-runs reproducible
(same property as functions/sampling.py's hash splits).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _shard_col(id_col: str, shard_col: str | Column | None, n_shards: int) -> Column:
    if shard_col is not None:
        return F.col(shard_col) if isinstance(shard_col, str) else shard_col
    # xxhash64 decorrelates the shard from any id ordering (skew resistance)
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))


def pack_offsets(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    capacity: int = 2048,
    shard_col: str | Column | None = None,
    n_shards: int = 32,
) -> DataFrame:
    """Concat-and-chunk packing offsets.

    Within each shard, documents are laid out end-to-end in ``id_col``
    order and the stream is cut every ``capacity`` tokens. Returns one row
    per non-empty document:

    - ``shard`` — shard id
    - ``start_off`` — token offset of the doc inside the shard stream
    - ``seq_first`` / ``seq_last`` — first / last sequence index the doc
      lands in (a doc spanning a boundary has seq_last > seq_first)

    One shuffle (window partition on shard); the running sum is a single
    pass per shard. Documents longer than ``capacity`` simply span
    multiple sequences — no special case needed.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    shard = _shard_col(id_col, shard_col, n_shards).alias("shard")
    base = df.select(F.col(id_col), F.col(tokens_col), shard).filter(
        F.col(tokens_col) > 0
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tokens_col).over(w)
    return base.select(
        id_col,
        "shard",
        tokens_col,
        (cum - F.col(tokens_col)).alias("start_off"),
        F.floor((cum - F.col(tokens_col)) / capacity).alias("seq_first"),
        F.floor((cum - 1) / capacity).alias("seq_last"),
    )


def pack_greedy(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    capacity: int = 2048,
    shard_col: str | Column | None = None,
    n_shards: int = 32,
) -> DataFrame:
    """Whole-document first-fit-decreasing packing.

    Each document is assigned to exactly one pack; no pack exceeds
    ``capacity`` unless a single document alone does (then it gets a pack
    of its own). FFD is the standard 11/9·OPT+1 heuristic; decreasing
    order also makes the assignment deterministic.

    Runs per-shard in ``applyInPandas`` (bin packing is a sequential scan
    by nature): one shuffle on the shard key, O(shard) state, Arrow
    transfer both ways. Pack ids are globally unique as (shard, pack_id)
    pairs.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    shard = _shard_col(id_col, shard_col, n_shards).alias("shard")
    base = df.select(F.col(id_col), F.col(tokens_col), shard).filter(
        F.col(tokens_col) > 0
    )
    schema = T.StructType(
        [
            T.StructField("shard", T.LongType()),
            T.StructField(id_col, T.LongType()),
            T.StructField(tokens_col, T.LongType()),
            T.StructField("pack_id", T.LongType()),
            T.StructField("pack_tokens", T.LongType()),
        ]
    )

    def _ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        # sort by (tokens desc, id asc) — deterministic FFD order
        pdf = pdf.sort_values([tokens_col, id_col], ascending=[False, True])
        loads: list[int] = []  # remaining capacity per open pack
        assign: list[int] = []
        for tok in pdf[tokens_col].to_numpy():
            t = int(tok)
            placed = -1
            for i, free in enumerate(loads):
                if free >= t:
                    placed = i
                    break
            if placed < 0:
                loads.append(capacity)
                placed = len(loads) - 1
                # oversized doc: own pack, allowed to exceed capacity
            loads[placed] -= t
            assign.append(placed)
        pdf = pdf.assign(pack_id=assign)
        pack_tot = pdf.groupby("pack_id")[tokens_col].transform("sum")
        return pdf.assign(pack_tokens=pack_tot)[
            ["shard", id_col, tokens_col, "pack_id", "pack_tokens"]
        ]

    return base.groupBy("shard").applyInPandas(_ffd, schema=schema)


def pack_utilization(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-shard packing efficiency summary over ``pack_greedy`` output:
    pack count, mean fill ratio, and wasted-token total. Plain hash
    aggregate — the monitoring view a packing job would emit."""
    per_pack = packed.groupBy("shard", "pack_id").agg(
        F.first("pack_tokens").alias("pack_tokens")
    )
    return per_pack.groupBy("shard").agg(
        F.count("*").alias("n_packs"),
        F.round(F.avg(F.least(F.col("pack_tokens") / capacity, F.lit(1.0))), 4).alias(
            "mean_fill"
        ),
        F.sum(
            F.greatest(F.lit(capacity) - F.col("pack_tokens"), F.lit(0))
        ).alias("wasted_tokens"),
    )
