"""Training-objective construction over the token stream.

Denoising pretraining (T5 — Raffel et al., JMLR'20; UL2 — Tay et al.,
2022) corrupts each document by masking token SPANS and training the
model to reconstruct them. At corpus scale the masking plan itself is a
data-pipeline artifact: it must be deterministic (re-runs and the
train/eval split must see the same masks), cheap (a per-row expression,
never a Python loop over tokens), and auditable (the realized mask rate
is a statistic you monitor per shard).

:func:`span_corruption_plan` emits that plan: token positions are cut
into fixed blocks of ``block`` tokens; every FULL block contributes one
masked span of ``span_len`` tokens whose offset inside the block is
hash-derived from ``(doc id, block index)`` — so the target corruption
rate is exactly ``span_len / block`` and spans can never overlap by
construction. The trailing partial block is never masked (documented
bias: realized mask_frac ≤ target, approaching it as docs grow). The
hash is the repo's portable Knuth ladder, so a SQL oracle replays every
span byte-identically — randomness-by-hash, the same discipline as
``sampling.weighted_sample``.

Scale shape: one scan, per-row expressions only (split + sequence +
transform); the exploded span table is ``n_tokens / block`` rows per
document — a bounded expansion factor, no shuffle until the caller
aggregates. Reference scope note: the reference ETL has no
training-objective surface (SURVEY §2.8); LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orientdb_etl_spark.context import PipelineContext
from orientdb_etl_spark.operators import register

__all__ = [
    "span_corruption_plan",
    "span_corruption_stats",
    "preference_pairs",
    "preference_pairs_sql",
]

_KNUTH = 2654435761
_MOD = 1000003


def _offset_expr(id_col: str, seed: int, width: int) -> str:
    """Portable span offset inside a block: Knuth-ladder hash of
    (doc id, block index) reduced mod the legal start range."""
    return (
        f"(({id_col} + {seed} + b * 131) % {_MOD} * {_KNUTH} % {_MOD}) "
        f"% {width}"
    )


def span_corruption_plan(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block: int = 20,
    span_len: int = 3,
    seed: int = 17,
) -> DataFrame:
    """One row per masked span: ``(id, span_id, start, length,
    span_text)`` with ``start`` the 0-based token offset and
    ``span_text`` the masked tokens (the reconstruction target paired
    with sentinel ``<extra_id_{span_id}>``). Deterministic in
    ``(id, seed)`` — independent of partitioning, engine, and run.
    """
    if span_len < 1 or block <= span_len:
        raise ValueError(
            f"need 1 <= span_len < block, got span_len={span_len}, "
            f"block={block}"
        )
    width = block - span_len + 1
    toks = f"split({text_col}, ' ')"
    n_blocks = f"(size({toks}) DIV {block})"
    off = _offset_expr(id_col, seed, width)
    spans = (
        f"transform(sequence(0, {n_blocks} - 1), "
        f"b -> named_struct("
        f"'span_id', b, "
        f"'start', b * {block} + ({off})))"
    )
    exploded = (
        df.where(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
        .where(F.expr(n_blocks) > 0)
        .select(
            F.col(id_col).alias("id"),
            F.expr(toks).alias("_tk"),
            F.explode(F.expr(spans)).alias("_s"),
        )
    )
    return exploded.select(
        "id",
        F.col("_s.span_id").alias("span_id"),
        F.col("_s.start").alias("start"),
        F.lit(span_len).alias("length"),
        F.array_join(
            F.slice(F.col("_tk"), F.col("_s.start") + 1, span_len), " "
        ).alias("span_text"),
    )


def span_corruption_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block: int = 20,
    span_len: int = 3,
    seed: int = 17,
    round_to: int = 6,
) -> DataFrame:
    """Per-document audit of the plan: ``(id, n_tokens, n_spans,
    n_masked, mask_frac)`` — the realized corruption rate the pipeline
    monitors against the ``span_len / block`` target. Pure per-row
    arithmetic (no explode, no shuffle): the plan is deterministic, so
    its statistics are computable without materializing it."""
    if span_len < 1 or block <= span_len:
        raise ValueError(
            f"need 1 <= span_len < block, got span_len={span_len}, "
            f"block={block}"
        )
    toks = f"split({text_col}, ' ')"
    return (
        df.where(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.expr(f"size({toks})").alias("n_tokens"),
        )
        .select(
            "id",
            "n_tokens",
            (F.col("n_tokens") / block).cast("bigint").alias("n_spans"),
        )
        .select(
            "id",
            "n_tokens",
            "n_spans",
            (F.col("n_spans") * span_len).alias("n_masked"),
            F.round(
                (F.col("n_spans") * span_len)
                / F.col("n_tokens").cast("double"),
                round_to,
            ).alias("mask_frac"),
        )
    )


@register("spanCorrupt")
def span_corrupt_transformer(
    ctx: PipelineContext, df: DataFrame, cfg: dict
) -> DataFrame:
    """{"spanCorrupt": {"textField": "text", "idField": "doc_id",
    "block": 20, "spanLen": 3, "seed": 17, "stats": false}} —
    deterministic T5-style span-corruption plan; ``stats`` true emits
    the per-doc mask-rate audit instead of the exploded span table."""
    args = dict(
        block=int(cfg.get("block", 20)),
        span_len=int(cfg.get("spanLen", 3)),
        seed=int(cfg.get("seed", 17)),
    )
    fn = span_corruption_stats if cfg.get("stats") else span_corruption_plan
    return fn(df, cfg["textField"], cfg["idField"], **args)


def preference_pairs(
    df: DataFrame,
    prompt_col: str,
    response_col: str,
    score_col: str,
    min_margin: float = 0.0,
    round_to: int = 4,
) -> DataFrame:
    """Construct preference-training pairs (the DPO/RLHF reward-model
    input, Ouyang et al. arXiv:2203.02155 §3.2-shape) from a per-response
    rating log: per prompt, pair the highest-scored response (chosen)
    against the lowest (rejected), keeping prompts whose score margin
    clears ``min_margin`` — near-tie prompts make noisy preference
    labels and are dropped. Ties break deterministically (equal scores
    → smaller response id is chosen/rejected respectively), so the
    pair set is total-order stable and a SQL oracle replays it.

    Returns ``(prompt, chosen, rejected, chosen_score, rejected_score,
    margin)``, one row per surviving prompt.

    Scale shape: two rank-filter windows PARTITIONED BY PROMPT
    (bounded per-prompt frames — never a global sort) compiled to
    WindowGroupLimit with pre-shuffle pruning, then one join on the
    prompt key. No counterpart in the reference (no eval/training
    surface, OETLProcessor.java:252-283); §2.8 extension.
    """
    from orientdb_etl_spark.operators.relational import topk_per_group

    base = df.select(
        F.col(prompt_col).alias("prompt"),
        F.col(response_col).alias("_rid"),
        F.col(score_col).cast("double").alias("_s"),
    ).where(
        F.col(prompt_col).isNotNull()
        & F.col(response_col).isNotNull()
        & F.col(score_col).isNotNull()
    )
    best = topk_per_group(
        base, "prompt", ["_s DESC", "_rid ASC"], 1
    ).select(
        "prompt",
        F.col("_rid").alias("chosen"),
        F.col("_s").alias("_cs"),
    )
    worst = topk_per_group(
        base, "prompt", ["_s ASC", "_rid ASC"], 1
    ).select(
        "prompt",
        F.col("_rid").alias("rejected"),
        F.col("_s").alias("_rs"),
    )
    return (
        best.join(worst, "prompt")
        .where(F.col("chosen") != F.col("rejected"))
        .where(F.col("_cs") - F.col("_rs") >= float(min_margin))
        .select(
            "prompt",
            "chosen",
            "rejected",
            F.round("_cs", round_to).alias("chosen_score"),
            F.round("_rs", round_to).alias("rejected_score"),
            F.round(F.col("_cs") - F.col("_rs"), round_to).alias("margin"),
        )
    )


def preference_pairs_sql(
    samples_cte: str,
    prompt: str,
    response: str,
    score: str,
    min_margin: float = 0.0,
    round_to: int = 4,
) -> str:
    """DuckDB replay of :func:`preference_pairs`: identical rank
    windows, tie-breaks, margin filter (on the unrounded double — both
    engines derive it from the same exact inputs)."""
    return (
        f"WITH b AS (SELECT {prompt} AS prompt, {response} AS rid, "
        f"CAST({score} AS DOUBLE) AS s FROM {samples_cte} "
        f"WHERE {prompt} IS NOT NULL AND {response} IS NOT NULL "
        f"AND {score} IS NOT NULL), "
        "hi AS (SELECT prompt, rid AS chosen, s AS cs FROM "
        "(SELECT prompt, rid, s, row_number() OVER (PARTITION BY prompt "
        "ORDER BY s DESC, rid ASC) AS r FROM b) WHERE r = 1), "
        "lo AS (SELECT prompt, rid AS rejected, s AS rs FROM "
        "(SELECT prompt, rid, s, row_number() OVER (PARTITION BY prompt "
        "ORDER BY s ASC, rid ASC) AS r FROM b) WHERE r = 1) "
        "SELECT hi.prompt, chosen, rejected, "
        f"round(cs, {round_to}) AS chosen_score, "
        f"round(rs, {round_to}) AS rejected_score, "
        f"round(cs - rs, {round_to}) AS margin "
        "FROM hi JOIN lo ON hi.prompt = lo.prompt "
        f"WHERE chosen <> rejected AND cs - rs >= {float(min_margin)!r}"
    )
