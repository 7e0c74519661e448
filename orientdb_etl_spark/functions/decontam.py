"""Benchmark decontamination: flag/drop corpus documents that share token
n-grams with an evaluation set.

The standard pre-training hygiene pass (e.g. GPT-3 appendix C, PaLM §8.1
both use 13-gram overlap): any training document containing an n-gram that
also appears in a benchmark's prompts/answers is contaminated and must be
flagged or removed.

Scale shape: the eval set is small (thousands of documents) while the
corpus is the 100 TB side — so the eval n-gram set is collected once,
hashed to 8-byte xxhash64 values, and BROADCAST; the corpus side is one
narrow map (explode distinct grams → hash) followed by a broadcast join.
The corpus is never shuffled. Hashing the grams keeps the broadcast and
the probe rows at 8 bytes per gram instead of full n-token strings; a
false positive needs an xxhash64 collision (~2^-64 per pair).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_ngram_array(col: str | Column, n: int) -> Column:
    """Distinct space-joined token n-grams of a text column; empty array
    when the document has fewer than ``n`` tokens. Pure expression.

    NOTE: referencing the tokenization 3× in one expression re-evaluates
    ``split`` per reference (no CSE across the CASE branches) — measured
    6× slower than splitting once. Use :func:`exploded_gram_hashes` in
    anything hot; this single-Column form remains for composability."""
    name = col if isinstance(col, str) else col._jc.toString()
    toks = f"split(trim({name}), '\\\\s+')"
    return F.expr(
        f"CASE WHEN {name} IS NULL OR length(trim({name})) = 0 "
        f"THEN cast(array() as array<string>) "
        f"WHEN size({toks}) >= {n} THEN array_distinct(transform("
        f"sequence(1, size({toks}) - {n} + 1), "
        f"i -> array_join(slice({toks}, i, {n}), ' '))) "
        f"ELSE cast(array() as array<string>) END"
    )


def _gram_array_from_tokens(tok_col: str, n: int) -> Column:
    """n-gram array from an already-materialized token-array column."""
    return F.expr(
        f"CASE WHEN size({tok_col}) >= {n} THEN array_distinct(transform("
        f"sequence(1, size({tok_col}) - {n} + 1), "
        f"i -> array_join(slice({tok_col}, i, {n}), ' '))) "
        f"ELSE cast(array() as array<string>) END"
    )


def exploded_gram_hashes(
    df: DataFrame, text_col: str, n: int, keep: list[str]
) -> DataFrame:
    """``keep`` columns + one ``_gh`` xxhash64 row per distinct n-gram.
    Stages the tokenization in its own projection so ``split`` runs once
    per row (the one-big-expression form re-evaluates it per reference —
    measured 6× slower at sf0.1), then explodes and hashes."""
    trimmed = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    # split("") yields [""] — map empty text to an empty token array so the
    # n=1 edge matches token_ngram_array exactly
    toks = F.when(
        F.length(trimmed) == 0, F.expr("cast(array() as array<string>)")
    ).otherwise(F.split(trimmed, r"\s+"))
    return (
        df.select(*keep, toks.alias("_tk"))
        .select(*keep, F.explode(_gram_array_from_tokens("_tk", n)).alias("_gram"))
        .select(*keep, F.xxhash64("_gram").alias("_gh"))
    )


def decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    n: int = 13,
    mode: str = "flag",
) -> DataFrame:
    """Mark or drop corpus docs sharing any token ``n``-gram with ``eval_df``.

    - ``mode='hits'``  → (id, n_hits): contaminated docs with the count of
      distinct overlapping n-grams (the audit view).
    - ``mode='flag'``  → docs plus a ``contaminated`` boolean.
    - ``mode='filter'``→ docs with contaminated rows removed.

    One broadcast join; the corpus side never shuffles (the per-doc hit
    count groups on the already-exploded corpus partition keys — Spark
    inserts a partial aggregate before the exchange, and only matched
    grams, a tiny fraction, reach it).
    """
    if mode not in ("hits", "flag", "filter"):
        raise ValueError(f"unknown mode {mode!r}")
    eval_grams = exploded_gram_hashes(
        eval_df, eval_text_col or text_col, n, keep=[]
    ).distinct()
    doc_grams = exploded_gram_hashes(docs, text_col, n, keep=[id_col])
    hits = (
        doc_grams.join(F.broadcast(eval_grams), "_gh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    if mode == "hits":
        return hits
    if mode == "filter":
        return docs.join(hits, [id_col], "left_anti")
    return docs.join(hits, [id_col], "left").withColumn(
        "contaminated", F.col("n_hits").isNotNull()
    ).drop("n_hits")
