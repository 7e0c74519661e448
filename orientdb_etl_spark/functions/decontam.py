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


# ---------------------------------------------------------------------------
# Bloom-filter pre-pass: decontamination when the eval gram set outgrows a
# broadcast hash table


# Spark exposes no public bloom_filter_agg / might_contain (checked
# against 4.1's function registry), so the filter is built from first
# principles on the same primitives: k seed-prefixed xxhash64 positions
# per gram, all JVM-side; the bitmap build and probe are Arrow-batched.


def build_gram_bloom(
    eval_df: DataFrame,
    text_col: str,
    n: int,
    m_bits: int = 1 << 23,
    k: int = 5,
) -> "np.ndarray":
    """Packed Bloom bitmap (numpy uint8, ``m_bits / 8`` bytes) of the eval
    set's token n-grams.

    Scale shape: the DRIVER never sees individual positions — executors
    build 1 MiB bitmap chunks with ``applyInPandas`` over position ranges
    (one shuffle of 8-byte position rows), and the driver collects and
    concatenates only the ``m_bits/8`` bytes of the bitmap itself. A
    4 Gbit filter is a 512 MB collect regardless of how many billions of
    grams went in — the position LIST, which can be 100× larger, stays
    distributed."""
    grams = exploded_gram_hashes(eval_df, text_col, n, keep=[]).select(
        F.col("_gh")
    )
    # re-derive positions from the 8-byte hash (not the gram text) so the
    # shuffled rows stay narrow
    pos = grams.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.lit(i), F.col("_gh")), F.lit(m_bits))
                    for i in range(k)
                ]
            )
        ).alias("pos")
    )
    return pack_bloom_positions(pos, m_bits)


def pack_bloom_positions(pos: DataFrame, m_bits: int) -> "np.ndarray":
    """Pack a single-column DataFrame of bit positions (``pos`` in
    [0, m_bits)) into a Bloom bitmap — the distributed-build stage shared
    by :func:`build_gram_bloom` (n-gram decontamination) and
    ``skew.bloom_prefilter_join`` (join-key semi-join reduction).

    Executors build 1 MiB bitmap chunks with ``applyInPandas`` over
    position ranges (one shuffle of 8-byte position rows); the driver
    collects and concatenates only the ``m_bits/8`` bitmap bytes — the
    position list, which can be 100× larger, stays distributed."""
    import numpy as np
    import pandas as pd

    if m_bits % 8 != 0:
        raise ValueError("m_bits must be a multiple of 8")
    # chunk sizing: cap at 1 MiB for driver-assembly granularity, but
    # ALSO floor the chunk count at ~32 so the pack stage parallelizes —
    # with a single chunk every position row would funnel through one
    # applyInPandas task (the default 8 Mbit bitmap used to do exactly
    # that). Chunk boundaries don't change the bitmap, only the split.
    chunk_bits = min(1 << 23, max(1 << 16, m_bits // 32))
    if m_bits % chunk_bits != 0:
        chunk_bits = m_bits  # tiny/odd bitmaps: one chunk, correct > parallel
    bytes_per_chunk = chunk_bits // 8
    pos = pos.select(F.col(pos.columns[0]).alias("pos")).withColumn(
        "chunk", (F.col("pos") / chunk_bits).cast("long")
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        chunk = int(pdf["chunk"].iloc[0])
        local = pdf["pos"].to_numpy(dtype=np.int64) - chunk * chunk_bits
        bits = np.zeros(bytes_per_chunk, dtype=np.uint8)
        np.bitwise_or.at(bits, local >> 3, np.uint8(1) << (local & 7).astype(np.uint8))
        return pd.DataFrame({"chunk": [chunk], "data": [bits.tobytes()]})

    rows = (
        pos.groupBy("chunk")
        .applyInPandas(pack, "chunk long, data binary")
        .collect()
    )
    out = np.zeros(m_bits // 8, dtype=np.uint8)
    for r in rows:
        start = r.chunk * bytes_per_chunk
        out[start : start + bytes_per_chunk] = np.frombuffer(r.data, dtype=np.uint8)
    return out


def bloom_decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    n: int = 13,
    mode: str = "flag",
    m_bits: int = 1 << 23,
    k: int = 5,
) -> DataFrame:
    """:func:`decontaminate` with a Bloom pre-pass — EXACTLY the same
    result (Bloom filters have no false negatives; false positives are
    removed by the verify join), but the corpus-side join input shrinks
    to Bloom-suspect grams only.

    When to use which: the plain path broadcasts an 8-byte-hash table of
    every eval gram — ideal while that table fits executor memory. Past
    that (hundreds of millions of eval grams), the Bloom bitmap stays
    broadcast-sized at any gram count (m_bits/8 bytes, fp rate
    ~(1-e^{-kG/m})^k), the probe is a vectorized bitmap index per gram,
    and only the surviving fraction enters the exact join — which may
    then shuffle, but over suspects instead of the corpus.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F811

    if mode not in ("hits", "flag", "filter"):
        raise ValueError(f"unknown mode {mode!r}")
    spark = docs.sparkSession
    bits = build_gram_bloom(
        eval_df, eval_text_col or text_col, n, m_bits=m_bits, k=k
    )
    bc = spark.sparkContext.broadcast(bits)

    def _might_contain(*pos_cols):
        b = bc.value
        ok = np.ones(len(pos_cols[0]), dtype=bool)
        for c in pos_cols:
            idx = c.to_numpy(dtype=np.int64)
            ok &= (b[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1 == 1
        return pd.Series(ok)

    # no type hints: pandas_udf rejects *args signatures with hints, and
    # the column count (k) is a runtime parameter
    might_contain = F.pandas_udf(_might_contain, "boolean")

    doc_grams = exploded_gram_hashes(docs, text_col, n, keep=[id_col])
    suspects = doc_grams.filter(
        might_contain(
            *[
                F.pmod(F.xxhash64(F.lit(i), F.col("_gh")), F.lit(m_bits))
                for i in range(k)
            ]
        )
    )
    eval_grams = exploded_gram_hashes(
        eval_df, eval_text_col or text_col, n, keep=[]
    ).distinct()
    hits = (
        suspects.join(F.broadcast(eval_grams), "_gh")
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


def semantic_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.97,
    planes: int = 8,
    seed: int = 42,
    mode: str = "filter",
) -> DataFrame:
    """Embedding-space decontamination: drop training rows whose cosine
    similarity to ANY eval-set vector reaches ``threshold`` — the
    semantic complement of the n-gram :func:`decontaminate` (paraphrased
    or re-tokenized eval leakage that shares no 8-gram still collides in
    embedding space; cf. the contamination analyses of Brown et al. 2020
    App. C and Yang et al. 2023).

    Scale shape: both sides get the same seeded sign-LSH bucket, the
    candidate stage is ONE bucket equi-join of train against the (small)
    eval side, and only collisions are verified with exact cosine. The train
    corpus is never self-joined and never shuffled beyond the bucket
    join; the eval side is eval-sized. Verbatim leakage (cosine 1) is
    bucket-identical by construction; near-paraphrase recall follows
    sign-LSH collision probability — raise ``planes`` DOWN for recall,
    UP for precision of the candidate stage, exactly as in
    ``embedding_near_dedup``.

    ``mode='filter'`` returns surviving train rows; ``'flag'`` keeps all
    rows with a boolean ``contaminated``.

    Buckets use the Arrow/numpy gaussian-plane path (the
    ``embedding_near_dedup`` discipline — interpreted HOF signatures are
    the measured anti-pattern); planes re-derive from ``seed`` on every
    executor, identically for both sides, so verbatim and scaled copies
    are bucket-identical by construction (scaling never flips a
    projection sign).
    """
    from orientdb_etl_spark.functions.similarity import (
        _cosine_pairs,
        add_lsh_buckets,
    )

    tb = add_lsh_buckets(
        train.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("_tv")
        ),
        "_tv",
        planes=planes,
        seed=seed,
        out_col="_b",
    )
    eb = add_lsh_buckets(
        eval_df.select(F.col(vec_col).cast("array<double>").alias("_ev")),
        "_ev",
        planes=planes,
        seed=seed,
        out_col="_b",
    )
    hits = (
        tb.join(eb, "_b")
        .withColumn("_cos", _cosine_pairs(F.col("_tv"), F.col("_ev")))
        .filter(F.col("_cos") >= threshold)
        .select(id_col)
        .distinct()
    )
    if mode == "filter":
        return train.join(hits, [id_col], "left_anti")
    return (
        train.join(hits.withColumn("_hit", F.lit(1)), [id_col], "left")
        .withColumn("contaminated", F.col("_hit").isNotNull())
        .drop("_hit")
    )
