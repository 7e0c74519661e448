"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023): pick pretraining documents from a huge RAW crawl so the
selected set's distribution matches a small high-quality TARGET corpus,
without training a model. Every raw document is scored by how much more
likely its hashed n-gram profile is under the target distribution than
under the raw distribution, then the selection resamples proportionally
to those importance weights.

Pipeline (all relational, all deterministic):

1. **Features** — word unigrams .. ``n_max``-grams (lowercased
   whitespace tokens, grams joined by one space), hashed into
   ``buckets`` slots with the portable base-31 codepoint polynomial
   (the :func:`~orientdb_etl_spark.functions.preprocess.feature_hash`
   portable twin, so the SQL oracle replays every bucket bit-for-bit).
2. **Bucket bigram models** — one hash aggregation per corpus gives the
   bucket count profile; Laplace smoothing over the FIXED bucket range
   makes both distributions full-support. The per-bucket log importance
   ratio is stored as an exact integer in micro-nats
   (``round((ln(p_t) − ln(p_r)) · 1e6)``) so per-document SUMS are
   integer arithmetic — order-free and engine-portable, sidestepping
   float-addition non-associativity across Spark/DuckDB hash
   aggregation orders.
3. **Per-document log-weight** — explode the raw corpus's features once,
   broadcast-join the ``buckets``-row ratio table, one integer sum per
   document: ``logw = Σ lr_micro / 1e6``.
4. **Resampling** — sampling ∝ ``exp(logw)`` without replacement is
   Gumbel-top-k: key = ``logw + g`` with ``g = −ln(−ln(u))`` and ``u``
   hash-derived from the id (the same deterministic-draw discipline as
   :func:`~orientdb_etl_spark.functions.sampling.weighted_sample`); the
   k largest keys are the sample. Keys are rounded to 6 dp with an id
   tiebreak so the selection replays identically in the SQL twin.

Scale shape at 100 TB: the target corpus is small by definition (its
profile is one bucket-sized agg); the raw corpus is touched TWICE (once
for its bucket profile, once for per-doc scoring) — both passes are
single hash aggregations with no joins wider than the broadcast
``buckets``-row ratio table (≤ a few thousand rows by construction).
The selection compiles to ``TakeOrderedAndProject`` (per-partition
k-heap, O(k) driver merge, never a global sort). No vocabulary state,
no model, no driver loops.

No counterpart in the reference; training-data-pipeline extension per
the SURVEY §2.8 north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orientdb_etl_spark.functions.sampling import _PRIME, hash_bucket

#: Modulus of the portable base-31 codepoint polynomial — shared with
#: preprocess.feature_hash(portable=True) and the minhash portable twins.
_PRIME31 = 4294967291


def _features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_max: int,
    passthrough: "tuple[F.Column, ...]" = (),
) -> DataFrame:
    """One row per (id, n-gram feature string), n = 1..n_max. Spark's
    ``sequence(1, 0)`` DESCENDS, so short token arrays guard each gram
    order behind an IF instead of relying on an empty sequence.
    ``passthrough`` columns (already-aliased) ride along per row so
    per-doc attributes (label, domain) reach downstream aggregations
    without a corpus-sized re-join."""
    from orientdb_etl_spark.functions.dedup import ensure_parallelism

    pt = list(passthrough)
    names = [df.select(c).columns[0] for c in pt]
    toks = df.select(
        F.col(id_col).alias("_id"),
        *pt,
        F.split(
            F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
        ).alias("_t"),
    ).select(
        "_id", *names, F.array_remove("_t", "").alias("_t")
    )
    # the per-gram base-31 hash fold downstream is CPU-bound; a narrow
    # single-file input would pin it (and every later map-side model
    # pass over the doc-major cache) to 1-2 cores — no-op at real scale
    toks = ensure_parallelism(toks)
    grams = toks.select(
        "_id",
        *names,
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, {n_max}), n -> "
                f"IF(size(_t) >= n, "
                f"transform(sequence(1, size(_t) - n + 1), "
                f"i -> array_join(slice(_t, i, n), ' ')), "
                f"cast(array() as array<string>))))"
            )
        ).alias("_f"),
    )
    return grams


def _bucket_expr(col: str, buckets: int, seed: int) -> str:
    """Portable feature→bucket: base-31 polynomial mod PRIME31, % buckets."""
    return (
        f"CAST(aggregate(sequence(1, length({col})), "
        f"cast({seed} as bigint), "
        f"(acc, i) -> (acc * 31 + ascii(substring({col}, i, 1))) "
        f"% {_PRIME31}) % {buckets} AS INT)"
    )


def _bucket_counts(feats: DataFrame, buckets: int, seed: int) -> DataFrame:
    """(bucket, cnt) profile of a feature stream — one hash agg."""
    return (
        feats.select(F.expr(_bucket_expr("_f", buckets, seed)).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    seed: int = 11,
    n_max: int = 2,
) -> DataFrame:
    """Score every RAW document's importance toward the TARGET corpus:
    returns ``(id_col, n_feats, logw)`` where ``logw`` is the summed
    per-feature log importance ratio (micro-nat integer sum divided by
    1e6 — see module docstring for why integer). Documents with no
    features (NULL/empty text) emit no row — they carry no evidence
    either way, and the resampler treats absence as weight 0.

    Positive ``logw`` = the document looks more like the target than
    like the average raw document; the DSIR selection keeps the raw
    corpus's diversity by sampling ∝ exp(logw) rather than thresholding
    (:func:`dsir_resample`).
    """
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    if n_max < 1:
        raise ValueError(f"n_max must be >= 1, got {n_max}")
    raw_feats = _features(raw, text_col, id_col, n_max)
    tgt_feats = _features(target, text_col, id_col, n_max)
    rc = _bucket_counts(raw_feats, buckets, seed)
    tc = _bucket_counts(tgt_feats, buckets, seed)
    rt = rc.agg(F.sum("cnt").alias("_nr"))
    tt = tc.agg(F.sum("cnt").alias("_nt"))
    # full-support ratio table over the FIXED bucket range: Laplace
    # (cnt+1)/(N+B) on both sides, log-ratio pinned to integer micro-nats
    grid = raw.sparkSession.range(buckets).select(
        F.col("id").cast("int").alias("b")
    )
    ratios = (
        grid.join(tc.withColumnRenamed("cnt", "_ct"), "b", "left")
        .join(rc.withColumnRenamed("cnt", "_cr"), "b", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
        .select(
            "b",
            F.expr(
                f"CAST(round((ln(CAST(coalesce(_ct, 0) + 1 AS DOUBLE) / "
                f"(_nt + {buckets})) - "
                f"ln(CAST(coalesce(_cr, 0) + 1 AS DOUBLE) / "
                f"(_nr + {buckets}))) * 1000000) AS BIGINT)"
            ).alias("lr_micro"),
        )
    )
    scored = raw_feats.select(
        "_id", F.expr(_bucket_expr("_f", buckets, seed)).alias("b")
    ).join(F.broadcast(ratios), "b")
    return (
        scored.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("lr_micro").alias("_lw_micro"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_feats",
            (F.col("_lw_micro").cast("double") / F.lit(1e6)).alias("logw"),
        )
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    seed: int = 11,
    n_max: int = 2,
    gumbel_seed: int = 42,
) -> DataFrame:
    """DSIR selection: sample ``k`` raw documents WITHOUT replacement
    with probability ∝ exp(logw) via deterministic Gumbel-top-k — key =
    ``round(logw + gumbel, 6)`` with the Gumbel variate derived from the
    id hash (u strictly inside (0,1): ``(bucket + 0.5) / PRIME``), ties
    broken by id. Returns the selected raw rows + their ``logw`` and
    selection ``key``. Pure function of (corpus, ids, seeds): replays
    identically on any cluster layout and in the SQL oracle."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    lw = dsir_logweights(
        raw, target, text_col, id_col, buckets=buckets, seed=seed, n_max=n_max
    )
    u = (
        hash_bucket(id_col, _PRIME, gumbel_seed).cast("double") + F.lit(0.5)
    ) / F.lit(float(_PRIME))
    gumbel = -F.log(-F.log(u))
    return (
        raw.join(lw, id_col)
        .withColumn("key", F.round(F.col("logw") + gumbel, 6))
        .orderBy(F.col("key").desc(), F.col(id_col).asc())
        .limit(k)
    )
