"""Hashed-n-gram logistic-regression quality classifier — the
fastText-style filter (Joulin et al., EACL 2017) that GPT-3 (Brown et
al. 2020, App. A), LLaMA, and Falcon used to keep web pages that "look
like" a high-quality seed corpus: train a linear classifier on hashed
bag-of-n-gram features with positive = seed corpus, negative = random
crawl, then keep documents the classifier scores high.

Everything is relational and DETERMINISTIC — the same full-batch
gradient-descent trajectory replays bit-for-bit on any cluster layout
and in the DuckDB oracle, via the integer-pinning discipline of
:mod:`~orientdb_etl_spark.functions.dsir`:

- **Features**: word unigrams+bigrams hashed into ``buckets`` slots with
  the portable base-31 polynomial (dsir._features / dsir._bucket_expr),
  counted per (doc, bucket) → ``k``; per-doc total ``n``; tf = k/n.
  A bias slot ``b = buckets`` with ``k = n`` (tf ≡ 1) closes the affine
  term so weights and bias update through one table.
- **Weights** live as exact integers in nano-units (``w_nano``; the real
  weight is ``w_nano / 1e9``).
- **Margin** of a doc: ``Σ_b w_nano·k`` is an INTEGER inner product
  (order-free across engines); the only float steps are the final
  ``margin = Σ/(1e9·n)`` and ``p = σ(margin)`` — scalar double ops on
  deterministic inputs.
- **Gradient**: each doc's per-bucket contribution is pinned to an
  integer, ``g_nano = round((p−y)·k/n·1e9)``, summed as integers; the
  update ``w_nano −= round(lr·ΣG/n_docs)`` is one scalar double op per
  bucket. Full-batch, ``iters`` unrolled iterations — no RNG anywhere
  (w₀ = 0, so iteration 1's p is exactly 0.5 for every doc).

Scale shape at 100 TB: the corpus's feature table is built ONCE and
reused every iteration (cache it — ``iters×2`` consumers); each
iteration is one broadcast join of the (buckets+1)-row weight table +
two hash aggregations (per-doc margins, per-bucket gradients), both
partial-combining map-side. Weight state is buckets-sized, never
corpus-sized; there is no driver loop over data, no collect. Scoring a
new corpus is one broadcast join + one aggregation.

No counterpart in the reference; training-data-pipeline extension per
SURVEY §2.8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orientdb_etl_spark.functions.dsir import _bucket_expr, _features


def hashed_doc_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    seed: int = 11,
    n_max: int = 2,
    label_col: str | None = None,
) -> DataFrame:
    """(id, [y,] b, k, n) hashed bag-of-n-grams with the bias slot
    ``b = buckets`` carrying ``k = n``. Docs with no features (empty
    text) emit no rows — they carry no evidence and score σ(bias) only
    via the caller's convention (absent from train/score output)."""
    feats = _features(df, text_col, id_col, n_max)
    kb = (
        feats.select(
            "_id", F.expr(_bucket_expr("_f", buckets, seed)).alias("b")
        )
        .groupBy("_id", "b")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    n = kb.groupBy("_id").agg(F.sum("k").alias("n"))
    bias = n.select("_id", F.lit(buckets).alias("b"), F.col("n").alias("k"))
    out = kb.unionByName(bias).join(n, "_id")
    if label_col is not None:
        lab = df.select(
            F.col(id_col).alias("_id"),
            F.col(label_col).cast("int").alias("y"),
        )
        out = out.join(lab, "_id")
    return out


def train_quality_classifier(
    train: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    seed: int = 11,
    n_max: int = 2,
    iters: int = 4,
    lr: float = 0.5,
    eager: bool = False,
) -> DataFrame:
    """Train the classifier; returns the final weight table
    ``(b, w_nano)`` with ``buckets + 1`` rows (slot ``buckets`` is the
    bias). ``label_col`` must be 0/1 (castable). The gradient-descent
    trajectory is exact integer arithmetic between the per-doc sigmoid
    evaluations — see the module docstring for the pinning scheme.

    Cache discipline (the unigram-LM pattern): the corpus feature table
    feeds 2·``iters`` consumers and each iteration's weight table feeds
    two — both get cut points or every consumer re-executes the full
    upstream lineage (doubling per iteration). Default: ``cache()`` on
    both (job-free construction; the weight caches are
    ``buckets+1``-row, the bounded case the cache-discipline doc
    allows, but they persist for the session). ``eager=True`` pins each
    iteration's weights driver-side (``collect`` → literal table — the
    k-means-centroids pattern; weight state is buckets-sized by
    construction, never corpus-sized) and releases the feature cache
    before returning, so long-lived sessions leak nothing."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if lr <= 0:
        raise ValueError(f"lr must be > 0, got {lr}")
    spark = train.sparkSession
    feats = hashed_doc_features(
        train, text_col, id_col, buckets, seed, n_max, label_col=label_col
    ).cache()  # 2·iters consumers below — one materialization
    n_docs = feats.select("_id").distinct().count()
    if n_docs == 0:
        raise ValueError("train corpus has no feature-bearing documents")

    def _pin(frame: DataFrame) -> DataFrame:
        return spark.createDataFrame(frame.collect(), frame.schema)

    grid = spark.range(buckets + 1).select(
        F.col("id").cast("int").alias("b")
    )
    w = grid.select("b", F.lit(0).cast("bigint").alias("w_nano"))
    for _ in range(iters):
        margins = (
            feats.join(F.broadcast(w), "b")
            .groupBy("_id", "y", "n")
            .agg(F.sum(F.col("w_nano") * F.col("k")).alias("_dot"))
            .select(
                "_id",
                "y",
                "n",
                (
                    F.lit(1.0)
                    / (
                        F.lit(1.0)
                        + F.exp(
                            -(
                                F.col("_dot").cast("double")
                                / (F.lit(1e9) * F.col("n"))
                            )
                        )
                    )
                ).alias("_p"),
            )
        )
        grads = (
            feats.join(
                margins.select("_id", "_p"), "_id"
            )
            .select(
                "b",
                F.round(
                    (F.col("_p") - F.col("y"))
                    * F.col("k").cast("double")
                    / F.col("n")
                    * F.lit(1e9)
                )
                .cast("bigint")
                .alias("_g"),
            )
            .groupBy("b")
            .agg(F.sum("_g").alias("_G"))
        )
        w = (
            grid.join(F.broadcast(w), "b")
            .join(F.broadcast(grads), "b", "left")
            .select(
                "b",
                (
                    F.col("w_nano")
                    - F.round(
                        F.lit(lr)
                        * F.coalesce(F.col("_G"), F.lit(0)).cast("double")
                        / F.lit(float(n_docs))
                    ).cast("bigint")
                ).alias("w_nano"),
            )
        )
        w = _pin(w) if eager else w.cache()
    if eager:
        # the final weights are a literal table — releasing the feature
        # cache leaves nothing persisted and the result stays valid
        feats.unpersist()
    return w


def score_quality(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    seed: int = 11,
    n_max: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Score documents under a trained weight table: returns
    ``(id_col, n_feats, prob, keep)`` with ``prob = round(σ(margin), 6)``
    and ``keep = prob >= threshold``. One broadcast join + one
    aggregation; feature-less docs emit no row. ``buckets``/``seed``/
    ``n_max`` must match the training call (the weight table's bias slot
    pins ``buckets`` — mismatches raise)."""
    n_slots = weights.count()
    if n_slots != buckets + 1:
        raise ValueError(
            f"weight table has {n_slots} slots but buckets={buckets} "
            f"implies {buckets + 1} (including the bias slot)"
        )
    feats = hashed_doc_features(df, text_col, id_col, buckets, seed, n_max)
    return (
        feats.join(F.broadcast(weights), "b")
        .groupBy("_id", "n")
        .agg(F.sum(F.col("w_nano") * F.col("k")).alias("_dot"))
        .select(
            F.col("_id").alias(id_col),
            F.col("n").alias("n_feats"),
            F.round(
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(
                        -(
                            F.col("_dot").cast("double")
                            / (F.lit(1e9) * F.col("n"))
                        )
                    )
                ),
                6,
            ).alias("prob"),
        )
        .withColumn("keep", F.col("prob") >= F.lit(float(threshold)))
    )
