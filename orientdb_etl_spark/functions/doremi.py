"""DoReMi domain-mixture optimization (Xie et al., NeurIPS 2023:
"DoReMi: Optimizing Data Mixtures Speeds Up Language Model
Pretraining") — learn per-domain sampling weights by running Group DRO
with a small proxy model against a reference model trained on the
uniform mixture, then output the AVERAGE of the domain-weight
trajectory (the paper's estimator; Algorithm 1).

The published loop, per step ``t``:

1. per-domain **excess loss** ``e_d = max(0, L_proxy(d) − L_ref(d))``
   (mean over the domain's examples),
2. multiplicative-weights ascent on the domain simplex:
   ``α'_d ∝ α_d · exp(η·e_d)``, then smoothing
   ``α_d ← (1−c)·α'_d/Σα' + c/D``,
3. a proxy-model descent step on the α-weighted objective
   ``Σ_d α_d · mean_{i∈d} ℓ_i``.

This implementation instantiates the proxy/reference pair with the
engine's hashed-n-gram logistic regression
(:mod:`~orientdb_etl_spark.functions.quality_clf` — the same
full-batch-GD, integer-pinned trainer), so the WHOLE trajectory —
reference training, per-doc losses, domain weights, proxy updates — is
deterministic on any cluster layout and replayable in SQL. DoReMi's
optimizer is exactly this Group-DRO loop regardless of the inner model;
any per-example differentiable loss plugs in.

Integer-pinning discipline (cross-row sums are integers; per-row scalar
double ops are layout-free):

- per-doc logistic loss pinned to micro-nats
  (``l_micro = round(ℓ·1e6)`` BIGINT) before the per-domain sum;
- domain weights live as nano-units (``a_nano`` BIGINT, ``Σ≈1e9``):
  the multiplicative update is rounded per domain BEFORE the simplex
  normalization, so the normalizer is an INTEGER sum;
- the α-weighted gradient is pinned per (domain, bucket) —
  ``round(a·S_db/m_d)`` with ``S_db`` an integer sum of the per-doc
  pinned gradients — then integer-summed over domains.

Scale shape at 100 TB: the corpus feature table is built ONCE and
cached (2 consumers per DRO step + the loss pass); all iteration state
is bounded — weights ``buckets+1`` rows, domain weights ``D`` rows,
per-(domain, bucket) gradient partials ``D·(buckets+1)`` rows, all
map-side combining. No driver loop over data; ``eager=True`` pins the
bounded state driver-side per step (the k-means-centroids pattern) and
releases every cache before returning.

No counterpart in the reference; training-data-pipeline extension per
SURVEY §2.8 (the mixture-planning family's trained-model member, next
to the static UniMax/temperature allocators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orientdb_etl_spark.functions.quality_clf import (
    hashed_doc_features,
    train_quality_classifier,
)


def _doc_losses(feats: DataFrame, w: DataFrame) -> DataFrame:
    """Per-doc ``(_id, _p, l_micro)`` under weight table ``w``:
    ``_p = σ(Σ w·k/(1e9·n))`` and the logistic loss pinned to integer
    micro-nats. The inner product is an integer sum; the sigmoid/log
    are per-row scalar doubles on deterministic inputs."""
    m = (
        feats.join(F.broadcast(w), "b")
        .groupBy("_id", "y", "n")
        .agg(F.sum(F.col("w_nano") * F.col("k")).alias("_dot"))
        .withColumn(
            "_m", F.col("_dot").cast("double") / (F.lit(1e9) * F.col("n"))
        )
    )
    # ℓ = ln(1+exp(−(2y−1)·m)); y∈{0,1}
    loss = F.log(
        F.lit(1.0)
        + F.exp(-(F.lit(2.0) * F.col("y") - F.lit(1.0)) * F.col("_m"))
    )
    return m.select(
        "_id",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_m")))).alias("_p"),
        F.round(loss * F.lit(1e6)).cast("bigint").alias("l_micro"),
    )


def doremi_mixture(
    train: DataFrame,
    domain_col: str,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    seed: int = 11,
    n_max: int = 2,
    ref_iters: int = 2,
    iters: int = 3,
    lr: float = 0.5,
    eta: float = 1.0,
    smooth: float = 0.1,
    round_to: int = 6,
    eager: bool = False,
) -> DataFrame:
    """Run DoReMi and return one row per domain:
    ``(domain_col, n_docs, excess_last, alpha_final, alpha)`` where
    ``alpha`` is the trajectory average over steps 0..``iters``
    including the uniform start (the paper's estimator — the weights to
    train the full-size model with), ``alpha_final`` the
    last step's weights, and ``excess_last`` the final per-domain
    excess loss in nats (diagnostics: which domains the proxy still
    finds hard). ``label_col`` must be 0/1; docs with empty text carry
    no features and drop out of both models, exactly as in
    :func:`~orientdb_etl_spark.functions.quality_clf.
    train_quality_classifier`.

    ``smooth`` is the paper's uniform-mixing ``c`` (default 0.1 there;
    kept explicit here), ``eta`` the multiplicative-weights step size.
    ``ref_iters`` GD steps train the uniform-mixture reference model
    first; ``iters`` Group-DRO steps follow.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not 0 <= smooth < 1:
        raise ValueError(f"smooth must be in [0, 1), got {smooth}")
    if eta <= 0:
        raise ValueError(f"eta must be > 0, got {eta}")
    spark = train.sparkSession

    feats = hashed_doc_features(
        train, text_col, id_col, buckets, seed, n_max, label_col=label_col
    ).cache()  # 2·iters + 2 consumers below
    dom = (
        train.select(
            F.col(id_col).alias("_id"),
            F.col(domain_col).alias("_d"),
        )
        .join(feats.select("_id").distinct(), "_id")
        .cache()
    )  # feature-bearing docs only — loss/gradient means match the models
    per_dom = dom.groupBy("_d").agg(F.count(F.lit(1)).alias("m_docs"))
    n_domains = per_dom.count()  # bounded: domain-count
    if n_domains == 0:
        raise ValueError("train corpus has no feature-bearing documents")

    def _pin(frame: DataFrame) -> DataFrame:
        return spark.createDataFrame(frame.collect(), frame.schema)

    # reference model on the uniform mixture (plain full-batch GD)
    w_ref = train_quality_classifier(
        train,
        label_col,
        text_col,
        id_col,
        buckets,
        seed,
        n_max,
        iters=ref_iters,
        lr=lr,
        eager=eager,
    )
    ref_dom = (
        _doc_losses(feats, w_ref)
        .join(dom, "_id")
        .groupBy("_d")
        .agg(F.sum("l_micro").alias("ref_sum"))
        .join(per_dom, "_d")
    )
    ref_dom = _pin(ref_dom) if eager else ref_dom.cache()

    grid = spark.range(buckets + 1).select(
        F.col("id").cast("int").alias("b")
    )
    w = grid.select("b", F.lit(0).cast("bigint").alias("w_nano"))
    # α₀ = uniform, in nano-units
    a0 = int(round(1e9 / n_domains))
    alpha = per_dom.select(
        "_d", F.lit(a0).cast("bigint").alias("a_nano")
    )
    alpha = _pin(alpha) if eager else alpha.cache()
    acc = alpha.select("_d", F.col("a_nano").alias("acc_nano"))
    excess = None
    for _ in range(iters):
        # the per-doc loss table has TWO corpus-sized consumers this
        # step (the excess aggregation and the gradient join) and a
        # third at return (the final excess row) — cache it so each
        # step pays ONE loss shuffle, not two, and the final output
        # doesn't replay the last step from scratch
        losses = _doc_losses(feats, w).join(dom, "_id").cache()
        # per-domain excess loss vs the reference (nats, ≥ 0)
        excess = (
            losses.groupBy("_d")
            .agg(F.sum("l_micro").alias("p_sum"))
            .join(ref_dom, "_d")
            .select(
                "_d",
                "m_docs",
                F.greatest(
                    (
                        F.col("p_sum") - F.col("ref_sum")
                    ).cast("double")
                    / (F.lit(1e6) * F.col("m_docs")),
                    F.lit(0.0),
                ).alias("e"),
            )
        )
        # D rows — pinning it here makes the alpha update AND the final
        # output read the materialized row set instead of re-deriving
        # the loss pass (the same k-means-centroids discipline)
        excess = _pin(excess) if eager else excess.cache()
        # multiplicative weights: pin the raw update per domain, then
        # normalize over the INTEGER total and re-pin after smoothing
        raw = excess.join(F.broadcast(alpha), "_d").select(
            "_d",
            "m_docs",
            "e",
            F.round(
                F.col("a_nano").cast("double") * F.exp(F.lit(eta) * F.col("e"))
            )
            .cast("bigint")
            .alias("raw_nano"),
        )
        tot = raw.agg(F.sum("raw_nano").alias("t_nano"))
        alpha = raw.crossJoin(F.broadcast(tot)).select(
            "_d",
            F.round(
                (
                    F.lit(1.0 - smooth)
                    * F.col("raw_nano").cast("double")
                    / F.col("t_nano")
                    + F.lit(smooth / n_domains)
                )
                * F.lit(1e9)
            )
            .cast("bigint")
            .alias("a_nano"),
        )
        # non-eager: each iteration's bounded state stays cached for the
        # session (acc/out lineage references every step — the trainer's
        # documented trade-off); eager pins and leaves nothing persisted
        alpha = _pin(alpha) if eager else alpha.cache()
        acc = (
            acc.join(alpha, "_d")
            .select(
                "_d", (F.col("acc_nano") + F.col("a_nano")).alias("acc_nano")
            )
        )
        # proxy descent on the α-weighted objective: per-(domain,bucket)
        # integer partials, α/m_d-scaled and re-pinned, integer-summed
        grads = (
            feats.join(losses.select("_id", "_p"), "_id")
            .join(dom, "_id")
            .select(
                "_d",
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
            .groupBy("_d", "b")
            .agg(F.sum("_g").alias("s_db"))
            .join(F.broadcast(alpha), "_d")
            .join(F.broadcast(per_dom), "_d")
            .select(
                "b",
                F.round(
                    F.col("a_nano").cast("double")
                    / F.lit(1e9)
                    * F.col("s_db").cast("double")
                    / F.col("m_docs")
                )
                .cast("bigint")
                .alias("g_part"),
            )
            .groupBy("b")
            .agg(F.sum("g_part").alias("_G"))
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
                    ).cast("bigint")
                ).alias("w_nano"),
            )
        )
        w = _pin(w) if eager else w.cache()
        if eager:
            # alpha and w are pinned — nothing references this step's
            # loss cache anymore (excess is pinned too); release it
            losses.unpersist()
    out = (
        excess.join(alpha, "_d")
        .join(acc, "_d")
        .select(
            F.col("_d").alias(domain_col),
            F.col("m_docs").alias("n_docs"),
            F.round(F.col("e"), round_to).alias("excess_last"),
            F.round(F.col("a_nano") / F.lit(1e9), round_to).alias(
                "alpha_final"
            ),
            F.round(
                F.col("acc_nano") / F.lit(1e9 * (iters + 1)), round_to
            ).alias("alpha"),
        )
    )
    if eager:
        out = _pin(out)
        feats.unpersist()
        dom.unpersist()
    return out
