"""Kneser-Ney bigram language model + CCNet-style perplexity filtering.

The CCNet pipeline (Wenzek et al., LREC 2020) filters a web crawl by the
perplexity of each document under a KenLM n-gram model trained on a
high-quality reference corpus (Wikipedia), then splits the crawl into
``head`` / ``middle`` / ``tail`` perplexity tertiles. This module is that
filter re-expressed as relational algebra: interpolated Kneser-Ney
(Kneser & Ney, ICASSP 1995; Chen & Goodman, 1998) with a single absolute
discount ``D``:

    P_KN(w | v) = (c(v,w) - D)⁺ / c(v,·)  +  D·N1+(v,·)/c(v,·) · P_cont(w)
    P_cont(w)   = (N1+(·,w) + 1) / (N1+(·,·) + V + 1)

where ``N1+`` are the distinct-bigram continuation counts and ``P_cont``
carries +1/(V+1) Laplace mass so out-of-vocabulary continuations keep
full support (an OOV word scores as one unseen type). A context ``v``
never seen in training backs off entirely to ``P_cont(w)``.

Model "training" is three hash aggregations over the reference corpus's
bigram stream (pair counts, per-context totals + distinct-continuation
counts, per-word continuation counts) — no iteration, no state beyond
count tables. Scoring groups the target corpus's bigrams per (doc, v, w)
FIRST (so each distinct pair is model-joined once, not once per
occurrence), left-joins the three count tables, and pins each pair's log
probability to an exact integer in micro-nats
(``round(ln P · 1e6)``) so the per-document sums are integer arithmetic —
order-free across Spark/DuckDB aggregation orders, the same discipline as
:mod:`~orientdb_etl_spark.functions.dsir`.

Scale shape at 100 TB: the reference corpus is small by design (CCNet
uses Wikipedia); its three count tables are vocabulary/bigram-type-sized.
The crawl is touched once; the three scoring joins are token-keyed hash
joins with Zipfian hot keys (stopword contexts) — the standard AQE
skew-join case — and every aggregation partial-combines map-side. Bucket
assignment has two modes: explicit ``cutoffs`` (the production path —
CCNet computes cutoffs once on a sample and applies them as constants;
pure per-row CASE, zero extra shuffle) and auto-calibration (exact
interpolated percentile cutoffs at 1/3 and 2/3 — ONE ``percentile``
aggregate whose buffer is distinct-4dp-ppl-sized, then a 1-row broadcast
and a per-row CASE; no global rank window anywhere). Value-based cutoffs
are also CCNet's actual semantics: documents with equal perplexity share
a bucket, and an interpolated cutoff falls strictly between adjacent
data values, so the split is insensitive to last-ulp interpolation
differences across engines.

No counterpart in the reference (360-Innovations/orientdb-etl has no
analytics surface); training-data-pipeline extension per SURVEY §2.8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Classic absolute-discount default (Chen & Goodman's D = n1/(n1+2·n2)
#: lands near 0.75 on natural-language bigram tables).
DEFAULT_DISCOUNT = 0.75


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per (id, prev-token, token) consecutive pair — lowercased
    whitespace tokens, docs with < 2 tokens emit nothing. The pair list
    is built as one per-row array expression (no window, no shuffle)."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.split(
            F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
        ).alias("_t"),
    ).select("_id", F.array_remove("_t", "").alias("_t"))
    return (
        toks.filter(F.size("_t") >= 2)
        .select(
            "_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_t) - 1), "
                    "i -> struct(element_at(_t, i) AS v, "
                    "element_at(_t, i + 1) AS w))"
                )
            ).alias("_bg"),
        )
        .select("_id", F.col("_bg.v").alias("_v"), F.col("_bg.w").alias("_w"))
    )


def kn_bigram_model(
    train: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict[str, DataFrame]:
    """Count tables of an interpolated-KN bigram model over ``train``:

    - ``pairs``:  (_v, _w, cb)          observed bigram counts
    - ``ctx``:    (_v, cctx, n1p)       context total + distinct continuations
    - ``cont``:   (_w, ccont)           distinct contexts w continues
    - ``totals``: 1 row (n1pp, vsize)   total bigram types, unigram vocab size

    Pure counts — the discount is applied at scoring time so one trained
    model serves any ``D``. All three tables are bigram-type-bounded
    (vocabulary-scale, not corpus-scale)."""
    bg = _doc_bigrams(train, text_col, id_col)
    pairs = bg.groupBy("_v", "_w").agg(F.count(F.lit(1)).alias("cb"))
    ctx = pairs.groupBy("_v").agg(
        F.sum("cb").alias("cctx"), F.count(F.lit(1)).alias("n1p")
    )
    cont = pairs.groupBy("_w").agg(F.count(F.lit(1)).alias("ccont"))
    vocab = bg.select(F.col("_v").alias("_tok")).union(
        bg.select(F.col("_w").alias("_tok"))
    )
    totals = pairs.agg(F.count(F.lit(1)).alias("n1pp")).crossJoin(
        F.broadcast(
            vocab.agg(F.count_distinct("_tok").alias("vsize"))
        )
    )
    return {"pairs": pairs, "ctx": ctx, "cont": cont, "totals": totals}


def _pair_logprob_micro(discount: float) -> F.Column:
    """Integer micro-nat log P_KN of one (v, w) pair given joined count
    columns cb/cctx/n1p/ccont/n1pp/vsize (NULL cb/ccont = unseen;
    NULL cctx = unseen context → pure continuation backoff)."""
    d = float(discount)
    pc = (F.coalesce(F.col("ccont"), F.lit(0)) + F.lit(1)).cast(
        "double"
    ) / (F.col("n1pp") + F.col("vsize") + F.lit(1)).cast("double")
    seen_ctx = (
        F.greatest(
            F.coalesce(F.col("cb"), F.lit(0)).cast("double") - F.lit(d),
            F.lit(0.0),
        )
        + F.lit(d) * F.col("n1p").cast("double") * pc
    ) / F.col("cctx").cast("double")
    lp = F.when(F.col("cctx").isNull(), F.log(pc)).otherwise(
        F.log(seen_ctx)
    )
    return F.round(lp * F.lit(1e6)).cast("bigint")


def kn_perplexity(
    df: DataFrame,
    train: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = DEFAULT_DISCOUNT,
) -> DataFrame:
    """Per-document perplexity of ``df`` under an interpolated-KN bigram
    model trained on ``train`` — the CCNet/KenLM quality signal. Returns
    ``(id_col, n_bigrams, mean_lp_micro, ppl)`` where ``mean_lp_micro``
    is the exact integer-sum mean log-probability in micro-nats (the
    deterministic sort key downstream bucketing uses) and
    ``ppl = round(exp(-mean_lp), 4)``. Docs with < 2 tokens emit no row
    (no bigram evidence).

    Each distinct (doc, v, w) pair is scored once with its occurrence
    count ``k``; the doc sum is ``Σ k·lp_micro`` — integer, order-free,
    replayed bit-for-bit by the DuckDB oracle."""
    if not (0.0 < discount < 1.0):
        raise ValueError(f"discount must be in (0,1), got {discount}")
    m = kn_bigram_model(train, text_col, id_col)
    occ = (
        _doc_bigrams(df, text_col, id_col)
        .groupBy("_id", "_v", "_w")
        .agg(F.count(F.lit(1)).alias("_k"))
    )
    scored = (
        occ.join(m["pairs"], ["_v", "_w"], "left")
        .join(m["ctx"], "_v", "left")
        .join(m["cont"], "_w", "left")
        .crossJoin(F.broadcast(m["totals"]))
        .select(
            "_id",
            "_k",
            _pair_logprob_micro(discount).alias("_lpm"),
        )
    )
    return (
        scored.groupBy("_id")
        .agg(
            F.sum("_k").alias("n_bigrams"),
            F.sum(F.col("_k") * F.col("_lpm")).alias("_s"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_bigrams",
            F.round(
                F.col("_s").cast("double") / F.col("n_bigrams"), 6
            ).alias("mean_lp_micro"),
            F.round(
                F.exp(
                    -F.col("_s").cast("double")
                    / (F.col("n_bigrams") * F.lit(1e6))
                ),
                4,
            ).alias("ppl"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    train: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = DEFAULT_DISCOUNT,
    cutoffs: tuple[float, float] | None = None,
) -> DataFrame:
    """CCNet head/middle/tail split by KN perplexity. Returns
    ``(id_col, n_bigrams, ppl, bucket)``.

    ``cutoffs=(head_max, middle_max)`` is the production path: fixed
    perplexity thresholds (computed once on a sample, exactly as CCNet
    publishes per-language cutoffs) applied as a per-row CASE — no
    ordering, no extra shuffle, arbitrarily wide corpus.

    ``cutoffs=None`` is the calibration path: the two cutoffs are
    computed as the exact interpolated 1/3 and 2/3 percentiles of
    ``ppl`` — one ``percentile`` aggregate (buffer sized by DISTINCT
    4dp-rounded perplexities, not documents) broadcast back as a 1-row
    scalar. Documents with equal perplexity share a bucket (value
    semantics, CCNet's own), and because an interpolated cutoff lands
    strictly between adjacent data values, the assignment is stable
    under last-ulp interpolation differences between engines."""
    ppl = kn_perplexity(df, train, text_col, id_col, discount)

    def _bucketed(lo: F.Column, hi: F.Column) -> F.Column:
        return (
            F.when(F.col("ppl") <= lo, F.lit("head"))
            .when(F.col("ppl") <= hi, F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket")
        )

    if cutoffs is not None:
        lo, hi = float(cutoffs[0]), float(cutoffs[1])
        if not lo < hi:
            raise ValueError(f"cutoffs must be increasing, got {cutoffs}")
        return ppl.select(
            id_col, "n_bigrams", "ppl", _bucketed(F.lit(lo), F.lit(hi))
        )
    cut = ppl.agg(
        F.expr(
            "percentile(ppl, array(0.3333333333333333, "
            "0.6666666666666666))"
        ).alias("_c")
    )
    return ppl.crossJoin(F.broadcast(cut)).select(
        id_col,
        "n_bigrams",
        "ppl",
        _bucketed(F.element_at("_c", 1), F.element_at("_c", 2)),
    )
