"""Hybrid retrieval: reciprocal-rank fusion of lexical (BM25) and dense
(embedding cosine) candidate lists.

The standard first-stage retrieval stack for RAG / training-data mining
runs BOTH a lexical ranker and a dense ranker and fuses them with RRF
(Cormack et al. SIGIR'09): ``score(d) = Σ_lists 1 / (k + rank_list(d))``.
RRF needs only ranks — no score calibration between heterogeneous rankers
— which is also what makes it exactly replayable cross-engine.

Scale shape at 100 TB: all corpus-sized work happens inside the two
candidate generators, each already scan-optimal (BM25: one scan + one
scalar broadcast, corpus never shuffles — functions/text.py; dense: exact
``TakeOrderedAndProject`` or any ANN variant from functions/similarity.py).
Fusion itself sees only the candidate lists — ``depth`` rows per list,
thousands at most — so its single-partition rank windows and full-outer
join are driver-scale by construction, not a scaling surface.

No counterpart in the reference; north-star extension per SURVEY §2.8.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    ranked_lists: Sequence[tuple[DataFrame, str, Sequence]],
    k: int = 10,
    k_rrf: int = 60,
) -> DataFrame:
    """Fuse candidate lists with reciprocal-rank fusion.

    Each entry is ``(df, id_col, order_by)``: a bounded candidate list
    (ALREADY truncated to its retrieval depth — this function ranks and
    fuses, it does not scan corpora) whose rank is ``row_number()`` over
    ``order_by``. Returns ``(doc_id, rrf_score, rank_0..rank_{n-1})``
    — per-list ranks NULL where a document is absent from that list —
    top ``k`` by fused score, ties broken by id.

    The rank windows are global (no partition key): correct and cheap
    because the inputs are depth-bounded lists, not tables."""
    if not ranked_lists:
        raise ValueError("ranked_lists must be non-empty")
    fused: DataFrame | None = None
    for i, (df, id_col, order_by) in enumerate(ranked_lists):
        w = Window.orderBy(*order_by)
        r = df.select(
            F.col(id_col).alias("doc_id"),
            F.row_number().over(w).alias(f"rank_{i}"),
        )
        fused = r if fused is None else fused.join(r, "doc_id", "full_outer")
    # fixed left-to-right addition order: the oracle replays the same
    # association so the IEEE sums are bit-identical
    score = None
    for i in range(len(ranked_lists)):
        term = F.coalesce(
            F.lit(1.0) / (F.lit(float(k_rrf)) + F.col(f"rank_{i}")),
            F.lit(0.0),
        )
        score = term if score is None else score + term
    return (
        fused.withColumn("rrf_score", score)
        .orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def hybrid_topk(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    embeddings: DataFrame,
    vec_col: str,
    vec_id_col: str,
    query_terms: list[str],
    query_vec: Sequence[float],
    k: int = 10,
    depth: int = 50,
    k_rrf: int = 60,
) -> DataFrame:
    """BM25 + exact-cosine hybrid top-k via RRF.

    Ranks use 4-dp-rounded scores with id tiebreaks (rank stability
    across engines/float paths); swap :func:`~orientdb_etl_spark.
    functions.similarity.brute_force_topk` for an LSH/IVF/PQ variant at
    corpus scale — the fusion contract only needs (id, score) lists."""
    from orientdb_etl_spark.functions.similarity import brute_force_topk
    from orientdb_etl_spark.functions.text import bm25_scores

    lex = bm25_scores(docs, text_col, id_col, query_terms, k=depth)
    den = brute_force_topk(
        embeddings, vec_col, vec_id_col, query_vec, k=depth
    ).select(
        F.col(vec_id_col), F.round("cosine_sim", 4).alias("cosine_sim")
    )
    return rrf_fuse(
        [
            (lex, id_col, [F.col("bm25").desc(), F.col(id_col).asc()]),
            (den, vec_id_col,
             [F.col("cosine_sim").desc(), F.col(vec_id_col).asc()]),
        ],
        k=k,
        k_rrf=k_rrf,
    ).select(
        "doc_id",
        "rrf_score",
        F.col("rank_0").alias("bm25_rank"),
        F.col("rank_1").alias("cosine_rank"),
    )


def phrase_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    phrase: str,
) -> DataFrame:
    """Exact phrase search over a positional inverted index — the
    retrieval primitive ``LIKE '%...%'`` cannot express on tokenized
    text (token boundaries) and a full-text scan cannot afford at scale.

    Semantics: whitespace tokenization lowercased (the corpus dialect
    shared with BM25/tf-idf in functions/text.py); a hit at position p
    means token ``p + i`` equals the phrase's i-th token for every slot
    i — overlapping occurrences all count. Returns one row per document
    containing the phrase: ``(id, n_hits, first_pos)`` with 0-based
    ``first_pos``.

    Scale shape: the postings explode is filtered to the PHRASE'S OWN
    tokens before any shuffle (an ``isin`` over k literals, scan-fused)
    — the classic inverted-index access pattern where work is
    proportional to the queried tokens' posting lists, not the corpus.
    ONE groupBy assembles per-document position arrays; adjacency is
    verified with JVM ``array_intersect`` over shift-normalized
    positions (slot i's positions shifted by -i), so a document's
    verification is pure in-partition array math — no per-slot join
    chain, no window, no UDF. 100 TB: partition the postings by token
    (the inverted index a search engine materializes anyway) and the
    single exchange is the grouped assembly of candidate documents; a
    document with no phrase token at all contributes ZERO postings to
    that exchange — the dominant filter is the isin pushdown, which
    drops every non-phrase token at the scan."""
    toks = phrase.lower().split()
    if not toks:
        raise ValueError("phrase must contain at least one token")
    uniq = sorted(set(toks))
    post = (
        df.where(
            F.length(F.trim(F.coalesce(F.col(text_col), F.lit("")))) > 0
        )
        .select(
            F.col(id_col).alias("_id"),
            F.posexplode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("_pos", "_tok"),
        )
        .where(F.col("_tok").isin(uniq))
    )
    grouped = post.groupBy("_id").agg(
        *[
            F.sort_array(
                F.collect_list(
                    F.when(F.col("_tok") == t, F.col("_pos"))
                )
            ).alias(f"_p{j}")
            for j, t in enumerate(uniq)
        ]
    )
    # slot i's start positions = positions of its token shifted by -i;
    # a phrase start is a position in EVERY slot's shifted set
    hits = None
    for i, t in enumerate(toks):
        j = uniq.index(t)
        shifted = F.expr(f"transform(_p{j}, x -> x - {i})")
        hits = shifted if hits is None else F.array_intersect(hits, shifted)
    return (
        grouped.withColumn("_hits", hits)
        .where(F.size("_hits") > 0)
        .select(
            F.col("_id").alias(id_col),
            F.size("_hits").alias("n_hits"),
            F.array_min("_hits").alias("first_pos"),
        )
    )


def phrase_search_sql(
    phrase: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`phrase_search` — an UNROLLED positional
    join chain (anchor postings joined to each subsequent slot at
    ``pos + i``), the textbook relational formulation the array
    intersection is equivalent to. Generated per phrase so the gate can
    hash-check any phrase length."""
    toks = phrase.lower().split()
    if not toks:
        raise ValueError("phrase must contain at least one token")

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    sql = (
        f"WITH arr AS (SELECT {id_col} AS d, regexp_split_to_array("
        f"lower(trim({text_col})), '\\s+') AS a FROM {table} "
        f"WHERE length(trim(coalesce({text_col}, ''))) > 0), "
        "p AS (SELECT d, unnest(a) AS tok, unnest(range(len(a))) AS pos "
        "FROM arr), "
        f"h AS (SELECT a0.d, a0.pos FROM (SELECT d, pos FROM p WHERE "
        f"tok = {q(toks[0])}) a0"
    )
    for i, t in enumerate(toks[1:], start=1):
        sql += (
            f" JOIN p p{i} ON p{i}.d = a0.d AND p{i}.pos = a0.pos + {i} "
            f"AND p{i}.tok = {q(t)}"
        )
    sql += (
        f") SELECT d AS {id_col}, count(*) AS n_hits, "
        "min(pos) AS first_pos FROM h GROUP BY 1"
    )
    return sql


def mmr_diversify(
    cands: DataFrame,
    id_col: str,
    score_col: str,
    vec_col: str,
    k: int = 10,
    lam: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    SIGIR'98) of a BOUNDED candidate list: greedily select ``k`` items
    maximizing ``lam·relevance − (1−lam)·max_cosine_to_selected`` — the
    standard diversification pass after first-stage retrieval (dedup of
    near-identical hits in a RAG context window).

    Determinism discipline (shared with :func:`hybrid_topk`): both the
    MMR objective and the pairwise cosines are rounded to ``round_to``
    BEFORE the argmax, ties broken by ascending id, so any engine
    replaying the same rounded arithmetic selects identically — the
    property the unrolled SQL oracle checks. Prefer a binary-exact
    ``lam`` (0.75, 0.5) so ``lam·s`` folds identically cross-engine.

    Scale shape: MMR is inherently sequential (selection i depends on
    all previous picks), so it ONLY applies to depth-bounded candidate
    lists — like :func:`rrf_fuse`, the corpus-sized work lives in the
    upstream candidate generator. The bounded candidate frame is
    collected ONCE (one Spark job, not one per pick) and the greedy loop
    runs driver-side over plain doubles, replicating the JVM arithmetic
    it replaced exactly: sequential left-fold dot/norm (IEEE-identical
    to the ``aggregate(zip_with(...))`` fold), HALF_UP decimal rounding
    at ``round_to`` (``F.round`` semantics), NaN-greatest ordering for
    genuinely-NaN scores. Degenerate inputs are handled the way the
    ANSI engine handled them, never by silent NaN promotion: a
    zero-norm/empty/NULL vector has similarity 0.0, a NULL score sorts
    last (desc NULLS LAST), and the ascending-id tie-break is
    None-safe (NULL ids first, Spark asc default).

    Returns ``(mmr_rank, id, score)`` for the ``k`` picks (fewer if the
    list is exhausted)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    if not (0.0 <= lam <= 1.0):
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    rows = cands.select(
        F.col(id_col).alias("_id"),
        F.col(score_col).cast("double").alias("_score"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).collect()

    quantum = Decimal(1).scaleb(-int(round_to))

    def rnd(x: float) -> float:
        # F.round on a double: BigDecimal(toString).setScale(HALF_UP) —
        # repr() is the same shortest round-trip decimal
        if math.isnan(x) or math.isinf(x):
            return x
        return float(Decimal(repr(x)).quantize(quantum, ROUND_HALF_UP))

    def cos(u: "list[float]", v: "list[float]", v_norm: float) -> float:
        # sequential fold, NOT pairwise summation: bit-identical to the
        # JVM aggregate() left-fold the Spark expression used
        dot = 0.0
        for a, b in zip(u, v):
            dot += a * b
        un = 0.0
        for a in u:
            un += a * a
        denom = math.sqrt(un) * v_norm
        if denom == 0.0:
            # zero-norm / empty / NULL vector: similarity is DEFINED as
            # 0.0. The Spark expression this replaced never produced a
            # comparable value here (it raised under ANSI, yielded NULL
            # — ignored by greatest() — otherwise); returning NaN would
            # silently promote the degenerate candidate because NaN
            # sorts as the largest double in the desc objective order.
            return 0.0
        return dot / denom

    def beats(obj_a, id_a, obj_b, id_b) -> bool:
        # Spark desc NULLS LAST: a NULL objective (NULL score) loses to
        # any non-NULL one; a genuinely-NaN score still sorts as the
        # LARGEST double (Spark ordering); ties break by ascending id
        # with NULL ids first (Spark asc default), None-safely
        if (obj_a is None) != (obj_b is None):
            return obj_b is None
        if obj_a is not None:
            a_nan, b_nan = math.isnan(obj_a), math.isnan(obj_b)
            if a_nan != b_nan:
                return a_nan
            if not a_nan and obj_a != obj_b:
                return obj_a > obj_b
        return (id_a is not None, id_a) < (id_b is not None, id_b)

    lam = float(lam)
    cand = [
        {
            "id": r["_id"],
            "score": None if r["_score"] is None else float(r["_score"]),
            "v": [float(x) for x in (r["_v"] or [])],
            "ms": 0.0,
        }
        for r in rows
    ]
    picks = []
    for rank in range(1, k + 1):
        best = None
        for c in cand:
            obj = (
                None
                if c["score"] is None
                else rnd(lam * c["score"] - (1.0 - lam) * c["ms"])
            )
            if best is None or beats(obj, c["id"], best[0], best[1]["id"]):
                best = (obj, c)
        if best is None:
            break
        p = best[1]
        picks.append((rank, p["id"], p["score"]))
        cand = [c for c in cand if c["id"] != p["id"]]
        if rank < k and cand:
            pv = p["v"]
            pn = 0.0
            for a in pv:
                pn += a * a
            pn = pn**0.5
            for c in cand:
                # cos() is NaN-free (zero-denominator → 0.0), so ms
                # stays a plain running max of finite similarities
                s = rnd(cos(c["v"], pv, pn)) if pn > 0 else 0.0
                c["ms"] = max(c["ms"], s)
    spark = cands.sparkSession
    id_type = cands.schema[id_col].dataType.simpleString()
    out = spark.createDataFrame(
        picks, f"mmr_rank int, {id_col} {id_type}, {score_col} double"
    )
    return out
