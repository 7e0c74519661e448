"""End-to-end corpus curation: the composition a pretraining-data run
actually executes, as one operator — C4 line cleaning → Gopher quality
filter → staged dedup (exact hash, optionally + MinHash-LSH) → token
annotation.

Scale shape: stages 1-2 are pure per-row expressions fused into the scan
(zero shuffles); stage 3 is the linear exact-dedup shuffle plus the
banded LSH machinery of :func:`~orientdb_etl_spark.functions.dedup.
corpus_dedup_pipeline`; stage 4 is a projection. The only shuffles in
the whole pipeline are the dedup stages'.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orientdb_etl_spark.functions.dedup import corpus_dedup_pipeline, exact_dedup
from orientdb_etl_spark.functions.text import (
    c4_line_filter,
    gopher_quality_flags,
    token_count,
)

#: Gopher rules that make sense for arbitrary (incl. short) documents;
#: word_count/mean_word_len/stopwords are corpus-dependent knobs.
DEFAULT_QUALITY_RULES: tuple[str, ...] = (
    "symbol_ratio_ok",
    "bullet_ok",
    "ellipsis_ok",
    "alpha_ok",
)


def curate_corpus(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words_per_line: int = 3,
    require_terminal_punct: bool = True,
    quality_rules: Sequence[str] = DEFAULT_QUALITY_RULES,
    near_dup_threshold: float | None = 0.7,
    num_perm: int = 128,
    bands: int = 16,
    strip_span_window: int | None = None,
) -> DataFrame:
    """Curate a raw document table into a training-ready corpus.

    Returns (id, text, n_tokens) where text is line-cleaned, quality
    filtering applied (conjunction of ``quality_rules`` flags), and
    duplicates removed — exact always; near-dup (MinHash-LSH at
    ``near_dup_threshold``) unless the threshold is None (the
    exact-only variant is fully relationally replayable, which the
    contract gate uses). With ``strip_span_window`` set, the surviving
    corpus additionally gets the exact-substring REMEDIATION
    (:func:`~orientdb_etl_spark.functions.dedup.strip_duplicate_spans`
    at that window, Lee et al. ACL'22): duplicated spans the
    document-level dedup cannot see (a lifted passage inside an
    otherwise-unique doc) are rewritten out of every non-owner, and
    docs emptied by the rewrite are dropped. Runs AFTER dedup so the
    span postings are built over the already-collapsed corpus."""
    from orientdb_etl_spark.functions.dedup import ensure_parallelism

    # the line-clean/quality stages are CPU-bound regex/expression work
    # fused into the scan — spread a narrow single-file input first so
    # they use the whole cluster (no-op at real scale). The spread is
    # work-gated (guide §2.4): on inputs too small to amortize the
    # exchange + wide-task scheduling, the repartition measurably LOST
    # (driver r8: 4.76 -> 5.24 s, and 8 cores beat 32 at ratio 0.60),
    # so it only fires past ~1 MiB of input per target partition —
    # still a no-op at real scale, where scans have many splits anyway
    cleaned = (
        ensure_parallelism(df, min_bytes_per_part=1 << 20)
        .withColumn("_c4", c4_line_filter(text_col, min_words_per_line,
                                          require_terminal_punct))
        .filter(F.col("_c4.n_kept") > 0)
        .withColumn(text_col, F.col("_c4.text"))
        .drop("_c4")
    )
    flagged = cleaned.withColumn("_g", gopher_quality_flags(text_col))
    keep = F.lit(True)
    for rule in quality_rules:
        keep = keep & F.col(f"_g.{rule}")
    filtered = flagged.filter(keep).drop("_g")
    if near_dup_threshold is None:
        deduped = exact_dedup(filtered, [text_col], tie_break=id_col)
    else:
        deduped = corpus_dedup_pipeline(
            filtered, text_col, id_col,
            num_perm=num_perm, bands=bands, threshold=near_dup_threshold,
        )
    if strip_span_window is not None:
        from orientdb_etl_spark.functions.dedup import strip_duplicate_spans

        deduped = strip_duplicate_spans(
            deduped, text_col, id_col, window=strip_span_window
        ).where(F.length(text_col) > 0)
    return deduped.select(
        id_col, text_col, token_count(text_col).alias("n_tokens")
    )
