"""Benchmark decontamination (token n-gram overlap vs an eval set)."""

from __future__ import annotations

from pyspark.sql import functions as F

from orientdb_etl_spark.functions.decontam import decontaminate, token_ngram_array


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text with no overlap here at all"),
            (3, "prefix words then the quick brown fox appears again"),
            (4, "short doc"),
            (5, None),
        ],
        "doc_id long, text string",
    )


def _eval(spark):
    return spark.createDataFrame(
        [(100, "we test the quick brown fox benchmark phrase")],
        "doc_id long, text string",
    )


def test_ngram_array_boundaries(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",), ("",)], "t string")
    out = [r[0] for r in df.select(token_ngram_array("t", 3)).collect()]
    assert out[0] == ["a b c", "b c d"]
    assert out[1] == []  # fewer tokens than n
    assert out[2] == []


def test_decontaminate_flags_overlapping_docs(spark):
    hits = decontaminate(_corpus(spark), _eval(spark), n=3, mode="hits").collect()
    got = {r.doc_id: r.n_hits for r in hits}
    # docs 1 and 3 contain "the quick brown" / "quick brown fox"
    assert set(got) == {1, 3}
    assert got[1] >= 2 and got[3] >= 2


def test_decontaminate_filter_and_flag(spark):
    kept = decontaminate(_corpus(spark), _eval(spark), n=3, mode="filter")
    assert sorted(r.doc_id for r in kept.collect()) == [2, 4, 5]
    flagged = decontaminate(_corpus(spark), _eval(spark), n=3, mode="flag")
    fm = {r.doc_id: r.contaminated for r in flagged.collect()}
    assert fm == {1: True, 2: False, 3: True, 4: False, 5: False}


def test_decontaminate_high_n_no_hits(spark):
    hits = decontaminate(_corpus(spark), _eval(spark), n=13, mode="hits")
    assert hits.count() == 0


def test_decontaminate_broadcast_plan(spark):
    df = decontaminate(_corpus(spark), _eval(spark), n=3, mode="hits")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # corpus side never shuffles for the join


# ---------------------------------------------------------------------------
# Bloom pre-pass variant


def test_bloom_decontaminate_equals_exact(spark):
    """Bloom pre-pass must be invisible in the result: identical hits to
    the plain broadcast path on the fixture split (no false negatives by
    construction; false positives die in the verify join)."""
    from orientdb_etl_spark.functions.decontam import (
        bloom_decontaminate,
        decontaminate,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    eval_df = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    exact = {
        (r.doc_id, r.n_hits)
        for r in decontaminate(corpus, eval_df, n=3, mode="hits").collect()
    }
    bloom = {
        (r.doc_id, r.n_hits)
        for r in bloom_decontaminate(
            corpus, eval_df, n=3, mode="hits", m_bits=1 << 20, k=5
        ).collect()
    }
    assert bloom == exact and len(exact) > 0
    # filter mode round-trips too
    kept = bloom_decontaminate(
        corpus, eval_df, n=3, mode="filter", m_bits=1 << 20, k=5
    )
    assert kept.count() == corpus.count() - len(exact)


def test_bloom_bitmap_prunes_clean_grams(spark):
    """On disjoint vocabularies the bitmap must reject (nearly) all
    corpus grams — the pre-pass actually prunes, it is not a no-op."""
    from orientdb_etl_spark.functions.decontam import (
        build_gram_bloom,
        exploded_gram_hashes,
    )
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as SF

    eval_df = spark.createDataFrame(
        [(i, f"alpha{i} beta{i} gamma{i} delta{i}") for i in range(50)],
        "doc_id int, text string",
    )
    corpus = spark.createDataFrame(
        [(i, f"zeta{i} eta{i} theta{i} iota{i}") for i in range(200)],
        "doc_id int, text string",
    )
    m, k = 1 << 20, 5
    bits = build_gram_bloom(eval_df, "text", 3, m_bits=m, k=k)
    assert bits.sum() > 0  # something was set
    grams = exploded_gram_hashes(corpus, "text", 3, keep=["doc_id"])
    # probe via the same Spark expressions instead of re-deriving in numpy
    probe = grams.select(
        *[SF.pmod(SF.xxhash64(SF.lit(i), SF.col("_gh")), SF.lit(m)).alias(f"p{i}")
          for i in range(k)]
    ).toPandas()
    ok = np.ones(len(probe), dtype=bool)
    for i in range(k):
        ix = probe[f"p{i}"].to_numpy(dtype=np.int64)
        ok &= (bits[ix >> 3] >> (ix & 7).astype(np.uint8)) & 1 == 1
    # disjoint vocab: false-positive rate at this fill is ~(kG/m)^k ≈ 0
    assert ok.sum() <= len(probe) * 0.01
