"""Passage-level (exact-substring) duplicate detection/removal
(functions/passages.py — the hash-gram approximation of Lee et al.
ACL'22 ExactSubstr dedup)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orientdb_etl_spark.functions.passages import (
    duplicate_passage_stats,
    strip_duplicate_passages,
)

# a 25-token passage shared verbatim by docs 1 and 2, absent from doc 3
P25 = " ".join(f"p{i}" for i in range(25))
UA = " ".join(f"a{i}" for i in range(10))
UB = " ".join(f"b{i}" for i in range(10))
UC = " ".join(f"c{i}" for i in range(40))


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [(1, f"{P25} {UA}"), (2, f"{UB} {P25}"), (3, UC)],
        "doc_id long, text string",
    )


def test_stats_counts_cross_doc_windows_exactly(spark, corpus):
    """With n=20: the shared 25-token passage contributes exactly
    25-20+1 = 6 fully-inside windows per doc; windows straddling the
    passage boundary mix in unique tokens and must NOT count."""
    rows = {
        r.doc_id: r
        for r in duplicate_passage_stats(corpus, n=20).collect()
    }
    assert rows[1].n_grams == 35 - 20 + 1
    assert rows[1].n_dup_grams == 6
    assert rows[2].n_dup_grams == 6
    assert rows[3].n_dup_grams == 0 and rows[3].dup_frac == 0.0
    assert rows[1].dup_frac == round(6 / 16, 4)


def test_stats_portable_twin_matches_hashed(spark, corpus):
    fast = {
        (r.doc_id, r.n_grams, r.n_dup_grams)
        for r in duplicate_passage_stats(corpus, n=20, portable=False).collect()
    }
    port = {
        (r.doc_id, r.n_grams, r.n_dup_grams)
        for r in duplicate_passage_stats(corpus, n=20, portable=True).collect()
    }
    assert fast == port


def test_strip_removes_shared_passage_only(spark, corpus):
    out = {r.doc_id: r for r in strip_duplicate_passages(corpus, n=20).collect()}
    # the full 25-token passage disappears from BOTH docs as one span
    assert out[1].text == UA and out[1].n_tokens_removed == 25
    assert out[2].text == UB and out[2].n_tokens_removed == 25
    assert out[3].text == UC and out[3].n_tokens_removed == 0


def test_strip_keeps_short_docs_untouched(spark):
    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in strip_duplicate_passages(df, n=20).collect()}
    # both docs are shorter than one window — no grams, nothing removed
    assert out[1].text == "tiny doc" and out[1].n_tokens_removed == 0
    assert len(out) == 2


def test_same_doc_repetition_does_not_count_as_cross_doc(spark):
    rep = " ".join(["x"] * 60)  # one doc repeating itself
    df = spark.createDataFrame(
        [(1, rep), (2, " ".join(f"y{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in duplicate_passage_stats(df, n=20).collect()}
    assert rows[1].n_dup_grams == 0  # min_docs=2 needs DISTINCT docs
    assert rows[2].n_dup_grams == 0


def test_passages_config_transformer(spark, corpus):
    from orientdb_etl_spark import Pipeline

    out = (
        Pipeline(
            {
                "extractor": {"table": {"name": "docs"}},
                "transformers": [{"passages": {"n": 20, "mode": "strip"}}],
            },
            spark=spark,
        )
        .register_table("docs", corpus)
        .compile()
        .collect()
    )
    assert {r.doc_id: r.n_tokens_removed for r in out} == {1: 25, 2: 25, 3: 0}


def test_stride_bounds_blowup(spark, corpus):
    """stride=5: gram positions are 1,6,11,... — ~5x fewer rows exploded;
    detection still fires on the aligned subset of windows."""
    rows = {
        r.doc_id: r for r in duplicate_passage_stats(corpus, n=20, stride=5).collect()
    }
    assert rows[1].n_grams == 4  # positions 1,6,11,16
    assert rows[1].n_dup_grams >= 1


def test_strip_preserves_untouched_documents_byte_identical(spark):
    """Documents with nothing to strip must come back with their ORIGINAL
    bytes (tabs/newlines/multi-spaces intact), and originally-empty/NULL
    docs pass through instead of vanishing; only docs emptied BY the
    stripping drop."""
    from orientdb_etl_spark.functions.passages import strip_duplicate_passages

    shared = " ".join(f"tok{i}" for i in range(25))
    weird = "keep\tthese   exact\n\nbytes here"
    docs = spark.createDataFrame(
        [
            (0, shared + " unique tail zero"),
            (1, shared + " other ending one"),
            (2, weird),            # untouched -> byte-identical
            (3, ""),               # originally empty -> passes through
            (4, None),             # NULL -> passes through
            (5, shared),           # fully covered -> dropped
            (6, shared),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in strip_duplicate_passages(
        docs, "text", "doc_id", n=20
    ).collect()}
    assert out[2].text == weird and out[2].n_tokens_removed == 0
    assert out[3].text == "" and out[3].n_tokens_removed == 0
    assert out[4].text is None and out[4].n_tokens_removed == 0
    assert 5 not in out and 6 not in out  # emptied by stripping
    assert out[0].n_tokens_removed == 25 and "unique" in out[0].text
