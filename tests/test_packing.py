"""Sequence packing (concat-and-chunk offsets + whole-doc FFD)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from orientdb_etl_spark.functions.packing import (
    pack_greedy,
    pack_offsets,
    pack_utilization,
)


@pytest.fixture()
def docs(spark):
    # token lengths spanning tiny..oversized, two deterministic shards
    rows = [(i, (i * 37) % 130 + 1) for i in range(200)]
    rows.append((500, 600))  # oversized doc (> capacity below)
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_pack_offsets_prefix_sum_layout(docs):
    out = pack_offsets(
        docs, capacity=256, shard_col=(F.col("doc_id") % 2).alias("shard")
    ).collect()
    by_shard: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.shard, r.doc_id)):
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) == {0, 1}
    for rows in by_shard.values():
        expect_off = 0
        for r in rows:
            # contiguous layout: each doc starts where the previous ended
            assert r.start_off == expect_off
            assert r.seq_first == r.start_off // 256
            assert r.seq_last == (r.start_off + r.n_tokens - 1) // 256
            expect_off += r.n_tokens
    # the oversized doc spans multiple sequences rather than erroring
    big = next(r for r in out if r.doc_id == 500)
    assert big.seq_last - big.seq_first >= 2


def test_pack_offsets_drops_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, 7)], "doc_id long, n_tokens long"
    )
    out = pack_offsets(df, capacity=16, n_shards=1)
    assert sorted(r.doc_id for r in out.collect()) == [1, 3]


def test_pack_greedy_invariants(docs):
    cap = 256
    out = pack_greedy(
        docs, capacity=cap, shard_col=(F.col("doc_id") % 2).alias("shard")
    ).collect()
    # every non-empty doc assigned exactly once
    assert sorted(r.doc_id for r in out) == sorted(r.doc_id for r in docs.collect())
    packs: dict[tuple, int] = {}
    for r in out:
        packs[(r.shard, r.pack_id)] = packs.get((r.shard, r.pack_id), 0) + r.n_tokens
        assert r.pack_tokens >= r.n_tokens
    for (shard, pid), tot in packs.items():
        members = [r for r in out if (r.shard, r.pack_id) == (shard, pid)]
        assert all(r.pack_tokens == tot for r in members)
        # capacity respected unless a single oversized doc owns the pack
        if tot > cap:
            assert len(members) == 1 and members[0].n_tokens > cap


def test_pack_greedy_deterministic(docs):
    a = pack_greedy(docs, capacity=256, n_shards=4).collect()
    b = pack_greedy(docs, capacity=256, n_shards=4).collect()
    key = lambda r: (r.shard, r.doc_id)
    assert sorted(a, key=key) == sorted(b, key=key)


def test_pack_greedy_beats_naive_utilization(docs):
    cap = 256
    packed = pack_greedy(docs, capacity=cap, n_shards=2)
    util = pack_utilization(packed, cap).collect()
    # FFD should fill packs well on smooth length mixes: mean fill > 0.7
    assert all(u.mean_fill > 0.7 for u in util)
    total_tokens = docs.agg(F.sum("n_tokens")).collect()[0][0]
    n_packs = sum(u.n_packs for u in util)
    # lower bound: can't use fewer than ceil(total/cap) packs overall
    assert n_packs >= -(-total_tokens // cap) // 2  # per-shard split slack
