"""Record linkage: similarity joins on strings (entity resolution).

:func:`fuzzy_join` matches two tables on an edit-distance predicate
``levenshtein(left.col, right.col) <= d`` WITHOUT the cross join that a
naive similarity join implies. Blocking uses the PassJoin segment scheme
(Li, Deng, Feng — VLDB'11): partition every index-side string into
``d+1`` contiguous segments; by pigeonhole, any string within edit
distance ``d`` must contain at least one segment EXACTLY, at a position
shifted by at most ``d``. The probe side therefore enumerates only the
O(d²) substrings that could equal some segment, and the join runs on
``(candidate_length, segment_idx, segment_text)`` — an equi-join.

The blocking is LOSSLESS (every true pair survives to verification), so
the result is exactly the cross-join-with-filter semantics — which is
what lets the DuckDB oracle verify it with a brute-force join.

Scale shape: index side emits ``d+1`` rows per string, probe side
``O((2d+1)²·(d+1))`` rows per string — constants, not data-dependent
blow-up; ONE equi-join shuffle on the segment key, `distinct` on the
candidate pair stream, then verification with the engine-side
``levenshtein`` (threshold form: abandons a pair's DP early once the
distance exceeds ``d``). No UDFs; everything is generated SQL
expressions inside whole-stage codegen.

Degenerate keys: strings shorter than ``d+1`` produce zero-length
segments (join key ``''``) — they pair with every other short string of
a compatible length, which is bounded by the short-string count, and
losslessness requires keeping them (the untouched pigeonhole segment of
a short string can be the empty one).

No counterpart in the reference (its `merge`/`link` lookups are exact
equi-joins, OMergeTransformer.java:61-101); §2.8 extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fuzzy_join"]


def _index_segments(col: str, d: int) -> str:
    """Index-side segmentation: the even ``d+1``-way split of ``col``.
    base = L div (d+1), rem = L mod (d+1); the LAST ``rem`` segments get
    one extra character. Segment i starts (0-based) at
    ``i*base + max(0, i - k0)`` with ``k0 = d+1-rem``. Emits an array of
    struct(l_len, seg_i, seg)."""
    n = d + 1
    return (
        f"transform(sequence(0, {d}), i -> named_struct("
        f"'l_len', length({col}), "
        "'seg_i', i, "
        f"'seg', substring({col}, "
        f"i * (length({col}) div {n}) "
        f"+ greatest(0, i - ({n} - length({col}) % {n})) + 1, "
        f"(length({col}) div {n}) "
        f"+ if(i >= {n} - length({col}) % {n}, 1, 0))))"
    )


def _probe_segments(col: str, d: int) -> str:
    """Probe-side enumeration: for every candidate index-length
    L in [len-d, len+d] and segment i, the substrings of the segment's
    length at starts within ±d of the segment's home position (clamped
    to the probe string). Empty ranges yield empty arrays (Spark's
    ``sequence(a, b)`` with a > b would DESCEND, not empty — guard it).
    """
    n = d + 1
    m = f"length({col})"
    base = f"(L div {n})"
    k0 = f"({n} - L % {n})"
    seg_len = f"({base} + if(i >= {k0}, 1, 0))"
    start = f"(i * {base} + greatest(0, i - {k0}))"
    lo = f"greatest(0, {start} - {d})"
    hi = f"least({m} - {seg_len}, {start} + {d})"
    inner = (
        f"if({hi} < {lo} or {seg_len} < 0, "
        "array(), "
        f"transform(sequence({lo}, {hi}), p -> named_struct("
        "'l_len', L, 'seg_i', i, "
        f"'seg', substring({col}, p + 1, {seg_len}))))"
    )
    return (
        f"flatten(transform(sequence(greatest({m} - {d}, 0), {m} + {d}), L -> "
        f"flatten(transform(sequence(0, {d}), i -> {inner}))))"
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    left_id: str,
    right_id: str,
    max_dist: int = 1,
    dist_col: str = "dist",
) -> DataFrame:
    """Edit-distance similarity join: all ``(left_id, right_id,
    left_col, right_col, dist)`` with ``levenshtein <= max_dist``.
    Exactly equivalent to the cross join + filter, via lossless PassJoin
    segment blocking (see module docstring). NULL strings never match.
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    d = int(max_dist)
    lt = left.select(
        F.col(left_id).alias("_lid"), F.col(left_col).alias("_ls")
    ).filter(F.col("_ls").isNotNull())
    rt = right.select(
        F.col(right_id).alias("_rid"), F.col(right_col).alias("_rs")
    ).filter(F.col("_rs").isNotNull())
    probe = lt.select(
        "_lid", F.explode(F.expr(_probe_segments("_ls", d))).alias("k")
    ).select("_lid", "k.l_len", "k.seg_i", "k.seg")
    index = rt.select(
        "_rid", F.explode(F.expr(_index_segments("_rs", d))).alias("k")
    ).select("_rid", "k.l_len", "k.seg_i", "k.seg")
    cand = (
        probe.join(index, ["l_len", "seg_i", "seg"])
        .select("_lid", "_rid")
        .distinct()
    )
    # verify on the sparse candidate stream; threshold levenshtein
    # abandons the DP row once the running distance exceeds d
    return (
        cand.join(lt, "_lid")
        .join(rt, "_rid")
        .withColumn(dist_col, F.levenshtein(F.col("_ls"), F.col("_rs"), d))
        .filter(F.col(dist_col) >= 0)
        .select(
            F.col("_lid").alias(left_id),
            F.col("_rid").alias(right_id),
            F.col("_ls").alias(left_col),
            F.col("_rs").alias(right_col),
            dist_col,
        )
    )
