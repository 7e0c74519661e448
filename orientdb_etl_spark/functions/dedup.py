"""Deduplication operators.

Design for 100 TB: every variant avoids the O(n²) all-pairs comparison by
construction — exact dedup is a hash aggregate; MinHash/SimHash restrict
comparisons to LSH-bucket collisions; the candidate-pair verification joins
are self-joins on bucket keys (AQE handles skewed buckets).

Published techniques used (public literature): MinHash resemblance
sketches (Broder, "On the resemblance and containment of documents",
1997), banded LSH for near-duplicate candidate generation (Leskovec/
Rajaraman/Ullman, *Mining of Massive Datasets* ch. 3), SimHash random
hyperplane rounding (Charikar, STOC 2002; Manku et al., WWW 2007 for
web-scale near-dup detection).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def ensure_parallelism(
    df: DataFrame,
    min_parts: int | None = None,
    min_bytes_per_part: int = 0,
) -> DataFrame:
    """Spread a narrow input across the cluster before CPU-bound stages.

    Small single-file inputs arrive as 1-2 partitions, which serializes
    the Arrow-batched signature stages onto 1-2 cores. At real scale the
    source has many splits and this is a no-op; the repartition only fires
    when the input is under-partitioned (and the shuffled payload is by
    construction small — that is why it was under-partitioned).

    The width comes from the LEAF FILE RELATIONS (``df.inputFiles()`` +
    file sizes, packed the way Spark's own FilePartition logic packs
    splits), never from ``df.rdd.getNumPartitions()`` — under AQE,
    ``.rdd`` materializes every upstream shuffle stage, so the old probe
    was an execution hazard for any non-scan call site. Frames with no
    file-backed leaves (literal/in-memory test frames) are returned
    unchanged: there is nothing to read in parallel, and the caller's
    downstream shuffles restore width anyway.

    ``min_bytes_per_part`` is the per-call-site work gate (guide §2.4 —
    don't add an exchange a cheap stage can't amortize): when the spread
    would leave less than this many input bytes per partition, the
    repartition is skipped. 0 (default) keeps the historical behavior
    for the signature-stage call sites whose per-row work is heavy
    enough to win even on tiny inputs."""
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if not files:
        return df
    if len(files) >= max(2, target // 2):
        # many files: FilePartition packing aims at >= one split per
        # core (bytesPerCore), so the scan is already wide — and this
        # early exit also bounds the per-file stat loop below
        return df
    jvm = spark._jvm  # noqa: SLF001
    hconf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    jconf = spark._jsparkSession.sessionState().conf()  # noqa: SLF001
    max_split = int(jconf.filesMaxPartitionBytes())
    open_cost = int(jconf.filesOpenCostInBytes())
    # replicate FilePartition's split-size rule and greedy packing:
    # split = min(maxPartitionBytes, max(openCost, bytesPerCore)); each
    # file is cut into <= split chunks, chunks pack (size + openCost per
    # chunk) into partitions closed at the split budget
    sizes = []
    for f in files:
        p = jvm.org.apache.hadoop.fs.Path(f)
        sizes.append(int(p.getFileSystem(hconf).getFileStatus(p).getLen()))
    total = sum(sizes)
    padded = total + len(files) * open_cost
    split = min(max_split, max(open_cost, max(padded // max(target, 1), 1)))
    chunks: list[int] = []
    for sz in sizes:
        while sz > split:
            chunks.append(split)
            sz -= split
        if sz > 0:
            chunks.append(sz)
    chunks.sort(reverse=True)
    est_tasks, cur = 0, 0
    for c in chunks:
        if cur + c > split and cur > 0:
            est_tasks += 1
            cur = 0
        cur += c + open_cost
    if cur > 0:
        est_tasks += 1
    if est_tasks >= max(2, target // 2):
        return df
    if min_bytes_per_part and total < min_bytes_per_part * target:
        return df
    return df.repartition(target)


@F.pandas_udf(T.DoubleType())
def _sig_agreement(a: pd.Series, b: pd.Series) -> pd.Series:
    """Fraction of equal MinHash components per candidate pair (the
    Jaccard estimate), Arrow-batched — interpreted zip_with on 64-wide
    arrays was the verify stage's bottleneck."""
    if len(a) == 0:
        return pd.Series([], dtype="float64")
    ma = np.vstack(a.to_numpy())
    mb = np.vstack(b.to_numpy())
    return pd.Series((ma == mb).mean(axis=1))


# --------------------------------------------------------------------------
# exact
# --------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, cols: list[str] | None = None, tie_break: str | None = None
) -> DataFrame:
    """Exact duplicate removal by content hash — one hash-aggregate shuffle.

    With ``tie_break``, the kept row per duplicate group is deterministic
    (min of the tie-break column — usually the id), which matters for
    reproducible training-data builds; otherwise ``dropDuplicates``
    (first-seen, nondeterministic under parallelism) is used.
    """
    cols = cols or df.columns
    if tie_break is None:
        return df.dropDuplicates(cols)
    from pyspark.sql import Window

    w = Window.partitionBy(*cols).orderBy(F.col(tie_break).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def corpus_dedup_pipeline(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """The production 100-TB dedup composition: exact hash dedup FIRST,
    then MinHash-LSH near-dedup over the exact survivors.

    Why staged: the LSH bucket cap (see :func:`_cap_bucket_size`) drops
    degenerate buckets to bound quadratic candidate work, which means a
    boilerplate hot key above the cap would survive LSH-only dedup
    intact. The exact stage collapses every exact-dup group — including
    arbitrarily hot ones — in ONE hash shuffle (linear work, no pairs),
    leaving at most one member per text for the near-dup stage, so the
    cap then only ever guards genuine near-dup (non-identical) pile-ups.
    This is the composition published corpus pipelines use (exact/sharded
    dedup before MinHash, e.g. Lee et al. ACL'22).
    """
    exact = exact_dedup(df, [text_col], tie_break=id_col)
    return minhash_lsh_dedup(
        exact,
        text_col,
        id_col,
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
        threshold=threshold,
        max_bucket_size=max_bucket_size,
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------


def _shingles_sql(col: str, k: int) -> str:
    """Character k-shingle array as a SQL fragment — pure expression (no
    UDF): transform(sequence(1, len-k+1), i -> substring(text, i, k))."""
    return (
        f"transform(sequence(1, greatest(length({col}) - {k} + 1, 1)), "
        f"i -> substring({col}, i, {k}))"
    )


def _shingles(col: str, k: int) -> F.Column:
    return F.expr(_shingles_sql(col, k))


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    num_perm: int = 64,
    shingle_k: int = 5,
    out_col: str = "minhash",
) -> DataFrame:
    """MinHash signature per row, fully JVM-side.

    Each distinct shingle is hashed ONCE (xxhash64 → residue mod the
    32-bit prime 4294967291); the num_perm "permutations" are affine maps
    h*(2p+1)+p over that prime field — the standard universal-hash-family
    substitute for explicit permutations, and overflow-free under ANSI
    arithmetic (residue < 2^32, multiplier ≤ 2*num_perm). Cost is one
    string hash per shingle plus num_perm multiply-adds, all inside
    codegen. One narrow projection, no shuffle, no Python.
    """
    prime = 4294967291
    sig = F.expr(
        f"transform(sequence(0, {num_perm - 1}), "
        f"p -> array_min(transform(_hashes, h -> pmod(h * (2 * p + 1) + p, {prime}))))"
    )
    return (
        df.withColumn(
            "_hashes",
            F.expr(
                f"transform(array_distinct({_shingles_sql(text_col, shingle_k)}), "
                f"s -> pmod(xxhash64(s), {prime}))"
            ),
        )
        .withColumn(out_col, sig)
        .drop("_hashes")
    )


def minhash_signatures_portable(
    df: DataFrame,
    text_col: str,
    num_perm: int = 16,
    shingle_k: int = 5,
    out_col: str = "minhash",
) -> DataFrame:
    """Cross-engine-checkable MinHash signatures, pure expression.

    Same construction as :func:`minhash_signatures` but the per-shingle
    hash is a base-31 polynomial over character codepoints instead of
    xxhash64, so the identical recurrence is expressible in any ANSI-ish
    SQL dialect (the DuckDB oracle mirrors it with list_reduce). That
    makes the MinHash recurrence itself hash-verifiable end-to-end — the
    production path (:func:`minhash_signatures_fast`, Arrow-batched)
    stays for bench/scale.

    h(s)   = fold(chars(s), 0, (acc, c) -> acc*31 + code(c)) mod p
    sig[j] = min over distinct shingle hashes h of (h*(2j+1) + j) mod p
    with p = 4294967291 (largest 32-bit prime); all intermediates fit
    comfortably in int64 under ANSI arithmetic.

    Execution shape: the identical math evaluated ROW-WISE so it stays
    inside whole-stage codegen — shingle positions explode to rows, the
    base-31 fold unrolls to a scalar expression for full-width shingles
    (the rare shorter-than-k shingle of a short document falls back to
    the interpreted fold in a CASE arm), and the ``num_perm`` mins are
    one hash aggregation over distinct texts, joined back on the text.
    The prior formulation ran the whole recurrence through
    higher-order-function lambdas, which Spark evaluates interpreted
    per element — measured 8× slower at the bench corpus. Documents
    with no shingle evidence (NULL/empty text) carry a NULL signature
    (previously an array of NULL mins — both drop under the documented
    no-evidence contract and in the oracle replay).
    """
    prime = 4294967291
    k = int(shingle_k)
    cols = df.columns
    texts = df.select(F.col(text_col).alias("_t")).distinct()
    # shingle rows; dedup per text mirrors the old array_distinct; the
    # length(_s) > 0 filter mirrors the old empty-shingle drop
    shingles = (
        texts.withColumn(
            "_i",
            F.explode(
                F.expr(f"sequence(1, greatest(length(_t) - {k} + 1, 1))")
            ),
        )
        .select("_t", F.expr(f"substring(_t, _i, {k})").alias("_s"))
        .filter(F.length("_s") > 0)
        .distinct()
    )
    # unrolled fold for |s| = k (codegen); interpreted fold only for the
    # short-document edge (|s| < k happens only at position 1 of a text
    # shorter than k). No intermediate mod — identical to the fold.
    acc = "cast(0 as bigint)"
    for i in range(1, k + 1):
        acc = f"({acc} * 31 + ascii(substring(_s, {i}, 1)))"
    hashed = shingles.select(
        "_t",
        F.expr(
            f"CASE WHEN length(_s) = {k} THEN {acc} % {prime} "
            f"ELSE aggregate(sequence(1, length(_s)), cast(0 as bigint), "
            f"(acc, i) -> acc * 31 + ascii(substring(_s, i, 1))) % {prime} "
            "END"
        ).alias("_h"),
    )
    sig = hashed.groupBy("_t").agg(
        *[
            F.min(
                (F.col("_h") * (2 * j + 1) + F.lit(j)) % F.lit(prime)
            ).alias(f"_m{j}")
            for j in range(num_perm)
        ]
    )
    sig = sig.select(
        "_t", F.array(*[f"_m{j}" for j in range(num_perm)]).alias(out_col)
    )
    return df.join(
        sig, F.col(text_col).eqNullSafe(F.col("_t")), "left"
    ).select(*cols, out_col)


def minhash_signatures_fast(
    df: DataFrame,
    text_col: str,
    num_perm: int = 64,
    shingle_k: int = 5,
    out_col: str = "minhash",
    seed: int = 42,
) -> DataFrame:
    """MinHash signatures via a vectorized Pandas UDF.

    Rationale: Spark evaluates higher-order-function lambdas per element in
    interpreted mode (no whole-stage codegen), which measured ~100× slower
    than this Arrow-batched numpy path (sliding-window byte view →
    polynomial rolling hash → num_perm affine maps, all uint64-wraparound,
    deterministic across runs/executors). Falls back conceptually to
    :func:`minhash_signatures` (pure-expression variant, kept for
    reference/oracle symmetry).
    """
    from pyspark.sql import types as T

    rng = np.random.RandomState(seed)
    a = rng.randint(1, 2**62, size=num_perm).astype(np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.randint(0, 2**62, size=num_perm).astype(np.uint64)
    k = shingle_k

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(texts: pd.Series) -> pd.Series:
        pow_vec = np.power(
            np.uint64(1099511628211), np.arange(k, dtype=np.uint64)
        )  # FNV-prime powers, uint64 wraparound

        def one(t: str | None):
            if t is None:
                return None
            raw = t.encode("utf-8", "ignore")
            if len(raw) < k:
                raw = raw.ljust(k, b"\0")
            arr = np.frombuffer(raw, dtype=np.uint8)
            win = np.lib.stride_tricks.sliding_window_view(arr, k).astype(np.uint64)
            base = (win * pow_vec).sum(axis=1)  # rolling polynomial hash
            base = np.unique(base)
            # (num_perm, n) affine maps, wraparound; min per permutation
            sig = (base[None, :] * a[:, None] + b[:, None]).min(axis=1)
            return sig.astype(np.int64).tolist()

        return texts.map(one)

    return df.withColumn(out_col, _sig(F.col(text_col)))


def _cap_bucket_size(
    banded: DataFrame, keys: list[str], max_bucket_size: int | None
) -> DataFrame:
    """Drop degenerate LSH buckets before candidate generation.

    A bucket of B rows yields B² candidate pairs, so one boilerplate/empty-
    document bucket can dominate the whole stage at scale (AQE splits the
    shuffle partitions but cannot reduce the quadratic pair count). Web-
    scale near-dup setups drop over-full buckets outright (Manku et al.,
    WWW'07 §5): members of a bucket that big are near-identical boilerplate
    whose pairs carry no ranking signal, or hash-degenerate rows whose
    pairs are spurious.
    """
    if max_bucket_size is None:
        return banded
    # aggregate → tiny over-full list → broadcast anti-join: the count
    # pass map-side-combines to ~one row per bucket and never materializes
    # a degenerate bucket's members anywhere (unlike folding the cap into
    # the collect_list grouping, which would build the giant array first)
    over = (
        banded.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_bsz"))
        .filter(F.col("_bsz") > max_bucket_size)
        .select(*keys)
        .cache()  # tiny by definition
    )
    return banded.join(F.broadcast(over), keys, "left_anti")


def _bucket_pairs(
    banded: DataFrame,
    keys: list[str],
    id_col: str,
    payload_col: str | None = None,
) -> DataFrame:
    """Candidate pairs (keep_id < dup_id) from LSH buckets in ONE shuffle.

    A bucket self-join shuffles the banded table twice (once per join
    side) and then probes a hash table; grouping each bucket into a sorted
    id list and emitting the i<j combinations in-place needs a single
    grouped shuffle and no join. Bucket sizes are bounded by
    :func:`_cap_bucket_size`, so the per-group array (8 B/id, or 16 B with
    a fingerprint payload) and the quadratic emit are both capped.

    With ``payload_col`` (a scalar carried per row, e.g. a SimHash
    fingerprint), each pair also exposes ``_pl``/``_pr`` — the payloads of
    the two sides — so verification can run inline on the pair stream
    without joining signatures back.
    """
    if payload_col is None:
        collected = F.sort_array(F.collect_list(F.col(id_col)))
        emit = "y -> struct(x AS keep_id, y AS dup_id)"
    else:
        collected = F.sort_array(
            F.collect_list(
                F.struct(F.col(id_col).alias("i"), F.col(payload_col).alias("p"))
            )
        )
        emit = "y -> struct(x.i AS keep_id, y.i AS dup_id, x.p AS _pl, y.p AS _pr)"
    groups = (
        banded.groupBy(*keys)
        .agg(collected.alias("_ids"))
        .filter(F.size("_ids") >= 2)
    )
    pair_expr = (
        "flatten(transform(_ids, (x, i) -> "
        f"transform(slice(_ids, i + 2, size(_ids) - i - 1), {emit})))"
    )
    out = groups.select(F.explode(F.expr(pair_expr)).alias("_p"))
    cols = ["_p.keep_id", "_p.dup_id"]
    if payload_col is not None:
        cols += ["_p._pl", "_p._pr"]
    return out.select(*cols)


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC 2014): every node u connects each LARGER
    neighbor directly to the minimum of its neighborhood (incl. u) —
    long chains collapse geometrically instead of one hop per round.
    Output is directed child→parent with parent < child."""
    sym = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    mins = (
        sym.groupBy("a")
        .agg(F.min("b").alias("_mn"))
        .select("a", F.least("a", "_mn").alias("_m"))
    )
    return (
        sym.join(mins, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("_m").alias("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: every node u re-points ALL its parents (and
    itself) at its minimum parent, flattening multi-parent nodes into
    stars. Input/output directed child→parent, parent < child."""
    mins = edges.groupBy("a").agg(F.min("b").alias("_mn"))
    repointed = (
        edges.join(mins, "a")
        .filter(F.col("b") != F.col("_mn"))
        .select(F.col("b").alias("a"), F.col("_mn").alias("b"))
    )
    own = mins.select("a", F.col("_mn").alias("b"))
    return repointed.union(own).distinct()


def connected_component_labels(
    pairs: DataFrame, max_iter: int = 25
) -> DataFrame:
    """Connected components over verified duplicate pairs: (id, label)
    with label = min id of the component.

    Alternating large-star/small-star contraction (Kiveris et al., SoCC
    2014) — the round count is O(log² n) in the worst case and ~log in
    practice, INDEPENDENT of cluster diameter, unlike plain min-label
    propagation whose round count is the component diameter (a
    pathological chain of near-dups — doc A ~ B ~ C ~ … — needs one round
    per hop there, but collapses geometrically here). Every round touches
    only the PAIRS table (candidate collisions), never the corpus, and
    ``localCheckpoint`` truncates the iterative lineage so the plan does
    not grow with rounds.

    ``max_iter`` is a hard cap with a CONVERGENCE ASSERTION: 25 doubling
    rounds cover any graph that fits in storage (2^25 diameter), so
    hitting the cap means something is wrong — the function raises rather
    than silently returning partially-merged clusters (which would
    under-dedup without a trace).
    """
    # materialize the (possibly expensive) verified-pair subtree ONCE:
    # it feeds the contracted edge set AND the trailing isolated-vertex
    # union — without the cut point the full upstream candidate join
    # re-executes for each consumer
    base = pairs.select(
        F.col("keep_id").alias("a"), F.col("dup_id").alias("b")
    ).localCheckpoint(eager=True)
    edges = (
        base.filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    converged = edges.limit(1).count() == 0
    for _ in range(max_iter):
        if converged:
            break
        new_edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        # star fixpoint: every edge already points child→component-min, so
        # a full round reproduces the edge set exactly. One exact
        # symmetric-difference job (both edge sets are distinct by
        # construction, so an (a, b) group with a single source IS a
        # difference) instead of two ExceptExec jobs per round.
        changed = (
            new_edges.withColumn("_s", F.lit(1))
            .unionByName(edges.withColumn("_s", F.lit(2)))
            .groupBy("a", "b")
            .agg(F.countDistinct("_s").alias("_n"))
            .filter(F.col("_n") == 1)
            .limit(1)
            .count()
        )
        edges = new_edges
        if changed == 0:
            converged = True
    if not converged:
        raise RuntimeError(
            f"connected components did not converge in {max_iter} star "
            "rounds — the pair graph is pathological (or max_iter was "
            "lowered); refusing to return partially-merged clusters"
        )
    roots = edges.select(F.col("b").alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    labeled = edges.select(
        F.col("a").alias("id"), F.col("b").alias("label")
    ).union(roots)
    # vertices whose ONLY incident pair is a self-loop vanish from the
    # contracted edge set (a != b filtered them) but are still part of
    # the input universe — label them with themselves. Dedup pair streams
    # never contain self-loops (keep_id < dup_id), but the general graph
    # CC transformer exposes this function where they are legal input.
    touched = (
        base.select(F.col("a").alias("id"))
        .union(base.select(F.col("b").alias("id")))
        .distinct()
    )
    isolated = touched.join(
        labeled.select("id").distinct(), "id", "left_anti"
    ).withColumn("label", F.col("id"))
    return labeled.union(isolated)


def _drop_duplicates_by_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    survivor: str,
    score_col: str | None = None,
) -> DataFrame:
    """Resolve verified duplicate pairs into survivors.

    ``bucket_min`` (default): drop every ``dup_id`` — single pass, no
    iteration; documented bias: a doc is kept iff no smaller-id pair
    partner exists, so transitive clusters keep one doc per *local*
    minimum. ``connected_components``: transitive clustering, exactly one
    keeper (the min id) per duplicate component.
    ``best_of_component``: transitive clustering, keeper = the member
    with the highest ``score_col`` (ties → min id) — the keep-the-best-
    quality policy of published corpus curation (RefinedWeb, FineWeb keep
    the longest/highest-quality member, not an arbitrary one). Only the
    clustered subset (docs appearing in a verified pair) is ever scored
    or windowed — the corpus itself sees one anti-join, as in the other
    rules.
    """
    if survivor == "bucket_min":
        dups = pairs.select("dup_id").distinct()
        return df.join(dups.withColumnRenamed("dup_id", id_col), id_col, "left_anti")
    if survivor == "connected_components":
        labels = connected_component_labels(pairs)
        drop = labels.filter(F.col("id") != F.col("label")).select(
            F.col("id").alias(id_col)
        )
        return df.join(drop, id_col, "left_anti")
    if survivor == "best_of_component":
        if score_col is None:
            raise ValueError("survivor='best_of_component' needs score_col")
        from pyspark.sql import Window

        labels = connected_component_labels(pairs)
        scored = labels.join(
            df.select(F.col(id_col).alias("id"), F.col(score_col).alias("_score")),
            "id",
        )
        w = Window.partitionBy("label").orderBy(F.desc("_score"), F.asc("id"))
        keep = (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("id")
        )
        drop = labels.select("id").join(keep, "id", "left_anti")
        return df.join(
            drop.withColumnRenamed("id", id_col), id_col, "left_anti"
        )
    raise ValueError(f"unknown survivor rule {survivor!r}")


def _minhash_banded(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int,
    bands: int,
    shingle_k: int,
) -> tuple[DataFrame, DataFrame]:
    """Shared signature + banding stage: (signatures, exploded
    (id, band, bucket) rows). Used by :func:`minhash_lsh_dedup` and the
    :func:`lsh_bucket_stats` observability helper so both see the exact
    production banding. Caching the signatures is the CALLER's decision:
    only :func:`minhash_lsh_dedup` reuses them (banding + verify join);
    a stats-only caller caching a corpus-sized frame would pin executor
    storage for the whole session."""
    rows_per_band = num_perm // bands
    sigs = minhash_signatures_fast(
        ensure_parallelism(df), text_col, num_perm, shingle_k
    ).select(id_col, "minhash")
    band_arr = F.expr(
        f"transform(sequence(0, {bands - 1}), "
        f"b -> xxhash64(b, slice(minhash, b * {rows_per_band} + 1, {rows_per_band})))"
    )
    banded = sigs.select(
        F.col(id_col), F.posexplode(band_arr).alias("band", "bucket")
    )
    return sigs, banded


def lsh_bucket_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Operational observability for the LSH banding: one row of bucket
    statistics — bucket count, max/mean occupancy, how many buckets
    exceed ``max_bucket_size`` (i.e. would be dropped by the degenerate-
    bucket cap) and how many banded rows sit in them. At 100 TB this is
    the pre-flight check that tells you whether a boilerplate hot key is
    about to hit the cap (Manku WWW'07 practice) before the dedup runs."""
    _, banded = _minhash_banded(df, text_col, id_col, num_perm, bands, shingle_k)
    sizes = banded.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("_bsz")
    )
    cap = max_bucket_size if max_bucket_size is not None else 2**62
    return sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("_bsz").alias("max_bucket"),
        F.round(F.avg("_bsz"), 2).alias("mean_bucket"),
        F.sum((F.col("_bsz") > cap).cast("long")).alias("n_over_cap"),
        F.sum(
            F.when(F.col("_bsz") > cap, F.col("_bsz")).otherwise(F.lit(0))
        ).alias("rows_in_capped"),
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
    max_bucket_size: int | None = 1000,
    survivor: str = "bucket_min",
    score_col: str | None = None,
) -> DataFrame:
    """Near-duplicate removal: shingle → minhash → band → bucket-join.

    Scale shape: signatures are computed in one map stage; candidate pairs
    come from exploding ``bands`` band-hashes per row and self-joining on
    the (band, hash) bucket — only colliding rows are ever compared. A row
    is dropped iff some candidate with a smaller id estimates Jaccard ≥
    threshold (estimate = fraction of equal signature components). This
    "survivor = bucket-min" rule is a single pass; it approximates
    connected-component clustering without iteration (documented bias:
    chains A~B~C with A<B<C drop B and C even if A!~C).

    ``max_bucket_size`` guards the quadratic candidate blow-up from
    degenerate buckets (see :func:`_cap_bucket_size`); ``None`` disables.
    ``survivor="connected_components"`` replaces the single-pass rule with
    transitive clustering over verified pairs (one keeper per component —
    the shape used by published corpus-dedup pipelines; see
    :func:`connected_component_labels`).
    """
    sigs, banded = _minhash_banded(df, text_col, id_col, num_perm, bands, shingle_k)
    # sigs feed BOTH the banding above and the verify join below — cache
    # here (the reuse site), not inside _minhash_banded, so stats-only
    # callers never pin a corpus-sized frame
    sigs.cache()
    banded = _cap_bucket_size(banded, ["band", "bucket"], max_bucket_size)
    # ids only in the grouped shuffle (8 B/row); the 1 KB signatures are
    # joined back below onto the sparse verified-candidate stream instead
    # of being carried through every one of the `bands` bucket copies
    cand = _bucket_pairs(banded, ["band", "bucket"], id_col).distinct()
    # verify candidates on the full signature (estimate of Jaccard)
    sl = sigs.select(F.col(id_col).alias("keep_id"), F.col("minhash").alias("_sig_l"))
    sr = sigs.select(F.col(id_col).alias("dup_id"), F.col("minhash").alias("_sig_r"))
    verified = (
        cand.join(sl, "keep_id")
        .join(sr, "dup_id")
        .withColumn("_est", _sig_agreement(F.col("_sig_l"), F.col("_sig_r")))
        .filter(F.col("_est") >= threshold)
        .select("keep_id", "dup_id")
        .distinct()
    )
    return _drop_duplicates_by_pairs(df, verified, id_col, survivor, score_col)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash_col(text_col: str, bits: int = 64) -> F.Column:
    """64-bit SimHash as a pure expression: tokens → per-bit vote sum →
    sign bit. aggregate() folds token hashes into a bit-count array without
    leaving the JVM."""
    tokens = f"array_distinct(split(lower({text_col}), '\\\\s+'))"
    # votes[b] = sum over tokens of (bit b of xxhash64(token) ? 1 : -1)
    votes = (
        f"aggregate({tokens}, "
        f"array_repeat(0L, {bits}), "
        f"(acc, t) -> zip_with(acc, transform(sequence(0, {bits - 1}), "
        f"b -> CASE WHEN shiftright(xxhash64(t), b) % 2 != 0 THEN 1L ELSE -1L END), "
        f"(a, v) -> a + v))"
    )
    # fold sign bits into one BIGINT
    return F.expr(
        f"aggregate(zip_with({votes}, sequence(0, {bits - 1}), "
        f"(v, b) -> CASE WHEN v > 0 THEN shiftleft(1L, cast(b AS int)) ELSE 0L END), "
        f"0L, (acc, x) -> acc | x)"
    )


def simhash_fast(text_col: str, seed: int = 0) -> F.Column:
    """64-bit SimHash via Arrow/numpy (FNV-1a token hashes → per-bit vote
    matrix → sign bits). The pure-expression variant (:func:`simhash_col`)
    evaluates its per-token × per-bit lambdas interpreted — measured ~5×
    slower; this path does the same votes as one vectorized matmul."""

    import hashlib

    skey = seed.to_bytes(8, "little")

    @F.pandas_udf(T.LongType())
    def _sh(texts: pd.Series) -> pd.Series:
        def one(t: str | None):
            if t is None:
                return None
            toks = set(t.lower().split())
            if not toks:
                return 0
            hs = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.blake2b(
                            tok.encode("utf-8"), digest_size=8, key=skey
                        ).digest(),
                        "little",
                    )
                    for tok in toks
                ),
                dtype=np.uint64,
                count=len(toks),
            )
            bits = (
                (hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            ).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            fp = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                fp |= np.uint64(1) << np.uint64(b)
            return int(fp.astype(np.int64))

        return texts.map(one)

    return _sh(F.col(text_col))


def simhash_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket_size: int | None = 1000,
    survivor: str = "bucket_min",
    score_col: str | None = None,
) -> DataFrame:
    """SimHash near-dedup: 64-bit fingerprints, banded into ``bands``
    16-bit chunks (pigeonhole: hamming ≤ bands-1 ⇒ ≥1 identical band),
    candidates verified with bit_count(xor) ≤ max_hamming.
    ``max_bucket_size`` drops degenerate buckets (:func:`_cap_bucket_size`);
    ``survivor`` as in :func:`minhash_lsh_dedup`.
    """
    width = 64 // bands
    # cache: the banded frame derived from fp is traversed TWICE by the
    # default bucket cap (the groupBy size count and the anti-join probe
    # stream), so an uncached fp would run the SimHash UDF over the
    # corpus twice
    fp = (
        ensure_parallelism(df)
        .select(id_col, simhash_fast(text_col).alias("_simhash"))
        .cache()
    )
    band_arr = F.expr(
        f"transform(sequence(0, {bands - 1}), "
        f"b -> struct(b AS band, shiftright(_simhash, b * {width}) & {(1 << width) - 1} AS chunk))"
    )
    banded = fp.select(F.col(id_col), F.col("_simhash"), F.explode(band_arr).alias("bb")).select(
        id_col, "_simhash", F.col("bb.band").alias("band"), F.col("bb.chunk").alias("chunk")
    )
    banded = _cap_bucket_size(banded, ["band", "chunk"], max_bucket_size)
    # fingerprint is one BIGINT → carry it as the pair payload and verify
    # hamming distance inline on the pair stream: one grouped shuffle,
    # zero joins (vs. self-join + per-side signature lookups)
    verified = (
        _bucket_pairs(banded, ["band", "chunk"], id_col, payload_col="_simhash")
        .filter(F.expr(f"bit_count(_pl ^ _pr) <= {max_hamming}"))
        .select("keep_id", "dup_id")
        .distinct()
    )
    return _drop_duplicates_by_pairs(df, verified, id_col, survivor, score_col)


# --------------------------------------------------------------------------
# n-gram Jaccard candidate pairs
# --------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    band_col: F.Column | None = None,
) -> DataFrame:
    """Exact token n-gram Jaccard over candidate pairs.

    Candidates are restricted by a blocking key (default: document length
    bucket — near-dups have near-equal lengths) so the self-join never goes
    all-pairs. Returns (id_a, id_b, jaccard) with id_a < id_b.

    The intersection is counted through a gram-postings join inside each
    block — ``|A∩B|`` = the number of ``(block, gram)`` postings the pair
    shares, ``|A∪B| = |A|+|B|−|A∩B|`` from the per-doc distinct-gram
    sizes — instead of a per-pair ``array_intersect``: identical results
    (a pair sharing zero grams has Jaccard 0 and can never pass a
    positive ``threshold``; the double-probe duplicate rows collapse in
    the same trailing ``distinct``), but the work is whole-stage-codegen
    hash-join + count rows rather than interpreted per-pair array
    kernels — ~10× on the bench corpus, and at scale the shuffle carries
    (block, gram, id) postings with map-side pair-count combining, never
    gram arrays through a blocked cross product.
    """
    grams = F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(_toks) - {n} + 1, 1)), "
        f"i -> concat_ws(' ', slice(_toks, i, {n}))))"
    )
    block = band_col if band_col is not None else F.floor(F.length(text_col) / F.lit(32))
    base = (
        ensure_parallelism(
            df.select(F.col(id_col), F.col(text_col), block.alias("_block"))
        )
        .select(
            F.col(id_col),
            F.split(F.lower(F.col(text_col)), r"\s+").alias("_toks"),
            "_block",
        )
        .withColumn("_grams", grams)
        .drop("_toks")
    )
    # near-equal lengths can straddle a bucket boundary. ASYMMETRIC
    # emission: the index side posts only its own block, the probe side
    # its own ±1 — the same pair set (|block diff| <= 1) as emitting
    # own+next on both sides, but each candidate pair now collides in
    # exactly ONE block group (the index doc's own), so same-block pairs
    # are verified once instead of twice. Posting volume is unchanged
    # (3x + 1x vs 2x + 2x); join output halves.
    probe = base.select(
        F.col(id_col),
        F.size("_grams").alias("_sz"),
        F.explode(
            F.array(F.col("_block") - 1, "_block", F.col("_block") + 1)
        ).alias("_bk"),
        "_grams",
    ).select(
        id_col, "_sz", "_bk", F.explode("_grams").alias("_g")
    )
    index = base.select(
        F.col(id_col),
        F.size("_grams").alias("_sz"),
        F.col("_block").alias("_bk"),
        F.explode("_grams").alias("_g"),
    )
    l_, r_ = probe.alias("l"), index.alias("r")
    inter = (
        l_.join(
            r_,
            (F.col("l._bk") == F.col("r._bk"))
            & (F.col("l._g") == F.col("r._g"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .groupBy(
            F.col("l._bk").alias("_bk"),
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l._sz").alias("_sza"),
            F.col("r._sz").alias("_szb"),
        )
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    return (
        inter.select(
            "id_a",
            "id_b",
            (
                F.col("_inter")
                / (F.col("_sza") + F.col("_szb") - F.col("_inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .distinct()
    )


def shared_span_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 8,
    guard: int = 1,
    max_group: int | None = 1000,
) -> DataFrame:
    """Exact shared token-SPAN detection — the second dedup axis of
    Lee et al. ACL'22 ("Deduplicating Training Data Makes Language
    Models Better"): document pairs sharing at least one verbatim run of
    ``window`` whitespace tokens, with the count of distinct shared
    windows per pair. MinHash answers "are these documents mostly the
    same"; this answers "does this document contain a lifted passage"
    — the two miss each other's positives (a 50-token quote inside a
    5,000-token article has negligible Jaccard).

    ``guard=1`` indexes EVERY window (exact, the oracle-checkable
    configuration). ``guard=g > 1`` applies winnowing (Schleimer et al.
    SIGMOD'03): per sliding run of ``g`` consecutive window hashes, only
    the minimum is kept, shrinking the posting stream ~g× with the
    published guarantee — any shared span of at least ``window + g - 1``
    tokens contains one full guard run on BOTH sides, whose minimum is
    the same value, so the pair is still caught (shorter spans become
    best-effort). Selection is by hash VALUE, so tie-handling never
    affects cross-document agreement.

    Scale shape: fingerprints are pure JVM expressions fused into the
    scan (``transform``/``slice``/``xxhash64`` — no Python), the posting
    stream is ``rows × windows/g`` longs, candidate pairs come from the
    shared single-shuffle grouped emitter (:func:`_bucket_pairs`) with
    the degenerate-group cap (:func:`_cap_bucket_size`) guarding
    boilerplate spans exactly as it guards LSH buckets, and the final
    per-pair count is one hash aggregate. Nothing is quadratic in corpus
    size; work is quadratic only within a capped fingerprint group.

    Sibling surface: ``functions/passages.py`` profiles and strips at
    the same hash-gram granularity per-document
    (:func:`~orientdb_etl_spark.functions.passages.
    duplicate_passage_stats` /
    :func:`~orientdb_etl_spark.functions.passages.
    strip_duplicate_passages`); THIS function is the corpus-level PAIR
    view those don't expose (which documents share spans with which),
    plus the winnowing posting-compression knob. Reference has no analog
    (its transformers are row-local); this is an extensions-tier corpus
    operator.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if guard < 1:
        raise ValueError(f"guard must be >= 1, got {guard}")
    min_toks = window + guard - 1
    base = (
        ensure_parallelism(df)
        .where(F.length(F.trim(F.coalesce(F.col(text_col), F.lit("")))) > 0)
        .select(
            F.col(id_col),
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("_t"),
        )
        .where(F.size("_t") >= min_toks)
    )
    hashed = base.select(
        F.col(id_col),
        F.expr(
            f"transform(sequence(1, size(_t) - {window} + 1), "
            f"i -> xxhash64(concat_ws(' ', slice(_t, i, {window}))))"
        ).alias("_h"),
    )
    if guard > 1:
        sel = F.expr(
            f"array_distinct(transform(sequence(1, size(_h) - {guard} + 1), "
            f"i -> array_min(slice(_h, i, {guard}))))"
        )
    else:
        sel = F.expr("array_distinct(_h)")
    spans = hashed.select(F.col(id_col), F.explode(sel).alias("_fp"))
    spans = _cap_bucket_size(spans, ["_fp"], max_group)
    pairs = _bucket_pairs(spans, ["_fp"], id_col)
    # fingerprints are distinct per document, so each shared fingerprint
    # contributes exactly one pair row — the count IS the distinct count
    return (
        pairs.groupBy("keep_id", "dup_id")
        .agg(F.count(F.lit(1)).alias("shared_windows"))
        .select(
            F.col("keep_id").alias("id_a"),
            F.col("dup_id").alias("id_b"),
            "shared_windows",
        )
    )


def strip_duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 8,
) -> DataFrame:
    """The Lee et al. ACL'22 exact-substring REMEDIATION: rewrite each
    document with cross-document duplicated spans removed from every doc
    except one canonical owner. A ``window``-token run (lowercased
    fingerprint) occurring in >= 2 distinct documents is owned by the
    doc with the MINIMUM id containing it; in every other doc, all token
    positions covered by that run are dropped and the text is rebuilt
    from the surviving ORIGINAL-case tokens (single-space joined). The
    owner keeps all its occurrences, so every duplicated span survives
    exactly once corpus-wide per owning document — deterministic,
    engine-independent, and idempotent (re-running removes nothing new).

    This is the ALL-BUT-ONE semantics — the deliberate complement of
    :func:`~orientdb_etl_spark.functions.passages.
    strip_duplicate_passages`, which removes EVERY occurrence (the
    content disappears from the corpus entirely, the behavior of the
    published ExactSubstr cutter). Pick by goal: remove-everywhere
    maximally suppresses memorization; all-but-one preserves exactly
    one trainable copy of the shared content. Implementation also
    differs: this rebuild is pure JVM expressions (oracle replays it
    byte-for-byte); the passages strip is an Arrow-batched mask.

    Output: ``(id, text-col rebuilt, n_toks, removed_tokens)``. Docs
    shorter than the window pass through unchanged (normalized to the
    same single-space token join so the output column is uniformly
    canonical). Empty/null docs are excluded, matching the other span
    operators.

    Scale shape: fingerprints stay scan-fused JVM expressions; ownership
    is ONE aggregate (min doc id per duplicated fingerprint); removal is
    an equi-join of postings to owned fingerprints; the rebuild shuffles
    (id, pos, token) rows once and reassembles per doc with
    ``array_sort(collect_list(struct(pos, tok)))`` — per-doc bounded
    state, no Python, no posting self-join.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    base = (
        ensure_parallelism(df)
        .where(F.length(F.trim(F.coalesce(F.col(text_col), F.lit("")))) > 0)
        .select(
            F.col(id_col),
            F.split(F.trim(F.col(text_col)), r"\s+").alias("_t"),
        )
    )
    wins = base.where(F.size("_t") >= window).select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(_t) - {window} + 1), "
                f"i -> xxhash64(lower(concat_ws(' ', slice(_t, i, {window})))))"
            )
        ).alias("_pos", "_fp"),
    )
    owners = (
        wins.groupBy("_fp")
        .agg(
            F.count_distinct(F.col(id_col)).alias("_nd"),
            F.min(F.col(id_col)).alias("_owner"),
        )
        .where(F.col("_nd") >= 2)
        .select("_fp", "_owner")
    )
    # token positions to drop: covered by a duplicated window this doc
    # does NOT own ( _pos is 0-based from posexplode → covers
    # [_pos+1, _pos+window] in 1-based token coordinates )
    drops = (
        wins.join(owners, "_fp")
        .where(F.col(id_col) != F.col("_owner"))
        .select(
            F.col(id_col),
            F.explode(
                F.expr(f"sequence(_pos + 1, _pos + {window})")
            ).alias("_tp"),
        )
        .distinct()
    )
    toks = base.select(
        F.col(id_col),
        F.size("_t").alias("n_toks"),
        F.posexplode("_t").alias("_p0", "_tok"),
    ).withColumn("_tp", F.col("_p0") + 1)
    kept = toks.join(drops, [id_col, "_tp"], "left_anti")
    assembled = kept.groupBy(id_col).agg(
        F.expr(
            "concat_ws(' ', transform(array_sort(collect_list("
            "struct(_tp, _tok))), x -> x._tok))"
        ).alias("_new_text"),
        F.count(F.lit(1)).alias("_kept"),
    )
    # a doc whose EVERY token was dropped has no kept rows — join back to
    # the base so it still appears, as empty text with full removal
    return (
        base.select(id_col, F.size("_t").alias("n_toks"))
        .join(assembled, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("_new_text", F.lit("")).alias(text_col),
            F.col("n_toks").cast("long").alias("n_toks"),
            (F.col("n_toks") - F.coalesce("_kept", F.lit(0)))
            .cast("long")
            .alias("removed_tokens"),
        )
    )


# --------------------------------------------------------------------------
# incremental (cross-snapshot) dedup
# --------------------------------------------------------------------------


def incremental_dedup(
    new_df: DataFrame,
    seen_df: DataFrame,
    text_col: str = "text",
    seen_text_col: str | None = None,
    broadcast_seen: bool | None = None,
    mode: str = "filter",
) -> DataFrame:
    """Dedup a NEW batch of documents against an already-curated corpus —
    the incremental-crawl pattern: the reference corpus is fingerprinted
    once, new snapshots are checked against it without re-shuffling the
    old data.

    Both sides reduce to canonical-content fingerprints
    (:func:`orientdb_etl_spark.functions.text.doc_fingerprint` — lowercase
    / collapse-whitespace / strip-punct / md5), so the join key is 32
    bytes per OLD document regardless of document size. When the seen side
    is a fingerprint snapshot small enough to broadcast (billions of
    documents at 32 B/doc still fit typical executor memory in the tens of
    millions; beyond that leave ``broadcast_seen=False`` for a shuffled
    anti-join — at that scale a Bloom filter pre-pass
    [`F.bloom_filter_agg`-style] in front of the anti-join is the standard
    refinement), the new batch never shuffles at all: scan → fingerprint
    → broadcast anti-join, fully pipelined.

    ``mode='filter'`` drops previously-seen docs; ``mode='flag'`` appends
    a ``seen_before`` boolean instead (audit view).
    """
    if mode not in ("filter", "flag"):
        raise ValueError(f"unknown mode {mode!r}")
    from orientdb_etl_spark.functions.text import doc_fingerprint

    seen_fps = (
        seen_df.select(
            doc_fingerprint(seen_text_col or text_col).alias("_fp")
        )
        .distinct()
    )
    if broadcast_seen or broadcast_seen is None:
        seen_fps = F.broadcast(seen_fps)
    new_fp = new_df.withColumn("_fp", doc_fingerprint(text_col))
    if mode == "filter":
        return new_fp.join(seen_fps, "_fp", "left_anti").drop("_fp")
    return (
        new_fp.join(
            seen_fps.withColumn("_hit", F.lit(True)), "_fp", "left"
        )
        .withColumn("seen_before", F.coalesce(F.col("_hit"), F.lit(False)))
        .drop("_fp", "_hit")
    )


def incremental_near_dedup(
    new_df: DataFrame,
    seen_df: DataFrame,
    text_col: str,
    id_col: str,
    seen_text_col: str | None = None,
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
    max_bucket_size: int | None = 1000,
    mode: str = "filter",
) -> DataFrame:
    """NEAR-duplicate stage of cross-snapshot dedup: drop new documents
    whose MinHash-estimated Jaccard against ANY already-curated document
    reaches ``threshold`` — the incremental complement of
    :func:`minhash_lsh_dedup` (which dedups within one corpus) and of
    :func:`incremental_dedup` (which only catches byte-canonical matches
    across snapshots).

    Scale shape: both sides go through the SAME signature + banding stage
    (:func:`_minhash_banded`), candidates are an equi-join of the two
    banded tables on (band, bucket) — new×seen pairs only, never
    seen×seen (the curated corpus is already deduped; re-pairing it would
    redo quadratic work every snapshot) — and verification joins the full
    signatures back onto the sparse candidate stream. At 100 TB the seen
    side's signatures/banding are computed ONCE and persisted partitioned
    by (band, bucket); each new crawl only signs its own documents and
    joins against that index. The degenerate-bucket cap is applied to the
    UNION of both sides' banded rows, since a boilerplate bucket hot on
    either side makes the cross join quadratic all the same.

    The seen side needs no id column: an internal ``xxhash64(text)`` key
    links its banded rows to its signatures (hash collisions would only
    merge two seen docs' candidate lists — harmless for a drop decision).
    ``mode='filter'`` drops matched new docs; ``mode='flag'`` appends a
    ``near_seen`` boolean instead (audit view).
    """
    if mode not in ("filter", "flag"):
        raise ValueError(f"unknown mode {mode!r}")
    stc = seen_text_col or text_col
    seen_keyed = seen_df.select(
        F.xxhash64(F.col(stc)).alias("_seen_key"), F.col(stc).alias("_stext")
    ).dropDuplicates(["_seen_key"])
    sigs_new, banded_new = _minhash_banded(
        new_df, text_col, id_col, num_perm, bands, shingle_k
    )
    sigs_seen, banded_seen = _minhash_banded(
        seen_keyed, "_stext", "_seen_key", num_perm, bands, shingle_k
    )
    # each side's signatures feed the banding, the bucket-cap passes AND
    # the verify join — cache them once per side or the signature UDF
    # re-runs over the full corpus for every consumer (same reuse-site
    # rule as minhash_lsh_dedup)
    sigs_new.cache()
    sigs_seen.cache()
    # cap on the COMBINED occupancy: a bucket's pair count is |new side| ×
    # |seen side|, so the guard sums both sides' counts (map-side-combined
    # to ~one row per bucket) and anti-joins the tiny over-full list away
    # from each side — no union of differently-typed id columns needed
    bn, bs = banded_new, banded_seen
    over = None
    if max_bucket_size is not None:
        sizes = (
            bn.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("_c"))
            .unionByName(
                bs.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("_c"))
            )
            .groupBy("band", "bucket")
            .agg(F.sum("_c").alias("_bsz"))
        )
        over = (
            sizes.filter(F.col("_bsz") > max_bucket_size)
            .select("band", "bucket")
            .cache()  # tiny by definition
        )
        bn = bn.join(F.broadcast(over), ["band", "bucket"], "left_anti")
        bs = bs.join(F.broadcast(over), ["band", "bucket"], "left_anti")
    cand = bn.join(bs, ["band", "bucket"]).select(id_col, "_seen_key").distinct()
    sn = sigs_new.select(F.col(id_col), F.col("minhash").alias("_sig_n"))
    ss = sigs_seen.select(F.col("_seen_key"), F.col("minhash").alias("_sig_s"))
    hits = (
        cand.join(sn, id_col)
        .join(ss, "_seen_key")
        .withColumn("_est", _sig_agreement(F.col("_sig_n"), F.col("_sig_s")))
        .filter(F.col("_est") >= threshold)
        .select(id_col)
        .distinct()
        # materialize the (small) hit set NOW so the signature caches can
        # be released immediately — this runs once per snapshot in a
        # long-lived session, and leaving two corpus-sized cached frames
        # pinned per call would accumulate exactly the session-long
        # storage cost the stats-only-cache fix removed elsewhere
        .localCheckpoint(eager=True)
    )
    sigs_new.unpersist()
    sigs_seen.unpersist()
    if over is not None:
        over.unpersist()
    if mode == "filter":
        return new_df.join(hits, id_col, "left_anti")
    return (
        new_df.join(hits.withColumn("_hit", F.lit(True)), id_col, "left")
        .withColumn("near_seen", F.coalesce(F.col("_hit"), F.lit(False)))
        .drop("_hit")
    )


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------


def embedding_near_dedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    planes: int = 16,
    seed: int = 42,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Embedding near-duplicate removal via random-hyperplane LSH.

    Sign-of-projection signatures bucket similar vectors; only bucket
    collisions are verified with exact cosine. Signature and verification
    both run on the Arrow path (numpy matmul / vectorized pair cosine) —
    the interpreted higher-order-function variants are the measured
    anti-pattern (see simhash_fast). Hyperplanes re-derive from ``seed``
    on every executor — no driver state, reproducible across runs.

    ``max_bucket_size`` drops degenerate signature buckets (e.g. all-zero
    embeddings collapsing to one signature) before the pair join, same
    rationale as the MinHash/SimHash guard: B² pairs from one bucket of
    boilerplate vectors carry no dedup signal. The candidate stage keeps
    the two-sided bucket join (not the grouped pair-emit used for
    MinHash): here each row carries its full vector, and a grouped
    collect_list would materialize an entire bucket's vectors in one
    aggregation row, while the join streams them through a hash probe.
    """
    from orientdb_etl_spark.functions.similarity import (
        _cosine_pairs,
        add_lsh_buckets,
    )

    base = add_lsh_buckets(
        df.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
        ),
        "_v",
        planes=planes,
        seed=seed,
        out_col="_sig",
    )
    base = _cap_bucket_size(base, ["_sig"], max_bucket_size)
    l_, r_ = base.alias("l"), base.alias("r")
    dups = (
        l_.join(
            r_,
            (F.col("l._sig") == F.col("r._sig"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .withColumn("_cos", _cosine_pairs(F.col("l._v"), F.col("r._v")))
        .filter(F.col("_cos") >= threshold)
        .select(F.col(f"r.{id_col}").alias(id_col))
        .distinct()
    )
    return df.join(dups, id_col, "left_anti")


# --------------------------------------------------------------------------
# semantic dedup (embedding k-means clusters)
# --------------------------------------------------------------------------


def semantic_dedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    nlist: int = 64,
    threshold: float = 0.95,
    seed: int = 42,
    sample_size: int = 10_000,
    iters: int = 5,
    max_cluster_size: int | None = None,
    survivor: str = "semdedup",
    score_col: str | None = None,
    centroids=None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup:
    Data-efficient learning at web-scale through semantic deduplication",
    arXiv:2303.09540, 2023): k-means-cluster the embeddings, compare pairs
    only WITHIN a cluster, and inside each duplicate group keep the member
    LEAST similar to its cluster centroid (the boundary example carries
    the most training signal; centroid-hugging copies are redundant).

    Scale shape: centroids train on a bounded, layout-independent driver
    sample (:func:`~orientdb_etl_spark.functions.similarity.ivf_index` —
    hash-prefix TakeOrderedAndProject, k-means++ init); assignment is one
    Arrow matmul map stage; the pair join is an equi-join on the cell id,
    so candidate work is Σ|cell|² instead of N² — size ``nlist`` ≈
    N / target_cluster_size to bound it (the paper uses ~100k clusters at
    web scale). Pairs never cross cells by construction — that recall
    trade IS the published algorithm, not an approximation of it. At
    100 TB, store the table partitioned by cell and this becomes an
    embarrassingly parallel per-partition sweep.

    ``survivor``: ``"semdedup"`` (default, keep-farthest-from-centroid
    per connected component, ties → min id) or any policy accepted by
    :func:`_drop_duplicates_by_pairs` (``bucket_min`` /
    ``connected_components`` / ``best_of_component`` + ``score_col``).
    ``max_cluster_size`` drops degenerate cells before the pair join
    (same guard + rationale as the LSH bucket cap).
    """
    from orientdb_etl_spark.functions.similarity import (
        _cosine_pairs,
        ivf_assign,
        ivf_index,
    )

    if centroids is None:
        centroids = ivf_index(
            df, vec_col, nlist=nlist, sample_size=sample_size, iters=iters, seed=seed
        )
    base = ivf_assign(
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")),
        "_v",
        centroids,
        out_col="_cell",
        sim_col="_ccos" if survivor == "semdedup" else None,
    )
    # cache at the reuse site: base feeds BOTH sides of the pair join
    # (and the semdedup survivor scoring) — uncached, the full-corpus
    # centroid-assignment matmul would run three times per call
    base.cache()
    base = _cap_bucket_size(base, ["_cell"], max_cluster_size)
    # two-sided equi-join on the cell id (not grouped pair-emit): each row
    # carries its full vector, and collect_list would materialize a whole
    # cell's vectors in one aggregation row — the join streams them
    # through a hash probe (same reasoning as embedding_near_dedup)
    l_, r_ = base.alias("l"), base.alias("r")
    pairs = (
        l_.join(
            r_,
            (F.col("l._cell") == F.col("r._cell"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .withColumn("_cos", _cosine_pairs(F.col("l._v"), F.col("r._v")))
        .filter(F.col("_cos") >= threshold)
        .select(
            F.col(f"l.{id_col}").alias("keep_id"),
            F.col(f"r.{id_col}").alias("dup_id"),
        )
        .distinct()
    )
    if survivor != "semdedup":
        return _drop_duplicates_by_pairs(df, pairs, id_col, survivor, score_col)
    # keep-farthest-from-centroid per duplicate component: only the
    # clustered subset (docs in a verified pair) is labelled or windowed;
    # the corpus sees one broadcast-able anti-join, as everywhere else
    labels = connected_component_labels(pairs)
    scored = labels.join(
        base.select(F.col(id_col).alias("id"), "_ccos"), "id"
    )
    w = Window.partitionBy("label").orderBy(F.asc("_ccos"), F.asc("id"))
    drop = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .select(F.col("id").alias(id_col))
    )
    return df.join(drop, id_col, "left_anti")


def split_leakage(
    df: DataFrame,
    split_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-duplicate leakage across train/val/test splits: canonical
    fingerprints (case/whitespace/punctuation-invariant) whose documents
    appear in MORE THAN ONE split — the eval-integrity check every split
    assignment should pass before a benchmark number is trusted (a doc
    memorized from train and echoed in val inflates eval silently;
    complement of `decontaminate`, which checks against an EXTERNAL eval
    set).

    Returns one row per leaking fingerprint: (fingerprint, n_docs,
    splits sorted, doc_ids sorted). Plan: ONE groupBy on the fingerprint
    (map-side partial agg); no pair materialization — a fingerprint
    duplicated k times across splits costs one k-sized group, never k²
    pairs. An empty result is the passing state.
    """
    from orientdb_etl_spark.functions.text import doc_fingerprint

    return (
        df.select(
            doc_fingerprint(text_col).alias("fingerprint"),
            F.col(split_col).alias("_split"),
            F.col(id_col).alias("_id"),
        )
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.array_sort(F.collect_set("_split")).alias("splits"),
            F.array_sort(F.collect_list("_id")).alias("doc_ids"),
        )
        .filter(F.size("splits") > 1)
    )


def soft_dedup_weights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    alpha: float = 1.0,
    round_to: int = 6,
) -> DataFrame:
    """Soft deduplication: instead of REMOVING duplicates, downweight
    them — each document gets sampling weight ``1 / dup_count^alpha``
    so a k-fold duplicated document contributes (for ``alpha=1``) one
    document's worth of expected training mass in aggregate. This is the
    duplicate-aware reweighting studied for data-constrained pretraining
    (Muennighoff et al., NeurIPS 2023, show repeated data decays in
    value rather than dropping to zero — removal throws away that
    residual value; downweighting keeps it priced correctly). Feed the
    weights to :func:`~orientdb_etl_spark.functions.sampling.
    weighted_sample` to realize the draw.

    ``dup_count`` groups on ``md5(text)`` — exact content identity, and
    the engine-portable twin of grouping on the text itself with the
    shuffle carrying a 32-hex key instead of whole documents (at crawl
    scale the narrow key is the difference between shuffling 100 TB of
    text and 3 TB of digests). One hash aggregation + one narrow join
    back; no windows.

    Returns ``(id_col, dup_count, weight)``; NULL text ⇒ no row (no
    content to weight).

    Cite: reference has no counterpart; SURVEY §2.8 dedup family
    (exact_dedup's keep-don't-drop sibling).
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    keyed = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.md5(F.col(text_col)).alias("_fp")
    )
    counts = keyed.groupBy("_fp").agg(
        F.count(F.lit(1)).alias("dup_count")
    )
    return keyed.join(counts, "_fp").select(
        id_col,
        "dup_count",
        F.round(
            F.lit(1.0)
            / F.pow(F.col("dup_count").cast("double"), F.lit(float(alpha))),
            round_to,
        ).alias("weight"),
    )
