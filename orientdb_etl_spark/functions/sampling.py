"""Deterministic sampling / splitting / shuffling for training-data builds.

Reproducibility is the design constraint: every operator derives its
randomness from a multiplicative integer hash of the row id (Knuth-style,
64-bit wraparound) — identical results on any cluster size, any partition
layout, any engine that can do integer arithmetic (which is what makes
these oracle-checkable in DuckDB, unlike rand()/sampleBy).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Knuth's 32-bit multiplicative constant; the id is reduced mod a prime
# first so the product stays far below 2^63 — overflow-free in ANY engine
# (DuckDB errors on BIGINT overflow rather than wrapping)
_MULT = 2654435761
_PRIME = 1_000_003


def hash_bucket(id_col: str | Column, buckets: int = 1000, seed: int = 42) -> Column:
    """Uniform pseudo-random bucket in [0, buckets) from an integer id.
    Shared arithmetic with the SQL oracle:
    (((id + seed) % PRIME) * MULT) % buckets — all non-negative int64."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    mixed = F.pmod(c.cast("long") + F.lit(seed), F.lit(_PRIME)) * F.lit(_MULT)
    return F.pmod(mixed, F.lit(buckets)).cast("int")


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by id hash.

    ``weights`` maps split name → fraction (must sum to ≤ 1; remainder
    falls into the last split). A row's split never changes as the dataset
    grows — the property that keeps eval sets stable across pipeline runs.
    """
    b = hash_bucket(id_col, 1_000_000, seed)
    bounds = []
    acc = 0.0
    for name, w in weights.items():
        acc += w
        bounds.append((name, int(round(acc * 1_000_000))))
    # first matching upper bound wins; ids past the last bound fall into
    # the final split
    col = F.lit(bounds[-1][0])
    for name, upper in reversed(bounds):
        col = F.when(b < upper, F.lit(name)).otherwise(col)
    return df.withColumn(out_col, col)


def deterministic_shuffle(
    df: DataFrame, id_col: str, seed: int = 42
) -> DataFrame:
    """Reproducible global shuffle: total order by id hash. The range-
    partitioned sort is one shuffle; downstream sequential reads see a
    fixed pseudo-random order regardless of cluster layout — the
    'shuffle once, train many epochs' pattern."""
    return df.orderBy(
        hash_bucket(id_col, 1_000_000_000, seed).asc(),
        F.col(id_col).asc(),
    )


def stratified_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    n_per_group: int,
    seed: int = 42,
) -> DataFrame:
    """Exact-n deterministic sample per group: rank rows inside each group
    by id hash and keep the first ``n_per_group`` — the reproducible
    equivalent of per-stratum reservoir sampling (groups smaller than n
    are kept whole).

    One shuffle (the window partition on the group key). Ties are
    impossible for distinct ids because the rank key is (hash, id).
    Skewed strata behave like any windowed group — AQE splits the
    partitions; the per-row state is just the rank counter.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(id_col, 1_000_000_000, seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_group)
        .drop("_rk")
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Per-group deterministic downsampling (data-mixture construction):
    keep a ``rates[group]`` fraction of each group, chosen by id hash —
    stable across runs and engines, unlike ``sampleBy``."""
    b = hash_bucket(id_col, 1_000_000, seed)
    rate = F.lit(int(round(default_rate * 1_000_000)))
    for g, r in rates.items():
        rate = F.when(
            F.col(group_col) == g, F.lit(int(round(r * 1_000_000)))
        ).otherwise(rate)
    return df.filter(b < rate)


def token_budget_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    token_col: str | Column,
    budgets: dict[str, int],
    default_budget: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Budget-capped mixture construction: per group, keep documents —
    in deterministic hash order — until the group's TOKEN budget is
    exhausted (the doc that crosses the budget line is kept, so every
    non-empty group with budget > 0 contributes at least one doc and the
    taken prefix is maximal).

    This is how pretraining mixtures are actually specified ("200B tokens
    of web, 30B of code"): rate-based sampling (mixture_sample) hits a
    document COUNT fraction, this hits a token mass. Hash order makes the
    selection a pure function of ids — identical on any cluster layout
    and replayable in SQL (the oracle mirrors the same window).

    Plan: one shuffle (window partitioned by group, ordered by the id
    hash), running token sum, filter. Groups with no declared budget pass
    through whole when ``default_budget`` is None.
    """
    from pyspark.sql import Window

    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    order = hash_bucket(id_col, 2_000_000_011, seed)
    w = (
        Window.partitionBy(group_col)
        .orderBy(order.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tok).over(w)
    budget = (
        F.lit(None).cast("long")
        if default_budget is None
        else F.lit(int(default_budget))
    )
    for g, b in budgets.items():
        budget = F.when(F.col(group_col) == g, F.lit(int(b))).otherwise(budget)
    # keep while the PREVIOUS cumulative sum is under budget: the
    # crossing doc stays, everything after it goes
    return (
        df.withColumn("_cum", cum)
        .filter(budget.isNull() | (F.col("_cum") - tok < budget))
        .drop("_cum")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str | Column,
    k: int,
    seed: int = 42,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic: the
    Efraimidis–Spirakis A-Res scheme (Inf. Proc. Letters 2006) with the
    uniform draw derived from the id hash instead of rand().

    Each row gets key = -ln(u) / w  (an Exp(rate=w) variate); the k
    smallest keys are the sample — inclusion probability rises with
    weight, and the selection is a pure function of (id, weight, seed),
    so it replays identically on any cluster layout and in the SQL twin.

    Rows with NULL or non-positive weight are excluded (a zero-weight row
    has inclusion probability 0; E-S keys are undefined for w <= 0).

    Plan shape: the order-by-key + limit compiles to
    ``TakeOrderedAndProject`` — a per-partition k-heap and a single
    k-sized merge on the driver, never a global sort. At 100 TB this is
    the same shape as any top-k: linear scan, O(k) state per task.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    # u in (0, 1]: bucket+1 over PRIME+1 — never 0, so ln(u) is finite
    u = (hash_bucket(id_col, _PRIME, seed) + F.lit(1)).cast("double") / F.lit(
        float(_PRIME + 1)
    )
    key = -F.log(u) / w.cast("double")
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("_es_key", key)
        .orderBy(F.col("_es_key").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("_es_key")
    )


def temperature_rates(
    df: DataFrame,
    group_col: str,
    mass_col: str | Column | None = None,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled mixture rates per domain (the multilingual /
    multi-domain rebalancing rule from Devlin et al. 2019 / Conneau &
    Lample 2019): target share q_g ∝ p_g**alpha, realized by per-group
    DOWNsampling only — rate_g = (q_g / p_g) scaled so the largest rate
    is exactly 1 (no group is upsampled; alpha=1 keeps everything,
    alpha→0 flattens toward uniform).

    ``mass_col`` is what p_g measures (token counts for pretraining
    mixtures); None counts documents. Returns one row per group:
    (group, n_rows, mass, rate_ppm) with the rate as integer
    parts-per-million — ready for the hash-threshold filter in
    ``temperature_sample`` and exactly reproducible in SQL.

    Plan shape: ONE map-side-partial aggregation over the corpus, then
    arithmetic on the G-row result (G = #domains, tiny); the max-rate
    scaling is a broadcast of a single scalar. Nothing here grows with
    corpus size except the first agg's scan.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    m = (
        F.count(F.lit(1))
        if mass_col is None
        else F.sum(F.col(mass_col) if isinstance(mass_col, str) else mass_col)
    )
    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"), m.cast("double").alias("_mass")
    )
    # q_g/p_g ∝ p_g**(alpha-1) ∝ mass**(alpha-1): the total cancels, so
    # no second pass for Σmass is needed — only the max for scaling
    raw = per.withColumn("_raw", F.pow("_mass", F.lit(alpha - 1.0)))
    mx = raw.agg(F.max("_raw").alias("_mx"))
    return (
        raw.join(F.broadcast(mx))
        .withColumn(
            "rate_ppm",
            F.round(F.col("_raw") / F.col("_mx") * 1_000_000).cast("long"),
        )
        .withColumn("mass", F.col("_mass").cast("long"))
        .select(group_col, "n_rows", "mass", "rate_ppm")
    )


def temperature_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    mass_col: str | Column | None = None,
    alpha: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Apply :func:`temperature_rates` as a deterministic filter: keep a
    row iff its id hash-bucket (out of 1e6) falls below its group's
    rate_ppm. The G-row rates table broadcasts onto the corpus — one agg
    pass + one broadcast-join filter pass, no shuffle of the corpus."""
    from orientdb_etl_spark.operators.relational import join_back_null_safe

    rates = temperature_rates(df, group_col, mass_col, alpha)
    b = hash_bucket(id_col, 1_000_000, seed)
    return (
        join_back_null_safe(
            df, F.broadcast(rates.select(group_col, "rate_ppm")), [group_col]
        )
        .filter(b < F.col("rate_ppm"))
        .drop("rate_ppm")
    )


def quantile_bucket(
    df: DataFrame,
    score_col: str,
    k: int = 3,
    out_col: str = "score_bucket",
) -> DataFrame:
    """Assign each row to one of ``k`` exact score-quantile buckets —
    the CCNet discipline (Wenzek et al., LREC 2020: corpora split into
    perplexity head/middle/tail and sampled per bucket).

    Scale shape: the k-1 boundaries come from ONE single-row exact
    ``percentile`` aggregate that broadcasts back as a scalar attach;
    each row's bucket is then the count of boundaries strictly below its
    score — a pure expression. The tempting alternative, ``ntile(k)``
    over a global ORDER BY, is the anti-pattern: an unpartitioned window
    funnels the whole table through one task. Boundary ties go to the
    LOWER bucket (score == boundary counts as not-above), identically in
    the SQL twin; a NULL score yields a NULL bucket (percentile ignores
    nulls, so they belong to no quantile — filter or impute upstream).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    probs = ", ".join(str(i / k) for i in range(1, k))
    stats = df.agg(
        F.expr(f"percentile({score_col}, array({probs}))").alias("_qb")
    )
    return (
        df.join(F.broadcast(stats))
        .withColumn(
            out_col,
            F.expr(
                # NULL scores must yield a NULL bucket (they belong to no
                # quantile) — without the outer CASE the NULL comparison
                # falls into ELSE 0 and unscored rows silently flood the
                # head bucket
                f"CASE WHEN {score_col} IS NULL THEN NULL ELSE "
                f"aggregate(_qb, 0, (acc, b) -> acc + "
                f"CASE WHEN {score_col} > b THEN 1 ELSE 0 END) END"
            ),
        )
        .drop("_qb")
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    by: str | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Winsorization: clip values to the [lower, upper] exact-percentile
    bounds (globally or per group) — the outlier treatment that KEEPS the
    row (contrast mad_outliers, which flags/drops). Standard before
    computing means/variances that a single glitch value would dominate.

    Plan shape: one grouped (or scalar) exact-percentile aggregation
    whose tiny result broadcasts back; the clip itself is a pure
    projection. At 100 TB use percentile_approx for the bounds — the
    attach/clip shape is unchanged. NULL values pass through NULL
    (percentile ignores them; clipping them would invent data).
    """
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower < upper <= 1, got {lower}, {upper}")
    out_col = out_col or value_col
    bounds_agg = F.expr(
        f"percentile({value_col}, array({lower}, {upper}))"
    ).alias("_wb")
    if by is not None:
        from orientdb_etl_spark.operators.relational import (
            join_back_null_safe,
        )

        # NULL-SAFE attach: keep NULL-group rows (their own percentile
        # bounds) instead of silently dropping them
        bounds = df.groupBy(by).agg(bounds_agg)
        joined = join_back_null_safe(df, F.broadcast(bounds), [by])
    else:
        joined = df.join(F.broadcast(df.agg(bounds_agg)))
    return joined.withColumn(
        out_col,
        F.when(
            F.col(value_col).isNull(), F.lit(None).cast("double")
        ).otherwise(
            F.greatest(
                F.element_at("_wb", 1),
                F.least(F.element_at("_wb", 2), F.col(value_col).cast("double")),
            )
        ),
    ).drop("_wb")


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str | Column,
    k: int,
    seed: int = 42,
) -> DataFrame:
    """Efraimidis–Spirakis weighted sampling WITHIN each group: k rows
    per group, inclusion probability rising with weight, deterministic
    (same hash-derived keys as :func:`weighted_sample`). The grouped
    complement — per-domain quality-weighted draws in one pass.

    Plan: one shuffle (window partition on the group key); the
    rank-filter compiles to WindowGroupLimit with a partial pre-shuffle
    prune, so each map task ships at most groups×k candidate rows.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (hash_bucket(id_col, _PRIME, seed) + F.lit(1)).cast("double") / F.lit(
        float(_PRIME + 1)
    )
    key = -F.log(u) / w.cast("double")
    win = Window.partitionBy(group_col).orderBy(
        key.asc(), F.col(id_col).asc()
    )
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("_rk", F.row_number().over(win))
        .filter(F.col("_rk") <= int(k))
        .drop("_rk")
    )


def negative_samples(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    k: int = 3,
    seed: int = 7,
) -> DataFrame:
    """Deterministic negative sampling for recommender training: for
    every user, ``k`` items they did NOT interact with, picked by the
    shared Knuth hash over (user, item) — reproducible across runs and
    engines, unlike RNG-based sampling. Returns ``(user, item, rank)``
    with rank 1..k in hash order. Items must be integer ids (hash
    arithmetic); users with fewer than ``k`` non-items get what exists.

    Scale shape: candidates are users × the DISTINCT item vocabulary —
    this implementation targets the bounded-vocabulary regime (brands,
    categories, warehouses: the item frame broadcasts; candidate count
    = |users|·|items|). For web-scale item sets, pre-bucket items by
    hash and sample within the user's probe buckets instead — the
    LSH-bucketed ANN discipline; this operator documents the boundary
    rather than silently degrading. The anti-join against interactions
    is one shuffle on (user, item); the per-user pick is a keyed window
    over ≤ |items| rows per user.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    u = interactions.select(F.col(user_col).alias("_u")).distinct()
    it = interactions.select(F.col(item_col).alias("_i")).distinct()
    seen = interactions.select(
        F.col(user_col).alias("_u"), F.col(item_col).alias("_i")
    ).distinct()
    cand = u.crossJoin(F.broadcast(it)).join(seen, ["_u", "_i"], "left_anti")
    # two Knuth rounds with the seed added AFTER the first scramble: an
    # additive pre-scramble seed would make seed+1 equivalent to item+1
    # (a shift), leaving per-user pick ORDER nearly seed-insensitive on
    # contiguous item-id ranges
    m1 = F.pmod(
        F.pmod(
            F.col("_u").cast("long") * 131 + F.col("_i").cast("long"),
            F.lit(_PRIME),
        )
        * F.lit(_MULT),
        F.lit(_PRIME),
    )
    hsh = F.pmod(
        F.pmod(m1 + F.lit(seed), F.lit(_PRIME)) * F.lit(_MULT),
        F.lit(1_000_000_000),
    )
    w = Window.partitionBy("_u").orderBy(hsh.asc(), F.col("_i").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select(
            F.col("_u").alias(user_col),
            F.col("_i").alias(item_col),
            "rank",
        )
        .orderBy(user_col, "rank")
    )


def rendezvous_shards(
    df: DataFrame,
    key_col: str,
    shards: int = 8,
    seed: int = 0,
    out_col: str = "shard",
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment: each key
    goes to the shard with the maximal portable hash h(key, s) — the
    routing rule whose defining property is MINIMAL DISRUPTION: growing
    from k to k+1 shards moves only the ~1/(k+1) of keys whose new
    shard wins, never a full rehash (Thaler & Ravishankar 1996; what
    consistent hashing approximates). Returns the input with ``out_col``
    attached.

    Scale shape: the ×shards explode runs over the DISTINCT-key frame
    only; winner = max hash with first-winner (smallest s) tie-break via
    one grouped aggregate — deterministic and identical in the SQL twin;
    the assignment joins back on the key (co-partitioned with the
    distinct's shuffle). Duplicate input rows keep their multiplicity;
    NULL keys get a NULL shard. The hash is the repo-wide Knuth
    scramble, so any engine can recompute the routing.
    """
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    keys = df.select(F.col(key_col)).where(F.col(key_col).isNotNull()).distinct()
    e = keys.withColumn(
        "_s", F.explode(F.expr(f"sequence(0, {int(shards) - 1})"))
    ).withColumn(
        "_h",
        F.expr(
            f"({key_col} + _s * 7919 + {int(seed)}) % 1000003 "
            f"* 2654435761 % 1000003"
        ),
    )
    hm = e.groupBy(key_col).agg(F.max("_h").alias("_hm"))
    asg = (
        e.join(hm, key_col)
        .where(F.col("_h") == F.col("_hm"))
        .groupBy(key_col)
        .agg(F.min("_s").cast("int").alias(out_col))
    )
    return df.join(asg, key_col, "left")


def neyman_allocation(
    df: DataFrame,
    strata: "str | list[str]",
    value_col: str,
    total_n: int,
    scale: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """Optimal (Neyman 1934) sample-size allocation across strata for a
    fixed total budget: ``n_h ∝ N_h · S_h`` — strata that are bigger or
    more variable get more of the sample, which minimizes the variance
    of the stratified mean estimator. This is the DESIGN step that
    :func:`stratified_sample` then executes (use ``alloc_n / n_rows``
    as each stratum's rate). Integer allocations come from the
    largest-remainder method, so they sum EXACTLY to ``total_n``
    (when any stratum has positive variance; zero-variance strata
    carry weight 0 — one row from them determines the stratum mean).
    Returns ``(*strata, n_rows, stddev, weight, share, alloc_n)``.

    Determinism: moments accumulate as exact BIGINT sums of integer
    ``scale``-ths; the variance/stddev/share chain is a fixed double
    expression over those exact integers, so both engines compute the
    identical allocation (ties in the remainder rank break on the
    stratum key). The largest-remainder rank is a window over the
    strata-sized frame — bounded by the number of strata by
    construction, never by row volume; everything upstream is ONE
    map-side-combinable aggregate.
    """
    strata = [strata] if isinstance(strata, str) else list(strata)
    if total_n < 1:
        raise ValueError(f"total_n must be >= 1, got {total_n}")
    per = (
        df.where(
            F.col(value_col).isNotNull()
            & F.expr(" AND ".join(f"{s} IS NOT NULL" for s in strata))
        )
        .groupBy(*strata)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.floor(F.col(value_col) * scale).cast("long")
            ).alias("_s1"),
            F.sum(
                F.floor(F.col(value_col) * scale).cast("long")
                * F.floor(F.col(value_col) * scale).cast("long")
            ).alias("_s2"),
        )
    )
    sd = F.when(
        F.col("n_rows") > 1,
        F.sqrt(
            F.greatest(
                (
                    F.col("_s2").cast("double")
                    - F.col("_s1").cast("double")
                    * F.col("_s1").cast("double")
                    / F.col("n_rows")
                )
                / (F.col("n_rows") - 1),
                F.lit(0.0),
            )
        ),
    ).otherwise(F.lit(0.0))
    wtd = per.withColumn("_sd", sd).withColumn(
        "weight", F.col("n_rows") * F.col("_sd")
    )
    tot = wtd.agg(F.sum("weight").alias("_tw"))
    shared = wtd.crossJoin(F.broadcast(tot)).withColumn(
        "share",
        F.when(F.col("_tw") > 0, F.col("weight") / F.col("_tw")).otherwise(
            F.lit(0.0)
        ),
    )
    base = shared.withColumn(
        "_base", F.floor(F.lit(int(total_n)) * F.col("share")).cast("long")
    ).withColumn(
        "_frac", F.lit(int(total_n)) * F.col("share") - F.col("_base")
    )
    sumbase = base.agg(F.sum("_base").alias("_sb"))
    # largest-remainder rank: window over the strata-sized frame only
    w = Window.orderBy(F.col("_frac").desc(), *[F.col(s).asc() for s in strata])
    return (
        base.crossJoin(F.broadcast(sumbase))
        .withColumn("_rk", F.row_number().over(w))
        .select(
            *strata,
            "n_rows",
            F.round(F.col("_sd") / scale, round_to).alias("stddev"),
            F.round(F.col("weight") / scale, round_to).alias("weight"),
            F.round("share", round_to).alias("share"),
            (
                F.col("_base")
                + (
                    F.col("_rk") <= F.lit(int(total_n)) - F.col("_sb")
                ).cast("long")
            ).alias("alloc_n"),
        )
        .orderBy(*strata)
    )


def unimax_allocation(
    df: DataFrame,
    group_col: str,
    token_col: str,
    budget: int,
    max_epochs: float = 4.0,
    round_to: int = 4,
) -> DataFrame:
    """UniMax (Chung et al., ICLR 2023) budget allocation: distribute a
    token ``budget`` across groups (languages/sources) as uniformly as
    possible subject to a per-group repeat cap of ``max_epochs`` — the
    principled alternative to temperature sampling that never oversamples
    a small group past the cap and never starves large ones.

    The published algorithm is a sequential water-filling fold (ascending
    group size; each group takes ``min(cap, remaining/groups_left)``).
    That fold has a closed form: caps ascend with size, and once one
    group takes the equal share every later group does too (the share is
    invariant under equal-share steps), so a group is CAPPED iff
    ``cap_i · (L − i + 1) ≤ budget − Σ_{j<i} cap_j`` over the
    cap-ascending order. The prefix arithmetic runs as JVM higher-order
    functions over ONE collected groups-sized array (the unigram-lattice
    pattern: group count — languages/sources — is spec-bounded, never
    row-bounded, so the 1-row state is the cheapest correct shape): one
    corpus aggregation (per-group token totals), one keyless
    collect+sort, a prefix-sum ``transform``, and a ``posexplode`` back
    to rows. No window, no joins, two exchanges total.

    Returns ``(group_col, n_tokens, cap_tokens, quota, epochs)`` where
    ``quota`` is the allocated token count (``round_to`` dp) and
    ``epochs = quota / n_tokens``. Caps are pinned to integer tokens
    (``floor(n_tokens · max_epochs)``) so the prefix arithmetic is exact
    BIGINT in both engines; ties in the cap order break on the group key.

    Cite: reference has no counterpart; SURVEY §2.8 mixture-planning
    family (temperature_rates' principled sibling).
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    per = (
        df.where(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(F.sum(F.col(token_col).cast("long")).alias("n_tokens"))
        .withColumn(
            "cap_tokens",
            F.floor(F.col("n_tokens") * F.lit(float(max_epochs))).cast(
                "long"
            ),
        )
    )
    # 1-row state: (cap_tokens, group, n_tokens) structs, cap-ascending
    # (struct comparison orders by field position; group breaks ties)
    packed = per.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("cap_tokens").alias("cap"),
                    F.col(group_col).alias("grp"),
                    F.col("n_tokens").alias("nt"),
                )
            )
        ).alias("gs")
    )
    # prefix sums + capped flags + capped totals, all inside the array
    # (O(L²) slice-sums on the groups-sized frame — bounded by spec)
    flagged = packed.select(
        F.expr(
            "transform(gs, (g, i) -> struct("
            "g.cap AS cap, g.grp AS grp, g.nt AS nt, "
            "g.cap * (size(gs) - i) <= {budget} - aggregate("
            "slice(gs, 1, i), CAST(0 AS BIGINT), (a, x) -> a + x.cap"
            ") AS capped))".format(budget=int(budget))
        ).alias("gs")
    ).select(
        "gs",
        F.expr(
            "aggregate(gs, CAST(0 AS BIGINT), "
            "(a, x) -> a + IF(x.capped, x.cap, CAST(0 AS BIGINT)))"
        ).alias("_capped_sum"),
        F.expr(
            "aggregate(gs, 0, (a, x) -> a + IF(x.capped, 1, 0))"
        ).alias("_n_capped"),
        F.size("gs").alias("_L"),
    )
    g = F.col("_g")
    return (
        flagged.select(
            F.posexplode("gs").alias("_i", "_g"),
            "_capped_sum",
            "_n_capped",
            "_L",
        )
        .select(
            g["grp"].alias(group_col),
            g["nt"].alias("n_tokens"),
            g["cap"].alias("cap_tokens"),
            F.round(
                F.when(g["capped"], g["cap"].cast("double")).otherwise(
                    (
                        F.lit(float(budget))
                        - F.col("_capped_sum").cast("double")
                    )
                    / (F.col("_L") - F.col("_n_capped"))
                ),
                round_to,
            ).alias("quota"),
        )
        .withColumn(
            "epochs",
            F.round(F.col("quota") / F.col("n_tokens"), round_to),
        )
        .select(group_col, "n_tokens", "cap_tokens", "quota", "epochs")
    )


def cluster_split(
    df: DataFrame,
    cluster_col: str,
    weights: dict[str, float],
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: hash the CLUSTER id instead
    of the row id, so every member of a duplicate / near-duplicate cluster
    lands in the SAME split.

    Plain :func:`hash_split` by row id leaks: two near-copies of one
    document straddle train and test, and the eval set silently scores
    memorization (the contamination mode the GPT-3/PaLM reports document
    for their pre-dedup splits). Feeding this the cluster id from any of
    the dedup operators (exact fingerprint groups, minhash components,
    SemDeDup buckets) closes that channel while keeping the assignment
    deterministic, engine-portable integer arithmetic — a row's split
    never changes as the corpus grows, and :func:`split_leakage_report`
    certifies zero spanning clusters after the fact (the PREVENTION
    side of ``dedup.split_leakage``, which detects the leaking
    fingerprints in an existing assignment).

    ``cluster_col`` must be integer-shaped (use the cluster's min member
    id, the convention every dedup operator here follows).
    """
    return hash_split(df, cluster_col, weights, seed=seed, out_col=out_col)


def split_leakage_report(
    df: DataFrame, cluster_col: str, split_col: str
) -> DataFrame:
    """One-row leakage certificate for ANY split assignment: how many
    clusters span more than one split, and how bad the worst one is.

    Returns ``(n_clusters, n_spanning, max_splits_per_cluster)`` — the
    QA gate to run after a split lands: ``n_spanning`` must be 0 for a
    leakage-safe split, and is measured (two hash aggregations over
    cluster-sized state), not assumed.
    """
    per = df.groupBy(cluster_col).agg(
        F.countDistinct(split_col).alias("_n_splits")
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum((F.col("_n_splits") > 1).cast("long")).alias("n_spanning"),
        F.max("_n_splits").alias("max_splits_per_cluster"),
    )
