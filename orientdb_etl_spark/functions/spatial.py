"""Spatial radius join on an integer grid (cell blocking).

All pairs of points within Euclidean distance ``r`` — the proximity
join behind store/competitor analysis, sensor clustering, and
dedup-by-location — WITHOUT the all-pairs cross join: bucket every
point into a square cell of side ``r``; any pair within distance ``r``
differs by at most one cell per axis, so probing the 3×3 neighborhood
of each point's cell finds every qualifying pair exactly once (the
right side is indexed at its OWN cell only, so no distinct/dedup pass
is ever needed on the pair stream).

Integer discipline: coordinates are integers and the predicate is
``(x1-x2)² + (y1-y2)² <= r²`` — pure BIGINT arithmetic, so the
boundary decision is EXACT and replays bit-identically in any engine
(a float haversine/sqrt predicate would wobble at the radius boundary
and flip pair membership between engines).

Scale shape: one explode (×9) on the probe side, ONE equi-join
shuffled on the cell key; cell population is bounded by point density
× r², not by data volume, and hot cells can be salted like any skewed
equi-join. The cell key doubles as the partition key for a
pre-bucketed layout at 100 TB (partition pruning ≙ the probe's 3×3
scan). No counterpart in the reference (no spatial surface in its
operator table, SURVEY §2.3); §2.8 extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["grid_radius_join", "grid_density_clusters"]


def grid_radius_join(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> DataFrame:
    """All pairs ``(id_a < id_b, dist2)`` with
    ``(xa-xb)² + (ya-yb)² <= radius²`` over integer coordinates.
    ``dist2`` is the exact squared distance (BIGINT — callers wanting
    the metric distance take ``sqrt`` themselves; the join predicate
    never leaves integer arithmetic). NULL coordinates never match.
    """
    if radius <= 0:
        raise ValueError(f"radius must be a positive integer, got {radius}")
    r = int(radius)
    pts = df.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("bigint").alias("_x"),
        F.col(y_col).cast("bigint").alias("_y"),
    ).where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    # floor division via floor(x / r): exact for |x| < 2^52 and correct
    # (floorlike, not trunclike) for negative coordinates
    cell = lambda c: F.floor(F.col(c) / F.lit(r)).cast("bigint")  # noqa: E731
    indexed = pts.select(
        "_id", "_x", "_y", cell("_x").alias("_cx"), cell("_y").alias("_cy")
    )
    off = F.expr("explode(arrays_zip(array(-1,-1,-1,0,0,0,1,1,1), "
                 "array(-1,0,1,-1,0,1,-1,0,1)))")
    probe = indexed.select(
        F.col("_id").alias("_ida"),
        F.col("_x").alias("_xa"),
        F.col("_y").alias("_ya"),
        off.alias("_o"),
        "_cx",
        "_cy",
    ).select(
        "_ida",
        "_xa",
        "_ya",
        (F.col("_cx") + F.col("_o")["0"]).alias("_cx"),
        (F.col("_cy") + F.col("_o")["1"]).alias("_cy"),
    )
    right = indexed.select(
        F.col("_id").alias("_idb"),
        F.col("_x").alias("_xb"),
        F.col("_y").alias("_yb"),
        "_cx",
        "_cy",
    )
    dist2 = F.expr("(_xa - _xb) * (_xa - _xb) + (_ya - _yb) * (_ya - _yb)")
    return (
        probe.join(right, ["_cx", "_cy"])
        .where(F.col("_ida") < F.col("_idb"))
        .withColumn("dist2", dist2)
        .where(F.col("dist2") <= r * r)
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            "dist2",
        )
    )


def grid_density_clusters(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    eps: int,
    min_pts: int = 4,
    driver_cells_cap: int = 100_000,
) -> DataFrame:
    """Grid-density clustering (the STING/CLIQUE family — Wang et al.
    VLDB'97, Agrawal et al. SIGMOD'98; the grid-quantized cousin of
    DBSCAN): quantize points into square cells of side ``eps``, call a
    cell DENSE when it holds ≥ ``min_pts`` points, and define clusters
    as connected components of dense cells under 8-neighborhood
    adjacency. Every point in a dense cell gets its component's label
    (the minimum cell key); points in sparse cells are NOISE
    (``cluster`` NULL). Exact, deterministic semantics — no
    density-reachability tie-breaks, which is what makes the result
    oracle-checkable, unlike seed-order-dependent DBSCAN itself.

    Scale shape: ONE hash aggregation computes cell occupancy (the only
    pass over the points until the final label join); the adjacency
    graph lives on DENSE CELLS — bounded by area/eps², not by data
    volume — so the 9-offset explode, the adjacency equi-join, and the
    connected-components contraction (:func:`~orientdb_etl_spark.functions.dedup.connected_component_labels`,
    log-round star contraction) all run on a frame that is tiny at any
    corpus size. The final point labeling is one equi-join on the cell
    key against that bounded label table (broadcastable). This is the
    DBSCAN shape that survives 100 TB: density estimation by grid
    aggregation, never a pairwise neighborhood query.

    Component resolution is two-tier: the dense-cell graph is counted
    first, and up to ``driver_cells_cap`` cells it is collected for a
    driver-side union-find — the cell graph is bounded by GEOMETRY
    (area/eps²), not by data volume, so this is the same bounded-driver-
    state trade as ``ivf_index``'s centroid sample, and it avoids paying
    the multi-round distributed contraction's fixed latency for a frame
    that fits in one task. Above the cap (enormous domains / tiny eps)
    it falls back to the log-round star contraction
    (:func:`~orientdb_etl_spark.functions.dedup.connected_component_labels`)
    with no driver state. Both tiers produce the identical min-key
    labels.

    Returns ``(id, cell_x, cell_y, cluster)`` — one row per input point
    with non-NULL coordinates.
    """
    if eps <= 0:
        raise ValueError(f"eps must be a positive integer, got {eps}")
    if min_pts < 1:
        raise ValueError(f"min_pts must be >= 1, got {min_pts}")
    from orientdb_etl_spark.functions.dedup import connected_component_labels

    e = int(eps)
    cell = lambda c: F.floor(F.col(c).cast("bigint") / F.lit(e)).cast(  # noqa: E731
        "bigint"
    )
    pts = df.select(
        F.col(id_col).alias("_id"),
        cell(x_col).alias("_cx"),
        cell(y_col).alias("_cy"),
    ).where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    # cell key: collision-free pack of (cx, cy) into one BIGINT —
    # cx·2³² + (cy + 2³¹) is a bijection while both cell indices fit in
    # int32 (product spans exactly [-2⁶³, 2⁶³-1], no overflow); cell
    # indices outside int32 raise rather than silently merging clusters
    dense = (
        pts.groupBy("_cx", "_cy")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= int(min_pts))
        .select("_cx", "_cy")
        .localCheckpoint(eager=True)  # dense cells: bounded by area/eps²
    )
    # validate BEFORE deriving the packed key so the overflow surfaces
    # as a ValueError, not a codegen ArithmeticException
    bounds = dense.agg(
        F.max(F.greatest(F.abs(F.col("_cx")), F.abs(F.col("_cy")))).alias(
            "_b"
        )
    ).first()
    if bounds["_b"] is not None and bounds["_b"] > 2_147_483_647:
        raise ValueError(
            "grid_density_clusters: cell index exceeds int32 "
            f"(max |index| = {bounds['_b']}); shrink the coordinate "
            "domain or increase eps"
        )
    key = (
        F.col("_cx") * F.lit(4_294_967_296)
        + F.col("_cy")
        + F.lit(2_147_483_648)
    ).alias("_k")
    cells = dense.select("_cx", "_cy", key)
    off = F.expr(
        "explode(arrays_zip(array(-1,-1,-1,0,0,0,1,1,1), "
        "array(-1,0,1,-1,0,1,-1,0,1)))"
    )
    probe = cells.select(F.col("_k").alias("keep_id"), off.alias("_o"), "_cx", "_cy").select(
        "keep_id",
        (F.col("_cx") + F.col("_o")["0"]).alias("_cx"),
        (F.col("_cy") + F.col("_o")["1"]).alias("_cy"),
    )
    adj = (
        probe.join(cells.select(F.col("_k").alias("dup_id"), "_cx", "_cy"), ["_cx", "_cy"])
        .where(F.col("keep_id") < F.col("dup_id"))
        .select("keep_id", "dup_id")
    )
    n_cells = cells.count()
    if n_cells <= driver_cells_cap:
        # driver union-find over the geometry-bounded cell graph; the
        # adj.collect() below is bounded by the SAME cap that gates this
        # branch — each cell has ≤ 8 neighbour offsets, so the edge list
        # is ≤ 8 × driver_cells_cap rows (the distributed fallback takes
        # over past the cap)
        parent: dict[int, int] = {}

        def find(a: int) -> int:
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        keys = [r["_k"] for r in cells.select("_k").collect()]
        for k in keys:
            parent[k] = k
        for r in adj.collect():
            ra, rb = find(r["keep_id"]), find(r["dup_id"])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # path-compress to the component minimum (min-key label)
        lbl = [(k, find(k)) for k in keys]
        spark = df.sparkSession
        labels = spark.createDataFrame(lbl, "id bigint, label bigint")
    else:
        labels = connected_component_labels(adj)
    labeled_cells = cells.join(
        F.broadcast(labels.withColumnRenamed("id", "_k")), "_k", "left"
    ).select(
        "_cx", "_cy", F.coalesce(F.col("label"), F.col("_k")).alias("cluster")
    )
    return pts.join(labeled_cells, ["_cx", "_cy"], "left").select(
        F.col("_id").alias("id"),
        F.col("_cx").alias("cell_x"),
        F.col("_cy").alias("cell_y"),
        "cluster",
    )
