"""Multi-dimensional data-layout clustering (Z-order / Morton curve).

The parquet loader's ``sortBy`` gives file-level data skipping on ONE sort
dimension; queries that filter on a second column still scan everything.
Interleaving the bits of several normalized key columns into one Morton
key (Morton 1966; the technique behind Z-ORDER clustering in modern
lakehouse table formats) makes files near-disjoint in EVERY participating
dimension at once, so parquet row-group min/max stats prune selective
predicates on any of them.

Scale shape: one single-row min/max aggregate per write (broadcast scalar
attach — no driver collect in the plan), then the key is a pure JVM
bit-arithmetic expression (whole-stage codegen), then the exact same
``repartitionByRange + sortWithinPartitions`` shuffle the single-dim
layout already pays. Cost at 100 TB: one extra agg pass; the clustering
shuffle is unchanged.

Reference parity: the reference has no layout control at all (its loader
writes rows in arrival order — `OOrientDBLoader.java:214-247`); this is a
scale-path extension like the rest of §2.8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_interleave_sql", "add_zorder_key", "zorder_write"]


def zorder_interleave_sql(scaled: list[str], bits: int) -> str:
    """The bit-interleave as portable SQL text over pre-scaled BIGINT
    expressions in ``[0, 2^bits)``: column i contributes its bit b at
    output position ``b * k + i``. Plain ``>> & <<`` arithmetic — valid
    (and identical) in both Spark SQL and DuckDB, which is what lets the
    correctness gate replay the exact key relationally."""
    k = len(scaled)
    terms = [
        f"((({s}) >> {b} & 1) << {b * k + i})"
        for b in range(bits)
        for i, s in enumerate(scaled)
    ]
    # disjoint bit positions -> sum == bitwise or
    return "(" + " + ".join(terms) + ")"


def _scaled_exprs(cols: list[str], bits: int, idiv: str = "div") -> list[str]:
    """Per-column normalization to ``[0, 2^bits)`` against the attached
    ``_zmin_i`` / ``_zmax_i`` scalars: integer arithmetic only, so engines
    cannot disagree on rounding; nulls clamp to 0 (they sort first, same
    as a plain sort would put them). ``idiv`` is the engine's integer-
    division token — ``div`` (Spark SQL) or ``//`` (DuckDB); everything
    else in the generated text is common SQL.

    Overflow-safe by construction: the obvious ``(c - min) * top / rng``
    wraps int64 once rng > 2^63/top (epoch-microsecond spans, snowflake
    ids) and silently interleaves garbage. Instead each value first
    divides by a bucket WIDTH = rng div 2^bits + 1 (bounds it to
    [0, 2^bits) for ANY int64 range, no multiplication on the raw
    value), then multiplies by an integer STRETCH = 2^bits div (vmax+1)
    so a narrow-range column still spans the high bits — otherwise a
    150-value key interleaved against a 9000-value key would contribute
    only low-order bits and lose its weight in the curve. The product is
    bounded by 2^(2*bits) < 2^63 for every legal ``bits``. Trade: up to
    one bit of resolution per column, irrelevant for file clustering."""
    top = (1 << bits) - 1
    out = []
    for i, c in enumerate(cols):
        rng = f"greatest(_zmax_{i} - _zmin_{i}, 1)"
        width = f"(({rng}) {idiv} {top + 1}) + 1"
        vmax = f"(({rng}) {idiv} ({width}))"
        stretch = f"({top + 1} {idiv} ({vmax} + 1))"
        out.append(
            f"coalesce(((cast({c} as bigint) - _zmin_{i}) {idiv} ({width}))"
            f" * {stretch}, 0)"
        )
    return out


def add_zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16, out_col: str = "zkey"
) -> DataFrame:
    """Append the Morton key column. ``cols`` must be numeric (convert
    dates first, e.g. ``datediff(col, '1970-01-01')`` — ANSI mode rejects
    a direct date→bigint cast); ``bits`` per dimension — k*bits must fit
    a signed 64-bit key, so k=2 allows up to 31 bits, k=4 up to 15."""
    if len(cols) * bits > 63:
        raise ValueError(
            f"{len(cols)} cols x {bits} bits = {len(cols) * bits} key bits "
            "> 63; lower bits"
        )
    aggs = []
    for i, c in enumerate(cols):
        aggs.append(F.min(F.col(c).cast("bigint")).alias(f"_zmin_{i}"))
        aggs.append(F.max(F.col(c).cast("bigint")).alias(f"_zmax_{i}"))
    stats = df.agg(*aggs)
    key = zorder_interleave_sql(_scaled_exprs(cols, bits), bits)
    return (
        df.join(F.broadcast(stats))
        .withColumn(out_col, F.expr(key))
        .drop(*[f"_zmin_{i}" for i in range(len(cols))])
        .drop(*[f"_zmax_{i}" for i in range(len(cols))])
    )


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    num_files: int = 0,
    keep_key: bool = False,
) -> DataFrame:
    """The clustering recipe itself — key, range-partition, sort within
    each task, optionally drop the key (a per-row projection; order
    within the partition is preserved). Shared by :func:`zorder_write`
    and the parquet loader's ``zorderBy`` option so the layout cannot
    silently diverge between the two entry points."""
    keyed = add_zorder_key(df, cols, bits=bits)
    parted = (
        keyed.repartitionByRange(num_files, "zkey")
        if num_files
        else keyed.repartitionByRange("zkey")
    ).sortWithinPartitions("zkey")
    return parted if keep_key else parted.drop("zkey")


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int = 0,
    keep_key: bool = False,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet Z-ordered on ``cols``
    (:func:`zorder_layout`). Every output file then covers a narrow
    range in EVERY clustered dimension and parquet footer stats prune
    on any of them."""
    zorder_layout(
        df, cols, bits=bits, num_files=num_files, keep_key=keep_key
    ).write.mode(mode).parquet(path)


def file_key_ranges(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-file min/max/count audit of a parquet layout — one row per
    physical file with each column's value range. This is the same
    information parquet footer stats give the scan planner; surfacing it
    as a DataFrame makes clustering quality MEASURABLE: after
    :func:`zorder_write`, every file should cover a narrow slice of every
    clustered dimension (so predicate pushdown prunes most files), while
    an unsorted write shows near-full-range files that prune nothing.

    One aggregation keyed by ``input_file_name()`` — file count many
    groups, trivially small output.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)
