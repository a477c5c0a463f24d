"""Space-filling-curve data layout: Z-order (Morton) keys and clustering.

At 100 TB the dominant cost of a spatial query is how many files it has
to open.  Writing the fact table clustered by a Z-order key over (x, y)
makes every file's min/max column statistics a tight 2-D tile, so a
lon/lat range predicate prunes to O(touched tiles) files instead of
scanning everything — the same reason the raster exporters keep
`cell_id = y*nx + x` row-major (exports/netcdf.py) but generalized to
queries that slice BOTH axes.

Everything here is pure JVM column arithmetic (shifts/masks inside
whole-stage codegen); the clustering itself is ``repartitionByRange`` on
the key — one skew-free range shuffle, sorted within partitions so
parquet row-group stats line up with the curve.

Reference: emiproc keeps rasters as dense in-memory arrays per file
(e.g. ``emiproc/exports/rasters.py``); a cluster-scale engine instead
encodes the locality into the table layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(xcol: Column | str, ycol: Column | str, bits: int) -> Column:
    """Morton-interleave two non-negative integer columns into one key.

    Bit ``b`` of x lands at key bit ``2b``, bit ``b`` of y at ``2b+1``;
    ``bits`` bounds each input.  2·bits ≤ 62 keeps the key in a BIGINT.

    Inputs are VALIDATED into [0, 2**bits): an out-of-range or negative
    value would silently drop its high (or smear its sign) bits, making
    distant rows share a key — the layout then interleaves far-apart
    tiles into the same files and the min/max pruning the curve exists
    for quietly degrades.  NULL coordinates raise too (a NULL key would
    range-partition all such rows into one lump).
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    lim = 1 << bits

    def _bounded(col: Column | str, name: str) -> Column:
        c = F.col(col).cast("long") if isinstance(col, str) else col.cast("long")
        return F.when(
            c.isNull() | (c < 0) | (c >= lim),
            F.raise_error(
                F.concat(
                    F.lit(f"zorder_key: {name} out of range [0, {lim}): "),
                    F.coalesce(c.cast("string"), F.lit("NULL")),
                )
            ).cast("long"),
        ).otherwise(c)

    x = _bounded(xcol, "x")
    y = _bounded(ycol, "y")
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return z


def zorder_key_sql(x_expr: str, y_expr: str, bits: int) -> str:
    """The same interleave as ANSI SQL (oracle counterpart)."""
    # DuckDB/Postgres give |, & and << the SAME precedence (left-assoc),
    # so every term must be fully parenthesized or the ORs get re-shifted
    terms = []
    for b in range(bits):
        terms.append(f"(((({x_expr}) >> {b}) & 1) << {2 * b})")
        terms.append(f"(((({y_expr}) >> {b}) & 1) << {2 * b + 1})")
    return "(" + " | ".join(terms) + ")"


def cluster_by_zorder(
    df: DataFrame,
    xcol: str,
    ycol: str,
    bits: int,
    num_partitions: int,
    key_col: str = "zkey",
) -> DataFrame:
    """Cluster rows along the Z-curve: add the key, range-partition on
    it (skew-free — range bounds come from a sample), sort within each
    partition.  Writing the result gives files whose (x, y) min/max
    stats are compact tiles; ``layout_extents`` measures that.

    Tile tightness is bounded by the RANGE-BOUNDARY sampling error:
    Spark's range exchange samples
    ``spark.sql.execution.rangeExchange.sampleSizePerPartition`` rows
    (default 100) per input partition, and noisy boundaries split
    z-tiles into elongated unions (measured on a 1M-point lattice:
    worst bbox-area/rows ≈ 8.7× at the default vs 1.0× at 20k samples
    — tests/test_scale_smoke.py).  For a clustering WRITE — paid once,
    read forever — raise the conf; sampling cost is negligible next to
    the sort.
    """
    with_key = df.withColumn(key_col, zorder_key(xcol, ycol, bits))
    return with_key.repartitionByRange(
        num_partitions, F.col(key_col)
    ).sortWithinPartitions(key_col)


def layout_extents(
    df: DataFrame,
    xcol: str,
    ycol: str,
    key_col: str,
    prefix_shift: int,
) -> DataFrame:
    """Per-curve-prefix bounding boxes: group by ``key >> prefix_shift``
    and report row count and x/y extents.  On a Z-ordered layout each
    prefix is a tile with extent ≤ 2**ceil(prefix_shift/2) per axis —
    the file-skipping guarantee made measurable (and oracle-checkable).
    """
    return (
        df.groupBy(
            F.shiftright(F.col(key_col), prefix_shift).alias("z_prefix")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.min(xcol).alias("x_min"),
            F.max(xcol).alias("x_max"),
            F.min(ycol).alias("y_min"),
            F.max(ycol).alias("y_max"),
        )
    )
