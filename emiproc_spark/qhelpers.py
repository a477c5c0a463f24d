"""Parity arithmetic helpers shared by every driver-contract query.

Aggregation order differs between Spark and DuckDB, so no plain double
sum can hash-match.  Per-row double arithmetic IS bit-identical across
engines (same IEEE ops), and ``FLOOR(x·s + 0.5)`` is pure IEEE too — so
sums quantize per-row to int64, add exactly, and divide back.  CAST to
DECIMAL is *not* usable: Spark rounds the exact decimal expansion while
DuckDB disagrees near ties.
"""

from __future__ import annotations

from pyspark.sql import functions as F

QSCALE = 1_000_000.0  # µ-quantization for emission/price-sized values
QR = 1e9  # output quantization for ratio-sized values


def sumd(col) -> F.Column:
    """Order-insensitive exact sum of doubles (µ-quantized), as double."""
    c = F.col(col) if isinstance(col, str) else col
    q = F.floor(c * F.lit(QSCALE) + F.lit(0.5)).cast("long")
    return F.sum(q).cast("double") / F.lit(QSCALE)


def sql_sumd(expr: str) -> str:
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * {QSCALE} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / {QSCALE}"
    )


def qd(col, scale: float = QR) -> F.Column:
    """Quantize a small double (ratios, factors) so sub-ulp engine
    differences (e.g. fold-order in renormalization) collapse."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def sql_qd(expr: str, scale: float = QR) -> str:
    return f"FLOOR(({expr}) * {scale} + 0.5) / {scale}"


# Below this the fan-out work itself is trivial and the round-robin
# exchange would cost more than it buys (dimension-sized inputs:
# profile tables, small candidate lists).  Deliberately small — a
# compacted 600 KB parquet of documents still amplifies ~100× under
# the shingle explode and MUST keep widening (the round-6 bench win).
WIDEN_MIN_BYTES = 32 * 1024


def widen_for_fanout(df, min_bytes: int = WIDEN_MIN_BYTES):
    """Repartition a fact relation up to the cluster's default
    parallelism BEFORE a row-amplifying map stage (hour fan-out,
    shingle explode + hashing).  Compacted small inputs can present
    1-3 scan partitions, serializing the expensive map work on a
    many-core executor; at scale inputs already exceed
    defaultParallelism and this is a no-op (no shuffle).

    The gate reads the OPTIMIZED LOGICAL plan's size estimate (for a
    parquet scan: the file bytes Spark itself uses to cut scan splits)
    instead of ``df.rdd.getNumPartitions()`` — the RDD conversion
    forced physical planning per call and pinned a pre-AQE shape.  The
    logical pass is computed on the DataFrame's own QueryExecution and
    is reused when the query runs, so the check is ~free.  Widen only
    when the estimate sits in the window where it matters:

    - below ``min_bytes`` the input is dimension-sized — the fan-out
      is trivial and the exchange would dominate (skip);
    - above ``defaultParallelism × maxPartitionBytes`` a *splittable
      file scan* already yields at least one split per core — but a
      size estimate alone cannot tell that apart from a single-split
      gzip or a LogicalRDD/localCheckpoint lineage whose estimate is
      the ``defaultSizeInBytes`` sentinel (Long.MAX), exactly the
      few-partition shapes this helper exists to fix.  On this branch
      fall back to the OBSERVED partition count and widen when it is
      below parallelism.  The RDD conversion forces one physical
      planning pass, but only on this branch — genuinely big scans hit
      it once per query build, and dimension/bench-sized inputs (the
      per-call hot path) never do;
    - in between, one round-robin exchange spreads the amplification
      across the cluster.
    """
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    try:
        size = int(
            str(
                df._jdf.queryExecution()
                .optimizedPlan()
                .stats()
                .sizeInBytes()
            )
        )
        max_pb = int(
            spark._jsparkSession.sessionState().conf().filesMaxPartitionBytes()
        )
    except Exception:  # stats unavailable: keep the input untouched
        return df
    if size < min_bytes:
        return df
    if size < par * max_pb:
        return df.repartition(par)
    try:  # huge or sentinel estimate: trust observed partitions instead
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df.repartition(par) if n < par else df


def sql_floor_div(expr: str, p: int) -> str:
    """DuckDB rendering of int64 FLOOR division by a positive constant.

    DuckDB's integer ``//`` TRUNCATES toward zero (``-1 // 7 = 0``), so
    a bare ``//`` would diverge from the engines' floor-bucket
    operators on pre-1970 timestamps; subtracting the positive modulus
    first makes the numerator an exact multiple, where truncation and
    floor coincide — mirroring the Spark side's pmod + DIV."""
    p = int(p)
    if p <= 0:
        raise ValueError(f"period must be positive, got {p}")
    return f"(({expr}) - (((({expr}) % {p}) + {p}) % {p})) // {p}"
