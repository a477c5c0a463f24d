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


def widen_for_fanout(df):
    """Repartition a fact relation up to the cluster's default
    parallelism BEFORE a row-amplifying map stage (hour fan-out,
    shingle explode + hashing).  Compacted small inputs can present
    1-3 scan partitions, serializing the expensive map work on a
    many-core executor; at scale inputs already exceed
    defaultParallelism and this is a no-op (no shuffle)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


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
