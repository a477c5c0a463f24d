"""Table profiling: per-column statistics in one distributed pass.

A training-data pipeline's first question about a new 100 TB drop is
"what's in it" — row count, null rates, cardinalities, ranges — before
any curation runs.  ``profile_table`` answers it with ONE aggregation
job over the table (all columns' stats ride the same shuffle; the
multi-distinct aggregate plans as Spark's Expand — a #distinct-aggs
row multiplication, the standard engine strategy, NOT one scan per
column) and returns a long-form frame: one row per profiled column.

Beyond-reference component (the reference's inventories are validated
by hand-picked asserts; there is no generic profiler).  Numeric sums go
through the µ-quantized ``sumd`` so results are engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

from emiproc_spark.localdf import local_rows_df

from emiproc_spark.qhelpers import qd, sumd_safe


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column stats: non-null count, exact distinct count, min/max
    (as strings, so heterogeneous columns share one schema) and the
    quantized sum for numeric columns.

    One aggregation over the input produces a single wide row, which is
    then exploded to one row per column — no per-column scans, no
    driver-side loop over data.

    ``sum_num`` goes through the overflow-safe quantized sum
    (``qhelpers.sumd_safe``): quanta accumulate in DECIMAL(38,0) so no
    row count can wrap the sum, and a column holding ANY value beyond
    the quantizable magnitude (epoch-ns timestamps, 64-bit hash ids,
    NaN/Inf) reports ``sum_num`` NULL — honestly absent, never silently
    wrapped — while its count/distinct/min/max still profile normally.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_table: no such columns {missing}")
    if not cols:
        raise ValueError("profile_table: no columns to profile")

    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for i, c in enumerate(cols):
        numeric = isinstance(df.schema[c].dataType, NumericType)
        aggs += [
            F.count(c).alias(f"__nn_{i}"),
            F.count_distinct(c).alias(f"__nd_{i}"),
            F.min(c).cast("string").alias(f"__min_{i}"),
            F.max(c).cast("string").alias(f"__max_{i}"),
            (
                sumd_safe(F.col(c).cast("double"))
                if numeric
                else F.lit(None).cast("double")
            ).alias(f"__sum_{i}"),
        ]
    wide = df.agg(*aggs)

    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n_rows").alias("n_rows"),
            F.col(f"__nn_{i}").alias("n_nonnull"),
            F.col(f"__nd_{i}").alias("n_distinct"),
            F.col(f"__min_{i}").alias("min_str"),
            F.col(f"__max_{i}").alias("max_str"),
            F.col(f"__sum_{i}").alias("sum_num"),
        )
        for i, c in enumerate(cols)
    ]
    return wide.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


# number of leading md5 hex digits used as the KMV hash value: 12 hex
# digits = 48 bits, exactly representable in a double and plenty of
# resolution for the (k-1)/h_k estimator
_KMV_HEX_DIGITS = 12


def _hex_prefix_value(col: Column, digits: int = _KMV_HEX_DIGITS) -> Column:
    """Numeric value of the first ``digits`` hex chars of a lowercase
    hex string (≤ 13 digits: must stay under 2^53 for the double)."""
    if digits > 13:
        raise ValueError("hex prefix must fit exactly in a double")
    return F.conv(F.substring(col, 1, digits), 16, 10).cast("double")


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per group, plus the
    exact count for calibration.

    The classic mergeable cardinality sketch (Bar-Yossef et al. 2002):
    hash every value, keep the k smallest hashes per group; if fewer
    than k distinct hashes exist the count is exact, else estimate
    D ≈ (k−1)/h_k with h_k the k-th smallest hash normalized to [0,1).
    The hash is md5 — deterministic and available in every engine, so
    the estimate itself is oracle-checkable (unlike HLL, whose register
    layout is engine-private).  Hex strings of fixed width order
    lexicographically exactly as their numeric values, so the k-th
    minimum is found by plain string sort.

    Scale shape: one distinct on (group, hash), then a sort-based
    window ranking within each group (spillable; the per-group state
    the estimator finally needs is k rows).  On a cluster you would
    materialize the k-row sketches per partition and merge — the
    estimator column here is exactly that mergeable sketch's read-out.

    Returns (group_cols..., n_exact, kmv_estimate) with the estimate
    quantized for cross-engine comparison.
    """
    if k < 2:
        raise ValueError("kmv_distinct needs k >= 2")
    h = F.md5(F.col(value_col).cast("string")).alias("__h")
    d = df.select(*group_cols, h).where(F.col("__h").isNotNull()).distinct()
    wr = Window.partitionBy(*group_cols).orderBy("__h")
    wa = Window.partitionBy(*group_cols)
    ranked = d.select(
        *group_cols,
        "__h",
        F.row_number().over(wr).alias("__rn"),
        F.count("*").over(wa).alias("n_exact"),
    ).where(F.col("__rn") <= k)
    kth = ranked.groupBy(*group_cols, "n_exact").agg(
        F.max("__h").alias("__kth"), F.count("*").alias("__n_in")
    )
    hk = _hex_prefix_value(F.col("__kth")) / F.lit(float(16**_KMV_HEX_DIGITS))
    est = F.when(
        F.col("__n_in") < k, F.col("n_exact").cast("double")
    ).otherwise(F.lit(float(k - 1)) / hk)
    return kth.select(
        *group_cols,
        F.col("n_exact").cast("long").alias("n_exact"),
        qd(est, 1e6).alias("kmv_estimate"),
    )


def value_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    z: float = 3.0,
) -> DataFrame:
    """Per-group z-score outlier detection — the first-pass anomaly
    screen over a metrics/telemetry table.

    Mean and variance come from overflow-safe µ-quantized sums
    (``qhelpers.sumd_safe``), so the moments — and therefore every
    z-score and the outlier decision — are addition-order-free,
    engine-reproducible, and can never silently WRAP: the old int64
    accumulation of Σx² wrapped after ~9e4 rows at |v|≈1e4, producing
    garbage variance exactly at production scale.  Quanta now
    accumulate in DECIMAL(38,0) (exact at any row count); a group
    holding ANY value beyond the quantizable magnitude (|v| or v²
    above ~8e9, NaN/Inf) gets NULL moments, flags no outliers, and
    reports ``max_abs_z`` NULL — visibly absent, never wrapped.
    Variance uses the sample (n−1) denominator via Σx² − n·mean².
    Rows in groups with fewer than 2 values or zero variance are never
    outliers.

    Scale shape: ONE aggregate for the per-group moments (bounded by
    group count, broadcast back), then a map-only scoring pass —
    the fact table is scanned twice but never shuffled beyond the
    moment aggregate.

    NULL group KEYS form their own group (the scoring join is
    null-safe — the same semantics as groupBy and group_quantiles).
    Internal columns are ``__``-prefixed, so an input column named
    ``n`` no longer collides with the group-count column.

    Returns (group_cols..., n, n_outliers, max_abs_z) per group.
    """
    if z <= 0:
        raise ValueError(f"z must be > 0, got {z}")
    v = F.col(value_col).cast("double")
    moments = df.groupBy(*group_cols).agg(
        F.count(value_col).alias("__n"),
        sumd_safe(v).alias("__s1"),
        sumd_safe(v * v).alias("__s2"),
    )
    mean = F.col("__s1") / F.col("__n")
    var = F.when(
        F.col("__n") > 1,
        (F.col("__s2") - F.col("__n") * mean * mean) / (F.col("__n") - 1),
    )
    moments = moments.withColumn("__mean", mean).withColumn(
        "__sd", F.sqrt(F.when(var > 0, var))
    )
    zscore = (v - F.col("__mean")) / F.col("__sd")
    # null-safe join so NULL group keys score against their own
    # moments row — the same groupBy semantics as group_quantiles
    moments = moments.select(
        *[F.col(g).alias(f"__g_{g}") for g in group_cols],
        "__n", "__mean", "__sd",
    )
    cond = [F.col(g).eqNullSafe(F.col(f"__g_{g}")) for g in group_cols]
    scored = df.join(F.broadcast(moments), cond).select(
        *group_cols,
        F.col("__n"),
        zscore.alias("__z"),
    )
    return (
        scored.groupBy(*group_cols, "__n")
        .agg(
            F.count(F.when(F.abs(F.col("__z")) > z, 1)).alias("n_outliers"),
            qd(F.max(F.abs(F.col("__z"))), 1e6).alias("max_abs_z"),
        )
        .select(
            *group_cols, F.col("__n").alias("n"), "n_outliers", "max_abs_z"
        )
    )


def group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    value_quantum: float | None = None,
) -> DataFrame:
    """Exact per-group percentiles (type-7 linear interpolation) via
    the histogram reduction — the grouped generalization of
    ``text.length_percentiles``.

    ``percentile`` aggregates buffer every value per group; instead the
    distribution reduces to one histogram row per (group, distinct
    value) — ONE shuffle over the fact table with map-side partial
    counts — and the interpolation runs on that histogram:
    cumulative counts via a per-group window, the 0-based rank
    positions (N−1)·q located with one conditional-min join.
    NULL values are excluded (empty groups vanish).

    Histogram SIZE is data-dependent: for integers/codes/lengths the
    distinct-value count is dimension-sized and the post-shuffle work
    is trivial, but for a CONTINUOUS double column nearly every value
    is distinct, so the histogram is ~fact-sized — the per-group window
    and the Q-way position join then scan fact-scale rows Q times.
    For that case pass ``value_quantum`` (e.g. 0.01): values are
    pre-rounded to the nearest multiple BEFORE the histogram aggregate,
    bounding distinct values to range/quantum per group at a bounded,
    explicit precision cost (each returned quantile is within
    quantum/2 of exact, interpolation aside).  Default None = exact.

    NULL group KEYS form their own group (null-safe joins — the same
    semantics as groupBy).  Returns (group_cols..., q, value).
    """
    if not quantiles or not all(0.0 <= q <= 1.0 for q in quantiles):
        raise ValueError(f"quantiles must be within [0, 1], got {quantiles}")
    if len(set(quantiles)) != len(quantiles):
        # a repeated q would fan the position join out many-to-many
        raise ValueError(f"quantiles must be distinct, got {quantiles}")
    if value_quantum is not None and not value_quantum > 0:
        raise ValueError(f"value_quantum must be > 0, got {value_quantum}")
    spark = df.sparkSession
    v = F.col(value_col).cast("double")
    if value_quantum is not None:
        # round-half-up to the nearest quantum multiple — same rounding
        # as the µ-quantization helpers, so engine-reproducible
        v = F.floor(v / F.lit(float(value_quantum)) + F.lit(0.5)) * F.lit(
            float(value_quantum)
        )
    hist = (
        df.where(v.isNotNull())
        .groupBy(*group_cols, v.alias("__v"))
        .agg(F.count("*").alias("__cnt"))
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("__cum", F.sum("__cnt").over(w))
    totals = hist.groupBy(*group_cols).agg(F.sum("__cnt").alias("__n"))
    qdf = local_rows_df(spark, [(float(q),) for q in quantiles], "q double")
    pos = totals.crossJoin(F.broadcast(qdf)).select(
        *group_cols,
        "q",
        (F.lit(1.0) * (F.col("__n") - 1) * F.col("q")).alias("__p"),
    )
    pos = pos.select(
        *group_cols,
        "q",
        "__p",
        F.floor("__p").cast("long").alias("__lo"),
        F.ceil("__p").cast("long").alias("__hi"),
    )
    cumb = cum.select(
        *[F.col(g).alias(f"__g_{g}") for g in group_cols], "__v", "__cum"
    )
    cond = [pos[g].eqNullSafe(cumb[f"__g_{g}"]) for g in group_cols]
    # ONE histogram join: both rank positions resolve as conditional
    # mins in the same aggregate (two joins would double the only
    # non-broadcast work here)
    vv = (
        pos.join(cumb, cond)
        .groupBy(*[pos[g] for g in group_cols], "q", "__p", "__lo")
        .agg(
            F.min(F.when(F.col("__cum") >= F.col("__lo") + 1, F.col("__v"))).alias("__vlo"),
            F.min(F.when(F.col("__cum") >= F.col("__hi") + 1, F.col("__v"))).alias("__vhi"),
        )
    )
    return vv.select(
        *group_cols,
        "q",
        (
            F.col("__vlo")
            + (F.col("__vhi") - F.col("__vlo")) * (F.col("__p") - F.col("__lo"))
        ).alias("value"),
    )


def robust_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: float = 3.5,
) -> DataFrame:
    """Median/MAD outlier screen — the robust sibling of
    :func:`value_outliers`: a value is flagged when its absolute
    deviation from the group median exceeds ``k`` MADs (median absolute
    deviation).  Unlike mean/stddev z-scores, a single extreme value
    cannot inflate the threshold that hides it.

    Built on :func:`group_quantiles` (type-7 medians over the
    histogram reduction), so both medians are exact; groups with
    MAD = 0 (over half the values identical) flag every value NOT
    equal to the median whose deviation exceeds 0 — i.e. any deviation
    at all — which is the standard MAD=0 degeneracy; callers with
    heavily discrete data should screen with value_outliers instead.

    Scale shape: two histogram aggregates (median, then deviation
    median) + two broadcast joins back — the fact table is scanned
    three times, shuffled only into the two histograms; for continuous
    doubles the histograms are ~fact-sized (see group_quantiles —
    the same value_quantum consideration applies).

    NULL group keys form their own group (null-safe joins throughout).
    Returns (group_cols..., n, n_outliers, med, mad).
    """
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    v = F.col(value_col).cast("double")
    # med and mad are dimension-sized (one row per group) but their
    # group_quantiles lineage is a multi-exchange histogram pipeline
    # that NESTS (mad's histogram is built over dev, which references
    # med): without truncation the plan re-derives the quantile
    # subtree inside every reference — 62 Exchanges in the declared
    # query's physical plan vs 18 with the two checkpoints
    med = group_quantiles(df, group_cols, value_col, (0.5,)).select(
        *[F.col(g).alias(f"__g_{g}") for g in group_cols],
        F.col("value").alias("__med"),
    ).localCheckpoint(eager=False)
    cond = [F.col(g).eqNullSafe(F.col(f"__g_{g}")) for g in group_cols]
    dev = (
        df.where(v.isNotNull())
        .join(F.broadcast(med), cond)
        .select(*group_cols, v.alias("__v"), "__med")
        .withColumn("__dev", F.abs(F.col("__v") - F.col("__med")))
    )
    mad = group_quantiles(dev, group_cols, "__dev", (0.5,)).select(
        *[F.col(g).alias(f"__h_{g}") for g in group_cols],
        F.col("value").alias("__mad"),
    ).localCheckpoint(eager=False)
    cond2 = [F.col(g).eqNullSafe(F.col(f"__h_{g}")) for g in group_cols]
    scored = dev.join(F.broadcast(mad), cond2)
    return (
        scored.groupBy(*group_cols)
        .agg(
            F.count("*").alias("n"),
            F.count(
                F.when(F.col("__dev") > F.lit(float(k)) * F.col("__mad"), 1)
            ).alias("n_outliers"),
            qd(F.first("__med"), 1e6).alias("med"),
            qd(F.first("__mad"), 1e6).alias("mad"),
        )
    )


def psi_drift(
    expected: DataFrame,
    actual: DataFrame,
    value_col: str,
    breaks: list[float],
    smooth: float = 1.0,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the standard production drift monitor a data pipeline runs
    between yesterday's and today's drop (PSI < 0.1 stable, 0.1–0.25
    drifting, > 0.25 broken):

        PSI = Σ_bins (p_actual − p_expected) · ln(p_actual / p_expected)

    ``breaks`` are EXPLICIT strictly-ascending finite bin edges (B = len(breaks)+1
    bins; bin i = count of edges ≤ value), so the binning is
    engine-deterministic — derive them once from a quantile sketch if
    data-driven edges are wanted, never inside this operator.  Counts
    are Laplace-smoothed (+``smooth`` per bin) so an empty bin cannot
    produce an infinite term.  NULL values are not observations (the
    resample/robust_outliers convention).

    Scale shape: one hash aggregate per snapshot (map-side combined to
    ≤B rows), a B-row scaffold left-joined to both, totals attached by
    a broadcast 1-row cross join — the fact tables are each scanned
    exactly once, everything after is bin-count-sized.  Returns one row
    per bin: (bin, n_expected, n_actual, psi_term) with psi_term
    quantized (1e9); the caller sums psi_term for the headline number.
    """
    import math as _math

    # STRICTLY increasing finite edges: a duplicated edge defines an
    # unreachable bin whose Laplace smoothing then adds a phantom PSI
    # term to the headline sum; a NaN/Inf edge makes binning undefined
    if (
        not breaks
        or any(not _math.isfinite(float(b)) for b in breaks)
        or not all(a < b for a, b in zip(breaks, breaks[1:]))
    ):
        raise ValueError(
            "breaks must be a non-empty strictly-ascending list of "
            f"finite edges, got {breaks}"
        )
    if smooth <= 0:
        raise ValueError(f"smooth must be positive, got {smooth}")
    nb = len(breaks) + 1
    edges = F.array(*[F.lit(float(b)) for b in breaks])

    def _binned(df: DataFrame, cname: str) -> DataFrame:
        b = F.size(
            F.filter(edges, lambda t: F.col(value_col).cast("double") >= t)
        )
        return (
            df.where(F.col(value_col).isNotNull())
            .groupBy(b.cast("int").alias("bin"))
            .agg(F.count("*").alias(cname))
        )

    spark = expected.sparkSession
    scaffold = spark.range(nb).select(F.col("id").cast("int").alias("bin"))
    ec = _binned(expected, "__ce")
    ac = _binned(actual, "__ca")
    joined = (
        scaffold.join(ec, "bin", "left")
        .join(ac, "bin", "left")
        .select(
            "bin",
            F.coalesce("__ce", F.lit(0)).cast("long").alias("n_expected"),
            F.coalesce("__ca", F.lit(0)).cast("long").alias("n_actual"),
        )
    )
    totals = joined.agg(
        F.sum("n_expected").alias("__ne"), F.sum("n_actual").alias("__na")
    )
    s = float(smooth)
    w = joined.join(F.broadcast(totals))
    pe = (F.col("n_expected") + F.lit(s)) / (
        F.col("__ne") + F.lit(s * nb)
    )
    pa = (F.col("n_actual") + F.lit(s)) / (F.col("__na") + F.lit(s * nb))
    return w.select(
        "bin",
        "n_expected",
        "n_actual",
        qd((pa - pe) * F.log(pa / pe)).alias("psi_term"),
    )
