"""Deterministic sampling and source mixing for training-data curation.

``rand()`` is engine- and partitioning-dependent, so sampled corpora
built with it are irreproducible across runs/engines.  Everything here
derives the keep/drop decision from a hash of the row's stable key:
``hash_fraction`` maps a key to a uniform [0,1) double via the first 8
hex digits of md5 — bit-identical in any engine with md5, embarrassingly
parallel (map-only, no shuffle), and stable under repartitioning.

Mixing (``mixture_rates``) solves the standard curation problem: given
per-source token counts and target mixture weights, the acceptance
rate per source that hits a global token budget — two tiny aggregates
broadcast back over the corpus, then a map-only filter.

Beyond-parity: reference has no sampling surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from emiproc_spark.localdf import local_rows_df

HASH_DENOM = float(16**8)  # first 8 md5 hex digits → uniform [0, 1)


def hash_fraction(key: F.Column, salt: str = "") -> F.Column:
    """Uniform [0,1) double, a pure function of ``key`` (map-only).

    ``salt`` decorrelates the coins of *chained* sampling stages: two
    filters on the same key with the same salt are perfectly correlated
    (the second keeps ``min(r1, r2)``, not ``r1·r2``), so every
    independent decision in a pipeline must use its own salt."""
    frac = (
        F.conv(
            F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8),
            16,
            10,
        ).cast("long")
        / F.lit(HASH_DENOM)
    )
    # a NULL key hashes to NULL, and NULL < rate filters the row out at
    # EVERY rate (sample_fraction(df, 1.0) would silently lose it, and a
    # shard assignment would be NULL) — a keyless row is a caller bug
    return F.when(
        key.isNull(),
        F.raise_error(
            F.lit(
                "hash_fraction: NULL sampling key — fill or drop keyless "
                "rows before sampling/sharding"
            )
        ).cast("double"),
    ).otherwise(frac)


def sql_hash_fraction(expr: str, salt: str = "") -> str:
    """DuckDB rendering of :func:`hash_fraction` (no conv(); digit-wise
    base-16 accumulation over the same 8 md5 hex digits)."""
    h = f"md5(CAST(({expr}) AS VARCHAR) || '{salt}')"
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}.0"
        for i in range(8)
    )
    return f"(({digits}) / {HASH_DENOM})"


def sample_fraction(
    df: DataFrame, rate: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows, keyed on
    ``key_col`` — same rows every run, any partitioning."""
    return df.where(hash_fraction(F.col(key_col), salt) < F.lit(float(rate)))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "source",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum → acceptance rate.

    The rate table is a broadcast join (dimension-sized); the filter
    itself is map-only, so the whole op adds zero shuffles to the scan.
    """
    spark = df.sparkSession
    # internal name: a business column called "rate" on df must not
    # collide with the broadcast rate table
    rate_df = local_rows_df(
        spark,
        [(k, float(v)) for k, v in rates.items()],
        f"{stratum_col} string, __rate double",
    )
    return (
        df.join(F.broadcast(rate_df), stratum_col, "left")
        .withColumn("__rate", F.coalesce("__rate", F.lit(float(default_rate))))
        .where(hash_fraction(F.col(key_col), salt) < F.col("__rate"))
        .drop("__rate")
    )


def mixture_rates(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: float,
    stratum_col: str = "source",
    size_col: str = "n_tokens",
) -> DataFrame:
    """Acceptance rate per source to hit ``token_budget`` total tokens
    in the target mixture ``weights`` (normalized internally).

    rate_s = min(1, budget·w_s / tokens_s): one hash-agg over the corpus
    (map-side partials), the rest is arithmetic on a dimension-sized
    table.  Feed the result to :func:`apply_mixture`.

    A stratum whose token sum is zero or all-NULL gets rate 0.0 —
    an unguarded ``budget·w/0`` is NULL, which ``F.least`` SKIPS,
    silently producing rate 1.0 and keeping the entire unsampled
    source (the same hazard :func:`mixture_plan` documents and guards).
    """
    spark = df.sparkSession
    wsum = sum(weights.values())
    w_df = local_rows_df(
        spark,
        [(k, float(v) / wsum) for k, v in weights.items()],
        f"{stratum_col} string, weight double",
    )
    totals = df.groupBy(stratum_col).agg(F.sum(size_col).alias("stratum_tokens"))
    tokens = F.coalesce(F.col("stratum_tokens").cast("double"), F.lit(0.0))
    return (
        totals.join(w_df, stratum_col, "inner")
        .select(
            stratum_col,
            F.when(
                tokens > 0.0,
                F.least(
                    F.lit(1.0),
                    F.lit(float(token_budget)) * F.col("weight") / tokens,
                ),
            ).otherwise(F.lit(0.0)).alias("rate"),
        )
    )


def mixture_plan(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: float,
    max_epochs: float = 4.0,
    stratum_col: str = "source",
    size_col: str = "n_tokens",
) -> DataFrame:
    """Data-constrained mixture planning table (the accounting step
    before :func:`apply_mixture_epochs`): per source, how many tokens
    the target mixture asks for, how many exist, and the resulting
    sampling rate — ABOVE 1.0 meaning multi-epoch up-sampling, capped
    at ``max_epochs`` (repeating data beyond a few epochs stops
    helping, per the data-constrained scaling literature), with the
    unfillable remainder reported as ``deficit_tokens`` so the caller
    can re-weight instead of silently training on a different mixture.

    One hash-agg over the corpus (map-side partials); everything else
    is arithmetic on the dimension-sized totals.  No cross-domain
    renormalization is attempted — the deficit column is the honest
    signal.

    Returns (stratum, avail_tokens, target_tokens, epochs,
    achieved_tokens, deficit_tokens): ``epochs`` ≤ 1 is a plain
    acceptance rate, > 1 means ⌊epochs⌋ full passes plus a fractional
    pass.  Every weighted source gets a row even when the corpus has
    no tokens for it (avail_tokens 0, epochs 0, deficit = the full
    target); corpus sources absent from ``weights`` are weight-0 by
    definition and are omitted.
    """
    if max_epochs < 1.0:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    spark = df.sparkSession
    wsum = sum(weights.values())
    w_df = local_rows_df(
        spark,
        [(k, float(v) / wsum) for k, v in weights.items()],
        f"{stratum_col} string, weight double",
    )
    totals = df.groupBy(stratum_col).agg(
        F.sum(size_col).cast("double").alias("avail_tokens")
    )
    target = F.lit(float(token_budget)) * F.col("weight")
    # a weighted source with NO corpus rows (right join below keeps it)
    # or zero/NULL tokens must plan epochs=0 with the full target as
    # deficit — an inner join / unguarded division would either drop
    # the row entirely (silently training on a different mixture) or
    # turn target/0 into NULL, which F.least skips, silently planning
    # max_epochs over nothing
    avail = F.coalesce(F.col("avail_tokens"), F.lit(0.0))
    epochs = F.when(
        avail > 0.0,
        F.least(F.lit(float(max_epochs)), target / avail),
    ).otherwise(F.lit(0.0))
    achieved = F.least(target, avail * F.lit(float(max_epochs)))
    return totals.join(w_df, stratum_col, "right").select(
        stratum_col,
        avail.alias("avail_tokens"),
        target.alias("target_tokens"),
        epochs.alias("epochs"),
        achieved.alias("achieved_tokens"),
        (target - achieved).alias("deficit_tokens"),
    )


def apply_mixture_epochs(
    df: DataFrame,
    plan: DataFrame,
    stratum_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mixep",
) -> DataFrame:
    """Materialize a :func:`mixture_plan`: up-sample under-represented
    sources by replication (⌊epochs⌋ full passes + one hash-thinned
    fractional pass) and down-sample over-represented ones (epochs < 1
    degenerates to a single thinned pass) — in one map-only stage.

    Replication is an explode over ``sequence(0, ⌈epochs⌉−1)`` (row
    count bounded by epochs ≤ max_epochs, no shuffle); the fractional
    pass flips a per-(key, epoch) coin, so each extra epoch is an
    independent uniform thinning and chained stages stay decorrelated
    through ``salt``.  The emitted ``epoch`` column distinguishes
    replicas so downstream packing/shuffling can interleave them.
    """
    plan_b = F.broadcast(plan.select(stratum_col, "epochs"))
    # epochs == 0 (zero weight / zero budget) must yield ZERO rows:
    # without the filter, sequence(0, ceil(0)-1) = sequence(0, -1)
    # counts DOWN to [0, -1] and epoch=-1 would pass the keep
    # predicate unconditionally
    joined = df.join(plan_b, stratum_col, "inner").where(
        F.col("epochs") > 0
    )
    n_rep = F.ceil("epochs").cast("int")
    rep = joined.withColumn(
        "epoch", F.explode(F.sequence(F.lit(0), n_rep - F.lit(1)))
    )
    frac = F.col("epochs") - F.floor("epochs")
    coin = hash_fraction(
        F.concat(
            F.col(key_col).cast("string"),
            F.lit("#"),
            F.col("epoch").cast("string"),
        ),
        salt,
    )
    # full epochs pass unconditionally; the last (fractional) epoch
    # keeps frac of its rows — when epochs is an exact integer there is
    # no fractional epoch at all (n_rep == floor(epochs))
    keep = (F.col("epoch") < F.floor("epochs")) | (coin < frac)
    return rep.where(keep).drop("epochs")


def apply_mixture(
    df: DataFrame,
    rates: DataFrame,
    stratum_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Filter the corpus by per-stratum rates (broadcast + map-only).

    Default ``salt="mix"`` keeps this stage's coin independent of an
    upstream :func:`stratified_sample` on the same key — without it the
    two filters correlate and the kept fraction is ``min(r1, r2)``
    instead of ``r1·r2`` (mixture budget badly overshot)."""
    return (
        df.join(
            F.broadcast(rates.withColumnRenamed("rate", "__rate")),
            stratum_col,
            "inner",
        )
        .where(hash_fraction(F.col(key_col), salt) < F.col("__rate"))
        .drop("__rate")
    )


def temperature_rates(
    df: DataFrame,
    temperature: float,
    token_budget: float,
    stratum_col: str = "source",
    size_col: str = "n_tokens",
) -> DataFrame:
    """Temperature-scaled mixture weights from the corpus itself —
    the multilingual-sampling rule (p_s ∝ share_s^τ): τ=1 keeps natural
    proportions, τ→0 approaches uniform over sources, boosting the tail.

    One hash-agg over the corpus; the exponentiation and normalization
    run on the dimension-sized per-source table (window over strata —
    bounded by the number of sources).  Feed to :func:`apply_mixture`.

    A zero/all-NULL-token stratum gets rate 0.0 AND weight 0 in the
    normalization (pow(0, τ) would give it a full uniform share at
    τ=0) — the same F.least-skips-NULL hazard :func:`mixture_rates`
    guards.
    """
    from pyspark.sql import Window

    if temperature < 0:
        raise ValueError("temperature must be >= 0")
    totals = df.groupBy(stratum_col).agg(F.sum(size_col).alias("stratum_tokens"))
    # dimension-sized global window: one row per source
    w = Window.partitionBy()
    tokens = F.coalesce(F.col("stratum_tokens").cast("double"), F.lit(0.0))
    powed = totals.withColumn(
        "__p",
        F.when(tokens > 0.0, F.pow(tokens, float(temperature))).otherwise(
            F.lit(0.0)
        ),
    )
    return powed.select(
        stratum_col,
        F.when(
            tokens > 0.0,
            F.least(
                F.lit(1.0),
                F.lit(float(token_budget))
                * (F.col("__p") / F.sum("__p").over(w))
                / tokens,
            ),
        ).otherwise(F.lit(0.0)).alias("rate"),
    )


def diversity_sample(
    embeddings: DataFrame,
    dim: int,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Coverage-preserving down-sample: one representative per
    hyperplane-LSH bucket (beyond reference — the semantic-diversity
    sampler a pretraining mix uses to thin over-represented content
    while keeping every region of embedding space populated).

    Composition of :func:`operators.similarity.lsh_buckets` (sign-bit
    bucket over ``planes`` deterministic hyperplanes) with a min-id
    keep.  Returns (bucket, keeper, n_members).  Plan: map-only bucket
    assignment + ONE shuffle on the bucket key with map-side combine —
    scales like a word count regardless of corpus size.
    """
    from emiproc_spark.operators.similarity import lsh_buckets

    return (
        lsh_buckets(embeddings, dim, planes, vec_col)
        .groupBy("bucket")
        .agg(
            F.min(id_col).alias("keeper"),
            F.count("*").alias("n_members"),
        )
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    by: list[str] | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-Res): the k rows with the largest ES key
    ``u^(1/w)``, ranked in the LOG DOMAIN as ``ln(u)/w`` (``u`` is the
    row's :func:`hash_fraction` coin) — each row's inclusion
    probability is proportional to its weight, and the selection is a
    pure function of (key, salt), reproducible across runs, engines,
    and partitionings.

    Log domain matters: the direct ``pow(u, 1/w)`` UNDERFLOWS to
    exactly 0.0 for small weights (normalized weights over a large
    corpus, w ≈ 1e-6 ⇒ 99.9% of rows score 0.0), silently turning the
    "weighted sample" into smallest-key-first tie-breaking.
    ``ln(u)/w`` orders identically (exp is monotone) and never
    underflows this way.

    ``by`` selects k per group instead of k overall.  Rows with NULL or
    non-positive weight have selection probability 0 and are excluded.

    Scale shape: the global form compiles to TakeOrderedAndProject
    (per-partition partial top-k, no global sort); the grouped form is
    one shuffle on ``by`` + a windowed row_number.

    NOTE (cross-engine parity): ``ln`` differs from other engines'
    libm in the last ulp for a small share of inputs, so compare
    *selections*, not the score values — a flip requires two scores
    within 1 ulp exactly at rank k.
    """
    if k < 1:
        raise ValueError(f"weighted_sample: k must be >= 1, got {k}")
    u = hash_fraction(F.col(key_col), salt)
    w = F.col(weight_col).cast("double")
    # NaN > 0 is TRUE in Spark's ordering and a NaN score sorts above
    # every real score — without the isnan() exclusion a NaN-weighted
    # row would always win a slot.  The u > 0 guard covers the
    # 2^-53-probability exact-zero coin (ln(0) is NULL in Spark, which
    # would sort unpredictably; -inf is the correct minimal score).
    d = df.where(
        F.col(weight_col).isNotNull() & ~F.isnan(w) & (w > 0)
    ).withColumn(
        "__es",
        F.when(u > 0, F.log(u) / w).otherwise(F.lit(float("-inf"))),
    )
    if by:
        from pyspark.sql import Window

        w = Window.partitionBy(*by).orderBy(F.col("__es").desc(), F.col(key_col))
        return (
            d.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k)
            .drop("__es", "__rn")
        )
    return d.orderBy(F.col("__es").desc(), F.col(key_col)).limit(k).drop("__es")


def sql_weighted_es_key(key_expr: str, weight_expr: str, salt: str = "") -> str:
    """DuckDB rendering of the log-domain Efraimidis–Spirakis score
    used by :func:`weighted_sample` (same coin via
    :func:`sql_hash_fraction`, same zero-coin guard)."""
    coin = sql_hash_fraction(key_expr, salt)
    return (
        f"CASE WHEN {coin} > 0 THEN ln({coin}) / ({weight_expr}) "
        f"ELSE -1e308 END"
    )


def hash_split(
    df: DataFrame,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic DISJOINT dataset split — the train/val/test
    assignment every training pipeline needs: each row lands in exactly
    one split by where its hash fraction falls in the cumulative
    fraction ladder (the LAST split absorbs rounding, so the splits are
    exhaustive by construction).

    Keyed on ``key_col`` (not on row order or partitioning), so the
    assignment is stable across runs, cluster sizes, and data layout —
    and a grown corpus keeps every previously-assigned row in its
    split.  Map-only: no shuffle, no sampling state.

    NULL keys RAISE: a NULL has no hash fraction, so it cannot be
    hash-distributed — silently letting the otherwise-chain funnel all
    null-keyed rows into the last split would skew it (the loud
    contract, matching dedup_keep_best's id guard).

    Returns the input with ``split_col`` appended.
    """
    if not fractions or len(fractions) < 2:
        raise ValueError("hash_split needs at least two splits")
    total = sum(fractions.values())
    if any(v <= 0 for v in fractions.values()) or abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"split fractions must be positive and sum to 1, got {fractions}"
        )
    r = hash_fraction(F.col(key_col), salt)
    names = list(fractions)
    expr = F.lit(names[-1])  # last split takes the remainder
    cum = 0.0
    bounds: list[tuple[str, float]] = []
    for name in names[:-1]:
        cum += fractions[name]
        bounds.append((name, cum))
    for name, b in reversed(bounds):
        expr = F.when(r < F.lit(b), F.lit(name)).otherwise(expr)
    expr = F.when(
        F.col(key_col).isNull(),
        F.raise_error(
            F.lit(f"hash_split: NULL {key_col} cannot be hash-assigned")
        ).cast("string"),
    ).otherwise(expr)
    return df.withColumn(split_col, expr)


def cluster_split(
    df: DataFrame,
    pairs: DataFrame,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Leakage-FREE dataset split: near-duplicate clusters are atomic.

    ``hash_split`` keyed on raw ids lets correlated documents straddle
    the train/eval boundary — exactly what the ``split_leakage`` audit
    measures.  This operator closes the hole: every document is
    assigned the split of its duplicate-cluster REPRESENTATIVE (the
    connected-component minimum over ``pairs``; isolated documents
    represent themselves), so two documents with a near-dup path
    between them land in the SAME split by construction.

    Composition, not new semantics: logarithmic connected components
    over the (sparse, pair-sized) dup graph, a join back to the corpus
    (component table ≪ corpus — broadcast/AQE), then the identical
    deterministic hash ladder as :func:`hash_split` evaluated on the
    representative id.  Same stability guarantees: assignment depends
    only on (representative, salt), never on partitioning or run.
    """
    from emiproc_spark.operators.cluster import connected_components

    # reserved alias: a corpus that already carries a business column
    # named "component" (plausible straight out of a dedup pipeline)
    # would otherwise make the coalesce below an AMBIGUOUS_REFERENCE
    comp = connected_components(pairs, a_col=a_col, b_col=b_col).select(
        F.col("node").alias(key_col), F.col("component").alias("__component")
    )
    rep = F.coalesce(F.col("__component"), F.col(key_col))
    joined = (
        df.join(comp, key_col, "left")
        .withColumn("__rep", rep)
        .drop("__component")
    )
    return hash_split(
        joined, fractions, key_col="__rep", salt=salt, split_col=split_col
    ).drop("__rep")
