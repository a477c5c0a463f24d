"""Changelog / time-series state operators: SCD2 compaction, latest-wins
snapshots, and gap-filled resampling with last-observation-carried-forward.

A 100 TB ingestion pipeline rarely receives clean snapshots — it receives
changelogs (CDC feeds, event streams) and has to reconstruct state:

- ``scd2_compact``: collapse a changelog into type-2 slowly-changing
  dimension history — one row per *state change* with
  ``[valid_from, valid_to)`` validity and a per-key version number.
- ``latest_snapshot``: latest-wins upsert compaction (the MERGE INTO /
  "current view" read of the same changelog).
- ``resample_locf``: regularize an irregular series onto a fixed bucket
  lattice per key, carrying the last observation forward across gaps.
- ``resample_interp``: the same lattice with linear interpolation
  between the surrounding observations instead of carry-forward.
- ``apply_changelog``: MERGE INTO semantics — fold a changelog's
  latest-wins upserts and deletes into an existing snapshot.

All of these are single-pass window/aggregate plans over the key
partitioning — no self-joins, no driver materialization.  The windows of
``scd2_compact`` share one partitioning+ordering, so Catalyst plans ONE
exchange + sort for the whole chain (pinned in tests/test_plan_shapes).

Reference: the emiproc reference has no changelog model (inventories are
full snapshots, e.g. ``emiproc/inventories/__init__.py``); these extend
the engine for incremental pipelines the way ``delta_totals`` extends
the rollups.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_cols(order_by: Sequence[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_by]


def scd2_compact(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    state_cols: Sequence[str],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Collapse a changelog into SCD2 version history.

    Rows are ordered per key by ``(ts_col, *tiebreak)`` (pass a unique
    tiebreak when timestamps can collide — otherwise the change
    detection would be order-ambiguous).  Consecutive rows whose
    ``state_cols`` are unchanged collapse into one version; each
    surviving version carries ``valid_from`` (its first timestamp),
    ``valid_to`` (the next version's ``valid_from``, NULL while
    current), a 1-based ``version`` and ``is_current``.

    NULL state values are treated as a distinct state (NULL → 'x' and
    'x' → NULL are both changes), via null-safe equality.
    """
    if not state_cols:
        raise ValueError("state_cols must name at least one column")
    order = _order_cols([ts_col, *tiebreak])
    w = Window.partitionBy(*keys).orderBy(*order)
    changed = F.lit(False)
    for c in state_cols:
        prev = F.lag(F.col(c)).over(w)
        changed = changed | ~F.col(c).eqNullSafe(prev)
    # the first row per key has lag() == NULL for every state col; make
    # it an explicit version-1 row rather than relying on eqNullSafe
    first = F.lag(F.lit(1)).over(w).isNull()
    versions = df.withColumn("__new_version", first | changed).where(
        F.col("__new_version")
    )
    # same partitioning+ordering as w — no second exchange
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        versions.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("version", F.row_number().over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            *keys,
            "version",
            *state_cols,
            "valid_from",
            "valid_to",
            "is_current",
        )
    )


def latest_snapshot(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """Latest-wins compaction: the single most recent row per key.

    ``order_by`` must be a total order within a key (include a unique
    tiebreak column); the row ranking highest wins.  This is the batch
    equivalent of MERGE INTO latest-upsert semantics — one shuffle, and
    the sort is bounded per key (TopK per partition via row_number).
    """
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order_by]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def _obs_lattice(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    bucket_ns: int,
    tiebreak: Sequence[str],
    payload: Column,
) -> DataFrame:
    """Shared resample scaffolding (``resample_locf`` /
    ``resample_interp``): bucketing, per-bucket last observation,
    per-key bounds + dense lattice, and the lattice↔observation join.
    Returns ``(*keys, __bucket, __obs)`` with ``__obs`` = the caller's
    ``payload`` expression from the bucket's last observation (by
    ``ts, *tiebreak``), NULL on gap buckets.

    - Buckets are pure-int64 FLOOR division — float division of
      epoch-nanos (> 2^53) would misplace boundary timestamps by one
      bucket, and bare DIV truncates toward zero, collapsing two
      distinct pre-1970 buckets into bucket 0 (oracles mirror via
      ``sql_floor_div``).  ``ts_col`` is backtick-escaped so a quoted
      identifier cannot break out of the spliced expression.
    - NULL ``value_col`` rows are NOT observations: dropped before
      bucketing so they can never out-rank a real bucket value; a key
      whose every value is NULL disappears.
    - ``obs`` feeds BOTH the bounds/lattice branch and the join probe;
      the localCheckpoint keeps the raw event table from being scanned
      and aggregated twice (same pattern as speciate_country's
      dimension reuse).  The lattice explode is the only row
      amplification and is bounded by time span / bucket size, not by
      event count — at 100 TB the events dominate and are touched
      exactly once.
    """
    if bucket_ns <= 0:
        raise ValueError(f"bucket_ns must be positive, got {bucket_ns}")
    p = int(bucket_ns)
    q = "`" + ts_col.replace("`", "``") + "`"
    bucket = F.expr(f"({q} - pmod({q}, {p})) div {p}")
    ordkey = F.struct(F.col(ts_col), *[F.col(c) for c in tiebreak])
    obs = (
        df.where(F.col(value_col).isNotNull())
        .withColumn("__bucket", bucket)
        .groupBy(*keys, "__bucket")
        .agg(F.max_by(payload, ordkey).alias("__obs"))
        .localCheckpoint(eager=False)
    )
    bounds = obs.groupBy(*keys).agg(
        F.min("__bucket").alias("__b0"), F.max("__bucket").alias("__b1")
    )
    lattice = bounds.select(
        *keys, F.explode(F.sequence("__b0", "__b1")).alias("__bucket")
    )
    return lattice.join(obs, [*keys, "__bucket"], "left")


def resample_locf(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    bucket_ns: int,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Resample an irregular per-key series onto a fixed lattice.

    Buckets are ``floor(ts / bucket_ns)`` over integer (epoch-nano)
    timestamps.  For every key the output covers the key's own
    ``[min_bucket, max_bucket]`` range densely: buckets holding at least
    one observation emit the LAST observation's value (by
    ``ts, *tiebreak``); empty buckets carry the previous value forward
    (``is_gap = true``).  ``value_locf`` is never NULL because every
    key's lattice starts at a bucket that contains an observation.

    NULL ``value_col`` rows are NOT observations (the
    :func:`resample_interp` convention): they are dropped before
    bucketing, so a NULL row can never become a bucket representative
    — previously it could out-rank a real value in its bucket,
    discarding that value, marking the bucket a gap, and (at a key's
    first bucket) leaking NULL through the documented never-NULL
    guarantee.  A key whose every value is NULL disappears.

    Plan shape: one partial-aggregable groupBy for the per-bucket last
    observation (``max_by`` — map-side combine, no window over raw
    events), one tiny per-key bounds aggregate whose ``sequence()``
    explode builds the lattice, one join on (key, bucket), one window
    for the carry-forward.  The lattice explode is the only row
    amplification and it is bounded by the time span / bucket size, not
    by the event count — at 100 TB the events dominate and they are
    touched exactly once.
    """
    keys = list(keys)
    joined = _obs_lattice(
        df, keys, ts_col, value_col, bucket_ns, tiebreak, F.col(value_col)
    )
    w = Window.partitionBy(*keys).orderBy("__bucket")
    return (
        joined
        .select(
            *keys,
            (F.col("__bucket") * F.lit(bucket_ns)).alias("bucket_start"),
            F.last("__obs", ignorenulls=True).over(w).alias("value_locf"),
            F.col("__obs").isNull().alias("is_gap"),
        )
    )


def apply_changelog(
    snapshot: DataFrame,
    changelog: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """MERGE a changelog into a snapshot: the batch equivalent of
    ``MERGE INTO`` with upserts AND deletes — the nightly compaction a
    CDC-fed table needs.

    Per key, the changelog's most recent row (by ``order_by``, which
    must totally order rows within a key) decides: ``op_col ==
    delete_op`` removes the key; anything else replaces the snapshot
    row with the changelog row's attributes.  Keys absent from the
    changelog keep their snapshot row.  Both inputs must share the
    output schema (``keys`` + attribute columns); ``op_col``/``order_by``
    columns of the changelog are dropped from the output.

    Plan shape: latest-wins is one shuffle over the changelog (bounded
    TopK per key via row_number); the merge itself is one join of the
    snapshot against the compacted changelog on ``keys``.  At 100 TB
    the snapshot is touched exactly once and never windowed; only the
    (much smaller) changelog pays a sort.
    """
    keys = list(keys)
    out_cols = [c for c in snapshot.columns]
    if op_col in out_cols:
        # the snapshot must be plain state: an op column there would
        # silently ride into the output AND be read as the op marker
        raise ValueError(
            f"snapshot must not contain the op column {op_col!r}"
        )
    missing = [c for c in [*keys, *out_cols] if c not in changelog.columns]
    if missing:
        raise ValueError(
            f"changelog lacks column(s) {missing} required by the merge"
        )
    # op_col / order_by are consumed (not merged) but equally required —
    # without this a changelog missing them died with a raw
    # UNRESOLVED_COLUMN from the window sort instead of a named error
    missing_ctl = [
        c for c in [op_col, *order_by] if c not in changelog.columns
    ]
    if missing_ctl:
        raise ValueError(
            f"changelog lacks op/order column(s) {missing_ctl} required "
            "to order and classify the merge"
        )
    latest = latest_snapshot(changelog, keys, order_by)
    upserts = latest.where(
        ~F.col(op_col).eqNullSafe(F.lit(delete_op))
    ).select(*out_cols)
    touched = latest.select(*keys)
    survivors = snapshot.join(touched, keys, "anti")
    return survivors.unionByName(upserts)


def resample_interp(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    bucket_ns: int,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Resample an irregular per-key series onto a fixed lattice with
    LINEAR interpolation across gaps — the numeric sibling of
    :func:`resample_locf` (carry-forward holds the last level; this
    draws the line between the surrounding observations, the usual
    choice for physical/metric series).

    Buckets are pure-int64 floor(ts / bucket_ns); the lattice densely
    covers each key's own [min_bucket, max_bucket].  A bucket holding
    observations emits its LAST observation's value (by ``ts,
    *tiebreak``) with ``is_gap = false``.  An empty bucket linearly
    interpolates between the neighbouring BUCKET REPRESENTATIVES (the
    per-bucket last observations — each bucket contributes one anchor,
    so a bursty bucket doesn't bend the line with its intermediate
    points), evaluated at the bucket's start timestamp:

        v = v_prev + (v_next - v_prev) · (t - t_prev) / (t_next - t_prev)

    Both neighbours always exist for a gap bucket (the lattice starts
    and ends at observed buckets), and t_prev < bucket_start < t_next
    by bucket arithmetic, so the weight is strictly inside (0, 1).
    Values are quantized (1e6) so the two engines' identical per-row
    double arithmetic survives any later aggregation.

    NULL ``value_col`` rows are NOT observations: they are dropped
    before bucketing (the robust_outliers / quantile_quantum
    convention), so a bucket whose only rows carry NULL values is a
    gap and interpolates across, and a NULL can never become a bucket
    representative that poisons its neighbours' interpolation (the r6
    advisor's finding: the previous code kept such rows, emitting
    is_gap = false with a NULL value).  A key whose every value is
    NULL disappears from the output.

    Plan shape: one partial-aggregable groupBy for per-bucket last
    observations, the bounded lattice explode, then TWO window passes
    (forward carry of the previous observation, backward carry of the
    next) over the SAME key partitioning — Catalyst plans one exchange
    with two sorts, never a second shuffle.
    """
    keys = list(keys)
    p = int(bucket_ns)
    payload = F.struct(
        F.col(value_col).cast("double").alias("v"),
        F.col(ts_col).alias("t"),
    )
    wf = Window.partitionBy(*keys).orderBy("__bucket")
    wb = Window.partitionBy(*keys).orderBy(F.col("__bucket").desc())
    joined = (
        _obs_lattice(df, keys, ts_col, value_col, bucket_ns, tiebreak, payload)
        .withColumn("__prev", F.last("__obs", ignorenulls=True).over(wf))
        .withColumn("__next", F.last("__obs", ignorenulls=True).over(wb))
    )
    # subtract in INT64, cast the small DIFFERENCES to double: raw
    # epoch-nanos (~1.7e18) exceed 2^53, so double ULP is 256 ns and
    # casting the ENDPOINTS first distorts fine-bucket weights — at
    # bucket_ns below the ULP, (tn − tp) can even round to 0.0 and
    # NULL the gap value (the module's own int64 rule, lines above)
    dt = (F.col("__bucket") * F.lit(p) - F.col("__prev.t")).cast("double")
    dn = (F.col("__next.t") - F.col("__prev.t")).cast("double")
    interp = F.col("__prev.v") + (F.col("__next.v") - F.col("__prev.v")) * (
        dt / dn
    )
    value = F.when(F.col("__obs").isNotNull(), F.col("__obs.v")).otherwise(
        interp
    )
    return joined.select(
        *keys,
        (F.col("__bucket") * F.lit(p)).alias("bucket_start"),
        (F.floor(value * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
            "value_q6"
        ),
        F.col("__obs").isNull().alias("is_gap"),
    )
