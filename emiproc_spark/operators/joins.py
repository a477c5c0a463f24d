"""Temporal join operators Spark lacks natively: as-of join and
interval (range-overlap) join.

Beyond-parity: the reference has no event-stream surface; these are the
standard time-series primitives a 100 TB event/telemetry table needs
(and that engines like DuckDB/kdb/Pandas ``merge_asof`` ship built-in).

Scale design:

- **as-of join**: the naive plan — equi-join on the key plus a
  ``r.ts <= l.ts`` theta predicate, then max-per-left-row — explodes to
  |left_key| × |right_key| intermediate rows per key before the
  aggregate prunes them.  Instead both sides are *unioned* (tagged) and
  the match is a ``last(..., ignorenulls)`` running window within the
  key partition ordered by (ts, tag): ONE shuffle on the key, zero row
  amplification, linear in |left| + |right| per key.  This is the
  classic sort-merge formulation; Catalyst executes it as a single
  window over the co-partitioned union.
- **range join**: an interval-overlap join on a raw theta predicate is
  a cartesian product per key.  Intervals are instead exploded to the
  fixed-width *buckets* they span and joined on (key, bucket) — shuffle
  volume is |rows| × (interval_len / bucket) and each candidate pair
  meets in exactly the bucket of the later start, so no post-join
  dedup pass is needed.  Pick ``bucket`` near the typical interval
  length: one-ish bucket per row, near-equi-join cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _spanned(
    df: DataFrame, start: str, end: str, bucket: float, who: str
) -> DataFrame:
    """Explode an interval frame to the buckets it spans.  An inverted
    interval (end < start) raises at execution — sequence() would
    silently produce a DESCENDING bucket list for it (implicit step −1)
    and the empty interval could then emit join pairs."""
    buckets = F.when(
        F.col(end) >= F.col(start),
        F.sequence(
            F.floor(F.col(start) / bucket).cast("long"),
            F.floor(F.col(end) / bucket).cast("long"),
        ),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"{who}: inverted interval ["),
                F.col(start).cast("string"),
                F.lit(", "),
                F.col(end).cast("string"),
                F.lit(") — end must be >= start"),
            )
        ).cast("array<long>")
    )
    return df.withColumn("__bucket", F.explode(buckets))


def _nonempty_interval(start: str, end: str, who: str) -> Column:
    """``start < end`` as a filter conjunct that still RAISES on an
    inverted interval: Catalyst pushes this predicate below
    ``_spanned``'s explode guard (it references only pre-explode
    columns), and a plain ``start < end`` there would silently DROP the
    inverted row that guard exists to flag."""
    s, e = F.col(start), F.col(end)
    return F.when(
        e < s,
        F.raise_error(
            F.concat(
                F.lit(f"{who}: inverted interval ["),
                s.cast("string"),
                F.lit(", "),
                e.cast("string"),
                F.lit(") — end must be >= start"),
            )
        ).cast("boolean"),
    ).otherwise(s < e)


def _rename_collisions(
    df: DataFrame, own_cols: list[str], other_cols: list[str], by: list[str]
) -> tuple[DataFrame, dict[str, str]]:
    """Prefix ``r_`` onto the right side's columns that collide with the
    left side (join keys excluded); returns the renamed frame + map."""
    rename = {
        c: f"r_{c}" for c in own_cols if c in set(other_cols) and c not in by
    }
    for old, new in rename.items():
        df = df.withColumnRenamed(old, new)
    return df, rename


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: list[str],
    value_cols: list[str],
    tolerance: int | float | str | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """For every ``left`` row, attach ``value_cols`` of the matching
    ``right`` row with equal ``by`` keys (pandas ``merge_asof``
    semantics): the most recent ``right.ts <= left.ts``
    (``direction="backward"``, default), the earliest
    ``right.ts >= left.ts`` (``"forward"``), or whichever of the two is
    closer (``"nearest"``, exact-distance ties prefer backward).

    All left rows are preserved; the attached columns (and
    ``<ts_col><suffix>``) are NULL when no right row qualifies, or when
    the match is farther than ``tolerance`` — a number in ``ts_col``'s
    units for numeric timestamps, or an interval string like
    ``"30 minutes"`` for TIMESTAMP columns.  For ``nearest`` the
    tolerance constrains each side BEFORE choosing, so a
    within-tolerance match on one side is never displaced by a closer
    out-of-tolerance one.  A right row exactly at ``left.ts`` matches
    in every direction.

    One shuffle on ``by`` (``nearest`` adds a second sort, not a second
    exchange); no row amplification (see module docstring).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"asof_join: direction must be backward/forward/nearest, got {direction!r}"
        )
    for c in value_cols + [ts_col]:
        if c not in right.columns:
            raise ValueError(f"asof_join: right side has no column {c!r}")
    overlap = [c for c in left.columns if c in set(value_cols)]
    if overlap:
        raise ValueError(
            f"asof_join: value_cols {overlap} collide with left columns — "
            "rename or suffix them on the right side first"
        )
    # a NULL timestamp has no place on an as-of axis (pandas merge_asof
    # rejects them too): in the ascending window a NULL-ts right row
    # would sort first and become everyone's "most recent" match, and a
    # NULL-ts left row would silently grab an arbitrary payload — raise
    # at execution instead
    ts_checked = F.when(
        F.col(ts_col).isNull(),
        F.raise_error(
            F.lit(f"asof_join: NULL {ts_col} — drop or fill null-timestamp "
                  "rows before joining")
        ).cast(right.schema[ts_col].dataType),
    ).otherwise(F.col(ts_col))
    payload = F.struct(
        ts_checked.alias("__ts"), *[F.col(c) for c in value_cols]
    )
    l_tag = left.select(
        *[F.col(c) for c in left.columns if c != ts_col],
        ts_checked.alias(ts_col),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(
            right.select(payload).schema[0].dataType.simpleString()
        ).alias("__payload"),
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in by and c != ts_col else F.col(c)
          for c in left.columns if c != ts_col],
        ts_checked.alias(ts_col),
        F.lit(0).alias("__is_left"),
        payload.alias("__payload"),
    )
    # right rows sort BEFORE left rows at the same ts in traversal order
    # (tag 0 first both ascending and descending), so an exact-ts right
    # row is visible to the left row — the "<=" / ">=" contract.
    # __payload as the final key makes ties between right rows at the
    # SAME (key, ts) deterministic (last = max payload) instead of
    # partition-layout-dependent
    def running(ts_order: Column) -> Window:
        return (
            Window.partitionBy(*by)
            .orderBy(ts_order, F.col("__is_left").asc(), F.col("__payload").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    unioned = l_tag.unionByName(r_tag)
    matched = unioned
    if direction in ("backward", "nearest"):
        matched = matched.withColumn(
            "__m_back",
            F.last("__payload", ignorenulls=True).over(running(F.col(ts_col).asc())),
        )
    if direction in ("forward", "nearest"):
        matched = matched.withColumn(
            "__m_fwd",
            F.last("__payload", ignorenulls=True).over(running(F.col(ts_col).desc())),
        )
    out = matched.where(F.col("__is_left") == 1)

    def qualifies(match: Column, delta: Column) -> Column:
        ok = match.isNotNull()
        if tolerance is not None:
            bound = (
                F.expr(f"INTERVAL {tolerance}")
                if isinstance(tolerance, str)
                else F.lit(tolerance)
            )
            ok = ok & (delta <= bound)
        return ok

    if direction == "backward":
        sel = F.when(
            qualifies(F.col("__m_back"), F.col(ts_col) - F.col("__m_back.__ts")),
            F.col("__m_back"),
        )
    elif direction == "forward":
        sel = F.when(
            qualifies(F.col("__m_fwd"), F.col("__m_fwd.__ts") - F.col(ts_col)),
            F.col("__m_fwd"),
        )
    else:
        d_back = F.col(ts_col) - F.col("__m_back.__ts")
        d_fwd = F.col("__m_fwd.__ts") - F.col(ts_col)
        ok_b = qualifies(F.col("__m_back"), d_back)
        ok_f = qualifies(F.col("__m_fwd"), d_fwd)
        sel = (
            F.when(ok_b & ok_f & (d_fwd < d_back), F.col("__m_fwd"))
            .when(ok_b, F.col("__m_back"))
            .when(ok_f, F.col("__m_fwd"))
        )
    out = out.withColumn("__match", sel)
    for c in value_cols:
        out = out.withColumn(c, F.col(f"__match.{c}"))
    out = out.withColumn(ts_col + suffix, F.col("__match.__ts"))
    return out.drop("__is_left", "__payload", "__match", "__m_back", "__m_fwd")


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    bucket: int | float | str = "auto",
    l_start: str = "start",
    l_end: str = "end",
    r_start: str = "start",
    r_end: str = "end",
) -> DataFrame:
    """Interval-overlap join: all (left, right) row pairs with equal
    ``by`` keys whose half-open intervals ``[start, end)`` overlap.

    Both sides explode to the width-``bucket`` buckets their interval
    spans and meet on (by, bucket); a pair is emitted only in the
    bucket containing the later of the two starts, so every qualifying
    pair appears exactly once without a distinct pass.  Output carries
    all non-key columns of both sides (right's renamed ``r_<col>`` on
    collision).

    EMPTY intervals (start == end) overlap nothing: the full overlap
    predicate is max(starts) < min(ends), and the two cross conditions
    (``l.start < r.end ∧ r.start < l.end``) alone are equivalent to it
    only for NON-empty intervals — an empty [5, 5) would otherwise
    spuriously pair with every interval strictly containing 5.

    Shuffle volume is rows × ceil(len/bucket + 1): size ``bucket`` near
    the typical interval length (see module docstring).
    ``bucket="auto"`` measures the p90 interval length over both sides
    (one approxQuantile pass) and uses that — pass an explicit width on
    hot paths to skip the extra job, or when a few huge outlier
    intervals would stretch the quantile.
    """
    if bucket == "auto":
        lens = (
            left.select((F.col(l_end) - F.col(l_start)).cast("double").alias("__len"))
            .unionByName(
                right.select(
                    (F.col(r_end) - F.col(r_start)).cast("double").alias("__len")
                )
            )
        )
        q = lens.approxQuantile("__len", [0.9], 0.05)
        bucket = q[0] if q and q[0] > 0 else 1.0
    elif isinstance(bucket, str):
        raise ValueError(f"range_join: bucket must be a width or 'auto', got {bucket!r}")
    if bucket <= 0:
        raise ValueError(f"range_join: bucket must be positive, got {bucket}")

    lx = _spanned(left, l_start, l_end, bucket, "range_join")
    rx = _spanned(right, r_start, r_end, bucket, "range_join")
    rx, rename = _rename_collisions(rx, right.columns, left.columns, by)
    rs, re = rename.get(r_start, r_start), rename.get(r_end, r_end)
    later_start = F.greatest(F.col(l_start), F.col(rs))
    pairs = (
        lx.join(rx, [*by, "__bucket"])
        .where(
            # max(starts) < min(ends): the two non-emptiness conjuncts
            # make the cross conditions the true overlap predicate —
            # without them an empty interval spuriously matches
            _nonempty_interval(l_start, l_end, "range_join")
            & _nonempty_interval(rs, re, "range_join")
            & (F.col(l_start) < F.col(re))
            & (F.col(rs) < F.col(l_end))
            & (F.col("__bucket") == F.floor(later_start / bucket).cast("long"))
        )
        .drop("__bucket")
    )
    return pairs


def point_in_range_join(
    points: DataFrame,
    ranges: DataFrame,
    by: list[str],
    bucket: int | float,
    point_col: str = "ts",
    r_start: str = "start",
    r_end: str = "end",
) -> DataFrame:
    """Join point rows to every range row whose half-open interval
    ``[start, end)`` contains the point (same ``by`` keys): the common
    "event within maintenance window / session / campaign" lookup.

    Points are degenerate intervals, so this is ``range_join`` with the
    point side spanning exactly one bucket — no explode on the (big)
    point side at all, only the (smaller) range side fans out.
    """
    if not isinstance(bucket, (int, float)) or bucket <= 0:
        raise ValueError(
            f"point_in_range_join: bucket must be positive, got {bucket!r}"
        )
    px = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / bucket).cast("long")
    )
    rx = _spanned(ranges, r_start, r_end, bucket, "point_in_range_join")
    rx, rename = _rename_collisions(rx, ranges.columns, points.columns, by)
    rs, re = rename.get(r_start, r_start), rename.get(r_end, r_end)
    return (
        px.join(rx, [*by, "__bucket"])
        .where((F.col(point_col) >= F.col(rs)) & (F.col(point_col) < F.col(re)))
        .drop("__bucket")
    )


def merge_intervals(
    df: DataFrame,
    by: list[str],
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Merge overlapping-or-touching half-open intervals [start, end)
    per key into maximal islands — the gaps-and-islands rollup (coverage
    spans, downtime analysis, session coalescing over precomputed
    windows).

    Classic one-pass window formulation: within each key, an interval
    starts a NEW island iff its start exceeds the running max end of
    all earlier intervals (sorted by start); the island id is the
    running count of such starts, and one aggregation yields each
    island's extent.  Cost is one shuffle on ``by`` + a per-key sort —
    no self-join, no explode; at 100 TB the shuffle carries the
    interval table once (AQE handles hot keys).

    Returns (by…, island_start, island_end, n_intervals).  Inverted
    intervals (end < start) raise rather than silently vanishing; NULL
    bounds raise (a NULL start would sort first and poison the running
    max).
    """
    s, e = F.col(start_col), F.col(end_col)
    guard = F.when(
        s.isNull() | e.isNull(),
        F.raise_error(F.lit("merge_intervals: NULL interval bound")),
    ).when(
        e < s,
        F.raise_error(
            F.concat(
                F.lit("merge_intervals: inverted interval [ "),
                s.cast("string"), F.lit(", "), e.cast("string"), F.lit(" )"),
            )
        ),
    ).otherwise(s)
    w = Window.partitionBy(*by).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = F.when(
        prev_max_end.isNull() | (s > prev_max_end), 1
    ).otherwise(0)
    island = F.sum(new_island).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        df.withColumn("__island", island)
        .groupBy(*by, "__island")
        .agg(
            # min over the GUARDED start: the validation evaluates for
            # every row (a guard inside the island predicate can be
            # skipped by short-circuit evaluation on first-in-key rows)
            F.min(guard).alias("island_start"),
            F.max(end_col).alias("island_end"),
            F.count("*").alias("n_intervals"),
        )
        .drop("__island")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe shuffle equi-join: salt the fact side, replicate the
    dimension side.

    A hot join key (one user producing 30% of events, one stop-shingle)
    lands an entire key's fact rows on ONE reducer in a plain shuffle
    join — the straggler that dominates wall-clock at 100 TB.  Salting
    splits each key across ``n_salts`` reducers: the fact side gets a
    deterministic per-row salt (hash of the whole row — no RNG, so
    plans stay replayable) and the dimension side is exploded
    ``n_salts``× so every (key, salt) shard finds its match.  Shuffle
    volume grows only by |dim| × n_salts — the dimension is the small
    side by assumption (but too large / too hot to broadcast outright,
    else ``F.broadcast`` is the simpler fix).

    AQE's skew-join split handles *sort-merge* skew adaptively when
    partition sizes are observable; explicit salting is the static
    fallback that also covers streaming and bucketed plans where AQE
    cannot re-plan.

    Only ``inner`` and ``left`` joins are supported: replicated
    dimension rows would duplicate the NULL-extended output of right /
    full outer joins.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)
    ).cast("int")
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return f.join(d, [*on, "__salt"], how).drop("__salt")
