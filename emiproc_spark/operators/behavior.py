"""Event-behavior analytics: ordered funnels and cohort retention.

These are the classic product-analytics operators a training-data /
telemetry pipeline runs over an events table.  Both are expressed as
window/aggregate chains over ONE hash partitioning on the user key, so
at 100 TB they cost a single exchange of the fact table (plus the final
small rollup) — no self-joins, no per-row Python.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _floor_period(ts_col: str, period_ns: int):
    """FLOOR-division period bucket over epoch-ns BIGINT — pure int64
    (no double rounding at 1e18 scale) and floor (not truncate-toward-
    zero) semantics, so pre-1970 timestamps bucket mathematically:
    ``pmod`` makes the numerator an exact multiple of the period, then
    integer DIV is exact.  (``qhelpers.sql_floor_div`` is the DuckDB
    rendering — its integer ``//`` truncates, so the oracle needs the
    same pmod trick.)  (Only timestamps within period_ns of the
    int64 minimum could overflow — unrepresentable as real epochs.)
    """
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", ts_col):
        # ts_col is spliced into a SQL expression (DIV has no DataFrame
        # function); anything but a plain identifier must not parse
        raise ValueError(f"ts_col must be a plain identifier, got {ts_col!r}")
    p = int(period_ns)
    return F.expr(f"({ts_col} - pmod({ts_col}, {p})) DIV {p}")


def funnel_user_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tb_col: str | None = None,
) -> DataFrame:
    """Per-user ordered funnel: step *i*'s timestamp is the earliest
    ``steps[i]`` event strictly AFTER the user's step *i−1* timestamp
    (the strict-order definition — a click logged before the first view
    does not convert the view→click step).

    Returns one row per user: (user_col, step1_ts, ..., stepN_ts); a
    NULL at step *i* means the chain broke there and every later step
    is NULL too (the ``ts > prev`` predicate is NULL when prev is).

    Scale shape: every step is an unbounded MIN window over the SAME
    ``partitionBy(user)`` spec and the final per-user collapse groups
    on that key, so Catalyst plans ONE exchange for the whole chain —
    verified in tests/test_plan_shapes.py.

    Tie determinism: the chain never orders rows at all — each step is
    a MIN over timestamp VALUES gated by strict ``>`` against the
    previous step's stamp, so equal-timestamp events cannot change the
    result regardless of their (arbitrary) physical order.  The
    streaming fold (``streaming.funnel_stream``) evaluates the same
    value-only decisions in (ts, event_id) order; a forced-equal-ts
    test pins batch == stream (tests/test_streaming_funnel.py).

    ``tb_col`` is accepted for SIGNATURE PARITY with
    ``funnel_stream(tb_col=...)`` (one call site can serve both paths)
    and deliberately ignored: the batch chain orders nothing, so there
    is no iteration order to pin.
    """
    del tb_col  # value-only min-chain: no iteration order exists
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(user_col)
    df = events.select(user_col, ts_col, type_col)
    prev: str | None = None
    names: list[str] = []
    for i, step in enumerate(steps):
        cond: Column = F.col(type_col) == F.lit(step)
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        name = f"step{i + 1}_ts"
        df = df.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        names.append(name)
        prev = name
    return df.groupBy(user_col).agg(*[F.min(n).alias(n) for n in names])


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel rollup: (step, step_name, users) — how many users reached
    each ordered step.  ``users`` is exact (count of non-null step
    timestamps over the per-user funnel table)."""
    per_user = funnel_user_steps(events, steps, user_col, ts_col, type_col)
    counts = per_user.agg(
        *[F.count(f"step{i + 1}_ts").alias(f"c{i + 1}") for i in range(len(steps))]
    )
    # expression-tree unpivot (no selectExpr string: a quote in a step
    # name must stay data, never become SQL)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i + 1).cast("int").alias("step"),
                    F.lit(s).alias("step_name"),
                    F.col(f"c{i + 1}").cast("long").alias("users"),
                )
                for i, s in enumerate(steps)
            ]
        )
    )
    return counts.select(rows.alias("r")).select("r.*")


def cohort_retention(
    events: DataFrame,
    period_ns: int = 7 * 86400 * 10**9,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the period of
    their FIRST event; ``active_users`` counts how many of each cohort
    were active ``period_offset`` periods later.

    ``ts_col`` must be epoch-nanoseconds BIGINT (fixtures.events);
    periods use pure-int64 FLOOR division so 1e18-scale nanos never
    round through a double and pre-1970 timestamps bucket correctly
    (truncation would collapse two distinct negative-epoch periods
    into period 0; the oracles render the same floor via
    ``qhelpers.sql_floor_div`` — DuckDB's integer ``//`` truncates).  Offsets are per-period-distinct, so the final rollup is a
    plain COUNT(*) over the per-(user, period) distinct set — no
    count-distinct expansion.

    Scale shape: cohort assignment is a MIN window on ``user`` (one
    exchange), the (user, period, cohort) de-dup groups on a superset
    key, and only the bounded (cohort × offset) matrix leaves the last
    aggregate.
    """
    if int(period_ns) < 1:
        raise ValueError(f"period_ns must be >= 1, got {period_ns}")
    per = _floor_period(ts_col, period_ns)
    ev = events.select(user_col, per.alias("period"))
    w = Window.partitionBy(user_col)
    cohorted = ev.withColumn("cohort_period", F.min("period").over(w))
    active = cohorted.groupBy(user_col, "period", "cohort_period").agg(
        F.lit(1).alias("__one")
    )
    return (
        active.groupBy(
            F.col("cohort_period"),
            (F.col("period") - F.col("cohort_period")).alias("period_offset"),
        )
        .agg(F.count("*").alias("active_users"))
    )


def rolling_event_features(
    events: DataFrame,
    window_ns: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Trailing-window activity features per event — the classic
    feature-engineering pass before training ("how active was this
    user in the hour before this event?").

    For every event: the count of the user's events and the (quantized,
    order-free) sum of ``value_col`` in ``[ts − window_ns, ts]``, via a
    RANGE window frame on the integer-nanosecond timestamp — peers at
    the exact same timestamp are all included, so results do not depend
    on intra-timestamp ordering.

    Scale shape: one sort-based window exchange on the user key; RANGE
    frames stream through Spark's window operator with a sliding
    buffer bounded by the frame width.
    """
    if int(window_ns) < 0:
        raise ValueError(f"window_ns must be >= 0, got {window_ns}")
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).cast("long"))
        .rangeBetween(-int(window_ns), 0)
    )
    q = F.floor(F.col(value_col) * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")
    return events.withColumn(
        "n_trailing", F.count("*").over(w)
    ).withColumn(
        "v_trailing", F.sum(q).over(w).cast("double") / F.lit(1_000_000.0)
    )


def rolling_active_users(
    events: DataFrame,
    window_periods: int = 7,
    period_ns: int = 86400 * 10**9,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Trailing-window distinct actives — the DAU/WAU/MAU rollup: for
    every period, how many distinct users were active in the trailing
    ``window_periods`` periods (inclusive).

    Contribution explode instead of a distinct-over-sliding-window
    (which Spark can't express): the per-(user, period) distinct set
    fans out map-only to the ``window_periods`` target periods it
    keeps alive, then ONE distinct-count per target.  Cost is
    |user-periods| × window — linear, no self-join; the trailing tail
    past the last active period is reported too (those windows still
    contain the user).

    ``ts_col`` must be epoch-ns BIGINT (same contract as
    :func:`cohort_retention`).  Returns (period, active_users).
    """
    if int(window_periods) < 1:
        raise ValueError(f"window_periods must be >= 1, got {window_periods}")
    if int(period_ns) < 1:
        raise ValueError(f"period_ns must be >= 1, got {period_ns}")
    per = _floor_period(ts_col, period_ns)
    d = events.select(user_col, per.alias("__p")).distinct()
    exploded = d.select(
        user_col,
        F.explode(
            F.sequence(F.col("__p"), F.col("__p") + F.lit(window_periods - 1))
        ).alias("period"),
    )
    return exploded.groupBy("period").agg(
        F.count_distinct(user_col).alias("active_users")
    )
