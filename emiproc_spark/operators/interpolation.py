"""Profile resampling: composite cycles ↔ hour-of-year series.

Reference: ``emiproc/profiles/temporal/operators.py:152-338`` —
``get_profile_da`` stamps a profile at period midpoints,
``interpolate_profiles`` linearly interpolates each cycle to hourly
resolution and multiplies cycles together; the inverse direction
aggregates hour-of-year back to (daily, weekly, monthly) cycles with
hour/dow mean and month **sum** (operators.py:304-318).

Spark shape: the hourly scaffold is ``sequence``+``explode`` (8760/8784
rows per profile — dimension-sized); interpolation is an element_at
gather of the two bracketing period values with closed-form weights, no
window functions needed because cyclic position arithmetic is exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from emiproc_spark.localdf import local_rows_df

from emiproc_spark.core.schemas import PROFILE_SIZES


# hours per full cycle of each profile type: daily repeats every 24 h,
# weekly every 168 h, monthly/day_of_year span the year
def _cycle_hours(ptype: str, year_hours: int) -> int:
    table = {
        "daily": 24,
        "weekly": 168,
        "hour_of_week": 168,
        "monthly": year_hours,
        "day_of_year": year_hours,
        "day_of_leap_year": year_hours,
        "hour_of_year": year_hours,
        "hour_of_leap_year": year_hours,
    }
    if ptype not in table:
        raise NotImplementedError(
            f"profile_to_hour_of_year: unsupported profile type {ptype!r} "
            f"(supported: {sorted(table)})"
        )
    return table[ptype]


def profile_to_hour_of_year(
    tprofiles: DataFrame,
    ptype: str,
    year_hours: int = 8760,
    interpolate: bool = True,
    year_start_weekday: int = 0,
) -> DataFrame:
    """Resample profiles of one type to an hour-of-year scaling-factor
    series (reference interpolate_profiles → hourly,
    operators.py:290-302).

    Each cycle repeats ``year_hours / cycle_hours`` times; values sit at
    period midpoints and interpolate linearly between them with cyclic
    wrap (midpoint stamping per get_profile_da, operators.py:196-209).
    Months are uniform-length (year_hours/12) — a documented divergence
    from the reference's true-calendar midpoints; totals are unaffected
    because factors renormalize over the cycle.

    ``year_start_weekday`` (Monday = 0, the pandas convention) anchors
    the 168-hour cycles: hour 0 of the series belongs to that weekday —
    the same parameter ``hour_of_year_to_cycles`` takes, so a
    round-trip through a non-Monday year start is symmetric.

    Returns (profile_id, hour, sf); mean(sf) ≈ 1 per profile.
    """
    cyc = _cycle_hours(ptype, year_hours)
    week_shift = (year_start_weekday % 7) * 24 if cyc == 168 else 0
    hours = F.explode(F.sequence(F.lit(0), F.lit(year_hours - 1))).alias("hour")
    base = tprofiles.select("profile_id", "ratios", hours)
    n = F.size("ratios")
    period_h = F.lit(float(cyc)) / n
    # position of this hour's midpoint within the current cycle, in
    # period units
    pos = (((F.col("hour") + F.lit(week_shift)) % cyc) + F.lit(0.5)) / period_h
    if interpolate:
        # period k's midpoint sits at position k+0.5
        frac = pos - 0.5
        k0 = F.floor(frac)
        t = frac - k0
        lo = ((k0 % n) + n) % n
        hi = (lo + 1) % n
        val = (
            F.element_at("ratios", lo.cast("int") + 1) * (F.lit(1.0) - t)
            + F.element_at("ratios", hi.cast("int") + 1) * t
        ) * n
        out = base.withColumn("sf", val)
    else:
        k = F.floor(pos).cast("int") % n
        out = base.withColumn("sf", F.element_at("ratios", k + 1) * n)
    return out.select("profile_id", "hour", "sf")


def profile_da(
    tprofiles: DataFrame,
    year: int,
    ptype: str,
    use_offset: bool = True,
) -> DataFrame:
    """Profiles as a midpoint-stamped native-frequency time series over
    one year (reference get_profile_da, operators.py:152-235): sampling
    stamps run from ``year-01-01`` through ``year+1-01-01`` inclusive at
    the profile's native frequency, one extra stamp is prepended at
    ``ts[0] − 2·offset`` so the whole year is covered, and the emitted
    ``ts`` is shifted by half a period (the midpoint offset) — hourly
    types +30 min, day types +12 h, monthly +15 d, 3-hourly +1 h 30 m.
    Non-cyclic year-length types (hour_of_year / day_of_year and their
    leap variants) drop the prepended and trailing stamps instead
    (operators.py:199-209).

    ``tprofiles``: (profile_id, ratios) of one ``ptype``.  Returns
    (profile_id, ts timestamp_ntz, pos int, ratio double); ``pos`` is
    the cyclic index the ratio was gathered at (before the offset).
    This is the same midpoint convention ``profile_to_hour_of_year``
    applies in closed form when interpolating.
    """
    from emiproc_spark.operators.temporal import position_in_profile

    import calendar

    hourly = ("daily", "hour_of_year", "hour_of_leap_year",
              "hour_of_week", "hour_of_week_per_month")
    daily_freq = ("weekly", "day_of_year", "day_of_leap_year")
    days = 366 if calendar.isleap(year) else 365
    if ptype in hourly:
        n_steps, step_min, off_min = days * 24, 60, 30
    elif ptype in daily_freq:
        n_steps, step_min, off_min = days, 1440, 720
    elif ptype == "monthly":
        n_steps, step_min, off_min = 12, None, 15 * 1440
    elif ptype in ("hour3_of_day", "hour3_of_day_per_month"):
        n_steps, step_min, off_min = days * 8, 180, 90
    else:
        raise NotImplementedError(f"profile_da: unsupported ptype {ptype!r}")

    non_cyclic = ptype in (
        "hour_of_year", "hour_of_leap_year", "day_of_year", "day_of_leap_year"
    )
    if non_cyclic:
        # year-length types must match the year's leap-ness, or the
        # Dec-31 gathers run past the array (null ratios / ANSI error)
        expected = PROFILE_SIZES[ptype]
        year_len = days * 24 if ptype.startswith("hour") else days
        if expected != year_len:
            other = {
                "hour_of_year": "hour_of_leap_year",
                "hour_of_leap_year": "hour_of_year",
                "day_of_year": "day_of_leap_year",
                "day_of_leap_year": "day_of_year",
            }[ptype]
            raise ValueError(
                f"profile_da: year {year} has {year_len} "
                f"{'hours' if ptype.startswith('hour') else 'days'} but "
                f"ptype {ptype!r} carries {expected} values — use {other!r}"
            )
    # k = −1 is the prepended pre-year stamp; k = n_steps the inclusive
    # year+1-01-01 endpoint.  Non-cyclic types trim both.
    k0, k1 = (0, n_steps - 1) if non_cyclic else (-1, n_steps)
    start = F.lit(f"{year}-01-01 00:00:00").cast("timestamp_ntz")
    base = tprofiles.select(
        "profile_id",
        "ratios",
        F.explode(F.sequence(F.lit(k0), F.lit(k1))).alias("k"),
    )
    if ptype == "monthly":
        ts = F.when(
            F.col("k") >= 0, F.to_timestamp_ntz(F.add_months(start, F.col("k")))
        ).otherwise(start - F.make_interval(mins=F.lit(2 * off_min)))
    else:
        ts = start + F.make_interval(mins=F.col("k") * step_min)
    out = base.withColumn("__ts", ts).withColumn(
        "pos", position_in_profile(F.col("__ts"), ptype).cast("int")
    )
    stamp = (
        F.col("__ts") + F.make_interval(mins=F.lit(off_min))
        if use_offset
        else F.col("__ts")
    )
    return out.select(
        "profile_id",
        stamp.alias("ts"),
        "pos",
        F.element_at("ratios", F.col("pos") + 1).alias("ratio"),
    )


def hour_of_year_to_cycles(
    series: DataFrame,
    year_start_weekday: int = 0,
) -> DataFrame:
    """Inverse resample: hour-of-year series → three cycles
    (reference operators.py:304-318): hour-of-day mean, day-of-week
    mean, month **sum**, each renormalized to ratios.

    ``series``: (profile_id, hour, sf).  Month boundaries use the
    non-leap 365-day calendar like the reference's dayofyear mapping.
    Returns (profile_id, ptype, pos, ratio) in long form.
    """
    month_starts = [0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334, 365]
    doy = F.floor(F.col("hour") / 24)
    month = F.lit(0)
    for m in range(1, 12):
        month = F.when(doy >= month_starts[m], F.lit(m)).otherwise(month)
    # one pass: explode each hour into its three (ptype, pos) cycle slots,
    # single hash agg on (profile_id, ptype, pos), window-normalize per
    # (profile_id, ptype) — 2 shuffles total instead of three scans each
    # with two aggregations and a totals join
    from pyspark.sql import Window

    slots = F.array(
        F.struct(
            F.lit("daily").alias("ptype"),
            (F.col("hour") % 24).cast("int").alias("pos"),
        ),
        F.struct(
            F.lit("weekly").alias("ptype"),
            ((doy + year_start_weekday) % 7).cast("int").alias("pos"),
        ),
        F.struct(F.lit("monthly").alias("ptype"), month.cast("int").alias("pos")),
    )
    long = series.select(
        "profile_id", "sf", F.explode(slots).alias("slot")
    ).select(
        "profile_id",
        F.col("slot.ptype").alias("ptype"),
        F.col("slot.pos").alias("pos"),
        "sf",
    )
    g = long.groupBy("profile_id", "ptype", "pos").agg(
        F.sum("sf").alias("s"), F.count("*").alias("n")
    )
    # daily/weekly cycles are means over their slot; monthly is a sum
    val = F.when(F.col("ptype") == "monthly", F.col("s")).otherwise(
        F.col("s") / F.col("n")
    )
    w = Window.partitionBy("profile_id", "ptype")
    return g.withColumn("val", val).select(
        "profile_id",
        "ptype",
        "pos",
        (F.col("val") / F.sum("val").over(w)).alias("ratio"),
    )


def resolve_daytype(
    day_profiles: DataFrame,
    day_type_sets: dict[str, list[int]] | None = None,
) -> DataFrame:
    """Merge day_type-split daily profiles into one hour-of-week profile
    by masking day-of-week ranges (reference resolve_daytype,
    operators.py:345-437): each weekday takes its day_type's 24 ratios.

    ``day_profiles``: (profile_id, day_type, ratios ARRAY<24 DOUBLE>).
    Default sets: weekday = Mon..Fri, weekend = Sat+Sun.  The sets must
    partition {0..6} exactly — a gap or overlap would silently produce
    a compacted (<168) or shifted (>168) array that downstream
    hour-of-week indexing reads out of position.

    The same hazard exists in the DATA, so the output is guarded: a
    profile missing one of the set's day_types (e.g. a typo'd label the
    join silently drops), carrying a duplicate day_type row, or holding
    a ratios array that is not exactly 24 long would all assemble a
    wrong-length array — each raises a named error instead.
    Returns (profile_id, ptype='hour_of_week', ratios ARRAY<168>).
    """
    sets = day_type_sets or {"weekday": [0, 1, 2, 3, 4], "weekend": [5, 6]}
    all_days = [d for days_ in sets.values() for d in days_]
    if sorted(all_days) != list(range(7)):
        raise ValueError(
            f"day_type_sets must cover each weekday 0..6 exactly once, "
            f"got {dict(sets)}"
        )
    spark = day_profiles.sparkSession
    rows = [(dt, d) for dt, days in sets.items() for d in days]
    days = local_rows_df(spark, rows, "day_type string, dow int")
    per_day = (
        day_profiles.join(F.broadcast(days), "day_type")
        .select("profile_id", "dow", F.posexplode("ratios").alias("h", "ratio"))
        .withColumn("pos", F.col("dow") * 24 + F.col("h"))
    )
    tot = per_day.groupBy("profile_id").agg(F.sum("ratio").alias("tot"))
    from emiproc_spark.operators.profiles import _ratio_from_pairs

    assembled = (
        per_day.join(tot, "profile_id")
        .withColumn("ratio", F.col("ratio") / F.col("tot"))
        .groupBy("profile_id")
        .agg(
            _ratio_from_pairs().alias("ratios"),
            F.count("*").alias("__n"),
        )
    )
    checked = F.when(F.col("__n") == 168, F.col("ratios")).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "resolve_daytype: profile assembled "
                ),
                F.col("__n").cast("string"),
                F.lit(
                    " hour slots instead of 168 for profile_id "
                ),
                F.col("profile_id").cast("string"),
                F.lit(
                    " — a missing/duplicated day_type row or a ratios "
                    "array that is not 24 long"
                ),
            )
        ).cast("array<double>")
    )
    return assembled.select(
        "profile_id",
        F.lit("hour_of_week").alias("ptype"),
        checked.alias("ratios"),
    )
