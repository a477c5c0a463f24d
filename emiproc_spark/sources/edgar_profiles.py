"""EDGAR auxiliary temporal profiles: weekly + hour-of-week-per-month.

Reference: ``emiproc/inventories/edgar/temporal.py`` —
``read_weekly_profile_file`` (:27-59), ``read_hourly_profiles_file``
(:62-170) and ``read_edgar_auxilary_profiles`` (:173-259).  The files
come from the EDGAR "auxiliary tables" distribution:

- ``weekly_profiles.csv``: ``Country_code_A3, activity_code,
  Weekday_id, daily_factor`` — one weekday share per row;
- ``hourly_profiles.csv``: ``Country_code_A3, activity_code, month_id,
  Daytype_id, h1..h24`` — a 24-hour shape per (country, category,
  month, day-type);
- ``weekdays.csv``: ``Weekend_type_id, weekday_name, Weekday_id,
  Daytype_id`` — which day-type each weekday uses under a weekend
  convention;
- ``weekenddays.csv``: ``Weekend_type_id, Country_code_A3`` — which
  weekend convention each country follows (weekends differ by country).

The reference materializes a dense xarray per month/day loop
(temporal.py:104-150).  Here the decomposition is relational: explode
the 24 hour columns, join country → weekend type → per-weekday
day-type, and compute each row's position in the 2016-slot
hour-of-week-per-month cycle — one shuffle per groupBy, no
month×weekday Python loop, so a full 228-country × 26-category
distribution stays distributed.

Both profile kinds are combined into ONE composite profile per
(country, category) and dictionary-encoded (the reference's
``ratios_dataarray_to_profiles`` dedup), with the reference's fix-ups:
``SEA`` → ``-99`` (the no-country convention), missing countries
aliased to a profile donor (temporal.py:233-252), and inventory
categories missing from the tables falling back to their 3-letter
prefix (temporal.py:206-229).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emiproc_spark.localdf import local_rows_df

from emiproc_spark.operators.profiles import dedup_profiles, normalize_ratios

WEEKLY_SIZE = 7
HOWPM_SIZE = 7 * 24 * 12  # hour-of-week-per-month

#: Reference temporal.py:240-247 — countries absent from the EDGAR
#: tables and the donor country whose profiles they reuse.
DEFAULT_COUNTRY_ALIASES = {
    "SSD": "SDN",
    "SRB": "SCG",
    "MNE": "SCG",
    "PSE": "LAO",
    "ATA": "ARG",
    "ATF": "ARG",
}


def _read_csv(
    spark: SparkSession, path: str, sep: str, schema: str | None = None
) -> DataFrame:
    reader = spark.read.options(header=True, sep=sep)
    if schema is None:
        reader = reader.options(inferSchema=True)
    else:
        reader = reader.schema(schema)
    return reader.csv(path)


WEEKLY_SCHEMA = (
    "Country_code_A3 string, activity_code string, Weekday_id int, "
    "daily_factor double"
)
HOURLY_SCHEMA = (
    "Country_code_A3 string, activity_code string, month_id int, Daytype_id int, "
    + ", ".join(f"h{i} double" for i in range(1, 25))
)
WEEKENDDAYS_SCHEMA = "Weekend_type_id int, Country_code_A3 string"
WEEKDAYS_SCHEMA = (
    "Weekend_type_id int, weekday_name string, Weekday_id int, Daytype_id int"
)


def read_edgar_weekly(spark: SparkSession, path: str) -> DataFrame:
    """``weekly_profiles.csv`` → (country, category, wratios ARRAY(7)).

    Mirrors the reference pivot (temporal.py:38-48); ratios are
    row-normalized to sum 1 (the published factors are day shares).
    A group with a missing or duplicated weekday raises.
    """
    raw = _read_csv(spark, path, ",", WEEKLY_SCHEMA).select(
        F.col("Country_code_A3").alias("country"),
        F.col("activity_code").alias("category"),
        F.col("Weekday_id").cast("int").alias("weekday"),
        F.col("daily_factor").cast("double").alias("factor"),
    )
    grouped = raw.groupBy("country", "category").agg(
        F.array_sort(F.collect_list(F.struct("weekday", "factor"))).alias("wf")
    )
    complete = F.size("wf") == WEEKLY_SIZE
    distinct_days = F.size(F.array_distinct(F.transform("wf", lambda x: x["weekday"])))
    arr = F.transform("wf", lambda x: x["factor"])
    return grouped.select(
        "country",
        "category",
        F.when(
            complete & (distinct_days == WEEKLY_SIZE), normalize_ratios(arr)
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("weekly profile incomplete for "),
                    F.col("country"),
                    F.lit("/"),
                    F.col("category"),
                )
            )
        )
        .alias("wratios"),
    )


def country_daytypes(spark: SparkSession, aux_dir: str) -> DataFrame:
    """(country, weekday 1-7, daytype) — which hourly-profile day-type
    each country uses on each weekday (temporal.py:113-126: country →
    weekend type via ``weekenddays.csv``, weekend type × weekday →
    day-type via ``weekdays.csv``)."""
    weekend_of_country = _read_csv(
        spark, f"{aux_dir}/weekenddays.csv", ";", WEEKENDDAYS_SCHEMA
    ).select(
        F.col("Country_code_A3").alias("country"),
        F.col("Weekend_type_id").cast("int").alias("weekend_type"),
    )
    day_defs = _read_csv(spark, f"{aux_dir}/weekdays.csv", ";", WEEKDAYS_SCHEMA).select(
        F.col("Weekend_type_id").cast("int").alias("weekend_type"),
        F.col("Weekday_id").cast("int").alias("weekday"),
        F.col("Daytype_id").cast("int").alias("daytype"),
    )
    return weekend_of_country.join(F.broadcast(day_defs), "weekend_type").select(
        "country", "weekday", "daytype"
    )


def read_edgar_hourly(spark: SparkSession, aux_dir: str) -> DataFrame:
    """``hourly_profiles.csv`` (+ weekend files) → (country, category,
    hratios ARRAY(2016)) hour-of-week-per-month ratios.

    Position layout matches the reference's shifted hour coordinate
    (temporal.py:136-140): pos = 168·(month−1) + 24·(weekday−1) +
    (hour−1); normalized over the whole cycle (temporal.py:165-167).
    """
    raw = _read_csv(spark, f"{aux_dir}/hourly_profiles.csv", ",", HOURLY_SCHEMA)
    hour_cols = [f"h{i}" for i in range(1, 25)]
    long = raw.select(
        F.col("Country_code_A3").alias("country"),
        F.col("activity_code").alias("category"),
        F.col("month_id").cast("int").alias("month"),
        F.col("Daytype_id").cast("int").alias("daytype"),
        F.posexplode(
            F.array(*[F.col(c).cast("double") for c in hour_cols])
        ).alias("hour0", "value"),
    )
    placed = long.join(
        F.broadcast(country_daytypes(spark, aux_dir)), ["country", "daytype"]
    ).select(
        "country",
        "category",
        (
            (F.col("month") - 1) * 168 + (F.col("weekday") - 1) * 24 + F.col("hour0")
        ).alias("pos"),
        "value",
    )
    grouped = placed.groupBy("country", "category").agg(
        F.array_sort(F.collect_list(F.struct("pos", "value"))).alias("pv")
    )
    complete = F.size("pv") == HOWPM_SIZE
    distinct_pos = F.size(F.array_distinct(F.transform("pv", lambda x: x["pos"])))
    arr = F.transform("pv", lambda x: x["value"])
    return grouped.select(
        "country",
        "category",
        F.when(complete & (distinct_pos == HOWPM_SIZE), normalize_ratios(arr))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("hourly profiles do not cover the full "),
                    F.lit("month x weekday x hour cycle for "),
                    F.col("country"),
                    F.lit("/"),
                    F.col("category"),
                )
            )
        )
        .alias("hratios"),
    )


def edgar_auxiliary_profiles(
    spark: SparkSession,
    aux_dir: str,
    inv_categories: list[str] | None = None,
    country_aliases: dict[str, str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """EDGAR auxiliary tables → (store, index) composite profiles.

    Mirrors ``read_edgar_auxilary_profiles`` (temporal.py:173-259):

    - weekly ⊕ hour-of-week-per-month concatenated per (country,
      category); a side missing from one file gets the uniform profile
      (the reference's index −1 → 1/size fill,
      ``profiles_to_scalingfactors_dataarray``, profiles/utils.py:369);
    - the concatenated vector is dictionary-encoded so identical
      (weekly, hourly) behavior shares one profile_id;
    - ``SEA`` → ``-99``; missing countries get a donor alias;
    - when ``inv_categories`` is given, categories absent from the
      tables fall back to their 3-letter prefix; an unknown prefix
      raises (temporal.py:216-222).

    Returns ``store(profile_id, ptype, ratios)`` with two rows per id
    (ptype ``weekly`` and ``hour_of_week_per_month``) and
    ``index(country, category, profile_id)``.
    """
    if country_aliases is None:
        country_aliases = DEFAULT_COUNTRY_ALIASES
    weekly = read_edgar_weekly(spark, f"{aux_dir}/weekly_profiles.csv")
    hourly = read_edgar_hourly(spark, aux_dir)

    uniform_w = F.array_repeat(F.lit(1.0 / WEEKLY_SIZE), WEEKLY_SIZE)
    uniform_h = F.array_repeat(F.lit(1.0 / HOWPM_SIZE), HOWPM_SIZE)
    both = (
        weekly.join(hourly, ["country", "category"], "full")
        .withColumn("wratios", F.coalesce("wratios", uniform_w))
        .withColumn("hratios", F.coalesce("hratios", uniform_h))
        # Dimension-sized (country × category); materialize once so the
        # dedup, the index branches and the category probe below do not
        # each re-run the CSV scan + groupBy lineage.
        .localCheckpoint(eager=False)
    )

    combined = both.select(
        "country",
        "category",
        F.lit("edgar_composite").alias("ptype"),
        F.concat("wratios", "hratios").alias("ratios"),
    )
    combined_store, index = dedup_profiles(combined)
    index = index.drop("ptype")

    store = combined_store.select(
        "profile_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit("weekly").alias("ptype"),
                    F.slice("ratios", 1, WEEKLY_SIZE).alias("ratios"),
                ),
                F.struct(
                    F.lit("hour_of_week_per_month").alias("ptype"),
                    F.slice("ratios", WEEKLY_SIZE + 1, HOWPM_SIZE).alias("ratios"),
                ),
            )
        ).alias("p"),
    ).select("profile_id", "p.ptype", "p.ratios")

    # SEA carries the "no specific country" profiles (temporal.py:233-236).
    index = index.withColumn(
        "country", F.when(F.col("country") == "SEA", F.lit("-99")).otherwise(F.col("country"))
    )

    if country_aliases:
        alias_rows = local_rows_df(
            spark,
            [(k, v) for k, v in country_aliases.items()], "country string, donor string"
        )
        aliased = index.join(
            F.broadcast(alias_rows), index["country"] == alias_rows["donor"]
        ).select(alias_rows["country"], "category", "profile_id")
        index = index.unionByName(aliased)

    if inv_categories is not None:
        # Resolve each inventory category to a table category — itself,
        # else its 3-letter prefix (temporal.py:206-222) — lazily: no
        # driver-side probe of the category set.  An unresolvable
        # category raises at execution time via the guard column.
        inv = F.broadcast(
            local_rows_df(
                spark,
                [(c, c[:3]) for c in inv_categories],
                "inv_category string, prefix string",
            )
        )
        # Fix-ups above change countries only, so the table's category
        # set equals the pre-dedup one.
        cats = F.broadcast(
            both.select("category").distinct().withColumn("__hit", F.lit(1))
        )
        resolved = (
            inv.join(cats, inv["inv_category"] == cats["category"], "left")
            .select("inv_category", "prefix", F.col("__hit").alias("__exact"))
            .join(cats, F.col("prefix") == cats["category"], "left")
            .select(
                "inv_category",
                F.when(F.col("__exact").isNotNull(), F.col("inv_category"))
                .when(
                    F.col("__hit").isNotNull(), F.col("prefix")
                )
                .otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit("category not available in the auxiliary "),
                            F.lit("profiles (even as 3-letter prefix): "),
                            F.col("inv_category"),
                            F.lit("; load the inventory with short category names"),
                        )
                    )
                )
                .alias("category"),
            )
        )
        index = index.join(F.broadcast(resolved), "category").select(
            "country", F.col("inv_category").alias("category"), "profile_id"
        )

    return store, index.select("country", "category", "profile_id")
