"""Speciation: substance split/merge as join-explode.

Reference: ``emiproc/speciation.py``.  A speciation is a fan-out (1→N)
projection: ``emissions ⋈ speciation_table`` on selector columns, value
multiplied by ratio, substance replaced by the destination substance.
Ratios per selector group sum to 1 for mass-conserving splits
(speciation.py:99-106) but may not for molar-mass conversions like
NOx→NO+NO2 (speciation.py:366-369,472-474).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from emiproc_spark.localdf import local_rows_df

from emiproc_spark.operators.basic import KEY

# NOx speciation constants (reference emiproc/speciation.py:439-501):
# mass NOx is expressed as NO2-equivalent; NO fraction converts with
# molar masses M(NO)=30, M(NO2)=46.
MM_NO = 30.0
MM_NO2 = 46.0


def speciate(
    emissions: DataFrame,
    speciation: DataFrame,
    cell_country: DataFrame | None = None,
    drop_unspeciated: bool = False,
    year: int | None = None,
    source_type: str | None = "gridded",
) -> DataFrame:
    """Split substances by a ratio table.

    ``speciation``: (category, country, type, year, src_substance,
    dst_substance, ratio) with nullable selector columns — a null
    selector applies to all values of that dim (wildcard semantics,
    reference speciation.py:129-348).

    The ``year``/``type`` selector columns are resolved up-front the way
    the reference does (``speciation_ratios["year"] == inv.year``,
    speciation.py:194-202; ``type == "gridded"``, speciation.py:220-221):
    rows with a non-null selector survive only if it equals the ``year``
    / ``source_type`` argument.  If several ratio rows remain for one
    (category, src, dst) selector group the plan raises at execution
    (the reference's "ratios not unique" error, speciation.py:264-269)
    instead of silently multiplying mass.

    Without ``cell_country``, selectors are matched on (substance
    [, category]).  With ``cell_country`` (cell_id, country, fraction),
    country-dependent ratios are blended per cell by country fractions
    normalized per cell (reference divides by
    ``countries_fractions.sum("country")``, speciation.py:211-213) so
    partially-covered cells keep full mass; cells whose blended ratios
    sum to 0 (no covered country in the table, or no coverage at all)
    fall back to the ``-99`` default row, and raise if none exists and
    the cell has emissions (speciation.py:238-258).

    Rows whose substance has no speciation entry pass through unchanged
    (unless ``drop_unspeciated``).
    """
    spec = speciation
    if year is not None and "year" in spec.columns:
        spec = spec.where(F.col("year").isNull() | (F.col("year") == F.lit(year)))
    if source_type is not None and "type" in spec.columns:
        spec = spec.where(
            F.col("type").isNull() | (F.col("type") == F.lit(source_type))
        )
    # With year/type left unresolved, rows differing only in those
    # selectors collide in one group and trip the duplicate guard below
    # (reference resolves year==inv.year / type=="gridded" up-front,
    # speciation.py:194-202,220-221, and errors on non-unique ratios).
    if cell_country is None:
        # Single-pass plan: the speciation table is grouped into split
        # arrays (category-specific and wildcard separately), broadcast,
        # left-joined, and the most specific non-null array wins —
        # unmatched substances fall back to an identity split.  One scan
        # of the fact table, two broadcast joins, zero extra shuffles;
        # specificity resolution (reference's most-specific-wins rule)
        # is the coalesce order.
        split = F.array_agg(F.struct("dst_substance", "ratio"))
        # >1 row per dst within a selector group means year/type were not
        # resolved to a single ratio set — the reference raises
        # (speciation.py:264-269); we raise lazily at execution.
        dup = F.count("*") > F.count_distinct("dst_substance")
        spec_c = (
            spec.where(F.col("category").isNotNull())
            .groupBy("category", F.col("src_substance").alias("substance"))
            .agg(split.alias("__splits_c"), dup.alias("__dup_c"))
        )
        spec_w = (
            spec.where(F.col("category").isNull())
            .groupBy(F.col("src_substance").alias("substance"))
            .agg(split.alias("__splits_w"), dup.alias("__dup_w"))
        )
        identity = F.array(
            F.struct(
                F.col("substance").alias("dst_substance"),
                F.lit(1.0).alias("ratio"),
            )
        )
        joined = (
            emissions.join(F.broadcast(spec_c), ["category", "substance"], "left")
            .join(F.broadcast(spec_w), ["substance"], "left")
            .withColumn(
                "__splits", F.coalesce("__splits_c", "__splits_w", identity)
            )
            .withColumn(
                "__dup",
                F.when(F.col("__splits_c").isNotNull(), F.col("__dup_c")).otherwise(
                    F.coalesce(F.col("__dup_w"), F.lit(False))
                ),
            )
        )
        if drop_unspeciated:
            joined = joined.where(
                F.col("__splits_c").isNotNull() | F.col("__splits_w").isNotNull()
            )
        # the guard must name the SOURCE substance (carried as __src:
        # the final select re-aliases "substance" to the destination, and
        # referencing F.col("substance") there would resolve via implicit
        # lateral column alias to the dst — misdirecting debugging and
        # silently depending on spark.sql.lateralColumnAlias)
        guard = F.when(
            F.col("__dup"),
            F.raise_error(
                F.concat(
                    F.lit("speciate: multiple ratio rows per (category, src, dst) "
                          "selector group for substance "),
                    F.col("__src"),
                    F.lit(" — resolve year/type first"),
                )
            ).cast("double"),
        ).otherwise(F.col("__s.ratio"))
        return joined.select(
            "cell_id",
            "category",
            "__dup",
            F.col("substance").alias("__src"),
            F.explode("__splits").alias("__s"),
            "value_kg_y",
        ).select(
            "cell_id",
            "category",
            F.col("__s.dst_substance").alias("substance"),
            (F.col("value_kg_y") * guard).alias("value_kg_y"),
        )
    else:
        # Country-dependent ratios blended per cell by country fractions:
        # ratio_cell = Σ_country fraction_norm · ratio(country).  Fractions
        # are normalized per cell first (reference speciation.py:211-213)
        # so partially-covered cells keep full mass; countries absent from
        # the ratio table contribute 0 (xarray .dot drops them); cells
        # whose blended ratios sum to 0 fall back to the -99 default row
        # and raise if none exists and the cell has emissions
        # (speciation.py:238-258).
        #
        # The reference blends PER CATEGORY (ratios_of_category runs
        # before the country dot product, speciation.py:215-224): the
        # selector table is first resolved to one row set per fact
        # category — category-specific rows win over wildcard
        # (category-null) rows per (category, src) — and the blend keys
        # include the category, so rows differing only in category are
        # never summed together.
        if "category" not in spec.columns:
            spec = spec.withColumn("category", F.lit(None).cast("string"))
        sel_cols = ["category", "country", "src_substance", "dst_substance", "ratio"]
        # truncate: the category dimension feeds every derived selector
        # frame below (resolved → spec_c/default/pairs/dup_keys); without
        # the checkpoint each re-derives it with its OWN full fact scan
        # + distinct
        fact_cats = emissions.select("category").distinct().localCheckpoint(eager=False)
        spec_cat = spec.where(F.col("category").isNotNull())
        spec_wild = spec.where(F.col("category").isNull()).drop("category")
        have = spec_cat.select("category", "src_substance").distinct()
        resolved = (
            spec_cat.join(fact_cats, "category", "left_semi")
            .select(*sel_cols)
            .unionByName(
                fact_cats.crossJoin(F.broadcast(spec_wild))
                # broadcast: `have` is dimension-sized (distinct selector
                # keys); without the hint the anti-join sort-merges and
                # shuffles the scaffold
                .join(F.broadcast(have), ["category", "src_substance"], "anti")
                .select(*sel_cols)
            )
        )
        # resolved is selector-table-sized and consumed by four derived
        # dimensions — materialize it once
        resolved = resolved.localCheckpoint(eager=False)
        # duplicate guard (the no-cell_country path's raise, restated):
        # >1 row per (category, country|-99, src, dst) means year/type
        # were not resolved — the blend below would silently SUM them
        dup_keys = (
            resolved.groupBy(
                "category",
                F.coalesce(F.col("country"), F.lit("-99")).alias("__c"),
                "src_substance",
                "dst_substance",
            )
            .agg(F.count("*").alias("__n"))
            .where(F.col("__n") > 1)
            .select("category", "src_substance")
            .distinct()
            .withColumn("__dup_cc", F.lit(True))
        )
        spec_c = resolved.where(
            F.col("country").isNotNull() & (F.col("country") != "-99")
        ).select("category", "country", "src_substance", "dst_substance", "ratio")
        default = resolved.where(
            F.col("country").isNull() | (F.col("country") == "-99")
        ).select(
            "category",
            "src_substance",
            "dst_substance",
            F.col("ratio").alias("__default_ratio"),
        )
        pairs = resolved.select(
            "category", "src_substance", "dst_substance"
        ).distinct()
        cell_win = Window.partitionBy("cell_id")
        cc = (
            cell_country.select("cell_id", "country", "fraction")
            .withColumn("__tot", F.sum("fraction").over(cell_win))
            .withColumn(
                "__frac_n",
                F.when(
                    F.col("__tot") > 0.0, F.col("fraction") / F.col("__tot")
                ).otherwise(F.lit(0.0)),
            )
        )
        blended = (
            cc.join(F.broadcast(spec_c), "country", "inner")
            .groupBy("cell_id", "category", "src_substance", "dst_substance")
            .agg(F.sum(F.col("__frac_n") * F.col("ratio")).alias("__ratio_blend"))
        )
        # Σ over dst of the blended ratios per (cell, src) — the
        # reference's mask_zero_ratios test (speciation.py:238-246) —
        # computed on the DIMENSION side and joined back on (cell, src),
        # NOT folded into the per-(cell, src, dst) blend rows: a fan row
        # whose (cell, src, dst) is absent from the blend (a dst only
        # covered by countries that don't touch this cell) must still
        # see the group's nonzero sum and resolve to ratio 0, not fall
        # back to the -99 default and inflate mass.  Both dimensions are
        # cell_country-sized (the reference's in-memory xarray blend
        # makes the same assumption) and broadcast, so the fact fan-out
        # takes two broadcast hash joins and never shuffles.
        rsum = blended.groupBy("cell_id", "category", "src_substance").agg(
            F.sum("__ratio_blend").alias("__rsum_b")
        )
        # only facts whose substance IS speciated fan out; a covered
        # substance whose category has no resolved rows (specific rows
        # for other categories only, no wildcard) raises like the
        # reference's "not defined" error (speciation.py:224-227)
        srcs = spec.select(F.col("src_substance").alias("substance")).distinct()
        fan = (
            emissions.join(F.broadcast(srcs), "substance", "left_semi")
            .join(
                F.broadcast(pairs.withColumnRenamed("category", "__pcat")),
                (F.col("category") == F.col("__pcat"))
                & (F.col("substance") == F.col("src_substance")),
                "left",
            )
            .drop("__pcat")
        )
        j = (
            fan.join(
                F.broadcast(blended),
                ["cell_id", "category", "src_substance", "dst_substance"],
                "left",
            )
            .join(
                F.broadcast(default),
                ["category", "src_substance", "dst_substance"],
                "left",
            )
            .join(
                F.broadcast(rsum), ["cell_id", "category", "src_substance"], "left"
            )
            .join(F.broadcast(dup_keys), ["category", "src_substance"], "left")
            .withColumn("__rsum", F.coalesce("__rsum_b", F.lit(0.0)))
        )
        no_default_err = F.raise_error(
            F.concat(
                F.lit("speciate: no country ratios and no -99 default for cell "),
                F.col("cell_id").cast("string"),
                F.lit(" with nonzero emissions — add a -99 row"),
            )
        ).cast("double")
        not_defined_err = F.raise_error(
            F.concat(
                F.lit("speciate: no ratio rows for category "),
                F.col("category"),
                F.lit(" and substance "),
                F.col("substance"),
                F.lit(" (reference raises, speciation.py:224-227) — add a "
                      "wildcard (null-category) or category-specific row"),
            )
        ).cast("double")
        dup_err = F.raise_error(
            F.concat(
                F.lit("speciate: multiple ratio rows per (category, country, "
                      "src, dst) for category "),
                F.col("category"),
                F.lit(" substance "),
                F.col("substance"),
                F.lit(" — resolve year/type first"),
            )
        ).cast("double")
        eff_ratio = (
            F.when(F.coalesce(F.col("__dup_cc"), F.lit(False)), dup_err)
            .when(F.col("dst_substance").isNull(), not_defined_err)
            .when(
                F.col("__rsum") == 0.0,
                F.coalesce(
                    F.col("__default_ratio"),
                    F.when(F.col("value_kg_y") == 0.0, F.lit(0.0)).otherwise(
                        no_default_err
                    ),
                ),
            )
            .otherwise(F.coalesce(F.col("__ratio_blend"), F.lit(0.0)))
        )
        speciated = j.select(
            "cell_id",
            "category",
            F.col("dst_substance").alias("substance"),
            (F.col("value_kg_y") * eff_ratio).alias("value_kg_y"),
        )
    if drop_unspeciated:
        return speciated
    # lazy anti-join (no driver collect): substances without a
    # speciation entry pass through unchanged.  The anti-join uses the
    # year/type-FILTERED table: a substance whose only rows failed the
    # selector is unspeciated for this call and must pass through, not
    # silently vanish.
    srcs_all = spec.select(F.col("src_substance").alias("substance")).distinct()
    untouched = emissions.join(F.broadcast(srcs_all), "substance", "anti")
    return untouched.select(*KEY, "value_kg_y").unionByName(speciated)


def speciate_nox(
    emissions: DataFrame,
    no2_fraction: float = 0.18,
    nox_substance: str = "NOx",
) -> DataFrame:
    """NOx (as NO2-equivalent mass) → NO + NO2 with the molar-mass ratio
    30/46 applied to the NO share (reference speciate_nox,
    emiproc/speciation.py:439-501)."""
    spark = emissions.sparkSession
    table = _nox_table(spark, no2_fraction, nox_substance)
    return speciate(emissions, table)


def _nox_table(spark: SparkSession, no2_fraction: float, nox: str) -> DataFrame:
    rows = [
        (None, None, None, None, nox, "NO2", float(no2_fraction)),
        (None, None, None, None, nox, "NO", (1.0 - no2_fraction) * MM_NO / MM_NO2),
    ]
    from emiproc_spark.core.schemas import SPECIATION

    return local_rows_df(spark, rows, SPECIATION)


def speciate_inventory(
    emissions: DataFrame,
    speciation_dict: dict[tuple[str, str], dict[tuple[str, str], float]],
    drop_speciated: bool = True,
) -> DataFrame:
    """Dict-driven (cat, sub) → {(cat', sub'): ratio} fan-out — unlike
    :func:`speciate` the *category* may change, and ratios need not sum
    to 1 (molar-mass conversions, reference speciate_inventory,
    emiproc/speciation.py:351-436, non-normalized note :366-369).

    Keys absent from the dict pass through unchanged; speciated source
    rows are dropped unless ``drop_speciated=False`` (reference ``drop``
    arg, speciation.py:363).
    """
    spark = emissions.sparkSession
    rows = [
        (cat, sub, dst_cat, dst_sub, float(ratio))
        for (cat, sub), dsts in speciation_dict.items()
        for (dst_cat, dst_sub), ratio in dsts.items()
    ]
    table = local_rows_df(
        spark,
        rows,
        (
            "category string, substance string, dst_category string, "
            "dst_substance string, ratio double"
        ),
    )
    splits = table.groupBy("category", "substance").agg(
        F.array_agg(
            F.struct("dst_category", "dst_substance", "ratio")
        ).alias("__splits")
    )
    speciated = (
        emissions.join(F.broadcast(splits), ["category", "substance"], "inner")
        .select("cell_id", F.explode("__splits").alias("__s"), "value_kg_y")
        .select(
            "cell_id",
            F.col("__s.dst_category").alias("category"),
            F.col("__s.dst_substance").alias("substance"),
            (F.col("value_kg_y") * F.col("__s.ratio")).alias("value_kg_y"),
        )
    )
    if drop_speciated:
        keys = table.select("category", "substance").distinct()
        untouched = emissions.join(
            F.broadcast(keys), ["category", "substance"], "anti"
        ).select(*KEY, "value_kg_y")
    else:
        # anti ∪ semi on the same keys is just the original table — no
        # joins needed when the speciated rows are kept alongside
        untouched = emissions.select(*KEY, "value_kg_y")
    return untouched.unionByName(speciated.select(*KEY, "value_kg_y"))


def merge_substances(
    emissions: DataFrame,
    mapping: dict[str, list[str]],
) -> DataFrame:
    """Inverse of speciate: sum member substances into one
    (reference merge_substances, emiproc/speciation.py:504-569)."""
    from emiproc_spark.operators.basic import group_substances

    return group_substances(emissions, mapping)
