"""Speciation: substance split/merge as join-explode.

Reference: ``emiproc/speciation.py``.  A speciation is a fan-out (1→N)
projection: ``emissions ⋈ speciation_table`` on selector columns, value
multiplied by ratio, substance replaced by the destination substance.
Ratios per selector group sum to 1 for mass-conserving splits
(speciation.py:99-106) but may not for molar-mass conversions like
NOx→NO+NO2 (speciation.py:366-369,472-474).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
) -> DataFrame:
    """Split substances by a ratio table.

    ``speciation``: (category, country, type, year, src_substance,
    dst_substance, ratio) with nullable selector columns — a null
    selector applies to all values of that dim (wildcard semantics,
    reference speciation.py:129-348).

    Without ``cell_country``, selectors are matched on (substance
    [, category]).  With ``cell_country`` (cell_id, country, fraction),
    country-dependent ratios are blended per cell by country fractions —
    the reference's ``countries_fractions.dot(ratios)``
    (speciation.py:228-260) expressed as join + weighted aggregation.

    Rows whose substance has no speciation entry pass through unchanged
    (unless ``drop_unspeciated``).
    """
    spec = speciation
    if cell_country is None:
        # Single-pass plan: the speciation table is grouped into split
        # arrays (category-specific and wildcard separately), broadcast,
        # left-joined, and the most specific non-null array wins —
        # unmatched substances fall back to an identity split.  One scan
        # of the fact table, two broadcast joins, zero extra shuffles;
        # specificity resolution (reference's most-specific-wins rule)
        # is the coalesce order.
        split = F.array_agg(F.struct("dst_substance", "ratio"))
        spec_c = (
            spec.where(F.col("category").isNotNull())
            .groupBy("category", F.col("src_substance").alias("substance"))
            .agg(split.alias("__splits_c"))
        )
        spec_w = (
            spec.where(F.col("category").isNull())
            .groupBy(F.col("src_substance").alias("substance"))
            .agg(split.alias("__splits_w"))
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
        )
        if drop_unspeciated:
            joined = joined.where(
                F.col("__splits_c").isNotNull() | F.col("__splits_w").isNotNull()
            )
        return joined.select(
            "cell_id",
            "category",
            F.explode("__splits").alias("__s"),
            "value_kg_y",
        ).select(
            "cell_id",
            "category",
            F.col("__s.dst_substance").alias("substance"),
            (F.col("value_kg_y") * F.col("__s.ratio")).alias("value_kg_y"),
        )
    else:
        # Country-dependent ratios blended per cell by country fractions:
        # ratio_cell = Σ_country fraction · ratio(country), with the -99
        # default row as fallback for countries absent from the table
        # (reference speciation.py:228-260).
        spec_c = spec.where(
            F.col("country").isNotNull() & (F.col("country") != "-99")
        ).select("country", "src_substance", "dst_substance", "ratio")
        default = spec.where(
            F.col("country").isNull() | (F.col("country") == "-99")
        ).select(
            F.col("src_substance").alias("src_substance"),
            F.col("dst_substance").alias("dst_substance"),
            F.col("ratio").alias("default_ratio"),
        )
        pairs = (
            spec.select("src_substance", "dst_substance").distinct()
        )
        cc = cell_country.select("cell_id", "country", "fraction")
        blended = (
            cc.crossJoin(F.broadcast(pairs))
            .join(F.broadcast(spec_c), ["country", "src_substance", "dst_substance"], "left")
            .join(F.broadcast(default), ["src_substance", "dst_substance"], "left")
            .withColumn("eff_ratio", F.coalesce("ratio", "default_ratio", F.lit(0.0)))
            .groupBy("cell_id", "src_substance", "dst_substance")
            .agg(F.sum(F.col("fraction") * F.col("eff_ratio")).alias("ratio"))
        )
        speciated = (
            emissions.alias("e")
            .join(
                blended.alias("s"),
                (F.col("e.cell_id") == F.col("s.cell_id"))
                & (F.col("e.substance") == F.col("s.src_substance")),
                "inner",
            )
            .select(
                F.col("e.cell_id").alias("cell_id"),
                F.col("e.category").alias("category"),
                F.col("s.dst_substance").alias("substance"),
                (F.col("e.value_kg_y") * F.col("s.ratio")).alias("value_kg_y"),
            )
        )
    if drop_unspeciated:
        return speciated
    # lazy anti-join (no driver collect): substances without a
    # speciation entry pass through unchanged
    srcs = speciation.select(F.col("src_substance").alias("substance")).distinct()
    untouched = emissions.join(F.broadcast(srcs), "substance", "anti")
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

    return spark.createDataFrame(rows, schema=SPECIATION)


def merge_substances(
    emissions: DataFrame,
    mapping: dict[str, list[str]],
) -> DataFrame:
    """Inverse of speciate: sum member substances into one
    (reference merge_substances, emiproc/speciation.py:504-569)."""
    from emiproc_spark.operators.basic import group_substances

    return group_substances(emissions, mapping)
