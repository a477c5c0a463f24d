"""Vertical profile operators: conservative height re-binning.

Reference: ``emiproc/profiles/vertical_profiles.py`` — a profile is a
ratio vector over layers with top heights ``heights_top_m`` (layer k
spans (h[k-1], h[k]], first layer starts at 0); re-binning onto a new
level set distributes each source layer's mass to target layers by
interval overlap (vertical_profiles.py:140-218).

Spark model: explode layers to (profile_id, lo, hi, ratio) rows and do
an interval-overlap join against the target levels — a few rows per
profile; the whole computation is dimension-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from emiproc_spark.localdf import local_rows_df

from emiproc_spark.operators.profiles import _ratio_from_pairs


def explode_layers(vprofiles: DataFrame) -> DataFrame:
    """(profile_id, heights_top_m, ratios) → one row per layer with
    explicit (lo, hi) bounds."""
    return vprofiles.select(
        "profile_id",
        "heights_top_m",
        F.posexplode("ratios").alias("pos", "ratio"),
    ).select(
        "profile_id",
        F.when(F.col("pos") == 0, F.lit(0.0))
        .otherwise(F.element_at("heights_top_m", F.col("pos")))
        .alias("lo"),
        F.element_at("heights_top_m", F.col("pos") + 1).alias("hi"),
        "ratio",
    )


def resample_vertical_profiles(
    vprofiles: DataFrame, target_tops: list[float]
) -> DataFrame:
    """Conservatively re-bin each profile onto ``target_tops``
    (reference resample_vertical_profiles,
    emiproc/profiles/vertical_profiles.py:183-218).

    Each source layer [lo,hi) contributes ratio·overlap/(hi−lo) to every
    target layer it overlaps — an interval theta-join then hash-agg.
    Mass above the last target level is dropped (caller validates), as
    the reference's weight matrix does.

    ``target_tops`` must be strictly increasing and positive (layer 0
    spans (0, tops[0]]): an unsorted list would make every t_lo ≥ t_hi,
    zero every overlap, and silently return all-zero profiles.
    """
    if not target_tops or not all(
        a < b for a, b in zip([0.0, *target_tops], target_tops)
    ):
        raise ValueError(
            "resample_vertical_profiles: target_tops must be strictly "
            f"increasing and positive, got {target_tops}"
        )
    spark = vprofiles.sparkSession
    bounds = [(i, (0.0 if i == 0 else target_tops[i - 1]), t) for i, t in enumerate(target_tops)]
    tgt = local_rows_df(spark, bounds, "layer int, t_lo double, t_hi double")
    layers = explode_layers(vprofiles)
    overlap = F.greatest(
        F.lit(0.0), F.least("hi", "t_hi") - F.greatest("lo", "t_lo")
    )
    # a zero-thickness source layer (hi == lo, a collapsed level set)
    # would yield ratio·0/0 = NaN that the part > 0 filter silently
    # drops — that layer's mass must not vanish; fail loudly instead
    thickness = F.when(
        F.col("hi") > F.col("lo"), F.col("hi") - F.col("lo")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("resample_vertical_profiles: degenerate source layer ["),
                F.col("lo").cast("string"),
                F.lit(", "),
                F.col("hi").cast("string"),
                F.lit(") in profile "),
                F.col("profile_id").cast("string"),
                F.lit(" — heights_top_m must be strictly increasing"),
            )
        ).cast("double")
    )
    contrib = (
        layers.crossJoin(F.broadcast(tgt))
        .withColumn("part", F.col("ratio") * overlap / thickness)
        .where(F.col("part") > 0.0)
        .groupBy("profile_id", "layer")
        .agg(F.sum("part").alias("ratio"))
    )
    # zero-fill target layers that received no mass, so every profile
    # keeps exactly len(target_tops) entries
    scaffold = vprofiles.select("profile_id").distinct().crossJoin(
        F.broadcast(tgt.select("layer"))
    )
    filled = scaffold.join(contrib, ["profile_id", "layer"], "left").withColumn(
        "ratio", F.coalesce("ratio", F.lit(0.0))
    )
    tops = F.array(*[F.lit(t) for t in target_tops])
    return (
        filled.groupBy("profile_id")
        .agg(_ratio_from_pairs("layer", "ratio").alias("ratios"))
        .withColumn("heights_top_m", tops)
        .select("profile_id", "heights_top_m", "ratios")
    )
