"""Country / timezone masks: per-cell region assignment from reference
polygon tables.

Reference: ``get_country_mask`` (emiproc/utilities.py:317-531) — per
cell either the main region (argmax intersection area) or per-region
fractions; ``get_timezone_mask`` (utilities.py:205-260) same pattern
over timezone boundary polygons; ``-99`` marks no-region cells
(utilities.py:410-411).

Spark shape: the polygon reference table (Natural Earth countries, tz
boundaries) enters as (region_id, geometry WKB, bbox); the tile spatial
join from ``operators.regrid`` produces (cell, region, overlap-weight)
rows; fractions are weight-normalized per cell and the majority mask is
``max_by``.  The mask is a persistable dimension table — the engine
analogue of the reference's .npy/.nc caches (utilities.py:350-378).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from emiproc_spark.operators.regrid import weights_poly_rect

NO_REGION = "-99"


def cell_region_fractions(
    regions: DataFrame,
    grid: DataFrame,
    tile: float,
    region_col: str = "country",
    region_key_col: str = "region_key",
    area_col: str = "area",
) -> DataFrame:
    """(cell_id, region, fraction) with per-cell fractions summing to the
    covered share of the cell (ocean cells simply miss rows — the
    reference's fraction semantics, utilities.py:443-519).

    ``regions`` requires columns: ``<region_key_col>`` (unique numeric
    key), ``<region_col>`` (region label, e.g. ISO3), ``geometry``
    (polygon WKB), ``xmin``/``ymin``/``xmax``/``ymax`` (bbox), and
    ``<area_col>`` (planar polygon area).  Override the key/area column
    names via ``region_key_col``/``area_col``.

    The weight from weights_poly_rect is area(region ∩ cell)/area(region);
    fractions need area(∩)/area(cell), so we rescale by region area /
    cell area.
    """
    src = regions.select(
        F.col(region_key_col).alias("source_id"),
        "geometry",
        "xmin",
        "ymin",
        "xmax",
        "ymax",
    )
    w = weights_poly_rect(src, grid, tile)
    # convert src-relative weight to cell-relative fraction
    src_area = regions.select(
        F.col(region_key_col).alias("src_id"),
        F.col(region_col).alias("region"),
        F.col(area_col).alias("src_area"),
    )
    cell_area = grid.select(
        F.col("cell_id").alias("dst_id"),
        ((F.col("xmax") - F.col("xmin")) * (F.col("ymax") - F.col("ymin"))).alias("cell_area"),
    )
    return (
        w.join(F.broadcast(src_area), "src_id")
        .join(cell_area, "dst_id")
        .select(
            F.col("dst_id").alias("cell_id"),
            F.col("region").alias(region_col),
            (F.col("weight") * F.col("src_area") / F.col("cell_area")).alias("fraction"),
        )
        .groupBy("cell_id", region_col)
        .agg(F.sum("fraction").alias("fraction"))
    )


def majority_region(
    fractions: DataFrame,
    grid: DataFrame,
    region_col: str = "country",
) -> DataFrame:
    """Main region per cell = argmax fraction (reference utilities.py:
    516-519); cells with no overlap get NO_REGION (-99)."""
    main = fractions.groupBy("cell_id").agg(
        F.max_by(region_col, F.struct("fraction", region_col)).alias(region_col)
    )
    return (
        grid.select("cell_id")
        .join(main, "cell_id", "left")
        .withColumn(region_col, F.coalesce(F.col(region_col), F.lit(NO_REGION)))
    )


def combine_inventories(
    inside: DataFrame,
    outside: DataFrame,
    crop_weights: DataFrame,
) -> DataFrame:
    """Inside/outside merge around a boundary shape — declared but
    unimplemented in the reference (combine_inventories,
    emiproc/inventories/utils.py:687-711): crop(inside) ⊕
    crop(outside, keep_outside) ⊕ add."""
    from emiproc_spark.operators.basic import add_inventories
    from emiproc_spark.operators.regrid import crop_with_shape

    a = crop_with_shape(inside, crop_weights, keep_outside=False)
    b = crop_with_shape(outside, crop_weights, keep_outside=True)
    return add_inventories(a, b)
