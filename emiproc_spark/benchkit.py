"""Microbenchmarks for bench.py beyond the driver-contract queries."""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def poly_refine_bench(spark: SparkSession, n: int = 50_000, grid_n: int = 100) -> int:
    """Star-polygon sources refined onto a ``grid_n``²-cell grid through
    the batched clip kernel (the weights_poly_rect hot path).  Returns
    the weight-row count; wall time is the caller's to measure."""
    from emiproc_spark.functions import geometry as geom
    from emiproc_spark.grids import regular_grid
    from emiproc_spark.operators.regrid import weights_poly_rect

    extent = 10.0 * grid_n
    rng = np.random.default_rng(7)
    cx = rng.uniform(5.0, extent - 5.0, n)
    cy = rng.uniform(5.0, extent - 5.0, n)
    rot = rng.uniform(0, 2 * np.pi, n)
    scale = rng.uniform(0.3, 1.0, n)
    base_ang = np.arange(6) * np.pi / 3
    base_rad = np.array([3.0, 2.0, 3.0, 2.0, 3.0, 2.0])
    rows = []
    for i in range(n):
        ang = base_ang + rot[i]
        rad = base_rad * scale[i]
        ring = np.column_stack((cx[i] + rad * np.cos(ang), cy[i] + rad * np.sin(ang)))
        rows.append(
            (
                i,
                bytearray(geom.wkb_polygon([tuple(p) for p in ring])),
                float(ring[:, 0].min()),
                float(ring[:, 1].min()),
                float(ring[:, 0].max()),
                float(ring[:, 1].max()),
            )
        )
    src = spark.createDataFrame(
        rows,
        "source_id long, geometry binary, xmin double, ymin double, "
        "xmax double, ymax double",
    )
    grid = regular_grid(spark, 0.0, 0.0, grid_n, grid_n, 10.0, 10.0, with_geometry=False)
    w = weights_poly_rect(src, grid, tile=10.0)
    return w.where(F.col("weight") > 0).count()
