"""Microbenchmarks for bench.py beyond the driver-contract queries."""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def poly_refine_bench(spark: SparkSession, n: int = 50_000, grid_n: int = 100) -> int:
    """Star-polygon sources refined onto a ``grid_n``²-cell grid through
    the batched clip kernel (the weights_poly_rect hot path).  Returns
    the weight-row count; wall time is the caller's to measure."""
    import pandas as pd

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
    # vectorized fixture: (n, 6) corner arrays → batched WKB via one
    # structured array; rows ship through Arrow, so fixture-building
    # noise stays out of what this microbench tracks (the clip kernel)
    ang = base_ang[None, :] + rot[:, None]
    rad = base_rad[None, :] * scale[:, None]
    xs = cx[:, None] + rad * np.cos(ang)
    ys = cy[:, None] + rad * np.sin(ang)
    from emiproc_spark.functions.geometry import ring_wkb_batch

    pdf = pd.DataFrame(
        {
            "source_id": np.arange(n, dtype=np.int64),
            "geometry": ring_wkb_batch(xs, ys),
            "xmin": xs.min(axis=1),
            "ymin": ys.min(axis=1),
            "xmax": xs.max(axis=1),
            "ymax": ys.max(axis=1),
        }
    )
    src = spark.createDataFrame(pdf)
    grid = regular_grid(spark, 0.0, 0.0, grid_n, grid_n, 10.0, 10.0, with_geometry=False)
    w = weights_poly_rect(src, grid, tile=10.0)
    return w.where(F.col("weight") > 0).count()
