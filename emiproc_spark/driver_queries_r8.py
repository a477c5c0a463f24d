"""Round-8 driver queries: export-path gate frames and the bucketed
CDC state stream.

- ``hourly_gate``: the profile-normalization gate frame the hourly/ICON
  export pipelines now enforce BY DEFAULT before the hour fan-out
  (``pipelines.temporal_profile_gates`` — array-form profile store →
  explode → ``quality.ratio_sum_gate``), evaluated over the same
  profile fixtures the temporal-expansion queries use plus one planted
  non-normalized profile proving the gate detects under-emission.

Same parity conventions as the earlier modules: per-row IEEE doubles
are engine-identical, integer-tick quantization, deterministic keys.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES_R8: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES_R8: dict[str, str] = {}


# ======================================================================
# hourly_gate — the default-on profile gate of the hourly export paths
# ======================================================================
def q_hourly_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``pipelines.temporal_profile_gates`` over the shared temporal
    profile fixtures (the ones ``temporal_expand`` expands with) plus a
    planted profile summing to 23/24 + 0.5 — the exact frame
    ``tno_to_hourly`` / ``edgar_to_hourly`` / ``tno_to_icon`` enforce
    before fanning the fact table out over hours."""
    from emiproc_spark import pipelines
    from emiproc_spark.core.schemas import TPROFILE
    from emiproc_spark.driver_queries import _test_tprofiles

    profs = _test_tprofiles(spark)
    broken = spark.createDataFrame(
        [(99, "daily", [1.0 / 24] * 23 + [0.5])], schema=TPROFILE
    )
    return pipelines.temporal_profile_gates(profs.unionByName(broken))


SQL_HOURLY_GATE = """
    WITH profs AS (
        SELECT 0 AS profile_id, 'daily' AS ptype, (h + 1) / 300.0 AS ratio
        FROM UNNEST(range(24)) AS t(h)
        UNION ALL
        SELECT 1, 'daily', 1.0 / 24.0 FROM UNNEST(range(24)) AS t(h)
        UNION ALL
        SELECT 2, 'weekly', (d + 1) / 28.0 FROM UNNEST(range(7)) AS t(d)
        UNION ALL
        SELECT 99, 'daily',
               CASE WHEN h < 23 THEN 1.0 / 24.0 ELSE 0.5 END
        FROM UNNEST(range(24)) AS t(h)
    ),
    g AS (
        SELECT profile_id, ptype,
               SUM(CAST(FLOOR(ratio * 1e9 + 0.5) AS BIGINT)) AS s
        FROM profs GROUP BY 1, 2
    )
    SELECT 'temporal_profile_ratio_sum' AS relation,
           COUNT(*) AS n_groups,
           CAST(COUNT(CASE WHEN ABS(s - 1000000000) > 32 THEN 1 END)
                AS BIGINT) AS n_violations,
           COUNT(CASE WHEN ABS(s - 1000000000) > 32 THEN 1 END) = 0 AS pass
    FROM g
"""

QUERIES_R8["hourly_gate"] = q_hourly_gate
ORACLES_R8["hourly_gate"] = SQL_HOURLY_GATE
