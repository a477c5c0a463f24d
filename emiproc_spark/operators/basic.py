"""Scalar pipeline operators: pure joins/aggregations, no geometry.

Each function mirrors a reference operator (cited per-function) but is a
lazy DataFrame transformation.  Scale notes:

- grouping maps and scaling tables are tiny → always broadcast;
- `groupBy(cell_id, category, substance)` aggregations get map-side
  partial aggregation from Spark automatically (the reference's
  column-block sums, vectorized differently);
- nothing here collects to the driver except the explicit totals
  checkers, whose result is O(categories × substances).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emiproc_spark.localdf import local_rows_df

KEY = ["cell_id", "category", "substance"]


def _mapping_df(spark: SparkSession, mapping: dict[str, str], key: str) -> DataFrame:
    """dict {old -> group} as a broadcastable 2-column table."""
    rows = [(k, v) for k, v in mapping.items()]
    return local_rows_df(spark, rows, f"{key} string, __group string")


def validate_group(mapping: dict[str, list[str]]) -> dict[str, str]:
    """Invert {group: [members]} to {member: group}; members must be
    disjoint (reference validate_group, emiproc/inventories/utils.py:91-117)."""
    inv: dict[str, str] = {}
    for group, members in mapping.items():
        for m in members:
            if m in inv:
                raise ValueError(f"category {m!r} appears in groups {inv[m]!r} and {group!r}")
            inv[m] = group
    return inv


def group_categories(
    emissions: DataFrame,
    mapping: dict[str, list[str]],
    ignore_missing: bool = False,
    strict: bool = False,
) -> DataFrame:
    """Rollup on the category key: new cat = Σ member cats per substance.

    Reference: group_categories, emiproc/inventories/utils.py:264-375.
    Spark plan: broadcast-join the member→group map, then hash-aggregate.

    Uncovered categories: ``strict=True`` raises at execution when the
    inventory holds a category absent from the mapping (the reference's
    validate_group coverage check, inventories/utils.py:91-118 — typos in
    group maps surface instead of passing through); default passes them
    through unchanged; ``ignore_missing=True`` drops them.
    """
    if strict and ignore_missing:
        raise ValueError("strict and ignore_missing are mutually exclusive")
    member_to_group = validate_group(mapping)
    spark = emissions.sparkSession
    mdf = _mapping_df(spark, member_to_group, "category")
    joined = emissions.join(F.broadcast(mdf), "category", "inner" if ignore_missing else "left")
    if strict:
        joined = joined.withColumn(
            "value_kg_y",
            F.when(
                F.col("__group").isNull(),
                F.raise_error(
                    F.concat(
                        F.lit("group_categories: category not covered by mapping: "),
                        F.col("category"),
                    )
                ).cast("double"),
            ).otherwise(F.col("value_kg_y")),
        )
    if not ignore_missing:
        joined = joined.withColumn("__group", F.coalesce(F.col("__group"), F.col("category")))
    return (
        joined.groupBy("cell_id", F.col("__group").alias("category"), "substance")
        .agg(F.sum("value_kg_y").alias("value_kg_y"))
    )


def group_substances(
    emissions: DataFrame,
    mapping: dict[str, list[str]],
    strict: bool = False,
) -> DataFrame:
    """Same rollup over the substance key, with the same ``strict``
    coverage check as :func:`group_categories`
    (reference group_substances, emiproc/inventories/utils.py:378-474)."""
    member_to_group = validate_group(mapping)
    mdf = _mapping_df(emissions.sparkSession, member_to_group, "substance")
    joined = emissions.join(F.broadcast(mdf), "substance", "left")
    if strict:
        joined = joined.withColumn(
            "value_kg_y",
            F.when(
                F.col("__group").isNull(),
                F.raise_error(
                    F.concat(
                        F.lit("group_substances: substance not covered by mapping: "),
                        F.col("substance"),
                    )
                ).cast("double"),
            ).otherwise(F.col("value_kg_y")),
        )
    return (
        joined.withColumn("__group", F.coalesce(F.col("__group"), F.col("substance")))
        .groupBy("cell_id", "category", F.col("__group").alias("substance"))
        .agg(F.sum("value_kg_y").alias("value_kg_y"))
    )


def add_inventories(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union + element-wise add; missing (cell,cat,sub) keys act as 0
    (reference add_inventories, emiproc/inventories/utils.py:477-577)."""
    return (
        a.select(*KEY, "value_kg_y")
        .unionByName(b.select(*KEY, "value_kg_y"))
        .groupBy(*KEY)
        .agg(F.sum("value_kg_y").alias("value_kg_y"))
    )


def scale_inventory(
    emissions: DataFrame,
    factors: DataFrame | float,
) -> DataFrame:
    """Multiply by a global float or a per-(category, substance) factor
    table (category, substance, factor); unmatched keys scale by 1.0.

    Reference: scale_inventory, emiproc/inventories/utils.py:631-684.
    """
    if isinstance(factors, (int, float)):
        return emissions.withColumn("value_kg_y", F.col("value_kg_y") * F.lit(float(factors)))
    # collapse to one row per key with a duplicate flag: a doubled
    # factor row would otherwise fan the join out and silently multiply
    # mass (the same ambiguity attach_profiles raises on)
    checked = factors.groupBy("category", "substance").agg(
        F.first("factor").alias("factor"), (F.count("*") > 1).alias("__dupf")
    )
    eff = F.when(
        F.col("__dupf"),
        F.raise_error(
            F.concat(
                F.lit("scale_inventory: several factor rows for (category="),
                F.col("category"),
                F.lit(", substance="),
                F.col("substance"),
                F.lit(") — deduplicate the factor table"),
            )
        ).cast("double"),
    ).otherwise(F.coalesce(F.col("factor"), F.lit(1.0)))
    return (
        emissions.join(F.broadcast(checked), ["category", "substance"], "left")
        .withColumn("value_kg_y", F.col("value_kg_y") * eff)
        .drop("factor", "__dupf")
    )


def drop(
    emissions: DataFrame,
    categories: list[str] | None = None,
    substances: list[str] | None = None,
    keep_instead_of_drop: bool = False,
) -> DataFrame:
    """Drop (or keep-only) lists of categories/substances
    (reference drop, emiproc/inventories/utils.py:714-772)."""
    df = emissions
    # `is not None`, not truthiness: an EMPTY keep-list means "keep
    # nothing" (and an empty drop-list drops nothing), not "skip the
    # filter entirely"
    if categories is not None:
        cond = F.col("category").isin(categories) if categories else F.lit(False)
        df = df.where(cond if keep_instead_of_drop else ~cond)
    if substances is not None:
        cond = F.col("substance").isin(substances) if substances else F.lit(False)
        df = df.where(cond if keep_instead_of_drop else ~cond)
    return df


def get_total_emissions(
    emissions: DataFrame,
    shaped: DataFrame | None = None,
    total_key: str = "__total__",
) -> DataFrame:
    """Per-(substance, category) totals plus a per-substance ``__total__``
    row — the reference's conservation oracle
    (get_total_emissions, emiproc/inventories/utils.py:580-628).

    Implemented as ``rollup(substance, category)`` so Spark computes the
    per-category and per-substance aggregates in one pass; the grand-total
    row (both null) is filtered out to match reference semantics.
    """
    df = emissions.select("substance", "category", "value_kg_y")
    if shaped is not None:
        df = df.unionByName(shaped.select("substance", "category", "value_kg_y"))
    # F.grouping distinguishes the rollup's subtotal rows from DATA
    # rows whose key is genuinely NULL — coalescing on the value would
    # conflate a null-category data row with the per-substance subtotal
    return (
        df.rollup("substance", "category")
        .agg(
            F.sum("value_kg_y").alias("total_kg_y"),
            F.grouping("substance").alias("__gs"),
            F.grouping("category").alias("__gc"),
        )
        .where(F.col("__gs") == 0)
        .withColumn(
            "category",
            F.when(F.col("__gc") == 1, F.lit(total_key)).otherwise(
                F.col("category")
            ),
        )
        .drop("__gs", "__gc")
    )


def total_emissions_diff(
    a: DataFrame,
    b: DataFrame,
    rtol: float = 1e-5,
) -> DataFrame:
    """Per-key relative comparison of two totals tables as a DataFrame
    (the distributed core of the reference's invariant checker,
    total_emissions_almost_equal, emiproc/utilities.py:545-578).

    Full-outer join on (substance, category); ``within_tol`` is false
    for keys present on only one side or whose relative difference
    exceeds ``rtol``.  Returns (substance, category, total_a, total_b,
    within_tol).
    """
    ta = a.select("substance", "category", F.col("total_kg_y").alias("total_a"))
    tb = b.select("substance", "category", F.col("total_kg_y").alias("total_b"))
    j = ta.join(tb, ["substance", "category"], "full")
    va, vb = F.col("total_a"), F.col("total_b")
    denom = F.greatest(F.abs(va), F.abs(vb))
    ok = (
        F.when(va.isNull() | vb.isNull(), F.lit(False))
        .when(va == vb, F.lit(True))
        .when(denom == 0.0, F.lit(True))
        .otherwise(F.abs(va - vb) / denom <= F.lit(rtol))
    )
    return j.withColumn("within_tol", ok)


def total_emissions_almost_equal(
    a: DataFrame,
    b: DataFrame,
    rtol: float = 1e-5,
) -> bool:
    """Boolean wrapper over :func:`total_emissions_diff` — one
    distributed count of violations (O(1) rows to the driver)."""
    return (
        total_emissions_diff(a, b, rtol).where(~F.col("within_tol")).limit(1).count()
        == 0
    )
