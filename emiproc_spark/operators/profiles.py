"""Profile algebra: temporal/vertical distribution ratios as tables.

Reference: ``emiproc/profiles/`` — profiles are row-normalized ratio
vectors over fixed cyclic domains (daily 24, weekly 7, monthly 12, …)
stored dense; indexes are sparse integer arrays over subsets of
{category, substance, cell, country, type} with −1 = "no profile"
(constant, scaling factor 1.0).

Spark model (SURVEY.md §1.3):

    tprofile(profile_id, ptype, ratios ARRAY<DOUBLE>)
    tprofile_index(category?, substance?, cell_id?, country?, type?, profile_id)

Null index dim = wildcard; LEFT-JOIN miss or profile_id −1 resolves to
scaling factor 1.0 via coalesce — the universal null semantics
(reference profiles/utils.py:342-369).

Scale notes: profile stores are *dimension* data (thousands of rows) —
always broadcastable; the emission-weighted aggregations run on the fact
table side and shuffle only on their grouping keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from emiproc_spark.localdf import local_rows_df

INDEX_DIMS = ["category", "substance", "cell_id", "country", "type"]


def _ratio_from_pairs(pos_col: str = "pos", val_col: str = "ratio") -> F.Column:
    """Re-assemble an array from exploded (pos, value) rows, pos-ordered."""
    return F.transform(
        F.array_sort(F.collect_list(F.struct(pos_col, val_col))),
        lambda s: s[val_col],
    )


def normalize_ratios(ratios: F.Column) -> F.Column:
    """Row-normalize; all-zero → uniform (reference rescale_ratios,
    emiproc/profiles/temporal/composite.py:29-45).

    The total is folded once and bound via ``aggregate``'s finish
    lambda: higher-order functions are interpreted with no
    subexpression elimination, so referencing a free-standing
    aggregate expression inside the ``transform`` lambda re-evaluates
    the whole O(n) fold PER ELEMENT — O(n²) per row, measured as a
    ~1.8 s single-task CPU burn on EDGAR's 2016-slot arrays."""
    n = F.size(ratios)
    return F.aggregate(
        ratios,
        F.lit(0.0),
        lambda a, x: a + x,
        lambda total: F.when(
            total == F.lit(0.0), F.transform(ratios, lambda _: F.lit(1.0) / n)
        ).otherwise(F.transform(ratios, lambda x: x / total)),
    )


def get_weights_of_profiles(
    emissions: DataFrame, index_dims: list[str]
) -> DataFrame:
    """Emission mass governed by each profile-index coordinate — the
    weight used in every profile merge (reference
    get_weights_of_gdf_profiles, emiproc/profiles/operators.py:253-304)."""
    return emissions.groupBy(*index_dims).agg(F.sum("value_kg_y").alias("weight"))


def combine_profiles(
    index_with_weight: DataFrame,
    tprofiles: DataFrame,
    group_dims: list[str],
) -> DataFrame:
    """Weighted-average reduce of profiles over the dims NOT in
    ``group_dims`` (reference combine_profiles,
    emiproc/profiles/operators.py:141-250).

    ``index_with_weight``: index rows + ``weight`` column (emission mass).
    Rows with profile_id −1 are excluded (weight 0 — reference
    operators.py:178-183).  Returns (group_dims…, ptype, ratios).

    Plan: inner-join the (broadcast) profile store, ``posexplode`` the
    ratio vector, hash-aggregate Σ(w·r)/Σw per (group, ptype, pos), then
    re-assemble the array.  Weighted averages of normalized rows stay
    normalized; a zero-weight group falls back to uniform.
    """
    joined = index_with_weight.where(F.col("profile_id") >= 0).join(
        F.broadcast(tprofiles), "profile_id", "inner"
    )
    exploded = joined.select(
        *group_dims,
        "ptype",
        "weight",
        F.posexplode("ratios").alias("pos", "ratio"),
    )
    agg = exploded.groupBy(*group_dims, "ptype", "pos").agg(
        F.sum(F.col("weight") * F.col("ratio")).alias("wr"),
        F.sum("weight").alias("w"),
    )
    # zero-weight group: emit 0.0 so normalize_ratios' all-zero→uniform
    # rule applies (reference rescale_ratios, composite.py:29-45); a null
    # here would poison the whole rebuilt array instead
    combined = agg.withColumn(
        "ratio", F.when(F.col("w") == 0.0, F.lit(0.0)).otherwise(F.col("wr") / F.col("w"))
    )
    return (
        combined.groupBy(*group_dims, "ptype")
        .agg(_ratio_from_pairs().alias("ratios"))
        .withColumn("ratios", normalize_ratios(F.col("ratios")))
    )


def group_profiles_indexes(
    index_with_weight: DataFrame,
    tprofiles: DataFrame,
    mapping: dict[str, list[str]],
    dim: str = "category",
) -> DataFrame:
    """Apply a category/substance grouping to profiles: per group, the
    emission-weighted combine (reference group_profiles_indexes,
    emiproc/profiles/operators.py:307-411)."""
    spark = index_with_weight.sparkSession
    rows = [(m, g) for g, ms in mapping.items() for m in ms]
    mdf = local_rows_df(spark, rows, f"{dim} string, __group string")
    regrouped = (
        index_with_weight.join(F.broadcast(mdf), dim, "left")
        .withColumn(dim, F.coalesce("__group", dim))
        .drop("__group")
    )
    other_dims = [d for d in INDEX_DIMS if d in index_with_weight.columns and d != dim]
    return combine_profiles(regrouped, tprofiles, [dim, *other_dims])


def dedup_profiles(profiles: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Dictionary-encode distinct ratio vectors (reference
    ratios_dataarray_to_profiles, emiproc/profiles/utils.py:372-423).

    Input: any DF with (…keys, ptype, ratios).  Returns
    (store(profile_id, ptype, ratios), index(…keys, profile_id)).

    Ids are the lexicographic rank of (ptype, ratios), assigned by a
    range-partitioned distributed sort + per-partition offset — no
    single-task global window and no Python round-trip, so per-cell
    profile stores (TNO gridded day-of-year) dedup at scale too.
    """
    key_cols = [c for c in profiles.columns if c not in ("ptype", "ratios")]
    distinct = profiles.select("ptype", "ratios").distinct()
    # Rank = per-range-partition local row number + the row count of all
    # earlier partitions.  monotonically_increasing_id() encodes exactly
    # (partition_id << 33) + local row number in task order, and the
    # preceding sortWithinPartitions fixes that order to the sort order,
    # so (mid − (pid << 33)) is the local rank — entirely JVM-side (the
    # old rdd.zipWithIndex ran an EAGER count job at query-build time
    # and pickled every ratio vector through a Python round-trip, and
    # its createDataFrame scan planned as a pickled-RDD scan).  The
    # lazy localCheckpoint pins the physical partitioning so the offset
    # aggregation and the store read the same partition layout.
    marked = (
        distinct.repartitionByRange("ptype", "ratios")
        .sortWithinPartitions("ptype", "ratios")
        .select(
            "ptype",
            "ratios",
            F.spark_partition_id().alias("__pid"),
            F.monotonically_increasing_id().alias("__mid"),
        )
        .localCheckpoint(eager=False)
    )
    from pyspark.sql import Window

    # one row per shuffle partition — the running-sum window is
    # bounded by the partition count, not the data
    off_w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        marked.groupBy("__pid")
        .agg(F.count("*").alias("__n"))
        .select("__pid", F.coalesce(F.sum("__n").over(off_w), F.lit(0)).alias("__off"))
    )
    store = marked.join(F.broadcast(offsets), "__pid").select(
        (
            F.col("__off")
            + F.col("__mid")
            - F.shiftleft(F.col("__pid").cast("long"), 33)
        )
        .cast("int")
        .alias("profile_id"),
        "ptype",
        "ratios",
    )
    # The store is the deduped dictionary — small by construction —
    # and feeds the index join plus every downstream consumer:
    # materialize it once.
    store = store.localCheckpoint(eager=False)
    index = profiles.join(store, ["ptype", "ratios"], "left").select(
        *key_cols, "ptype", "profile_id"
    )
    return store.select("profile_id", "ptype", "ratios"), index


def country_to_cells(
    country_index: DataFrame,
    tprofiles: DataFrame,
    cell_country: DataFrame,
) -> DataFrame:
    """Country-keyed profiles → cell-keyed by blending with per-cell
    country fractions: ratio_cell = Σ_country frac·ratio — the reference's
    fraction method (country_to_cells,
    emiproc/profiles/operators.py:414-568, esp. 517-537).

    ``country_index``: (country, [other dims…], profile_id).
    ``cell_country``: (cell_id, country, fraction).
    Returns (cell_id, [other dims…], ptype, ratios).
    """
    other_dims = [
        c for c in country_index.columns if c not in ("country", "profile_id")
    ]
    weighted = cell_country.withColumnRenamed("fraction", "weight").join(
        F.broadcast(country_index), "country", "inner"
    )
    return combine_profiles(weighted, tprofiles, ["cell_id", *other_dims])


def country_to_cells_majority(
    country_index: DataFrame,
    cell_country: DataFrame,
) -> DataFrame:
    """Majority method: re-key each cell to its largest-fraction country
    (reference operators.py:539-566) — a max_by + plain join."""
    main = cell_country.groupBy("cell_id").agg(
        F.max_by("country", "fraction").alias("country")
    )
    return main.join(F.broadcast(country_index), "country", "inner").drop("country")


def remap_profiles(
    cell_index: DataFrame,
    tprofiles: DataFrame,
    weights: DataFrame,
    emissions_by_cell: DataFrame | None = None,
) -> DataFrame:
    """Carry cell-dim profiles through a regrid: each dst cell's profile
    is the (emission × remap-weight)-weighted combination of its donor
    cells (reference remap_profiles, emiproc/profiles/operators.py:571-666,
    weighting at 653-659).

    ``cell_index``: (cell_id, [dims…], profile_id);
    ``weights``: (src_id, dst_id, weight);
    ``emissions_by_cell``: optional (cell_id, mass) emission weighting.
    """
    w = weights
    if emissions_by_cell is not None:
        w = w.join(emissions_by_cell, w["src_id"] == emissions_by_cell["cell_id"], "left").select(
            "src_id",
            "dst_id",
            (F.col("weight") * F.coalesce(F.col("mass"), F.lit(0.0))).alias("weight"),
        )
    joined = (
        cell_index.join(w, cell_index["cell_id"] == w["src_id"], "inner")
        .drop("cell_id", "src_id")
        .withColumnRenamed("dst_id", "cell_id")
    )
    other_dims = [c for c in cell_index.columns if c not in ("cell_id", "profile_id")]
    return combine_profiles(joined, tprofiles, ["cell_id", *other_dims])


def add_constant_profile_to_missing_cells(
    index: DataFrame, grid: DataFrame
) -> DataFrame:
    """Pad the index with −1 rows for cells that have no profile
    (reference add_constant_profile_to_missing_cells,
    emiproc/profiles/operators.py:746-797)."""
    other = [c for c in index.columns if c not in ("cell_id",)]
    return (
        grid.select("cell_id")
        .join(index, "cell_id", "left")
        .select(
            "cell_id",
            *[
                F.coalesce(F.col(c), F.lit(-1)).alias(c) if c == "profile_id" else F.col(c)
                for c in other
            ],
        )
    )


def merge_indexes(indexes: list[DataFrame], key: DataFrame) -> DataFrame:
    """Specificity-ordered overlay of sparse index tables: later (more
    specific) indexes override earlier ones for the keys they cover
    (reference merge_indexes, emiproc/profiles/utils.py:271-339) —
    a priority-ordered coalesce of left joins against the full key set.

    Wildcards are expressed by OMITTING the column from an index (one
    DataFrame per specificity level) — a NULL dim value would never
    match any key (null ≠ null in equi-joins) and is rejected loudly.
    """
    result = key
    pid_cols = []
    for i, idx in enumerate(indexes):
        dims = [c for c in idx.columns if c != "profile_id"]
        renamed = idx.withColumnRenamed("profile_id", f"__pid_{i}")
        if dims:
            # a null dim row would be SILENTLY unmatched by the equi-join
            # — the wildcard convention here is column omission, so such
            # a row is a caller bug.  The guard wraps the JOIN KEY (not a
            # payload column): the optimizer inserts a null-key filter on
            # the build side, which evaluates this expression and raises
            # before the row could be silently dropped.
            cond = F.col(dims[0]).isNull()
            for c in dims[1:]:
                cond = cond | F.col(c).isNull()
            renamed = renamed.withColumn(
                dims[0],
                F.when(
                    cond,
                    F.raise_error(
                        F.lit(
                            f"merge_indexes: index {i} has NULL values in "
                            f"dims {dims} — express wildcards by omitting "
                            "the column (one index per specificity level)"
                        )
                    ).cast(dict(renamed.dtypes)[dims[0]]),
                ).otherwise(F.col(dims[0])),
            )
        result = result.join(F.broadcast(renamed), dims, "left")
        pid_cols.append(f"__pid_{i}")
    # later indexes first in the coalesce = higher priority
    result = result.withColumn(
        "profile_id", F.coalesce(*[F.col(c) for c in reversed(pid_cols)], F.lit(-1))
    )
    return result.drop(*pid_cols)
