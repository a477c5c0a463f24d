"""Heavy hitters: exact top-k frequent values of a column at corpus
scale, found sketch-first.

The straightforward ``groupBy(col).count()`` shuffles one row per
DISTINCT value — at 100 TB a high-cardinality column (URLs, shingles,
user ids) makes that shuffle the bottleneck even though only the top
few matter.  This module uses the classic two-phase shape (the same
sketch-then-confirm pattern as ``packing.decontaminate_bloom``):

1. **Sketch**: per-partition Misra–Gries summaries of bounded size
   (``capacity`` counters each) via ``mapInPandas`` — one pass, no
   shuffle, memory O(capacity).  MG guarantees every value with true
   frequency > n_partition/capacity survives its partition's summary,
   so any GLOBAL heavy hitter survives in at least one partition.
2. **Confirm**: the union of candidates (≤ partitions × capacity rows,
   dimension-sized) is broadcast back over the corpus and counted
   EXACTLY with one filtered aggregation — the shuffle now carries only
   candidate values.

Result: exact counts for the true top-k, provided k-th frequency
exceeds rows/capacity per partition (the MG admission bound — raise
``capacity`` for flatter distributions; the returned counts are exact
either way, only *completeness* of the tail depends on it).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _misra_gries(values: pd.Series, capacity: int) -> dict:
    counters: dict = {}
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < capacity:
            counters[v] = 1
        else:
            dead = [k for k in counters if counters[k] == 1]
            for k in counters:
                counters[k] -= 1
            for k in dead:
                del counters[k]
    return counters


def _mg_shrink(counters: dict, capacity: int) -> None:
    """Shrink a merged summary back to ≤ ``capacity`` counters in place
    (standard Misra-Gries merge): subtract the (capacity+1)-th largest
    count from every counter and drop the non-positive ones.  Remains a
    valid MG summary — each surviving undercount grows by at most the
    subtracted amount, and any value with true frequency above the
    admission bound still survives."""
    if len(counters) <= capacity:
        return
    cut = sorted(counters.values(), reverse=True)[capacity]
    for x in list(counters):
        counters[x] -= cut
        if counters[x] <= 0:
            del counters[x]


def heavy_hitters(
    df: DataFrame, col: str, k: int = 10, capacity: int = 1024
) -> DataFrame:
    """Exact counts of the ~top-``k`` most frequent non-null values of
    ``col`` (ties broken by value for determinism).  See the module
    docstring for the sketch-then-confirm shape and the completeness
    bound."""
    if k < 1 or capacity < k:
        raise ValueError(
            f"heavy_hitters: need 1 <= k <= capacity, got k={k}, capacity={capacity}"
        )
    src = df.select(F.col(col).alias("__v")).where(F.col("__v").isNotNull())

    def sketch(batches):
        counters: dict = {}
        for pdf in batches:
            for v, c in _misra_gries(pdf["__v"], capacity).items():
                counters[v] = counters.get(v, 0) + c
            # merging per-batch summaries can exceed capacity; the MG
            # merge shrink keeps it a valid summary of the partition
            _mg_shrink(counters, capacity)
        yield pd.DataFrame({"__v": list(counters.keys())})

    cand = src.mapInPandas(sketch, schema=src.schema).distinct()
    exact = (
        src.join(F.broadcast(cand), "__v", "semi")
        .groupBy("__v")
        .agg(F.count("*").alias("n"))
    )
    return (
        exact.orderBy(F.col("n").desc(), F.col("__v"))
        .limit(k)
        .select(F.col("__v").alias(col), "n")
    )
