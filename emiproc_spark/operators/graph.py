"""Iterative graph algorithms: PageRank.

Complements the pointer-jumping connected components in
``operators/cluster.py`` with the other canonical iterative graph
kernel.  Each iteration is one co-keyed join + one hash aggregate —
the Pregel-style message pass expressed relationally; per-edge
contributions quantize to exact int64 before the sum so iteration
results are addition-order-free and engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# per-edge contribution quantum: ranks live in (0, 1], 1e12 keeps ~12
# significant digits through every iteration's exact integer sum
PR_SCALE = 1e12


def pagerank(
    edges: DataFrame,
    iterations: int = 4,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int | None = 8,
) -> DataFrame:
    """PageRank over a directed edge list (duplicate edges collapse to
    one — this is the unweighted formulation).

    pr₀ = 1/N;  prₜ₊₁(v) = (1−d)/N + d · Σ_{u→v} prₜ(u)/outdeg(u)

    Dangling nodes (no out-edges) distribute nothing — their mass
    leaks, so ranks sum to < 1 when danglings exist (the common
    simplification; redistribute-to-all needs one extra scalar
    aggregate per iteration).  Nodes with no in-edges settle at
    (1−d)/N.  N is the number of distinct endpoint nodes (one COUNT
    job — a single driver scalar, never the node table itself).

    Scale shape: every iteration is edges ⋈ outdeg ⋈ pr on the src key
    followed by a hash aggregate on dst — two exchanges per iteration,
    no driver-side data.  The plan doubles per iteration, so every
    ``checkpoint_every`` iterations the rank frame is
    ``localCheckpoint``-ed to truncate lineage (opt out with None).

    Returns (node, pagerank) for every endpoint node.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    dtypes = dict(edges.dtypes)
    for c in (src_col, dst_col):
        if c not in dtypes:
            raise ValueError(
                f"pagerank: no column {c!r} in edges (have {list(dtypes)})"
            )

    def _endpoint(c: str) -> F.Column:
        # a NULL endpoint is not a node: its edge would silently
        # contribute nothing on the src equi-joins while fabricating a
        # phantom NULL row in the output — raise loudly instead (the
        # connected_components NULL-id contract)
        return F.when(
            F.col(c).isNull(),
            F.raise_error(F.lit(f"pagerank: NULL {c} endpoint")).cast(
                dtypes[c]
            ),
        ).otherwise(F.col(c))

    e = edges.select(
        _endpoint(src_col).alias("src"), _endpoint(dst_col).alias("dst")
    ).distinct()
    e = e.localCheckpoint(eager=False)  # every iteration re-reads it
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty edge list")
    outdeg = e.groupBy("src").agg(F.count("*").alias("__od"))
    base = (1.0 - damping) / n
    pr = nodes.withColumn("pr", F.lit(1.0 / n))
    for i in range(iterations):
        contrib = (
            e.join(outdeg, "src")
            .join(pr.select(F.col("node").alias("src"), "pr"), "src")
            .select(
                F.col("dst").alias("node"),
                F.floor((F.col("pr") / F.col("__od")) * F.lit(PR_SCALE) + F.lit(0.5))
                .cast("long")
                .alias("__c"),
            )
        )
        sums = contrib.groupBy("node").agg(
            (F.sum("__c").cast("double") / F.lit(PR_SCALE)).alias("__s")
        )
        pr = nodes.join(sums, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("__s"), F.lit(0.0))
            ).alias("pr"),
        )
        if checkpoint_every is not None and (i + 1) % checkpoint_every == 0:
            pr = pr.localCheckpoint(eager=False)
    return pr.select("node", F.col("pr").alias("pagerank"))
