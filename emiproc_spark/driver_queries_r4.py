"""Round-4 driver queries: new oracle-checked entries added this round.

Kept in a separate module so the registry rotation in
``driver_queries.py`` can place them (plus this round's re-verify set)
at the very front of the 50-query sample the driver takes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES_R4: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES_R4: dict[str, str] = {}
