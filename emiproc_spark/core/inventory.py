"""The Inventory: a bundle of lazy DataFrames + lineage.

Mirrors the reference's central ``Inventory`` object
(``emiproc/inventories/__init__.py:75-148``) but every member is a *lazy*
Spark DataFrame — operators compose logical plans; nothing executes until
an action (export, collect, totals check).  The reference's eager
copy-on-write (``__init__.py:255-290``) becomes free: DataFrames are
immutable values.

``history`` mirrors the reference's operation lineage list
(``__init__.py:118,142,148``).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Inventory:
    """Long-form emission inventory.

    emissions : (cell_id, category, substance, value_kg_y) — gridded part
    grid      : (cell_id, geometry, area_m2, lon, lat, xmin..ymax) or None
    shaped    : SHAPED-schema point/line/polygon sources or None
    tprofiles / tprofile_index : temporal profile store + sparse index
    vprofiles / vprofile_index : vertical profile store + sparse index
    year      : reference year (drives leap-year logic)
    history   : operation lineage (reference __init__.py:118)
    """

    emissions: DataFrame
    grid: Optional[DataFrame] = None
    shaped: Optional[DataFrame] = None
    tprofiles: Optional[DataFrame] = None
    tprofile_index: Optional[DataFrame] = None
    vprofiles: Optional[DataFrame] = None
    vprofile_index: Optional[DataFrame] = None
    year: Optional[int] = None
    history: tuple[str, ...] = field(default_factory=tuple)

    def with_step(self, step: str, **changes) -> "Inventory":
        """Return a new Inventory with ``step`` appended to history."""
        return replace(self, history=self.history + (step,), **changes)

    # -- derived metadata (computed, not declared — reference
    #    emiproc/inventories/__init__.py:214-242) ------------------------
    def categories(self) -> list[str]:
        rows = self.emissions.select("category").distinct().collect()
        cats = {r[0] for r in rows}
        if self.shaped is not None:
            cats |= {r[0] for r in self.shaped.select("category").distinct().collect()}
        return sorted(cats)

    def substances(self) -> list[str]:
        rows = self.emissions.select("substance").distinct().collect()
        subs = {r[0] for r in rows}
        if self.shaped is not None:
            subs |= {r[0] for r in self.shaped.select("substance").distinct().collect()}
        return sorted(subs)
