"""emiproc_spark — a PySpark-native emission-inventory analytics engine.

A from-scratch re-expression of the operator semantics of the reference
emission-processing library (C2SM-RCM/emiproc, BSD-3) as idiomatic Spark
DataFrame transformations.  The core relation is the *long form*

    emissions(cell_id BIGINT, category STRING, substance STRING,
              value_kg_y DOUBLE)

plus dimension tables ``grid`` (cell geometry + area), ``shaped``
(point/line/polygon sources), profile stores and index tables
(see ``emiproc_spark.core.schemas``).

Design commitments (SURVEY.md §7.1):

- every operator is a pure ``DataFrame -> DataFrame`` (or
  ``Inventory -> Inventory``) function — lazy, Catalyst-optimizable;
- geometry travels as WKB binary, processed by a pure-numpy kernel inside
  Arrow pandas UDFs (no geo-library dependency);
- missing profile  =>  scaling factor 1.0, weight 0.0 — implemented once
  as coalesce helpers;
- canonical unit is kg/year/cell, converted at the edges.
"""

__version__ = "0.1.0"

from emiproc_spark.core.inventory import Inventory  # noqa: F401
from emiproc_spark.session import get_spark  # noqa: F401
