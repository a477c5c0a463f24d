"""local_rows_df must be value- and schema-identical to createDataFrame
and only take the Arrow path when that is provable."""

from __future__ import annotations

import datetime
import math

import pytest

from emiproc_spark.localdf import local_rows_df


def _canon(df):
    def key(row):
        return repr(
            tuple(
                "NaN" if isinstance(v, float) and math.isnan(v) else v
                for v in row
            )
        )

    return sorted(map(key, df.collect()))


def _assert_same(spark, rows, schema):
    a = spark.createDataFrame(rows, schema=schema)
    b = local_rows_df(spark, rows, schema)
    assert a.schema == b.schema
    assert _canon(a) == _canon(b)
    return b


def test_mixed_types_match(spark):
    rows = [
        (1, 2.5, True, b"xy", "s", [1.0, 2.0]),
        (None, None, None, None, None, None),
        (0, -0.0, False, b"", "", []),
    ]
    schema = (
        "i int, d double, b boolean, bin binary, s string, xs array<double>"
    )
    df = _assert_same(spark, rows, schema)
    # the point of the helper: a local (non-RDD) relation
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" in plan


def test_none_in_array_and_unicode(spark):
    rows = [("é–ü", [0.5, None, 2.0]), (None, None)]
    _assert_same(spark, rows, "s string, xs array<double>")


def test_empty_rows(spark):
    _assert_same(spark, [], "a int, b string")


def test_nan_falls_back_and_matches(spark):
    rows = [(float("nan"),), (1.0,)]
    df = _assert_same(spark, rows, "x double")
    vals = [r["x"] for r in df.orderBy("x").collect()]
    assert math.isnan(vals[-1])  # NaN preserved, not nulled
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" not in plan


def test_date_falls_back_and_matches(spark):
    rows = [(datetime.date(2020, 2, 29),)]
    _assert_same(spark, rows, "d date")


def test_int_for_double_rejected_like_original(spark):
    # the classic verifier rejects int where double is declared; the
    # Arrow path must not silently widen that contract
    with pytest.raises(Exception):
        spark.createDataFrame([(0, 1)], schema="a double, b int")
    with pytest.raises(Exception):
        local_rows_df(spark, [(0, 1)], "a double, b int")


def test_struct_type_schema_object(spark):
    from emiproc_spark.core.schemas import SPECIATION

    rows = [(None, "C0", None, None, "F", "F1", 0.7)]
    _assert_same(spark, rows, SPECIATION)


def test_bad_width_raises_like_original(spark):
    with pytest.raises(Exception):
        local_rows_df(spark, [(1,)], "a int, b int").collect()
