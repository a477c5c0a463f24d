"""operators/quality: declarative expectations + referential audits."""

import pytest
from pyspark.sql import functions as F

from emiproc_spark.operators.quality import fk_orphans, validate_expectations


def test_expectations_all_kinds(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", -1.0), (2, None, 50.0), (4, "zz", None)],
        "k long, s string, v double",
    )
    rules = [
        ("k", "not_null", {}),
        ("k", "unique", {}),
        ("s", "not_null", {}),
        ("v", "range", {"lo": 0.0, "hi": 10.0}),
        ("s", "regex", {"pattern": "^[a-b]$"}),
        ("s", "in_set", {"values": ["a", "b"]}),
    ]
    out = {
        (r["column"], r["kind"]): (r["n_rows"], r["n_violations"], r["pass"])
        for r in validate_expectations(df, rules).collect()
    }
    assert out[("k", "not_null")] == (4, 0, True)
    assert out[("k", "unique")] == (4, 1, False)  # duplicate 2
    assert out[("s", "not_null")] == (4, 1, False)
    # -1 below lo, 50 above hi; NULL v not a violation
    assert out[("v", "range")] == (4, 2, False)
    assert out[("s", "regex")] == (4, 1, False)  # 'zz'
    assert out[("s", "in_set")] == (4, 1, False)  # 'zz'

    with pytest.raises(ValueError, match="no rules"):
        validate_expectations(df, [])
    with pytest.raises(ValueError, match="no such column"):
        validate_expectations(df, [("nope", "not_null", {})])
    with pytest.raises(ValueError, match="unknown rule kind"):
        validate_expectations(df, [("k", "positive", {})])
    with pytest.raises(ValueError, match="lo and/or hi"):
        validate_expectations(df, [("k", "range", {})])


def test_fk_orphans_counts_nulls_as_orphans(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (99,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = fk_orphans(child, parent, "fk", "pk", "c.p").collect()[0]
    assert (row["relation"], row["n_child"], row["n_orphans"], row["pass"]) == (
        "c.p", 4, 2, False
    )


def test_expectations_single_aggregate_plan(spark):
    # every rule must ride one aggregation job — no per-rule scans
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    out = validate_expectations(
        df, [("k", "not_null", {}), ("s", "not_null", {}), ("k", "unique", {})]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("Scan parquet") == 1


def test_ratio_sum_gate_detects_broken_group(spark):
    from emiproc_spark.operators.quality import ratio_sum_gate

    rows = [("a", 0.25)] * 4 + [("b", 0.5), ("b", 0.4)]
    df = spark.createDataFrame(rows, "grp string, ratio double")
    got = ratio_sum_gate(df, ["grp"], "ratio").collect()[0]
    assert got["relation"] == "ratio_sum_1"
    assert got["n_groups"] == 2
    assert got["n_violations"] == 1
    assert got["pass"] is False


def test_mass_conservation_gate_and_enforce(spark):
    from emiproc_spark.operators.quality import (
        enforce_gates,
        mass_conservation_gate,
    )

    before = spark.createDataFrame(
        [("F", 10.0), ("F", 5.0), ("O", 3.0)], "substance string, value_kg_y double"
    )
    same = spark.createDataFrame(
        [("F", 15.0), ("O", 1.0), ("O", 2.0)], "substance string, value_kg_y double"
    )
    ok = mass_conservation_gate(before, same).collect()[0]
    assert ok["pass"] is True and ok["n_groups"] == 2
    enforce_gates(mass_conservation_gate(before, same))  # must not raise

    # missing group on one side counts as 0 -> violation
    lost = spark.createDataFrame(
        [("F", 15.0)], "substance string, value_kg_y double"
    )
    bad = mass_conservation_gate(before, lost).collect()[0]
    assert bad["pass"] is False and bad["n_violations"] == 1
    with pytest.raises(ValueError, match="gates failed"):
        enforce_gates(mass_conservation_gate(before, lost), context="t")


def test_curate_corpus_emits_passing_gates(spark):
    from emiproc_spark import pipelines
    from emiproc_spark.operators.quality import enforce_gates

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 29}" for j in range(25)))
         for i in range(40)],
        "doc_id long, text string",
    )
    stages = pipelines.curate_corpus(docs, None, min_tokens=20, ctx_len=None)
    gates = stages["gates"].collect()
    assert {(r["column"], r["kind"]) for r in gates} == {
        ("doc_id", "not_null"), ("doc_id", "unique"),
        ("text", "not_null"), ("n_tokens", "range"),
    }
    enforce_gates(stages["gates"], context="curate_corpus")
