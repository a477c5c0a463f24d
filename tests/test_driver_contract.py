"""The local mirror of the driver's t1/t2 gates: entry() smoke +
query/oracle parity on sf0.001 (fast; sf0.01 runs in CI/driver)."""

import pytest

import __spark_entry__ as entrymod
from emiproc_spark.parity import compare


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"cell_id", "category", "substance", "value_kg_y"}


def test_queries_have_oracles():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert q, "no queries declared"
    missing = set(o) - set(q)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", list(entrymod.queries()))
def test_query_matches_oracle(spark, sf_dir, name):
    q = entrymod.queries()[name]
    o = entrymod.oracle_sql().get(name)
    if o is None:
        df = q(spark, sf_dir)
        assert df.count() >= 0  # rows-only check, like the driver
        return
    r = compare(spark, sf_dir, name, q, o)
    assert r["cols_match"], r
    assert r["rows_match"], r
    assert r["values_match"], r
    # a 0-row match passes while checking nothing — every query is
    # designed to produce rows even at sf0.001 (doc_sample/data_mix once
    # silently matched empty for a full round; see driver_queries_curate)
    assert r["spark_rows"] > 0, f"{name}: trivially-empty oracle match"


def test_rotation_front_and_evidence_refill():
    """The driver samples the registry's FRONT 50: every round-changed
    query (the _REVERIFY list) and every new-round query must lead, and
    the refill behind them must be ordered OLDEST EVIDENCE FIRST per
    the committed CORRECTNESS ledger (r7 judge item 8)."""
    from emiproc_spark import driver_queries as dq

    names = list(entrymod.queries())
    # round 10: the front is the one new query (stream_neardup_resume)
    # plus the changed-query re-verify set, keeping ~43 refill slots
    # for the r3/r4 evidence cohort (r9 judge item 1)
    front_expect = [k for k in dq._REVERIFY if k in set(names)]
    assert names[: len(front_expect)] == front_expect
    # refill is sorted by (last green round asc, name): recompute from
    # the same ledger the registry build used
    refill = names[len(front_expect):]
    assert refill == dq._evidence_order(refill)
    # every oracle key rides the same ordering
    assert list(entrymod.oracle_sql()) == [
        k for k in names if k in entrymod.oracle_sql()
    ]
