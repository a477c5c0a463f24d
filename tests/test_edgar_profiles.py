"""EDGAR auxiliary temporal profiles (reference
emiproc/inventories/edgar/temporal.py:27-259)."""

import math

import pytest

from emiproc_spark.sources.edgar_profiles import (
    HOWPM_SIZE,
    WEEKLY_SIZE,
    edgar_auxiliary_profiles,
    read_edgar_hourly,
    read_edgar_weekly,
)


def _write_aux(tmp_path, countries=("AAA", "SEA"), categories=("ENE", "IND")):
    """Reference-format fixture: AAA uses weekend type 0 (Sat/Sun
    weekend), SEA type 2 (Fri/Sat weekend); hourly value depends only
    on (daytype, hour) so expected positions are closed-form."""
    weekend_type = {"AAA": 0, "SEA": 2, "SDN": 0}
    daytypes = {
        0: [1, 1, 1, 1, 1, 2, 3],
        2: [1, 1, 1, 1, 2, 3, 3],
    }
    with open(tmp_path / "weekly_profiles.csv", "w") as f:
        f.write("Country_code_A3,activity_code,Weekday_id,daily_factor\n")
        for c in countries:
            for cat in categories:
                for w in range(1, 8):
                    factor = w if cat == "ENE" else 1
                    f.write(f"{c},{cat},{w},{factor}\n")
    with open(tmp_path / "hourly_profiles.csv", "w") as f:
        f.write(
            "Country_code_A3,activity_code,month_id,Daytype_id,"
            + ",".join(f"h{i}" for i in range(1, 25))
            + "\n"
        )
        for c in countries:
            for cat in categories:
                for m in range(1, 13):
                    for d in (1, 2, 3):
                        vals = ",".join(str(d * 48 + h) for h in range(1, 25))
                        f.write(f"{c},{cat},{m},{d},{vals}\n")
    with open(tmp_path / "weekenddays.csv", "w") as f:
        f.write("Weekend_type_id;Country_code_A3\n")
        for c in countries:
            f.write(f"{weekend_type[c]};{c}\n")
    with open(tmp_path / "weekdays.csv", "w") as f:
        f.write("Weekend_type_id;weekday_name;Weekday_id;Daytype_id\n")
        for wt, dts in daytypes.items():
            for w, d in enumerate(dts, start=1):
                f.write(f"{wt};day{w};{w};{d}\n")
    return daytypes, weekend_type


def test_weekly_normalized(spark, tmp_path):
    _write_aux(tmp_path)
    weekly = read_edgar_weekly(spark, str(tmp_path / "weekly_profiles.csv"))
    rows = {(r["country"], r["category"]): r["wratios"] for r in weekly.collect()}
    assert len(rows) == 4
    ene = rows[("AAA", "ENE")]
    assert len(ene) == WEEKLY_SIZE
    assert ene == pytest.approx([w / 28 for w in range(1, 8)])
    assert rows[("SEA", "IND")] == pytest.approx([1 / 7] * 7)


def test_hourly_positions_follow_country_weekend_type(spark, tmp_path):
    daytypes, weekend_type = _write_aux(tmp_path)
    hourly = read_edgar_hourly(spark, str(tmp_path))
    rows = {(r["country"], r["category"]): r["hratios"] for r in hourly.collect()}
    for (c, cat), arr in rows.items():
        assert len(arr) == HOWPM_SIZE
        assert math.isclose(sum(arr), 1.0, rel_tol=1e-9)
        dts = daytypes[weekend_type[c]]
        raw = [
            dts[(pos % 168) // 24] * 48 + pos % 24 + 1 for pos in range(HOWPM_SIZE)
        ]
        total = sum(raw)
        assert arr == pytest.approx([v / total for v in raw])
    # Friday (weekday 5) differs between weekend conventions:
    # position of month 1, weekday 5, hour 1 is 4*24 = 96.
    assert rows[("AAA", "ENE")][96] != rows[("SEA", "ENE")][96]


def test_composite_store_index_and_fixups(spark, tmp_path):
    _write_aux(tmp_path)
    store, index = edgar_auxiliary_profiles(
        spark,
        str(tmp_path),
        inv_categories=["ENE", "INDZZZ"],
        country_aliases={"BBB": "AAA"},
    )
    idx = {(r["country"], r["category"]): r["profile_id"] for r in index.collect()}
    # SEA renamed, BBB aliased from AAA, prefix fallback INDZZZ -> IND.
    assert set(idx) == {
        (c, cat) for c in ("AAA", "-99", "BBB") for cat in ("ENE", "INDZZZ")
    }
    assert idx[("BBB", "ENE")] == idx[("AAA", "ENE")]
    # Weekend conventions differ, so AAA and -99 must not share profiles.
    assert idx[("-99", "ENE")] != idx[("AAA", "ENE")]
    srows = store.collect()
    by_id: dict[int, dict[str, list[float]]] = {}
    for r in srows:
        by_id.setdefault(r["profile_id"], {})[r["ptype"]] = r["ratios"]
    for pid, parts in by_id.items():
        assert set(parts) == {"weekly", "hour_of_week_per_month"}
        assert len(parts["weekly"]) == WEEKLY_SIZE
        assert len(parts["hour_of_week_per_month"]) == HOWPM_SIZE
    assert by_id[idx[("AAA", "ENE")]]["weekly"] == pytest.approx(
        [w / 28 for w in range(1, 8)]
    )


def test_uniform_fill_for_one_sided_combo(spark, tmp_path):
    _write_aux(tmp_path)
    # Add a weekly-only combo: no hourly rows for (AAA, EXT).
    with open(tmp_path / "weekly_profiles.csv", "a") as f:
        for w in range(1, 8):
            f.write(f"AAA,EXT,{w},1\n")
    store, index = edgar_auxiliary_profiles(spark, str(tmp_path))
    pid = {
        (r["country"], r["category"]): r["profile_id"] for r in index.collect()
    }[("AAA", "EXT")]
    parts = {r["ptype"]: r["ratios"] for r in store.collect() if r["profile_id"] == pid}
    assert parts["hour_of_week_per_month"] == pytest.approx([1 / HOWPM_SIZE] * HOWPM_SIZE)
    assert parts["weekly"] == pytest.approx([1 / 7] * 7)


def test_unknown_category_prefix_raises(spark, tmp_path):
    _write_aux(tmp_path)
    # lazy guard: the unresolvable category raises at execution time
    _, index = edgar_auxiliary_profiles(spark, str(tmp_path), inv_categories=["XYZqqq"])
    with pytest.raises(Exception, match="XYZ"):
        index.collect()


def test_incomplete_weekly_raises(spark, tmp_path):
    _write_aux(tmp_path)
    with open(tmp_path / "weekly_profiles.csv", "a") as f:
        f.write("CCC,ENE,1,1.0\n")  # only one weekday
    weekly = read_edgar_weekly(spark, str(tmp_path / "weekly_profiles.csv"))
    with pytest.raises(Exception, match="incomplete"):
        weekly.collect()
