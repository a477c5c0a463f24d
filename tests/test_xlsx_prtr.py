"""Stdlib XLSX codec + Swiss PRTR point-source decode."""

import pytest

from emiproc_spark.functions.xlsx import read_xlsx, write_xlsx
from emiproc_spark.sources.swiss import read_prtr


def test_xlsx_roundtrip(tmp_path):
    p = str(tmp_path / "t.xlsx")
    write_xlsx(p, [["a", "b", "c"], [1.5, "x", None], [2.0, "y", 7]])
    df = read_xlsx(p, header_row=0)
    assert list(df.columns) == ["a", "b", "c"]
    assert df["a"].tolist() == [1.5, 2.0]
    assert df["b"].tolist() == ["x", "y"]
    import pandas as pd

    assert pd.isna(df["c"].iloc[0]) and df["c"].iloc[1] == 7.0


PRTR_HEADER = [
    "Year", "Source type", "North coordinate (CH1903+)",
    "East coordinate (CH1903+)", "Facility", "Value", "Unit",
    "Pollutant_name", "Installation_main activity",
]


def _prtr_rows():
    return [
        ["junk0"], ["junk1"],
        PRTR_HEADER,
        ["junk3"],
        [2020, "Punktquelle", 1201000.0, 2601000.0, "PlantA", 2.5, "t/a",
         "Kohlendioxid (CO2)", "1.c"],
        [2020, "Punktquelle", 1201000.0, 2601000.0, "PlantA", 500.0, "kg/a",
         "Stickstoffoxide (NOx/NO2)", "1.c"],
        # same location, second CO2 report → sums
        [2020, "Punktquelle", 1201000.0, 2601000.0, "PlantA2", 0.5, "t/a",
         "Kohlendioxid (CO2)", "1.c"],
        # cement plant → eipzm
        [2020, "Punktquelle", 1202000.0, 2602000.0, "Cement", 1.0, "t/a",
         "Kohlendioxid (CO2)", "3.c.1"],
        # diffuse source filtered out
        [2020, "Diffus", 1203000.0, 2603000.0, "Diffuse", 9.0, "t/a",
         "Kohlendioxid (CO2)", "1.c"],
        # other year filtered out
        [2019, "Punktquelle", 1204000.0, 2604000.0, "Old", 9.0, "t/a",
         "Kohlendioxid (CO2)", "1.c"],
        # unknown pollutant silently skipped (reference isin filter)
        [2020, "Punktquelle", 1205000.0, 2605000.0, "P", 9.0, "t/a",
         "Halone", "1.c"],
    ]


def test_read_prtr(spark, tmp_path):
    p = str(tmp_path / "prtr.xlsx")
    write_xlsx(p, _prtr_rows())
    out = read_prtr(spark, p, year=2020).toPandas()
    got = out.set_index(["category", "substance", "x"])["value_kg_y"]
    assert got[("eipro", "CO2", 2601000.0)] == pytest.approx(3000.0)  # 2.5t + 0.5t
    assert got[("eipro", "NOx", 2601000.0)] == pytest.approx(500.0)
    assert got[("eipzm", "CO2", 2602000.0)] == pytest.approx(1000.0)
    assert len(out) == 3

    sub = read_prtr(spark, p, year=2020, substances=["NOx"]).toPandas()
    assert set(sub["substance"]) == {"NOx"}

    with pytest.raises(ValueError, match="Year 2021"):
        read_prtr(spark, p, year=2021)
    with pytest.raises(ValueError, match="Unkown substance"):
        read_prtr(spark, p, year=2020, substances=["XYZ"])


def test_read_prtr_bad_unit(spark, tmp_path):
    rows = _prtr_rows()[:5]
    rows[4] = [2020, "Punktquelle", 1.0, 2.0, "x", 1.0, "mg/a",
               "Kohlendioxid (CO2)", "1.c"]
    p = str(tmp_path / "bad.xlsx")
    write_xlsx(p, rows)
    with pytest.raises(ValueError, match="Units not corrected"):
        read_prtr(spark, p, year=2020)


def test_read_prtr_unknown_activity(spark, tmp_path):
    rows = _prtr_rows()[:5]
    rows[4] = [2020, "Punktquelle", 1.0, 2.0, "x", 1.0, "t/a",
               "Kohlendioxid (CO2)", "7.z"]
    p = str(tmp_path / "act.xlsx")
    write_xlsx(p, rows)
    with pytest.raises(ValueError, match="Missing categories"):
        read_prtr(spark, p, year=2020)
