import json

import pytest
from pyspark.sql import functions as F

from emiproc_spark.functions.geometry import parse_wkb
from emiproc_spark.exports.writers import export_text_formatted
from emiproc_spark.sources.osm import osm_json_to_sources
from emiproc_spark.sources.profiles_io import (
    detect_profile_type,
    read_temporal_profiles_csv,
)
from emiproc_spark.sources.readers import from_csv_emissions, from_duckdb


def test_detect_profile_type():
    assert detect_profile_type([str(h) for h in range(24)]) == "daily"
    assert detect_profile_type(["mon", "tue", "wed", "thu", "fri", "sat", "sun"]) == "weekly"
    assert detect_profile_type(["jan", "feb", "mar", "apr", "may", "jun", "jul", "aug", "sep", "oct", "nov", "dec"]) == "monthly"
    with pytest.raises(ValueError):
        detect_profile_type(["x", "y"])


def test_read_temporal_profiles_csv(spark, tmp_path):
    p = tmp_path / "prof.csv"
    header = "category," + ",".join("mon tue wed thu fri sat sun".split())
    p.write_text(header + "\nheat,2,2,2,2,2,1,1\ntraffic,1,1,1,1,1,1,1\n")
    store, index = read_temporal_profiles_csv(spark, str(p), ["category"])
    assert store.count() == 2
    rows = {r["category"]: r["profile_id"] for r in index.collect()}
    assert rows["heat"] != rows["traffic"]
    heat = store.join(index.where(F.col("category") == "heat"), "profile_id").collect()[0]
    assert heat["ratios"][0] == pytest.approx(2 / 12)
    assert sum(heat["ratios"]) == pytest.approx(1.0)


def test_from_duckdb(spark, tmp_path):
    import duckdb

    db = str(tmp_path / "inv.duckdb")
    con = duckdb.connect(db)
    con.execute(
        "CREATE TABLE emi AS SELECT * FROM (VALUES "
        "(0, 'traffic', 1.5, 0.2), (1, 'traffic', 2.5, NULL)) "
        "t(cell_id, category, emission_CO2, emission_NOx)"
    )
    con.close()
    df = from_duckdb(spark, db, "emi")
    rows = {(r["cell_id"], r["substance"]): r["value_kg_y"] for r in df.collect()}
    assert rows[(0, "CO2")] == 1.5 and rows[(0, "NOx")] == pytest.approx(0.2)
    assert (1, "NOx") not in rows  # nulls dropped


def test_from_csv(spark, tmp_path):
    p = tmp_path / "e.csv"
    p.write_text("cell_id,category,substance,value_kg_y\n0,a,CO2,1.25\n")
    df = from_csv_emissions(spark, str(p))
    assert df.collect()[0]["value_kg_y"] == 1.25


def test_export_text_formatted(spark, tmp_path):
    df = spark.createDataFrame([(1, 2.5, "x")], "a long, b double, c string")
    out = str(tmp_path / "txt")
    export_text_formatted(df, out, ["a", "b", "c"], sep=";", decimals=2)
    lines = spark.read.text(out).collect()
    assert lines[0]["value"] == "1;2.50;x"


def test_osm_json(spark, tmp_path):
    doc = {
        "elements": [
            {"type": "node", "id": 1, "lon": 8.5, "lat": 47.4, "tags": {"amenity": "cafe"}},
            {"type": "node", "id": 2, "lon": 8.6, "lat": 47.5},
            {"type": "way", "id": 10, "nodes": [1, 2], "tags": {"highway": "primary"}},
        ]
    }
    p = tmp_path / "osm.json"
    p.write_text(json.dumps(doc))
    out = osm_json_to_sources(spark, str(p))
    rows = {(r["osm_type"], r["osm_id"]): r for r in out.collect()}
    t, pts = parse_wkb(bytes(rows[("node", 1)]["geometry"]))
    assert (pts[0][0] == [8.5, 47.4]).all()
    t, line = parse_wkb(bytes(rows[("way", 10)]["geometry"]))
    assert line[0].shape == (2, 2)


def test_profiles_yaml_write_read_roundtrip(spark, tmp_path):
    """profiles_to_yaml (reference to_yaml, io.py:284-306) dumps raw
    ratio lists per profile-type key, including specific-day diurnal
    cycles; profiles_from_yaml reads them back (with normalization and
    the reference's duplicate-type rejection)."""
    pytest.importorskip("yaml")
    from pyspark.sql import functions as F

    from emiproc_spark.sources.profiles_io import (
        profiles_from_yaml,
        profiles_to_yaml,
    )

    prof = spark.createDataFrame(
        [
            ("daily", [1.0 / 24] * 24),
            ("daily_saturday", [0.5 / 12] * 12 + [1.5 / 12] * 12),
            ("weekly", [2.0, 1.0, 1.0, 1.0, 1.0, 0.5, 0.5]),
        ],
        schema="ptype string, ratios array<double>",
    )
    path = str(tmp_path / "sub" / "prof.yaml")
    profiles_to_yaml(prof, path)

    import yaml

    with open(path) as f:
        data = yaml.safe_load(f)
    assert set(data) == {"daily", "diurn_saturday", "weekly"}
    assert data["weekly"] == [2.0, 1.0, 1.0, 1.0, 1.0, 0.5, 0.5]  # verbatim

    store, _ = profiles_from_yaml(spark, path)
    back = {r["ptype"]: r["ratios"] for r in store.collect()}
    assert set(back) == {"daily", "daily_saturday", "weekly"}
    assert back["weekly"][0] == pytest.approx(2.0 / 7.0)  # normalized
    assert sum(back["daily_saturday"]) == pytest.approx(1.0)

    # unsupported profile type raises like the reference
    bad = spark.createDataFrame(
        [("hour_of_year", [1.0] * 3)], schema="ptype string, ratios array<double>"
    )
    with pytest.raises(NotImplementedError, match="hour_of_year"):
        profiles_to_yaml(bad, str(tmp_path / "bad.yaml"))

    # duplicate profile type raises (divergence: reference silently
    # overwrites; we refuse to lose data)
    dup = spark.createDataFrame(
        [("daily", [1.0] * 24), ("daily", [2.0] * 24)],
        schema="ptype string, ratios array<double>",
    )
    with pytest.raises(ValueError, match="duplicate"):
        profiles_to_yaml(dup, str(tmp_path / "dup.yaml"))

    # reader: alias keys + duplicate-type rejection (io.py:249-253)
    p2 = str(tmp_path / "alias.yaml")
    with open(p2, "w") as f:
        f.write("season: [1.0, 1.0]\nday: [1.0]\n")
    store2, _ = profiles_from_yaml(spark, p2)
    assert {r["ptype"] for r in store2.collect()} == {"monthly", "daily"}
    p3 = str(tmp_path / "clash.yaml")
    with open(p3, "w") as f:
        f.write("season: [1.0]\nmonthly: [1.0]\n")
    with pytest.raises(ValueError, match="already added"):
        profiles_from_yaml(spark, p3)


def test_profiles_yaml_reads_abbreviated_day_aliases(spark, tmp_path):
    """Files written by earlier releases used diurn_sat-style keys and
    stores carried ptype daily_sat; both must still read/write, now
    canonicalized to the full reference day names."""
    pytest.importorskip("yaml")
    from emiproc_spark.sources.profiles_io import (
        profiles_from_yaml,
        profiles_to_yaml,
    )

    p = str(tmp_path / "old.yaml")
    with open(p, "w") as f:
        f.write("diurn_sat: [" + ", ".join(["0.5"] * 24) + "]\n")
    store, _ = profiles_from_yaml(spark, p)
    rows = store.collect()
    assert [r["ptype"] for r in rows] == ["daily_saturday"]

    out = str(tmp_path / "rewritten.yaml")
    prof = spark.createDataFrame(
        [("daily_sat", [1.0 / 24] * 24)], schema="ptype string, ratios array<double>"
    )
    profiles_to_yaml(prof, out)
    import yaml

    with open(out) as f:
        assert set(yaml.safe_load(f)) == {"diurn_saturday"}
