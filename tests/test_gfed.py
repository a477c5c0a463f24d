"""GFED4 algebra over an injected decoder (HDF5 decode is h5py-gated;
the month×partition×area math and profile normalization are real)."""

import numpy as np
import pytest

from emiproc_spark.sources.gfed import (
    gfed4_emissions,
    gfed4_monthly_ratios,
    gfed4_scan,
)

NLAT, NLON = 3, 2


def make_fake_decoder():
    """Deterministic stand-in for the HDF5 groups: DM × partition ×
    area already multiplied, like default_h5_decoder yields.  Built as
    a closure so Spark serializes it by value into the workers."""
    nlat, nlon = NLAT, NLON

    def fake_decoder(content: bytes):
        import numpy as np

        rng = np.random.default_rng(11)
        for month in range(1, 13):
            for cat in ("SAVA", "BORF"):
                arr = np.round(rng.uniform(0, 5, (nlat, nlon)), 3)
                if cat == "BORF":
                    arr[0, 0] = 0.0  # cell 0 only has SAVA mass
                yield month, cat, arr

    return fake_decoder


def test_gfed4_emissions(spark, tmp_path):
    # any file works — the injected decoder ignores the bytes
    (tmp_path / "GFED4.1s_2016.hdf5").write_bytes(b"\x89HDF fake")
    out = gfed4_emissions(
        spark, str(tmp_path), decoder=make_fake_decoder()
    ).toPandas()
    assert set(out["category"]) == {"SAVA", "BORF"}
    assert set(out["substance"]) == {"DM"}
    # recompute expected: sum over months for cell (lat0, lon1) → cell_id
    # lon-major = 1*NLAT + 0 = 3
    want = {}
    for month, cat, arr in make_fake_decoder()(b""):
        want[cat] = want.get(cat, 0.0) + arr[0, 1]
    got = out.set_index(["category", "cell_id"])["value_kg_y"]
    assert got[("SAVA", NLAT)] == pytest.approx(want["SAVA"])
    assert got[("BORF", NLAT)] == pytest.approx(want["BORF"])


def test_gfed4_monthly_ratios(spark, tmp_path):
    (tmp_path / "g.hdf5").write_bytes(b"x")
    ratios = gfed4_monthly_ratios(
        spark, str(tmp_path), decoder=make_fake_decoder()
    ).toPandas()
    sums = ratios.groupby(["cell_id", "category"])["ratio"].sum()
    assert np.allclose(sums.values, 1.0)
    assert ratios["pos"].min() == 0 and ratios["pos"].max() == 11


def test_gfed4_h5_gate(spark, tmp_path):
    # truncated HDF5 container: the built-in codec (h5py absent) rejects
    # it with a clear parse error instead of silently returning nothing
    (tmp_path / "g.hdf5").write_bytes(b"\x89HDF\r\n\x1a\n")
    with pytest.raises(Exception, match="h5py|superblock|signature|hdf5|index"):
        gfed4_scan(spark, str(tmp_path)).collect()


def test_gfed4_bad_variable(spark):
    with pytest.raises(ValueError, match="use_variable"):
        gfed4_scan(None, "x", use_variable="XX")
