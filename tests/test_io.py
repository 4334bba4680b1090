"""FITS persistence tests (pure-python writer/reader)."""

import numpy as np

import fast_tpu
from fast_tpu.utils import fits
from conftest import make_test_params


def test_roundtrip_image(tmp_path):
    fname = tmp_path / "img.fits"
    data = np.random.default_rng(0).normal(size=(7, 13))
    hdr = {"FOO": 1.25, "BAR": "hello", "FLAG": True, "COUNT": 42,
           "OTRSCALE": "inf"}
    fits.writeto(str(fname), data, header=hdr)
    h = fits.getheader(str(fname))
    d = fits.getdata(str(fname))
    np.testing.assert_array_equal(d, data)
    assert h["FOO"] == 1.25
    assert h["BAR"] == "hello"
    assert h["FLAG"] is True
    assert h["COUNT"] == 42
    assert h["OTRSCALE"] == "inf"


def test_sim_save_load(tmp_path):
    p = make_test_params(TEMPORAL=False, SEED=9)
    sim = fast_tpu.Fast(p)
    sim.run()
    fname = tmp_path / "result.fits"
    sim.save(str(fname))

    res = fast_tpu.load(str(fname))
    np.testing.assert_allclose(res.power, sim.result.power, rtol=1e-12)
    assert np.isclose(res._dl, sim.diffraction_limit)
    assert res.hdr["SEED"] == 9
    assert res.hdr["NITER"] == sim.Niter


def test_reference_can_read_our_files(tmp_path, reference_fast):
    """The reference's load() reads files we wrote (via the fits shim)."""
    p = make_test_params(TEMPORAL=False, SEED=4)
    sim = fast_tpu.Fast(p)
    sim.run()
    fname = tmp_path / "ours.fits"
    sim.save(str(fname))
    res = reference_fast.load(str(fname))
    np.testing.assert_allclose(res.power, sim.result.power, rtol=1e-12)
