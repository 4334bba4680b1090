"""Orbit-sweep tests using the built-in Keplerian ephemeris provider."""

import numpy as np
import pytest

import fast_tpu
from fast_tpu import orbit
from conftest import make_test_params


def test_circular_orbit_provider_geometry():
    provider = orbit.circular_orbit_provider(550e3, offset_angle_deg=1.0)
    alt, az, dist = provider(0.0)
    # culmination: high elevation, distance slightly above the altitude
    assert 60 < alt <= 90
    assert 550e3 < dist < 1000e3
    # elevation decreases away from culmination
    alt2, _, dist2 = provider(120.0)
    assert alt2 < alt
    assert dist2 > dist


def test_sample_pass_geometry():
    provider = orbit.circular_orbit_provider(550e3, offset_angle_deg=3.0)
    times = np.linspace(-200, 200, 9)
    geo = orbit.sample_pass_geometry(provider, times, Tloop=1e-3)
    assert geo["paa"].shape == (9, 2)
    assert np.isfinite(geo["paa"]).all()
    assert np.isfinite(geo["aniso_dl"]).all()
    # LEO point-ahead angle is of order 2*v_orb/c ~ 10 arcsec
    paa_mag = np.hypot(geo["paa"][:, 0], geo["paa"][:, 1])
    assert (paa_mag > 1).all() and (paa_mag < 30).all()
    # anisoplanatism over 1 ms is much smaller than the PAA
    aniso_mag = np.hypot(geo["aniso_dl"][:, 0], geo["aniso_dl"][:, 1])
    assert (aniso_mag < paa_mag).all()


def test_fov_angle_components_zenith_symmetry():
    # a displacement purely in azimuth at fixed altitude has |dy| < |dx|
    dx, dy = orbit.fov_angle_components(45.0, 100.0, 45.0, 101.0)
    assert abs(dx) > abs(dy)


def test_fast_sat_orbit_from_geometry():
    provider = orbit.circular_orbit_provider(550e3, offset_angle_deg=10.0)
    times = np.linspace(-60, 60, 3)
    p = make_test_params(TEMPORAL=False, NITER=20, NCHUNKS=2)
    geo = orbit.sample_pass_geometry(provider, times, p["TLOOP"])
    sims = orbit.FAST_sat_orbit_from_geometry(p, geo)
    assert "simulation_0" in sims and "simulation_2" in sims
    sim = sims["simulation_1"]
    res = sim.run()
    assert np.isfinite(res.power).all()
    # zenith angle fed through to the engine
    assert np.isclose(sim.params["ZENITH_ANGLE"],
                      geo["zenith_angles"][1])


def test_run_orbit_sweep_sharded():
    """Full pipeline: ephemeris -> geometry -> per-sample sims -> sharded scan."""
    import jax
    from fast_tpu import parallel

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    provider = orbit.circular_orbit_provider(550e3, offset_angle_deg=10.0)
    times = np.linspace(-60, 60, 4)
    p = make_test_params(TEMPORAL=False, NITER=320, NCHUNKS=2, NPXLS=164,
                         SEED=3)
    geo = orbit.sample_pass_geometry(provider, times, p["TLOOP"])
    sims = orbit.FAST_sat_orbit_from_geometry(p, geo)

    mesh = parallel.make_scan_mesh(2, 4)
    results = orbit.run_orbit_sweep(sims, mesh=mesh)
    assert len(results) == 4
    for r in results.values():
        assert np.isfinite(np.asarray(r.power)).all()


def test_fast_sat():
    p = make_test_params(TEMPORAL=False, NITER=20, NCHUNKS=2)
    sim = orbit.FAST_sat(np.array([100.0, 0.0]), p)
    assert np.allclose(sim.params["ANISO_DL"], [0.1, 0.0])


def test_skyfield_gated():
    if orbit._skyfield:
        pytest.skip("skyfield installed")
    with pytest.raises(ImportError):
        orbit.get_satellite_obj("dummy.tle")
