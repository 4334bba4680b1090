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


class TestFovRotation:
    @staticmethod
    def _dir(alt, az):
        alt, az = np.radians(alt), np.radians(az)
        return np.array([np.cos(alt) * np.cos(az),
                         np.cos(alt) * np.sin(az), np.sin(alt)])

    def test_against_vector_geometry(self):
        """pi - beta0 - beta1 checked via tangent-vector triangle angles."""
        zen = np.array([0.0, 0.0, 1.0])

        def angle_at(a, b, c):
            tb = b - (b @ a) * a
            tc = c - (c @ a) * a
            tb /= np.linalg.norm(tb)
            tc /= np.linalg.norm(tc)
            return np.arccos(np.clip(tb @ tc, -1, 1))

        rng = np.random.default_rng(17)
        for _ in range(50):
            alt0, alt1 = rng.uniform(5, 85, 2)
            az0 = rng.uniform(0, 360)
            az1 = az0 + rng.uniform(-20, 20)
            v0, v1 = self._dir(alt0, az0), self._dir(alt1, az1)
            expect = np.pi - angle_at(v0, zen, v1) - angle_at(v1, zen, v0)
            got = orbit.fov_rotation(alt0, az0, alt1, az1)
            assert np.isclose(got, expect, atol=1e-10)

    def test_geometry_dict_contains_rotations(self):
        provider = orbit.circular_orbit_provider(550e3, offset_angle_deg=10.0)
        times = np.linspace(-60, 60, 5)
        geo = orbit.sample_pass_geometry(provider, times, 1e-3,
                                         rotations=True)
        assert geo["rotations"].shape == (5,)
        assert np.isfinite(geo["rotations"]).all()


class TestPaaStationShift:
    """Quantify the Earth-rotation station shift the reference applies to
    the point-ahead evaluation (``complete_orbit_simulation.py:139-143``)."""

    @staticmethod
    def _rotating_earth_provider(sat_eci, v_eci, lat_deg=30.0, lon0_deg=0.0):
        """Inertial-frame provider: rotating station, linearly-moving
        satellite. Accepts ``lon_shift_deg`` like
        :func:`orbit.skyfield_provider`.
        """
        R = 6.371009e6
        w_e = 2 * np.pi / 86400.0
        lat = np.radians(lat_deg)
        sat_eci = np.asarray(sat_eci, float)
        v_eci = np.asarray(v_eci, float)

        def provider(t, lon_shift_deg=0.0):
            lon = np.radians(lon0_deg + lon_shift_deg) + w_e * t
            station = R * np.array([np.cos(lat) * np.cos(lon),
                                    np.cos(lat) * np.sin(lon), np.sin(lat)])
            up = station / np.linalg.norm(station)
            east = np.array([-np.sin(lon), np.cos(lon), 0.0])
            north = np.cross(up, east)
            los = sat_eci + v_eci * t - station
            dist = np.linalg.norm(los)
            alt = np.degrees(np.arcsin(np.clip(los @ up / dist, -1, 1)))
            az = np.degrees(np.arctan2(los @ east, los @ north)) % 360
            return alt, az, dist

        return provider

    def test_inertially_fixed_satellite_paa_cancels(self):
        """For a static inertial target the naive PAA is purely the
        observer's own rotation; the station shift removes it exactly."""
        sat = np.array([6.371009e6 + 36e6, 2e6, 3e6])
        provider = self._rotating_earth_provider(sat, [0.0, 0.0, 0.0])
        g_shift = orbit.sample_pass_geometry(provider, [0.0], 1e-3,
                                             paa_station_shift=True)
        g_fixed = orbit.sample_pass_geometry(provider, [0.0], 1e-3,
                                             paa_station_shift=False)
        assert np.hypot(*g_fixed["paa"][0]) > 3.0     # ~4 arcsec artifact
        assert np.hypot(*g_shift["paa"][0]) < 1e-6    # fully cancelled

    def test_leo_shift_delta_quantified(self):
        """LEO: the correction is a small fraction of the PAA itself."""
        sat = np.array([6.371009e6 + 550e3, 2e5, 3e5])
        provider = self._rotating_earth_provider(sat, [0.0, 5400.0, 5400.0])
        times = np.linspace(0, 10, 3)
        g_shift = orbit.sample_pass_geometry(provider, times, 1e-3,
                                             paa_station_shift=True)
        g_fixed = orbit.sample_pass_geometry(provider, times, 1e-3,
                                             paa_station_shift=False)
        paa_mag = np.hypot(*g_shift["paa"].T).max()
        delta = np.hypot(*(g_shift["paa"] - g_fixed["paa"]).T).max()
        assert paa_mag > 3.0          # a real LEO-scale point-ahead
        assert 0.05 < delta < 2.0     # the Earth-rotation correction
        assert delta < 0.25 * paa_mag

    def test_fixed_station_provider_falls_back(self):
        """Providers without lon_shift support still work (no TypeError)."""
        provider = orbit.circular_orbit_provider(550e3, offset_angle_deg=5.0)
        geo = orbit.sample_pass_geometry(provider, np.linspace(-30, 30, 3),
                                         1e-3, paa_station_shift=True)
        assert np.isfinite(geo["paa"]).all()
