"""Recorded-TLE fixture tests for the skyfield orbit path.

Drives the real ``get_satellite_obj`` / ``get_sample_time`` /
``skyfield_provider`` / ``FAST_sat_orbit`` code — the reference's live-TLE
integration path (``/root/reference/test/tests_pytest.py:190-199``,
``complete_orbit_simulation.py:9-92``) — offline, against the recorded TLE
in ``tests/data/`` and the deterministic Keplerian skyfield backend in
``skyfield_fixture.py`` (no network, no skyfield install needed).
"""

import os

import numpy as np
import pytest

from fast_tpu import orbit
from conftest import make_test_params

import skyfield_fixture

TLE = os.path.join(os.path.dirname(__file__), "data", "recorded_iss.tle")
STATION = dict(lat=45.0, lon=0.0)


@pytest.fixture
def sf_backend(monkeypatch):
    """Point fast_tpu.orbit's skyfield hooks at the recorded fixture."""
    monkeypatch.setattr(orbit, "_sf_load", skyfield_fixture.load)
    monkeypatch.setattr(orbit, "_sf_wgs84", skyfield_fixture.wgs84)
    monkeypatch.setattr(orbit, "_skyfield", True)


def test_get_satellite_obj(sf_backend):
    sat = orbit.get_satellite_obj(TLE, "ISS (ZARYA)")
    assert sat.name == "ISS (ZARYA)"
    # TLE mean motion -> ISS-like orbit: a ~ 6798 km, epoch 2021-10-02
    assert 6.7e6 < sat.a < 6.9e6
    assert sat.epoch_utc.year == 2021
    # unnamed lookup returns the first satellite
    assert orbit.get_satellite_obj(TLE).name == sat.name


def test_get_sample_time_finds_pass(sf_backend):
    sat = orbit.get_satellite_obj(TLE, "ISS (ZARYA)")
    times, t_rise = orbit.get_sample_time(
        sat, STATION["lat"], STATION["lon"], N=8, period=2,
        min_altitude_degrees=10.0)
    assert times.shape == (8,)
    assert times[0] == 0.0
    assert np.all(np.diff(times) > 0)
    assert 100 < times[-1] < 1500  # a LEO pass lasts minutes
    assert t_rise.year == 2021
    # geometry over the pass: rises at the threshold, culminates high
    provider = orbit.skyfield_provider(sat, STATION["lat"], STATION["lon"],
                                       t_rise)
    alts = np.array([provider(t)[0] for t in times])
    dists = np.array([provider(t)[2] for t in times])
    assert abs(alts[0] - 10.0) < 2.0
    assert alts.max() > 30.0
    assert (dists > 400e3).all() and (dists < 2400e3).all()
    # culmination respects the altitude cap
    _, t_rise_cap = orbit.get_sample_time(
        sat, STATION["lat"], STATION["lon"], N=4, period=2,
        min_altitude_degrees=10.0, max_altitude_degree=50.0)
    prov_cap = orbit.skyfield_provider(sat, STATION["lat"], STATION["lon"],
                                       t_rise_cap)
    tt = np.linspace(0, 600, 61)
    assert max(prov_cap(t)[0] for t in tt) <= 50.0


def test_get_sample_time_zenith_stop(sf_backend):
    sat = orbit.get_satellite_obj(TLE, "ISS (ZARYA)")
    times_full, t_rise = orbit.get_sample_time(
        sat, STATION["lat"], STATION["lon"], N=8, period=2,
        min_altitude_degrees=10.0)
    times_half, _ = orbit.get_sample_time(
        sat, STATION["lat"], STATION["lon"], N=8, period=2,
        min_altitude_degrees=10.0, zenith_stop=True)
    # stopping at culmination: roughly half the full pass
    assert 0.3 < times_half[-1] / times_full[-1] < 0.7
    # elevation is monotone increasing up to culmination
    provider = orbit.skyfield_provider(sat, STATION["lat"], STATION["lon"],
                                       t_rise)
    alts = np.array([provider(t)[0] for t in times_half])
    assert np.all(np.diff(alts) > 0)


def test_fast_sat_orbit_end_to_end(sf_backend):
    """The reference's full TLE entry point, offline."""
    p = make_test_params(TEMPORAL=False, NITER=20, NCHUNKS=2, NPXLS=164)
    simu_params = {
        "satellite_name": "ISS (ZARYA)",
        "telescop_lat": STATION["lat"],
        "telescop_lon": STATION["lon"],
        "N_sample": 3,
        "t0_research": None,
        "research_window": 2,
        "altitude_min": 10.0,
        "altitude_max": 90.0,
        "zenith_stop": False,
    }
    sims = orbit.FAST_sat_orbit(p, simu_params, TLE)
    assert {"simulation_0", "simulation_1", "simulation_2"} <= set(sims)
    assert sims["altitudes"].shape == (3,)
    # per-sample geometry made it into the engines
    z = [sims[f"simulation_{i}"].params["ZENITH_ANGLE"] for i in range(3)]
    assert np.allclose(z, 90 - sims["altitudes"])
    assert all(0 < zi < 85 for zi in z)
    L = [sims[f"simulation_{i}"].params["L_SAT"] for i in range(3)]
    assert all(400e3 < Li < 2400e3 for Li in L)
    # LEO point-ahead angles of order 2 v/c ~ several arcsec
    paa = [np.hypot(*sims[f"simulation_{i}"].params["DTHETA"])
           for i in range(3)]
    assert all(1 < pi < 30 for pi in paa)
    # one sample runs end to end
    res = sims["simulation_1"].run()
    assert np.isfinite(np.asarray(res.power)).all()


def test_tle_file_nameless_and_partial(tmp_path):
    """The fixture TLE parser handles the common name-less 2-line format
    and tolerates a trailing partial entry (round-4 review fix)."""
    with open(TLE) as f:
        name, l1, l2 = [ln.rstrip("\n") for ln in f if ln.strip()]
    # name-less file: two satellites, no name lines
    p = tmp_path / "nameless.tle"
    p.write_text(f"{l1}\n{l2}\n{l1}\n{l2}\n")
    sats = skyfield_fixture.load.tle_file(str(p))
    assert len(sats) == 2 and sats[0].name == ""
    # named file with a trailing partial entry parses the full entries
    p2 = tmp_path / "partial.tle"
    p2.write_text(f"{name}\n{l1}\n{l2}\n{name}\n{l1}\n")
    sats2 = skyfield_fixture.load.tle_file(str(p2))
    assert len(sats2) == 1 and sats2[0].name == name.strip()
