"""Minimal skyfield-compatible backend for offline TLE-path testing.

The sandbox has no skyfield (and no network), so the reference's live-TLE
integration path (``/root/reference/test/tests_pytest.py:190-199`` driving
``complete_orbit_simulation.py:9-92``) could not previously be exercised.
This module implements the *exact* skyfield API surface that
``fast_tpu.orbit`` consumes — ``load.tle_file``, ``load.timescale``,
``wgs84.latlon``, ``satellite.find_events``, ``(satellite - telescope)
.at(t).altaz()`` — backed by a deterministic two-body Keplerian propagator
over a rotating spherical Earth, seeded from a recorded TLE checked into
``tests/data/``.

It is a *fixture*, not an SGP4 implementation: orbital elements come from
the TLE (inclination, RAAN, mean anomaly, mean motion; eccentricity is
ignored, LEO fixtures are near-circular), propagation is unperturbed.
That is exactly enough to drive ``get_satellite_obj`` / ``get_sample_time``
/ ``FAST_sat_orbit`` end-to-end with reproducible pass geometry.

Usage (see ``test_orbit_tle.py``)::

    monkeypatch.setattr(orbit, "_sf_load", skyfield_fixture.load)
    monkeypatch.setattr(orbit, "_sf_wgs84", skyfield_fixture.wgs84)
    monkeypatch.setattr(orbit, "_skyfield", True)
"""

import datetime

import numpy as np

_GM = 3.986004418e14
_R_EARTH = 6.371009e6
_W_EARTH = 2 * np.pi / 86164.0905  # sidereal rotation rate [rad/s]
_EPOCH_GMST_DEG = 280.46  # arbitrary fixed epoch sidereal angle (fixture)


class Time:
    """Scalar or array time: seconds offset from a fixed UTC base."""

    def __init__(self, base_utc, seconds):
        self.base = base_utc
        self.seconds = seconds  # float or ndarray

    def utc_datetime(self):
        return self.base + datetime.timedelta(seconds=float(self.seconds))

    def __getitem__(self, i):
        return Time(self.base, np.asarray(self.seconds)[i])


class Timescale:
    def from_datetime(self, dt):
        return Time(dt, 0.0)


class Angle:
    def __init__(self, degrees):
        self.degrees = degrees


class Distance:
    def __init__(self, m):
        self.m = m


class Topocentric:
    def __init__(self, alt_deg, az_deg, dist_m):
        self._v = (alt_deg, az_deg, dist_m)

    def altaz(self):
        alt, az, dist = self._v
        return Angle(alt), Angle(az), Distance(dist)


class _Difference:
    def __init__(self, satellite, telescope):
        self.sat = satellite
        self.tel = telescope

    def at(self, t):
        secs = np.asarray(t.seconds, float)
        # absolute seconds from the satellite epoch
        dt0 = (t.base - self.sat.epoch_utc).total_seconds()
        alt, az, dist = self.sat._altaz(dt0 + secs, self.tel.lat_deg,
                                        self.tel.lon_deg)
        return Topocentric(alt, az, dist)


class Telescope:
    def __init__(self, lat_deg, lon_deg):
        self.lat_deg = lat_deg
        self.lon_deg = lon_deg


class wgs84:  # noqa: N801 - skyfield casing
    @staticmethod
    def latlon(lat_deg, lon_deg):
        return Telescope(lat_deg, lon_deg)


class EarthSatellite:
    """Keplerian circular-orbit satellite from recorded TLE elements."""

    def __init__(self, name, line1, line2):
        self.name = name
        # TLE line-1 epoch: YYDDD.DDDDDDDD
        yy = int(line1[18:20])
        year = 2000 + yy if yy < 57 else 1900 + yy
        doy = float(line1[20:32])
        self.epoch_utc = (datetime.datetime(year, 1, 1,
                                            tzinfo=datetime.timezone.utc)
                          + datetime.timedelta(days=doy - 1))
        # line-2 elements
        self.incl = np.radians(float(line2[8:16]))
        self.raan = np.radians(float(line2[17:25]))
        self.argp = np.radians(float(line2[34:42]))
        self.m0 = np.radians(float(line2[43:51]))
        n_rev_day = float(line2[52:63])
        self.n = n_rev_day * 2 * np.pi / 86400.0  # mean motion [rad/s]
        self.a = (_GM / self.n ** 2) ** (1 / 3)

    @property
    def epoch(self):
        return Time(self.epoch_utc, 0.0)

    def _eci(self, t):
        """ECI position at ``t`` seconds after epoch (circular orbit)."""
        u = self.argp + self.m0 + self.n * np.asarray(t, float)
        xo, yo = self.a * np.cos(u), self.a * np.sin(u)
        ci, si = np.cos(self.incl), np.sin(self.incl)
        cO, sO = np.cos(self.raan), np.sin(self.raan)
        return np.stack([cO * xo - sO * ci * yo,
                         sO * xo + cO * ci * yo,
                         si * yo], axis=-1)

    def _altaz(self, t, lat_deg, lon_deg):
        """Topocentric alt/az/dist for a station on the rotating Earth."""
        t = np.asarray(t, float)
        sat = self._eci(t)
        lat = np.radians(lat_deg)
        lon = (np.radians(_EPOCH_GMST_DEG + lon_deg) + _W_EARTH * t)
        cl, sl = np.cos(lat), np.sin(lat)
        station = _R_EARTH * np.stack(
            [cl * np.cos(lon), cl * np.sin(lon),
             np.broadcast_to(sl, np.shape(lon))], axis=-1)
        up = station / _R_EARTH
        east = np.stack([-np.sin(lon), np.cos(lon),
                         np.zeros(np.shape(lon))], axis=-1)
        north = np.cross(up, east)
        los = sat - station
        dist = np.linalg.norm(los, axis=-1)
        alt = np.degrees(np.arcsin(np.clip(
            np.sum(los * up, -1) / dist, -1, 1)))
        az = np.degrees(np.arctan2(np.sum(los * east, -1),
                                   np.sum(los * north, -1))) % 360
        if t.ndim == 0:
            return float(alt), float(az), float(dist)
        return alt, az, dist

    def find_events(self, telescope, t0, t1, altitude_degrees=0.0):
        """Rise (0) / culmination (1) / fall (2) events, skyfield-style.

        Dense 10 s sampling of the elevation over [t0, t1], refined
        crossings by bisection on the 10 s bracket (plenty for a fixture).
        """
        base = t0.base + datetime.timedelta(seconds=float(t0.seconds))
        span = ((t1.base + datetime.timedelta(seconds=float(t1.seconds)))
                - base).total_seconds()
        off0 = (base - self.epoch_utc).total_seconds()
        step = 10.0
        tt = np.arange(0.0, span, step)
        alt, _, _ = self._altaz(off0 + tt, telescope.lat_deg,
                                telescope.lon_deg)
        above = alt >= altitude_degrees
        ev_t, ev = [], []
        for i in range(1, len(tt)):
            if above[i] and not above[i - 1]:
                ev_t.append(tt[i])
                ev.append(0)
            elif above[i - 1] and not above[i]:
                ev_t.append(tt[i - 1])
                ev.append(2)
            elif (above[i - 1] and i + 1 < len(tt)
                  and alt[i] > alt[i - 1] and alt[i] >= alt[i + 1]):
                ev_t.append(tt[i])
                ev.append(1)
        times = Time(base, np.asarray(ev_t))
        return times, np.asarray(ev, dtype=int)

    def __sub__(self, telescope):
        return _Difference(self, telescope)


class load:  # noqa: N801 - skyfield casing
    @staticmethod
    def tle_file(path):
        with open(path) as f:
            lines = [ln.rstrip("\n") for ln in f if ln.strip()]
        sats = []
        i = 0
        while i < len(lines):
            if lines[i].startswith("1 "):
                # name-less two-line entry
                if i + 1 >= len(lines):
                    break  # trailing partial entry
                sats.append(EarthSatellite("", lines[i], lines[i + 1]))
                i += 2
            else:
                if i + 2 >= len(lines):
                    break  # trailing partial entry
                sats.append(EarthSatellite(lines[i].strip(), lines[i + 1],
                                           lines[i + 2]))
                i += 3
        return sats

    @staticmethod
    def timescale():
        return Timescale()
