class _Timescale:
    def from_datetime(self, *a, **k):
        raise NotImplementedError("skyfield stub: no ephemeris available")


class _Load:
    @staticmethod
    def timescale():
        return _Timescale()

    @staticmethod
    def tle_file(*a, **k):
        raise NotImplementedError("skyfield stub: no ephemeris available")


load = _Load()


class _WGS84:
    @staticmethod
    def latlon(*a, **k):
        raise NotImplementedError("skyfield stub: no ephemeris available")


wgs84 = _WGS84()
