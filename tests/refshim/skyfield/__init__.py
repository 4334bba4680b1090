"""Test-only skyfield stub: lets the reference package import.

Orbit functionality that actually touches ephemerides raises at call time.
"""

from . import api  # noqa: F401
