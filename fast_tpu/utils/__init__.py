"""Runtime utilities: FITS persistence and logging setup."""

from . import fits
from . import log
from . import profiling

__all__ = ["fits", "log", "profiling"]
