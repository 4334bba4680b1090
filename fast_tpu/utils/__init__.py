"""Runtime utilities: FITS persistence and logging setup."""

from . import fits
from . import log

__all__ = ["fits", "log"]
