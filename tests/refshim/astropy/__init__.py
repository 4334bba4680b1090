"""Test-only astropy shim (io.fits only) backed by fast_tpu.utils.fits."""

from . import io  # noqa: F401
