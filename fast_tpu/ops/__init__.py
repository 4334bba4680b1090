"""Numerical building blocks (L0 of the reference layer map, SURVEY.md §1).

Pure-JAX replacements for the reference's numpy/scipy/aotools numerics
surface (``fast/funcs.py`` and the aotools symbols listed in SURVEY.md §2.8).
"""

from . import fourier
from . import integrate
from . import bessel
from . import zernike
from . import apertures
from . import interp
from . import rng

from .fourier import ft, ift, ft2, ift2
from .integrate import simpson, integrate_powerspectrum, integrate_path
from .bessel import besselj
from .zernike import noll_to_nm
from .apertures import (
    circle,
    gaussian2d,
    compute_pupil,
    compute_gaussian_mode,
    pupil_filter,
    optimize_fibre,
    coupling_loss,
)

__all__ = [
    "fourier", "integrate", "bessel", "zernike", "apertures", "interp", "rng",
    "ft", "ift", "ft2", "ift2",
    "simpson", "integrate_powerspectrum", "integrate_path",
    "besselj", "noll_to_nm",
    "circle", "gaussian2d", "compute_pupil", "compute_gaussian_mode",
    "pupil_filter", "optimize_fibre", "coupling_loss",
]
