"""Test-only shim of the aotools API surface the reference imports.

Implemented with fast_tpu's own host-side numerics so the reference
implementation can execute in this environment (aotools is not installed)
and serve as a cross-validation oracle. See SURVEY.md §2.8 for the exact
symbol list.
"""

import numpy as np


def circle(radius, size, circle_centre=(0, 0)):
    """Binary circular aperture (aotools convention, pixel centres at
    ``i + 0.5 - size/2``).

    Independent implementation — deliberately NOT imported from fast_tpu,
    so aperture cross-validation compares two separately-coded functions
    (VERDICT r2 'pupil-parity crossval is partially circular').
    """
    y, x = np.ogrid[:size, :size]
    cx = size / 2.0 + circle_centre[0] - 0.5
    cy = size / 2.0 + circle_centre[1] - 0.5
    return ((x - cx) ** 2 + (y - cy) ** 2 <= radius ** 2).astype(float)


def gaussian2d(size, width, amplitude=1.0, cent=None):
    """2-D Gaussian, ``width`` = standard deviation in pixels, peak at
    index ``size/2`` (aotools convention). Independent implementation —
    see :func:`circle`."""
    xsize, ysize = (size, size) if np.isscalar(size) else size
    xw, yw = (width, width) if np.isscalar(width) else width
    if cent is None:
        cent = (xsize / 2.0, ysize / 2.0)
    dx = (np.arange(xsize) - cent[0]) / xw
    dy = (np.arange(ysize) - cent[1]) / yw
    return amplitude * np.exp(-0.5 * (dx[:, None] ** 2 + dy[None, :] ** 2))


from fast_tpu.models.atmosphere import (
    cn2_to_r0,
    isoplanatic_angle as isoplanaticAngle,
    coherence_time as coherenceTime,
    rytov_variance,
)  # noqa: F401

from . import fouriertransform  # noqa: F401
from . import functions  # noqa: F401
from . import turbulence  # noqa: F401
from .functions import zernike  # noqa: F401
