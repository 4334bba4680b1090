"""Test-only shim of the aotools API surface the reference imports.

Implemented with fast_tpu's own host-side numerics so the reference
implementation can execute in this environment (aotools is not installed)
and serve as a cross-validation oracle. See SURVEY.md §2.8 for the exact
symbol list.
"""

import numpy as np

from fast_tpu.ops.apertures import circle, gaussian2d  # noqa: F401
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
