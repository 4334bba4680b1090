"""fast-tpu: a TPU-native Fourier-domain adaptive-optics simulation engine.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of FAST
(``ojdf/fast``, DOI 10.1364/OE.458659): Monte Carlo characterisation of
free-space optical communication links between ground stations and
satellites under atmospheric turbulence, with or without AO correction.

Design (see SURVEY.md for the analysis of the reference):

* Residual AO phase and log-amplitude power spectra are assembled as pure,
  jit-compiled functions on the 2-D spatial-frequency grid in float64
  (reference: ``fast/fast.py:445-587``, ``fast/ao_power_spectra.py``).
* Monte Carlo phase-screen realizations are batched 2-D inverse FFTs over a
  vmapped realization axis in float32/complex64 (reference drew them one
  serial chunk at a time through pyFFTW, ``fast/fast.py:589-605``).
* The realization axis shards across a ``jax.sharding.Mesh`` with psum
  reductions for fading statistics (``fast_tpu.parallel``); the reference
  was strictly single-process.

Float64 note: power-spectrum assembly requires double precision to hit the
~1e-6 parity target versus the CPU reference, so importing ``fast_tpu``
enables ``jax_enable_x64`` unless the environment variable
``FAST_TPU_NO_X64`` is set. The Monte Carlo hot path explicitly uses
float32/complex64 so TPU performance is unaffected.
"""

import os as _os

import jax as _jax

if not _os.environ.get("FAST_TPU_NO_X64"):
    _jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from . import conf
from . import grids
from . import ops
from . import models
from . import turbulence_models
from . import funcs
from . import ao_power_spectra
from .engine import Fast, FastResult, load
from . import comms
from .comms import FastFSOC
from . import orbit
from . import complete_orbit_simulation
from . import parallel
from . import sweep
from . import utils

__all__ = [
    "Fast",
    "FastResult",
    "FastFSOC",
    "load",
    "conf",
    "grids",
    "ops",
    "models",
    "funcs",
    "ao_power_spectra",
    "turbulence_models",
    "comms",
    "orbit",
    "complete_orbit_simulation",
    "parallel",
    "sweep",
    "utils",
]
