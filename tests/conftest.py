"""Test configuration.

Tests run on CPU with 8 virtual devices (for sharding tests) and x64
enabled. The environment variables must be set before JAX initialises.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(__file__))  # tests/ for refshim helper

import jax  # noqa: E402

# Force the CPU backend for tests (the sandbox pins JAX_PLATFORMS to the TPU
# platform; this must run before any backend initialisation).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def make_test_params(**overrides):
    """Small reference-style parameter dict (4-layer HV57/Bufton profile)."""
    import fast_tpu

    h, cn2, w = fast_tpu.turbulence_models.HV57_Bufton_profile(4)
    p = dict(fast_tpu.conf.DEFAULTS)
    p.update({
        "NPXLS": "auto",
        "DX": 0.01,
        "NITER": 100,
        "NCHUNKS": 10,
        "TEMPORAL": False,
        "D_GROUND": 0.8,
        "OBSC_GROUND": 0,
        "WVL": 1550e-9,
        "ZENITH_ANGLE": 55,
        "PROP_DIR": "up",
        "DTHETA": [4, 0],
        "AO_MODE": "AO",
        "DSUBAP": 0.1,
        "TLOOP": 0.001,
        "TEXP": 0.001,
        "ALIAS": True,
        "NOISE": 0,
        "H_TURB": h,
        "CN2_TURB": cn2,
        "WIND_SPD": w,
        "WIND_DIR": np.array([0.0, 90.0, 180.0, 270.0]),
        "SEED": 1234,
    })
    p.update(overrides)
    return p


@pytest.fixture
def test_params():
    return make_test_params()


@pytest.fixture(scope="session")
def reference_fast():
    """Import the reference implementation against the aotools/astropy shim.

    Returns the reference ``fast`` package, or skips if unavailable.
    """
    refdir = "/root/reference"
    shimdir = os.path.join(os.path.dirname(__file__), "refshim")
    if not os.path.isdir(refdir):
        pytest.skip("reference implementation not available")
    for path in (shimdir, refdir):
        if path not in sys.path:
            sys.path.insert(0, path)
    import fast as reference
    return reference
