"""Configuration system.

Accepts the same inputs as the reference config layer (``fast/conf.py:11-64``):
either a plain ``dict`` of parameters or a path to an executable ``.py`` file
defining a dict named ``p``. Missing keys are filled from :data:`DEFAULTS`
with a warning. The schema is a superset of the reference schema
(``fast/conf.py:67-115``): all reference keys keep their exact names,
semantics and default values; TPU-specific keys are new and default to
behaviour-preserving values.
"""

import importlib.util
import logging

import numpy as np

logger = logging.getLogger(__name__)

#: Reference-compatible parameter schema (``fast/conf.py:67-115``) plus
#: TPU-native extensions (marked below).
DEFAULTS = {
    # --- simulation ---
    "NPXLS": "auto",        # grid size, or 'auto' (resolution rules in engine)
    "DX": "auto",           # pixel scale [m/px], or 'auto'
    "NITER": 1000,          # number of Monte Carlo realizations
    "SUBHARM": False,       # add low-order subharmonic modes
    "FFTW": False,          # accepted for config compatibility; ignored (XLA FFT)
    "FFTW_THREADS": 1,      # accepted for config compatibility; ignored
    "NCHUNKS": 10,          # chunks to split NITER into (bounds device memory)
    "TEMPORAL": False,      # frozen-flow time series instead of iid draws
    "DT": 0.001,            # timestep for TEMPORAL mode [s]
    "LOGFILE": None,
    "LOGLEVEL": "INFO",
    "SEED": None,           # RNG seed (None -> nondeterministic)
    # --- transmitter / receiver ---
    "W0": "opt",            # 1/e^2 Tx beam radius [m], or 'opt'
    "D_GROUND": 1.0,        # ground aperture diameter [m]
    "OBSC_GROUND": 0,       # ground central obscuration diameter [m]
    "D_SAT": 0.1,           # satellite aperture diameter [m]
    "OBSC_SAT": 0,          # satellite central obscuration diameter [m]
    "WVL": 1550e-9,         # laser wavelength [m]
    "AXICON": False,        # axicon (ring) launch mode
    "POWER": 1,             # laser power [W]
    "SMF": True,            # single-mode-fibre coupling at receiver
    # --- turbulence / link ---
    "H_SAT": 36e6,          # satellite altitude [m]
    "L_SAT": None,          # explicit slant range [m] (overrides H_SAT)
    "H_TURB": np.array([0, 10e3]),             # layer heights [m]
    "CN2_TURB": np.array([100e-15, 100e-15]),  # integrated Cn2 dh per layer [m^1/3]
    "WIND_SPD": np.array([10, 10]),            # wind speed per layer [m/s]
    "WIND_DIR": np.array([90.0, 0.0]),         # wind direction per layer [deg]
    "L0": np.inf,           # outer scale [m]
    "l0": 1e-06,            # inner scale [m]
    "ZENITH_ANGLE": 0,      # [deg]
    "PROP_DIR": "up",       # 'up' or 'down'
    "DTHETA": [4, 0],       # point-ahead angle (x, y) [arcsec]
    "TRANSMISSION": 1,      # atmospheric transmission coefficient
    # --- adaptive optics ---
    "AO_MODE": "AO",        # 'AO' | 'TT' | 'LGSAO' | 'NOAO'
    "DSUBAP": 0.02,         # WFS subaperture pitch [m]
    "TLOOP": 0.001,         # AO loop delay [s]
    "TEXP": 0.001,          # WFS exposure time [s]
    "ALIAS": True,          # include WFS aliasing PSD
    "NOISE": 0.0,           # WFS noise [rad^2]
    "MODAL": False,         # modal (True) or zonal (False) correction
    "MODAL_MULT": 1,        # modal-space multiplier
    "ZMAX": None,           # max Noll index for modal correction
    # --- comms ---
    "COHERENT": False,      # keep complex field (coherent detection)
    "MODULATION": None,
    "EsN0": None,
}

#: TPU-native extension keys. Kept separate so that missing-key warnings for
#: reference configs only mention reference keys.
TPU_DEFAULTS = {
    "DTYPE": "float32",     # Monte Carlo synthesis dtype ('float32'|'float64')
    "PSD_DTYPE": "float64", # reserved: PSD assembly is always float64 on
                            # the PSD_DEVICE backend (parity requires it)
    "RNG": "threefry",      # JAX PRNG implementation ('threefry'|'rbg')
    "PSD_DEVICE": "cpu",    # where to assemble PSDs ('cpu' guarantees f64)
    "SYNTH": "auto",        # screen synthesis: 'auto'|'colfac' (column-
                            # factored covariance)|'matmul' (pruned DFT on
                            # the MXU)|'fft' (batched ifft2)|'pallas'|
                            # 'pallas_fused' (fully fused on-chip kernels)|
                            # 'pallas_colfac' (fused kernel drawing noise
                            # in the colfac basis: Npup*N normals/screen)
    "PRECISION": "default", # TPU matmul precision for the synthesis paths:
                            # 'default' (single-pass bf16 on the MXU —
                            # phase error ~1e-2 rad RMS, distribution-
                            # validated against the f32 paths, ~1.5-2x
                            # faster) | 'high' (bf16x3) | 'highest' (full
                            # f32). CPU dots are always native f32, so the
                            # parity test suite is unaffected.
    "TEMPORAL_SYNTH": "auto",  # frozen-flow synthesis: 'screens' (one large
                            # screen per layer, grid grows with NITER as in
                            # the reference) | 'ar' (AR(1)-in-Fourier
                            # evolution on the fixed grid, arXiv:1512.05424)
                            # | 'auto' (screens while the grown grid stays
                            # <= 2048 px, else ar)
    "TEMPORAL_ALPHA": "auto",  # AR mode-survival factor per step: 1.0 =
                            # pure frozen flow; 'auto' decorrelates modes
                            # over one grid-wrap time when the series is
                            # long enough to wrap
    "MC_NOISE": "mixed",    # iid-kernel noise generator: 'mixed'
                            # (orthogonally mixed uniforms on the MXU —
                            # covariance exact by orthogonality, higher
                            # cumulants suppressed by the 128-way mixing
                            # and the screen's many-block sum; fade
                            # quantiles match full-f32 Box-Muller down to
                            # q=3e-7 at 33.5M samples; +25-50% kernel
                            # throughput) | 'gauss' (Box-Muller).
                            # Non-kernel paths always draw Gaussians.
    "TEMPORAL_NOISE": "uniform",  # boiling-noise marginal in the fused AR
                            # kernel: 'uniform' (scaled uniforms — exact
                            # second-order statistics; the ~43-step AR sum
                            # per mode x 262k-mode screen sum makes higher
                            # moments Gaussian to <1e-3 by CLT; ~2x faster
                            # per boiling step) | 'gauss' (Box-Muller).
                            # Non-kernel paths always draw Gaussians.
}


class ConfigParser:
    """Parse a config dict or ``.py`` file into a validated parameter dict.

    Mirrors the reference behaviour (``fast/conf.py:11-64``): a ``.py`` file
    is imported as a module and must define a dict ``p``; missing reference
    keys are filled from :data:`DEFAULTS` with a warning, TPU extension keys
    from :data:`TPU_DEFAULTS` silently.
    """

    def __init__(self, fname_or_dict):
        if isinstance(fname_or_dict, dict):
            self.config = dict(fname_or_dict)
            self.fname = None
        elif isinstance(fname_or_dict, str):
            self.fname = fname_or_dict
            self.config = {}
            self.load(fname_or_dict)
        else:
            raise Exception("Either config file name or params dict required")

        self.defaults = dict(DEFAULTS)
        self.check()

    def load(self, fname):
        """Load a ``.py`` config file defining a dict ``p``."""
        if fname.split(".")[-1] == "py":
            spec = importlib.util.spec_from_file_location("", fname)
            conf_module = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(conf_module)
            self.config = dict(conf_module.p)
            return
        raise Exception("Require .py config file")

    def check(self):
        """Fill missing keys from the defaults."""
        for key, val in DEFAULTS.items():
            if key not in self.config:
                logger.warning(
                    "Config parameter %s not defined in %s, setting default "
                    "value of %s", key, self.fname, val)
                self.config[key] = val
        for key, val in TPU_DEFAULTS.items():
            if key not in self.config:
                self.config[key] = val
