"""Simulation engine: configuration -> power spectra -> Monte Carlo run.

TPU-native rebuild of the reference ``Fast`` class (``fast/fast.py:20-812``).
The structure is deliberately different from the reference's mutable
init-method chain:

* **Host stage** (numpy, float64): config resolution ('auto' grid rules,
  ``fast/fast.py:147-227``), atmosphere/beam geometry, pupils and launch
  modes, fibre-mode optimisation, link budget. Everything here is static
  per configuration.
* **PSD stage** (jnp, float64, pinned to the CPU backend): assembly of the
  residual-phase and log-amplitude power spectra — runs once per config,
  needs double precision for the ~1e-6 parity target, and is never hot.
* **Device stage** (jit, float32/complex64 by default): the Monte Carlo
  loop — batched colored-noise synthesis, centered inverse FFTs, pupil
  overlap reduction — one compiled program per chunk shape. The reference's
  serial chunk loop with preallocated numpy buffers and optional pyFFTW
  (``fast/fast.py:115-140,419-443``) maps onto XLA's batched FFT; the
  ``FFTW``/``FFTW_THREADS`` config keys are accepted and ignored.

Known reference quirks consciously fixed (SURVEY.md §7): wind direction is
reduced mod 360 (not 380, ``fast/fast.py:250``); the temporal no-wrap pixel
bound uses the resolved ``dx`` (the reference reads the raw ``DX`` config
value, which crashes for ``DX='auto'``, ``fast/fast.py:183``).
"""

import itertools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from . import conf
from . import psd
from .grids import SpatialFrequencies, SpatialFrequencyStruct
from .models import ao as ao_spectra
from .models import atmosphere
from .models.scintillation import (PupilFilterSampler, logamp_powerspec,
                                   temporal_logamp_powerspec)
from .ops import apertures
from .ops.fourier import ft2, ift2
from .ops.integrate import integrate_path, integrate_powerspectrum
from .ops.rng import make_key
from . import synthesis
from .utils import fits
from .utils.log import init_logging
from .utils.profiling import StageTimer

logger = logging.getLogger(__name__)

# reference-namespace parity: ``fast.fast`` re-exports these from aotools
# (``fast/fast.py:5``); keep them importable from the same place
from .models.atmosphere import (cn2_to_r0, isoplanatic_angle,  # noqa: E402
                                coherence_time, rytov_variance)
from .ops.apertures import circle  # noqa: E402

isoplanaticAngle = isoplanatic_angle  # aotools camelCase names
coherenceTime = coherence_time


def _cpu_device():
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:  # pragma: no cover
        return None


def l_path(h_sat, zeta):
    """Spherical-Earth slant range from altitude and zenith angle [m]."""
    r_earth = 6.371009e6
    zeta = np.radians(zeta)
    b = -2 * r_earth * np.cos(np.pi - zeta)
    c = r_earth ** 2 - (r_earth + h_sat) ** 2
    r1 = (-b + np.sqrt(b ** 2 - 4 * c)) / 2
    r2 = (-b - np.sqrt(b ** 2 - 4 * c)) / 2
    return r1 if r1 >= 0 else r2


def calculate_wind_correction(h, theta_loop, Tloop):
    """Apparent per-layer wind induced by satellite slew over one loop."""
    return -np.array([
        np.sin(np.radians(theta_loop[0] / 3600)) * h / Tloop,
        np.sin(np.radians(theta_loop[1] / 3600)) * h / Tloop,
    ]).T


def _warn_colfac_huge_pupil(npxls, npxls_pup, _lane=128):
    """Loud performance warning for an explicitly pinned 'pallas_colfac'
    at huge pupils (VERDICT r4 #6).

    The colfac kernel's advantage (noise drawn in the P²-sized pupil
    basis instead of the N²-sized grid) inverts once the pupil itself is
    large: measured on v5e at 1024²/P=512 the fused kernel runs 23.6k r/s
    vs colfac's 6.4k (`scripts/probe_1024_tiles.py`, BASELINE.md round 4).
    SYNTH='auto' already picks fused there; this warns users who pinned
    the kernel name from the 256²/512² docs, where colfac is the record
    path. Returns True when the warning fired (for tests).
    """
    P = -(-int(npxls_pup) // _lane) * _lane  # round up to the lane tile
    if P >= 256:
        logger.warning(
            "SYNTH='pallas_colfac' was explicitly requested at a %d px "
            "pupil (grid %d²): at pupils >= 256 px the fused kernel "
            "('pallas_fused' — what SYNTH='auto' picks here) measures "
            "3-4x faster (1024²/512 px: 23.6k vs 6.4k r/s, "
            "scripts/probe_1024_tiles.py). Keeping the requested path.",
            int(npxls_pup), int(npxls))
        return True
    return False


class Fast:
    """FAST simulation object.

    Same user-facing contract as the reference: construct with a config
    dict or ``.py`` file path; construction precomputes the link budget and
    all power spectra; ``run()`` draws the Monte Carlo realizations and
    returns a :class:`FastResult`.
    """

    # monotonically unique per-instance id for device-table caches:
    # ``id()`` keys are unsafe (CPython recycles addresses of collected
    # objects, so a rebuilt sim list could silently hit a stale entry)
    _uid_counter = itertools.count()

    def __init__(self, params):
        self._uid = next(Fast._uid_counter)
        self.conf = conf.ConfigParser(params)
        self.params = self.conf.config

        self.Niter = self.params["NITER"]
        self.Nchunks = self.params["NCHUNKS"]
        self.seed = self.params["SEED"]
        self.temporal = self.params["TEMPORAL"]
        self.dt = self.params["DT"]

        if self.Niter % self.Nchunks != 0:
            raise Exception("NCHUNKS must divide NITER without remainder")
        self.Niter_per_chunk = self.Niter // self.Nchunks
        if (self.Niter_per_chunk % 2 != 0) and not self.temporal:
            raise Exception("NITER/NCHUNKS must be even number")

        self.dtype = jnp.dtype(self.params["DTYPE"])
        self._cpu = _cpu_device()

        self.init_logging()
        self.profile = StageTimer()
        self.timings = self.profile.timings

        # host + PSD stages run in float64 on CPU
        ctx = jax.default_device(self._cpu) if self._cpu else _nullcontext()
        with ctx:
            with self.profile.stage("init_geometry"):
                self.init_atmos()
                self.init_beam_params()
                self.init_frequency_grid()
            with self.profile.stage("init_masks"):
                self.init_ao_params()
            with self.profile.stage("init_pupils"):
                self.init_pupil_mask()
            with self.profile.stage("link_budget"):
                self.compute_link_budget()
            with self.profile.stage("powerspec"):
                self._compute_powerspec_host()

        # OUTSIDE the CPU ctx: the f32 colfac factor build dispatches a
        # jitted program on the *default device* — under the ctx that
        # would be a second-backend compile inside a live TPU-relay
        # process (deadlock risk, see synthesis.column_factors_device)
        with self.profile.stage("device_constants"):
            self._prepare_device_constants()

    # ------------------------------------------------------------------
    # initialisation pipeline
    # ------------------------------------------------------------------

    def init_logging(self):
        init_logging(self.params["LOGFILE"], self.params["LOGLEVEL"])

    def init_atmos(self):
        logger.info("Initialising atmosphere")
        p = self.params

        self.zenith_correction = self.calc_zenith_correction(p["ZENITH_ANGLE"])
        self.h = np.asarray(p["H_TURB"], dtype=float) * self.zenith_correction
        self.cn2 = np.asarray(p["CN2_TURB"], dtype=float) * self.zenith_correction

        if p["L_SAT"] is not None:
            self.L = p["L_SAT"]
        else:
            self.L = l_path(p["H_SAT"], p["ZENITH_ANGLE"])

        self.dtheta = p["DTHETA"]
        self.paa = np.sqrt(self.dtheta[0] ** 2 + self.dtheta[1] ** 2)

        wind_spd = np.asarray(p["WIND_SPD"], dtype=float)
        self.wind_dir = np.asarray(p["WIND_DIR"], dtype=float)
        if "AZIMUT_SAT" in p:
            self.wind_dir = (self.wind_dir - p["AZIMUT_SAT"]) % 360
        self.wind_vector = (wind_spd * np.array([
            np.cos(np.radians(self.wind_dir)),
            np.sin(np.radians(self.wind_dir)) / self.zenith_correction,
        ])).T
        if "ANISO_DL" in p:
            self.wind_correction = calculate_wind_correction(
                self.h, p["ANISO_DL"], p["TLOOP"])
            self.wind_vector = self.wind_vector + self.wind_correction
        self.wind_speed = np.sqrt(
            self.wind_vector[:, 0] ** 2 + self.wind_vector[:, 1] ** 2)

        cn2_zen = np.asarray(p["CN2_TURB"], dtype=float)
        h_zen = np.asarray(p["H_TURB"], dtype=float)
        self.r0 = atmosphere.cn2_to_r0(cn2_zen.sum(), lamda=500e-9)
        self.theta0 = atmosphere.isoplanatic_angle(cn2_zen, h_zen, lamda=500e-9)
        self.tau0 = atmosphere.coherence_time(cn2_zen, wind_spd, lamda=500e-9)
        self.rytov_variance = atmosphere.rytov_variance(cn2_zen, h_zen, lamda=500e-9)

        self.r0_los = atmosphere.cn2_to_r0(self.cn2.sum(), lamda=p["WVL"])
        self.theta0_los = atmosphere.isoplanatic_angle(self.cn2, self.h, lamda=p["WVL"])
        self.tau0_los = atmosphere.coherence_time(self.cn2, self.wind_speed, lamda=p["WVL"])
        self.rytov_variance_los = atmosphere.rytov_variance(self.cn2, self.h, lamda=p["WVL"])

        self.L0 = p["L0"]
        self.l0 = p["l0"]

    def init_beam_params(self):
        logger.info("Initialising beam parameters")
        p = self.params
        self.power = p["POWER"]
        self.W0 = p["W0"]
        self.F0 = np.inf  # collimated launch, as in the reference
        self.wvl = p["WVL"]
        self.k = 2 * np.pi / self.wvl
        self.D_ground = p["D_GROUND"]
        self.obsc_ground = p["OBSC_GROUND"]
        self.D_sat = p["D_SAT"]
        self.obsc_sat = p["OBSC_SAT"]

    def init_frequency_grid(self):
        """Resolve 'auto' grid rules and build the frequency grids.

        Mirrors the reference sizing logic exactly (``fast/fast.py:147-227``)
        so comparison runs land on identical grids.
        """
        logger.info("Initialising spatial frequencies")
        p = self.params

        if p["DX"] == "auto":
            dx_subap = p["DSUBAP"] / 2
            dx_r0 = self.r0_los / 2
            dx_pupil = self.D_ground / 10
            self.dx = float(np.min([dx_subap, dx_r0, dx_pupil]))
            if p["AO_MODE"] == "NOAO":
                self.dx = self.r0_los / 2
            logger.info("Auto set DX to %s", self.dx)
        else:
            self.dx = p["DX"]

        wind_spd_raw = np.asarray(p["WIND_SPD"], dtype=float)
        # no-wrap pixel bound of the reference's frozen-flow mode
        # (``fast/fast.py:181-185``); the AR temporal path does not grow
        # the grid with NITER, so it ignores this bound
        temporal_npxls = (int(wind_spd_raw.max() * p["DT"] * p["NITER"]
                              / self.dx / 2) if p["TEMPORAL"] else 0)
        self._temporal_synth = p.get("TEMPORAL_SYNTH", "auto")
        if self._temporal_synth == "auto":
            self._temporal_synth = "screens" if temporal_npxls <= 2048 \
                else "ar"
        if self._temporal_synth not in ("screens", "ar"):
            raise ValueError("TEMPORAL_SYNTH must be 'auto'|'screens'|'ar'")
        if p.get("TEMPORAL_NOISE", "uniform") not in ("uniform", "gauss"):
            raise ValueError("TEMPORAL_NOISE must be 'uniform'|'gauss'")
        if p.get("MC_NOISE", "gauss") not in ("gauss", "mixed"):
            raise ValueError("MC_NOISE must be 'gauss'|'mixed'")
        grow = p["TEMPORAL"] and self._temporal_synth == "screens"

        if p["NPXLS"] == "auto":
            nyq_aniso = np.pi / (self.h[-1] * self.paa / 206265.0)
            nyq_servo = np.pi / (max(self.wind_speed) * p["TLOOP"])
            nyq_fitting = np.pi / p["DSUBAP"] / 5
            nyq = np.min([nyq_aniso, nyq_servo, nyq_fitting])
            nyq_npxls = int(2 * np.ceil(2 * np.pi / (nyq * self.dx) / 2))
            ap_npxls = int(2 * np.ceil(p["D_GROUND"] / self.dx / 2)) + 2
            self.Npxls = int(np.max([nyq_npxls, ap_npxls,
                                     temporal_npxls if grow else 0]))
            logger.info("Auto set NPXLS to %s", self.Npxls)

            if p["AO_MODE"] == "NOAO" and not np.isinf(p["L0"]):
                L0_npxls = int(2 * np.ceil((p["L0"] * 2) / self.dx) / 2)
                if L0_npxls > self.Npxls:
                    logger.warning(
                        "L0 set with NOAO mode, low orders may be "
                        "undersampled. Recommended NPXLS: %s", L0_npxls)
        else:
            self.Npxls = p["NPXLS"]
            if grow and self.Npxls < temporal_npxls:
                logger.warning(
                    "NPXLS likely too small; recommended: %s",
                    temporal_npxls)

        if self.Npxls > 2048:
            logger.warning(
                "NPXLS is large (%s) and may cause very high memory usage",
                self.Npxls)

        self.Npxls_pup = int(np.ceil(self.D_ground / self.dx)) + 2

        self.freq = SpatialFrequencies(self.Npxls, self.dx)

        self.subharmonics = p["SUBHARM"]
        if self.temporal:
            # materialized meshes are only kept for modest sizes (they are
            # informational; the engine itself streams over the axes)
            self._temporal_materialized = (
                len(self.h) * self.Npxls * self.Niter <= 2 ** 25)
            self.freq.make_temporal_freqs(
                len(self.h), self.Npxls, self.Niter, self.wind_speed,
                self.wind_dir, self.dt,
                materialize=self._temporal_materialized)
            if self.subharmonics:
                logger.info("SUBHARM not used in TEMPORAL mode")
                self.subharmonics = False
        if self.subharmonics:
            self.freq.make_subharm_freqs()

    def init_ao_params(self):
        logger.info("Initialising AO parameters")
        p = self.params
        self.ao_mode = p["AO_MODE"]
        self.Dsubap = p["DSUBAP"]
        self.tloop = p["TLOOP"]
        self.texp = p["TEXP"]
        self.Zmax = p["ZMAX"]
        self.alias = p["ALIAS"]
        self.noise = p["NOISE"]
        self.modal = p["MODAL"]
        self.modal_mult = p["MODAL_MULT"]

        if self.ao_mode == "TT":
            self.Zmax = 3
            self.modal = True
            self.modal_mult = 1

        self.lf_mask = np.asarray(ao_spectra.mask_lf(
            self.freq.main, self.Dsubap, modal=self.modal,
            modal_mult=self.modal_mult, Zmax=self.Zmax, D=self.D_ground))
        self.hf_mask = 1 - self.lf_mask

        if self.subharmonics:
            self.lf_mask_subharm = np.asarray(ao_spectra.mask_lf(
                self.freq.subharm, self.Dsubap, modal=self.modal,
                modal_mult=self.modal_mult, Zmax=self.Zmax, D=self.D_ground))
        if self.temporal and self._temporal_materialized:
            self.lf_mask_temporal = np.asarray(ao_spectra.mask_lf(
                self.freq.temporal, self.Dsubap, modal=self.modal,
                modal_mult=self.modal_mult, Zmax=self.Zmax, D=self.D_ground))

    def init_pupil_mask(self):
        logger.info("Initialising pupil mask")
        p = self.params
        self.dx_sat = self.D_sat / 32  # fixed 32-px satellite pupil, as reference

        ptype = "axicon" if p["AXICON"] else "gauss"

        self.pupil = apertures.compute_pupil(
            self.Npxls, self.dx, self.D_ground, self.obsc_ground)
        self.pupil_sat = apertures.compute_pupil(
            32, self.dx_sat, self.D_sat, self.obsc_sat)

        self.pupil_mode, self.W0 = apertures.compute_gaussian_mode(
            self.pupil, self.dx, self.W0, D=self.D_ground,
            obsc=self.obsc_ground, ptype=ptype)
        self.pupil_mode_sat, self.W0_sat = apertures.compute_gaussian_mode(
            self.pupil_sat, self.dx_sat, "opt", ptype="gauss")

        self.pupil_filter = apertures.pupil_filter(self.pupil * self.pupil_mode)

        lo = (self.Npxls - self.Npxls_pup) // 2
        hi = (self.Npxls + self.Npxls_pup) // 2
        self.pup_crop = (lo, hi)
        self.pup_coords = np.array([np.arange(lo, hi), np.arange(lo, hi)])
        self.pupil = self.pupil[lo:hi, lo:hi]
        self.pupil_mode = self.pupil_mode[lo:hi, lo:hi]

        if self.temporal:
            # high-resolution pupil filter for the temporal log-amplitude PSD
            fx_max = self.freq.temporal.fx_axis.max()
            fy_max = self.freq.temporal.fy_axis.max()
            f_max = max(fx_max, fy_max)
            dx_req = np.pi / f_max
            n_req = int(2 * np.ceil(2 * np.pi / (self.freq.main.df * dx_req) / 2))

            pupil_temporal = apertures.compute_pupil(
                n_req, dx_req, self.D_ground, self.obsc_ground,
                Ny=2 * self.Npxls_pup)
            mode_temporal, _ = apertures.compute_gaussian_mode(
                pupil_temporal, dx_req, W0=self.W0, ptype="gauss")
            self.freq.make_logamp_freqs(
                Nx=n_req, dx=dx_req, Ny=2 * self.Npxls_pup, dy=self.dx)
            P = apertures.pupil_filter(pupil_temporal * mode_temporal)
            self.pupil_filter_temporal = PupilFilterSampler(
                P, self.freq.logamp.fx_axis, self.freq.logamp.fy_axis)

        return self.pupil

    # ------------------------------------------------------------------
    # analytic precompute
    # ------------------------------------------------------------------

    def compute_link_budget(self):
        """Analytic link budget in dB terms (``fast/fast.py:670-734``)."""
        logger.info("Computing analytical link budget")
        p = self.params

        if p["PROP_DIR"] == "up":
            D_t, D_r = self.D_ground, self.D_sat
            obsc_t = self.obsc_ground
            obsc_r = self.obsc_sat
            mode = self.pupil_mode_sat
            dx_r = self.dx_sat
            pupil_r = self.pupil_sat
            w0 = self.W0
        else:
            D_t, D_r = self.D_sat, self.D_ground
            obsc_t = self.obsc_sat
            obsc_r = self.obsc_ground
            mode = self.pupil_mode
            dx_r = self.dx
            pupil_r = self.pupil
            w0 = self.W0_sat

        lb = {}
        lb["power"] = 10 * np.log10(self.power / 1e-3)
        lb["free_space"] = 10 * np.log10((self.wvl / (4 * np.pi * self.L)) ** 2)

        # Klein & Degnan 1974 eq. 9: obscured-Gaussian transmitter gain
        alpha = D_t / (2 * w0)
        gamma = obsc_t / D_t
        g_t = 2 / alpha ** 2 * (
            np.exp(-alpha ** 2) - np.exp(-gamma ** 2 * alpha ** 2)) ** 2
        lb["transmitter_gain"] = 10 * np.log10(
            (np.pi * D_t ** 2) * 4 * np.pi / self.wvl ** 2 * g_t)

        A = np.pi * ((D_r / 2) ** 2 - (obsc_r / 2) ** 2)
        lb["receiver_gain"] = 10 * np.log10(4 * np.pi * A / self.wvl ** 2)

        lb["transmission_loss"] = 10 * np.log10(p["TRANSMISSION"])

        lb["smf_coupling"] = 10 * np.log10(
            ((pupil_r * mode).sum() * dx_r) ** 2 / (mode ** 2).sum())

        self.link_budget = lb
        self.diffraction_limit = 10 ** (sum(lb.values()) / 10) / 1e3  # W
        return lb

    def _psd_args(self, grid, mask):
        """Shared (traced, static) argument tuple for the jitted assembly."""
        f64 = np.float64
        args = (np.asarray(grid.fx, f64), np.asarray(grid.fy, f64),
                np.asarray(grid.fabs, f64), np.asarray(grid.fx_axis, f64),
                np.asarray(grid.fy_axis, f64))
        rest = (np.asarray(self.cn2, f64), np.asarray(self.h, f64),
                np.asarray(self.wind_vector, f64),
                np.asarray(self.dtheta, f64), f64(self.noise),
                f64(self.Dsubap if self.Dsubap is not None else 0.0),
                f64(self.texp), f64(self.tloop), f64(self.wvl),
                f64(self.D_ground), f64(self.L0), f64(self.l0))
        x_max = (float(np.max(grid.fabs) * self.D_ground / 2)
                 if self.ao_mode == "LGSAO" else None)
        statics = dict(mode=self.ao_mode, alias_on=bool(self.alias),
                       noise_on=bool(self.noise > 0), x_max=x_max)
        return args, (np.asarray(mask, f64),), rest, statics

    def compute_powerspec(self):
        """Assemble all residual phase / log-amplitude power spectra.

        Same term-by-term physics as the reference (``fast/fast.py:445-587``)
        in float64, but as one jitted program per grid shape
        (:mod:`fast_tpu.psd`) instead of ~100 eager dispatches — warm
        re-initialisation at a known shape costs milliseconds. Ends by
        rebuilding the device tables (bumping ``_tables_version``) so
        cached run programs never embed spectra from a previous call.
        """
        self._compute_powerspec_host()
        with self.profile.stage("device_constants"):
            self._prepare_device_constants()

    def _compute_powerspec_host(self):
        """The float64 host/PSD assembly (no device-constant rebuild).

        ``__init__`` calls this inside its ``jax.default_device(cpu)``
        block and runs :meth:`_prepare_device_constants` after leaving
        it — the f32 colfac factor build inside the latter must dispatch
        on the real default device, never the CPU backend of a live
        TPU-relay process (CLAUDE.md: second-backend compile deadlock).
        """
        logger.info("Computing (residual) phase power spectra")
        freq = self.freq

        grid_args, (lf_mask,), rest, statics = self._psd_args(
            freq.main, self.lf_mask)
        out = psd.assemble_main(
            *grid_args, np.asarray(freq.main.f, np.float64), lf_mask,
            np.asarray(self.hf_mask, np.float64),
            np.asarray(self.pupil_filter, np.float64), *rest, **statics)

        self.turb_powerspec = out["turb_powerspec"]
        self.G_ao = out["G_ao"]
        self.alias_powerspec = np.array(out["alias_powerspec"]) \
            if statics["alias_on"] and self.ao_mode != "NOAO" else 0.0
        self.noise_powerspec = np.array(out["noise_powerspec"]) \
            if statics["noise_on"] and self.ao_mode != "NOAO" else 0.0
        self.powerspec_per_layer = np.array(out["powerspec_per_layer"])
        self.powerspec = np.array(out["powerspec"])
        self.aniso_servo_error = float(out["aniso_servo_error"])
        self.alias_error = float(out["alias_error"])
        self.noise_error = float(out["noise_error"])
        self.fitting_error = float(out["fitting_error"])
        self.phs_var = float(out["phs_var"])
        self.phs_var_weights = np.array(out["phs_var_weights"])
        self.logamp_powerspec = np.array(out["logamp_powerspec"])
        self.logamp_var = float(out["logamp_var"])

        if self.subharmonics:
            logger.info("Computing subharmonics power spectra")
            grid_args, (lf_mask_sh,), rest, statics = self._psd_args(
                freq.subharm, self.lf_mask_subharm)
            out_sh = psd.assemble_subharm(
                *grid_args, np.asarray(freq.subharm.df, np.float64),
                lf_mask_sh, *rest, **statics)
            self.powerspec_subharm_per_layer = np.asarray(
                out_sh["powerspec_subharm_per_layer"])
            self.powerspec_subharm = np.array(out_sh["powerspec_subharm"])
            self.phs_var_subharm = np.array(out_sh["phs_var_subharm"])
            self.phs_var_weights_sh = np.asarray(
                out_sh["phs_var_weights_sh"])
        else:
            self.powerspec_subharm = None
            self.phs_var_subharm = None
            self.phs_var_weights_sh = None

        self.temporal_powerspec = None
        self.temporal_logamp_powerspec = None

        if self.temporal:
            logger.info("Computing temporal power spectra")
            dts = np.arange(1, self.Niter_per_chunk + 1) * self.dt
            self.pixel_shifts = dts * self.wind_vector[..., np.newaxis] / self.dx

            # streamed per-temporal-bin assembly: O(Ny * block) memory
            # instead of the reference's O(nlayers * Ny * NITER)
            self.temporal_logamp_powerspec = temporal_logamp_powerspec(
                freq.temporal.fx_axis, freq.temporal.fy_axis, self.h,
                self.cn2, self.wvl, self.pupil_filter_temporal,
                float(freq.main.dfy), L0=self.L0, l0=self.l0)

        # failure detection (SURVEY.md §5.3): a corrupted configuration
        # (NaN/negative PSD, bad masks) fails loudly here instead of
        # flowing silently into the Monte Carlo program
        self.validate()

    # ------------------------------------------------------------------
    # Monte Carlo run
    # ------------------------------------------------------------------

    def _prepare_device_constants(self):
        """Cast static fields for the hot path (float32 by default)."""
        # static fields stay host-side numpy: they embed as compile-time
        # constants in the jitted programs (no device round-trips at trace)
        # bump the table version: downstream device-side caches (the scan
        # runner's pinned factor stacks, packed colfac tables) key on this
        # so regenerated tables are never silently reused stale
        self._tables_version = getattr(self, "_tables_version", 0) + 1
        dt = np.dtype(str(self.dtype))
        self._sqrt_psd = np.sqrt(self.powerspec).astype(dt)
        self._pm = (self.pupil * self.pupil_mode).astype(dt)
        self._norm = float((self.pupil * self.pupil_mode).sum() * self.dx ** 2)
        synth = self.params["SYNTH"]
        if synth == "auto":
            # f64 verification runs keep the direct FFT path. On TPU both
            # fused Pallas kernels are distribution-identical; the pick is
            # measured (interleaved best-of-5 on v5e, BASELINE.md round 4):
            # at 256^2 they are equal (fused 927.6k vs colfac 922.9k r/s)
            # and fused needs no factor build; at N>=512 with a P=128
            # pupil the colfac basis wins big (512^2: 537k vs 295k;
            # 1024^2: 147k vs 51k — the fused path colors all N^2 grid
            # points + pays the 4N^3 mixing dot, colfac only 8P^2N), and
            # at huge pupils (P>=256) fused wins every measured class
            # (scripts/probe_1024_tiles.py; 1024^2/P=512: 22.2k vs 6.4k).
            # colfac's cost is a one-time factor build at init
            # (disk-cached, keyed on the PSD/DFT table content).
            # Elsewhere (CPU tests) use the column-factored covariance
            # synthesis unless its (N, Npup, Npup) factor tensor would
            # exceed ~256 MB (then factor-free matmul).
            if dt != np.float32:
                synth = "fft"
            elif not self.temporal and jax.default_backend() == "tpu":
                from .ops.pallas_synth import _LANE, _round_up
                if (self.Npxls >= 512
                        and _round_up(self.Npxls_pup, _LANE) <= 128):
                    synth = "pallas_colfac"
                else:
                    synth = "pallas_fused"
            elif (not self.temporal
                  and self.Npxls * self.Npxls_pup ** 2 * 8 > 2.56e8):
                synth = "matmul"
            else:
                synth = "colfac"

        # memory guard: the per-chunk noise tensor is the peak allocation
        # (reference used NCHUNKS the same way, ``fast/fast.py:87-93``).
        # The fused Pallas kernels never materialise it — skip the guard.
        if not self.temporal and not synth.startswith("pallas"):
            itemsize = 8 if dt == np.float32 else 16  # complex
            ncols = self.Npxls_pup if synth == "colfac" else self.Npxls
            chunk_bytes = (self.Niter_per_chunk // 2) * self.Npxls * ncols \
                * itemsize
            if chunk_bytes > 8e9:
                logger.warning(
                    "per-chunk noise tensor is %.1f GB; increase NCHUNKS "
                    "to bound device memory", chunk_bytes / 1e9)
        if self.params["SYNTH"] == "pallas_colfac":
            _warn_colfac_huge_pupil(self.Npxls, self.Npxls_pup)
        self._synth = synth
        if synth in ("matmul", "pallas", "pallas_fused", "pallas_colfac",
                     "colfac") and not self.temporal:
            # (temporal mode samples per-layer screens; the pruned/factored
            # paths are only used for iid draws)
            cdt = np.complex64 if dt == np.float32 else np.complex128
            self._W_pruned = synthesis.pruned_ift2_matrix(
                self.Npxls, *self.pup_crop, dtype=cdt)
            if synth in ("colfac", "pallas_colfac"):
                # the factor stack is a pure function of (PSD, W, df):
                # big rebuilds (~24 s host BLAS at 1024²) are cached on
                # disk keyed by the input tables' content
                from .utils import diskcache
                self._L_colfac = None
                sqrt_psd64 = np.sqrt(self.powerspec)
                df_m = float(self.freq.main.df)
                if dt == np.float32 and jax.default_backend() == "tpu":
                    # f32 factor build on the MXU (~30x the host f64 path);
                    # ill-conditioned columns fall back below. Large
                    # factor stacks build on host BLAS f32 instead — the
                    # accelerator round-trip is relay-transfer-bound
                    # (see column_factors_device)
                    key32 = diskcache.table_key(
                        "colfac-f32",
                        (self.powerspec, np.asarray(self._W_pruned)),
                        (df_m, 3e-6))  # jitter of column_factors_device
                    L = diskcache.load(key32)
                    if L is None:
                        npup_w = self._W_pruned.shape[0]
                        big = self.Npxls * npup_w * npup_w * 8 > 128e6
                        L = synthesis.column_factors_device(
                            sqrt_psd64, df_m, self._W_pruned, host=big)
                        if np.isfinite(L).all():
                            diskcache.save(key32, L)
                    if np.isfinite(L).all():
                        self._L_colfac = L
                    else:
                        logger.info("f32 device factorisation hit an "
                                    "ill-conditioned column; using the "
                                    "host float64 path")
                if self._L_colfac is None:
                    W64 = synthesis.pruned_ift2_matrix(
                        self.Npxls, *self.pup_crop, dtype=np.complex128)
                    key64 = diskcache.table_key(
                        "colfac-f64", (self.powerspec, W64),
                        (df_m, str(cdt), 1e-10))  # column_factors jitter
                    L = diskcache.load(key64)
                    if L is None:
                        L = synthesis.column_factors(
                            sqrt_psd64, df_m, W64).astype(cdt)
                        diskcache.save(key64, L)
                    self._L_colfac = L
        if self.subharmonics:
            self._sqrt_psd_sh = np.sqrt(self.powerspec_subharm).astype(dt)
            self._sh_modes = synthesis.make_subharm_modes(
                self.freq.subharm.fx, self.freq.subharm.fy, self.Npxls,
                self.dx, dtype=dt)
            self._sh_df = self.freq.subharm.df.astype(dt)
        if self.temporal:
            self._sqrt_psd_layers = np.sqrt(self.powerspec_per_layer).astype(dt)
            # AR temporal path: mode-survival factor per layer. 'auto'
            # keeps pure frozen flow (alpha=1) when the series is shorter
            # than one grid wrap, else decorrelates modes over one wrap
            # time so the fixed grid never repeats visibly.
            alpha_cfg = self.params.get("TEMPORAL_ALPHA", "auto")
            wrap_steps = np.where(
                self.wind_speed > 0,
                self.Npxls * self.dx / (np.maximum(self.wind_speed, 1e-30)
                                        * self.dt), np.inf)
            if alpha_cfg == "auto":
                alpha = np.where(self.Niter <= wrap_steps, 1.0,
                                 np.exp(-1.0 / wrap_steps))
            else:
                alpha = np.full(len(self.h), float(alpha_cfg))
            self._ar_alpha = alpha.astype(dt)

    def set_seed(self, seed):
        self.seed = seed

    def _chunk_body(self, pin_tables=True):
        """The per-chunk Monte Carlo program (iid draws), unjitted.

        Shared by the jitted single-chunk path, the all-chunks ``lax.scan``
        path and the sharded runner. ``pin_tables=False`` leaves
        ``chunk.tables`` as host arrays for callers that apply their own
        device placement (the mesh runner).
        """
        B = self.Niter_per_chunk
        df = float(self.freq.main.df)
        dx = self.dx
        crop = self.pup_crop
        coherent = bool(self.params["COHERENT"])
        subharm = self.subharmonics
        norm = self._norm
        synth = self._synth
        precision = self.params["PRECISION"]
        mc_noise = self.params.get("MC_NOISE", "gauss")
        W = getattr(self, "_W_pruned", None)
        L = getattr(self, "_L_colfac", None)
        pm = self._pm
        sqrt_psd = self._sqrt_psd
        colfac_args = ()
        if synth == "pallas_colfac":
            # pack the factor tables host-side (cached on the sim, shared
            # with the scan runner) and ship them as TRACED ARGUMENTS,
            # device-resident across calls — embedding them as trace-time
            # constants works at 256² (~16 MB) but at 1024²/P=512 the
            # packed stack approaches a GB and the constant-laden MLIR
            # chokes the remote compile service
            from .ops import pallas_synth
            Lnp = np.asarray(L)
            ncols, npup_, _ = Lnp.shape
            layout = pallas_synth.colfac_layout(None, npup_, precision)
            key_pk = (precision, mc_noise, layout,
                      getattr(self, "_tables_version", 0))
            cache = getattr(self, "_colfac_packed", None)
            if cache is None or cache[0] != key_pk:
                pack = (pallas_synth.colfac_pack_tables_merged
                        if layout == "merged"
                        else pallas_synth.colfac_pack_tables)
                self._colfac_packed = (key_pk, pack(
                    Lnp, np.asarray(W), precision, noise=mc_noise))
            if layout == "merged":
                b_tile, m_tile = pallas_synth.colfac_tile_select_merged(
                    B // 2, ncols, npup_, precision)
            else:
                b_tile, m_tile = pallas_synth.colfac_tile_select(
                    B // 2, ncols, npup_, precision)
            if pin_tables:
                devc = getattr(self, "_colfac_packed_dev", None)
                if devc is None or devc[0] != key_pk:
                    self._colfac_packed_dev = (key_pk, tuple(
                        jax.device_put(t) for t in self._colfac_packed[1]))
                colfac_args = self._colfac_packed_dev[1]
            else:
                # host tables: the caller pins with its own sharding (the
                # mesh runner replicates them itself — a default-device
                # pin here would be a dead second HBM copy of a stack
                # that reaches ~GB at 1024^2)
                colfac_args = self._colfac_packed[1]
        if subharm:
            sqrt_psd_sh = self._sqrt_psd_sh
            sh_modes = self._sh_modes
            sh_df = self._sh_df

        def chunk(key, chi, *tables):
            kmain, ksub = jax.random.split(key)
            if synth in ("pallas_fused", "pallas_colfac"):
                from .ops import pallas_synth
                seed = jax.random.bits(kmain, (), "uint32").astype(jnp.int32)
                sh = None
                if subharm:
                    # low-order modes synthesized with stock XLA (27-mode
                    # einsum, cheap) and added on-chip before the fused
                    # detector
                    sh = pallas_synth.pad_subharm_screens(
                        synthesis.synthesize_subharm_complex(
                            ksub, sqrt_psd_sh, sh_df, sh_modes, B // 2,
                            crop=crop), pm.shape[0])
                if synth == "pallas_colfac":
                    if not tables:
                        # closing over the device arrays instead would
                        # silently re-embed the (possibly GB-scale)
                        # stacks as trace-time constants — fail loudly
                        raise ValueError(
                            "pallas_colfac chunk requires the packed "
                            "factor tables as call arguments "
                            "(chunk.tables)")
                    l2_t, w2_t = tables
                    c = pallas_synth.fused_colfac_detect_packed(
                        seed, l2_t, w2_t, pm, B // 2, b_tile, m_tile,
                        precision=precision, subharm_screens=sh,
                        noise=mc_noise)
                else:
                    c = pallas_synth.fused_synthesis_detect(
                        seed, sqrt_psd, df, B // 2, W, pm,
                        precision=precision, subharm_screens=sh,
                        noise=mc_noise)
                pc = jax.lax.complex(c[:, 0], c[:, 1]) * (dx ** 2 / norm)
                out = jnp.exp(chi).astype(jnp.float32) * pc
                if not coherent:
                    return jnp.abs(out) ** 2
                return jnp.stack([out.real, out.imag], axis=-1)
            if synth == "pallas":
                from .ops.pallas_synth import fused_synthesis
                seed = jax.random.bits(kmain, (), "uint32").astype(jnp.int32)
                phs = fused_synthesis(seed, sqrt_psd, df, B // 2, W,
                                      precision=precision)
                if subharm:
                    phs = phs + synthesis.double_screens(
                        synthesis.synthesize_subharm_complex(
                            ksub, sqrt_psd_sh, sh_df, sh_modes, B // 2,
                            crop=crop))
            else:
                if synth == "colfac":
                    scr = synthesis.synthesize_screens_colfac(
                        kmain, L, W, B // 2, precision=precision)
                elif synth == "matmul":
                    scr = synthesis.synthesize_screens_pruned(
                        kmain, sqrt_psd, df, B // 2, W, precision=precision)
                else:
                    scr = synthesis.synthesize_screens_complex(
                        kmain, sqrt_psd, df, B // 2, crop=crop)
                if subharm:
                    scr = scr + synthesis.synthesize_subharm_complex(
                        ksub, sqrt_psd_sh, sh_df, sh_modes, B // 2, crop=crop)
                phs = synthesis.double_screens(scr)
            pc = synthesis.detector_coupling(phs, pm, dx, norm)
            out = jnp.exp(chi).astype(pc.real.dtype) * pc
            if not coherent:
                return jnp.abs(out) ** 2
            # complex arrays at program boundaries are not supported by all
            # TPU runtimes: ship (real, imag) floats, recombine on host
            return jnp.stack([out.real, out.imag], axis=-1)

        # device-resident packed tables the caller must thread through as
        # traced arguments (empty for every other synthesis path)
        chunk.tables = colfac_args
        return chunk

    def _cached_run_fn(self, kind, build, extra=()):
        """Single-slot cache for the built whole-run callables.

        Rebuilding per call re-traces the pallas-branch jit closure and
        reconstructs the host table pytrees (tens of MB of np.exp/stack
        work) just to throw them away on the `_device_pin` hit — a warm
        ``run()`` should pay neither. Keyed on the tables version (+
        path extras) so regenerated tables rebuild.
        """
        key = (kind,) + tuple(extra) + (getattr(self, "_tables_version", 0),)
        cached = getattr(self, "_run_fn_cache", None)
        if cached is None or cached[0] != key:
            self._run_fn_cache = (key, build())
        return self._run_fn_cache[1]

    def _run_all_fn(self):
        from .ops import pallas_synth
        layout = (pallas_synth.colfac_layout(
                      None, self.Npxls_pup, self.params["PRECISION"])
                  if self._synth == "pallas_colfac" else None)
        return self._cached_run_fn("iid", self._build_run_all_fn,
                                   (self._synth, layout))

    def _build_run_all_fn(self):
        """One jitted program for the whole run: ``lax.scan`` over chunks.

        A single device dispatch regardless of NCHUNKS — chunking bounds
        peak memory (the reference used it the same way,
        ``fast/fast.py:87-93``) while XLA pipelines the chunks. For the
        fft/matmul/colfac paths the per-config constants are *traced
        arguments* of a module-level program, so instances sharing shapes
        (sweeps, re-inits) share one compilation; complex constants ship
        as stacked (real, imag) floats because complex arrays cannot cross
        program boundaries on all TPU runtimes.
        """
        synth = self._synth
        if synth in ("pallas", "pallas_fused", "pallas_colfac"):
            # small per-config tables (sqrt-PSD, pupil) embed as
            # trace-time constants; the colfac factor stacks ship as
            # traced arguments (device-resident, `chunk.tables`) so the
            # program stays compile-service-sized at any grid
            chunk = self._chunk_body()
            tables = chunk.tables
            nchunks = self.Nchunks
            B = self.Niter_per_chunk
            niter = self.Niter
            logamp_var = float(self.logamp_var)
            dtype = self.dtype

            @jax.jit
            def run_all(key_logamp, key_mc, *tabs):
                chi = synthesis.draw_logamp(key_logamp, niter, logamp_var,
                                            dtype=dtype)
                keys = jax.vmap(lambda i: jax.random.fold_in(key_mc, i))(
                    jnp.arange(nchunks))
                _, outs = jax.lax.scan(
                    lambda c, inp: (c, chunk(inp[0], inp[1], *tabs)), 0,
                    (keys, chi.reshape(nchunks, B)))
                return outs.reshape((nchunks * B,) + outs.shape[2:])

            if tables:
                return lambda key_logamp, key_mc: run_all(
                    key_logamp, key_mc, *tables)
            return run_all

        dt = np.dtype(str(self.dtype))
        C = dict(
            sqrt_psd=self._sqrt_psd, pm=self._pm,
            df=dt.type(self.freq.main.df), dx=dt.type(self.dx),
            norm=dt.type(self._norm), logamp_var=dt.type(self.logamp_var))
        if synth in ("matmul", "colfac"):
            W = np.asarray(self._W_pruned)
            C["w2"] = np.stack([W.real, W.imag]).astype(dt)
        if synth == "colfac":
            L = np.asarray(self._L_colfac)
            C["l2"] = np.stack([L.real, L.imag]).astype(dt)
        if self.subharmonics:
            C["sqrt_psd_sh"] = self._sqrt_psd_sh
            M = np.asarray(self._sh_modes)
            C["sh_modes2"] = np.stack([M.real, M.imag]).astype(dt)
            C["sh_df"] = np.asarray(self._sh_df, dt)
        C = self._device_pin("_iid_C_dev", C, (synth,))
        import functools as _ft
        return _ft.partial(
            _run_all_iid, C=C, synth=synth, nchunks=self.Nchunks,
            B=self.Niter_per_chunk, coherent=bool(self.params["COHERENT"]),
            subharm=bool(self.subharmonics), crop=self.pup_crop,
            precision=self.params["PRECISION"])

    def _device_pin(self, name, C, extra_key=()):
        """Pin a host table pytree on device, cached across calls.

        The module-level run programs take their per-config tables as a
        traced pytree argument; passing host numpy re-ships the (tens of
        MB) tables through the relay on EVERY call — the committed AR
        trace showed ~65% device idle from exactly this. Keyed on
        ``_tables_version`` (+ path-specific extras) so regenerated
        tables repin.
        """
        ver = (getattr(self, "_tables_version", 0),) + tuple(extra_key)
        cached = getattr(self, name, None)
        if cached is None or cached[0] != ver:
            setattr(self, name,
                    (ver, {k: jax.device_put(v) for k, v in C.items()}))
        return getattr(self, name)[1]

    @staticmethod
    def _combine_complex(arr, coherent):
        """Recombine (…, 2) real/imag float output into complex on host."""
        arr = np.asarray(arr)
        if coherent:
            return arr[..., 0] + 1j * arr[..., 1]
        return arr

    @staticmethod
    @jax.jit
    def _mc_stats_coherent(arr):
        """Device-side (mean re, mean im, scint index, n nonfinite).

        Two tiny reduction passes over the run output on device, so
        ``run()`` can log its summary and enforce the finite guard by
        fetching four scalars instead of the multi-million-sample series
        (a 2²⁴ fetch costs ~21 s through the axon relay)."""
        re, im = arr[..., 0], arr[..., 1]
        mr, mi = re.mean(), im.mean()
        var = ((re - mr) ** 2 + (im - mi) ** 2).mean()
        nbad = jnp.sum(~jnp.isfinite(arr))
        return mr, mi, var / (mr * mr + mi * mi), nbad

    @staticmethod
    @jax.jit
    def _mc_stats_real(arr):
        """Real-detector twin of :meth:`_mc_stats_coherent`."""
        m = arr.mean()
        var = ((arr - m) ** 2).mean()
        nbad = jnp.sum(~jnp.isfinite(arr))
        return m, var / (m * m), nbad

    def _run_all_fn_temporal(self):
        return self._cached_run_fn("temporal_screens",
                                   self._build_run_all_fn_temporal)

    def _build_run_all_fn_temporal(self):
        """One jitted frozen-flow program: ``lax.scan`` over chunks.

        The per-chunk trajectory is affine in the chunk index
        (``base + i * per-chunk shift``), so the whole time series runs as
        a single device dispatch; the reference advanced coordinates
        host-side between chunks (``fast/fast.py:635``).
        """
        dt = np.dtype(str(self.dtype))
        # (nlayers, 2, T, Npup) chunk-0 trajectory + per-chunk advance
        base0 = (self.pup_coords[np.newaxis, :, np.newaxis, :].astype(float)
                 + self.pixel_shifts[:, :, :, np.newaxis]).astype(dt)
        shift_chunk = self.pixel_shifts[:, :, -1].astype(dt)  # (nl, 2)
        C = dict(
            sqrt_psd_layers=self._sqrt_psd_layers, pm=self._pm,
            base0=base0, shift_chunk=shift_chunk,
            temporal_ps=np.asarray(self.temporal_logamp_powerspec, dt),
            df=dt.type(self.freq.main.df), dx=dt.type(self.dx),
            norm=dt.type(self._norm), logamp_var=dt.type(self.logamp_var))
        C = self._device_pin("_temporal_screens_C_dev", C)
        import functools as _ft
        return _ft.partial(
            _run_all_temporal_screens, C=C, nchunks=self.Nchunks,
            B=self.Niter_per_chunk, coherent=bool(self.params["COHERENT"]),
            temporal_chi=True)

    def _run_all_fn_temporal_ar(self):
        return self._cached_run_fn("temporal_ar",
                                   self._build_run_all_fn_temporal_ar)

    def _build_run_all_fn_temporal_ar(self):
        """One jitted AR(1)-in-Fourier frozen-flow program on the fixed grid.

        Outer ``lax.scan`` over chunks, inner scan over steps (cheap
        per-step phasor multiplies), then one *batched* centered ifft2 and
        detector reduction per chunk — so the FFTs amortize like the iid
        path while memory stays at one (B, N, N) block regardless of NITER
        (the reference's grid grows as ``v dt NITER / dx / 2``,
        ``fast/fast.py:181-185``).
        """
        dt_np = np.dtype(str(self.dtype))
        sqrt_psd_df = (self._sqrt_psd_layers
                       * np.float64(self.freq.main.df)).astype(dt_np)
        v = np.asarray(self.wind_vector, np.float64)  # (nlayers, 2)
        fxm = np.asarray(self.freq.main.fx, np.float64)
        fym = np.asarray(self.freq.main.fy, np.float64)
        # wrap the per-step translation phase into (-pi, pi] in f64 before
        # the f32 cast: the raw phase grows with |kappa| and would lose the
        # fractional cycle that is all that matters
        phase = (fxm[None] * v[:, 0, None, None]
                 + fym[None] * v[:, 1, None, None]) * float(self.dt)
        phase = np.angle(np.exp(1j * phase))
        C = dict(
            sqrt_psd_df=sqrt_psd_df, step_phase=phase.astype(dt_np),
            alpha=self._ar_alpha, pm=self._pm,
            temporal_ps=np.asarray(self.temporal_logamp_powerspec, dt_np),
            dx=dt_np.type(self.dx), norm=dt_np.type(self._norm),
            logamp_var=dt_np.type(self.logamp_var))
        stream = False
        if dt_np == np.float32 and self.params["SYNTH"] != "fft":
            # per-step pruned-DFT + detector fused into the scan (MXU
            # matmuls, no (B, N, N) block in memory); SYNTH='fft' or f64
            # keeps the batched exact-ifft2 path for verification runs
            W = synthesis.pruned_ift2_matrix(
                self.Npxls, *self.pup_crop, dtype=np.complex64)
            C["w2"] = np.stack([W.real, W.imag]).astype(dt_np)
            # VMEM feasibility of the fused kernel, sized by the same
            # helper `_ar_flow_call` budgets with (worst-case unroll cap,
            # including the boiling noise table) so the stream-vs-resident
            # decision can never diverge from the kernel's own need
            from .ops import pallas_synth
            N = self.Npxls
            P = -(-self.Npxls_pup // 128) * 128
            vmem_need = pallas_synth.ar_vmem_need(
                len(self.h), N, P,
                boiling=bool(np.any(np.asarray(self._ar_alpha) < 1.0)))
            stream = False
            if jax.default_backend() == "tpu":
                # VMEM-resident fused kernel when the whole state fits;
                # otherwise the HBM-streamed variant (layer blocks through
                # VMEM per time-chunk) — both keep the per-step HBM
                # output at two floats
                stream = vmem_need >= 100e6
                if stream:
                    logger.info(
                        "AR state (%d layers x %d^2) needs ~%.0f MB VMEM "
                        "— using the HBM-streamed kernel", len(self.h), N,
                        vmem_need / 1e6)
                ph = np.exp(1j * phase) * self._ar_alpha[:, None, None]
                C["ph2"] = np.stack([ph.real, ph.imag]).astype(dt_np)
                sqrt1ma = np.sqrt(np.maximum(
                    0.0, 1.0 - np.float64(self._ar_alpha) ** 2))
                if np.any(self._ar_alpha < 1.0):
                    C["ns"] = (sqrt1ma[:, None, None]
                               * np.float64(sqrt_psd_df)).astype(dt_np)
        # pin the table pytree on device across calls: C is ~40 MB at the
        # flagship 256² config and re-shipping it per call leaves the
        # device ~65% idle (committed AR trace, BASELINE.md round 4) —
        # same defect/fix as the scan runners' device-resident caches
        C = self._device_pin("_temporal_C_dev", C, (stream,))
        import functools as _ft
        return _ft.partial(
            _run_all_temporal_ar, C=C, nchunks=self.Nchunks,
            B=self.Niter_per_chunk, coherent=bool(self.params["COHERENT"]),
            crop=self.pup_crop, boiling=bool(np.any(self._ar_alpha < 1.0)),
            temporal_chi=True, precision=self.params["PRECISION"],
            noise=self.params["TEMPORAL_NOISE"],
            stream=("ph2" in C and stream))

    def run(self, progress=False):
        """Draw all Monte Carlo realizations; returns :class:`FastResult`.

        ``progress=True`` dispatches chunk-by-chunk with a tqdm bar (the
        reference's UX, ``fast/fast.py:130``) at the cost of one device
        dispatch per chunk; the default runs the whole loop as a single
        device program.
        """
        with self.profile.stage("mc_run"):
            if progress and self.temporal:
                return self._run_progress_temporal()
            if progress and not self.temporal:
                return self._run_progress()
            return self._run()

    def _run_progress(self):
        from tqdm import tqdm

        key = make_key(self.seed, impl=self.params["RNG"])
        key_logamp, _, key_mc = jax.random.split(key, 3)
        self._logamp_key = key_logamp
        ctx = jax.default_device(self._cpu) if self._cpu else _nullcontext()
        with ctx:
            self._logamp_cache = np.asarray(synthesis.draw_logamp(
                key_logamp, self.Niter, self.logamp_var, dtype=self.dtype))
        chunk = self._chunk_body()
        tables = chunk.tables
        chunk = jax.jit(chunk)
        B = self.Niter_per_chunk
        chi = jnp.asarray(self.logamp)
        outs = []
        for i in tqdm(range(self.Nchunks)):
            outs.append(chunk(jax.random.fold_in(key_mc, i),
                              chi[i * B:(i + 1) * B], *tables))
        coherent = bool(self.params["COHERENT"])
        I = np.concatenate([self._combine_complex(o, coherent) for o in outs])
        if not np.isfinite(I).all():
            raise FloatingPointError(
                "Monte Carlo run produced non-finite iterates "
                f"({np.count_nonzero(~np.isfinite(I))} over {I.shape[0]})")
        self.result = FastResult(I, self.diffraction_limit)
        logger.info(self.result)
        return self.result

    def _run_progress_temporal(self):
        """Chunk-by-chunk temporal dispatch with a tqdm bar (reference UX,
        ``fast/fast.py:130``): one device dispatch per chunk, the AR
        Fourier state (or the frozen-flow screen set) carried across
        dispatches — complex state crosses the axon boundary as stacked
        (re, im) floats. Statistically equivalent to the single-program
        path (independent per-chunk noise keys; same per-chunk kernels);
        not bit-identical to it."""
        from tqdm import tqdm

        key = make_key(self.seed, impl=self.params["RNG"])
        key_logamp, key_scr, _ = jax.random.split(key, 3)
        self._logamp_key = key_logamp
        self._logamp_cache = None
        coherent = bool(self.params["COHERENT"])
        ar = self._temporal_synth == "ar"
        # reuse the cached single-program builder's device-pinned table
        # pytree and static kwargs (functools.partial keywords)
        kw = dict((self._run_all_fn_temporal_ar() if ar
                   else self._run_all_fn_temporal()).keywords)
        C, B = kw["C"], kw["B"]
        chi_all = jax.jit(synthesis.draw_logamp, static_argnames=(
            "niter", "dtype"))(
            key_logamp, self.Niter, C["logamp_var"],
            temporal_powerspec=C["temporal_ps"], dtype=self.dtype)
        outs = []
        if ar:
            kinit, knoise = jax.random.split(key_scr)
            a2 = _temporal_ar_init(kinit, C)
            for i in tqdm(range(self.Nchunks)):
                out, a2 = _chunk_temporal_ar(
                    a2, jax.random.fold_in(knoise, i),
                    chi_all[i * B:(i + 1) * B], C, B=B,
                    coherent=coherent, crop=kw["crop"],
                    boiling=kw["boiling"], precision=kw["precision"],
                    noise=kw["noise"], stream=kw["stream"])
                outs.append(out)
        else:
            screens = jax.jit(synthesis.synthesize_layer_screens)(
                key_scr, C["sqrt_psd_layers"], C["df"])
            for i in tqdm(range(self.Nchunks)):
                outs.append(_chunk_temporal_screens(
                    i, chi_all[i * B:(i + 1) * B], screens, C,
                    coherent=coherent))
        I = np.concatenate([self._combine_complex(o, coherent)
                            for o in outs])
        if not np.isfinite(I).all():
            raise FloatingPointError(
                "Monte Carlo run produced non-finite iterates "
                f"({np.count_nonzero(~np.isfinite(I))} over {I.shape[0]})")
        self.result = FastResult(I, self.diffraction_limit)
        logger.info(self.result)
        return self.result

    def _run(self):
        key = make_key(self.seed, impl=self.params["RNG"])
        key_logamp, key_scr, key_mc = jax.random.split(key, 3)

        # the device program draws the log-amplitude series in-graph from
        # this key; the diagnostic `sim.logamp` copy is reproduced lazily
        # on first access (see the `logamp` property) instead of being
        # drawn twice per run
        self._logamp_key = key_logamp
        self._logamp_cache = None

        coherent = bool(self.params["COHERENT"])
        if not self.temporal:
            run_all = self._run_all_fn()
            out = run_all(key_logamp, key_mc)
        else:
            run_all = (self._run_all_fn_temporal_ar()
                       if self._temporal_synth == "ar"
                       else self._run_all_fn_temporal())
            out = run_all(key_logamp, key_scr)
        # summary moments + finite guard on device: four scalars cross
        # the relay; the full series materialises lazily on first access
        # of a series-valued result property
        if coherent:
            mr, mi, si, nbad = self._mc_stats_coherent(out)
            mean = complex(float(mr), float(mi))
        else:
            m, si, nbad = self._mc_stats_real(out)
            mean = float(m)
        if int(nbad):
            raise FloatingPointError(
                "Monte Carlo run produced non-finite iterates "
                f"({int(nbad)} non-finite values over {out.shape[0]} "
                "iterates); check the configuration (validate() passed, "
                "so this points at a synthesis-path numerical problem)")
        self.result = FastResult(out, self.diffraction_limit,
                                 coherent=coherent,
                                 moments=(mean, float(si)))
        logger.info(self.result)
        return self.result

    @property
    def I(self):
        """The run's power series (reference-compatible alias).

        Delegates to ``result.power`` — materialises the series on first
        access (see :class:`FastResult`).
        """
        if getattr(self, "result", None) is None:
            raise AttributeError("I is available after run()")
        return self.result.power

    @property
    def logamp(self):
        """The run's log-amplitude draws (diagnostic; drawn lazily).

        Identical to the series the device program used: same key, same
        coloring (the in-graph draw is deterministic in the key).
        """
        if getattr(self, "_logamp_key", None) is None:
            raise AttributeError("logamp is available after run()")
        if self._logamp_cache is None:
            ctx = jax.default_device(self._cpu) if self._cpu \
                else _nullcontext()
            with ctx:
                self._logamp_cache = np.asarray(synthesis.draw_logamp(
                    self._logamp_key, self.Niter, self.logamp_var,
                    temporal_powerspec=(self.temporal_logamp_powerspec
                                        if self.temporal else None),
                    dtype=self.dtype))
        return self._logamp_cache

    def sample_screens(self, nscreens=2, key=None):
        """Draw pupil-cropped residual phase screens for inspection.

        Reference-API analogue of ``Fast.compute_phs`` (``fast.py:589-605``)
        without mutating run state. Returns (nscreens, Npup, Npup).
        """
        if key is None:
            key = make_key(self.seed, impl=self.params["RNG"])
        n2 = max(1, nscreens // 2 + nscreens % 2)
        scr = synthesis.synthesize_screens_complex(
            key, jnp.asarray(self._sqrt_psd), float(self.freq.main.df), n2,
            crop=self.pup_crop)
        if self.subharmonics:
            scr = scr + synthesis.synthesize_subharm_complex(
                jax.random.fold_in(key, 1), jnp.asarray(self._sqrt_psd_sh),
                jnp.asarray(self._sh_df), jnp.asarray(self._sh_modes), n2,
                crop=self.pup_crop)
        phs = synthesis.double_screens(scr)
        self.phs = np.asarray(phs[:nscreens])
        return self.phs

    compute_phs = sample_screens  # reference-name alias

    # ------------------------------------------------------------------
    # reference-API compatibility methods (``fast/fast.py`` names). The
    # engine's run() path does not use them — they exist so code written
    # against the reference keeps working.
    # ------------------------------------------------------------------

    def init_fftw(self):
        """Reference-API no-op: XLA owns the FFT (``fast/fast.py:419-438``).

        The FFTW/FFTW_THREADS config keys are accepted and ignored."""
        logger.info("FFTW plans are not used; XLA compiles the FFTs")

    def init_phs_logamp(self):
        """Reference-API no-op: buffers are managed by XLA
        (``fast/fast.py:440-443``)."""
        logger.info("phase/log-amplitude buffers are managed by XLA")

    def compute_logamp(self):
        """Draw (or return) the full log-amplitude series
        (``fast/fast.py:639-645``)."""
        if getattr(self, "_logamp_key", None) is None:
            key = make_key(self.seed, impl=self.params["RNG"])
            self._logamp_key, _, _ = jax.random.split(key, 3)
            self._logamp_cache = None
        return self.logamp

    def compute_phs_temporal(self, chunk=0, key=None):
        """Sample one chunk of the frozen-flow phase series
        (``fast/fast.py:607-637``). Stores and returns ``self.phs``
        with shape (Niter_per_chunk, Npup, Npup)."""
        if not self.temporal:
            raise ValueError("compute_phs_temporal requires TEMPORAL=True")
        if key is None:
            key = make_key(self.seed, impl=self.params["RNG"])
            _, key, _ = jax.random.split(key, 3)
        if self._temporal_synth == "ar":
            # reflect the actual run path: evolve the AR(1)-in-Fourier
            # state to this chunk's window, then the exact centered ifft2
            # (the run itself reduces each screen on-chip; this diagnostic
            # materialises them)
            return self._compute_phs_temporal_ar(chunk, key)
        screens = synthesis.synthesize_layer_screens(
            key, jnp.asarray(self._sqrt_psd_layers),
            float(self.freq.main.df))
        dt = np.dtype(str(self.dtype))
        base0 = (self.pup_coords[None, :, None, :].astype(float)
                 + self.pixel_shifts[:, :, :, None]).astype(dt)
        shift = self.pixel_shifts[:, :, -1].astype(dt)
        rows = base0[:, 0] + chunk * shift[:, 0, None, None]
        cols = base0[:, 1] + chunk * shift[:, 1, None, None]
        self.phs = np.asarray(synthesis.sample_frozen_flow(
            screens, jnp.asarray(rows), jnp.asarray(cols)))
        return self.phs

    def _compute_phs_temporal_ar(self, chunk, key):
        """AR-mode trajectory sampling backing :meth:`compute_phs_temporal`.

        Same AR(1)-in-Fourier recursion as the run path
        (:func:`synthesis.ar_flow_series`), stepped chunk-by-chunk from the
        series start so ``chunk=k`` returns the k-th window of one
        consistent trajectory.
        """
        dt = np.dtype(str(self.dtype))
        cdt = np.complex64 if dt == np.float32 else np.complex128
        sqrt_psd_df = jnp.asarray(
            (self._sqrt_psd_layers
             * np.float64(self.freq.main.df)).astype(dt))
        v = np.asarray(self.wind_vector, np.float64)
        fxm = np.asarray(self.freq.main.fx, np.float64)
        fym = np.asarray(self.freq.main.fy, np.float64)
        phase = (fxm[None] * v[:, 0, None, None]
                 + fym[None] * v[:, 1, None, None]) * float(self.dt)
        phase = np.angle(np.exp(1j * phase))
        step_phasor = jnp.asarray(np.exp(1j * phase).astype(cdt))
        alpha = jnp.asarray(self._ar_alpha)[:, None, None]
        sqrt1ma = jnp.sqrt(jnp.maximum(
            0.0, 1.0 - alpha.astype(jnp.float64) ** 2)).astype(dt)
        boiling = bool(np.any(np.asarray(self._ar_alpha) < 1.0))
        kinit, knoise = jax.random.split(key)
        a = synthesis.complex_normal(
            kinit, sqrt_psd_df.shape, dtype=cdt) * sqrt_psd_df
        B = self.Niter_per_chunk
        lo, hi = self.pup_crop
        A = None
        for _ in range(chunk + 1):
            a, knoise, A = synthesis.ar_flow_series(
                a, knoise, step_phasor, sqrt_psd_df, alpha, sqrt1ma, B,
                boiling)
        self.phs = np.asarray(ift2(A, 1.0).real[:, lo:hi, lo:hi])
        return self.phs

    def compute_detector(self, chunk=0):
        """Pupil-overlap couplings for the phases in ``self.phs``
        (``fast/fast.py:647-668``). Requires ``compute_phs`` /
        ``compute_phs_temporal`` first."""
        if getattr(self, "phs", None) is None:
            raise ValueError("call compute_phs/compute_phs_temporal first")
        pc = synthesis.detector_coupling(
            jnp.asarray(self.phs, self.dtype), jnp.asarray(self._pm),
            self.dx, self._norm)
        B = self.phs.shape[0]
        chi = self.compute_logamp()[chunk * B:(chunk + 1) * B]
        out = np.exp(chi[:pc.shape[0]]) * np.asarray(pc)
        if not bool(self.params["COHERENT"]):
            return np.abs(out) ** 2
        return out

    def validate(self):
        """Sanity-check the precomputed spectra; raises on corruption.

        Failure-detection hook (SURVEY.md §5.3): every PSD must be finite
        and non-negative, masks within [0, 1], and the link budget finite.
        """
        problems = []

        def _chk(name, arr, lo=None, hi=None):
            a = np.asarray(arr, dtype=float)
            if not np.isfinite(a).all():
                problems.append(f"{name} contains non-finite values")
            if lo is not None and (a < lo).any():
                problems.append(f"{name} below {lo}")
            if hi is not None and (a > hi + 1e-9).any():
                problems.append(f"{name} above {hi}")

        _chk("powerspec", self.powerspec, lo=0)
        _chk("logamp_powerspec", self.logamp_powerspec, lo=0)
        _chk("lf_mask", self.lf_mask, lo=0, hi=1)
        _chk("pupil", self.pupil, lo=0)
        _chk("link_budget", list(self.link_budget.values()))
        if self.subharmonics:
            _chk("powerspec_subharm", self.powerspec_subharm, lo=0)
        if self.temporal:
            _chk("temporal_logamp_powerspec",
                 self.temporal_logamp_powerspec, lo=0)
        if problems:
            raise ValueError("simulation state invalid: " + "; ".join(problems))
        return True

    # ------------------------------------------------------------------
    # analytic (MC-free) outputs
    # ------------------------------------------------------------------

    def compute_mean_irradiance(self, onaxis=True):
        """Mean PSF/coupled flux from the OTF of the residual PSD.

        Pure-Fourier path, no Monte Carlo (``fast/fast.py:736-761``).
        """
        logger.info("Computing mean irradiance/coupled flux")
        ctx = jax.default_device(self._cpu) if self._cpu else _nullcontext()
        with ctx:
            pupil = np.zeros(self.powerspec.shape)
            pm = self.pupil * self.pupil_mode
            pupil[: pm.shape[0], : pm.shape[1]] = pm

            phs_otf = np.asarray(ift2(jnp.asarray(self.powerspec),
                                      self.freq.df))
            mid = phs_otf.shape[0] // 2, phs_otf.shape[1] // 2
            phs_sf = phs_otf[mid[0], mid[1]] - phs_otf

            pupil_ft = np.asarray(ft2(jnp.asarray(pupil), self.dx))
            pupil_otf = np.asarray(ift2(
                jnp.asarray(np.abs(pupil_ft) ** 2),
                self.freq.df)) / (2 * np.pi) ** 2

            otf = np.exp(-phs_sf) * pupil_otf

            if not onaxis:
                psf = np.asarray(ft2(jnp.asarray(otf), self.dx)).real
            else:
                psf = otf.sum().real * self.dx ** 2

            normalisation = (pupil.sum() * self.dx ** 2) ** 2
            return psf * self.diffraction_limit / normalisation

    def calc_zenith_correction(self, zenith_angle):
        return 1 / np.cos(np.radians(zenith_angle))

    # ------------------------------------------------------------------
    # persistence
    # ------------------------------------------------------------------

    def make_header(self, params):
        """FITS header with the reference's key set (``fast/fast.py:771-807``)."""
        hdr = fits.Header()
        hdr["ZENITH"] = params["ZENITH_ANGLE"]
        hdr["WVL"] = int(params["WVL"] * 1e9)
        hdr["OTRSCALE"] = (str(params["L0"]) if np.isinf(params["L0"])
                           else params["L0"])
        hdr["INRSCALE"] = params["l0"]
        hdr["POWER"] = params["POWER"]
        hdr["PAA"] = self.paa
        hdr["AO_MODE"] = self.ao_mode
        hdr["TLOOP"] = params["TLOOP"]
        hdr["TEXP"] = params["TEXP"]
        hdr["DSUBAP"] = params["DSUBAP"]
        hdr["ALIAS"] = str(params["ALIAS"])
        hdr["NOISE"] = params["NOISE"]
        hdr["D_GND"] = params["D_GROUND"]
        hdr["OBSC_GND"] = params["OBSC_GROUND"]
        hdr["D_SAT"] = params["D_SAT"]
        hdr["OBSC_SAT"] = params["OBSC_SAT"]
        hdr["AXICON"] = str(params["AXICON"])
        hdr["W0"] = self.W0
        hdr["L_SAT"] = self.L
        hdr["H_SAT"] = params["H_SAT"]
        hdr["DX"] = self.dx
        hdr["NPXLS"] = int(self.Npxls)
        hdr["NITER"] = int(self.Niter)
        hdr["R0"] = self.r0
        hdr["THETA0"] = self.theta0
        hdr["TAU0"] = self.tau0
        hdr["DIFFLIM"] = self.diffraction_limit
        if self.seed is not None:
            hdr["SEED"] = self.seed
        return hdr

    def save(self, fname, **kwargs):
        logger.info("Saving results to %s", fname)
        hdr = self.make_header(self.params)
        fits.writeto(fname, np.asarray(self.result.power), header=hdr, **kwargs)


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *exc):
        return False


import functools as _functools


@_functools.partial(
    jax.jit,
    static_argnames=("synth", "nchunks", "B", "coherent", "subharm", "crop",
                     "precision"))
def _run_all_iid(key_logamp, key_mc, C, *, synth, nchunks, B, coherent,
                 subharm, crop, precision):
    """Whole iid Monte Carlo run as one shared program.

    ``C`` is a pytree of per-config arrays/scalars (sqrt PSD, pupil*mode,
    grid scalars, and — stacked as (real, imag) floats — the pruned DFT
    matrix / column factors / subharmonic modes). One compilation serves
    every config with the same shapes and flags.
    """
    niter = nchunks * B
    chi_all = synthesis.draw_logamp(key_logamp, niter, C["logamp_var"],
                                    dtype=C["pm"].dtype)
    sqrt_psd = C["sqrt_psd"]
    pm = C["pm"]
    df, dx, norm = C["df"], C["dx"], C["norm"]
    W = jax.lax.complex(C["w2"][0], C["w2"][1]) if "w2" in C else None
    L = jax.lax.complex(C["l2"][0], C["l2"][1]) if "l2" in C else None
    if subharm:
        sqrt_psd_sh = C["sqrt_psd_sh"]
        sh_modes = jax.lax.complex(C["sh_modes2"][0], C["sh_modes2"][1])
        sh_df = C["sh_df"]

    def chunk(key, chi):
        kmain, ksub = jax.random.split(key)
        if synth == "colfac":
            scr = synthesis.synthesize_screens_colfac(
                kmain, L, W, B // 2, precision=precision)
        elif synth == "matmul":
            scr = synthesis.synthesize_screens_pruned(
                kmain, sqrt_psd, df, B // 2, W, precision=precision)
        else:
            scr = synthesis.synthesize_screens_complex(
                kmain, sqrt_psd, df, B // 2, crop=crop)
        if subharm:
            scr = scr + synthesis.synthesize_subharm_complex(
                ksub, sqrt_psd_sh, sh_df, sh_modes, B // 2, crop=crop)
        phs = synthesis.double_screens(scr)
        pc = synthesis.detector_coupling(phs, pm, dx, norm)
        out = jnp.exp(chi).astype(pc.real.dtype) * pc
        if not coherent:
            return jnp.abs(out) ** 2
        return jnp.stack([out.real, out.imag], axis=-1)

    keys = jax.vmap(lambda i: jax.random.fold_in(key_mc, i))(
        jnp.arange(nchunks))
    _, outs = jax.lax.scan(
        lambda c, inp: (c, chunk(inp[0], inp[1])), 0,
        (keys, chi_all.reshape(nchunks, B)))
    return outs.reshape((nchunks * B,) + outs.shape[2:])


@_functools.partial(
    jax.jit, static_argnames=("nchunks", "B", "coherent", "temporal_chi"))
def _run_all_temporal_screens(key_logamp, key_scr, C, *, nchunks, B,
                              coherent, temporal_chi):
    """Whole frozen-flow (large-screens) run as one shared program.

    The per-chunk trajectory is affine in the chunk index
    (``base0 + i * shift``), so the series is a single scanned dispatch;
    per-config tables are traced arguments shared across instances.
    """
    chi_all = synthesis.draw_logamp(
        key_logamp, nchunks * B, C["logamp_var"],
        temporal_powerspec=C["temporal_ps"] if temporal_chi else None,
        dtype=C["pm"].dtype)
    screens = synthesis.synthesize_layer_screens(
        key_scr, C["sqrt_psd_layers"], C["df"])
    base0, shift_chunk = C["base0"], C["shift_chunk"]
    pm, dx, norm = C["pm"], C["dx"], C["norm"]

    def body(c, inp):
        i, chi_i = inp
        rows = base0[:, 0] + i * shift_chunk[:, 0, None, None]
        cols = base0[:, 1] + i * shift_chunk[:, 1, None, None]
        phs = synthesis.sample_frozen_flow(screens, rows, cols)
        pc = synthesis.detector_coupling(phs, pm, dx, norm)
        out = jnp.exp(chi_i).astype(pc.real.dtype) * pc
        if not coherent:
            return c, jnp.abs(out) ** 2
        return c, jnp.stack([out.real, out.imag], axis=-1)

    idx = jnp.arange(nchunks, dtype=pm.dtype)
    _, outs = jax.lax.scan(body, 0,
                           (idx, chi_all.reshape((nchunks, B))))
    return outs.reshape((nchunks * B,) + outs.shape[2:])


@_functools.partial(
    jax.jit,
    static_argnames=("nchunks", "B", "coherent", "crop", "boiling",
                     "temporal_chi", "precision", "noise", "stream"))
def _run_all_temporal_ar(key_logamp, key_scr, C, *, nchunks, B, coherent,
                         crop, boiling, temporal_chi, precision="highest",
                         noise="uniform", stream=False):
    """Whole AR(1)-in-Fourier frozen-flow run as one shared program.

    With ``w2`` in ``C`` (the float32 path) each step runs the fused
    AR-update + pruned-DFT + detector pipeline
    (:func:`synthesis.ar_flow_couplings`); otherwise chunks of
    coefficients are batched through the exact centered ifft2.
    """
    lo, hi = crop
    chi_all = synthesis.draw_logamp(
        key_logamp, nchunks * B, C["logamp_var"],
        temporal_powerspec=C["temporal_ps"] if temporal_chi else None,
        dtype=C["pm"].dtype)
    sqrt_psd_df = C["sqrt_psd_df"]
    cdt = jnp.complex64 if sqrt_psd_df.dtype == jnp.float32 \
        else jnp.complex128
    step_phasor = jax.lax.complex(jnp.cos(C["step_phase"]),
                                  jnp.sin(C["step_phase"])).astype(cdt)
    alpha = C["alpha"][:, None, None]
    sqrt1ma = jnp.sqrt(jnp.maximum(0.0, 1.0 - alpha ** 2)).astype(
        sqrt_psd_df.dtype)
    pm, dx, norm = C["pm"], C["dx"], C["norm"]

    kinit, knoise = jax.random.split(key_scr)
    a0 = synthesis.complex_normal(kinit, sqrt_psd_df.shape,
                                  dtype=cdt) * sqrt_psd_df

    W = jax.lax.complex(C["w2"][0], C["w2"][1]) if "w2" in C else None

    if "ph2" in C:
        from .ops import pallas_synth
        seed = jax.random.bits(knoise, (), "uint32").astype(jnp.int32)
        ph_scaled = jax.lax.complex(C["ph2"][0], C["ph2"][1])
        kernel = (pallas_synth.ar_flow_streamed if stream
                  else pallas_synth.ar_flow_fused)
        c, _ = kernel(
            seed, a0, ph_scaled, C.get("ns"), W, pm, nchunks * B,
            precision=precision, noise=noise)
        pc = jax.lax.complex(c[:, 0], c[:, 1]) * (dx ** 2 / norm)
        out = jnp.exp(chi_all).astype(jnp.float32) * pc
        if not coherent:
            return jnp.abs(out) ** 2
        return jnp.stack([out.real, out.imag], axis=-1)

    def body(carry, chi_c):
        a, k = carry
        if W is not None:
            a, k, out = synthesis.ar_flow_couplings(
                a, k, step_phasor, sqrt_psd_df, alpha, sqrt1ma, chi_c, W,
                pm, dx, norm, boiling, precision=precision)
        else:
            a, k, A = synthesis.ar_flow_series(
                a, k, step_phasor, sqrt_psd_df, alpha, sqrt1ma, B, boiling)
            phs = ift2(A, 1.0).real[:, lo:hi, lo:hi]
            pc = synthesis.detector_coupling(phs, pm, dx, norm)
            out = jnp.exp(chi_c).astype(pc.real.dtype) * pc
        if not coherent:
            return (a, k), jnp.abs(out) ** 2
        return (a, k), jnp.stack([out.real, out.imag], axis=-1)

    _, outs = jax.lax.scan(body, (a0, knoise),
                           chi_all.reshape((nchunks, B)))
    return outs.reshape((nchunks * B,) + outs.shape[2:])


@jax.jit
def _temporal_ar_init(kinit, C):
    """Initial AR Fourier state as a (2, nlayers, N, N) float stack (the
    progress path carries it across dispatches; complex cannot cross the
    axon program boundary)."""
    sqrt_psd_df = C["sqrt_psd_df"]
    cdt = jnp.complex64 if sqrt_psd_df.dtype == jnp.float32 \
        else jnp.complex128
    a0 = synthesis.complex_normal(kinit, sqrt_psd_df.shape,
                                  dtype=cdt) * sqrt_psd_df
    return jnp.stack([jnp.real(a0), jnp.imag(a0)])


@_functools.partial(
    jax.jit,
    static_argnames=("B", "coherent", "crop", "boiling", "precision",
                     "noise", "stream"))
def _chunk_temporal_ar(a2, key_noise, chi_c, C, *, B, coherent, crop,
                       boiling, precision, noise, stream):
    """One temporal-AR chunk for the tqdm progress path.

    Same per-chunk math as :func:`_run_all_temporal_ar`'s scan body
    (fused Pallas kernel when ``ph2`` tables are present, XLA
    couplings/exact-ifft2 otherwise); the AR state enters and leaves as
    a float stack and each chunk draws from an independent key.
    """
    lo, hi = crop
    sqrt_psd_df = C["sqrt_psd_df"]
    cdt = jnp.complex64 if sqrt_psd_df.dtype == jnp.float32 \
        else jnp.complex128
    a = jax.lax.complex(a2[0], a2[1]).astype(cdt)
    pm, dx, norm = C["pm"], C["dx"], C["norm"]
    W = jax.lax.complex(C["w2"][0], C["w2"][1]) if "w2" in C else None
    if "ph2" in C:
        from .ops import pallas_synth
        seed = jax.random.bits(key_noise, (), "uint32").astype(jnp.int32)
        ph_scaled = jax.lax.complex(C["ph2"][0], C["ph2"][1])
        kernel = (pallas_synth.ar_flow_streamed if stream
                  else pallas_synth.ar_flow_fused)
        c, a = kernel(seed, a, ph_scaled, C.get("ns"), W, pm, B,
                      precision=precision, noise=noise)
        pc = jax.lax.complex(c[:, 0], c[:, 1]) * (dx ** 2 / norm)
        out = jnp.exp(chi_c).astype(jnp.float32) * pc
    else:
        step_phasor = jax.lax.complex(
            jnp.cos(C["step_phase"]), jnp.sin(C["step_phase"])).astype(cdt)
        alpha = C["alpha"][:, None, None]
        sqrt1ma = jnp.sqrt(jnp.maximum(0.0, 1.0 - alpha ** 2)).astype(
            sqrt_psd_df.dtype)
        if W is not None:
            a, _, out = synthesis.ar_flow_couplings(
                a, key_noise, step_phasor, sqrt_psd_df, alpha, sqrt1ma,
                chi_c, W, pm, dx, norm, boiling, precision=precision)
        else:
            a, _, A = synthesis.ar_flow_series(
                a, key_noise, step_phasor, sqrt_psd_df, alpha, sqrt1ma,
                B, boiling)
            phs = ift2(A, 1.0).real[:, lo:hi, lo:hi]
            pc = synthesis.detector_coupling(phs, pm, dx, norm)
            out = jnp.exp(chi_c).astype(pc.real.dtype) * pc
    res = (jnp.abs(out) ** 2 if not coherent
           else jnp.stack([out.real, out.imag], axis=-1))
    return res, jnp.stack([jnp.real(a), jnp.imag(a)])


@_functools.partial(jax.jit, static_argnames=("coherent",))
def _chunk_temporal_screens(i, chi_c, screens, C, *, coherent):
    """One frozen-flow (large-screens) chunk for the tqdm progress path —
    :func:`_run_all_temporal_screens`'s scan body, dispatched per chunk
    (the chunk trajectory is affine in the chunk index, so no state
    carries; the screens are synthesized once and stay device-resident)."""
    base0, shift_chunk = C["base0"], C["shift_chunk"]
    pm, dx, norm = C["pm"], C["dx"], C["norm"]
    i = jnp.asarray(i, pm.dtype)
    rows = base0[:, 0] + i * shift_chunk[:, 0, None, None]
    cols = base0[:, 1] + i * shift_chunk[:, 1, None, None]
    phs = synthesis.sample_frozen_flow(screens, rows, cols)
    pc = synthesis.detector_coupling(phs, pm, dx, norm)
    out = jnp.exp(chi_c).astype(pc.real.dtype) * pc
    if not coherent:
        return jnp.abs(out) ** 2
    return jnp.stack([out.real, out.imag], axis=-1)


class FastResult:
    """Unit conversions over the raw normalised Monte Carlo iterates.

    Mirrors the reference (``fast/fast.py:931-994``). The raw iterate
    series materialises host-side lazily: fetching a multi-million-
    sample array through the axon relay costs tens of seconds (21 s for
    a 2²⁴ run — the dominant cost of ``run()`` at scale), so ``run()``
    passes the *device* array plus device-computed summary moments, and
    the transfer happens only when a series-valued property is read.
    """

    def __init__(self, random_iters, diffraction_limit, header=None,
                 coherent=None, moments=None):
        # coherent=None: `random_iters` is already final (host complex or
        # real) — the mesh/scan runners and `load_result` use this form.
        # coherent=True/False: `random_iters` is the run program's raw
        # float output ((n, 2) stacked re/im when coherent — complex
        # cannot cross the axon program boundary), recombined on fetch.
        self._raw = random_iters
        self._np = None
        self._coherent = coherent
        self._moments = moments  # (mean, scint_index) or None
        self._dl = diffraction_limit
        if header is not None:
            self.hdr = header

    @property
    def _r(self):
        if self._np is None:
            arr = np.asarray(self._raw)
            if self._coherent:
                arr = arr[..., 0] + 1j * arr[..., 1]
            self._np = arr
            self._raw = None  # drop the device reference
        return self._np

    @property
    def dB_rel(self):
        return 10 * np.log10(self._r)

    @property
    def dB_abs(self):
        return 10 * np.log10(self._r * self._dl)

    @property
    def dBm(self):
        return 10 * np.log10(self._r * self._dl / 1e-3)

    @property
    def power(self):
        return self._dl * self._r

    @property
    def scintillation_index(self):
        if self._moments is not None and self._np is None:
            return self._moments[1]
        return (self._r / self._r.mean()).var()

    @property
    def avg_power_W(self):
        if self._moments is not None and self._np is None:
            return self._dl * self._moments[0]
        return self.power.mean()

    @property
    def avg_power_dBm(self):
        return 10 * np.log10(self.avg_power_W / 1e-3)

    @property
    def avg_power_dB_rel(self):
        if self._moments is not None and self._np is None:
            return 10 * np.log10(self._moments[0])
        return 10 * np.log10((self.power / self._dl).mean())

    @property
    def avg_power_dB_abs(self):
        return 10 * np.log10(self.avg_power_W)

    def __str__(self):
        return (
            "FAST result statistics:\n"
            f"    Avg. power (W): {self.avg_power_W}\n"
            f"    Avg. power (dBm): {self.avg_power_dBm}\n"
            f"    Avg. power (dB_rel): {self.avg_power_dB_rel}\n"
            f"    Avg. power (dB_abs): {self.avg_power_dB_abs}\n"
            f"    Scintillation index: {self.scintillation_index}\n"
        )


def load(fname):
    """Load a saved result file back into a :class:`FastResult`."""
    hdr = fits.getheader(fname)
    data = np.array(fits.getdata(fname))
    data /= hdr["DIFFLIM"]  # saved in units of power
    return FastResult(data, hdr["DIFFLIM"], header=hdr)
