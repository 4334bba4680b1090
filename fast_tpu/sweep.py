"""Batched link-geometry sweeps: one compiled PSD assembly, vmapped.

The reference's orbit driver constructs one fully-initialised simulation
per orbit sample — N complete init pipelines
(``fast/complete_orbit_simulation.py:217-228``, SURVEY.md §3.4). Here a
sweep shares a single grid/AO/pupil skeleton (those depend only on the
static configuration) and pushes the per-sample quantities — layer
heights/Cn2 (zenith scaling), wind vectors (azimuth rotation + slew
correction), point-ahead angle, slant range — through one jit+vmap'd
assembly of the residual and log-amplitude power spectra. Each sample then
becomes a lightweight clone of the skeleton, ready for
:func:`fast_tpu.parallel.run_scan_sharded`.

Restrictions: the sweep shares NPXLS/DX (pass them explicitly so the
'auto' rules cannot diverge), and supports the iid Monte Carlo mode
(TEMPORAL=False; SUBHARM supported) — the production regime for orbit
scans.
"""

import copy
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from . import psd, synthesis
from .engine import Fast, calculate_wind_correction, l_path

logger = logging.getLogger(__name__)


def build_sweep(base_params, samples):
    """Build lightweight per-sample simulations via one vmapped assembly.

    Args:
        base_params: config dict; must give explicit ``NPXLS`` and ``DX``
            (shared grid) and use ``TEMPORAL=False``. ``SUBHARM=True`` is
            supported (the subharmonic assembly is vmapped alongside).
        samples: dict of per-sample arrays (length ``nsamples`` each), any
            of: ``ZENITH_ANGLE``, ``L_SAT``, ``DTHETA`` (n, 2), ``ANISO_DL``
            (n, 2), ``AZIMUT_SAT`` — the quantities an orbit pass varies
            (reference ``complete_orbit_simulation.py:217-228``).

    Returns:
        list of :class:`Fast` clones sharing the skeleton, each with its
        own power spectra, log-amplitude variance and link budget — run
        them serially or with :func:`fast_tpu.parallel.run_scan_sharded`.
    """
    if base_params.get("TEMPORAL"):
        raise NotImplementedError("build_sweep supports TEMPORAL=False")
    if base_params.get("NPXLS") in (None, "auto") or \
            base_params.get("DX") in (None, "auto"):
        raise ValueError("pass explicit NPXLS and DX so the sweep shares "
                         "one grid")
    base_params = dict(base_params)
    if "SYNTH" not in base_params:
        # factor-free default: the fused TPU kernel matches the colfac
        # record within a few % at 256^2 and needs no per-sample Cholesky
        # (measured round 5: a 16-sample pass runs 858k r/s aggregate
        # fused vs 309k matmul); off-TPU, matmul. Set it on the base too,
        # so its init doesn't build a factor stack no clone will use
        # (2-20 s at 512^2 under the engine's 'auto' colfac pick).
        base_params["SYNTH"] = (
            "pallas_fused"
            if (jax.default_backend() == "tpu"
                and np.dtype(base_params.get("DTYPE", "float32"))
                == np.float32
                and not base_params.get("TEMPORAL"))
            else "matmul")
        logger.info(
            "sweep clones default to the factor-free SYNTH='%s' (a "
            "per-sample colfac factorisation would cost more than it "
            "saves for one-shot sweeps) — pass SYNTH explicitly to "
            "override", base_params["SYNTH"])

    nsamples = len(next(iter(samples.values())))
    base = Fast(dict(base_params))
    p = base.params
    prof = base.profile  # sweep stages land in the shared StageTimer

    # --- per-sample geometry (host, cheap) ---
    zen = np.asarray(samples.get(
        "ZENITH_ANGLE", np.full(nsamples, p["ZENITH_ANGLE"])), dtype=float)
    gamma = 1 / np.cos(np.radians(zen))
    h_b = np.asarray(p["H_TURB"], float)[None, :] * gamma[:, None]
    cn2_b = np.asarray(p["CN2_TURB"], float)[None, :] * gamma[:, None]

    if "L_SAT" in samples:
        L_b = np.asarray(samples["L_SAT"], dtype=float)
    else:
        L_b = np.array([l_path(p["H_SAT"], z) for z in zen])

    dtheta_b = np.asarray(samples.get(
        "DTHETA", np.tile(np.asarray(p["DTHETA"], float), (nsamples, 1))),
        dtype=float)

    wind_spd = np.asarray(p["WIND_SPD"], float)
    wind_dir = np.asarray(p["WIND_DIR"], float)[None, :].repeat(nsamples, 0)
    if "AZIMUT_SAT" in samples:
        wind_dir = (wind_dir
                    - np.asarray(samples["AZIMUT_SAT"], float)[:, None]) % 360
    wind_vec_b = np.stack([
        wind_spd * np.cos(np.radians(wind_dir)),
        wind_spd * np.sin(np.radians(wind_dir)) / gamma[:, None],
    ], axis=-1)
    if "ANISO_DL" in samples:
        for i in range(nsamples):
            wind_vec_b[i] += calculate_wind_correction(
                h_b[i], np.asarray(samples["ANISO_DL"])[i], p["TLOOP"])

    # --- one vmapped PSD assembly over the sample axis (the same jitted
    # program the engine's compute_powerspec runs, so clones match full
    # per-sample inits by construction) ---
    freq = base.freq
    grid_args, (lf_mask,), rest, statics = base._psd_args(
        freq.main, base.lf_mask)
    f_grid = np.asarray(freq.main.f, np.float64)
    hf_mask = np.asarray(base.hf_mask, np.float64)
    pupil_filter = np.asarray(base.pupil_filter, np.float64)
    shared = rest[4:]  # noise, Dsubap, texp, tloop, wvl, D_ground, L0, l0

    assemble = jax.vmap(
        lambda cn2, h, v, dth: psd.assemble_main(
            *grid_args, f_grid, lf_mask, hf_mask, pupil_filter,
            cn2, h, v, dth, *shared, full_outputs=False, **statics))

    ctx = jax.default_device(base._cpu) if base._cpu else _Null()
    with ctx, prof.stage("sweep_assemble"):
        out = jax.tree.map(np.asarray, assemble(
            jnp.asarray(cn2_b), jnp.asarray(h_b), jnp.asarray(wind_vec_b),
            jnp.asarray(dtheta_b)))
    if base.subharmonics:
        grid_args_sh, (lf_mask_sh,), _, statics_sh = base._psd_args(
            freq.subharm, base.lf_mask_subharm)
        df_levels = np.asarray(freq.subharm.df, np.float64)
        assemble_sh = jax.vmap(
            lambda cn2, h, v, dth: psd.assemble_subharm(
                *grid_args_sh, df_levels, lf_mask_sh, cn2, h, v, dth,
                *shared, **statics_sh))
        with (jax.default_device(base._cpu) if base._cpu else _Null()), \
                prof.stage("sweep_assemble_subharm"):
            out_sh = jax.tree.map(np.asarray, assemble_sh(
                jnp.asarray(cn2_b), jnp.asarray(h_b),
                jnp.asarray(wind_vec_b), jnp.asarray(dtheta_b)))

    powerspec_b = out["powerspec"]
    logamp_ps_b = out["logamp_powerspec"]
    logamp_var_b = out["logamp_var"]
    phs_var_b = out["phs_var"]
    fit_b = out["fitting_error"]
    aniso_b = out["aniso_servo_error"]
    alias_err_b = out["alias_error"]
    weights_b = out["phs_var_weights"]

    # --- stamp out lightweight clones ---
    sweep_synth = base_params["SYNTH"]
    if sweep_synth == "auto":
        # configs built from DEFAULTS carry SYNTH='auto' explicitly;
        # stamping the unresolved 'auto' onto clones would match no
        # synthesis branch downstream. Use the base's engine-resolved
        # pick (the measured per-geometry auto rule) — per-sample factor
        # builds below apply when it resolves to a colfac path.
        sweep_synth = base._synth
    W_f64 = None
    W_shared = None
    if sweep_synth in ("colfac", "pallas_colfac"):
        # factor build input: the pruned IFT matrix is grid-only, shared
        # by every clone; only the per-sample PSD varies
        W_f64 = synthesis.pruned_ift2_matrix(
            base.Npxls, *base.pup_crop, dtype=np.complex128)
    elif sweep_synth in ("matmul", "pallas", "pallas_fused"):
        # grid-only: identical for every clone, shared (was per-clone
        # until round 5 — ~90% of the stamping wall at 512^2)
        W_shared = getattr(base, "_W_pruned", None)
        if W_shared is None:
            W_shared = synthesis.pruned_ift2_matrix(
                base.Npxls, *base.pup_crop,
                dtype=np.complex64 if base.dtype == np.float32
                else np.complex128)
    sims = []
    _t_clones = time.perf_counter()
    for i in range(nsamples):
        s = copy.copy(base)
        s.params = dict(p)
        s.params["ZENITH_ANGLE"] = zen[i]
        # sweeps default to the factor-free matmul path when SYNTH is
        # absent (a per-sample colfac factorisation costs more than it
        # saves for one-shot sweeps); 'auto' resolves via the base above
        s.params["SYNTH"] = sweep_synth
        s.h, s.cn2, s.L = h_b[i], cn2_b[i], L_b[i]
        s.wind_vector = wind_vec_b[i]
        s.wind_speed = np.hypot(wind_vec_b[i, :, 0], wind_vec_b[i, :, 1])
        s.dtheta = dtheta_b[i]
        s.paa = float(np.hypot(*dtheta_b[i]))
        s.powerspec = powerspec_b[i]
        s.logamp_powerspec = logamp_ps_b[i]
        s.logamp_var = float(logamp_var_b[i])
        s.phs_var = float(phs_var_b[i])
        s.fitting_error = float(fit_b[i])
        # per-sample error budgets (noise_error is sample-invariant: the
        # noise PSD depends only on the shared grid/Dsubap/noise config)
        s.aniso_servo_error = float(aniso_b[i])
        s.alias_error = float(alias_err_b[i])
        s.phs_var_weights = weights_b[i]
        s.profile = base.profile
        # link budget: only the free-space term varies along the pass
        s.link_budget = dict(base.link_budget)
        s.link_budget["free_space"] = 10 * np.log10(
            (s.wvl / (4 * np.pi * s.L)) ** 2)
        s.diffraction_limit = 10 ** (sum(s.link_budget.values()) / 10) / 1e3
        if base.subharmonics:
            s.powerspec_subharm_per_layer = \
                out_sh["powerspec_subharm_per_layer"][i]
            s.powerspec_subharm = out_sh["powerspec_subharm"][i]
            s.phs_var_subharm = out_sh["phs_var_subharm"][i]
            s.phs_var_weights_sh = out_sh["phs_var_weights_sh"][i]
            s._sqrt_psd_sh = np.sqrt(s.powerspec_subharm).astype(s.dtype)
            # _sh_modes / _sh_df are grid-only and shared with the base
        s._synth = s.params["SYNTH"]
        # fresh identity: ``copy.copy`` would leave every clone sharing
        # the base's ``_uid`` (and hence the same (uid, tables_version)
        # pair), so the scan runner's device-table cache could not tell
        # a permuted or regenerated clone list from the one it cached
        s._uid = next(Fast._uid_counter)
        s._tables_version = getattr(s, "_tables_version", 0) + 1
        s._sqrt_psd = np.sqrt(powerspec_b[i]).astype(s.dtype)
        if s._synth in ("matmul", "pallas", "pallas_fused"):
            s._W_pruned = W_shared
        elif s._synth in ("colfac", "pallas_colfac"):
            # the factor tables depend on the per-sample PSD: a clone
            # keeping the base's ``_L_colfac`` would run every sample
            # with the base atmosphere's covariance (the pallas_colfac
            # branch was missing until round 4's review). Content-cached
            # on disk like the engine's build (same key namespace) so
            # repeat sweeps of one geometry skip the refactorisation.
            from .utils import diskcache
            cdt = np.complex64 if s.dtype == np.float32 else np.complex128
            key = diskcache.table_key(
                "colfac-f64", (powerspec_b[i], W_f64),
                (float(freq.main.df), str(cdt), 1e-10))
            L = diskcache.load(key)
            if L is None:
                L = synthesis.column_factors(
                    np.sqrt(powerspec_b[i]), float(freq.main.df),
                    W_f64).astype(cdt)
                diskcache.save(key, L)
            s._L_colfac = L
        sims.append(s)
    prof.timings["sweep_clones"] = time.perf_counter() - _t_clones
    return sims


class _Null:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False
