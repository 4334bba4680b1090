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
(TEMPORAL=False, SUBHARM=False) — the production regime for orbit scans.
"""

import copy
import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import synthesis
from .engine import Fast, calculate_wind_correction, l_path
from .models import ao as ao_spectra
from .models import atmosphere
from .models.scintillation import logamp_powerspec
from .ops.integrate import integrate_path, integrate_powerspectrum


@functools.partial(jax.jit, static_argnames=("ao_mode", "alias", "lmax",
                                             "kmax"))
def _assemble_one(cn2, h, wind_vector, dtheta, lf_mask, hf_mask,
                  pupil_filter, fx, fy, fabs, X, Y, f_axis, noise_ps,
                  D_ground, wvl, Zmax, tloop, texp, Dsubap, L0, l0,
                  ao_mode, alias, lmax, kmax):
    """Per-sample PSD assembly (mirrors ``Fast.compute_powerspec``)."""
    k = 2 * np.pi / wvl

    class _Freq:
        freq_per_layer = False
    fr = _Freq()
    fr.fx, fr.fy, fr.fabs = fx, fy, fabs

    turb = atmosphere.turb_powerspectrum_vonKarman(fr, cn2, L0, l0)
    G_ao = ao_spectra.G_AO_PAOLA(
        fr, lf_mask, ao_mode, h, wind_vector, dtheta, D_ground, wvl, Zmax,
        tloop, texp)

    aniso_servo_error = integrate_powerspectrum(
        (G_ao * turb).sum(0) * lf_mask * 2 * np.pi * k ** 2, f_axis)

    if alias and ao_mode != "NOAO":
        alias_ps = ao_spectra._alias_core(
            fx, fy, fabs, X, Y, lf_mask, cn2, wind_vector,
            jnp.asarray(texp, jnp.float64), jnp.asarray(Dsubap, jnp.float64),
            jnp.asarray(L0, jnp.float64), jnp.asarray(l0, jnp.float64),
            lmax, kmax, False, True, h.shape[0])
        alias_error = integrate_powerspectrum(
            (alias_ps * 2 * np.pi * k ** 2).sum(0), f_axis)
    else:
        alias_ps = 0.0
        alias_error = jnp.float64(0.0)

    ps_per_layer = 2 * np.pi * k ** 2 * (turb * G_ao + alias_ps) \
        + noise_ps / h.shape[0]
    powerspec = ps_per_layer.sum(0)

    logamp_ps = logamp_powerspec(fr, h, cn2, wvl, pupilfilter=pupil_filter,
                                 layer=True, L0=L0, l0=l0)
    logamp_var = integrate_powerspectrum(logamp_ps, f_axis)
    phs_var = integrate_powerspectrum(powerspec, f_axis)
    fitting_error = integrate_powerspectrum(powerspec * hf_mask, f_axis)
    phs_var_weights = integrate_powerspectrum(ps_per_layer, f_axis) / phs_var
    return (powerspec, logamp_ps, logamp_var, phs_var, fitting_error,
            aniso_servo_error, alias_error, phs_var_weights)


def build_sweep(base_params, samples):
    """Build lightweight per-sample simulations via one vmapped assembly.

    Args:
        base_params: config dict; must give explicit ``NPXLS`` and ``DX``
            (shared grid) and use ``TEMPORAL=False``, ``SUBHARM=False``.
        samples: dict of per-sample arrays (length ``nsamples`` each), any
            of: ``ZENITH_ANGLE``, ``L_SAT``, ``DTHETA`` (n, 2), ``ANISO_DL``
            (n, 2), ``AZIMUT_SAT`` — the quantities an orbit pass varies
            (reference ``complete_orbit_simulation.py:217-228``).

    Returns:
        list of :class:`Fast` clones sharing the skeleton, each with its
        own power spectra, log-amplitude variance and link budget — run
        them serially or with :func:`fast_tpu.parallel.run_scan_sharded`.
    """
    if base_params.get("TEMPORAL") or base_params.get("SUBHARM"):
        raise NotImplementedError(
            "build_sweep supports TEMPORAL=False, SUBHARM=False")
    if base_params.get("NPXLS") in (None, "auto") or \
            base_params.get("DX") in (None, "auto"):
        raise ValueError("pass explicit NPXLS and DX so the sweep shares "
                         "one grid")

    nsamples = len(next(iter(samples.values())))
    base = Fast(dict(base_params))
    p = base.params

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

    # --- one vmapped PSD assembly over the sample axis ---
    freq = base.freq
    fx_axis = jnp.asarray(freq.main.fx_axis)
    fy_axis = jnp.asarray(freq.main.fy_axis)
    Xm = fx_axis[None, :] * jnp.ones_like(fy_axis)[:, None]
    Ym = jnp.ones_like(fx_axis)[None, :] * fy_axis[:, None]

    assemble = jax.vmap(
        lambda cn2, h, v, dth: _assemble_one(
            cn2, h, v, dth, jnp.asarray(base.lf_mask),
            jnp.asarray(base.hf_mask), jnp.asarray(base.pupil_filter),
            jnp.asarray(freq.main.fx), jnp.asarray(freq.main.fy),
            jnp.asarray(freq.main.fabs), Xm, Ym, jnp.asarray(freq.main.f),
            jnp.asarray(base.noise_powerspec), base.D_ground, base.wvl,
            base.Zmax, base.tloop, base.texp, base.Dsubap, base.L0, base.l0,
            base.ao_mode, bool(base.alias), 5, 5))

    ctx = jax.default_device(base._cpu) if base._cpu else _Null()
    with ctx:
        (powerspec_b, logamp_ps_b, logamp_var_b, phs_var_b, fit_b,
         aniso_b, alias_err_b, weights_b) = [
            np.asarray(x) for x in assemble(
                jnp.asarray(cn2_b), jnp.asarray(h_b), jnp.asarray(wind_vec_b),
                jnp.asarray(dtheta_b))]

    # --- stamp out lightweight clones ---
    sims = []
    for i in range(nsamples):
        s = copy.copy(base)
        s.params = dict(p)
        s.params["ZENITH_ANGLE"] = zen[i]
        # sweeps default to the factor-free matmul path: per-sample colfac
        # factorisation would cost more than it saves here
        s.params["SYNTH"] = base_params.get("SYNTH", "matmul")
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
        s._synth = s.params["SYNTH"]
        s._sqrt_psd = np.sqrt(powerspec_b[i]).astype(s.dtype)
        if s._synth in ("matmul", "pallas", "pallas_fused"):
            s._W_pruned = synthesis.pruned_ift2_matrix(
                s.Npxls, *s.pup_crop,
                dtype=np.complex64 if s.dtype == np.float32
                else np.complex128)
        elif s._synth == "colfac":
            s._L_colfac = synthesis.column_factors(
                np.sqrt(powerspec_b[i]), float(freq.main.df),
                synthesis.pruned_ift2_matrix(
                    s.Npxls, *s.pup_crop, dtype=np.complex128)).astype(
                        np.complex64 if s.dtype == np.float32
                        else np.complex128)
        sims.append(s)
    return sims


class _Null:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False
