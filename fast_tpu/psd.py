"""Jitted power-spectral-density assembly.

One compiled program per (grid shape, AO-mode, feature-flag) signature,
covering everything the reference computes eagerly in
``Fast.compute_powerspec`` (``fast/fast.py:445-531``): von Karman turbulence
per layer, the PAOLA AO transfer function, the 121-term aliasing PSD, the
WFS-noise PSD, the residual per-layer/total spectra, every error-budget
integral (Simpson), and the log-amplitude (Fresnel) PSD — plus the
subharmonic repeat on the low-order grids.

Shared by the engine (`Fast.compute_powerspec`) and the batched sweep
(`fast_tpu.sweep.build_sweep`, vmapped over the sample axis), so per-sample
sweep clones and full inits are identical by construction. Inputs are
float64 (the ~1e-8 parity target); this assembly runs once per
configuration on the CPU backend and is never in the Monte Carlo hot path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .models import ao as ao_spectra
from .models import atmosphere
from .models.scintillation import logamp_powerspec
from .ops.integrate import integrate_path, integrate_powerspectrum


class _Freq:
    """Minimal frequency-struct shim carrying traced grid arrays."""

    freq_per_layer = False

    def __init__(self, fx, fy, fabs, fx_axis=None, fy_axis=None):
        self.fx, self.fy, self.fabs = fx, fy, fabs
        self.fx_axis, self.fy_axis = fx_axis, fy_axis


def _residual_stack(fr, lf_mask, cn2, h, wind_vector, dtheta, noise, Dsubap,
                    texp, tloop, wvl, D_ground, L0, l0, *, mode, alias_on,
                    noise_on, lmax, kmax, x_max):
    """turb, G_ao, alias, noise and the per-layer residual PSD.

    Mirrors the reference assembly term by term
    (``fast/fast.py:448-479``); returns traced arrays/scalars only.
    """
    k = 2 * np.pi / wvl
    nlayers = h.shape[0]

    turb = atmosphere.turb_powerspectrum_vonKarman(fr, cn2, L0, l0)
    G_ao = ao_spectra.G_AO_PAOLA(
        fr, lf_mask, mode, h, wind_vector, dtheta, D_ground, wvl, None,
        tloop, texp, x_max=x_max)
    if mode == "NOAO":
        G_ao = jnp.asarray(1.0, turb.dtype)

    if alias_on and mode != "NOAO":
        alias_ps = ao_spectra.Jol_alias_openloop(
            fr, Dsubap, cn2, lf_mask, wind_vector, texp, wvl, lmax, kmax,
            L0, l0)
    else:
        alias_ps = jnp.zeros_like(turb)

    if noise_on and mode != "NOAO":
        noise_ps = ao_spectra.Jol_noise_openloop(fr, Dsubap, noise, lf_mask)
    else:
        noise_ps = jnp.zeros(fr.fabs.shape[-2:], turb.dtype)

    ps_per_layer = (2 * np.pi * k ** 2 * (turb * G_ao + alias_ps)
                    + noise_ps / nlayers)
    return turb, G_ao, alias_ps, noise_ps, ps_per_layer


@functools.partial(
    jax.jit,
    static_argnames=("mode", "alias_on", "noise_on", "lmax", "kmax", "x_max",
                     "full_outputs"))
def assemble_main(fx, fy, fabs, fx_axis, fy_axis, f_grid, lf_mask, hf_mask,
                  pupil_filter, cn2, h, wind_vector, dtheta, noise, Dsubap,
                  texp, tloop, wvl, D_ground, L0, l0, *, mode, alias_on,
                  noise_on, lmax=5, kmax=5, x_max=None, full_outputs=True):
    """Main-grid PSD assembly + all error-budget integrals, one program.

    Returns a dict matching the fields ``Fast.compute_powerspec`` stores
    for the main grid (reference ``fast/fast.py:445-492``). With
    ``full_outputs=False`` the per-layer intermediate spectra (turbulence,
    AO transfer, alias, noise) are dropped — the memory-lean form the
    vmapped sweep uses.
    """
    fr = _Freq(fx, fy, fabs, fx_axis, fy_axis)
    k = 2 * np.pi / wvl

    turb, G_ao, alias_ps, noise_ps, ps_per_layer = _residual_stack(
        fr, lf_mask, cn2, h, wind_vector, dtheta, noise, Dsubap, texp,
        tloop, wvl, D_ground, L0, l0, mode=mode, alias_on=alias_on,
        noise_on=noise_on, lmax=lmax, kmax=kmax, x_max=x_max)
    powerspec = ps_per_layer.sum(0)

    aniso_servo_error = integrate_powerspectrum(
        integrate_path(G_ao * turb, h, layer=True)
        * lf_mask * 2 * np.pi * k ** 2, f_grid)
    if alias_on and mode != "NOAO":
        alias_error = integrate_powerspectrum(
            integrate_path(alias_ps * 2 * np.pi * k ** 2, h, layer=True),
            f_grid)
    else:
        alias_error = jnp.zeros((), powerspec.dtype)
    if noise_on and mode != "NOAO":
        noise_error = integrate_powerspectrum(noise_ps, f_grid)
    else:
        noise_error = jnp.zeros((), powerspec.dtype)

    fitting_error = integrate_powerspectrum(powerspec * hf_mask, f_grid)
    phs_var = integrate_powerspectrum(powerspec, f_grid)
    phs_var_weights = integrate_powerspectrum(ps_per_layer, f_grid) / phs_var

    logamp_ps = logamp_powerspec(fr, h, cn2, wvl, pupilfilter=pupil_filter,
                                 layer=True, L0=L0, l0=l0)
    logamp_var = integrate_powerspectrum(logamp_ps, f_grid)

    out = dict(
        powerspec=powerspec, aniso_servo_error=aniso_servo_error,
        alias_error=alias_error, noise_error=noise_error,
        fitting_error=fitting_error, phs_var=phs_var,
        phs_var_weights=phs_var_weights, logamp_powerspec=logamp_ps,
        logamp_var=logamp_var)
    if full_outputs:
        out.update(turb_powerspec=turb, G_ao=G_ao, alias_powerspec=alias_ps,
                   noise_powerspec=noise_ps,
                   powerspec_per_layer=ps_per_layer)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("mode", "alias_on", "noise_on", "lmax", "kmax", "x_max"))
def assemble_subharm(fx, fy, fabs, fx_axis, fy_axis, df_levels, lf_mask_sh,
                     cn2, h, wind_vector, dtheta, noise, Dsubap, texp, tloop,
                     wvl, D_ground, L0, l0, *, mode, alias_on, noise_on,
                     lmax=5, kmax=5, x_max=None):
    """Subharmonic (low-order) PSD assembly on the 3-level 3x3 grids.

    Reference ``fast/fast.py:494-531``; variances use the per-level
    ``df^2`` point weights rather than Simpson integration.
    """
    fr = _Freq(fx, fy, fabs, fx_axis, fy_axis)
    *_, ps_per_layer = _residual_stack(
        fr, lf_mask_sh, cn2, h, wind_vector, dtheta, noise, Dsubap, texp,
        tloop, wvl, D_ground, L0, l0, mode=mode, alias_on=alias_on,
        noise_on=noise_on, lmax=lmax, kmax=kmax, x_max=x_max)
    powerspec_sh = ps_per_layer.sum(0)
    phs_var_sh = ps_per_layer.sum((-1, -2)) * df_levels ** 2
    weights_sh = phs_var_sh / phs_var_sh.sum()
    return dict(powerspec_subharm_per_layer=ps_per_layer,
                powerspec_subharm=powerspec_sh, phs_var_subharm=phs_var_sh,
                phs_var_weights_sh=weights_sh)
