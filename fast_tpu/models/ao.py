"""AO residual power spectra: Zernike Fourier filters, WFS masks, noise,
aliasing, and the PAOLA anisoplanatism/servo-lag transfer function.

JAX re-implementation of the reference's ``fast/ao_power_spectra.py``. All
functions are pure, elementwise on the frequency grid, and operate on
``SpatialFrequencyStruct``-like objects (needing only ``.fx/.fy/.fabs/
.fx_axis/.fy_axis/.freq_per_layer``). Shapes are static; everything composes
under ``jit``/``vmap`` (Bessel quadrature order is derived from host-side
grid bounds, see ``fast_tpu.ops.bessel``).

Deliberate fixes of reference quirks (SURVEY.md §7):

* ``mask_hf`` calls ``mask_lf`` correctly (the reference's would crash,
  ``fast/ao_power_spectra.py:143-146``);
* WFS-noise PSD pixels where the sinc response is exactly zero (outside the
  corrected band) are zeroed instead of turning into ``inf * 0 = nan``
  (``fast/ao_power_spectra.py:156``).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.bessel import besselj, quadrature_order
from ..ops.zernike import noll_to_nm
from .atmosphere import turb_powerspectrum_vonKarman


class _FabsFreq:
    """Minimal frequency shim for von Karman evaluation on shifted grids."""

    def __init__(self, fabs, freq_per_layer):
        self.fabs = fabs
        self.freq_per_layer = freq_per_layer


def _static_max(x):
    """Host-side bound used to pick the Bessel quadrature order."""
    return float(np.max(np.abs(np.asarray(x))))


def _radial_terms(fabs, D, orders, x_max=None):
    """``2*J_{n+1}(f D/2) / (f D/2)`` for each radial order ``n+1`` in orders.

    Returns shape ``fabs.shape + (len(orders),)``. The ``fabs == 0`` points
    are computed against a guarded denominator and must be fixed up by the
    caller (the engine always overwrites the DC pixel).
    """
    x = jnp.asarray(fabs) * D / 2
    if x_max is None:
        x_max = _static_max(fabs) * D / 2
    M = quadrature_order(x_max, int(max(orders)))
    J = besselj(list(orders), x, M=M)
    xsafe = jnp.where(x == 0, 1.0, x)
    return 2 * J / xsafe[..., None]


def zernike_ft(fabs, phi, D, n_noll, x_max=None):
    """Fourier transform of the Noll-indexed Zernike polynomial ``n_noll``.

    Complex-valued (Noll 1976 eq. 25-26); reference
    ``fast/ao_power_spectra.py:10-21``.
    """
    n, m = noll_to_nm(n_noll)
    R = _radial_terms(fabs, D, [n + 1], x_max=x_max)[..., 0]
    if m == 0:
        return (np.sqrt(n + 1) * (-1.0) ** (n / 2.0) * R).astype(complex)
    prefac = np.sqrt(2 * (n + 1)) * (-1.0) ** ((n - m) / 2.0) * (1j) ** m
    az = jnp.cos(m * phi) if n_noll % 2 == 0 else jnp.sin(m * phi)
    return prefac * R * az


def _dc_fix(out, fabs_shape, n_noll_start, value_piston=1.0, value_else=0.0):
    mid1 = int(fabs_shape[-1] / 2)
    mid2 = int(fabs_shape[-2] / 2)
    val = value_piston if n_noll_start == 1 else value_else
    return out.at[..., mid2, mid1].set(val)


def zernike_filter(fabs, fx, fy, D, n_noll, n_noll_start=1, gamma=None):
    """Sum of Zernike FTs for Noll indices ``n_noll_start..n_noll``.

    DC pixel forced to 1 if piston is included, else 0 (reference
    ``fast/ao_power_spectra.py:23-52``). ``gamma`` scales the aperture per
    entry, adding a leading axis.
    """
    phi = jnp.arctan2(fy, fx)
    if gamma is None:
        out = jnp.zeros(jnp.shape(fabs), dtype=complex)
        for j in range(n_noll_start, n_noll + 1):
            out = out + zernike_ft(fabs, phi, D, j)
        return _dc_fix(out, jnp.shape(fabs), n_noll_start)

    gamma = np.atleast_1d(gamma)
    outs = []
    for g in gamma:
        o = jnp.zeros(jnp.shape(fabs), dtype=complex)
        for j in range(n_noll_start, n_noll + 1):
            o = o + zernike_ft(fabs, phi, g * D, j)
        outs.append(o)
    out = jnp.stack(outs)
    return _dc_fix(out, jnp.shape(fabs), n_noll_start)


def zernike_squared_filter(fabs, fx, fy, D, n_noll, n_noll_start=1,
                           gamma=None, plusminus=False, x_max=None):
    """``sum_j |FT Z_j|^2`` over Noll indices — the modal correction filter.

    Real-valued by construction. With ``plusminus``, each term is
    ``Z_j(f) * conj(Z_j(-f))``, which equals ``(-1)^m`` times the plain
    term. Reference ``fast/ao_power_spectra.py:54-95``.
    """
    phi = jnp.arctan2(fy, fx)

    def _accumulate(D_eff):
        orders = []
        terms = []
        for j in range(n_noll_start, n_noll + 1):
            n, m = noll_to_nm(j)
            orders.append(n + 1)
            terms.append((j, n, m))
        uniq = sorted(set(orders))
        R = _radial_terms(fabs, D_eff, uniq, x_max=x_max)
        idx = {o: i for i, o in enumerate(uniq)}
        out = jnp.zeros(jnp.shape(fabs))
        for j, n, m in terms:
            R2 = R[..., idx[n + 1]] ** 2
            if m == 0:
                term = (n + 1) * R2
            else:
                az = jnp.cos(abs(m) * phi) if j % 2 == 0 else jnp.sin(abs(m) * phi)
                term = 2 * (n + 1) * R2 * az ** 2
            if plusminus:
                term = term * ((-1.0) ** m)
            out = out + term
        return out

    if gamma is None:
        out = _accumulate(D)
    else:
        gamma = np.atleast_1d(gamma)
        out = jnp.stack([_accumulate(g * D) for g in gamma])
    return _dc_fix(out, jnp.shape(fabs), n_noll_start)


def piston_filter(fabs, D, x_max=None):
    """High-pass filter removing piston (reference ``ao_power_spectra.py:104-107``)."""
    x = jnp.asarray(fabs) * D / 2
    if x_max is None:
        x_max = _static_max(fabs) * D / 2
    J = besselj([1], x, M=quadrature_order(x_max, 1))[..., 0]
    xsafe = jnp.where(x == 0, 1.0, x)
    filt = 1 - (2 * J / xsafe) ** 2
    mid2 = int(jnp.shape(fabs)[-2] / 2)
    mid1 = int(jnp.shape(fabs)[-1] / 2)
    return filt.at[..., mid2, mid1].set(0.0)


def tiptilt_filter(fabs, D, x_max=None):
    """High-pass filter removing tip/tilt (reference ``ao_power_spectra.py:109-112``)."""
    x = jnp.asarray(fabs) * D / 2
    if x_max is None:
        x_max = _static_max(fabs) * D / 2
    J = besselj([2], x, M=quadrature_order(x_max, 2))[..., 0]
    xsafe = jnp.where(x == 0, 1.0, x)
    filt = 1 - (4 * J / xsafe) ** 2
    mid2 = int(jnp.shape(fabs)[-2] / 2)
    mid1 = int(jnp.shape(fabs)[-1] / 2)
    return filt.at[..., mid2, mid1].set(1.0)


def piston_tiptilt_filter(fabs, D, x_max=None):
    """High-pass filter removing piston and tip/tilt."""
    x = jnp.asarray(fabs) * D / 2
    if x_max is None:
        x_max = _static_max(fabs) * D / 2
    J = besselj([1, 2], x, M=quadrature_order(x_max, 2))
    xsafe = jnp.where(x == 0, 1.0, x)
    filt = 1 - (2 * J[..., 0] / xsafe) ** 2 - (4 * J[..., 1] / xsafe) ** 2
    mid2 = int(jnp.shape(fabs)[-2] / 2)
    mid1 = int(jnp.shape(fabs)[-1] / 2)
    return filt.at[..., mid2, mid1].set(0.0)


def piston_gtilt_filter(fabs, fx, fy, D, x_max=None):
    """Piston + gradient-tilt low-pass (reference ``ao_power_spectra.py:97-102``)."""
    pist = zernike_squared_filter(fabs, fx, fy, D, 1, x_max=x_max)
    if x_max is None:
        x_max = _static_max(fabs) * D / 2
    G_tt = besselj([1], jnp.asarray(fabs) * D / 2.0,
                   M=quadrature_order(x_max, 1))[..., 0] ** 2
    filt = pist + G_tt
    return jnp.minimum(filt, 1.0)


def mask_lf(freq, d_WFS, modal=False, modal_mult=1, Zmax=None, D=None,
            Gtilt=False):
    """AO-corrected (low-frequency) region mask.

    Square WFS band ``|fx|,|fy| <= pi/d_WFS``, optionally intersected with
    the modal DM space: a radial cut (``Zmax is None``) or a Zernike
    attenuation filter in [0, 1]. Reference ``fast/ao_power_spectra.py:119-141``.
    """
    fx = jnp.asarray(freq.fx)
    fy = jnp.asarray(freq.fy)
    fmax = np.pi / d_WFS
    wfs_space = jnp.logical_and(jnp.abs(fx) <= fmax, jnp.abs(fy) <= fmax)
    if modal:
        fabs = jnp.sqrt(fx ** 2 + fy ** 2)
        if Zmax is None:
            dm_space = fabs <= fmax * modal_mult
        else:
            if Gtilt:
                dm_space = piston_gtilt_filter(fabs, fx, fy, D)
            else:
                dm_space = zernike_squared_filter(fabs, fx, fy, D, Zmax)
    else:
        dm_space = wfs_space
    dm_space = jnp.where(dm_space < 1, dm_space, 1)
    return wfs_space * dm_space


def mask_hf(freq, d_WFS, modal=False, modal_mult=1, Zmax=None, D=None,
            Gtilt=False):
    """High-frequency (uncorrected) mask — complement of :func:`mask_lf`."""
    return 1 - mask_lf(freq, d_WFS, modal=modal, modal_mult=modal_mult,
                       Zmax=Zmax, D=D, Gtilt=Gtilt)


def Jol_noise_openloop(freq, Dsubap, noise_variance, lf_mask):
    """Open-loop WFS noise PSD inside the corrected band.

    ``N / (f^2 sinc^2(d fx / 2pi) sinc^2(d fy / 2pi))``, DC zeroed
    (reference ``fast/ao_power_spectra.py:148-161``). Pixels where the sinc
    response vanishes are zeroed (they lie outside the corrected band; the
    reference produced ``inf`` there, see module docstring).
    """
    fabs = jnp.asarray(freq.fabs)
    fx = jnp.asarray(freq.fx)
    fy = jnp.asarray(freq.fy)

    N = noise_variance
    if freq.freq_per_layer:
        N = N / fabs.shape[0]
    denom = (fabs ** 2
             * jnp.sinc(Dsubap * fx / (2 * np.pi)) ** 2
             * jnp.sinc(Dsubap * fy / (2 * np.pi)) ** 2)
    powerspec = jnp.where(denom > 0, N / jnp.where(denom > 0, denom, 1.0), 0.0)
    mid2 = int(powerspec.shape[-2] / 2)
    mid1 = int(powerspec.shape[-1] / 2)
    powerspec = powerspec.at[..., mid2, mid1].set(0.0)
    return lf_mask * powerspec


@functools.partial(jax.jit, static_argnames=("lmax", "kmax", "per_layer",
                                              "has_v", "nlayers"))
def _alias_core(fx, fy, fabs, X, Y, lf_mask, p, v, Delta_t, Dsubap, L0, l0,
                lmax, kmax, per_layer, has_v, nlayers):
    mid2 = int(fx.shape[-2] / 2)
    mid1 = int(fy.shape[-1] / 2)

    if has_v:
        if per_layer:
            fx_t, fy_t = fx, fy
        else:
            fx_t = jnp.broadcast_to(fx, (nlayers,) + fx.shape)
            fy_t = jnp.broadcast_to(fy, (nlayers,) + fy.shape)
        vx = v[:, 0][(slice(None),) + (None,) * (fx_t.ndim - 1)]
        vy = v[:, 1][(slice(None),) + (None,) * (fy_t.ndim - 1)]
        v_dot_kappa = fx_t * vx + fy_t * vy
    else:
        v_dot_kappa = 0.0

    sinc_term = jnp.sinc(Delta_t * v_dot_kappa / (2 * np.pi)) ** 2

    fabs_safe = jnp.where(fabs == 0, 1.0, fabs)
    term_0 = fx ** 2 * fy ** 2 / fabs_safe ** 4

    lks = np.array([(float(l), float(k), float(l == 0), float(k == 0))
                    for l in range(-lmax, lmax + 1)
                    for k in range(-kmax, kmax + 1)
                    if not (l == 0 and k == 0)])
    lks = jnp.asarray(lks)

    row_mask = jnp.zeros(fx.shape[-2:]).at[mid2, :].set(1.0)
    col_mask = jnp.zeros(fx.shape[-2:]).at[:, mid1].set(1.0)
    dc_mask = jnp.zeros(fx.shape[-2:]).at[mid2, mid1].set(1.0)

    # For shared (non-per-layer) grids every term in the (l, k) sum is
    # linear in the layer's Cn2 with a layer-independent spatial shape, so
    # the scan accumulates ONE unit-Cn2 field and the per-layer scaling is
    # applied once at the end — nlayers-fold less work than accumulating
    # the per-layer stack (per-layer grids keep the direct path).
    p_scan = p if per_layer else jnp.ones((), p.dtype)

    def body(acc, lk):
        l, k, is_l0, is_k0 = lk
        Xs = X - 2 * np.pi * k / Dsubap
        Ys = Y - 2 * np.pi * l / Dsubap
        fabs_sh = jnp.sqrt(Xs ** 2 + Ys ** 2)
        term_2 = turb_powerspectrum_vonKarman(
            _FabsFreq(fabs_sh, per_layer), p_scan, L0=L0, l0=l0)
        Ys_safe = jnp.where(Ys == 0, 1.0, Ys)
        Xs_safe = jnp.where(Xs == 0, 1.0, Xs)
        term_1 = (fx / Ys_safe + fy / Xs_safe) ** 2
        mult = term_1 * term_2 * term_0
        # special-cased axes (reference ``ao_power_spectra.py:208-213``)
        mult = mult * (1 - dc_mask)
        mult = jnp.where(is_l0 > 0, mult * (1 - row_mask) + term_2 * row_mask,
                         mult)
        mult = jnp.where(is_k0 > 0, mult * (1 - col_mask) + term_2 * col_mask,
                         mult)
        return acc + mult, None

    if per_layer:
        acc0 = jnp.zeros(fabs.shape)
    else:
        acc0 = jnp.zeros((1,) + fabs.shape)
    alias, _ = lax.scan(body, acc0, lks)
    if not per_layer:
        alias = alias * p[(slice(None),) + (None,) * (alias.ndim - 1)]
    alias = alias * sinc_term * lf_mask
    return jnp.nan_to_num(alias, nan=0.0, posinf=0.0, neginf=0.0)


def Jol_alias_openloop(freq, Dsubap, p, lf_mask, v=None, Delta_t=None,
                       wvl=None, lmax=3, kmax=3, L0=np.inf, l0=1e-6):
    """Open-loop WFS aliasing PSD.

    Double sum over folded frequency offsets ``(l, k)`` of shifted von
    Karman spectra with geometric gradient terms and the servo sinc
    (reference ``fast/ao_power_spectra.py:163-223``). The ``(2*lmax+1) *
    (2*kmax+1) - 1`` shifted-grid terms run as a jit-compiled ``lax.scan``
    (cached per grid shape — this is the dominant init cost for parameter
    sweeps) so peak memory stays at one per-layer grid.
    """
    per_layer = freq.freq_per_layer
    nlayers = 1 if np.ndim(p) == 0 else len(p)
    p_arr = jnp.asarray(p)

    # unrotated axis meshes (the reference shifts the *axes*, not the
    # possibly rotated mesh, ``ao_power_spectra.py:201-203``)
    fx_axis = jnp.asarray(freq.fx_axis)
    fy_axis = jnp.asarray(freq.fy_axis)
    if fx_axis.ndim == 2:
        X = fx_axis[:, None, :] * jnp.ones_like(fy_axis)[:, :, None]
        Y = jnp.ones_like(fx_axis)[:, None, :] * fy_axis[:, :, None]
    else:
        X = fx_axis[None, :] * jnp.ones_like(fy_axis)[:, None]
        Y = jnp.ones_like(fx_axis)[None, :] * fy_axis[:, None]

    has_v = v is not None
    v_arr = jnp.asarray(v) if has_v else jnp.zeros((nlayers, 2))
    Delta_t = 0.0 if Delta_t is None else Delta_t

    return _alias_core(
        jnp.asarray(freq.fx), jnp.asarray(freq.fy), jnp.asarray(freq.fabs),
        X, Y, jnp.asarray(lf_mask), p_arr, v_arr,
        jnp.asarray(Delta_t, jnp.float64), jnp.asarray(Dsubap, jnp.float64),
        jnp.asarray(L0, jnp.float64), jnp.asarray(l0, jnp.float64),
        lmax, kmax, per_layer, has_v, nlayers)


def G_AO_PAOLA(freq, mask, mode="AO", h=None, v=None, dtheta=(0, 0), Tx=None,
               wvl=None, Zmax=None, tl=0, Delta_t=0, Dsubap=None, modal=False,
               modal_mult=1, x_max=None):
    """Open-loop AO residual transfer function (PAOLA model).

    ``1 - 2 cos(dr.kappa - tl v.kappa) sinc(Dt v.kappa / 2pi) + sinc^2``
    combining per-layer anisoplanatism (point-ahead offset), loop delay and
    WFS integration, applied inside the corrected mask and passed through
    outside. LGSAO blends a tip-tilt-only variant through a Z<=4 Zernike
    filter. Reference ``fast/ao_power_spectra.py:225-270``.

    ``x_max`` (static float): bound on ``max(fabs) * Tx / 2`` for the LGSAO
    Zernike quadrature — required when ``fabs`` is traced under ``jit``.
    """
    if mode not in ["NOAO", "AO", "TT", "LGSAO"]:
        raise Exception(
            'Mode not recognised, note that "AO_PA", "TT_PA" and "LGS_PA" '
            'are now "AO" and "TT" and "LGSAO')
    if mode == "NOAO":
        return 1

    fx = jnp.asarray(freq.fx)
    fy = jnp.asarray(freq.fy)
    fabs = jnp.asarray(freq.fabs)
    nlayers = len(h)

    if freq.freq_per_layer:
        fx_t, fy_t = fx, fy
    else:
        fx_t = jnp.broadcast_to(fx, (nlayers,) + fx.shape)
        fy_t = jnp.broadcast_to(fy, (nlayers,) + fy.shape)

    h = jnp.asarray(h, dtype=fx_t.dtype)
    dtheta = jnp.asarray(dtheta, dtype=fx_t.dtype)
    dr = dtheta[None, :] / 206265.0 * h[:, None]  # (nlayers, 2)
    exp = (slice(None),) + (None,) * (fx_t.ndim - 1)
    dr_dot_kappa = fx_t * dr[:, 0][exp] + fy_t * dr[:, 1][exp]

    if v is not None:
        v = jnp.asarray(v, dtype=fx_t.dtype)
        v_dot_kappa = fx_t * v[:, 0][exp] + fy_t * v[:, 1][exp]
    else:
        v_dot_kappa = 0.0

    term_1 = 2 * jnp.cos(dr_dot_kappa - tl * v_dot_kappa)
    term_2 = jnp.sinc(Delta_t * v_dot_kappa / (2 * np.pi))
    aniso = 1 - term_1 * term_2 + term_2 ** 2

    if mode in ("AO", "TT"):
        return aniso * mask + (1 - mask)

    if mode == "LGSAO":
        term_1_lgs = 2 * jnp.cos(-tl * v_dot_kappa)
        term_2_lgs = jnp.sinc(Delta_t * v_dot_kappa / (2 * np.pi))
        aniso_lgs = 1 - term_1_lgs * term_2_lgs + term_2_lgs ** 2
        Z = zernike_squared_filter(fabs, fx, fy, Tx, 4, n_noll_start=1,
                                   x_max=x_max)
        return mask * (Z * aniso + (1 - Z) * aniso_lgs) + (1 - mask)

    raise Exception("Shouldn't be here")


def DM_transfer_function(fx, fy, fabs, mode, Zmax=None, D=None, dsubap=None):
    """DM spatial transfer function ('perfect' or 'zernike')."""
    if mode == "perfect":
        return 1.0
    if mode == "zernike":
        return zernike_filter(fabs, fx, fy, D, Zmax)
    raise NotImplementedError("Choose DM that is implemented")


def G_AO_PAOLA_closedloop(fx, fy, fabs, h, dtheta=(0, 0), Delta_t=0.0, tl=0.0,
                          gloop=1.0, v=None, dsubap=None, DM="perfect",
                          Zmax=None, D=None, nu=1, modal=False, modal_mult=1):
    """Closed-loop integrator variant of the PAOLA transfer function.

    API-parity port of the reference's (never engine-called) closed-loop
    model (``fast/ao_power_spectra.py:314-357``); frequencies are converted
    to linear units as there.
    """
    Gamma_DM = DM_transfer_function(fx, fy, fabs, mode=DM, Zmax=Zmax, D=D,
                                    dsubap=dsubap)

    fx = jnp.asarray(fx) / (2 * np.pi)
    fy = jnp.asarray(fy) / (2 * np.pi)
    nlayers = len(h)

    fx_t = jnp.broadcast_to(fx, (nlayers,) + fx.shape)
    fy_t = jnp.broadcast_to(fy, (nlayers,) + fy.shape)

    h = jnp.asarray(h, dtype=fx_t.dtype)
    dtheta = jnp.asarray(dtheta, dtype=fx_t.dtype)
    dr = dtheta[None, :] / 206265.0 * h[:, None]
    exp = (slice(None),) + (None,) * (fx_t.ndim - 1)
    dr_dot_f = fx_t * dr[:, 0][exp] + fy_t * dr[:, 1][exp]

    if v is not None:
        v = jnp.asarray(v, dtype=fx_t.dtype)
        v_dot_f = fx_t * v[:, 0][exp] + fy_t * v[:, 1][exp]
    else:
        v_dot_f = 0.0

    sinc = jnp.sinc(Delta_t * v_dot_f)
    top = (1 + gloop ** 2 * Gamma_DM ** 2 * sinc ** 2 * (1 + nu ** 2 * Gamma_DM ** 2) / 2.0
           - jnp.cos(2 * np.pi * Delta_t * v_dot_f)
           + gloop * Gamma_DM ** 2 * sinc * nu *
           (jnp.cos(2 * np.pi * dr_dot_f + 2 * np.pi * (Delta_t / 2 - tl) * v_dot_f)
            - jnp.cos(2 * np.pi * dr_dot_f - 2 * np.pi * (Delta_t / 2 + tl) * v_dot_f))
           + gloop * Gamma_DM * sinc *
           (jnp.cos(2 * np.pi * (Delta_t / 2 + tl) * v_dot_f)
            - jnp.cos(2 * np.pi * (Delta_t / 2.0 - tl) * v_dot_f))
           - gloop ** 2 * Gamma_DM ** 3 * sinc ** 2 * nu
           * jnp.cos(2 * np.pi * dr_dot_f))

    bottom = (1 + gloop ** 2 * Gamma_DM ** 2 * sinc ** 2 / 2.0
              + gloop * Gamma_DM * sinc *
              (jnp.cos(2 * np.pi * (Delta_t / 2.0 + tl) * v_dot_f)
               - jnp.cos(2 * np.pi * (Delta_t / 2.0 - tl) * v_dot_f))
              - jnp.cos(2 * np.pi * Delta_t * v_dot_f))

    return top / bottom
