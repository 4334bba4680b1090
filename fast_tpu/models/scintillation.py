"""Log-amplitude (scintillation) power spectra.

Reference ``fast/ao_power_spectra.py:272-301``: per-layer von Karman
spectrum times the Fresnel filter ``sin^2(wvl h f^2 / 4pi)``, filtered by
the pupil/mode spatial filter and path-integrated. The temporal mode's
high-resolution pupil-filter spline (reference ``fast/fast.py:394-405``)
becomes a uniform-grid bilinear resampler, which equals the reference's
``RectBivariateSpline(kx=1, ky=1)`` for interior points and stays
jit/vmap-compatible.
"""

import jax.numpy as jnp
import numpy as np

from .atmosphere import turb_powerspectrum_vonKarman
from ..ops.integrate import integrate_path


class PupilFilterSampler:
    """Bilinear resampler for a pupil filter tabulated on uniform axes.

    Axis pairing follows the reference spline (``fast/funcs.py:313``,
    evaluated at ``fast/ao_power_spectra.py:293-295``): rows of ``P`` run
    along ``x_axis``, columns along ``y_axis``; evaluation takes
    ``(row_values, col_values)`` and returns the outer-product grid.
    """

    def __init__(self, P, x_axis, y_axis):
        self.P = jnp.asarray(P)
        self.x0 = float(x_axis[0])
        self.dx = float(x_axis[1] - x_axis[0])
        self.y0 = float(y_axis[0])
        self.dy = float(y_axis[1] - y_axis[0])

    def __call__(self, row_vals, col_vals):
        nx, ny = self.P.shape
        rix = jnp.clip((jnp.asarray(row_vals) - self.x0) / self.dx, 0, nx - 1)
        ciy = jnp.clip((jnp.asarray(col_vals) - self.y0) / self.dy, 0, ny - 1)
        r0 = jnp.clip(jnp.floor(rix).astype(jnp.int32), 0, nx - 2)
        c0 = jnp.clip(jnp.floor(ciy).astype(jnp.int32), 0, ny - 2)
        fr = rix - r0
        fc = ciy - c0
        fr = fr[:, None]
        fc = fc[None, :]
        r0 = r0[:, None]
        c0 = c0[None, :]
        v00 = self.P[r0, c0]
        v01 = self.P[r0, c0 + 1]
        v10 = self.P[r0 + 1, c0]
        v11 = self.P[r0 + 1, c0 + 1]
        return (v00 * (1 - fr) * (1 - fc) + v01 * (1 - fr) * fc
                + v10 * fr * (1 - fc) + v11 * fr * fc)


def temporal_logamp_powerspec(fx_axes, fy_axes, h, cn2, wvl, sampler,
                              dfy, L0=np.inf, l0=1e-6, block=8192):
    """1-D temporal log-amplitude PSD, streamed over temporal-frequency blocks.

    Computes ``sum_y logamp_PSD(f) * dfy`` per temporal bin without ever
    materialising the (nlayers, Ny, Nx) per-layer grids the reference
    builds (``fast/fast.py:581-587`` with ``fast/fast.py:846-864``), whose
    memory grows linearly with NITER. Works because the von Karman +
    Fresnel terms depend only on ``|f|``, which is invariant under the
    per-layer wind rotation, and the pupil filter is sampled on the
    *unrotated* axes (reference ``ao_power_spectra.py:291-295``).

    Args:
        fx_axes: (nlayers, Nx) per-layer temporal x-axes (linear frequency).
        fy_axes: (nlayers, Ny) per-layer y-axes.
        h, cn2: per-layer heights and Cn2 dh.
        wvl: wavelength.
        sampler: :class:`PupilFilterSampler`.
        dfy: main-grid y-frequency spacing (integration weight).
        block: temporal bins per streamed block.

    Returns:
        (Nx,) array: the per-temporal-bin PSD, summed over layers.
    """
    fx_axes = np.asarray(fx_axes)
    fy_axes = np.asarray(fy_axes)
    h = np.asarray(h, dtype=float)
    cn2 = np.asarray(cn2, dtype=float)
    nlayers, Nx = fx_axes.shape

    km = 5.92 / l0
    k0 = (2 * np.pi) / L0
    pref = 2 * np.pi * (2 * np.pi / wvl) ** 2

    out = np.zeros(Nx)
    for i in range(nlayers):
        fy = jnp.asarray(fy_axes[i])[:, None]  # (Ny, 1)
        for lo_b in range(0, Nx, block):
            fx = jnp.asarray(fx_axes[i, lo_b:lo_b + block])[None, :]
            fabs2 = fx ** 2 + fy ** 2
            spec = 0.033 * cn2[i] * jnp.exp(-fabs2 / km ** 2) \
                / (fabs2 + k0 ** 2) ** (11 / 6.0)
            spec = jnp.where(jnp.isinf(spec), 0.0, spec)
            spec = spec * pref * jnp.sin(wvl * h[i] * fabs2 / (4 * np.pi)) ** 2
            spec = spec * sampler(fy_axes[i], fx_axes[i, lo_b:lo_b + block])
            out[lo_b:lo_b + block] += np.asarray(spec.sum(0) * dfy)
    return out


def logamp_powerspec(freq, h, cn2, wvl, pupilfilter=None, layer=True,
                     L0=np.inf, l0=1e-6):
    """Path-integrated log-amplitude PSD on the given frequency grid.

    ``pupilfilter`` may be an array (broadcast over layers) or a
    :class:`PupilFilterSampler` (sampled on each layer's axes — the
    temporal path).
    """
    fabs = jnp.asarray(freq.fabs)
    h = jnp.asarray(h, dtype=fabs.dtype)
    nlayers = h.shape[0]

    if freq.freq_per_layer:
        fabs_3d = fabs
    else:
        fabs_3d = jnp.broadcast_to(fabs, (nlayers,) + fabs.shape)

    powerspec = turb_powerspectrum_vonKarman(freq, cn2, L0=L0, l0=l0) \
        * 2 * np.pi * (2 * np.pi / wvl) ** 2

    exp = (slice(None),) + (None,) * (fabs_3d.ndim - 1)
    powerspec = powerspec * jnp.sin(wvl * h[exp] * fabs_3d ** 2 / (4 * np.pi)) ** 2

    if pupilfilter is not None:
        if isinstance(pupilfilter, PupilFilterSampler):
            fx_axis = np.asarray(freq.fx_axis)
            fy_axis = np.asarray(freq.fy_axis)
            if freq.freq_per_layer:
                P = jnp.stack([
                    pupilfilter(fy_axis[i], fx_axis[i])
                    for i in range(fx_axis.shape[0])
                ])
            else:
                P = pupilfilter(fy_axis, fx_axis)
            powerspec = powerspec * P
        else:
            powerspec = powerspec * jnp.asarray(pupilfilter)

    return integrate_path(powerspec, h, layer=layer)
