"""Numerical integration.

JAX re-implementation of the two integration helpers the reference engine
relies on (``fast/funcs.py:100-136``): composite-Simpson integration of 2-D
power spectra and path (layer) integration. The Simpson rule reproduces
scipy's ``simpson`` exactly, including the Cartwright last-interval
correction for even sample counts (the engine's grids usually have an even
number of points per side).
"""

import jax.numpy as jnp


def simpson(y, dx=1.0, axis=-1):
    """Composite Simpson integration with uniform spacing ``dx``.

    Matches ``scipy.integrate.simpson(y, dx=dx, axis=axis)`` for uniformly
    spaced samples: for an even number of samples, Simpson's rule is applied
    to the first N-1 points and Cartwright's correction
    ``dx * (5*y[-1] + 8*y[-2] - y[-3]) / 12`` handles the final interval.
    """
    y = jnp.moveaxis(y, axis, -1)
    n = y.shape[-1]
    if n < 2:
        raise ValueError("need at least 2 samples to integrate")
    if n == 2:
        return 0.5 * dx * (y[..., 0] + y[..., 1])

    def _odd_simpson(z):
        # z has an odd number of points -> even number of intervals
        return (dx / 3.0) * (
            z[..., 0] + z[..., -1]
            + 4.0 * z[..., 1:-1:2].sum(-1)
            + 2.0 * z[..., 2:-1:2].sum(-1)
        )

    if n % 2 == 1:
        return _odd_simpson(y)
    head = _odd_simpson(y[..., : n - 1])
    tail = dx * (5.0 * y[..., -1] + 8.0 * y[..., -2] - y[..., -3]) / 12.0
    return head + tail


def integrate_powerspectrum(power_spectrum, f):
    """Simpson-integrate a (stack of) 2-D power spectra over the last two axes.

    ``f`` is the 1-D frequency axis (assumed uniform and shared by both
    axes), as in the reference (``fast/funcs.py:100-115``).
    """
    df = f[1] - f[0]
    return simpson(simpson(power_spectrum, dx=df, axis=-1), dx=df, axis=-1)


def integrate_path(integrands, h=None, layer=True, axis=0):
    """Integrate along the propagation path.

    With the discrete layered model (the only branch the reference engine
    ever uses, ``fast/funcs.py:117-136``) this is a sum over the layer axis.
    The continuous branch integrates with Simpson over the (uniform) ``h``.
    """
    if layer:
        return integrands.sum(axis)
    dh = h[1] - h[0]
    return simpson(jnp.moveaxis(integrands, axis, -1), dx=dh, axis=-1)
