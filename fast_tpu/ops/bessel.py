"""Integer-order Bessel functions of the first kind on TPU.

The Zernike Fourier filters (reference ``fast/ao_power_spectra.py:10-117``)
need ``J_n(x)`` for integer orders on the full frequency grid. JAX ships no
``jv``, and porting coefficient-table implementations is both unpleasant and
hostile to the TPU vector units. Instead we evaluate the integral
representation

    J_n(x) = (1/pi) * integral_0^pi cos(n*theta - x*sin(theta)) d(theta)

with the composite trapezoid rule. For this integrand the trapezoid rule
converges geometrically: with M intervals the error is a sum of
``J_{2*m*M +/- n}(x)`` terms, which is below float64 roundoff once
``2*M - n - |x|`` is a few tens. Expanding the cosine turns the quadrature
into two matmuls shared across all requested orders:

    J_n(x) = (1/M) * sum_k w_k [cos(n theta_k) cos(x sin theta_k)
                                + sin(n theta_k) sin(x sin theta_k)]

i.e. ``(npoints, M+1) @ (M+1, norders)`` — MXU-friendly, machine-precision,
no lookup tables.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BLOCK = 4096  # points per quadrature block; bounds peak memory to ~tens of MB


def quadrature_order(x_max, n_max):
    """Number of trapezoid intervals for machine-precision J_n up to n_max.

    Error terms are ``J_{2M-n}(x)``; require ``2M - n_max >= x_max + 60``
    (J_k(x) for k > x + 60 is far below 1e-17), rounded up to a multiple
    of 8 for TPU-friendly shapes.
    """
    m = int(np.ceil((float(x_max) + float(n_max) + 60.0) / 2.0))
    return max(64, -(-m // 8) * 8)


@functools.partial(jax.jit, static_argnums=(2,))
def _besselj_quad(orders, x_flat, M):
    dtype = x_flat.dtype
    theta = (jnp.pi / M) * jnp.arange(M + 1, dtype=dtype)
    w = jnp.ones(M + 1, dtype=dtype).at[0].set(0.5).at[-1].set(0.5)
    ntheta = orders[:, None].astype(dtype) * theta  # (P, M+1)
    cos_n = (jnp.cos(ntheta) * w).T  # (M+1, P)
    sin_n = (jnp.sin(ntheta) * w).T
    sin_t = jnp.sin(theta)

    npts = x_flat.shape[0]
    nblocks = -(-npts // _BLOCK)
    pad = nblocks * _BLOCK - npts
    xb = jnp.pad(x_flat, (0, pad)).reshape(nblocks, _BLOCK)

    def block(xc):
        xs = xc[:, None] * sin_t  # (B, M+1)
        return (jnp.cos(xs) @ cos_n + jnp.sin(xs) @ sin_n) / M  # (B, P)

    out = jax.lax.map(block, xb)  # (nblocks, B, P)
    return out.reshape(nblocks * _BLOCK, -1)[:npts]


def besselj(orders, x, x_max=None, M=None):
    """``J_n(x)`` for one or more integer orders.

    Args:
        orders: int or 1-D sequence of non-negative integer orders.
        x: array of evaluation points (any shape).
        x_max: static bound on ``max |x|`` (required under ``jit``; if both
            ``x_max`` and ``M`` are omitted the bound is read eagerly from
            ``x``).
        M: explicit number of trapezoid intervals (overrides ``x_max``).

    Returns:
        Array of shape ``x.shape + (len(orders),)``, or ``x.shape`` if
        ``orders`` was a scalar.
    """
    scalar = np.ndim(orders) == 0
    orders_arr = jnp.atleast_1d(jnp.asarray(orders, dtype=jnp.int32))
    x = jnp.asarray(x)
    if M is None:
        if x_max is None:
            x_max = float(jnp.max(jnp.abs(x)))
        M = quadrature_order(x_max, int(np.max(np.atleast_1d(orders))))
    out = _besselj_quad(orders_arr, jnp.abs(x).ravel(), M)
    out = out.reshape(x.shape + (orders_arr.shape[0],))
    # J_n(-x) = (-1)^n J_n(x)
    sign = jnp.where(
        (jnp.asarray(orders_arr) % 2 == 1)[(None,) * x.ndim],
        jnp.sign(x)[..., None].astype(out.dtype),
        jnp.ones((), out.dtype),
    )
    # sign(0) = 0 would zero J_odd(0), but J_odd(0) = 0 anyway.
    out = out * sign
    if scalar:
        out = out[..., 0]
    return out
