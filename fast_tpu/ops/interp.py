"""Periodic bilinear interpolation (gather-based).

TPU-native replacement for the reference's frozen-flow screen sampling,
which walked a scipy ``RectBivariateSpline`` per layer per iteration inside
a double Python loop with sort/argmax/roll wrap handling
(``fast/fast.py:607-637``). FFT-synthesised screens are exactly periodic, so
sampling them with periodic (mod-N) bilinear interpolation is both simpler
and more correct at the wrap seam; everything becomes one vectorised gather
that jit/vmaps cleanly.
"""

import jax.numpy as jnp


def bilinear_periodic(img, rows, cols):
    """Sample ``img`` (periodic) at fractional ``(rows, cols)``.

    Args:
        img: (..., N, N) array (leading batch axes broadcast against coords).
        rows, cols: float arrays of identical shape with fractional indices
            (any real value; wrapped mod N).

    Returns:
        Array of shape ``broadcast(img.shape[:-2], rows.shape)`` samples.
    """
    n = img.shape[-1]
    r0 = jnp.floor(rows)
    c0 = jnp.floor(cols)
    fr = (rows - r0).astype(img.dtype)
    fc = (cols - c0).astype(img.dtype)
    r0 = jnp.mod(r0, n).astype(jnp.int32)
    c0 = jnp.mod(c0, n).astype(jnp.int32)
    r1 = jnp.mod(r0 + 1, n)
    c1 = jnp.mod(c0 + 1, n)

    v00 = img[..., r0, c0]
    v01 = img[..., r0, c1]
    v10 = img[..., r1, c0]
    v11 = img[..., r1, c1]
    return (
        v00 * (1 - fr) * (1 - fc)
        + v01 * (1 - fr) * fc
        + v10 * fr * (1 - fc)
        + v11 * fr * fc
    )


def sample_grid_periodic(img, row_coords, col_coords):
    """Sample ``img`` on the outer product of 1-D fractional coordinates.

    Equivalent to the reference's ``RectBivariateSpline(kx=1, ky=1)``
    evaluated on a coordinate grid (``fast/fast.py:631``), but periodic at
    the seam. ``row_coords`` (R,) x ``col_coords`` (C,) -> (R, C) samples.

    Bilinear interpolation on an outer-product grid is separable, so this
    gathers whole rows, blends, then gathers columns — far fewer scattered
    element gathers than a naive 4-point lookup (TPU gathers are the cost).
    """
    n = img.shape[-1]
    r0f = jnp.floor(row_coords)
    fr = (row_coords - r0f).astype(img.dtype)[:, None]
    r0 = jnp.mod(r0f, n).astype(jnp.int32)
    r1 = jnp.mod(r0 + 1, n)
    tmp = img[r0] * (1 - fr) + img[r1] * fr  # (R, N)

    c0f = jnp.floor(col_coords)
    fc = (col_coords - c0f).astype(img.dtype)[None, :]
    c0 = jnp.mod(c0f, n).astype(jnp.int32)
    c1 = jnp.mod(c0 + 1, n)
    return tmp[:, c0] * (1 - fc) + tmp[:, c1] * fc
