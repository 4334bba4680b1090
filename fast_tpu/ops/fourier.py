"""Centered FFT conventions.

The whole engine uses the "shifted, centered" DFT convention of the
reference's aotools.fouriertransform dependency (used at ``fast/funcs.py:218``,
``fast/funcs.py:309``, ``fast/funcs.py:373``, ``fast/fast.py:745-749``):

* ``ft2(g, dx)  = fftshift(fft2(fftshift(g))) * dx**2``
* ``ift2(G, df) = ifftshift(ifft2(ifftshift(G))) * (N * df)**2``

With angular spatial frequencies ``kappa`` these satisfy
``ift2(Phi, df) ~= integral Phi(kappa) exp(i kappa.x) d^2kappa`` on the
centered grid with ``dx * df = 2*pi / N``, so a PSD normalised such that
``var = integral Phi d^2kappa`` transforms directly into its autocovariance.

These run on whatever backend the inputs live on; the Monte Carlo path calls
them with complex64 so the TPU FFT is used.
"""

import jax.numpy as jnp


def ft(g, delta):
    """1-D centered forward DFT over the last axis; ``delta`` = sample spacing."""
    return jnp.fft.fftshift(
        jnp.fft.fft(jnp.fft.fftshift(g, axes=-1), axis=-1), axes=-1) * delta


def ift(G, delta_f):
    """1-D centered inverse DFT over the last axis; ``delta_f`` = bin spacing."""
    n = G.shape[-1]
    return jnp.fft.ifftshift(
        jnp.fft.ifft(jnp.fft.ifftshift(G, axes=-1), axis=-1), axes=-1
    ) * (n * delta_f)


def ft2(g, delta):
    """2-D centered forward DFT over the last two axes."""
    return jnp.fft.fftshift(
        jnp.fft.fft2(jnp.fft.fftshift(g, axes=(-2, -1)), axes=(-2, -1)),
        axes=(-2, -1)) * delta ** 2


def ift2(G, delta_f):
    """2-D centered inverse DFT over the last two axes.

    Scaled by ``(N * delta_f)**2`` so that for a PSD input it approximates
    ``integral Phi exp(i kappa.x) d^2kappa`` (see module docstring). Assumes
    square last-two axes, matching the engine's grids.
    """
    n = G.shape[-1]
    return jnp.fft.ifftshift(
        jnp.fft.ifft2(jnp.fft.ifftshift(G, axes=(-2, -1)), axes=(-2, -1)),
        axes=(-2, -1)) * (n * delta_f) ** 2
