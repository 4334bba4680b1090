"""Fused Pallas synthesis kernel tests.

Shape/plumbing tests run everywhere via the Pallas TPU interpreter (whose
PRNG stub returns zeros, so statistics are only checked on real TPU
hardware — see the `tpu` marker; the statistical validation also runs in
bench warmup).
"""

import jax
import numpy as np
import pytest

from fast_tpu import synthesis
from fast_tpu.ops import pallas_synth

on_tpu = any(d.platform != "cpu" for d in jax.devices())


def test_interpret_shapes():
    N, lo, hi = 64, 20, 44
    sqrt_ps = np.ones((N, N), np.float32)
    W = synthesis.pruned_ift2_matrix(N, lo, hi, dtype=np.complex64)
    phs = pallas_synth.fused_synthesis(1, sqrt_ps, 0.3, 6, W, interpret=True)
    assert phs.shape == (12, 24, 24)
    assert phs.dtype == np.float32
    assert np.isfinite(np.asarray(phs)).all()


def test_interpret_fused_detect_shapes():
    N, lo, hi = 64, 20, 44
    sqrt_ps = np.ones((N, N), np.float32)
    W = synthesis.pruned_ift2_matrix(N, lo, hi, dtype=np.complex64)
    pm = np.ones((24, 24), np.float32)
    c = pallas_synth.fused_synthesis_detect(1, sqrt_ps, 0.3, 6, W, pm,
                                            interpret=True)
    assert c.shape == (12, 2)
    assert np.isfinite(np.asarray(c)).all()


@pytest.mark.skipif(not on_tpu, reason="needs TPU hardware PRNG")
def test_statistics_on_tpu():
    N, lo, hi = 64, 20, 44
    rng = np.random.default_rng(0)
    sqrt_ps = (rng.random((N, N)) + 0.2).astype(np.float32)
    W = synthesis.pruned_ift2_matrix(N, lo, hi, dtype=np.complex64)
    df = 0.37
    phs = np.asarray(pallas_synth.fused_synthesis(123, sqrt_ps, df, 8000, W))

    psd = sqrt_ps.astype(np.float64) ** 2
    B = np.fft.ifft2(np.fft.ifftshift(psd) * df ** 2).real * N * N
    assert abs(phs.var() - psd.sum() * df ** 2) / (psd.sum() * df ** 2) < 0.02

    def autocov(ph, dr, dc):
        a = ph[:, : ph.shape[1] - dr or None, : ph.shape[2] - dc or None]
        b = ph[:, dr:, dc:]
        return (a * b).mean()

    for (dr, dc) in [(1, 0), (0, 3), (2, 2)]:
        assert abs(autocov(phs, dr, dc) - B[dr, dc]) < 0.05 * phs.var()

    # determinism and independence
    phs2 = np.asarray(pallas_synth.fused_synthesis(123, sqrt_ps, df, 8000, W))
    np.testing.assert_array_equal(phs, phs2)
    assert abs(np.corrcoef(phs[0].ravel(), phs[1].ravel())[0, 1]) < 0.1
