"""Synthesis-path equivalence tests.

All synthesis paths (fft / matmul / colfac / pallas) must draw from the
same Gaussian process; fft vs matmul are numerically identical, colfac is
distribution-identical (checked against the analytic covariance).
"""

import jax
import jax.numpy as jnp
import numpy as np

from fast_tpu import synthesis


def _targets(sqrt_ps, df):
    psd = np.asarray(sqrt_ps, float) ** 2
    N = psd.shape[0]
    B = np.fft.ifft2(np.fft.ifftshift(psd) * df ** 2).real * N * N
    return psd.sum() * df ** 2, B


def _autocov(ph, dr, dc):
    a = ph[:, : ph.shape[1] - dr or None, : ph.shape[2] - dc or None]
    b = ph[:, dr:, dc:]
    return (a * b).mean()


def test_pruned_equals_fft_f64():
    N, lo, hi = 64, 20, 44
    rng = np.random.default_rng(0)
    sqrt_ps = jnp.asarray(rng.random((N, N)) + 0.1)
    key = jax.random.key(7)
    a = synthesis.synthesize_screens_complex(key, sqrt_ps, 0.3, 4,
                                             crop=(lo, hi))
    W = synthesis.pruned_ift2_matrix(N, lo, hi, dtype=np.complex128)
    b = synthesis.synthesize_screens_pruned(key, sqrt_ps, 0.3, 4, W)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)


def test_colfac_covariance():
    N, lo, hi = 64, 20, 44
    rng = np.random.default_rng(1)
    sqrt_ps = rng.random((N, N)) + 0.2
    df = 0.37
    W = synthesis.pruned_ift2_matrix(N, lo, hi, dtype=np.complex128)
    L = synthesis.column_factors(sqrt_ps, df, W)
    scr = np.asarray(synthesis.synthesize_screens_colfac(
        jax.random.key(3), L.astype(np.complex64),
        W.astype(np.complex64), 5000))
    phs = np.concatenate([scr.real, scr.imag])
    var_target, B = _targets(sqrt_ps, df)
    assert abs(phs.var() - var_target) / var_target < 0.03
    for (dr, dc) in [(1, 0), (0, 3), (2, 2)]:
        assert abs(_autocov(phs, dr, dc) - B[dr, dc]) < 0.05 * var_target


def test_colfac_handles_masked_columns():
    """Fully-zero PSD columns (aggressive masks) still factor."""
    N, lo, hi = 32, 10, 22
    sqrt_ps = np.zeros((N, N))
    sqrt_ps[12:20, 12:20] = 1.0  # power only in a small corrected band
    W = synthesis.pruned_ift2_matrix(N, lo, hi, dtype=np.complex128)
    L = synthesis.column_factors(sqrt_ps, 0.5, W)
    assert np.isfinite(L).all()
    scr = np.asarray(synthesis.synthesize_screens_colfac(
        jax.random.key(0), L.astype(np.complex64),
        W.astype(np.complex64), 100))
    assert np.isfinite(scr).all()


def test_column_factors_host_blas_matches_f64():
    """The pure-BLAS host f32 path (used for big grids) matches the f64
    factorisation's column covariances, including fully-masked columns."""
    N, lo, hi = 64, 20, 44
    rng = np.random.default_rng(7)
    sqrt_ps = (rng.random((N, N)) + 0.1).astype(np.float64)
    sqrt_ps[:, 5] = 0.0  # one fully-masked column
    Wd = synthesis.pruned_ift2_matrix(N, lo, hi, dtype=np.complex128)
    L64 = synthesis.column_factors(sqrt_ps, 0.7, Wd)
    Lh = synthesis.column_factors_device(
        sqrt_ps, 0.7, Wd.astype(np.complex64), host=True)
    assert Lh.dtype == np.complex64
    assert np.isfinite(Lh).all()
    C64 = np.einsum("mpq,mrq->mpr", L64, L64.conj())
    Ch = np.einsum("mpq,mrq->mpr", Lh.astype(np.complex128),
                   Lh.conj().astype(np.complex128))
    rel = np.abs(Ch - C64).max() / np.abs(C64).max()
    assert rel < 1e-4


def test_column_factors_device_matches_host():
    """f32 accelerator factorisation reproduces the f64 column covariances."""
    N, lo, hi = 128, 40, 88
    rng = np.random.default_rng(3)
    sqrt_ps = (rng.random((N, N)) + 0.1).astype(np.float64)
    Wd = synthesis.pruned_ift2_matrix(N, lo, hi, dtype=np.complex128)
    L64 = synthesis.column_factors(sqrt_ps, 0.7, Wd)
    L32 = synthesis.column_factors_device(sqrt_ps, 0.7, Wd.astype(np.complex64))
    assert np.isfinite(L32).all()
    C64 = np.einsum("mpq,mrq->mpr", L64, L64.conj())
    C32 = np.einsum("mpq,mrq->mpr", L32.astype(np.complex128),
                    L32.conj().astype(np.complex128))
    rel = np.abs(C32 - C64).max() / np.abs(C64).max()
    assert rel < 1e-4


def test_host_blas_marks_failed_columns_nan(monkeypatch):
    """A column whose f32 Cholesky fails is marked NaN (not raised), so
    the engine's finite-check falls back to the f64 factorisation."""
    N, lo, hi = 32, 10, 22
    rng = np.random.default_rng(11)
    sqrt_ps = (rng.random((N, N)) + 0.1).astype(np.float64)
    W = synthesis.pruned_ift2_matrix(N, lo, hi, dtype=np.complex128)

    real_chol = np.linalg.cholesky
    count = {"n": 0}

    def flaky(a):
        count["n"] += 1
        if count["n"] == 3:
            raise np.linalg.LinAlgError("simulated f32 breakdown")
        return real_chol(a)

    monkeypatch.setattr(np.linalg, "cholesky", flaky)
    L = synthesis._column_factors_numpy_f32(sqrt_ps, 0.7, W)
    assert np.isnan(L[2]).all()
    ok = np.ones(N, bool)
    ok[2] = False
    assert np.isfinite(L[ok]).all()
