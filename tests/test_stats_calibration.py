"""Calibration of the correlated-series KS gate (VERDICT r4 #2).

The dossier's temporal equivalence rows compare autocorrelated power
series; ``fast_tpu.utils.stats.ks_2samp_correlated`` is the calibrated
statistic they gate on. These tests establish, on synthetic AR(1)-driven
lognormal series with known integrated autocorrelation time, that

* the null (two independent draws of the *same* process) rejects at
  <= the nominal rate — including persistence up to phi=0.98, where the
  round-4 thinned-KS gate's own null control failed (p=0.01), and
* the test retains power: a 15% scale shift at dossier-scale sample
  sizes is detected essentially always.

All CPU/numpy — no engine, no backend.
"""

import numpy as np
import pytest

from fast_tpu.utils.stats import integrated_autocorr_time, \
    ks_2samp_correlated


def ar1_lognormal(rng, n, phi, scale=1.0, burn=512):
    """exp(z_t) with z an AR(1) of unit marginal variance."""
    from scipy.signal import lfilter
    eps = rng.standard_normal(n + burn) * np.sqrt(1.0 - phi ** 2)
    z = lfilter([1.0], [1.0, -phi], eps)
    return scale * np.exp(z[burn:])


def test_integrated_autocorr_time_matches_theory():
    # AR(1) value process: tau_int = (1+phi)/(1-phi)
    rng = np.random.default_rng(0)
    for phi, n in ((0.0, 16384), (0.9, 65536)):
        from scipy.signal import lfilter
        eps = rng.standard_normal(n + 512) * np.sqrt(1 - phi ** 2)
        z = lfilter([1.0], [1.0, -phi], eps)[512:]
        tau = integrated_autocorr_time(z)
        expect = (1 + phi) / (1 - phi)
        assert expect / 1.4 < tau < expect * 1.4


def test_tau_respects_row_seams():
    # 2-D input: rows are independent series; tau must come from the
    # within-row ACF, not from a raveled array with spurious seams
    rng = np.random.default_rng(1)
    x2d = np.stack([ar1_lognormal(rng, 8192, 0.9) for _ in range(4)])
    tau2d = integrated_autocorr_time(np.log(x2d))
    expect = (1 + 0.9) / (1 - 0.9)
    assert expect / 1.5 < tau2d < expect * 1.5


@pytest.mark.parametrize("phi,n", [(0.0, 8192), (0.9, 16384),
                                   (0.98, 32768)])
def test_null_rejection_rate_at_most_nominal(phi, n):
    rng = np.random.default_rng(1234 + int(100 * phi))
    reps, alpha = 120, 0.05
    rej = 0
    for _ in range(reps):
        x = ar1_lognormal(rng, n, phi)
        y = ar1_lognormal(rng, n, phi)
        if ks_2samp_correlated(x, y)["pvalue"] < alpha:
            rej += 1
    # conservative by construction (max-over-quantiles tau); the gate
    # allows nominal + 2.5 binomial SEs. Round-4's thinned KS fails this
    # immediately at phi=0.9 (its own null control rejected at p=0.01).
    assert rej / reps <= alpha + 2.5 * np.sqrt(alpha * (1 - alpha) / reps)


def test_power_against_scale_shift():
    rng = np.random.default_rng(7)
    phi, n, reps = 0.9, 65536, 30
    rej = 0
    for _ in range(reps):
        x = ar1_lognormal(rng, n, phi)
        y = ar1_lognormal(rng, n, phi, scale=1.15)
        if ks_2samp_correlated(x, y)["pvalue"] < 0.05:
            rej += 1
    assert rej / reps >= 0.9


def test_batched_null():
    # the dossier's batched-vs-single row compares an (8, T) stack
    # against a concatenation of singles — null must pass there too
    rng = np.random.default_rng(9)
    xb = np.stack([ar1_lognormal(rng, 4096, 0.9) for _ in range(8)])
    yb = np.stack([ar1_lognormal(rng, 4096, 0.9) for _ in range(8)])
    out = ks_2samp_correlated(xb, yb)
    assert out["pvalue"] > 1e-3
    assert out["n_eff"] > 100
