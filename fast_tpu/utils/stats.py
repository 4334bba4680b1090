"""Calibrated two-sample tests for stationary correlated series.

The temporal-mode equivalence gates (``scripts/validate_hw.py`` §4)
compare Monte-Carlo *series* whose samples are temporally correlated
(AR(1)-in-Fourier frozen flow: the power at step t decorrelates over
~D/(v·dt) steps). A plain two-sample KS test assumes iid samples and
overcounts the effective sample size by the integrated autocorrelation
time — it rejects two *identical* processes (round-4 dossier: the
serial-vs-serial null control itself failed at p=0.01 under 16x
thinning).

This module provides the calibrated replacement (VERDICT r4 #2):

* :func:`integrated_autocorr_time` — Sokal's self-consistent windowed
  estimator of tau_int = 1 + 2·sum_k rho(k).
* :func:`ks_2samp_correlated` — two-sample KS whose p-value uses
  effective sample sizes n/tau_int, with tau_int estimated from the
  *indicator* processes 1{x_t <= q} at several pooled quantiles (the
  ECDF's sampling variance is driven by the indicator autocorrelation,
  not the series' own — a heavy-tailed power series can have short
  value-autocorrelation but long indicator memory in the tail).

Calibration is tested on synthetic AR(1)-driven series with known
tau_int in ``tests/test_stats_calibration.py``: the null rejects at
<= the nominal rate across persistence levels up to phi=0.98, and a 5%
scale shift at the dossier sample sizes is detected with power > 0.9.

No analogue exists in the reference (it never compares correlated
series); the formulas are standard (Sokal 1997 lecture notes; the
asymptotic two-sample Kolmogorov distribution with the Stephens
small-sample correction).
"""

import numpy as np

__all__ = ["integrated_autocorr_time", "ks_2samp_correlated"]


def _acf(x):
    """Biased-normalisation autocorrelation function via FFT."""
    x = np.asarray(x, np.float64)
    n = x.size
    x = x - x.mean()
    m = 1 << (2 * n - 1).bit_length()
    f = np.fft.rfft(x, m)
    acov = np.fft.irfft(f * np.conj(f), m)[:n]
    if acov[0] <= 0:
        return None  # constant series
    return acov / acov[0]


def integrated_autocorr_time(x, c=5.0):
    """Sokal windowed estimate of the integrated autocorrelation time.

    tau_int(W) = 1 + 2·sum_{k<=W} rho(k), with the window W chosen
    self-consistently as the smallest W >= c·tau_int(W) (Sokal 1997;
    the same estimator emcee ships). Returns 1.0 for an (effectively)
    uncorrelated or constant series; clipped to >= 1.

    Args:
        x: 1-D stationary series, or 2-D (nseries, nsteps) — rows are
            treated as independent realizations of the same process
            (autocorrelation never crosses row seams) and tau is
            estimated from their averaged ACF.
        c: window constant (5 is standard).
    """
    x = np.asarray(x, np.float64)
    if x.ndim == 1:
        x = x[None]
    rhos = [r for r in (_acf(row) for row in x) if r is not None]
    if not rhos:
        return 1.0
    nmin = min(r.size for r in rhos)
    rho = np.mean([r[:nmin] for r in rhos], axis=0)
    taus = 1.0 + 2.0 * np.cumsum(rho[1:])
    ws = np.arange(1, taus.size + 1)
    hit = np.nonzero(ws >= c * taus)[0]
    tau = taus[hit[0]] if hit.size else taus[-1]
    return float(max(1.0, tau))


def ks_2samp_correlated(x, y, qs=(0.1, 0.25, 0.5, 0.75, 0.9), c=5.0):
    """Two-sample KS test for stationary correlated series.

    Computes the exact two-sample KS statistic D on the full samples
    (no thinning — full power), then an asymptotic p-value with the
    *effective* sample sizes n_eff = n / tau_int, where tau_int is the
    largest integrated autocorrelation time of the indicator processes
    1{x_t <= q} over the pooled quantiles ``qs``. Taking the max over
    quantiles is deliberately conservative: the gate must not reject
    identical processes.

    Args:
        x, y: 1-D series, or 2-D (nseries, nsteps) stacks of independent
            series from the same process (e.g. a batched kernel's
            output) — tau is estimated per the row structure, D on the
            flattened values.
        qs: pooled-sample quantiles at which indicator tau is estimated.
        c: Sokal window constant.

    Returns:
        dict with ``D``, ``pvalue``, ``tau_x``, ``tau_y``, ``n_eff``.
    """
    from scipy.stats import kstwobign, ks_2samp

    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    xf, yf = x.ravel(), y.ravel()
    quants = np.quantile(np.concatenate([xf, yf]), qs)
    tau_x = max(integrated_autocorr_time(
        (x <= q).astype(np.float64), c=c) for q in quants)
    tau_y = max(integrated_autocorr_time(
        (y <= q).astype(np.float64), c=c) for q in quants)
    nx_eff = xf.size / tau_x
    ny_eff = yf.size / tau_y
    D = float(ks_2samp(xf, yf).statistic)
    en = np.sqrt(nx_eff * ny_eff / (nx_eff + ny_eff))
    # Stephens' small-sample correction to the asymptotic Kolmogorov
    # distribution (Numerical Recipes §14.3.3)
    p = float(kstwobign.sf((en + 0.12 + 0.11 / en) * D))
    return {"D": D, "pvalue": min(1.0, p), "tau_x": float(tau_x),
            "tau_y": float(tau_y), "n_eff": float(en ** 2)}
