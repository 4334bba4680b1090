"""Temporal (frozen-flow) mode: statistics and cross-validation."""

import numpy as np
import pytest

import fast_tpu
from fast_tpu import synthesis, funcs
from conftest import make_test_params


def test_temporal_series_statistics():
    """Frozen-flow series has the phase variance the PSD predicts."""
    import jax

    p = make_test_params(TEMPORAL=True, NITER=200, NCHUNKS=2, SEED=2)
    sim = fast_tpu.Fast(p)
    # sample many independent screens at fixed coords -> variance check
    key = jax.random.key(3)
    screens = synthesis.synthesize_layer_screens(
        key, np.sqrt(sim.powerspec_per_layer), float(sim.freq.main.df))
    total_var = np.asarray(screens).sum(0).var()
    # single realization of a correlated field: loose bound only
    assert 0.2 * sim.phs_var < total_var < 5 * sim.phs_var


def test_temporal_logamp_coloring():
    """Colored log-amplitude series reproduces variance and correlation."""
    import jax

    # DT=1e-4 keeps the auto no-wrap grid small (NITER=4000 at DT=1e-3
    # would demand a 7200^2 grid); the coloring statistics are unaffected
    p = make_test_params(TEMPORAL=True, NITER=4000, NCHUNKS=4, SEED=5,
                         DT=1e-4)
    sim = fast_tpu.Fast(p)
    chi = np.asarray(synthesis.draw_logamp(
        jax.random.key(1), sim.Niter, sim.logamp_var,
        temporal_powerspec=sim.temporal_logamp_powerspec,
        dtype=np.float64))
    # variance within 20% of the analytic value (one realization of a
    # correlated series -> effective sample size is reduced)
    assert abs(chi.var() - sim.logamp_var) / sim.logamp_var < 0.4
    # neighbouring samples are positively correlated (frozen flow)
    ac = funcs.temporal_autocorrelation(chi)
    assert ac[1] > 0.2 * ac[0]


def test_temporal_run_finite_and_correlated():
    p = make_test_params(TEMPORAL=True, NITER=400, NCHUNKS=4, SEED=6)
    sim = fast_tpu.Fast(p)
    res = sim.run()
    I = np.asarray(res.power)
    assert np.isfinite(I).all()
    # consecutive samples of a frozen-flow series are correlated;
    # compare lag-1 autocorrelation against a shuffled series
    x = I / I.mean() - 1
    lag1 = (x[:-1] * x[1:]).mean()
    rng = np.random.default_rng(0)
    xs = rng.permutation(x)
    lag1_shuffled = (xs[:-1] * xs[1:]).mean()
    assert lag1 > 5 * abs(lag1_shuffled)


def test_temporal_crossval_statistics(reference_fast):
    """Temporal-mode MC statistics match the reference within tolerance."""
    p = make_test_params(TEMPORAL=True, NITER=600, NCHUNKS=6, SEED=11)
    ref = reference_fast.Fast(dict(p))
    mine = fast_tpu.Fast(dict(p))
    ref.run()
    mine.run()
    r_ref = np.asarray(ref.result.power) / ref.diffraction_limit
    r_mine = np.asarray(mine.result.power) / mine.diffraction_limit
    # correlated series -> wide tolerance on the mean
    assert abs(np.log(r_ref.mean() / r_mine.mean())) < 0.5
    # lag-1 autocorrelation of the intensity series should be similar
    def lag1(x):
        x = x / x.mean() - 1
        return (x[:-1] * x[1:]).mean() / (x * x).mean()
    assert abs(lag1(r_ref) - lag1(r_mine)) < 0.3


def test_chunk_continuity():
    """Frozen-flow trajectory advances continuously across chunk borders."""
    p = make_test_params(TEMPORAL=True, NITER=100, NCHUNKS=10, SEED=8,
                         DT=1e-4)
    sim = fast_tpu.Fast(p)
    I = np.asarray(sim.run().power)
    x = I / I.mean() - 1
    # correlation across the chunk boundary (indices 9->10) should be of
    # the same order as within-chunk lag-1 correlations
    within = np.mean([x[i] * x[i + 1] for i in range(5)])
    across = x[9] * x[10]
    assert np.sign(within) == np.sign(across) or abs(across) < 5 * abs(within)
