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


class TestARFrozenFlow:
    """AR(1)-in-Fourier temporal path (fixed grid, arXiv:1512.05424)."""

    def test_mode_variance_preserved(self):
        """The AR update's stationary per-mode variance equals the draw's."""
        import jax
        import jax.numpy as jnp

        rng_psd = np.random.default_rng(1)
        sqrt_psd_df = jnp.asarray(
            rng_psd.uniform(0.5, 2.0, (2, 16, 16)), jnp.float32)
        ph = jnp.exp(1j * jnp.asarray(
            rng_psd.uniform(-3, 3, (2, 16, 16)), jnp.float32)).astype(
                jnp.complex64)
        alpha = jnp.full((2, 1, 1), 0.9, jnp.float32)
        s1ma = jnp.sqrt(1 - alpha ** 2)

        def one(key):
            k0, k1 = jax.random.split(key)
            a0 = synthesis.complex_normal(k0, (2, 16, 16)) * sqrt_psd_df
            a, _, _ = synthesis.ar_flow_series(
                a0, k1, ph, sqrt_psd_df, alpha, s1ma, 50, True)
            return a

        keys = jax.random.split(jax.random.key(7), 400)
        a_fin = jax.vmap(one)(keys)  # (400, 2, 16, 16)
        var = np.asarray(jnp.abs(a_fin) ** 2).mean(0)
        expect = 2 * np.asarray(sqrt_psd_df) ** 2  # E|CN|^2 = 2
        np.testing.assert_allclose(var, expect, rtol=0.35)
        assert abs(var.mean() / expect.mean() - 1) < 0.05

    def test_pure_frozen_flow_is_exact_translation(self):
        """alpha=1: step t equals the t-pixel periodic roll of step 0."""
        import jax
        import jax.numpy as jnp
        from fast_tpu.ops.fourier import ift2

        N = 32
        dx = 0.02
        df = 2 * np.pi / (N * dx)
        fx_axis = np.arange(-N / 2, N / 2) * df
        fxm = np.tile(fx_axis, (N, 1))
        fym = fxm.T
        sqrt_psd_df = jnp.asarray(
            np.random.default_rng(2).uniform(0.5, 1, (1, N, N)), jnp.float32)
        # wind = exactly one pixel per step along x
        vx = dx / 1.0  # with dt = 1
        ph = jnp.exp(1j * jnp.asarray(fxm * vx, jnp.float64)[None]).astype(
            jnp.complex64)
        a0 = synthesis.complex_normal(jax.random.key(0), (1, N, N)) \
            * sqrt_psd_df
        alpha = jnp.ones((1, 1, 1), jnp.float32)
        _, _, A = synthesis.ar_flow_series(
            a0, jax.random.key(1), ph, sqrt_psd_df, alpha, 0 * alpha, 5,
            False)
        scr = np.asarray(ift2(A, 1.0).real)
        scr0 = np.asarray(ift2(a0.sum(0), 1.0).real)
        for t in range(5):
            rolled = np.roll(scr0, -(t + 1), axis=1)
            np.testing.assert_allclose(scr[t], rolled, rtol=2e-4, atol=2e-5)

    def test_ar_engine_run_statistics(self):
        """AR series: stationary, frozen-flow-correlated, iid-like marginal."""
        from scipy.stats import ks_2samp

        p = make_test_params(NPXLS=164, NITER=3000, NCHUNKS=30, SEED=3)
        sa = fast_tpu.Fast({**p, "TEMPORAL": True, "TEMPORAL_SYNTH": "ar"})
        assert sa.Npxls == 164  # grid does NOT grow with NITER
        Ia = np.asarray(sa.run().power)
        assert np.isfinite(Ia).all()
        # stationarity: thirds agree in mean within correlated-series noise
        t1, t3 = Ia[:1000], Ia[-1000:]
        assert abs(t1.mean() / t3.mean() - 1) < 0.5
        # short-lag correlation is high (frozen flow)
        x = Ia - Ia.mean()
        ac1 = (x[:-1] * x[1:]).mean() / x.var()
        assert ac1 > 0.9
        # marginal matches iid draws on the same grid (subsample beyond
        # the correlation time)
        si = fast_tpu.Fast({**p, "TEMPORAL": False, "SYNTH": "fft",
                            "SEED": 11})
        Ii = np.asarray(si.run().power)
        assert ks_2samp(Ia[::150], Ii).pvalue > 1e-3

    def test_auto_rule_picks_ar_for_long_series(self):
        p = make_test_params(TEMPORAL=True, NITER=50000, NCHUNKS=500,
                             NPXLS=64, DX=0.02, SEED=4)
        sim = fast_tpu.Fast(p)
        assert sim._temporal_synth == "ar"
        assert sim.Npxls == 64
        assert (sim._ar_alpha < 1).any()  # long series -> boiling on
        # short series keeps pure frozen flow under 'auto'
        p2 = make_test_params(TEMPORAL=True, NITER=50, NPXLS=164,
                              NCHUNKS=1, TEMPORAL_SYNTH="ar", SEED=4)
        sim2 = fast_tpu.Fast(p2)
        assert (sim2._ar_alpha == 1).all()

    def test_bad_synth_rejected(self):
        p = make_test_params(TEMPORAL=True, TEMPORAL_SYNTH="banana")
        with pytest.raises(ValueError, match="TEMPORAL_SYNTH"):
            fast_tpu.Fast(p)
        p = make_test_params(TEMPORAL=True, TEMPORAL_NOISE="banana")
        with pytest.raises(ValueError, match="TEMPORAL_NOISE"):
            fast_tpu.Fast(p)

    def test_fused_coupling_path_matches_fft_path(self):
        """Per-step pruned-DFT+detector scan equals the batched-ifft2 AR
        path on the same seed (same noise stream, different synthesis)."""
        p = make_test_params(NPXLS=128, NITER=200, NCHUNKS=4, SEED=9,
                             TEMPORAL=True, TEMPORAL_SYNTH="ar",
                             TEMPORAL_ALPHA=0.98)
        s_mm = fast_tpu.Fast(dict(p))          # SYNTH=auto -> fused matmuls
        s_ft = fast_tpu.Fast({**p, "SYNTH": "fft"})
        I_mm = np.asarray(s_mm.run().power)
        I_ft = np.asarray(s_ft.run().power)
        assert "w2" in s_mm._run_all_fn_temporal_ar().keywords["C"]
        assert "w2" not in s_ft._run_all_fn_temporal_ar().keywords["C"]
        np.testing.assert_allclose(I_mm, I_ft, rtol=2e-3, atol=1e-9)


@pytest.mark.parametrize("tsynth", ["screens", "ar"])
def test_temporal_progress_bar(tsynth):
    """run(progress=True) works in temporal mode (VERDICT r4 #9): one
    dispatch per chunk with the AR state (or screen set) carried across
    the host boundary. Screens mode reuses the same keys and per-chunk
    math as the single-program path; AR mode draws independent per-chunk
    noise keys, so the comparison is statistical."""
    p = make_test_params(TEMPORAL=True, NITER=200, NCHUNKS=4, SEED=9,
                         TEMPORAL_SYNTH=tsynth)
    sim = fast_tpu.Fast(p)
    res_p = sim.run(progress=True)
    Ip = np.asarray(res_p.power)
    assert Ip.shape == (200,)
    assert np.isfinite(Ip).all() and (Ip >= 0).all()
    res = fast_tpu.Fast(dict(p)).run()
    I = np.asarray(res.power)
    if tsynth == "screens":
        # same screen/chi keys, same trajectory: identical up to
        # compilation-order float noise
        np.testing.assert_allclose(Ip, I, rtol=1e-4, atol=1e-12)
    else:
        assert abs(np.log(Ip.mean() / I.mean())) < 0.7


def test_temporal_progress_bar_coherent():
    p = make_test_params(TEMPORAL=True, NITER=120, NCHUNKS=3, SEED=13,
                         TEMPORAL_SYNTH="ar", COHERENT=True)
    res = fast_tpu.Fast(p).run(progress=True)
    I = np.asarray(res.power)
    assert I.shape == (120,) and np.isfinite(I).all()
    assert np.iscomplexobj(res._r)
