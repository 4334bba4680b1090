"""Tests for the reference-compatible `funcs` surface."""

import numpy as np

import jax
import jax.numpy as jnp

import fast_tpu
from fast_tpu import funcs, grids


def test_f_grid_dx_matches_spatial_frequencies():
    N, dx = 32, 0.05
    fx, fy, fabs, f = funcs.f_grid_dx(N, dx)
    sf = grids.SpatialFrequencies(N, dx)
    np.testing.assert_allclose(fx, sf.fx)
    np.testing.assert_allclose(fabs, sf.fabs)
    np.testing.assert_allclose(f, sf.f)


def test_f_grid_linear_log_shapes():
    fx, fy, fabs, f = funcs.f_grid_linear(25, 0.01)
    assert fx.shape == fy.shape == fabs.shape
    fx, fy, fabs, f = funcs.f_grid_log(25, 0.01, N=65)
    assert len(f) == 65 or len(f) == 64 + 1


def test_pdf_lognorm_normalised():
    Is = np.linspace(1e-4, 20, 200000)
    pdf = funcs.pdf_lognorm(Is, sigma=0.4)
    integral = np.trapezoid(pdf, Is)
    assert abs(integral - 1) < 1e-3


def test_gaussian_beam_parameters():
    # collimated beam: Theta_0 = 1
    Theta_0, Lambda_0, Theta, Lambda, Theta_bar = \
        funcs.calc_gaussian_beam_parameters(1000.0, np.inf, 0.1, 1.55e-6)
    assert Theta_0 == 1
    assert np.isclose(Theta + Theta_bar, 1)


def test_make_phase_fft_matches_synthesis():
    key = jax.random.key(0)
    N, df = 32, 0.2
    rng = np.random.default_rng(1)
    rand = rng.normal(size=(4, N, N)) + 1j * rng.normal(size=(4, N, N))
    phs = np.asarray(funcs.make_phase_fft(jnp.asarray(rand), df, double=True))
    assert phs.shape == (8, N, N)
    # doubling: first half = real part of the complex screen
    scr = np.asarray(funcs.make_phase_fft(jnp.asarray(rand), df, double=False))
    np.testing.assert_allclose(phs[:4], scr, rtol=1e-12)


def test_make_phase_subharm_matches_reference(reference_fast):
    """Subharmonic screens equal the reference's mode-sum for same coeffs."""
    p = dict(fast_tpu.conf.DEFAULTS)
    N, dx = 32, 0.05
    sf = grids.SpatialFrequencies(N, dx)
    sf.make_subharm_freqs()
    rng = np.random.default_rng(2)
    rand = (rng.normal(size=(3, 3, 3, 3))
            + 1j * rng.normal(size=(3, 3, 3, 3)))

    mine = np.asarray(funcs.make_phase_subharm(
        jnp.asarray(rand), sf, N, dx, double=True))

    ref_freq = reference_fast.fast.SpatialFrequencies(N, dx)
    ref_freq.make_subharm_freqs()
    theirs = reference_fast.funcs.make_phase_subharm(
        rand.copy(), ref_freq, N, dx, double=True)
    np.testing.assert_allclose(mine, theirs, rtol=1e-10, atol=1e-12)


def test_pdf_gammagamma():
    # normalised and unit-mean for moderate turbulence parameters
    alpha, beta = funcs.gammagamma_parameters(0.5)
    Is = np.linspace(1e-6, 30, 400000)
    pdf = funcs.pdf_gammagamma(Is, alpha, beta)
    assert np.all(pdf >= 0)
    assert abs(np.trapezoid(pdf, Is) - 1) < 1e-3
    assert abs(np.trapezoid(pdf * Is, Is) - 1) < 1e-3
    # scintillation index from the PDF matches 1/a + 1/b + 1/(ab)
    si = np.trapezoid(pdf * Is ** 2, Is) - 1
    si_expected = 1 / alpha + 1 / beta + 1 / (alpha * beta)
    assert abs(si - si_expected) / si_expected < 1e-2


def test_wind_correction():
    h = np.array([0.0, 10e3])
    wc = funcs.calculate_wind_correction(h, [3600, 0], 1.0)
    # 1 degree over 1 s at 10 km -> ~175 m/s apparent wind, negative x
    assert wc.shape == (2, 2)
    assert wc[1, 0] < -170
    assert wc[0, 0] == 0


def test_l_path():
    # zenith: slant range equals altitude
    assert np.isclose(funcs.l_path(500e3, 0), 500e3)
    # larger zenith angle -> longer path
    assert funcs.l_path(500e3, 60) > funcs.l_path(500e3, 30) > 500e3


def test_equivalent_layers_empty_slab():
    # concentrated profile: all Cn2 in the lowest 2 km of a 0-30 km span
    # -> upper slabs are empty. The reference's vendored copy divides by
    # zero there (fast/turbulence_models.py:83-99); here empty slabs get
    # zero weight and a finite slab-centre height/wind so the 5/3 moments
    # (isoplanatic angle, coherence time) are conserved exactly.
    from fast_tpu.models import atmosphere

    h = np.arange(0, 30000.0, 100.0)
    p = np.where(h < 2000.0, 1e-15, 0.0)
    w = atmosphere.Bufton_wind(h)
    h_el, cn2_el, w_el = atmosphere.equivalent_layers(h, p, 6, w=w)
    assert np.isfinite(h_el).all()
    assert np.isfinite(cn2_el).all()
    assert np.isfinite(w_el).all()
    # total Cn2 conserved; empty slabs carry zero weight
    np.testing.assert_allclose(cn2_el.sum(), p.sum())
    assert (cn2_el[1:] == 0).all()
    # 5/3 moments conserved (zero-weight layers contribute nothing)
    np.testing.assert_allclose(
        (cn2_el * h_el ** (5 / 3)).sum(), (p * h ** (5 / 3)).sum(),
        rtol=1e-12)
    np.testing.assert_allclose(
        (cn2_el * w_el ** (5 / 3)).sum(), (p * w ** (5 / 3)).sum(),
        rtol=1e-12)
