"""Unit tests for the L0 numerics against scipy / analytic oracles."""

import numpy as np
import pytest
import scipy.integrate
import scipy.interpolate
import scipy.special

import jax.numpy as jnp

from fast_tpu.ops import bessel, fourier, integrate, interp, zernike, apertures


class TestBessel:
    def test_against_scipy_orders(self):
        x = np.linspace(0, 200, 2001)
        orders = [0, 1, 2, 3, 5, 8, 13, 21]
        J = np.asarray(bessel.besselj(orders, x))
        for i, n in enumerate(orders):
            ref = scipy.special.jv(n, x)
            assert np.max(np.abs(J[:, i] - ref)) < 1e-12, f"order {n}"

    def test_negative_x(self):
        x = np.linspace(-50, 50, 501)
        for n in [0, 1, 2, 5]:
            J = np.asarray(bessel.besselj(n, x))
            ref = scipy.special.jv(n, x)
            assert np.max(np.abs(J - ref)) < 1e-12

    def test_2d_input(self):
        x = np.abs(np.random.default_rng(0).normal(size=(17, 23))) * 30
        J = np.asarray(bessel.besselj([1, 4], x))
        assert J.shape == (17, 23, 2)
        assert np.allclose(J[..., 0], scipy.special.jv(1, x), atol=1e-13)
        assert np.allclose(J[..., 1], scipy.special.jv(4, x), atol=1e-13)


class TestSimpson:
    @pytest.mark.parametrize("n", [3, 4, 8, 9, 100, 101, 164])
    def test_matches_scipy(self, n):
        rng = np.random.default_rng(n)
        y = rng.normal(size=(5, n))
        dx = 0.37
        ref = scipy.integrate.simpson(y, dx=dx, axis=-1)
        mine = np.asarray(integrate.simpson(jnp.asarray(y), dx=dx, axis=-1))
        assert np.allclose(mine, ref, rtol=1e-13, atol=0)

    def test_integrate_path_continuous(self):
        # continuous (non-layered) branch: Simpson over uniform heights
        rng = np.random.default_rng(2)
        vals = rng.random((9, 5))
        h = np.linspace(0, 8000, 9)
        ref = scipy.integrate.simpson(vals, x=h, axis=0)
        mine = np.asarray(integrate.integrate_path(
            jnp.asarray(vals), h=jnp.asarray(h), layer=False, axis=0))
        assert np.allclose(mine, ref, rtol=1e-12)

    def test_integrate_powerspectrum_matches_scipy(self):
        rng = np.random.default_rng(7)
        ps = rng.random(size=(3, 64, 64))
        f = np.arange(-32, 32) * 0.11
        ref = scipy.integrate.simpson(
            scipy.integrate.simpson(ps, x=f), x=f)
        mine = np.asarray(integrate.integrate_powerspectrum(jnp.asarray(ps), f))
        assert np.allclose(mine, ref, rtol=1e-12)


class TestFourier:
    def test_ift2_scaling_parseval(self):
        # variance of synthesized screen equals integral of PSD
        rng = np.random.default_rng(3)
        N, df = 64, 0.21
        psd = rng.random((N, N))
        rand = (rng.normal(size=(2000, N, N))
                + 1j * rng.normal(size=(2000, N, N))) * np.sqrt(psd)
        scr = np.asarray(fourier.ift2(jnp.asarray(rand * df), 1.0)).real
        var = scr.var()
        assert np.isclose(var, psd.sum() * df ** 2, rtol=0.05)

    def test_ft_ift_1d_roundtrip(self):
        rng = np.random.default_rng(6)
        g = rng.normal(size=24) + 1j * rng.normal(size=24)
        delta = 0.13
        n = 24
        delta_f = 1.0 / (n * delta)
        back = np.asarray(fourier.ift(fourier.ft(jnp.asarray(g), delta),
                                      delta_f))
        ratio = back / g
        assert np.allclose(ratio, ratio[0], rtol=1e-10)

    def test_ft2_ift2_roundtrip(self):
        rng = np.random.default_rng(4)
        g = rng.normal(size=(32, 32))
        dx = 0.05
        N = 32
        df = 2 * np.pi / (N * dx)
        G = fourier.ft2(jnp.asarray(g, dtype=complex), dx)
        g2 = np.asarray(fourier.ift2(G, df)) / (2 * np.pi) ** 2 * (dx * df * N) ** 0
        # ift2(ft2(g, dx), df) = g * (N dx df / 2pi)^2 * (2pi)^2... check directly
        back = np.asarray(fourier.ift2(G, df))
        # With dx*df = 2pi/N: ift2(ft2(g)) = g * (2pi)^2 / (dx^2 * N^2 * df^2) ... derive numerically
        ratio = back.real / g
        assert np.allclose(ratio, ratio.flat[0], rtol=1e-10)


class TestInterp:
    def test_matches_spline_interior(self):
        rng = np.random.default_rng(5)
        N = 32
        img = rng.normal(size=(N, N))
        spline = scipy.interpolate.RectBivariateSpline(
            np.arange(N), np.arange(N), img, kx=1, ky=1, s=0)
        rows = np.sort(rng.uniform(0, N - 1, size=11))
        cols = np.sort(rng.uniform(0, N - 1, size=13))
        ref = spline(rows, cols)
        mine = np.asarray(interp.sample_grid_periodic(
            jnp.asarray(img), jnp.asarray(rows), jnp.asarray(cols)))
        assert np.allclose(mine, ref, atol=1e-12)

    def test_periodic_wrap(self):
        img = np.arange(16.0).reshape(4, 4)
        # halfway between last row and wrapped first row
        val = np.asarray(interp.bilinear_periodic(
            jnp.asarray(img), jnp.asarray([3.5]), jnp.asarray([0.0])))
        assert np.isclose(val[0], (img[3, 0] + img[0, 0]) / 2)


class TestZernike:
    def test_noll_table(self):
        # Noll 1976 table
        expected = {1: (0, 0), 2: (1, 1), 3: (1, -1), 4: (2, 0), 5: (2, -2),
                    6: (2, 2), 7: (3, -1), 8: (3, 1), 9: (3, -3), 10: (3, 3),
                    11: (4, 0)}
        for j, nm in expected.items():
            assert zernike.noll_to_nm(j) == nm


class TestApertures:
    def test_circle_area(self):
        c = apertures.circle(20, 64)
        assert abs(c.sum() - np.pi * 400) / (np.pi * 400) < 0.02
        # symmetric under 180 deg rotation
        assert (c == c[::-1, ::-1]).all()

    def test_pupil_normalisation(self):
        dx = 0.01
        pup = apertures.compute_pupil(64, dx, 0.5)
        assert np.isclose((pup ** 2).sum() * dx ** 2, 1.0)

    def test_gaussian_mode_energy(self):
        # integral of |mode|^2 == 1 for an amplitude-normalised gaussian
        dx = 0.01
        pup = apertures.compute_pupil(128, dx, 1.0)
        mode, w0 = apertures.compute_gaussian_mode(pup, dx, W0=0.3)
        assert w0 == 0.3
        scale = pup.max()
        energy = ((mode * scale) ** 2).sum() * dx ** 2
        assert np.isclose(energy, 1.0, rtol=1e-3)

    def test_optimize_fibre(self):
        dx = 0.01
        pup = apertures.compute_pupil(96, dx, 0.8)
        g, opt = apertures.optimize_fibre(pup, dx, return_size=True)
        # optimal gaussian ~ 0.45 * D for an unobscured circular aperture
        assert 0.2 < opt < 0.6


class TestFusedSincos:
    """The Pallas detect-stage fused sincos vs float64 numpy.

    One shared Cody–Waite reduction feeds both polynomials; accuracy
    must match library sin/cos (~1 ulp) over the documented domain
    |phi| <= 2^12 rad (residual-phase screens are O(10) rad).
    """

    def test_accuracy_across_magnitudes(self):
        import jax
        from fast_tpu.ops.pallas_synth import _sincos
        rng = np.random.default_rng(7)
        fn = jax.jit(_sincos)
        for scale in (1.0, 30.0, 1000.0, 4096.0):
            phi = (rng.uniform(-1, 1, 100000) * scale).astype(np.float32)
            s, c = fn(jnp.asarray(phi))
            ref_s = np.sin(phi.astype(np.float64))
            ref_c = np.cos(phi.astype(np.float64))
            assert np.abs(np.asarray(s, np.float64) - ref_s).max() < 2e-7
            assert np.abs(np.asarray(c, np.float64) - ref_c).max() < 2e-7

    def test_quadrant_boundaries(self):
        import jax
        from fast_tpu.ops.pallas_synth import _sincos
        k = np.arange(-64, 65)
        phi = (k * (np.pi / 2)).astype(np.float32)
        s, c = jax.jit(_sincos)(jnp.asarray(phi))
        np.testing.assert_allclose(np.asarray(s), np.sin(phi.astype(np.float64)),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(c), np.cos(phi.astype(np.float64)),
                                   atol=1e-5)
