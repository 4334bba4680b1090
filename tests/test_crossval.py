"""Cross-validation against the reference implementation.

The reference (``/root/reference``) runs in-process against the
tests/refshim aotools/astropy shim; every analytic field (masks, transfer
functions, power spectra, link budget, mean irradiance) must agree to
~1e-8 relative or better. Monte Carlo outputs are compared statistically.
"""

import numpy as np
import pytest

import fast_tpu
from conftest import make_test_params


def build_pair(reference_fast, **overrides):
    p = make_test_params(TEMPORAL=False, **overrides)
    ref = reference_fast.Fast(dict(p))
    mine = fast_tpu.Fast(dict(p))
    return ref, mine


def assert_close(a, b, rtol=1e-9, atol=1e-12, what=""):
    a = np.asarray(a, dtype=float)
    b = np.asarray(b, dtype=float)
    assert a.shape == b.shape, f"{what}: shape {a.shape} vs {b.shape}"
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol, err_msg=what)


CASES = {
    "base": {},
    "noao": {"AO_MODE": "NOAO"},
    "tt": {"AO_MODE": "TT"},
    "lgsao": {"AO_MODE": "LGSAO"},
    "modal": {"MODAL": True},
    "modal_zmax": {"MODAL": True, "ZMAX": 10},
    "noise": {"NOISE": 1.0},
    "obsc": {"OBSC_GROUND": 0.1},
    "L0": {"L0": 25.0},
    "down": {"PROP_DIR": "down"},
    "axicon": {"AXICON": True, "W0": 0.1, "OBSC_GROUND": 0.1},
    "inner_scale": {"l0": 0.01},
}


@pytest.mark.parametrize("case", list(CASES))
def test_analytic_fields_match(reference_fast, case):
    ref, mine = build_pair(reference_fast, **CASES[case])

    # grid resolution identical
    assert ref.Npxls == mine.Npxls
    assert ref.Npxls_pup == mine.Npxls_pup
    assert np.isclose(ref.dx, mine.dx)

    # geometry / beam
    assert_close(ref.h, mine.h, what="layer heights")
    assert_close(ref.cn2, mine.cn2, what="cn2")
    assert_close(ref.wind_vector, mine.wind_vector, what="wind vector")
    assert np.isclose(ref.L, mine.L)
    assert np.isclose(ref.W0, mine.W0), "optimised W0"
    assert np.isclose(ref.r0, mine.r0)
    assert np.isclose(ref.r0_los, mine.r0_los)

    # pupils (cropped)
    assert_close(ref.pupil, mine.pupil, what="pupil")
    assert_close(ref.pupil_mode, mine.pupil_mode, what="pupil mode")
    assert_close(ref.pupil_filter, mine.pupil_filter, rtol=1e-9,
                 what="pupil filter")

    # masks and transfer functions
    assert_close(ref.lf_mask, mine.lf_mask, what="lf mask")
    assert_close(np.asarray(ref.G_ao), np.asarray(mine.G_ao),
                 what="G_AO transfer function")

    # power spectra
    assert_close(ref.turb_powerspec, np.asarray(mine.turb_powerspec),
                 what="turbulence PSD")
    if not np.isscalar(ref.alias_powerspec) or ref.alias_powerspec != 0:
        assert_close(ref.alias_powerspec, np.asarray(mine.alias_powerspec),
                     rtol=1e-8, what="alias PSD")
    if not np.isscalar(ref.noise_powerspec) or ref.noise_powerspec != 0:
        assert_close(ref.noise_powerspec, np.asarray(mine.noise_powerspec),
                     rtol=1e-8, what="noise PSD")
    assert_close(ref.powerspec, mine.powerspec, rtol=1e-8,
                 what="residual phase PSD")
    assert_close(ref.logamp_powerspec, mine.logamp_powerspec, rtol=1e-8,
                 what="log-amplitude PSD")

    # scalar error budgets
    for attr in ("aniso_servo_error", "alias_error", "noise_error",
                 "fitting_error", "phs_var", "logamp_var"):
        rv = float(getattr(ref, attr))
        mv = float(getattr(mine, attr))
        assert np.isclose(rv, mv, rtol=1e-8), f"{attr}: {rv} vs {mv}"

    # link budget
    for key, val in ref.link_budget.items():
        assert np.isclose(val, mine.link_budget[key], rtol=1e-10), key
    assert np.isclose(ref.diffraction_limit, mine.diffraction_limit,
                      rtol=1e-10)


def test_mean_irradiance_matches(reference_fast):
    ref, mine = build_pair(reference_fast)
    psf_ref = ref.compute_mean_irradiance(onaxis=True)
    psf_mine = mine.compute_mean_irradiance(onaxis=True)
    assert np.isclose(psf_ref, psf_mine, rtol=1e-8)

    img_ref = ref.compute_mean_irradiance(onaxis=False)
    img_mine = mine.compute_mean_irradiance(onaxis=False)
    assert_close(img_ref, img_mine, rtol=1e-6, atol=abs(img_ref).max() * 1e-9,
                 what="mean irradiance map")


@pytest.mark.parametrize("mode", ["AO", "TT", "LGSAO", "NOAO"])
def test_subharmonics_match(reference_fast, mode):
    ref, mine = build_pair(reference_fast, SUBHARM=True, AO_MODE=mode)
    assert_close(ref.powerspec_subharm, mine.powerspec_subharm, rtol=1e-8,
                 what="subharmonic PSD")
    assert_close(ref.phs_var_subharm, mine.phs_var_subharm, rtol=1e-8,
                 what="subharmonic variance")
    assert_close(ref.lf_mask_subharm, mine.lf_mask_subharm, rtol=1e-9,
                 what="subharmonic mask")


def test_temporal_fields_match(reference_fast):
    p = make_test_params(TEMPORAL=True)
    ref = reference_fast.Fast(dict(p))
    mine = fast_tpu.Fast(dict(p))
    assert_close(ref.pixel_shifts, mine.pixel_shifts, what="pixel shifts")
    assert_close(ref.temporal_logamp_powerspec,
                 mine.temporal_logamp_powerspec, rtol=1e-7,
                 what="temporal log-amplitude PSD")


def test_mc_distribution_match(reference_fast):
    """Full fading distributions agree (two-sample Kolmogorov-Smirnov)."""
    from scipy.stats import ks_2samp

    p = make_test_params(TEMPORAL=False, NITER=4000, NCHUNKS=4, SEED=21)
    ref = reference_fast.Fast(dict(p))
    mine = fast_tpu.Fast(dict(p))
    ref.run()
    mine.run()
    r_ref = np.asarray(ref.result.power) / ref.diffraction_limit
    r_mine = np.asarray(mine.result.power) / mine.diffraction_limit
    stat, pvalue = ks_2samp(r_ref, r_mine)
    assert pvalue > 1e-3, f"KS stat {stat}, p={pvalue}"


def test_mc_statistics_match(reference_fast):
    """Monte Carlo fading statistics agree within sampling error."""
    p = make_test_params(TEMPORAL=False, NITER=4000, NCHUNKS=4, SEED=42)
    ref = reference_fast.Fast(dict(p))
    mine = fast_tpu.Fast(dict(p))
    ref.run()
    mine.run()
    r_ref = np.asarray(ref.result.power)
    r_mine = np.asarray(mine.result.power)
    # mean coupled power within ~4 combined standard errors
    se = np.sqrt(r_ref.var() / len(r_ref) + r_mine.var() / len(r_mine))
    assert abs(r_ref.mean() - r_mine.mean()) < 4 * se
    # scintillation index within 15% (slow-converging 2nd moment)
    si_ref = ref.result.scintillation_index
    si_mine = mine.result.scintillation_index
    assert abs(si_ref - si_mine) / si_ref < 0.15
