"""Function-level cross-validation of every AO spectral filter.

Covers paths the engine-level cross-validation doesn't reach: complex
Zernike filters, gamma-scaled and plus/minus variants, the standalone
piston/tip-tilt filters, Gtilt masks, and the closed-loop PAOLA transfer
function (dead code in the reference engine but part of its public API).
"""

import numpy as np
import pytest

from fast_tpu import ao_power_spectra as aps
from fast_tpu import grids


@pytest.fixture(scope="module")
def freq():
    return grids.SpatialFrequencies(64, 0.02)


@pytest.fixture(scope="module")
def ref_aps(reference_fast):
    import fast.ao_power_spectra as ref
    return ref


def assert_close(a, b, rtol=1e-9, atol=1e-12):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol,
                               atol=atol)


def test_zernike_ft(freq, ref_aps):
    phi = np.arctan2(freq.fy, freq.fx)
    for j in [1, 2, 3, 4, 5, 6, 11]:
        mine = np.asarray(aps.zernike_ft(freq.fabs, phi, 0.8, j))
        theirs = ref_aps.zernike_ft(freq.fabs, phi, 0.8, j)
        # reference leaves nan at DC (caller overwrites); compare off-DC
        mask = np.isfinite(theirs)
        assert_close(mine[mask], theirs[mask], rtol=1e-9, atol=1e-12)


def test_zernike_filter_complex(freq, ref_aps):
    mine = np.asarray(aps.zernike_filter(freq.fabs, freq.fx, freq.fy, 0.8, 6))
    theirs = ref_aps.zernike_filter(freq.fabs, freq.fx, freq.fy, 0.8, 6)
    assert_close(mine, theirs, rtol=1e-8, atol=1e-10)


def test_zernike_squared_filter_variants(freq, ref_aps):
    args = (freq.fabs, freq.fx, freq.fy, 0.8)
    for kwargs in [dict(n_noll=10), dict(n_noll=10, n_noll_start=4),
                   dict(n_noll=6, plusminus=True),
                   dict(n_noll=6, gamma=[0.5, 1.0, 2.0])]:
        mine = np.asarray(aps.zernike_squared_filter(*args, **kwargs))
        theirs = ref_aps.zernike_squared_filter(*args, **kwargs).real
        assert_close(mine, theirs, rtol=1e-8, atol=1e-10)


def test_piston_tiptilt_filters(freq, ref_aps):
    assert_close(aps.piston_filter(freq.fabs, 0.8),
                 ref_aps.piston_filter(freq.fabs.copy(), 0.8),
                 rtol=1e-9, atol=1e-12)
    assert_close(aps.tiptilt_filter(freq.fabs, 0.8),
                 ref_aps.tiptilt_filter(freq.fabs.copy(), 0.8),
                 rtol=1e-9, atol=1e-12)
    assert_close(aps.piston_tiptilt_filter(freq.fabs, 0.8),
                 ref_aps.piston_tiptilt_filter(freq.fabs.copy(), 0.8),
                 rtol=1e-9, atol=1e-12)
    assert_close(aps.piston_gtilt_filter(freq.fabs, freq.fx, freq.fy, 0.8),
                 ref_aps.piston_gtilt_filter(freq.fabs, freq.fx, freq.fy, 0.8),
                 rtol=1e-9, atol=1e-12)


def test_mask_lf_gtilt(freq, ref_aps):
    mine = np.asarray(aps.mask_lf(freq.main, 0.1, modal=True, Zmax=5, D=0.8,
                                  Gtilt=True))
    theirs = ref_aps.mask_lf(freq.main, 0.1, modal=True, Zmax=5, D=0.8,
                             Gtilt=True)
    assert_close(mine, theirs, rtol=1e-9, atol=1e-12)


def test_closedloop_transfer_function(freq, ref_aps):
    h = np.array([0.0, 5e3, 10e3])
    v = np.array([[5.0, 0.0], [0.0, 8.0], [-3.0, 3.0]])
    kwargs = dict(h=h, dtheta=[2, 1], Delta_t=1e-3, tl=5e-4, gloop=0.7,
                  v=v, DM="perfect", nu=1)
    mine = np.asarray(aps.G_AO_PAOLA_closedloop(
        freq.fx, freq.fy, freq.fabs, **kwargs))
    theirs = ref_aps.G_AO_PAOLA_closedloop(
        freq.fx.copy(), freq.fy.copy(), freq.fabs.copy(), **kwargs)
    assert_close(mine, theirs, rtol=1e-8, atol=1e-10)


def test_dm_transfer_function(freq, ref_aps):
    assert aps.DM_transfer_function(freq.fx, freq.fy, freq.fabs,
                                    "perfect") == 1.0
    mine = np.asarray(aps.DM_transfer_function(
        freq.fx, freq.fy, freq.fabs, "zernike", Zmax=6, D=0.8))
    theirs = ref_aps.DM_transfer_function(
        freq.fx, freq.fy, freq.fabs, "zernike", Zmax=6, D=0.8)
    assert_close(mine, theirs, rtol=1e-8, atol=1e-10)


def test_g_ao_paola_modes(freq, ref_aps):
    h = np.array([0.0, 10e3])
    v = np.array([[5.0, 0.0], [0.0, 8.0]])
    mask = np.asarray(aps.mask_lf(freq.main, 0.1))
    for mode in ["AO", "TT", "LGSAO"]:
        mine = np.asarray(aps.G_AO_PAOLA(
            freq.main, mask, mode, h, v, [4, 0], 0.8, 1.55e-6, 3, 1e-3, 1e-3))
        theirs = ref_aps.G_AO_PAOLA(
            freq.main, mask, mode, h, v, [4, 0], 0.8, 1.55e-6, 3, 1e-3, 1e-3)
        assert_close(mine, np.asarray(theirs).real, rtol=1e-8, atol=1e-10)
    assert aps.G_AO_PAOLA(freq.main, mask, "NOAO") == 1
    with pytest.raises(Exception):
        aps.G_AO_PAOLA(freq.main, mask, "bogus")
