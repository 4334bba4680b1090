"""End-to-end engine tests: per-feature smoke matrix + result semantics.

Mirrors the reference test strategy (``test/tests_pytest.py:36-127``,
SURVEY.md §4) with explicit per-case configs instead of the reference's
order-dependent shared-dict mutation.
"""

import numpy as np
import pytest

import fast_tpu
from conftest import make_test_params


def run_sim(p):
    sim = fast_tpu.Fast(p)
    sim.run()
    assert np.isfinite(sim.I).all()
    return sim


def test_config_file_path():
    """Construction from an executable .py config file (reference contract)."""
    import os
    cfg = os.path.join(os.path.dirname(__file__), "..", "examples",
                       "example_config.py")
    sim = fast_tpu.Fast(cfg)
    assert sim.Niter == 100
    assert sim.params["SEED"] == 1234
    res = sim.run()
    assert np.isfinite(res.power).all()


def test_config_parser_defaults_fill():
    c = fast_tpu.conf.ConfigParser({"NITER": 50})
    assert c.config["NITER"] == 50
    assert c.config["WVL"] == 1550e-9  # filled from defaults
    assert c.config["SYNTH"] == "auto"  # TPU extension filled silently


def test_sim_default():
    sim = fast_tpu.Fast(make_test_params())
    sim.run()
    assert np.isfinite(sim.result.power).all()
    assert np.isfinite(sim.result.dB_rel).all()
    assert np.isfinite(sim.result.dB_abs).all()


def test_sim_mean_irradiance():
    sim = fast_tpu.Fast(make_test_params())
    psf = sim.compute_mean_irradiance()
    assert np.isfinite(psf).all()


@pytest.mark.parametrize("overrides", [
    {"TEMPORAL": False},
    {"TEMPORAL": False, "SUBHARM": True},
    {"OBSC_GROUND": 0.1},
    {"OBSC_SAT": 0.05},
    {"W0": 0.1, "AXICON": True, "OBSC_GROUND": 0.1},
    {"L0": 25},
    {"PROP_DIR": "down"},
    {"AO_MODE": "NOAO"},
    {"AO_MODE": "TT"},
    {"AO_MODE": "LGSAO"},
    {"NOISE": 1},
    {"MODAL": True},
    {"MODAL": True, "ZMAX": 12},
], ids=["randscrns", "subharm", "obsc", "obsc_sat", "axicon", "L0", "down",
        "noao", "tt", "lgsao", "noise", "modal", "modal_zmax"])
def test_sim_feature(overrides):
    run_sim(make_test_params(**overrides))


def test_sim_temporal():
    sim = run_sim(make_test_params(TEMPORAL=True))
    assert len(sim.I) == sim.Niter


def test_sim_L_SAT():
    p = make_test_params(L_SAT=500e3)
    sim = fast_tpu.Fast(p)
    assert sim.L == p["L_SAT"]


def test_sim_coherent():
    p = make_test_params(COHERENT=True, TEMPORAL=False)
    sim = fast_tpu.Fast(p)
    sim.run()
    assert np.iscomplexobj(sim.I)


def test_progress_run_matches_default():
    p = make_test_params(TEMPORAL=False, SEED=44, NITER=40, NCHUNKS=2)
    r1 = fast_tpu.Fast(p).run().power
    r2 = fast_tpu.Fast(p).run(progress=True).power
    np.testing.assert_allclose(r1, r2, rtol=1e-6)


def test_seed_reproducible():
    p = make_test_params(TEMPORAL=False, SEED=77)
    r1 = fast_tpu.Fast(p).run().power
    r2 = fast_tpu.Fast(p).run().power
    np.testing.assert_array_equal(r1, r2)


def test_float64_mc_path():
    p = make_test_params(TEMPORAL=False, DTYPE="float64")
    sim = run_sim(p)
    assert sim.I.dtype == np.float64


def test_niter_validation():
    with pytest.raises(Exception, match="NCHUNKS must divide"):
        fast_tpu.Fast(make_test_params(NITER=101, NCHUNKS=10))
    with pytest.raises(Exception, match="even"):
        fast_tpu.Fast(make_test_params(TEMPORAL=False, NITER=30, NCHUNKS=10))


def test_phase_variance_of_screens():
    """Generated screens carry the variance the PSD integral predicts."""
    import jax
    from fast_tpu import synthesis

    p = make_test_params(TEMPORAL=False, NITER=2000, NCHUNKS=2)
    sim = fast_tpu.Fast(p)
    key = jax.random.key(0)
    scr = synthesis.synthesize_screens_complex(
        key, np.sqrt(sim.powerspec), float(sim.freq.main.df), 200)
    phs = np.asarray(synthesis.double_screens(scr))
    # screen variance (over realizations, at center pixel) ~ phs_var
    var = phs.var(axis=0).mean()
    assert abs(var - sim.phs_var) / sim.phs_var < 0.1


def test_sample_screens_and_validate():
    sim = fast_tpu.Fast(make_test_params(TEMPORAL=False))
    phs = sim.sample_screens(4)
    assert phs.shape == (4, sim.Npxls_pup, sim.Npxls_pup)
    assert np.isfinite(phs).all()
    assert sim.validate() is True
    # corruption is detected
    sim.powerspec[0, 0] = np.nan
    with pytest.raises(ValueError, match="powerspec"):
        sim.validate()


def test_stage_timings():
    sim = fast_tpu.Fast(make_test_params(TEMPORAL=False))
    for stage in ("init_geometry", "init_pupils", "powerspec"):
        assert stage in sim.timings
        assert sim.timings[stage] >= 0
    sim.run()
    assert "mc_run" in sim.timings


def test_result_units():
    r = fast_tpu.FastResult(np.array([0.5, 1.0, 2.0]), 2e-6)
    assert np.allclose(r.power, [1e-6, 2e-6, 4e-6])
    assert np.allclose(r.dB_rel, 10 * np.log10([0.5, 1, 2]))
    assert np.isclose(r.avg_power_dBm, 10 * np.log10(r.avg_power_W / 1e-3))
    si = (np.array([0.5, 1, 2]) / np.array([0.5, 1, 2]).mean()).var()
    assert np.isclose(r.scintillation_index, si)


def test_run_fn_cached_across_calls():
    """Warm repeat run() reuses the built whole-run program (no
    re-trace, no host table-pytree rebuild); a tables-version bump
    rebuilds it (round-4 review fix)."""
    sim = fast_tpu.Fast(make_test_params(TEMPORAL=False))
    fn1 = sim._run_all_fn()
    fn2 = sim._run_all_fn()
    assert fn1 is fn2
    sim._tables_version = getattr(sim, "_tables_version", 0) + 1
    assert sim._run_all_fn() is not fn1


def test_colfac_chunk_requires_table_args():
    """A pallas_colfac chunk called without its packed-table arguments
    raises instead of silently re-embedding the (possibly GB-scale)
    factor stacks as trace-time constants (round-4 review fix)."""
    import jax

    sim = fast_tpu.Fast(make_test_params(TEMPORAL=False,
                                         SYNTH="pallas_colfac"))
    chunk = sim._chunk_body()
    assert len(chunk.tables) == 2
    key = jax.random.key(0)
    chi = np.zeros(sim.Niter_per_chunk, np.float32)
    with pytest.raises(ValueError, match="packed"):
        chunk(key, chi)


def test_f32_factor_nan_falls_back_to_f64(monkeypatch):
    """A NaN-marked f32 colfac factor build (ill-conditioned column on
    the device or host BLAS path) falls back to the float64
    factorisation (engine.py init, round-4 behaviour)."""
    import jax

    from fast_tpu import engine, synthesis

    calls = {}

    def nan_factors(sqrt_ps, df, W, jitter=3e-6, host=False):
        calls["host"] = host
        n, npup = W.shape[1], W.shape[0]
        return np.full((n, npup, npup), np.nan, np.complex64)

    monkeypatch.setattr(engine.synthesis, "column_factors_device",
                        nan_factors)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    sim = fast_tpu.Fast(make_test_params(TEMPORAL=False, SYNTH="colfac"))
    assert calls  # the f32 build was attempted
    assert sim._L_colfac.dtype == np.complex64
    assert np.isfinite(sim._L_colfac).all()
    # and the fallback table really is the f64 factorisation
    W64 = synthesis.pruned_ift2_matrix(sim.Npxls, *sim.pup_crop,
                                       dtype=np.complex128)
    L64 = synthesis.column_factors(
        np.sqrt(sim.powerspec), float(sim.freq.main.df), W64)
    assert np.allclose(sim._L_colfac, L64.astype(np.complex64))


def test_recompute_powerspec_refreshes_run_program():
    """Re-running the public compute_powerspec() (e.g. after mutating the
    atmosphere) rebuilds the device tables and invalidates cached run
    programs — they must not embed the previous spectra or logamp_var."""
    sim = fast_tpu.Fast(make_test_params(TEMPORAL=False))
    fn1 = sim._run_all_fn()
    v1 = sim._tables_version
    sqrt_psd1 = sim._sqrt_psd.copy()
    lv1 = sim.logamp_var
    sim.cn2 = sim.cn2 * 4.0  # stronger turbulence
    sim.compute_powerspec()
    assert sim._tables_version > v1
    assert sim._run_all_fn() is not fn1
    assert not np.allclose(sim._sqrt_psd, sqrt_psd1)
    assert sim.logamp_var != lv1


def test_colfac_factor_disk_cache(tmp_path, monkeypatch):
    """Factor stacks are content-cached on disk: a byte-identical
    (PSD, W, df) rebuild loads instead of refactoring; different
    physics gets a different key."""
    from fast_tpu import synthesis
    from fast_tpu.utils import diskcache

    monkeypatch.setenv("FAST_TPU_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(diskcache, "MIN_BYTES", 0)
    calls = {"n": 0}
    real = synthesis.column_factors

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(synthesis, "column_factors", counting)
    p = make_test_params(TEMPORAL=False, NPXLS=164, NITER=100, NCHUNKS=2,
                         SYNTH="colfac")
    s1 = fast_tpu.Fast(p)
    assert calls["n"] == 1
    s2 = fast_tpu.Fast(dict(p))
    assert calls["n"] == 1  # disk hit: no refactorisation
    np.testing.assert_array_equal(np.asarray(s1._L_colfac),
                                  np.asarray(s2._L_colfac))
    fast_tpu.Fast(make_test_params(TEMPORAL=False, NPXLS=164, NITER=100,
                                   NCHUNKS=2, SYNTH="colfac",
                                   ZENITH_ANGLE=30.0))
    assert calls["n"] == 2  # different PSD -> different key

    # corrupt cache entries are dropped and rebuilt, not trusted
    import os
    victim = max((os.path.join(str(tmp_path), f)
                  for f in os.listdir(str(tmp_path))),
                 key=os.path.getmtime)
    with open(victim, "wb") as f:
        f.write(b"not a npy file")
    fast_tpu.Fast(make_test_params(TEMPORAL=False, NPXLS=164, NITER=100,
                                   NCHUNKS=2, SYNTH="colfac",
                                   ZENITH_ANGLE=30.0))
    assert calls["n"] == 3

    # kill switch
    monkeypatch.setenv("FAST_TPU_TABLE_CACHE", "0")
    fast_tpu.Fast(dict(p))
    assert calls["n"] == 4


def test_diskcache_lru_eviction(tmp_path, monkeypatch):
    import os
    import time

    from fast_tpu.utils import diskcache

    monkeypatch.setenv("FAST_TPU_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(diskcache, "MIN_BYTES", 0)
    monkeypatch.setattr(diskcache, "MAX_BYTES", 3000)
    keys = []
    for i in range(5):
        k = diskcache.table_key("t", [np.arange(i + 1)])
        diskcache.save(k, np.zeros(128))  # ~1.1 KB each
        keys.append(k)
        time.sleep(0.02)  # distinct mtimes for the LRU order
    files = [f for f in os.listdir(str(tmp_path)) if f.endswith(".npy")]
    total = sum(os.path.getsize(os.path.join(str(tmp_path), f))
                for f in files)
    assert total <= 3000
    # the most recent entry survives; the oldest was evicted
    assert diskcache.load(keys[-1]) is not None
    assert diskcache.load(keys[0]) is None


@pytest.mark.parametrize("coherent", [True, False])
def test_fastresult_lazy_materialisation(coherent):
    """run() computes summary moments on device and defers the series
    fetch; reading a series property materialises once, and the moments
    agree with host-recomputed statistics (coherent complex field and
    real-detector twins)."""
    import fast_tpu
    from fast_tpu.engine import FastResult

    sim = fast_tpu.Fast(make_test_params(TEMPORAL=False, NITER=512,
                                         NCHUNKS=2, COHERENT=coherent))
    res = sim.run()
    assert res._np is None and res._moments is not None  # summary-only
    si_dev, pw_dev = res.scintillation_index, res.avg_power_W
    dbm_dev = res.avg_power_dBm
    P = res.power                                        # materialises
    assert res._np is not None and res._raw is None
    assert np.iscomplexobj(res._r) == coherent
    if not coherent:
        assert (P >= 0).all()
    np.testing.assert_allclose(res.scintillation_index, si_dev, rtol=1e-5)
    np.testing.assert_allclose(np.real(res.avg_power_W), np.real(pw_dev),
                               rtol=1e-5)
    # dBm is log-scale: a relative tolerance collapses near 0 dBm —
    # compare absolutely (1e-4 dB)
    np.testing.assert_allclose(res.avg_power_dBm, dbm_dev, atol=1e-4)
    np.testing.assert_allclose(sim.I, P)                 # property alias
    # legacy positional construction (mesh runners, load_result) is
    # eager-compatible: already-final arrays pass straight through
    r2 = FastResult(np.asarray(res._r), res._dl)
    np.testing.assert_allclose(r2.power, P)
    np.testing.assert_allclose(r2.scintillation_index,
                               res.scintillation_index, rtol=1e-5)


def test_colfac_huge_pupil_warning(caplog):
    """Explicitly pinned 'pallas_colfac' at pupils >= 256 px logs the
    measured performance warning (VERDICT r4 #6); the auto rule and
    small pupils stay silent."""
    import logging

    from fast_tpu.engine import _warn_colfac_huge_pupil

    with caplog.at_level(logging.WARNING, logger="fast_tpu.engine"):
        assert _warn_colfac_huge_pupil(1024, 500)
    assert "3-4x faster" in caplog.text
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="fast_tpu.engine"):
        assert not _warn_colfac_huge_pupil(512, 126)
    assert not caplog.text
