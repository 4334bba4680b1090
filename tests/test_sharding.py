"""Multi-device sharding tests on the 8-way virtual CPU mesh."""

import jax
import numpy as np
import pytest

import fast_tpu
from fast_tpu import parallel
from conftest import make_test_params


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return parallel.make_mesh(8)


def test_mesh_shape(mesh8):
    assert mesh8.devices.size == 8
    assert mesh8.axis_names == ("mc",)


def test_run_sharded_statistics(mesh8):
    p = make_test_params(TEMPORAL=False, NITER=3200, NCHUNKS=2, SEED=5)
    sim = fast_tpu.Fast(p)
    res = parallel.run_sharded(sim, mesh=mesh8)
    power = np.asarray(res.power)
    assert power.shape == (3200,)
    assert np.isfinite(power).all()

    # compare against a single-device run of the same config
    sim2 = fast_tpu.Fast(p)
    res2 = sim2.run()
    r1 = power / sim.diffraction_limit
    r2 = np.asarray(res2.power) / sim2.diffraction_limit
    se = np.sqrt(r1.var() / len(r1) + r2.var() / len(r2))
    assert abs(r1.mean() - r2.mean()) < 4 * se


def test_run_sharded_deterministic(mesh8):
    p = make_test_params(TEMPORAL=False, NITER=1600, NCHUNKS=2, SEED=31)
    sim = fast_tpu.Fast(p)
    r1 = np.asarray(parallel.run_sharded(sim, mesh=mesh8).power)
    r2 = np.asarray(parallel.run_sharded(sim, mesh=mesh8).power)
    np.testing.assert_array_equal(r1, r2)


def test_run_sharded_validation(mesh8):
    p = make_test_params(TEMPORAL=False, NITER=100, NCHUNKS=10)
    sim = fast_tpu.Fast(p)
    with pytest.raises(ValueError):
        parallel.run_sharded(sim, mesh=mesh8)  # 100 not divisible by 80


def test_sharded_moments(mesh8):
    rng = np.random.default_rng(0)
    x = rng.normal(size=8000).astype(np.float32)
    m = parallel.sharded_moments(x, mesh=mesh8)
    assert np.isclose(m[0], x.mean(), atol=1e-3)
    assert np.isclose(m[1], (x ** 2).mean(), atol=1e-2)


def test_scan_sharded(mesh8):
    """2-D (scan, mc) mesh: 4 zenith angles x 2-way MC sharding."""
    scan_mesh = parallel.make_scan_mesh(2, 4)
    sims = [
        fast_tpu.Fast(make_test_params(
            TEMPORAL=False, NITER=1600, NCHUNKS=2, SEED=7, ZENITH_ANGLE=z,
            NPXLS=164))
        for z in (30, 40, 50, 60)
    ]
    results = parallel.run_scan_sharded(sims, scan_mesh)
    assert len(results) == 4
    means = [np.asarray(r.power).mean() / s.diffraction_limit
             for r, s in zip(results, sims)]
    for m, r in zip(means, results):
        assert np.isfinite(np.asarray(r.power)).all()
    # higher zenith angle -> more turbulence -> lower mean coupling
    assert means[0] > means[-1]

    # statistics agree with an unsharded run of the same config
    solo = fast_tpu.Fast(make_test_params(
        TEMPORAL=False, NITER=1600, NCHUNKS=2, SEED=7, ZENITH_ANGLE=60,
        NPXLS=164))
    r_solo = np.asarray(solo.run().power) / solo.diffraction_limit
    r_scan = np.asarray(results[-1].power) / sims[-1].diffraction_limit
    se = np.sqrt(r_solo.var() / len(r_solo) + r_scan.var() / len(r_scan))
    assert abs(r_solo.mean() - r_scan.mean()) < 4 * se


def test_temporal_sharded_equals_serial(mesh8):
    """Time-axis sharding reproduces the serial frozen-flow series."""
    p = make_test_params(TEMPORAL=True, NITER=160, NCHUNKS=4, SEED=13)
    serial = fast_tpu.Fast(p)
    r_serial = np.asarray(serial.run().power)

    sharded = fast_tpu.Fast(p)
    r_sharded = np.asarray(parallel.run_sharded(sharded, mesh=mesh8).power)

    assert r_sharded.shape == r_serial.shape
    # identical screens + identical chi + same trajectory -> same series
    # (up to float32 coordinate arithmetic at window offsets)
    np.testing.assert_allclose(r_sharded, r_serial, rtol=2e-3)


def test_temporal_ar_sharded_equals_serial(mesh8):
    """Time-axis sharding of a pure frozen-flow AR series is
    sample-identical to the serial run (window starts jump the recursion
    via phasor powers)."""
    p = make_test_params(TEMPORAL=True, TEMPORAL_SYNTH="ar",
                         TEMPORAL_ALPHA=1.0, NPXLS=128, NITER=160,
                         NCHUNKS=4, SEED=14)
    serial = fast_tpu.Fast(dict(p))
    r_serial = np.asarray(serial.run().power)

    sharded = fast_tpu.Fast(dict(p))
    r_sharded = np.asarray(parallel.run_sharded(sharded, mesh=mesh8).power)
    assert r_sharded.shape == r_serial.shape
    np.testing.assert_allclose(r_sharded, r_serial, rtol=5e-3,
                               atol=1e-9)


def test_scan_sharded_pallas_fused_needs_tpu(mesh8):
    """Explicit SYNTH='pallas_fused' scans reject loudly off-TPU (the
    kernel has no CPU lowering); on TPU the fused path is supported."""
    mesh = parallel.make_scan_mesh(4, 2, devices=mesh8.devices.ravel())
    sims = [fast_tpu.Fast(make_test_params(
        NITER=320, NCHUNKS=1, SEED=17, SYNTH="pallas_fused",
        ZENITH_ANGLE=z)) for z in (30, 40, 50, 60)]
    with pytest.raises(NotImplementedError, match="TPU backend"):
        parallel.run_scan_sharded(sims, mesh)


def test_temporal_ar_scan_sharded(mesh8):
    """Independent boiling AR series shard over the scan axis: one
    correlated series per configuration, statistics matching a solo run."""
    mesh = parallel.make_scan_mesh(8, 1, devices=mesh8.devices.ravel())
    zeniths = [30, 35, 40, 45, 50, 55, 60, 65]
    sims = [fast_tpu.Fast(make_test_params(
        TEMPORAL=True, TEMPORAL_SYNTH="ar", TEMPORAL_ALPHA=0.95,
        NPXLS=128, NITER=400, NCHUNKS=4, SEED=15, ZENITH_ANGLE=z))
        for z in zeniths]
    results = parallel.run_scan_sharded(sims, mesh)
    assert len(results) == 8
    for r in results:
        x = np.asarray(r.power)
        assert np.isfinite(x).all() and x.shape == (400,)
        xc = x / x.mean() - 1
        assert (xc[:-1] * xc[1:]).mean() / (xc * xc).mean() > 0.5

    # statistics of one scan member vs a solo run of the same config
    solo = fast_tpu.Fast(make_test_params(
        TEMPORAL=True, TEMPORAL_SYNTH="ar", TEMPORAL_ALPHA=0.95,
        NPXLS=128, NITER=400, NCHUNKS=4, SEED=99, ZENITH_ANGLE=55))
    r_solo = np.asarray(solo.run().power) / solo.diffraction_limit
    r_scan = np.asarray(results[5].power) / sims[5].diffraction_limit
    # correlated series -> compare means loosely
    assert abs(np.log(r_solo.mean() / r_scan.mean())) < 0.7


def test_temporal_ar_scan_mixed_logamp_tps_rejected(mesh8):
    """A temporal scan whose sims disagree on temporal-logamp-powerspec
    presence rejects loudly instead of silently dropping a sim's
    temporal log-amplitude spectrum (round-4 review fix)."""
    mesh = parallel.make_scan_mesh(2, 1, devices=mesh8.devices.ravel()[:2])
    sims = [fast_tpu.Fast(make_test_params(
        TEMPORAL=True, TEMPORAL_SYNTH="ar", TEMPORAL_ALPHA=0.95,
        NPXLS=128, NITER=40, NCHUNKS=4, SEED=18, ZENITH_ANGLE=z))
        for z in (40, 50)]
    sims[1].temporal_logamp_powerspec = None
    with pytest.raises(ValueError, match="logamp powerspec"):
        parallel.run_scan_sharded(sims, mesh)


def test_sim_uids_unique():
    """Device-table caches key sims by ``_uid`` — a monotonic counter
    that, unlike ``id()``, is never recycled when an old sims list is
    garbage-collected and rebuilt (round-4 review fix)."""
    a = fast_tpu.Fast(make_test_params(NITER=20, NCHUNKS=2))
    b = fast_tpu.Fast(make_test_params(NITER=20, NCHUNKS=2))
    assert a._uid != b._uid


def test_temporal_screens_scan_sharded(mesh8):
    """Independent grown-grid screens-mode series shard over the scan
    axis (VERDICT r4 #5 — was the last NotImplementedError in the
    parallel layer): one frozen-flow series per configuration, finite,
    temporally correlated, statistics matching a solo run."""
    mesh = parallel.make_scan_mesh(8, 1, devices=mesh8.devices.ravel())
    zeniths = [30, 35, 40, 45, 50, 55, 60, 65]
    sims = [fast_tpu.Fast(make_test_params(
        TEMPORAL=True, TEMPORAL_SYNTH="screens", NPXLS=128, NITER=400,
        NCHUNKS=4, SEED=16, ZENITH_ANGLE=z)) for z in zeniths]
    results = parallel.run_scan_sharded(sims, mesh)
    assert len(results) == 8
    for r in results:
        x = np.asarray(r.power)
        assert np.isfinite(x).all() and x.shape == (400,)
        xc = x / x.mean() - 1
        assert (xc[:-1] * xc[1:]).mean() / (xc * xc).mean() > 0.5

    solo = fast_tpu.Fast(make_test_params(
        TEMPORAL=True, TEMPORAL_SYNTH="screens", NPXLS=128, NITER=400,
        NCHUNKS=4, SEED=91, ZENITH_ANGLE=55))
    r_solo = np.asarray(solo.run().power) / solo.diffraction_limit
    r_scan = np.asarray(results[5].power) / sims[5].diffraction_limit
    assert abs(np.log(r_solo.mean() / r_scan.mean())) < 0.7

    # warm repeat reuses the device-resident table cache
    again = parallel.run_scan_sharded(sims, mesh, seed=17)
    assert np.isfinite(np.asarray(again[0].power)).all()


def test_temporal_screens_scan_mc_axis_rejected(mesh8):
    mesh = parallel.make_scan_mesh(4, 2, devices=mesh8.devices.ravel())
    sims = [fast_tpu.Fast(make_test_params(
        TEMPORAL=True, TEMPORAL_SYNTH="screens", NPXLS=128, NITER=40,
        NCHUNKS=4, SEED=16)) for _ in range(4)]
    with pytest.raises(ValueError, match="mc axis"):
        parallel.run_scan_sharded(sims, mesh)


def test_temporal_ar_boiling_layer_sharded(mesh8):
    """Boiling AR series shard over the *layer* axis: each device evolves
    its local Fourier blocks, a per-step psum forms the layer sum before
    the pruned DFT + detector. Statistics match a solo run."""
    h, cn2, w = fast_tpu.turbulence_models.HV57_Bufton_profile(8)
    p = make_test_params(TEMPORAL=True, TEMPORAL_SYNTH="ar",
                         TEMPORAL_ALPHA=0.9, NPXLS=128, NITER=400,
                         NCHUNKS=4, SEED=14, H_TURB=h, CN2_TURB=cn2,
                         WIND_SPD=w, WIND_DIR=np.linspace(0.0, 315.0, 8))
    sim = fast_tpu.Fast(dict(p))
    r = np.asarray(parallel.run_sharded(sim, mesh=mesh8).power)
    assert r.shape == (400,) and np.isfinite(r).all()
    # frozen-flow short-lag correlation survives the decomposition
    x = r / r.mean() - 1
    assert (x[:-1] * x[1:]).mean() / (x * x).mean() > 0.5
    solo = fast_tpu.Fast(dict(p, SEED=99))
    r_solo = np.asarray(solo.run().power)
    assert abs(np.log(r_solo.mean() / r.mean())) < 0.7

    # a layer count the mesh cannot split still fails loudly
    p4 = make_test_params(TEMPORAL=True, TEMPORAL_SYNTH="ar",
                          TEMPORAL_ALPHA=0.9, NPXLS=128, NITER=160,
                          NCHUNKS=4, SEED=14)
    with pytest.raises(ValueError, match="divisible"):
        parallel.run_sharded(fast_tpu.Fast(p4), mesh=mesh8)


def test_coherent_sharded(mesh8):
    p = make_test_params(TEMPORAL=False, NITER=1600, NCHUNKS=1, SEED=3,
                         COHERENT=True)
    sim = fast_tpu.Fast(p)
    res = parallel.run_sharded(sim, mesh=mesh8)
    assert np.iscomplexobj(res._r)


def test_scan_sharded_colfac(mesh8):
    """Column-factored synthesis under the (scan, mc) mesh (per-sim
    factors ship as stacked floats)."""
    scan_mesh = parallel.make_scan_mesh(2, 4)
    sims = [
        fast_tpu.Fast(make_test_params(
            TEMPORAL=False, NITER=1600, NCHUNKS=2, SEED=9, ZENITH_ANGLE=z,
            NPXLS=164, SYNTH="colfac", DTYPE="float32"))
        for z in (35, 55)
    ]
    results = parallel.run_scan_sharded(sims, scan_mesh)
    assert len(results) == 2
    for r in results:
        assert np.isfinite(np.asarray(r.power)).all()
    # statistics agree with the unsharded colfac run of the same config
    solo = fast_tpu.Fast(make_test_params(
        TEMPORAL=False, NITER=1600, NCHUNKS=2, SEED=9, ZENITH_ANGLE=55,
        NPXLS=164, SYNTH="colfac", DTYPE="float32"))
    r_solo = np.asarray(solo.run().power) / solo.diffraction_limit
    r_scan = np.asarray(results[-1].power) / sims[-1].diffraction_limit
    se = np.sqrt(r_solo.var() / len(r_solo) + r_scan.var() / len(r_scan))
    assert abs(r_solo.mean() - r_scan.mean()) < 4 * se


def test_scan_sharded_subharm(mesh8):
    """Subharmonic low-order modes under the (scan, mc) mesh."""
    scan_mesh = parallel.make_scan_mesh(2, 4)
    sims = [
        fast_tpu.Fast(make_test_params(
            TEMPORAL=False, NITER=800, NCHUNKS=1, SEED=10, ZENITH_ANGLE=z,
            NPXLS=164, SUBHARM=True, SYNTH="fft"))
        for z in (35, 55)
    ]
    results = parallel.run_scan_sharded(sims, scan_mesh)
    for r in results:
        assert np.isfinite(np.asarray(r.power)).all()
    solo = fast_tpu.Fast(make_test_params(
        TEMPORAL=False, NITER=800, NCHUNKS=1, SEED=10, ZENITH_ANGLE=35,
        NPXLS=164, SUBHARM=True, SYNTH="fft"))
    r_solo = np.asarray(solo.run().power) / solo.diffraction_limit
    r_scan = np.asarray(results[0].power) / sims[0].diffraction_limit
    se = np.sqrt(r_solo.var() / len(r_solo) + r_scan.var() / len(r_scan))
    assert abs(r_solo.mean() - r_scan.mean()) < 4 * se


def test_scan_sharded_rejects_pallas(mesh8):
    scan_mesh = parallel.make_scan_mesh(2, 4)
    sims = [fast_tpu.Fast(make_test_params(
        TEMPORAL=False, NITER=800, NCHUNKS=1, NPXLS=164, SYNTH="pallas",
        ZENITH_ANGLE=z)) for z in (35, 55)]
    with pytest.raises(NotImplementedError, match="not.*scan-shardable"):
        parallel.run_scan_sharded(sims, scan_mesh)


def test_scan_sharded_rejects_mixed_synth(mesh8):
    scan_mesh = parallel.make_scan_mesh(2, 4)
    sims = [
        fast_tpu.Fast(make_test_params(TEMPORAL=False, NITER=800, NCHUNKS=1,
                                       NPXLS=164, SYNTH="fft")),
        fast_tpu.Fast(make_test_params(TEMPORAL=False, NITER=800, NCHUNKS=1,
                                       NPXLS=164, SYNTH="matmul")),
    ]
    with pytest.raises(ValueError, match="share SYNTH"):
        parallel.run_scan_sharded(sims, scan_mesh)


def test_shard_fn_build_does_not_double_pin_tables(mesh8):
    """Building the sharded runner for a pallas_colfac sim pins the
    packed factor stacks ONLY with the mesh-replicated sharding — no
    dead second default-device copy (they reach ~GB at 1024^2)."""
    from fast_tpu.parallel import mesh as mesh_mod

    sim = fast_tpu.Fast(make_test_params(TEMPORAL=False, NITER=1600,
                                         NCHUNKS=2, SYNTH="pallas_colfac"))
    fn = mesh_mod._build_shard_fn(sim, mesh8, sim.Nchunks,
                                  1600 // (8 * sim.Nchunks))
    assert fn is not None
    assert getattr(sim, "_colfac_packed", None) is not None  # host cache
    assert getattr(sim, "_colfac_packed_dev", None) is None  # no dev pin
