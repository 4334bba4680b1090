"""Vmapped sweep assembly vs per-sample full inits."""

import numpy as np
import pytest

import fast_tpu
from fast_tpu import sweep
from conftest import make_test_params


def test_sweep_matches_individual_inits():
    base = make_test_params(TEMPORAL=False, NPXLS=164, NITER=200, NCHUNKS=2)
    zeniths = np.array([30.0, 45.0, 60.0])
    dthetas = np.array([[4.0, 0.0], [3.0, 1.0], [2.0, 2.0]])
    sims = sweep.build_sweep(base, {"ZENITH_ANGLE": zeniths,
                                    "DTHETA": dthetas})
    assert len(sims) == 3

    for i, (z, dth) in enumerate(zip(zeniths, dthetas)):
        solo = fast_tpu.Fast(make_test_params(
            TEMPORAL=False, NPXLS=164, NITER=200, NCHUNKS=2,
            ZENITH_ANGLE=z, DTHETA=list(dth)))
        np.testing.assert_allclose(sims[i].powerspec, solo.powerspec,
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(sims[i].logamp_powerspec,
                                   solo.logamp_powerspec, rtol=1e-10,
                                   atol=1e-15)
        assert np.isclose(sims[i].logamp_var, solo.logamp_var, rtol=1e-10)
        assert np.isclose(sims[i].phs_var, solo.phs_var, rtol=1e-10)
        assert np.isclose(sims[i].diffraction_limit, solo.diffraction_limit,
                          rtol=1e-10)
        assert np.isclose(sims[i].L, solo.L)
        # per-sample error budgets must be recomputed, not inherited from
        # the base clone (round-1 bug: copy.copy carried stale scalars)
        assert np.isclose(sims[i].aniso_servo_error, solo.aniso_servo_error,
                          rtol=1e-10)
        assert np.isclose(sims[i].alias_error, solo.alias_error, rtol=1e-10)
        assert np.isclose(sims[i].fitting_error, solo.fitting_error,
                          rtol=1e-10)
        assert np.isclose(sims[i].noise_error, solo.noise_error, rtol=1e-10)
        # clone invariants, asserted term-by-term: the link budget differs
        # from the base only in the free-space (range) term, and every
        # term equals a full per-sample init's
        for term, val in sims[i].link_budget.items():
            assert np.isclose(val, solo.link_budget[term], rtol=1e-10), term
        np.testing.assert_allclose(sims[i].phs_var_weights,
                                   solo.phs_var_weights, rtol=1e-10)

    # error budgets genuinely differ across zenith angles
    assert not np.isclose(sims[0].aniso_servo_error, sims[2].aniso_servo_error)
    assert not np.isclose(sims[0].alias_error, sims[2].alias_error)

    # clones run independently
    r = sims[1].run()
    assert np.isfinite(np.asarray(r.power)).all()


def test_sweep_with_orbit_geometry():
    from fast_tpu import orbit

    provider = orbit.circular_orbit_provider(550e3, offset_angle_deg=8.0)
    times = np.linspace(-90, 90, 4)
    base = make_test_params(TEMPORAL=False, NPXLS=164, NITER=100, NCHUNKS=2)
    geo = orbit.sample_pass_geometry(provider, times, base["TLOOP"])
    sims = sweep.build_sweep(base, {
        "ZENITH_ANGLE": geo["zenith_angles"],
        "L_SAT": geo["distances"],
        "DTHETA": geo["paa"],
        "ANISO_DL": geo["aniso_dl"],
        "AZIMUT_SAT": geo["azimuts"],
    })
    assert len(sims) == 4
    for s in sims:
        s.validate()


def test_sweep_pallas_colfac_factors_are_per_sample():
    """An explicit SYNTH='pallas_colfac' sweep must factor each sample's
    own covariance — ``copy.copy`` alone would leave every clone running
    the base atmosphere's ``_L_colfac`` (round-4 review finding)."""
    base = make_test_params(TEMPORAL=False, NPXLS=164, NITER=100, NCHUNKS=2,
                            SYNTH="pallas_colfac")
    zeniths = np.array([30.0, 60.0])
    sims = sweep.build_sweep(base, {"ZENITH_ANGLE": zeniths})
    assert not np.allclose(np.asarray(sims[0]._L_colfac),
                           np.asarray(sims[1]._L_colfac))
    for i, z in enumerate(zeniths):
        solo = fast_tpu.Fast(make_test_params(
            TEMPORAL=False, NPXLS=164, NITER=100, NCHUNKS=2,
            SYNTH="pallas_colfac", ZENITH_ANGLE=z))
        a = np.asarray(sims[i]._L_colfac)
        b = np.asarray(solo._L_colfac)
        # compare the covariances the factors encode (Cholesky itself can
        # amplify tiny PSD differences on near-singular columns)
        ca = a @ np.conj(np.swapaxes(a, 1, 2))
        cb = b @ np.conj(np.swapaxes(b, 1, 2))
        scale = np.abs(cb).max()
        np.testing.assert_allclose(ca, cb, atol=1e-6 * scale, rtol=1e-5)


def test_sweep_clones_have_fresh_identity():
    """Clones must not share the base's ``_uid`` (or each other's).

    The scan runner's device-table cache keys on per-sim
    ``(_uid, _tables_version)``; ``copy.copy`` alone would leave every
    clone of one sweep — and of every *subsequent* sweep off the same
    base — with an identical pair, so a permuted or regenerated clone
    list could silently reuse tables cached in the old order.
    """
    base = make_test_params(TEMPORAL=False, NPXLS=164, NITER=100, NCHUNKS=2)
    zeniths = np.array([30.0, 45.0, 60.0])
    sims = sweep.build_sweep(base, {"ZENITH_ANGLE": zeniths})
    sims2 = sweep.build_sweep(base, {"ZENITH_ANGLE": zeniths[::-1].copy()})
    uids = [s._uid for s in sims] + [s._uid for s in sims2]
    assert len(set(uids)) == len(uids)
    # keys the scan cache would build for the two sweeps must differ
    k1 = tuple((s._uid, s._tables_version) for s in sims)
    k2 = tuple((s._uid, s._tables_version) for s in sims2)
    assert k1 != k2
    # and a permutation of one list changes its key too
    perm = [sims[0], sims[2], sims[1]]
    kp = tuple((s._uid, s._tables_version) for s in perm)
    assert kp != k1


def test_sweep_rejects_auto_grid():
    base = make_test_params(TEMPORAL=False)  # NPXLS='auto'
    with pytest.raises(ValueError, match="explicit NPXLS"):
        sweep.build_sweep(base, {"ZENITH_ANGLE": np.array([30.0])})


def test_sweep_subharm_matches_individual_inits():
    base = make_test_params(TEMPORAL=False, NPXLS=164, NITER=100, NCHUNKS=2,
                            SUBHARM=True)
    zeniths = np.array([30.0, 60.0])
    sims = sweep.build_sweep(base, {"ZENITH_ANGLE": zeniths})
    for i, z in enumerate(zeniths):
        solo = fast_tpu.Fast(make_test_params(
            TEMPORAL=False, NPXLS=164, NITER=100, NCHUNKS=2, SUBHARM=True,
            ZENITH_ANGLE=z))
        np.testing.assert_allclose(sims[i].powerspec_subharm,
                                   solo.powerspec_subharm, rtol=1e-10)
        np.testing.assert_allclose(sims[i].phs_var_weights_sh,
                                   solo.phs_var_weights_sh, rtol=1e-10)
    assert not np.allclose(sims[0].powerspec_subharm,
                           sims[1].powerspec_subharm)
    r = sims[0].run()
    assert np.isfinite(np.asarray(r.power)).all()


def test_sweep_resolves_auto_synth():
    """Configs built from DEFAULTS carry SYNTH='auto' explicitly; clones
    must get the base's engine-resolved path, never the literal 'auto'
    (which matches no synthesis branch downstream)."""
    base = make_test_params(TEMPORAL=False, NPXLS=164, NITER=200,
                            NCHUNKS=2, SYNTH="auto")
    zeniths = np.array([30.0, 55.0])
    sims = sweep.build_sweep(base, {"ZENITH_ANGLE": zeniths})
    base_sim = fast_tpu.Fast(dict(base))
    assert base_sim._synth != "auto"
    for s in sims:
        assert s._synth == base_sim._synth
        assert s.params["SYNTH"] == base_sim._synth
    # on CPU the auto rule resolves to colfac: each clone must carry its
    # own per-sample factor tables, not the base atmosphere's
    if base_sim._synth == "colfac":
        assert not np.allclose(np.asarray(sims[0]._L_colfac),
                               np.asarray(sims[1]._L_colfac))
    r = sims[0].run()
    assert np.isfinite(np.asarray(r.power)).all()
