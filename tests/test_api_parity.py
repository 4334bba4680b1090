"""Public-API surface parity with the reference, checked symbol by symbol.

A user of the reference must find every public function/class/method in
the same module and under the same name here (SURVEY.md §2 inventory).
"""

import inspect

import fast_tpu


def _public_symbols(mod):
    return {n for n, o in vars(mod).items()
            if not n.startswith("_")
            and (inspect.isfunction(o) or inspect.isclass(o))
            and getattr(o, "__module__", "").startswith("fast")}


def test_module_surfaces(reference_fast):
    pairs = [
        (reference_fast.fast, fast_tpu.engine),
        (reference_fast.funcs, fast_tpu.funcs),
        (reference_fast.ao_power_spectra, fast_tpu.ao_power_spectra),
        (reference_fast.turbulence_models, fast_tpu.turbulence_models),
        (reference_fast.comms, fast_tpu.comms),
        (reference_fast.complete_orbit_simulation,
         fast_tpu.complete_orbit_simulation),
        (reference_fast.conf, fast_tpu.conf),
    ]
    for rmod, tmod in pairs:
        missing = sorted(n for n in _public_symbols(rmod)
                         if not hasattr(tmod, n))
        assert not missing, f"{rmod.__name__}: missing {missing}"


def test_class_surfaces(reference_fast):
    for rcls, tcls in [
        (reference_fast.fast.Fast, fast_tpu.Fast),
        (reference_fast.fast.FastResult, fast_tpu.engine.FastResult),
        (reference_fast.comms.Modulator, fast_tpu.comms.Modulator),
        (reference_fast.comms.FastFSOC, fast_tpu.comms.FastFSOC),
    ]:
        missing = sorted(
            n for n, o in vars(rcls).items()
            if not n.startswith("_") and callable(o)
            and not hasattr(tcls, n))
        assert not missing, f"{rcls.__name__}: missing {missing}"


def test_config_keys(reference_fast):
    missing = sorted(k for k in reference_fast.conf.DEFAULTS
                     if k not in fast_tpu.conf.DEFAULTS)
    assert not missing


def test_compat_methods_run(test_params):
    import numpy as np

    sim = fast_tpu.Fast({**test_params, "TEMPORAL": True, "NITER": 40,
                         "NCHUNKS": 4, "NPXLS": 164, "SEED": 2})
    sim.init_fftw()
    sim.init_phs_logamp()
    assert sim.compute_logamp().shape == (40,)
    phs = sim.compute_phs_temporal(chunk=1)
    assert phs.shape == (10, sim.Npxls_pup, sim.Npxls_pup)
    det = sim.compute_detector(chunk=1)
    assert det.shape == (10,)
    assert np.isfinite(det).all()
