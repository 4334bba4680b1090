"""Benchmark: Monte Carlo throughput of the flagship AO link.

Headline metric (BASELINE.json): MC realizations/sec/chip at a 256^2 grid
for an AO-corrected satellite link. Baseline = the reference
implementation's numpy path on this host's CPU (no pyFFTW available),
measured via ``FAST_TPU_MEASURE_REF=1`` and recorded below.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"secondary"} — secondary carries the 512^2 figure and the temporal
AR-frozen-flow steps/sec so size/temporal regressions are caught by the
driver, not prose.
"""

import json
import os
import sys
import time

import numpy as np

# Reference CPU throughput (realizations/sec) for the same configuration,
# measured on this machine (single-core container CPU, numpy FFT path,
# reference test/benchmark.py-style run loop). Re-measure with
# FAST_TPU_MEASURE_REF=1.
REF_CPU_RPS = 30.4

NITER = 16384
REP_SETS = 5  # best-of-N: the sandbox TPU is pooled and throughput varies
REPS_PER_SET = 3


def measure_reference():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests",
                                    "refshim"))
    sys.path.insert(0, "/root/reference")
    import __graft_entry__ as g
    import fast as reference

    p = g._flagship_params(npxls=256, niter=200, nchunks=2)
    sim = reference.Fast(dict(p))
    t0 = time.time()
    sim.run()
    return p["NITER"] / (time.time() - t0)


def measure_rps(sim, niter, rep_sets=REP_SETS, reps=REPS_PER_SET,
                temporal=False):
    """Best-of-N steady-state throughput of the full jitted run program."""
    import jax

    run_all = (sim._run_all_fn_temporal_ar() if temporal
               else sim._run_all_fn())
    key = jax.random.key(0, impl="rbg")

    # compile + warm (two fetch cycles: first real execution can include
    # one-time remote program load)
    for i in range(2):
        checksum = float(run_all(key, jax.random.fold_in(key, 1000 + i)).sum())
        assert np.isfinite(checksum)

    best = 0.0
    for r in range(rep_sets):
        t0 = time.time()
        for i in range(reps):
            out = run_all(key, jax.random.fold_in(key, 10 * r + i))
        checksum = float(out.sum())
        dt = (time.time() - t0) / reps
        best = max(best, niter / dt)
        print(f"#   set {r}: {niter / dt:.0f} /s", file=sys.stderr)
    return best


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_fast_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import __graft_entry__ as g
    import fast_tpu

    ref_rps = REF_CPU_RPS
    if os.environ.get("FAST_TPU_MEASURE_REF"):
        ref_rps = measure_reference()
        print(f"# measured reference CPU: {ref_rps:.1f} r/s", file=sys.stderr)

    # pallas_colfac: fused kernel drawing noise in the colfac basis —
    # Npup*N normals per screen instead of N^2; fastest at both sizes
    # (the one-time f64 factor build is excluded, like all init)
    synth = os.environ.get("FAST_TPU_SYNTH", "pallas_colfac")

    print("# 256^2 iid", file=sys.stderr)
    sim = fast_tpu.Fast(g._flagship_params(
        npxls=256, niter=NITER, nchunks=1, RNG="rbg", SYNTH=synth))
    best_256 = measure_rps(sim, NITER)

    print("# 512^2 iid", file=sys.stderr)
    sim512 = fast_tpu.Fast(g._flagship_params(
        npxls=512, niter=8192, nchunks=1, RNG="rbg", SYNTH=synth))
    best_512 = measure_rps(sim512, 8192)

    print("# 256^2 temporal AR frozen flow", file=sys.stderr)
    sim_t = fast_tpu.Fast(g._flagship_params(
        npxls=256, niter=16384, nchunks=64, RNG="rbg", TEMPORAL=True,
        TEMPORAL_SYNTH="ar", DT=0.001))
    best_t = measure_rps(sim_t, 16384, rep_sets=5, reps=1, temporal=True)

    print(json.dumps({
        "metric": "mc_realizations_per_sec_256sq_chip",
        "value": round(best_256, 1),
        "unit": "realizations/s",
        "vs_baseline": round(best_256 / ref_rps, 1),
        "secondary": {
            "mc_realizations_per_sec_512sq_chip": round(best_512, 1),
            "temporal_ar_steps_per_sec_256sq": round(best_t, 1),
        },
    }))


if __name__ == "__main__":
    main()
