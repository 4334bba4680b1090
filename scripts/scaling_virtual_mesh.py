"""Multi-device scaling evidence on the virtual CPU mesh (VERDICT r4 #3).

Runs the three production sharded runners at FIXED total work over
1/2/4/8 virtual devices and reports the wall-time ratio wall(d)/wall(1):

* with >= d physical cores this is a genuine weak-scaling measurement
  (ideal ratio 1/d per-device speedup -> fixed-work ratio 1.0 at perfect
  scaling ... d x at no scaling);
* on a single-core host (this sandbox: ``nproc`` = 1) the devices
  timeshare one core, so the measurable quantity is WORK CONSERVATION:
  ratio ~= 1.0 proves the d-way decomposition adds no redundant compute
  or repartitioning, i.e. the only thing a real d-chip mesh would add is
  the collective traffic — which is modeled analytically in
  ARCHITECTURE.md ("Collective cost model").

Usage:  python scripts/scaling_virtual_mesh.py [--niter 4096] [--npxls 64]
Prints one table; paste into BASELINE.md.
"""

import argparse
import os
import sys
import time

if "--xla_force_host_platform_device_count" not in \
        os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def best_of(fn, reps=3):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--niter", type=int, default=4096)
    ap.add_argument("--npxls", type=int, default=64)
    ap.add_argument("--nsteps", type=int, default=512)
    args = ap.parse_args()

    import logging

    logging.disable(logging.INFO)  # init chatter drowns the table

    import fast_tpu
    from fast_tpu import parallel
    import __graft_entry__ as g

    cores = os.cpu_count()
    print(f"# host cores: {cores}; devices: {len(jax.devices())} "
          f"({jax.devices()[0].platform})")
    mode = ("weak-scaling (>= 8 cores)" if cores >= 8
            else "WORK CONSERVATION (single/few-core host: devices "
                 "timeshare cores; ideal ratio 1.0)")
    print(f"# measurement mode: {mode}\n")

    rows = {}
    devs = [d for d in (1, 2, 4, 8) if d <= len(jax.devices())]

    # --- 1. iid Monte Carlo (mc axis), fixed total NITER ---
    for d in devs:
        mesh = parallel.make_mesh(d)
        sim = fast_tpu.Fast(g._flagship_params(
            npxls=args.npxls, niter=args.niter, nchunks=4, DX=0.05,
            D_GROUND=1.0, DSUBAP=0.25, SEED=1))
        parallel.run_sharded(sim, mesh)  # compile
        rows.setdefault("iid run_sharded", {})[d] = best_of(
            lambda: np.asarray(parallel.run_sharded(sim, mesh).power))

    # --- 2. 8-config scan (scan axis), fixed total work ---
    for d in devs:
        mesh = parallel.make_scan_mesh(d, 1)
        sims = [fast_tpu.Fast(g._flagship_params(
            npxls=args.npxls, niter=args.niter // 8, nchunks=1, DX=0.05,
            D_GROUND=1.0, DSUBAP=0.25, SEED=2, ZENITH_ANGLE=z))
            for z in np.linspace(30, 65, 8)]
        parallel.run_scan_sharded(sims, mesh)
        rows.setdefault("8-config run_scan_sharded", {})[d] = best_of(
            lambda: parallel.run_scan_sharded(sims, mesh, seed=3))

    # --- 3. layer-sharded boiling AR (8 layers), fixed series length ---
    for d in devs:
        mesh = parallel.make_mesh(d)
        h, cn2, w = fast_tpu.turbulence_models.HV57_Bufton_profile(8)
        sim = fast_tpu.Fast(g._flagship_params(
            npxls=args.npxls, niter=args.nsteps, nchunks=1, DX=0.05,
            D_GROUND=1.0, DSUBAP=0.25, SEED=4, TEMPORAL=True,
            TEMPORAL_SYNTH="ar", TEMPORAL_ALPHA=0.98, DT=0.001,
            H_TURB=h, CN2_TURB=cn2, WIND_SPD=w,
            WIND_DIR=np.linspace(0.0, 315.0, 8)))
        parallel.run_sharded(sim, mesh)
        rows.setdefault("layer-sharded boiling AR", {})[d] = best_of(
            lambda: np.asarray(parallel.run_sharded(sim, mesh).power))

    print(f"{'workload':<28} " + " ".join(f"{d}dev(s)".rjust(10)
                                          for d in devs)
          + "   ratio(8/1)")
    for name, t in rows.items():
        ratios = " ".join(f"{t[d]:>9.3f}s" for d in devs)
        print(f"{name:<28} {ratios}   {t[devs[-1]] / t[devs[0]]:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
