"""Capture an xplane profiler trace of the production MC program.

Reproduces the committed round-4 artifact
``docs/traces/colfac_256_niter16384.xplane.pb`` (and variants at other
grid sizes / synthesis paths): warms the engine's jitted ``run_all``
program, then records N back-to-back executions under
``jax.profiler.trace``. Feed the resulting ``*.xplane.pb`` to
``scripts/analyze_trace.py`` for the device-time occupancy table.

Usage:
    python scripts/capture_trace.py [--npxls 256] [--niter 16384]
        [--nchunks 1] [--synth pallas_colfac] [--reps 3]
        [--out docs/traces]

The profiler attributes nothing *inside* a Mosaic custom-call (it is
opaque); within-kernel occupancy arguments come from kernel variants
(BASELINE.md round 4). This script evidences the kernel-vs-dispatch
split: device time per program vs wall time per dispatch.
"""

import argparse
import glob
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npxls", type=int, default=256)
    ap.add_argument("--niter", type=int, default=16384)
    ap.add_argument("--nchunks", type=int, default=1)
    ap.add_argument("--synth", default="pallas_colfac")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--d-ground", type=float, default=None,
                    help="ground pupil diameter override (e.g. 4.0 for "
                         "the 1024^2 huge-pupil bench config)")
    ap.add_argument("--dsubap", type=float, default=None)
    ap.add_argument("--temporal", action="store_true",
                    help="trace the fused AR frozen-flow series program "
                         "instead of the iid MC program")
    ap.add_argument("--out", default="docs/traces")
    args = ap.parse_args()

    import jax
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_fast_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if jax.default_backend() != "tpu":
        print("traces must be captured on hardware")
        return 2

    import __graft_entry__ as g
    import fast_tpu

    from fast_tpu.ops.rng import make_key

    pupil = {}
    if args.d_ground is not None:
        pupil["D_GROUND"] = args.d_ground
    if args.dsubap is not None:
        pupil["DSUBAP"] = args.dsubap
    if args.temporal:
        sim = fast_tpu.Fast(g._flagship_params(
            npxls=args.npxls, niter=args.niter, nchunks=args.nchunks,
            RNG="rbg", TEMPORAL=True, TEMPORAL_SYNTH="ar", DT=0.001,
            **pupil))
        run_all = sim._run_all_fn_temporal_ar()
    else:
        sim = fast_tpu.Fast(g._flagship_params(
            npxls=args.npxls, niter=args.niter, nchunks=args.nchunks,
            RNG="rbg", SYNTH=args.synth, **pupil))
        run_all = sim._run_all_fn()  # the production jitted MC program
    key = make_key(0, impl=sim.params["RNG"])

    def run(seed):
        out = run_all(key, jax.random.fold_in(key, seed))
        return float(np.abs(np.asarray(out)).sum())  # force materialise

    run(1)  # compile + program-load
    t0 = time.time()
    run(2)
    warm_wall = time.time() - t0

    tmpdir = "/tmp/jax_trace_capture"
    shutil.rmtree(tmpdir, ignore_errors=True)
    with jax.profiler.trace(tmpdir):
        t0 = time.time()
        # dispatch all reps back-to-back and materialise ONCE at the
        # end: a per-rep fetch serialises the relay round-trip into the
        # profiled window and shows up as >50% device IDLE
        out = None
        for i in range(args.reps):
            out = run_all(key, jax.random.fold_in(key, 10 + i))
        _ = float(np.abs(np.asarray(out)).sum())
        traced_wall = time.time() - t0

    planes = glob.glob(os.path.join(tmpdir, "**", "*.xplane.pb"),
                       recursive=True)
    if not planes:
        print("no xplane produced")
        return 1
    os.makedirs(args.out, exist_ok=True)
    tag = "ar" if args.temporal else args.synth.replace("pallas_", "")
    name = (f"{tag}_{args.npxls}"
            f"_niter{args.niter}x{args.nchunks}.xplane.pb")
    dst = os.path.join(args.out, name)
    shutil.copy(planes[0], dst)
    rps = args.reps * args.niter / traced_wall
    print(f"captured {dst} ({os.path.getsize(dst)} bytes)")
    print(f"wall: warm {warm_wall * 1e3:.1f} ms/dispatch, traced "
          f"{traced_wall * 1e3:.1f} ms / {args.reps} reps "
          f"({rps:.0f} r/s wall)")
    print(f"analyze: python scripts/analyze_trace.py {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
