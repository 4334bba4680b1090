"""Probe: where does the wall-vs-device gap of the sustained entry go?

The round-5 record trace shows 1.843 M r/s device-side (8.89 ms per
16 384-realization chunk) while the 64-chunk sustained bench entry
measures ~1.46 M r/s wall — ~26% lost somewhere between the kernel and
the wall clock. Two hypotheses:

  (a) per-DISPATCH overhead (relay execute round-trip, host work):
      amortizable by raising chunks-per-dispatch;
  (b) per-CHUNK on-device overhead in the ``lax.scan`` program beyond
      the traced kernel time: not amortizable by (a).

This probe times single dispatches of the SAME per-chunk program at
several chunk counts and fits ``wall = overhead + per_chunk * n``:
the slope is the true on-device per-chunk time (relay constants cancel),
the intercept is the per-dispatch overhead. It also checks whether
back-to-back dispatches pipeline (3 dispatches materialized once vs
each materialized) — if they do, REPS_PER_SET already hides the
intercept and the bench gap is per-chunk.

Usage: python scripts/probe_dispatch_overhead.py [--reps 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chunks", type=int, nargs="*",
                    default=[16, 64, 256])
    args = ap.parse_args()

    import bench
    if not bench.probe_backend():
        print("TPU backend unreachable")
        return 2

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_fast_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import fast_tpu
    from fast_tpu.ops.rng import make_key
    import __graft_entry__ as g

    B = 16384
    runs = {}
    for nch in args.chunks:
        sim = fast_tpu.Fast(g._flagship_params(
            npxls=256, niter=nch * B, nchunks=nch, RNG="rbg",
            SYNTH="pallas_colfac"))
        runs[nch] = (sim, sim._run_all_fn())

    key = make_key(0, impl="rbg")

    def fetch(out):
        return float(jnp.abs(out).sum())

    # warm all programs (compile + one-time remote load)
    for nch, (sim, fn) in runs.items():
        for i in range(2):
            assert np.isfinite(fetch(fn(key, jax.random.fold_in(key, i))))

    # interleaved best-of-N single-dispatch walls
    best = {nch: np.inf for nch in runs}
    for rep in range(args.reps):
        for nch, (sim, fn) in runs.items():
            t0 = time.time()
            out = fn(key, jax.random.fold_in(key, 100 + rep))
            fetch(out)
            best[nch] = min(best[nch], time.time() - t0)
    ns = sorted(best)
    for nch in ns:
        print(f"# {nch:4d} chunks: best {best[nch]*1e3:8.1f} ms  "
              f"{nch * B / best[nch] / 1e3:9.1f}k r/s")
    # least-squares fit wall = a + b * nchunks
    A = np.stack([np.ones(len(ns)), np.asarray(ns, float)], axis=1)
    y = np.asarray([best[n] for n in ns])
    (a, b), *_ = np.linalg.lstsq(A, y, rcond=None)
    print(f"# fit: per-dispatch overhead {a*1e3:.1f} ms, per-chunk "
          f"{b*1e3:.2f} ms ({B / b / 1e3:.0f}k r/s device-side implied)")

    # pipelining check at the largest chunk count: 3 dispatches
    # materialized once vs each materialized
    nch = ns[-1]
    sim, fn = runs[nch]
    piped = sync = np.inf
    for rep in range(max(2, args.reps // 2)):
        t0 = time.time()
        outs = [fn(key, jax.random.fold_in(key, 200 + rep * 3 + i))
                for i in range(3)]
        for o in outs:
            fetch(o)
        piped = min(piped, time.time() - t0)
        t0 = time.time()
        for i in range(3):
            fetch(fn(key, jax.random.fold_in(key, 300 + rep * 3 + i)))
        sync = min(sync, time.time() - t0)
    print(f"# 3x {nch}-chunk: pipelined {piped*1e3:.1f} ms vs "
          f"serial-fetch {sync*1e3:.1f} ms ({sync/piped:.3f}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
