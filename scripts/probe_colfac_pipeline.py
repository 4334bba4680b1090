"""Probe: software-pipelined PRNG in the merged colfac kernel (VERDICT r4 #8).

The 256² record kernel is >96% occupied (committed traces) but sits ~3x
under the chip's practical matmul ceiling; the round-4 roofline argued
the gap is the serialized per-column VPU work (PRNG draw + convert)
between MXU factor dots. The ``pipeline=True`` variant of
``_colfac_detect_call_merged`` issues column m+1's draw before column
m's dot so the scheduler has independent VPU/MXU work to overlap
(random variables identical per column; +1/m_tile discarded tail draw).

This probe times production vs pipelined INTERLEAVED, best-of-N, on the
flagship 256² tables at the production tile — the only defensible
methodology on the pooled chip (CLAUDE.md: throughput varies 5x
run-to-run and even path *orderings* flip between hours).

Usage: python scripts/probe_colfac_pipeline.py [--niter 65536] [--reps 7]
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
    ap.add_argument("--niter", type=int, default=65536)
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--b-tile", type=int, default=None)
    ap.add_argument("--m-tile", type=int, default=None)
    ap.add_argument("--phases", action="store_true",
                    help="also time the phase-budget variants "
                         "(noprng/nodots/nodetect)")
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
    from fast_tpu.ops import pallas_synth
    import __graft_entry__ as g

    sim = fast_tpu.Fast(g._flagship_params(
        npxls=256, niter=args.niter, nchunks=1, RNG="rbg",
        SYNTH="pallas_colfac"))
    precision = sim.params["PRECISION"]
    noise = sim.params.get("MC_NOISE", "gauss")
    nb = sim.Niter_per_chunk // 2
    l2, w3 = pallas_synth.colfac_pack_tables_merged(
        np.asarray(sim._L_colfac), np.asarray(sim._W_pruned), precision,
        noise=noise)
    tabs = (jax.device_put(jnp.asarray(l2)), jax.device_put(jnp.asarray(w3)))
    P = l2.shape[-1] // 2
    pm = np.pad(np.asarray(sim._pm, np.float32),
                ((0, P - sim.Npxls_pup), (0, P - sim.Npxls_pup)))
    bt, mt = pallas_synth.colfac_tile_select_merged(
        nb, sim.Npxls, sim.Npxls_pup, precision,
        b_tile=args.b_tile, m_tile=args.m_tile)
    print(f"# tile ({bt}, {mt}), nb={nb}, P={P}, precision={precision}, "
          f"noise={noise}")

    def make(pipe=False, noprng=False, probe=None, fast_sincos=True):
        @jax.jit
        def run(seed, l2, w3):
            return pallas_synth._colfac_detect_call_merged(
                jnp.asarray(seed, jnp.int32).reshape(1), l2, w3,
                jnp.asarray(pm), nb, bt, mt, precision=precision,
                premixed=(noise == "mixed"), pipeline=pipe,
                probe_noprng=noprng, probe=probe,
                fast_sincos=fast_sincos)
        return run

    # production now uses the fused sincos detect (round 5); 'legacy'
    # is the pre-round-5 jnp.cos/jnp.sin detect kept for A/B
    fns = {"production": make(), "pipelined": make(pipe=True),
           "legacy_sincos": make(fast_sincos=False)}
    if args.phases:
        # phase-budget variants (all statistically WRONG except
        # production): the deltas bound each phase's share of the
        # kernel wall — noprng hoists the per-column draw, nodots skips
        # the factor dot, nodetect replaces cos/sin with a linear
        # reduction
        fns["noprng"] = make(noprng=True)
        fns["nodots"] = make(probe="nodots")
        fns["nodetect"] = make(probe="nodetect")
        # round-5 residual split: nocontract deletes the K=2m contraction
        # dot AND the acc update; noacc keeps the dot but overwrites
        # instead of read-modify-write. (nocontract - noacc) bounds the
        # dot; (noacc - production) bounds the acc read traffic.
        fns["nocontract"] = make(probe="nocontract")
        fns["noacc"] = make(probe="noacc")
    # value identity: same seed -> same couplings (the pipelined loop
    # consumes the identical PRNG stream per column)
    outs = {k: np.asarray(f(123, *tabs)) for k, f in fns.items()}
    dmax = np.abs(outs["production"] - outs["pipelined"]).max()
    rel = dmax / max(1e-30, np.abs(outs["production"]).max())
    print(f"# value identity: max |d| = {dmax:.3e} (rel {rel:.2e})")
    # the legacy jnp.cos/sin detect is statistically EXACT vs production
    # (same random variables, same phases) but numerically ~1 ulp
    # different per cos/sin evaluation; report the coupling-level
    # deviation, which should be tiny vs the coupling scale
    dfs = np.abs(outs["production"] - outs["legacy_sincos"]).max()
    rfs = dfs / max(1e-30, np.abs(outs["production"]).max())
    print(f"# legacy-sincos deviation: max |d| = {dfs:.3e} (rel {rfs:.2e})")

    best = {k: np.inf for k in fns}
    for rep in range(args.reps):
        for k, f in fns.items():
            t0 = time.time()
            out = f(1000 + rep, *tabs)
            _ = float(jnp.abs(out).sum())
            dt = time.time() - t0
            best[k] = min(best[k], dt)
    n_real = 2 * nb
    for k in fns:
        print(f"{k:>11}: best {best[k]*1e3:8.2f} ms  "
              f"{n_real / best[k] / 1e3:9.1f}k r/s")
    ratio = best["production"] / best["pipelined"]
    print(f"# pipelined/production speedup: {ratio:.3f}x")
    if args.phases:
        t = best["production"]
        print(f"# phase budget (of {t*1e3:.1f} ms): "
              f"prng ~{(t - best['noprng'])/t:5.1%}  "
              f"factor dots ~{(t - best['nodots'])/t:5.1%}  "
              f"detect cos/sin ~{(t - best['nodetect'])/t:5.1%}  "
              f"(residual = contraction dot + acc traffic)")
        print(f"# residual split: contraction dot "
              f"~{(best['noacc'] - best['nocontract'])/t:5.1%}  "
              f"acc read (RMW) ~{(t - best['noacc'])/t:5.1%}  "
              f"contract+acc total ~{(t - best['nocontract'])/t:5.1%}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
