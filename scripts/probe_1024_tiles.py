"""Tile-candidate probe for the huge-pupil colfac fallback (1024², P=512).

The bench's 1024² entry (4 m pupil -> P=512) lands on
``colfac_tile_select*``'s smallest-tile fallback ``(8, 8)``: none of the
ladder's candidates fit the 55 MB VMEM model because the f32 screen
accumulators alone cost ``2*b*P²*4`` = 2.1 MB per batch row. But the
model admits points the ladder never tries — merged ``(16, 4)`` and
split ``(16, 16)`` fit at P=512 with twice the MXU row occupancy of
``(8, 8)`` (the merged dot is ``(b, 2P) x (2P, 2P)``: at b=8 only 8 of
128 sublanes carry work).

This probe times the candidates on the real chip (interleaved
best-of-N), catching Mosaic VMEM compile failures per candidate, and
times the engine's full run program under SYNTH='pallas_fused' for
comparison. Its measurements (P=256/384/512, see BASELINE.md round 4)
are the evidence base for the promoted huge-pupil rungs in
``colfac_tile_select``/``colfac_tile_select_merged`` and for the
P>=256 'split' preference in ``colfac_layout`` — re-run it before
changing any of those.

Usage: python scripts/probe_1024_tiles.py [--niter 4096] [--reps 3]
       [--npxls 1024] [--d-ground 4.0] [--dsubap 0.5]
(--npxls 512 --d-ground 2.0 probes P=256; --d-ground 3.0 probes P=384)
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--niter", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--npxls", type=int, default=1024)
    ap.add_argument("--d-ground", type=float, default=4.0,
                    help="pupil diameter (m); 2.0 at --npxls 512 probes "
                         "the P=256 midzone where merged falls to (8,8) "
                         "but split still fits (64,64)")
    ap.add_argument("--dsubap", type=float, default=0.5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_fast_tpu"))
    import __graft_entry__ as g
    import fast_tpu
    from fast_tpu.ops import pallas_synth

    print(f"# device: {jax.devices()[0].device_kind}", flush=True)
    t0 = time.time()
    sim = fast_tpu.Fast(g._flagship_params(
        npxls=args.npxls, niter=args.niter, nchunks=1, RNG="rbg",
        SYNTH="pallas_colfac", D_GROUND=args.d_ground,
        DSUBAP=args.dsubap))
    print(f"# init {time.time() - t0:.0f}s  npup={sim.Npxls_pup} "
          f"ncols={sim.Npxls}", flush=True)

    # pack the merged-layout tables explicitly (production's layout
    # auto-rule picks split at these pupil sizes — the point of this
    # probe is the measured A/B behind that rule)
    pm = np.asarray(sim._pm)
    precision = sim.params["PRECISION"]
    mc_noise = sim.params.get("MC_NOISE", "gauss")
    B = sim.Niter_per_chunk
    nb = B // 2  # the kernel draws conjugate pairs
    flops = 8 * pallas_synth._round_up(sim.Npxls_pup, 128) ** 2 \
        * sim.Npxls * B
    l2m, w2m = pallas_synth.colfac_pack_tables_merged(
        np.asarray(sim._L_colfac), np.asarray(sim._W_pruned), precision,
        noise=mc_noise)
    tabs = (jax.device_put(jnp.asarray(l2m)),
            jax.device_put(jnp.asarray(w2m)))

    auto = pallas_synth.colfac_tile_select_merged(
        nb, sim.Npxls, sim.Npxls_pup, precision)
    print(f"# merged auto tiles: {auto}  (production layout auto-rule: "
          f"{pallas_synth.colfac_layout(None, sim.Npxls_pup, precision)})",
          flush=True)

    candidates = [auto, (16, 4), (8, 4), (16, 8), (32, 8), (32, 4),
                  (16, 2)]
    seen = set()
    fns = {}
    for bt, mt in candidates:
        if (bt, mt) in seen or nb % bt or sim.Npxls % mt:
            continue
        seen.add((bt, mt))

        def make(bt=bt, mt=mt):
            @jax.jit
            def run(seed, l2, w2):
                return pallas_synth.fused_colfac_detect_packed(
                    seed, l2, w2, pm, nb, bt, mt,
                    precision=precision, noise=mc_noise)
            return run

        fn = make()
        try:
            t0 = time.time()
            out = fn(123, *tabs)
            s = float(np.abs(np.asarray(out)).sum())
            assert np.isfinite(s)
            print(f"# ({bt:3d},{mt:3d}) compiled+first-run "
                  f"{time.time() - t0:.0f}s", flush=True)
            fns[(bt, mt)] = fn
        except Exception as e:
            print(f"# ({bt:3d},{mt:3d}) FAILED: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)

    # split layout at the same grid: its VMEM model admits (16, 16) at
    # P=512 (factor block is 2*m*P^2 vs the merged 4*m*P^2 twice-buffered)
    L = np.asarray(sim._L_colfac)
    W = np.asarray(sim._W_pruned)
    l2s, w2s = pallas_synth.colfac_pack_tables(L, W, precision,
                                               noise=mc_noise)
    tabs_s = (jax.device_put(jnp.asarray(l2s)),
              jax.device_put(jnp.asarray(w2s)))
    auto_s = pallas_synth.colfac_tile_select(
        nb, sim.Npxls, sim.Npxls_pup, precision)
    print(f"# split auto tiles: {auto_s}", flush=True)
    for bt, mt in [auto_s, (32, 64), (16, 64), (32, 16), (16, 16),
                   (16, 8), (8, 16), (8, 8)]:
        if ("split", bt, mt) in fns:
            continue
        if nb % bt or sim.Npxls % mt:
            continue

        def make_s(bt=bt, mt=mt):
            @jax.jit
            def run(seed, l2, w2):
                return pallas_synth.fused_colfac_detect_packed(
                    seed, l2, w2, pm, nb, bt, mt,
                    precision=precision, noise=mc_noise)
            return run

        fn = make_s()
        try:
            t0 = time.time()
            out = fn(123, *tabs_s)
            s = float(np.abs(np.asarray(out)).sum())
            assert np.isfinite(s)
            print(f"# split ({bt:3d},{mt:3d}) compiled+first-run "
                  f"{time.time() - t0:.0f}s", flush=True)
            fns[("split", bt, mt)] = fn
        except Exception as e:
            print(f"# split ({bt:3d},{mt:3d}) FAILED: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)

    best = {k: np.inf for k in fns}
    for rep in range(args.reps):
        for k, fn in fns.items():
            t0 = time.time()
            out = fn(1000 + rep, *(tabs_s if k[0] == "split" else tabs))
            float(np.abs(np.asarray(out)).sum())
            best[k] = min(best[k], time.time() - t0)
    print("\n# tile              r/s       TFLOP/s (interleaved "
          "best-of-%d)" % args.reps)
    for k in sorted(best, key=best.get):
        rps = B / best[k]
        print(f"{str(k):18s} {rps:9.0f}  {rps * flops / B / 1e12:6.1f}")

    # full-engine comparison: the default fused path at the same grid
    print("\n# pallas_fused full run program at the same config",
          flush=True)
    try:
        t0 = time.time()
        simf = fast_tpu.Fast(g._flagship_params(
            npxls=args.npxls, niter=args.niter, nchunks=1, RNG="rbg",
            SYNTH="pallas_fused", D_GROUND=args.d_ground,
            DSUBAP=args.dsubap))
        print(f"# init {time.time() - t0:.0f}s", flush=True)
        from fast_tpu.ops.rng import make_key
        run_all = simf._run_all_fn()
        key = make_key(0, impl="rbg")
        t0 = time.time()
        out = run_all(key, jax.random.fold_in(key, 1))
        float(np.abs(np.asarray(out)).sum())
        print(f"# compiled+first-run {time.time() - t0:.0f}s", flush=True)
        tb = np.inf
        for rep in range(args.reps):
            t0 = time.time()
            out = run_all(key, jax.random.fold_in(key, 2 + rep))
            float(np.abs(np.asarray(out)).sum())
            tb = min(tb, time.time() - t0)
        print(f"pallas_fused {args.niter / tb:9.0f} r/s")
    except Exception as e:
        print(f"# pallas_fused FAILED: {str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
