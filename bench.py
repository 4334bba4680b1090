"""Benchmark: Monte Carlo throughput + MFU of the flagship AO link.

Headline metric (BASELINE.json): MC realizations/sec/chip at a 256^2 grid
for an AO-corrected satellite link. Baseline = the reference
implementation's numpy path on this host's CPU (no pyFFTW available),
measured via ``FAST_TPU_MEASURE_REF=1`` and recorded below.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"secondary", "perf"} — secondary carries the 512^2 figure, the temporal
AR steps/sec and the default-config (SYNTH='auto') figure; perf carries
the roofline accounting (achieved TFLOP/s, MFU vs the chip's bf16 peak,
per-set throughputs + a spread warning so the driver can tell a
regression from pool contention).
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

# bf16 matmul peak by TPU generation (TFLOP/s/chip, public spec sheets)
_PEAK_BF16 = (
    ("v6", 918.0),   # Trillium
    ("v5p", 459.0),
    ("v5e", 197.0),
    ("v5 lite", 197.0),
    ("v4", 275.0),
)


def peak_tflops(device):
    kind = getattr(device, "device_kind", "").lower()
    for tag, peak in _PEAK_BF16:
        if tag in kind:
            return peak
    return None


def _round_up(x, m):
    return -(-x // m) * m


def kernel_flops_per_screen(synth, N, npup, mc_noise="mixed"):
    """MXU-dot FLOPs per realization for the fused synthesis kernels.

    Counts only the matrix-unit work (the algorithm's FLOPs); VPU work
    (on-chip PRNG, Box-Muller/uniform conversion, detector cos/sin) is
    excluded, so MFU here is a *matmul* utilization — the roofline
    argument in BASELINE.md covers the VPU side.

    Returns ``(alg, total)``: ``alg`` counts only the algorithmic dots
    (color + DFT + detector); ``total`` additionally counts the
    noise-*generation* mixing dot (4N^3 for 'mixed' noise in the fused
    kernel — ~40% of its dots at 256^2), which is MXU work but not
    algorithm. Report both so the MFU number cannot be over-read.
    """
    P = _round_up(npup, 128)
    if synth == "pallas_colfac":
        # per pair: 4 factor dots (b,P)x(P,P) per column (8 P^2 N FLOPs)
        # + 4 accumulate dots contracting the column axis (8 P^2 N);
        # 'mixed' noise folds its mixing matrix into the factor tables
        # (no extra dot). 16 P^2 N per pair -> 8 P^2 N per screen.
        f = 8 * P * P * N
        return f, f
    if synth == "pallas_fused":
        alg = (8 * P * N ** 2 + 8 * P * P * N) / 2
        mix = (4 * N ** 3) / 2 if mc_noise == "mixed" else 0
        return alg, alg + mix
    if synth == "ar":  # per temporal step
        f = 8 * P * N ** 2 + 4 * P * P * N
        return f, f
    return None, None


def probe_backend(timeout_s=90):
    """True if the TPU backend initialises in a throwaway subprocess.

    The axon relay can go down for an hour+ (CLAUDE.md); when it does,
    any in-process ``jax.devices()`` BLOCKS indefinitely with no error,
    which would hang the driver's bench run. A subprocess probe can be
    killed; the main process only touches jax once a probe succeeds.
    """
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_for_backend(attempts=12, wait_s=120):
    """Probe until the backend answers; False after ~40 min of outage
    (each failed probe costs its 90 s subprocess timeout + ``wait_s``)."""
    for i in range(attempts):
        if probe_backend():
            return True
        print(f"# TPU backend unreachable (probe {i + 1}/{attempts}); "
              f"retrying in {wait_s}s", file=sys.stderr)
        if i < attempts - 1:
            time.sleep(wait_s)
    return False


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
    """Steady-state throughput of the full jitted run program.

    Returns a dict with per-set rates, best and median — the pooled chip's
    run-to-run spread is signal the driver needs, not noise to discard.
    """
    import jax

    from fast_tpu.ops.rng import make_key

    run_all = (sim._run_all_fn_temporal_ar() if temporal
               else sim._run_all_fn())
    key = make_key(0, impl=sim.params["RNG"])

    # compile + warm (two fetch cycles: first real execution can include
    # one-time remote program load)
    for i in range(2):
        checksum = float(np.abs(
            np.asarray(run_all(key, jax.random.fold_in(key, 1000 + i)))
        ).sum())
        assert np.isfinite(checksum)

    rates = []
    for r in range(rep_sets):
        t0 = time.time()
        for i in range(reps):
            out = run_all(key, jax.random.fold_in(key, 10 * r + i))
        checksum = float(np.abs(np.asarray(out)).sum())
        assert np.isfinite(checksum)
        dt = (time.time() - t0) / reps
        rates.append(niter / dt)
        print(f"#   set {r}: {niter / dt:.0f} /s", file=sys.stderr)
    rates = sorted(rates)
    return {
        "best": rates[-1],
        "median": float(np.median(rates)),
        "sets": [round(x, 1) for x in rates],
        "spread_warning": bool(rates[-1] > 2.0 * rates[0]),
    }


def measure_comms():
    """Recurring comms datapoint (VERDICT r3 #6): 16-QAM modem SEP/EVM and
    GMI wall time over a 2^20-sample coherent fading series from the
    public ``run()``. Walls are warm (each program runs once first)."""
    import __graft_entry__ as g
    import fast_tpu
    from fast_tpu import comms

    print("# comms: 16-QAM modem + GMI on a 2^20 coherent series",
          file=sys.stderr)
    sim = fast_tpu.Fast(g._flagship_params(
        npxls=256, niter=1 << 20, nchunks=32, RNG="rbg", COHERENT=True))
    sim.run()  # compile + one-time program load
    t0 = time.time()
    res = sim.run()
    run_wall = time.time() - t0
    field = np.asarray(res.power) / sim.diffraction_limit

    def modem():
        m = comms.Modulator(field, "16-QAM", EsN0=18,
                            symbols_per_iter=32, rng=3)
        m.run()
        return m

    modem()
    t0 = time.time()
    m = modem()
    modem_wall = time.time() - t0

    comms.generalised_mutual_information_qam(field, 16, 32, 18)
    t0 = time.time()
    gmi = comms.generalised_mutual_information_qam(field, 16, 32, 18)
    gmi_wall = time.time() - t0
    out = {
        "comms_run_2e20_coherent_wall_s": round(run_wall, 2),
        "comms_modem_sep_16qam": round(m.sep, 4),
        "comms_modem_evm_16qam": round(m.evm, 4),
        "comms_modem_wall_s_2e20x32sym": round(modem_wall, 2),
        "comms_gmi_bits_16qam": round(float(gmi), 3),
        "comms_gmi_wall_s_2e20": round(gmi_wall, 2),
    }
    print(f"#   {out}", file=sys.stderr)
    return out


def measure_orbit_pass(nsamp=16, niter=65536):
    """End-to-end orbit-pass economics (VERDICT r4 #1).

    Times a realistic satellite pass — ``nsamp`` geometry samples from
    :func:`sample_pass_geometry` → :func:`build_sweep` (the full vmapped
    f64 PSD assembly, *included* in the wall) → :func:`run_scan_sharded`
    at ``niter`` realizations per sample. The reference builds ``nsamp``
    full inits and runs them serially at ~30 r/s
    (``complete_orbit_simulation.py:187-232``); this is the number that
    pass has to beat *including* init, not just post-init.
    """
    import numpy as np

    from fast_tpu import orbit, parallel, sweep
    import __graft_entry__ as g

    print(f"# orbit pass: {nsamp} samples x {niter} realizations, "
          "end-to-end (geometry + vmapped PSD assembly + scan run)",
          file=sys.stderr)
    provider = orbit.circular_orbit_provider(600e3, offset_angle_deg=10.0)
    p = g._flagship_params(npxls=256, niter=niter,
                           nchunks=max(1, niter // 16384), RNG="rbg")
    mesh = parallel.make_scan_mesh(1, 1)

    def one_pass(seed):
        geo = orbit.sample_pass_geometry(
            provider, np.linspace(-240, 240, nsamp), p["TLOOP"])
        sims = sweep.build_sweep(p, {
            "ZENITH_ANGLE": geo["zenith_angles"],
            "L_SAT": geo["distances"],
            "DTHETA": geo["paa"],
            "ANISO_DL": geo["aniso_dl"],
            "AZIMUT_SAT": geo["azimuts"],
        })
        res = parallel.run_scan_sharded(sims, mesh, seed=seed)
        mean = float(np.mean([float(np.asarray(r.power).mean())
                              for r in res]))
        assert np.isfinite(mean)
        return sims[0].profile.timings

    one_pass(11)  # cold: compiles the assembly + scan programs
    best_wall, best_t = None, None
    for rep in range(2):
        t0 = time.time()
        timings = one_pass(12 + rep)
        wall = time.time() - t0
        print(f"#   warm pass {rep}: {wall:.2f} s", file=sys.stderr)
        if best_wall is None or wall < best_wall:
            best_wall, best_t = wall, timings
    marginal = best_t.get("sweep_assemble", 0.0) / nsamp
    out = {
        "orbit_pass_16x65k_wall_s": round(best_wall, 2),
        "orbit_pass_rps_e2e": round(nsamp * niter / best_wall, 1),
        "orbit_pass_init_marginal_s_per_sample": round(marginal, 3),
    }
    print(f"#   {out}", file=sys.stderr)
    return out


# entries completed so far, so a mid-run outage still records what was
# measured before the relay dropped (the 256^2 headline lands first)
_PARTIAL = {}


def _outage_json(detail):
    best = _PARTIAL.get("best256")
    print(json.dumps({
        "metric": "mc_realizations_per_sec_256sq_chip",
        "value": round(best, 1) if best else None,
        "unit": "realizations/s",
        "vs_baseline": round(best / REF_CPU_RPS, 1) if best else None,
        "secondary": _PARTIAL.get("secondary", {}),
        "error": f"TPU backend unreachable (axon relay outage): {detail}; "
                 "see CLAUDE.md environment gotchas"
                 + ("; value/secondary carry the entries measured before "
                    "the drop" if _PARTIAL else ""),
    }))


def _arm_watchdog(seconds=75 * 60):
    """Emit the outage record and exit if the whole bench overruns.

    A relay outage *mid-bench* blocks the next device fetch forever (no
    error — CLAUDE.md), which would hang the driver; a warm bench takes
    ~25 min and a cold one ~45, so 75 min means the tunnel died.
    SIGALRM only fires in the main thread, which is where every fetch
    in this script happens.
    """
    import signal

    def _on_alarm(signum, frame):
        _outage_json(f"bench exceeded {seconds // 60} min — the relay "
                     "likely dropped mid-run (device fetches block "
                     "forever during an outage)")
        os._exit(3)

    try:
        signal.signal(signal.SIGALRM, _on_alarm)
        signal.alarm(seconds)
    except (ValueError, AttributeError):  # non-main thread / platform
        pass


def main():
    if not wait_for_backend():
        # Emit a parseable record rather than hanging the driver: the
        # relay outage is an environment failure, not a perf result.
        _outage_json("backend-init probe subprocesses timed out for "
                     "~40 min")
        return
    _arm_watchdog()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_fast_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import __graft_entry__ as g
    import fast_tpu

    dev = jax.devices()[0]
    peak = peak_tflops(dev)
    print(f"# device: {dev.device_kind} (bf16 peak "
          f"{peak if peak else 'unknown'} TFLOP/s)", file=sys.stderr)

    ref_rps = REF_CPU_RPS
    if os.environ.get("FAST_TPU_MEASURE_REF"):
        ref_rps = measure_reference()
        print(f"# measured reference CPU: {ref_rps:.1f} r/s", file=sys.stderr)

    # pallas_colfac: fused kernel drawing noise in the colfac basis —
    # Npup*N normals per screen instead of N^2; fastest at both sizes
    # (the one-time f64 factor build is excluded, like all init)
    synth = os.environ.get("FAST_TPU_SYNTH", "pallas_colfac")

    print("# 256^2 iid (single dispatch per timing rep)", file=sys.stderr)
    sim = fast_tpu.Fast(g._flagship_params(
        npxls=256, niter=NITER, nchunks=1, RNG="rbg", SYNTH=synth))
    r256 = measure_rps(sim, NITER)
    _PARTIAL["best256"] = r256["best"]
    _PARTIAL.setdefault("secondary", {})["per_dispatch_rps_256sq"] = \
        round(r256["best"], 1)

    # Sustained: the same workload with the chunk loop ON DEVICE
    # (lax.scan over chunks of the same per-chunk shape). The round-5
    # dispatch-overhead fit (scripts/probe_dispatch_overhead.py,
    # BASELINE.md) measured wall = 31.8 ms/dispatch + 8.88 ms/chunk —
    # the per-chunk slope matches the committed 99.81%-occupancy trace
    # to 0.05%, so chunks-per-dispatch is the ONLY wall lever left.
    print("# 256^2 iid sustained (256-chunk on-device loop)",
          file=sys.stderr)
    # 256 chunks = 4.19M realizations (~2.3 s device) per dispatch:
    # relay latency falls to ~1.4% and a single dispatch measured
    # 1.819M r/s wall vs 1.742M at 64 chunks in the same window
    sim_sus = fast_tpu.Fast(g._flagship_params(
        npxls=256, niter=256 * NITER, nchunks=256, RNG="rbg", SYNTH=synth))
    r_sus = measure_rps(sim_sus, 256 * NITER, rep_sets=6, reps=1)
    _PARTIAL["best256"] = max(_PARTIAL["best256"], r_sus["best"])
    _PARTIAL["secondary"]["sustained_rps_256sq_256chunk"] = \
        round(r_sus["best"], 1)

    print("# 256^2 default config (SYNTH='auto', 256-chunk sustained)",
          file=sys.stderr)
    sim_def = fast_tpu.Fast(g._flagship_params(
        npxls=256, niter=256 * NITER, nchunks=256))
    r_def = measure_rps(sim_def, 256 * NITER, rep_sets=3, reps=1)
    _PARTIAL["secondary"]["default_config_rps_256sq"] = \
        round(r_def["best"], 1)

    print("# 512^2 iid (256-chunk sustained)", file=sys.stderr)
    # 2.1M realizations per dispatch (~2.2 s device): the 31.8 ms
    # dispatch overhead falls from ~5.5% (64 chunks) to ~1.4%
    sim512 = fast_tpu.Fast(g._flagship_params(
        npxls=512, niter=2097152, nchunks=256, RNG="rbg", SYNTH=synth))
    r512 = measure_rps(sim512, 2097152, rep_sets=4, reps=1)
    _PARTIAL["secondary"]["mc_realizations_per_sec_512sq_chip"] = \
        round(r512["best"], 1)

    print("# 512^2 default config (SYNTH='auto', 256-chunk sustained)",
          file=sys.stderr)
    sim_def512 = fast_tpu.Fast(g._flagship_params(
        npxls=512, niter=2097152, nchunks=256))
    r_def512 = measure_rps(sim_def512, 2097152, rep_sets=3, reps=1)
    _PARTIAL["secondary"]["default_config_rps_512sq"] = \
        round(r_def512["best"], 1)

    print("# 1024^2 iid, 4 m pupil (huge-pupil colfac tile fallback)",
          file=sys.stderr)
    # 400-px pupil -> P=512 >= 384: no candidate tile fits the VMEM
    # budget; the layout auto-rule picks the split kernel at (8, 8)
    # (measured +21% over merged at this size, scripts/probe_1024_tiles.py)
    sim1k = fast_tpu.Fast(g._flagship_params(
        npxls=1024, niter=8192, nchunks=4, RNG="rbg", SYNTH=synth,
        D_GROUND=4.0, DSUBAP=0.5))
    r1k = measure_rps(sim1k, 8192, rep_sets=3, reps=1)
    _PARTIAL["secondary"]["mc_realizations_per_sec_1024sq_chip"] = \
        round(r1k["best"], 1)

    print("# 1024^2 default config (SYNTH='auto' -> fused, 4 m pupil)",
          file=sys.stderr)
    # what a user gets at this grid: the fused kernel needs no factor
    # stack (no 24 s init) and measured 4.2x the colfac fallback.
    # 16 chunks (~1.3 s device/dispatch) cuts dispatch overhead from
    # ~10% at 4 chunks to ~2.5% (round-5 overhead fit)
    sim_def1k = fast_tpu.Fast(g._flagship_params(
        npxls=1024, niter=32768, nchunks=16, RNG="rbg",
        D_GROUND=4.0, DSUBAP=0.5))
    r_def1k = measure_rps(sim_def1k, 32768, rep_sets=3, reps=1)
    _PARTIAL["secondary"]["default_config_rps_1024sq"] = \
        round(r_def1k["best"], 1)

    print("# 256^2 temporal AR frozen flow", file=sys.stderr)
    sim_t = fast_tpu.Fast(g._flagship_params(
        npxls=256, niter=16384, nchunks=64, RNG="rbg", TEMPORAL=True,
        TEMPORAL_SYNTH="ar", DT=0.001))
    r_t = measure_rps(sim_t, 16384, rep_sets=5, reps=1, temporal=True)
    _PARTIAL["secondary"]["temporal_ar_steps_per_sec_256sq"] = \
        round(r_t["best"], 1)

    # sustained: one dispatch per 524k-step series — long fading series
    # are the production shape, and the round-5 overhead fit says a
    # dispatch costs ~32 ms regardless of length: at 131k steps that
    # was ~13% of wall, at 524k it is ~3%
    print("# 256^2 temporal AR sustained (524k-step series)",
          file=sys.stderr)
    sim_ts = fast_tpu.Fast(g._flagship_params(
        npxls=256, niter=524288, nchunks=2048, RNG="rbg", TEMPORAL=True,
        TEMPORAL_SYNTH="ar", DT=0.001))
    r_ts = measure_rps(sim_ts, 524288, rep_sets=4, reps=1, temporal=True)
    _PARTIAL["secondary"]["temporal_ar_steps_per_sec_256sq_sustained"] = \
        round(r_ts["best"], 1)

    comms = measure_comms()
    orbit_pass = measure_orbit_pass()
    _PARTIAL["secondary"] = {**_PARTIAL.get("secondary", {}), **orbit_pass}

    mc_noise = sim.params.get("MC_NOISE", "mixed")

    def tfl(rate, synth_name, s):
        alg, total = kernel_flops_per_screen(
            synth_name, s.Npxls, s.Npxls_pup, mc_noise)
        if not total:
            return None, None
        return round(rate * alg / 1e12, 2), round(rate * total / 1e12, 2)

    def mfu(tflops):
        return round(tflops / peak, 4) if peak and tflops else None

    _, tflops_256 = tfl(r256["best"], sim._synth, sim)
    _, tflops_sus = tfl(r_sus["best"], sim_sus._synth, sim_sus)
    _, tflops_512 = tfl(r512["best"], sim512._synth, sim512)
    _, tflops_1k = tfl(r1k["best"], sim1k._synth, sim1k)
    _, tflops_ar = tfl(r_t["best"], "ar", sim_t)
    _, tflops_ar_sus = tfl(r_ts["best"], "ar", sim_ts)
    tflops_def_alg, tflops_def = tfl(r_def["best"], sim_def._synth, sim_def)
    tflops_def512_alg, tflops_def512 = tfl(
        r_def512["best"], sim_def512._synth, sim_def512)
    tflops_def1k_alg, tflops_def1k = tfl(
        r_def1k["best"], sim_def1k._synth, sim_def1k)

    perf = {
        "device_kind": dev.device_kind,
        "peak_tflops_bf16": peak,
        "synth": sim._synth,
        "mc_noise": mc_noise,
        "tflops_256": tflops_256,
        "tflops_256_sustained": tflops_sus,
        "tflops_512": tflops_512,
        "tflops_1024": tflops_1k,
        # _alg counts only the algorithmic dots (color+DFT+detector);
        # _total also counts the 4N^3 noise-mixing dot (MXU work, not
        # algorithm) — see kernel_flops_per_screen
        "tflops_default_alg": tflops_def_alg,
        "tflops_default_total": tflops_def,
        "tflops_default512_alg": tflops_def512_alg,
        "tflops_default512_total": tflops_def512,
        "tflops_default1024_alg": tflops_def1k_alg,
        "tflops_default1024_total": tflops_def1k,
        "tflops_ar_step": tflops_ar,
        "tflops_ar_step_sustained": tflops_ar_sus,
        "mfu_256": mfu(tflops_256),
        "mfu_256_sustained": mfu(tflops_sus),
        "mfu_512": mfu(tflops_512),
        "mfu_1024": mfu(tflops_1k),
        "mfu_default_alg": mfu(tflops_def_alg),
        "mfu_default_total": mfu(tflops_def),
        "mfu_default512_alg": mfu(tflops_def512_alg),
        "mfu_default512_total": mfu(tflops_def512),
        "mfu_default1024_alg": mfu(tflops_def1k_alg),
        "mfu_default1024_total": mfu(tflops_def1k),
        "mfu_ar": mfu(tflops_ar),
        "mfu_ar_sustained": mfu(tflops_ar_sus),
        "sets_256": r256["sets"],
        "median_256": round(r256["median"], 1),
        "sets_256_sustained": r_sus["sets"],
        "median_256_sustained": round(r_sus["median"], 1),
        "sets_512": r512["sets"],
        "median_512": round(r512["median"], 1),
        "sets_1024": r1k["sets"],
        "spread_warning": bool(r256["spread_warning"]
                               or r512["spread_warning"]),
    }

    best256 = max(r256["best"], r_sus["best"])
    print(json.dumps({
        "metric": "mc_realizations_per_sec_256sq_chip",
        "value": round(best256, 1),
        "unit": "realizations/s",
        "vs_baseline": round(best256 / ref_rps, 1),
        "secondary": {
            "sustained_rps_256sq_256chunk": round(r_sus["best"], 1),
            "per_dispatch_rps_256sq": round(r256["best"], 1),
            "mc_realizations_per_sec_512sq_chip": round(r512["best"], 1),
            "mc_realizations_per_sec_1024sq_chip": round(r1k["best"], 1),
            "temporal_ar_steps_per_sec_256sq": round(r_t["best"], 1),
            "temporal_ar_steps_per_sec_256sq_sustained":
                round(r_ts["best"], 1),
            "default_config_rps_256sq": round(r_def["best"], 1),
            "default_config_rps_512sq": round(r_def512["best"], 1),
            "default_config_rps_1024sq": round(r_def1k["best"], 1),
            **comms,
            **orbit_pass,
        },
        "perf": perf,
    }))


if __name__ == "__main__":
    main()
