"""Per-unit occupancy table from a committed JAX profiler trace.

Usage::

    python scripts/analyze_trace.py docs/traces/colfac_256_niter16384.xplane.pb

Reproduces the device-occupancy table in BASELINE.md ("Round 4 — trace"):
converts the xplane protobuf with xprof's ``raw_to_tool_data`` (the
tensorboard profile plugin, baked into the image) and prints, per HLO
category, total device time and share of the profiled window.

Capture a fresh trace with::

    with jax.profiler.trace(logdir):
        for i in range(3):
            out = run_all(key, jax.random.fold_in(key, i))
        float(np.abs(np.asarray(out)).sum())

(Methodology note: a Pallas/Mosaic kernel appears as one opaque
``custom-call`` — the profiler cannot attribute FLOPs or per-unit time
*inside* it, so within-kernel MXU/VPU splits must come from measured
kernel variants; see BASELINE.md.)
"""
import sys

from xprof.convert import raw_to_tool_data as rtd


def main(path):
    import json
    import os
    import shutil
    import tempfile

    # convert from a clean directory: the converter caches derived
    # op_stats sidecars (ALL_HOSTS.op_stats.pb) next to the input and a
    # stale one from a DIFFERENT trace silently shadows the file passed
    with tempfile.TemporaryDirectory() as td:
        tmp = os.path.join(td, os.path.basename(path))
        shutil.copy(path, tmp)
        data, _ = rtd.xspace_to_tool_data([tmp], "op_profile", {})
    d = json.loads(data if isinstance(data, str) else data.decode())
    prog = d["byProgram"]
    rows = []

    def leafcats(node):
        m = node.get("metrics", node)
        name = node.get("name", "?")
        t = m.get("rawTime", 0)
        if name in ("IDLE",):
            rows.append((name, t))
            return
        kids = node.get("children", [])
        if not kids:
            rows.append((name, t))
            return
        if name.startswith("by_program") or name == "main" or \
                node is prog:
            for c in kids:
                leafcats(c)
        else:  # an HLO category: report it whole
            rows.append((name, t))

    leafcats(prog)
    rows.sort(key=lambda r: -r[1])
    tot = sum(t for _, t in rows)
    print(f"{'category':<28} {'ms':>10} {'share':>8}")
    for name, t in rows:
        if t == 0:
            continue
        print(f"{name:<28} {t / 1e9:>10.3f} {t / tot:>7.2%}")
    print(f"{'TOTAL (device window)':<28} {tot / 1e9:>10.3f}")


if __name__ == "__main__":
    main(sys.argv[1])
