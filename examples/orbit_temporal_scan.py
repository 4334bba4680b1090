"""Example: temporal fading series across an orbit pass, scan-sharded.

One *correlated* AR(1)-in-Fourier fading series per orbit sample (fixed
grid — the series length never grows the grid), with the samples sharded
over the ``scan`` mesh axis: the layout for characterising fade
durations / surge statistics along a pass. On one device the series run
serially through the same code path.

    python examples/orbit_temporal_scan.py
"""

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))  # run without installing

import fast_tpu
from fast_tpu import orbit, parallel


def main():
    provider = orbit.circular_orbit_provider(550e3, offset_angle_deg=5.0)
    times = np.linspace(-90, 90, 4)  # seconds around culmination

    h, cn2, w = fast_tpu.turbulence_models.HV57_Bufton_profile(4)
    p = dict(fast_tpu.conf.DEFAULTS)
    p.update({
        "NPXLS": 128, "DX": 0.01, "NITER": 600, "NCHUNKS": 6,
        "TEMPORAL": True, "TEMPORAL_SYNTH": "ar", "TEMPORAL_ALPHA": 0.98,
        "DT": 0.001, "D_GROUND": 0.8, "DSUBAP": 0.1,
        "H_TURB": h, "CN2_TURB": cn2, "WIND_SPD": w,
        "WIND_DIR": np.array([0.0, 90.0, 180.0, 270.0]), "SEED": 1,
    })

    geometry = orbit.sample_pass_geometry(provider, times, p["TLOOP"])
    sim_dict = orbit.FAST_sat_orbit_from_geometry(p, geometry)
    sims = [sim_dict[f"simulation_{i}"] for i in range(len(times))]

    ndev = len(jax.devices())
    if ndev >= len(sims):
        mesh = parallel.make_scan_mesh(len(sims), 1)
        results = parallel.run_scan_sharded(sims, mesh)
    else:
        results = [s.run() for s in sims]

    from fast_tpu.comms import fade_prob, fade_dur
    print("t[s]  elev[deg]  mean[dBm]   SI      P(fade<-3dB)  "
          "mean fade dur[ms]")
    for t, el, s, r in zip(times, geometry["altitudes"], sims, results):
        rel = np.asarray(r.power) / s.diffraction_limit
        thresh = rel.mean() * 10 ** (-3 / 10)  # 3 dB below the series mean
        fp = fade_prob(rel, thresh)
        fd = fade_dur(rel, thresh, dt=p["DT"])
        fd_ms = fd * 1e3 if np.isfinite(fd) else float("nan")
        print(f"{t:5.0f}  {el:8.1f}  {r.avg_power_dBm:9.2f}  "
              f"{r.scintillation_index:.4f}  {fp:12.3f}  {fd_ms:10.2f}")


if __name__ == "__main__":
    main()
