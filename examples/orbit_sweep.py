"""Example: LEO pass sweep with the built-in Keplerian ephemeris.

Samples an idealised 550 km circular-orbit pass over a ground station,
derives per-sample link geometry (zenith angle, range, point-ahead angle,
downlink anisoplanatism), builds one simulation per sample, and runs them
as a sharded parameter scan when more than one device is available.

    python examples/orbit_sweep.py
"""

import jax
import numpy as np

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))  # run without installing

import fast_tpu
from fast_tpu import orbit, parallel


def main():
    provider = orbit.circular_orbit_provider(550e3, offset_angle_deg=5.0)
    times = np.linspace(-120, 120, 4)  # seconds around culmination

    h, cn2, w = fast_tpu.turbulence_models.HV57_Bufton_profile(4)
    p = dict(fast_tpu.conf.DEFAULTS)
    p.update({
        "NPXLS": 164, "DX": 0.01, "NITER": 1600, "NCHUNKS": 2,
        "TEMPORAL": False, "D_GROUND": 0.8, "DSUBAP": 0.1,
        "H_TURB": h, "CN2_TURB": cn2, "WIND_SPD": w,
        "WIND_DIR": np.array([0.0, 90.0, 180.0, 270.0]), "SEED": 1,
    })

    geometry = orbit.sample_pass_geometry(provider, times, p["TLOOP"])
    # one vmapped PSD assembly for all samples (fast_tpu.sweep); the
    # reference-style per-sample path is orbit.FAST_sat_orbit_from_geometry
    from fast_tpu import sweep
    sims = sweep.build_sweep(p, {
        "ZENITH_ANGLE": geometry["zenith_angles"],
        "L_SAT": geometry["distances"],
        "DTHETA": geometry["paa"],
        "ANISO_DL": geometry["aniso_dl"],
        "AZIMUT_SAT": geometry["azimuts"],
    })
    sims = {f"simulation_{i}": s for i, s in enumerate(sims)}

    ndev = len(jax.devices())
    mesh = parallel.make_scan_mesh(2, ndev // 2) if ndev >= 4 else None
    results = orbit.run_orbit_sweep(sims, mesh=mesh)

    print(f"{'t [s]':>7} {'elev':>6} {'range km':>9} {'PAA \"':>7} "
          f"{'mean dBm':>9} {'scint':>7}")
    for i, t in enumerate(times):
        r = results[f"simulation_{i}"]
        paa = np.hypot(*geometry["paa"][i])
        print(f"{t:>7.0f} {geometry['altitudes'][i]:>6.1f} "
              f"{geometry['distances'][i] / 1e3:>9.0f} {paa:>7.1f} "
              f"{10 * np.log10(np.mean(r.power) / 1e-3):>9.2f} "
              f"{r.scintillation_index:>7.4f}")


if __name__ == "__main__":
    main()
