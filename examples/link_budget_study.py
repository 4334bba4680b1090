"""Example: AO-corrected uplink fading statistics vs zenith angle.

Runs a small zenith-angle sweep of the Monte Carlo link simulation and
prints mean coupled power, scintillation index, and 1%-fade depth for each
geometry. Runs anywhere (CPU included); on TPU hardware the same code uses
the accelerated synthesis paths automatically.

    python examples/link_budget_study.py
"""

import numpy as np

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))  # run without installing

import fast_tpu


def make_params(zenith):
    h, cn2, w = fast_tpu.turbulence_models.HV57_Bufton_profile(4)
    p = dict(fast_tpu.conf.DEFAULTS)
    p.update({
        "NPXLS": 164, "DX": 0.01, "NITER": 2000, "NCHUNKS": 2,
        "TEMPORAL": False, "D_GROUND": 0.8, "WVL": 1550e-9,
        "ZENITH_ANGLE": zenith, "AO_MODE": "AO", "DSUBAP": 0.1,
        "TLOOP": 0.001, "TEXP": 0.001, "ALIAS": True,
        "H_TURB": h, "CN2_TURB": cn2, "WIND_SPD": w,
        "WIND_DIR": np.array([0.0, 90.0, 180.0, 270.0]), "SEED": 1,
    })
    return p


def main():
    print(f"{'zenith':>7} {'mean dBm':>9} {'scint idx':>10} "
          f"{'1% fade dB':>11} {'r0_los cm':>10}")
    for zenith in (0, 30, 45, 60):
        sim = fast_tpu.Fast(make_params(zenith))
        res = sim.run()
        rel = np.sort(res.power / sim.diffraction_limit)
        fade_1pct = 10 * np.log10(rel[int(0.01 * len(rel))] / rel.mean())
        print(f"{zenith:>7} {res.avg_power_dBm:>9.2f} "
              f"{res.scintillation_index:>10.4f} {fade_1pct:>11.2f} "
              f"{sim.r0_los * 100:>10.1f}")


if __name__ == "__main__":
    main()
