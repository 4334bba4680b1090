"""Example: a 50,000-step fading time series on a fixed grid.

The reference's frozen-flow mode grows the spatial grid linearly with the
series length (50k steps here would need a ~37,000-pixel screen). The
AR(1)-in-Fourier temporal mode (TEMPORAL_SYNTH='ar') evolves the Fourier
coefficients on the fixed grid instead — exact frozen-flow translation per
step, plus a per-mode 'boiling' decorrelation that prevents the periodic
grid from ever visibly repeating — so memory is constant in NITER.

    python examples/long_temporal_ar.py
"""

import time

import numpy as np

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))  # run without installing

import fast_tpu
from fast_tpu import comms


def main():
    h, cn2, w = fast_tpu.turbulence_models.HV57_Bufton_profile(4)
    p = dict(fast_tpu.conf.DEFAULTS)
    p.update({
        "NPXLS": 128, "DX": 0.02, "NITER": 50_000, "NCHUNKS": 250,
        "TEMPORAL": True, "TEMPORAL_SYNTH": "ar", "DT": 0.001,
        "D_GROUND": 0.8, "DSUBAP": 0.1, "ZENITH_ANGLE": 45,
        "H_TURB": h, "CN2_TURB": cn2, "WIND_SPD": w,
        "WIND_DIR": np.array([0.0, 90.0, 180.0, 270.0]), "SEED": 11,
    })
    sim = fast_tpu.Fast(p)
    print(f"grid: {sim.Npxls}^2 (fixed; the reference would need "
          f"{int(w.max() * p['DT'] * p['NITER'] / p['DX'] / 2)} px)")
    print(f"AR mode-survival alpha per layer: {np.round(sim._ar_alpha, 4)}")

    t0 = time.time()
    res = sim.run()
    dt_run = time.time() - t0
    I = np.asarray(res.power)
    print(res)
    print(f"{p['NITER']} steps in {dt_run:.1f} s "
          f"({p['NITER'] / dt_run:,.0f} steps/s)")

    thresh = 0.5 * I.mean()
    print(f"fade probability below 0.5*mean: "
          f"{comms.fade_prob(I, thresh):.4f}")
    print(f"mean fade duration: "
          f"{comms.fade_dur(I, thresh, dt=p['DT']) * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
