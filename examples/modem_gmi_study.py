"""Example: modulation study over a fading link — SEP, BER and GMI.

Runs a coherent Monte Carlo link once, then evaluates several modulation
formats on the same fading series: measured symbol-error rate from the
jitted modem, the analytic fading-averaged BER, and the generalised
mutual information (soft-decision capacity) from on-device I-Q
histograms.

    python examples/modem_gmi_study.py
"""

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
        "NPXLS": 164, "DX": 0.01, "NITER": 4000, "NCHUNKS": 10,
        "TEMPORAL": False, "COHERENT": True, "D_GROUND": 0.8,
        "DSUBAP": 0.1, "ZENITH_ANGLE": 50, "H_TURB": h, "CN2_TURB": cn2,
        "WIND_SPD": w, "WIND_DIR": np.array([0.0, 90.0, 180.0, 270.0]),
        "SEED": 5,
    })
    sim = fast_tpu.Fast(p)
    res = sim.run()
    field = np.asarray(res.power) / sim.diffraction_limit  # complex
    power = np.abs(field) ** 2

    print(f"{'scheme':>8s} {'EsN0':>5s} {'SEP(meas)':>10s} "
          f"{'BER(analytic)':>14s} {'GMI [bit/sym]':>14s}")
    for scheme, M in (("QPSK", 4), ("16-QAM", 16)):
        for esn0 in (8, 14):
            m = comms.Modulator(power, scheme, EsN0=esn0,
                                symbols_per_iter=100, rng=3)
            m.run()
            ber = comms.ber_qam(M, esn0 - 10 * np.log10(np.log2(M)), power)
            gmi = comms.generalised_mutual_information_qam(
                field, M, 32, esn0)
            print(f"{scheme:>8s} {esn0:>5d} {m.sep:>10.4f} "
                  f"{ber:>14.2e} {gmi:>14.3f}")


if __name__ == "__main__":
    main()
