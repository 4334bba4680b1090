"""Comms layer tests: modulator, error rates, GMI, fades, bit packing."""

import numpy as np
import pytest
import scipy.special

import fast_tpu
from fast_tpu import comms
from conftest import make_test_params


@pytest.fixture(scope="module")
def power_samples():
    rng = np.random.default_rng(11)
    # lognormal fading-like power series
    return np.exp(rng.normal(-0.125, 0.5, size=5000))


class TestModulator:
    @pytest.mark.parametrize("scheme", ["OOK", "BPSK", "QPSK", "16-QAM",
                                        "8-PSK"])
    def test_sep_evm_finite(self, power_samples, scheme):
        m = comms.Modulator(power_samples[:500], scheme, EsN0=10,
                            symbols_per_iter=100,
                            rng=np.random.default_rng(0))
        m.run()
        assert np.isfinite(m.sep)
        assert np.isfinite(m.evm)
        assert 0 <= m.sep <= 1

    def test_no_noise_no_errors(self, power_samples):
        m = comms.Modulator(power_samples[:100], "QPSK", EsN0=None,
                            symbols_per_iter=50,
                            rng=np.random.default_rng(1))
        m.run()
        assert m.sep == 0.0
        assert m.evm == 0.0

    def test_data_roundtrip(self):
        payload = b"hello fast-tpu!!"
        power = np.ones(len(payload) * 8)
        m = comms.Modulator(power, "OOK", EsN0=None, data=payload)
        m.modulate()
        m.demodulate()
        # noiseless OOK: every iteration decodes the payload
        assert bytes(m.recv_data[0].tobytes()) == payload


class TestErrorRates:
    def test_Q_function(self):
        assert np.isclose(comms.Q(0), 0.5)
        assert np.isclose(comms.Q(3), 0.5 * scipy.special.erfc(3 / np.sqrt(2)))

    def test_ber_ook_nosamples(self):
        ber = comms.ber_ook(10)
        assert 0 < ber < 1e-3

    def test_ber_ook_fading_worse(self, power_samples):
        assert comms.ber_ook(10, power_samples) > comms.ber_ook(10)

    def test_sep_qam_nosamples(self):
        sep = comms.sep_qam(4, 10)
        assert 0 < sep < 1

    def test_ber_qam(self, power_samples):
        ber = comms.ber_qam(4, 10, samples=power_samples)
        assert np.isfinite(ber)
        assert 0 < ber < 1

    def test_sep_decreases_with_snr(self):
        assert comms.sep_qam(16, 20) < comms.sep_qam(16, 10)


class TestConstellations:
    def test_shapes(self):
        assert len(comms.define_constellation("OOK")) == 2
        assert len(comms.define_constellation("BPSK")) == 2
        assert len(comms.define_constellation("QPSK")) == 4
        assert len(comms.define_constellation("16-QAM")) == 16
        assert len(comms.define_constellation("64-QAM")) == 64
        assert len(comms.define_constellation("16-PSK")) == 16

    def test_qam_rejects_nonsquare(self):
        with pytest.raises(ValueError):
            comms.define_constellation("8-QAM")

    def test_gray_code_neighbours(self):
        code = comms._bin2gray_qam(16).reshape(4, 4)
        # adjacent cells differ by exactly one bit
        for i in range(4):
            for j in range(3):
                diff = sum(a != b for a, b in zip(code[i, j], code[i, j + 1]))
                assert diff == 1


class TestBitPacking:
    @pytest.mark.parametrize("bps", [1, 2, 4])
    def test_encode_decode_roundtrip(self, bps):
        payload = b"The quick brown fox"
        symbols, pad = comms._encode(payload, bps)
        decoded = comms._decode(symbols, bps, pad)
        assert bytes(decoded)[:len(payload)] == payload

    def test_flip_bits_rate(self):
        rng = np.random.default_rng(3)
        data = np.zeros(10000, dtype=np.uint8)
        flipped = comms.flip_bits(data, 0.1, rng=rng)
        rate = np.unpackbits(flipped).mean()
        assert 0.08 < rate < 0.12


class TestFades:
    def test_fade_prob(self):
        I = np.concatenate([np.ones(900), np.zeros(100)])
        assert np.isclose(comms.fade_prob(I, 0.5), 0.1)
        assert np.isnan(comms.fade_prob(np.ones(100), 0.5))

    def test_fade_dur(self):
        I = np.ones(1000)
        # 40 fades of duration 3
        for i in range(40):
            I[i * 25 + 5: i * 25 + 8] = 0.0
        dur = comms.fade_dur(I, 0.5, dt=2.0)
        assert np.isclose(dur, 6.0)


class TestMutualInformation:
    def test_gmi_bounds(self, power_samples):
        samples = np.sqrt(power_samples[:2000]) * np.exp(
            1j * np.random.default_rng(5).uniform(0, 2 * np.pi, 2000))
        gmi = comms.generalised_mutual_information_qam(samples, 4, 32, 15)
        assert 0 <= gmi <= 2.05  # <= log2(4) + binning slack

    def test_mi_finite(self, power_samples):
        samples = np.sqrt(power_samples[:2000])
        mi = comms.mutual_information_qam(samples, 4, 32, 10)
        assert np.isfinite(mi)


class TestCoherentPipeline:
    def test_engine_complex_field_to_gmi(self):
        """Coherent engine output feeds the GMI/MI estimators end to end."""
        p = make_test_params(TEMPORAL=False, COHERENT=True, NITER=2000,
                             NCHUNKS=2, SEED=12)
        sim = fast_tpu.Fast(p)
        res = sim.run()
        samples = np.asarray(res.power) / sim.diffraction_limit
        assert np.iscomplexobj(samples)
        gmi = comms.generalised_mutual_information_qam(samples, 4, 32, 12)
        mi = comms.mutual_information_qam(samples, 4, 32, 12)
        assert 0 <= gmi <= 2.05
        assert np.isfinite(mi)

    def test_ber_improves_with_snr(self):
        p = make_test_params(TEMPORAL=False, NITER=400, NCHUNKS=2, SEED=14)
        sim = fast_tpu.Fast(p)
        power = np.asarray(sim.run().power)
        bers = [comms.ber_qam(16, snr, samples=power) for snr in (5, 15, 25)]
        assert bers[0] > bers[1] > bers[2]


class TestFastFSOC:
    @pytest.mark.parametrize("scheme", ["OOK", "BPSK", "QAM"])
    def test_full_pipeline(self, scheme):
        p = make_test_params(TEMPORAL=False, MODULATION=scheme, EsN0=10)
        sim = fast_tpu.FastFSOC(p)
        sim.run()
        assert np.isfinite(sim.I).all()
        assert np.isfinite(sim.modulator.sep)
        assert np.isfinite(sim.modulator.evm)

    def test_crossval_modulator(self, reference_fast):
        """Reference and rebuilt modulators agree on SEP statistically."""
        rng = np.random.default_rng(8)
        power = np.exp(rng.normal(0, 0.4, size=2000))
        m_ref = reference_fast.comms.Modulator(power, "QPSK", EsN0=8,
                                               symbols_per_iter=200)
        m_ref.run()
        m_new = comms.Modulator(power, "QPSK", EsN0=8, symbols_per_iter=200,
                                rng=np.random.default_rng(9))
        m_new.run()
        assert abs(m_ref.sep - m_new.sep) < 0.02
        assert abs(m_ref.evm - m_new.evm) < 0.02
