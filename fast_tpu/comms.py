"""Optical-communications layer (reference ``fast/comms.py``).

Modulation/demodulation over the Monte Carlo power series, symbol/bit error
rates, EVM, mutual information, and fade statistics. These operate on the
(host-side) result arrays after the device Monte Carlo run, so they are
implemented in numpy/scipy; the heavy upstream work (the realizations
themselves) already ran on the TPU.
"""

import logging

import numpy as np
from scipy.ndimage import correlate1d
from scipy.special import erfc

from .engine import Fast
from .ops.apertures import gaussian2d

logger = logging.getLogger(__name__)


class Modulator:
    """Modulate/demodulate random symbol streams over the MC power series.

    Supports OOK, BPSK, QPSK/QAM, M-PSK and square M-QAM with optional AWGN
    at a given average symbol SNR; computes symbol error probability and
    EVM (reference ``fast/comms.py:13-145``).
    """

    def __init__(self, power, modulation, EsN0=None, symbols_per_iter=1000,
                 data=None, rng=None):
        power = np.asarray(power)
        self.power = power / power.mean()
        self.amplitude = np.sqrt(self.power)
        self.modulation = modulation
        self.symbols_per_iter = symbols_per_iter
        self.EsN0 = EsN0
        self.data = data
        self._rng = rng if rng is not None else np.random.default_rng()
        if EsN0 is not None:
            self.snr = np.sqrt(10 ** (EsN0 / 10)) * self.power

    def generate_symbols(self):
        if self.modulation in ["OOK", "BPSK"]:
            self.nsymbols = 2
        elif self.modulation in ["QPSK", "QAM"]:
            self.nsymbols = 4
        elif len(self.modulation.split("-")) == 2:
            self.nsymbols = int(self.modulation.split("-")[0])
        else:
            raise ValueError("Scheme not recognised")

        self.bits_per_symbol = int(np.log2(self.nsymbols))

        if self.data is not None:
            s, self._pad_bits = _encode(self.data, self.bits_per_symbol)
            self.symbols = np.array([s] * len(self.power)).T
            self.symbols_per_iter = len(s)
        else:
            self.symbols = self._rng.integers(
                0, self.nsymbols, size=(self.symbols_per_iter, len(self.power)))

    def modulate(self):
        if self.modulation is None:
            self.recv_signal = self.power
            return self.recv_signal

        self.generate_symbols()
        self.constellation = define_constellation(self.modulation)
        mod = self.constellation[self.symbols]

        self.Es = (np.abs(self.constellation) ** 2).mean()

        if self.EsN0 is not None:
            shape = (self.symbols_per_iter, len(self.power))
            if self.modulation == "OOK":
                self.awgn = self._rng.normal(0, self.Es / self.snr, size=shape)
            else:
                sigma = np.sqrt(self.Es / 2) / self.snr
                self.awgn = (self._rng.normal(0, sigma, size=shape)
                             + 1j * self._rng.normal(0, sigma, size=shape))
        else:
            self.awgn = 0

        self.recv_signal = mod + self.awgn
        return self.recv_signal

    def demodulate(self):
        if self.modulation is None:
            self.recv_symbols = None
            return self.recv_symbols

        if self.modulation == "OOK":
            self.recv_symbols = (self.recv_signal > 0.5).astype(int)
        elif self.modulation == "BPSK":
            self.recv_symbols = (self.recv_signal.real < 0).astype(int)
        else:
            d = np.abs(self.recv_signal[None, ...]
                       - self.constellation[:, None, None])
            self.recv_symbols = d.argmin(0)

        if self.data is not None:
            # one decoded payload per power iteration (the reference's
            # version indexed inconsistently and could not run,
            # ``fast/comms.py:106-109``; its test was commented out)
            decoded = [
                np.frombuffer(bytes(_decode(
                    self.recv_symbols[:, i], self.bits_per_symbol,
                    self._pad_bits)), dtype=np.uint8)
                for i in range(len(self.power))
            ]
            self.recv_data = np.stack(decoded)

        return self.recv_symbols

    def compute_sep(self):
        """Symbol error probability over the random stream."""
        if self.modulation is None:
            self.sep = None
        else:
            self.sep = (self.recv_symbols != self.symbols).mean()
        return self.sep

    def compute_evm(self):
        """Error vector magnitude relative to constellation RMS."""
        if self.modulation is None:
            self.evm = None
        else:
            tx_signal = self.constellation[self.symbols]
            ref = np.sqrt((tx_signal.real ** 2 + tx_signal.imag ** 2).mean())
            self.evm = (abs(tx_signal - self.recv_signal) / ref).mean()
        return self.evm

    def run(self):
        self.modulate()
        self.demodulate()
        self.compute_sep()
        self.compute_evm()


class FastFSOC(Fast):
    """``Fast`` subclass wiring MODULATION/EsN0 into a post-run Modulator."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.modulation = self.params["MODULATION"]
        self.EsN0 = self.params["EsN0"]

    def run(self):
        result = super().run()
        self.modulator = Modulator(self.result.power, self.modulation,
                                   self.EsN0)
        self.modulator.run()
        return result

    def make_header(self, params):
        hdr = super().make_header(params)
        hdr["MODULATION"] = str(params["MODULATION"])
        hdr["EsN0"] = self.EsN0 if self.EsN0 is not None else "None"
        return hdr


# ---------------------------------------------------------------------------
# fade statistics
# ---------------------------------------------------------------------------


def fade_prob(I, threshold, min_fades=30):
    """Probability of power below ``threshold``; NaN if fewer than
    ``min_fades`` fade samples (reference ``fast/comms.py:171-177``)."""
    I = np.asarray(I)
    nfades = (I < threshold).sum()
    if nfades < min_fades:
        return np.nan
    return nfades / len(I)


def fade_dur(I, threshold, dt=1, min_fades=30):
    """Mean fade duration below ``threshold`` (reference ``comms.py:180-194``)."""
    fade_mask = np.asarray(I) < threshold
    fade_start = np.where(np.diff(fade_mask.astype(int)) == 1)[0] + 1
    fades = np.array_split(fade_mask, fade_start)[1:]
    fades_filt = [f for f in fades if not f[-1]]
    if len(fades_filt) < min_fades:
        return np.nan
    return np.mean([f.sum() for f in fades_filt]) * dt


# ---------------------------------------------------------------------------
# analytic error rates
# ---------------------------------------------------------------------------


def Q(x):
    """Gaussian tail probability."""
    return 0.5 * erfc(x / np.sqrt(2))


def ber_ook(EbN0, samples=None):
    """OOK bit error rate; MC-averaged over ``samples`` when provided
    (Andrews & Phillips 2005 ch. 11 eq. 58; reference ``comms.py:197-221``)."""
    snr = np.sqrt(10 ** (EbN0 / 10))
    if samples is None:
        return Q(snr)
    s = samples / samples.mean()
    return Q(s * snr).mean()


def sep_qam(M, EsN0, samples=None):
    """Square M-QAM symbol error probability (Rice)."""
    EsN0_frac = 10 ** (EsN0 / 10)
    prefactor = (np.sqrt(M) - 1) / np.sqrt(M)
    if samples is None:
        q = Q(np.sqrt(3 / (M - 1) * EsN0_frac))
        return 4 * (prefactor * q - prefactor ** 2 * q ** 2)
    s = samples / samples.mean()
    EsN0_frac = EsN0_frac * s ** 2
    q = Q(np.sqrt(3 / (M - 1) * EsN0_frac))
    return 4 * (prefactor * q - prefactor ** 2 * q ** 2).mean()


def ber_qam(M, EbN0, samples=None):
    """Square M-QAM bit error rate (Gray coding, nearest-neighbour errors)."""
    return 1 / np.log2(M) * sep_qam(
        M, 10 * np.log10(np.log2(M)) + EbN0, samples)


# ---------------------------------------------------------------------------
# mutual information
# ---------------------------------------------------------------------------


def generalised_mutual_information_qam(samples, M, npxls, EsN0, N0=None,
                                       shot=False):
    """GMI for bit-wise soft-decision decoding (Alvarado et al. 2016).

    Reference ``fast/comms.py:265-302``.
    """
    fyx = convolve_awgn_qam(samples, M, npxls, EsN0, N0=N0,
                            region_size="full", shot=shot)
    fy = fyx.mean(0)
    log2_fy = np.ma.log2(fy)

    gray_code = _bin2gray_qam(M)
    m = int(np.log2(M))
    gmi = np.zeros((m, 2, npxls, npxls))
    for i in range(m):
        ix = _bit_at_index(gray_code, i, 0)
        fyb_0 = fyx[ix].mean(0)
        fyb_1 = fyx[~ix].mean(0)
        gmi[i, 0] = fyb_0 * (np.ma.log2(fyb_0) - log2_fy)
        gmi[i, 1] = fyb_1 * (np.ma.log2(fyb_1) - log2_fy)

    return gmi.sum((-1, -2)).mean(1).sum()


def mutual_information_qam(samples, M, npxls, EsN0, N0=None, shot=False):
    """Symbol-wise mutual information (Alvarado et al. 2016 eq. 16)."""
    fyx = convolve_awgn_qam(samples, M, npxls, EsN0, N0=N0,
                            region_size="full", shot=shot)
    fy = fyx.mean(0)
    return (fyx * (np.ma.log2(fyx) - np.ma.log2(fy))).sum((-1, -2)).mean()


def convolve_awgn_qam(samples, M, npxls, EsN0, N0=None,
                      region_size="individual", shot=False):
    """Received I-Q plane PDFs per M-QAM symbol under AWGN.

    Bins the MC field samples into per-symbol 2-D histograms and convolves
    with the (separable) AWGN Gaussian, or with per-bin shot-noise
    Gaussians (reference ``fast/comms.py:317-415``).
    """
    constellation = define_constellation(f"{M}-QAM")
    if region_size == "individual":
        decision_region_size = 1 / (np.sqrt(M) - 1)
    elif region_size == "full":
        decision_region_size = 2
    else:
        raise ValueError(
            "decision_region_size must be either 'full' or 'individual'")

    mean_amp = np.mean(np.abs(samples))
    constellation_norm = constellation * mean_amp
    region_norm = decision_region_size * mean_amp

    if N0 is None:
        Es = np.mean(np.abs(constellation_norm) ** 2)
        N0 = Es / 10 ** (EsN0 / 10)

    if region_size == "full":
        region_required = 2 * (mean_amp / np.sqrt(2) + 2 * np.sqrt(N0))
        if region_required > region_norm:
            logger.debug(
                "AWGN noise level too large for region, increasing size")
            region_norm = region_required

    dx = region_norm / npxls
    x_g = np.linspace(-npxls / 2, npxls / 2, npxls + 1)

    sigma2 = N0 / (2 * dx ** 2)
    if sigma2 < 1:
        sigma2 = 1

    g = np.exp(-(x_g ** 2) / sigma2) / np.sqrt(np.pi * sigma2)

    out = np.zeros((len(constellation), npxls, npxls))
    x = np.linspace(-region_norm / 2, region_norm / 2, npxls + 1)

    for c in range(len(constellation)):
        xbin = x.copy()
        ybin = x.copy()
        if region_size == "individual":
            xbin += constellation_norm[c].real
            ybin += constellation_norm[c].imag

        samples_norm = constellation[c] * np.abs(samples)
        h = np.histogram2d(samples_norm.real, samples_norm.imag,
                           bins=[xbin, ybin])[0] / len(samples_norm)

        if not shot:
            h_conv = correlate1d(h, g, mode="constant", axis=0)
            h_conv = correlate1d(h_conv, g, mode="constant", axis=1)
        else:
            ix, iy = np.where(h > 0)
            sigma_mults = mean_amp ** 2 / (xbin[ix] ** 2 + ybin[iy] ** 2)
            h_conv = np.zeros(h.shape)
            for i in range(len(sigma_mults)):
                h_conv += (
                    h[ix[i], iy[i]]
                    * gaussian2d(h.shape,
                                 np.sqrt(sigma2 * sigma_mults[i] / 2),
                                 cent=(ix[i], iy[i]))
                    / (np.pi * sigma2 * sigma_mults[i]))

        out[c] = h_conv

    return out


# ---------------------------------------------------------------------------
# constellations and bit packing
# ---------------------------------------------------------------------------


def define_constellation(modulation):
    """Complex constellation points for a named modulation scheme."""
    if modulation == "OOK":
        return np.array([0, 1])
    if modulation == "BPSK":
        return np.exp(1j * np.arange(2) * np.pi)
    if modulation in ["QPSK", "QAM"]:
        return np.exp(1j * ((np.arange(4) * np.pi / 2) - np.pi / 4))
    if modulation[-4:] == "-PSK":
        nsymbols = int(modulation[:-4])
        return np.exp(1j * (np.arange(nsymbols) * np.pi / (nsymbols / 2)))
    if modulation[-4:] == "-QAM":
        nsymbols = int(modulation[:-4])
        if np.sqrt(nsymbols) != np.ceil(np.sqrt(nsymbols)):
            raise ValueError(
                f"{nsymbols}-QAM not possible as {nsymbols} is not a perfect "
                "square, only square M-QAM modulations supported")
        n_side = int(np.sqrt(nsymbols))
        x = np.linspace(-1, 1, n_side) / np.sqrt(2)
        xx, yy = np.meshgrid(x, x)
        return (xx + 1j * yy).flatten()
    raise ValueError(f"Modulation scheme {modulation} not supported")


def _bin2gray_qam(M):
    """Gray-code labels for a square QAM grid with every other row flipped."""
    m = int(np.log2(M))
    symbols_bin = [bin(i)[2:].zfill(m) for i in range(M)]
    symbols_gray = []
    for s in symbols_bin:
        sgray = s[0]
        for i in range(len(s) - 1):
            sgray += str(int(s[i]) ^ int(s[i + 1]))
        symbols_gray.append(sgray)

    nside = int(np.sqrt(M))
    tmp = np.array(symbols_gray).reshape(nside, nside).copy()
    for row in tmp[1::2]:
        row[:] = row[::-1]
    return tmp.flatten()


def _bit_at_index(code, index, bit):
    bit = str(bit)
    return np.array([c[index] == bit for c in code], dtype=bool)


def _encode(bs, bps):
    """Byte payload -> symbol stream of ``bps`` bits per symbol."""
    a = np.frombuffer(bs, dtype=np.uint8)
    bits = np.unpackbits(a)
    pad_bits = 0
    if bps == 1:
        return bits, pad_bits
    r = len(bits) % bps
    if r > 0:
        pad_bits = bps - r
        bits = np.pad(bits, [0, pad_bits])
    symbols = (bits.reshape(-1, bps)
               * 2 ** (np.arange(bps, dtype=np.uint8)[::-1])).sum(1).astype(
                   np.uint8)
    return symbols, pad_bits


def _decode(symbols, bps, pad_bits=0):
    """Symbol stream -> byte payload."""
    if bps == 1:
        return np.packbits(symbols)
    bits = np.unpackbits(np.asarray(symbols, dtype=np.uint8)).reshape(
        -1, 8)[:, -bps:].flatten()
    return np.packbits(bits).tobytes()[: -(pad_bits > 0) or None]


def flip_bits(data, ber, rng=None):
    """Randomly flip bits of a payload at rate ``ber`` (testing utility)."""
    rng = rng if rng is not None else np.random.default_rng()
    if isinstance(data, str):
        b = data.encode("ascii")
    elif isinstance(data, np.ndarray):
        b = data.tobytes()
    else:
        raise Exception("String or numpy array as data please")

    bits = np.unpackbits(np.frombuffer(b, dtype=np.uint8))
    flip_ix = np.where(rng.random(len(bits)) < ber)[0]
    bits[flip_ix] ^= 1

    newbytes = np.packbits(bits)
    if isinstance(data, str):
        return (newbytes % 128).tobytes().decode("ascii")
    return np.frombuffer(newbytes.tobytes(), dtype=data.dtype).reshape(
        data.shape)
