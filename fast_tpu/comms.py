"""TPU-first optical-communications layer.

Behavioural parity with the reference comms layer (``fast/comms.py``), but
redesigned for the XLA compilation model rather than transliterated:

* **Modem** (`Modulator`, reference ``fast/comms.py:13-145``): one jitted
  program draws the symbol stream with ``jax.random``, adds AWGN, and decides
  with *closed-form quantizers* — phase rounding for PSK rings, independent
  per-axis grid quantization for square QAM — instead of an O(M) nearest-
  constellation distance search. SEP/EVM are fused reductions in the same
  program.
* **I-Q plane PDFs** (`convolve_awgn_qam`, reference ``fast/comms.py:317-415``):
  2-D histograms are computed as one-hot matmuls (the TPU histogram idiom —
  rides the MXU), scanned over sample blocks and batched over constellation
  points; the AWGN smoothing is a separable Toeplitz matmul ``K @ H @ K.T``
  rather than ``scipy.ndimage.correlate1d``.
* **GMI / MI** (reference ``fast/comms.py:265-314``): a single einsum over a
  bit-membership matrix replaces the Python loop over bit positions; masked
  logarithms are ``where``-gated instead of ``numpy.ma``.
* **Fade statistics** (reference ``fast/comms.py:171-194``): run-length
  accounting via ``segment_sum`` reductions instead of ``np.array_split``.
* **Gray labelling** (reference ``fast/comms.py:477-500``): the integer
  identity ``gray = i ^ (i >> 1)`` with a boustrophedon row flip, instead of
  binary-string manipulation.

Complex arrays never cross a program boundary (axon relay restriction): the
jitted kernels take real inputs (power series, ``|samples|``) and return
stacked (real, imag) floats.
"""

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import erfc

from .engine import Fast
# namespace parity: the reference re-exports aotools' gaussian2d here
# (``fast/comms.py:8``)
from .ops.apertures import gaussian2d  # noqa: F401

logger = logging.getLogger(__name__)

_HIST_BLOCK = 2048  # samples per one-hot histogram matmul block


# ---------------------------------------------------------------------------
# constellations and Gray labelling
# ---------------------------------------------------------------------------


def _parse_scheme(modulation):
    """Scheme name -> (kind, M, phase offset). kind in {ook, psk, qam}."""
    if modulation == "OOK":
        return "ook", 2, 0.0
    if modulation == "BPSK":
        return "psk", 2, 0.0
    if modulation in ("QPSK", "QAM"):
        return "psk", 4, -np.pi / 4
    parts = modulation.split("-")
    if len(parts) == 2 and parts[0].isdigit():
        M = int(parts[0])
        if parts[1] == "PSK":
            return "psk", M, 0.0
        if parts[1] == "QAM":
            n_side = int(round(np.sqrt(M)))
            if n_side * n_side != M:
                raise ValueError(
                    f"{M}-QAM not possible as {M} is not a perfect square, "
                    "only square M-QAM modulations supported")
            return "qam", M, 0.0
    raise ValueError(f"Modulation scheme {modulation} not supported")


def _qam_axis_levels(M):
    """Per-axis amplitude levels of the square M-QAM grid."""
    n_side = int(round(np.sqrt(M)))
    return np.linspace(-1, 1, n_side) / np.sqrt(2)


def define_constellation(modulation):
    """Complex constellation points for a named modulation scheme.

    Same geometry as the reference (``fast/comms.py:418-474``): OOK on the
    real axis, unit-circle PSK (QPSK offset by -pi/4), square M-QAM filling
    the unit box scaled by 1/sqrt(2).
    """
    kind, M, offset = _parse_scheme(modulation)
    if kind == "ook":
        return np.array([0.0, 1.0])
    if kind == "psk":
        return np.exp(1j * (2 * np.pi * np.arange(M) / M + offset))
    levels = _qam_axis_levels(M)
    re, im = np.meshgrid(levels, levels, indexing="xy")
    return (re + 1j * im).ravel()


def gray_labels_qam(M):
    """Gray-coded integer labels over the square QAM grid.

    ``gray(i) = i ^ (i >> 1)`` laid out row-major with every other row
    reversed (boustrophedon), so horizontally *and* vertically adjacent
    points differ in exactly one bit. Matches the reference labelling
    (``fast/comms.py:477-500``) as integers rather than bit strings.
    """
    n_side = int(round(np.sqrt(M)))
    idx = np.arange(M)
    grid = (idx ^ (idx >> 1)).reshape(n_side, n_side)
    grid[1::2] = grid[1::2, ::-1]
    return grid.ravel()


def _bit_membership(M):
    """(m, M) bool matrix: row i = 'bit i (MSB first) of the Gray label is 0'."""
    m = int(np.log2(M))
    labels = gray_labels_qam(M)
    shifts = np.arange(m - 1, -1, -1)
    return ((labels[None, :] >> shifts[:, None]) & 1) == 0


# ---------------------------------------------------------------------------
# the modem kernel
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("kind", "M", "S", "noisy", "random_symbols"))
def _modem_kernel(key_data, power, symbols_in, esn0_db, offset, q_lo, q_step,
                  *, kind, M, S, noisy, random_symbols):
    """Modulate, corrupt, and decide one full symbol matrix in one program.

    Args:
        key_data: raw PRNG key data (uint32) — keys as key *data* so the
            boundary carries only plain arrays.
        power: (B,) normalized received power per Monte Carlo iteration.
        symbols_in: (S,) fixed payload symbols (used when not random).
        esn0_db: average symbol SNR in dB (ignored when not noisy).
        offset: PSK phase offset; q_lo/q_step: QAM per-axis grid origin/pitch.

    Returns (sep, evm, symbols, decisions, recv_r, recv_i) — all real.
    """
    f32 = jnp.float32
    power = power.astype(f32)
    B = power.shape[0]

    if kind == "ook":
        points = jnp.arange(2, dtype=f32) + 0j
    elif kind == "psk":
        ang = 2 * np.pi * jnp.arange(M, dtype=f32) / M + offset.astype(f32)
        points = jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
    else:  # qam
        k = jnp.arange(M)
        n_side = int(round(np.sqrt(M)))
        re = (q_lo + q_step * (k % n_side)).astype(f32)
        im = (q_lo + q_step * (k // n_side)).astype(f32)
        points = jax.lax.complex(re, im)
    Es = (jnp.abs(points) ** 2).mean()

    key = jax.random.wrap_key_data(key_data)
    k_sym, k_re, k_im = jax.random.split(key, 3)
    if random_symbols:
        symbols = jax.random.randint(k_sym, (S, B), 0, M)
    else:
        symbols = jnp.broadcast_to(symbols_in[:, None], (S, B))

    tx = points[symbols]  # (S, B) complex64

    if noisy:
        snr = jnp.sqrt(10.0 ** (esn0_db.astype(f32) / 10.0)) * power  # (B,)
        if kind == "ook":
            noise = jax.random.normal(k_re, (S, B), f32) * (Es / snr)
            recv = tx + noise
        else:
            sigma = jnp.sqrt(Es / 2) / snr
            noise = jax.lax.complex(jax.random.normal(k_re, (S, B), f32),
                                    jax.random.normal(k_im, (S, B), f32))
            recv = tx + sigma * noise
    else:
        recv = tx

    # closed-form decisions: no M-way distance search
    if kind == "ook":
        decisions = (recv.real > 0.5).astype(jnp.int32)
    elif kind == "psk":
        step = 2 * np.pi / M
        n = jnp.round((jnp.arctan2(recv.imag, recv.real) - offset) / step)
        decisions = jnp.mod(n, M).astype(jnp.int32)
    else:
        n_side = int(round(np.sqrt(M)))
        k_re_ix = jnp.clip(jnp.round((recv.real - q_lo) / q_step),
                           0, n_side - 1)
        k_im_ix = jnp.clip(jnp.round((recv.imag - q_lo) / q_step),
                           0, n_side - 1)
        decisions = (k_im_ix * n_side + k_re_ix).astype(jnp.int32)

    sep = (decisions != symbols).mean(dtype=f32)
    ref_rms = jnp.sqrt((jnp.abs(tx) ** 2).mean())
    evm = (jnp.abs(tx - recv) / ref_rms).mean()
    return (sep, evm, symbols.astype(jnp.int32), decisions,
            recv.real, recv.imag)


@functools.partial(
    jax.jit,
    static_argnames=("kind", "M", "S", "noisy", "random_symbols"))
def _modem_stats(*args, **kw):
    """SEP/EVM only: XLA drops the stream output buffers entirely."""
    return _modem_kernel(*args, **kw)[:2]


_UNSET = object()  # distinguishes "never assigned" from an assigned None


class Modulator:
    """Modulate/demodulate symbol streams over the MC power series.

    Same surface as the reference modulator (``fast/comms.py:13-145``) —
    OOK/BPSK/QPSK/M-PSK/square M-QAM, optional AWGN at average symbol SNR
    ``EsN0``, SEP and EVM — implemented as a single jitted program.

    ``rng`` may be an int seed, a ``numpy.random.Generator`` (a seed is drawn
    from it), or a JAX PRNG key.

    Complex input (a COHERENT run's field series) is converted to detected
    intensity ``|field|^2`` — scale-free after the mean normalisation. The
    reference cannot run this case at all (a complex per-iteration SNR
    reaches ``numpy.random.normal``'s sigma, ``fast/comms.py:78-80``).
    """

    _demodulated = False

    def __init__(self, power, modulation, EsN0=None, symbols_per_iter=1000,
                 data=None, rng=None):
        power = np.asarray(power)
        if np.iscomplexobj(power):
            power = np.abs(power) ** 2
        power = power.astype(float)
        self.power = power / power.mean()
        self.amplitude = np.sqrt(self.power)
        self.modulation = modulation
        self.symbols_per_iter = symbols_per_iter
        self.EsN0 = EsN0
        self.data = data
        self._key = _as_key(rng)
        if EsN0 is not None:
            self.snr = np.sqrt(10 ** (EsN0 / 10)) * self.power

    def generate_symbols(self):
        """Resolve the scheme and, for payload data, the symbol stream."""
        kind, M, offset = _parse_scheme(self.modulation)
        self._kind, self._offset = kind, offset
        self.nsymbols = M
        self.bits_per_symbol = int(np.log2(M))
        if self.data is not None:
            s, self._pad_bits = pack_payload(self.data, self.bits_per_symbol)
            self.symbols_per_iter = len(s)
            self._fixed_symbols = np.asarray(s, np.int32)
        else:
            self._fixed_symbols = None

    def modulate(self):
        self._modulate_impl()
        return self.recv_signal  # materialises the stream (parity)

    def _modulate_impl(self):
        """Modulate without touching the lazy streams (used by run())."""
        if self.modulation is None:
            self.recv_signal = self.power
            return
        self.generate_symbols()
        self.constellation = define_constellation(self.modulation)
        self.Es = float((np.abs(self.constellation) ** 2).mean())
        self._run_kernel()

    def _run_kernel(self):
        kind, M = self._kind, self.nsymbols
        if kind == "qam":
            levels = _qam_axis_levels(M)
            q_lo, q_step = float(levels[0]), float(levels[1] - levels[0])
        else:
            q_lo = q_step = 0.0
        fixed = (self._fixed_symbols if self._fixed_symbols is not None
                 else np.zeros(self.symbols_per_iter, np.int32))
        noisy = self.EsN0 is not None
        self._kernel_args = (
            jax.random.key_data(self._key), jnp.asarray(self.power),
            jnp.asarray(fixed), jnp.float32(self.EsN0 if noisy else 0.0),
            jnp.float32(self._offset), jnp.float32(q_lo),
            jnp.float32(q_step))
        self._kernel_kw = dict(
            kind=kind, M=M, S=self.symbols_per_iter, noisy=noisy,
            random_symbols=self._fixed_symbols is None)
        # Everything downstream is lazy so each usage pattern dispatches
        # exactly ONE program: run() touches only sep/evm, so it gets the
        # stats-only program (XLA dead-code-eliminates the (niter, S)
        # stream buffers — ~0.8 s at 2^20 x 32 symbols where
        # materialising the four streams costs ~45 s through the relay);
        # a streams consumer (modulate()/demodulate()) gets the full
        # kernel, whose sep/evm outputs are captured so stats cost
        # nothing extra. Both programs share the SAME key — streams are
        # bit-identical to the ones the stats were computed from.
        self._streams = None
        self._stats = None
        self._noisy = noisy
        # a re-modulation regenerates every stream: drop any
        # reference-parity attribute assignments (the reference keeps
        # plain attributes, which its modulate() overwrites) so stale
        # overrides can't shadow the fresh kernel's outputs
        self._symbols_override = None
        self._recv_override = None
        self._awgn_override = None
        self._recv_symbols_override = _UNSET
        self._demodulated = False

    def _stats_vals(self):
        """(sep, evm), via the stats-only program unless already known."""
        if self._stats is None:
            sep, evm = _modem_stats(*self._kernel_args, **self._kernel_kw)
            self._stats = (float(sep), float(evm))
        return self._stats

    def _fetch_streams(self):
        """Materialise the symbol/decision/recv streams (lazy, cached)."""
        if self._streams is None:
            sep, evm, symbols, decisions, r, i = _modem_kernel(
                *self._kernel_args, **self._kernel_kw)
            self._streams = (np.asarray(symbols), np.asarray(decisions),
                             np.asarray(r), np.asarray(i))
            if self._stats is None:  # sticky once reported
                self._stats = (float(sep), float(evm))
        return self._streams

    @property
    def symbols(self):
        """Transmitted symbol indices (lazy stream materialisation)."""
        if getattr(self, "_symbols_override", None) is not None:
            return self._symbols_override
        return self._fetch_streams()[0]

    @symbols.setter
    def symbols(self, value):
        self._symbols_override = value

    @property
    def recv_signal(self):
        """Received (noisy, faded) signal stream (lazy materialisation)."""
        if getattr(self, "_recv_override", None) is not None:
            return self._recv_override
        _, _, r, i = self._fetch_streams()
        return r if self._kind == "ook" else r + 1j * i

    @recv_signal.setter
    def recv_signal(self, value):
        self._recv_override = value

    @property
    def recv_symbols(self):
        """Hard symbol decisions (lazy materialisation; None pre-demod)."""
        ov = getattr(self, "_recv_symbols_override", _UNSET)
        if ov is not _UNSET:
            return ov
        if not self._demodulated:
            return None
        return self._fetch_streams()[1]

    @recv_symbols.setter
    def recv_symbols(self, value):
        self._recv_symbols_override = value

    @property
    def awgn(self):
        """The AWGN realisation added to the stream (reference parity).

        Recovered as ``recv - tx`` (the kernel adds the noise on-device;
        ``fast/comms.py:78-86`` exposes the drawn array). 0 when noiseless.
        """
        if getattr(self, "_awgn_override", None) is not None:
            return self._awgn_override
        if not getattr(self, "_noisy", False):
            return 0
        tx = self.constellation[self.symbols]
        if self._kind == "ook":
            tx = tx.real
        return self.recv_signal - tx

    @awgn.setter
    def awgn(self, value):
        # reference-compatible attribute assignment (the reference keeps
        # ``awgn`` as a plain attribute, fast/comms.py:78-86); assigned
        # values shadow the recovered recv - tx array
        self._awgn_override = value

    def demodulate(self):
        if self.modulation is None:
            self.recv_symbols = None
            return None
        self._demodulated = True
        if self.data is not None:
            self.recv_data = np.stack([
                np.frombuffer(
                    unpack_payload(self.recv_symbols[:, b],
                                   self.bits_per_symbol, self._pad_bits),
                    dtype=np.uint8)
                for b in range(len(self.power))
            ])
        return self.recv_symbols

    def compute_sep(self):
        """Symbol error probability over the stream."""
        self.sep = (None if self.modulation is None
                    else self._stats_vals()[0])
        return self.sep

    def compute_evm(self):
        """Error vector magnitude relative to the transmitted RMS."""
        self.evm = (None if self.modulation is None
                    else self._stats_vals()[1])
        return self.evm

    def run(self):
        self._modulate_impl()
        # mark demodulated (decisions fetch lazily via recv_symbols);
        # payload-data mode decodes eagerly — the decode needs the stream
        self._demodulated = self.modulation is not None
        if self.data is not None:
            self.demodulate()
        self.compute_sep()
        self.compute_evm()


def _as_key(rng):
    if rng is None:
        return jax.random.key(np.random.default_rng().integers(2 ** 63))
    if isinstance(rng, (int, np.integer)):
        return jax.random.key(int(rng))
    if isinstance(rng, np.random.Generator):
        return jax.random.key(int(rng.integers(2 ** 63)))
    return rng  # assume a JAX PRNG key


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
# fade statistics (segment reductions)
# ---------------------------------------------------------------------------


@jax.jit
def _fade_run_stats(below):
    """(total fade samples, run count) over *complete interior* runs.

    A run is counted when it starts after t=0 (a 0->1 transition exists) and
    terminates before the series end — the reference's split-at-starts /
    drop-unterminated bookkeeping (``fast/comms.py:180-194``) as a
    segment-sum.
    """
    n = below.shape[0]
    prev = jnp.concatenate([jnp.zeros(1, bool), below[:-1]])
    starts = (below & ~prev).at[0].set(False)
    seg = jnp.cumsum(starts)                       # 0 = before first start
    nseg = n // 2 + 2                              # max possible runs + slack
    lengths = jax.ops.segment_sum(
        (below & (seg > 0)).astype(jnp.int32), seg, num_segments=nseg)
    nruns = seg[-1]
    unterminated = below[-1] & (nruns > 0)
    last_len = jnp.where(unterminated, lengths[nruns], 0)
    total = lengths.sum() - lengths[0] - last_len
    count = nruns - unterminated.astype(nruns.dtype)
    return total, count


def fade_prob(I, threshold, min_fades=30):
    """Probability of power below ``threshold``; NaN when fewer than
    ``min_fades`` fade samples exist (reference ``fast/comms.py:171-177``)."""
    below = np.asarray(I) < threshold
    nfades = int(below.sum())
    if nfades < min_fades:
        return np.nan
    return nfades / below.size


def fade_dur(I, threshold, dt=1, min_fades=30):
    """Mean duration of complete fades below ``threshold``
    (reference ``fast/comms.py:180-194``)."""
    below = jnp.asarray(np.asarray(I) < threshold)
    total, count = _fade_run_stats(below)
    total, count = int(total), int(count)
    if count < min_fades:
        return np.nan
    return total / count * dt


# ---------------------------------------------------------------------------
# analytic error rates
# ---------------------------------------------------------------------------


def Q(x):
    """Gaussian tail probability."""
    return 0.5 * erfc(x / np.sqrt(2))


def ber_ook(EbN0, samples=None):
    """OOK bit error rate, optionally MC-averaged over fading ``samples``
    (Andrews & Phillips 2005 ch. 11 eq. 58; reference ``comms.py:197-221``)."""
    snr = np.sqrt(10 ** (EbN0 / 10))
    if samples is None:
        return Q(snr)
    s = samples / samples.mean()
    return Q(s * snr).mean()


def sep_qam(M, EsN0, samples=None):
    """Square M-QAM symbol error probability (Rice)."""
    EsN0_frac = 10 ** (EsN0 / 10)
    pre = (np.sqrt(M) - 1) / np.sqrt(M)
    if samples is not None:
        s = samples / samples.mean()
        EsN0_frac = EsN0_frac * s ** 2
    q = Q(np.sqrt(3 / (M - 1) * EsN0_frac))
    sep = 4 * (pre * q - pre ** 2 * q ** 2)
    return sep if samples is None else sep.mean()


def ber_qam(M, EbN0, samples=None):
    """Square M-QAM bit error rate (Gray coding, nearest-neighbour errors)."""
    return sep_qam(M, 10 * np.log10(np.log2(M)) + EbN0, samples) / np.log2(M)


# ---------------------------------------------------------------------------
# I-Q plane PDFs, mutual information
# ---------------------------------------------------------------------------


def _toeplitz_correlate_matrix(g, npxls):
    """K with K[i, j] = g[j - i + len(g)//2]: correlate1d as a matmul."""
    c = g.shape[0] // 2
    ij = jnp.arange(npxls)
    idx = ij[None, :] - ij[:, None] + c
    valid = (idx >= 0) & (idx < g.shape[0])
    return jnp.where(valid, g[jnp.clip(idx, 0, g.shape[0] - 1)], 0.0)


def _histogram_iq(amp, pts_r, pts_i, lo_r, lo_i, dx, hi, npxls, dtype):
    """Per-symbol 2-D histograms of ``point_c * amp`` via one-hot matmuls.

    amp: (N,) |samples|. Returns (M, npxls, npxls) counts / N. Samples are
    processed in blocks under ``lax.scan``; each block contributes through a
    batched ``onehot_x^T @ onehot_y`` einsum (MXU-friendly, no scatters).
    """
    N = amp.shape[0]
    block = min(_HIST_BLOCK, N)
    nblocks = -(-N // block)
    pad = nblocks * block - N
    amp_p = jnp.concatenate([amp, jnp.zeros(pad, amp.dtype)])
    w_p = jnp.concatenate([jnp.ones(N, dtype), jnp.zeros(pad, dtype)])
    amp_b = amp_p.reshape(nblocks, block)
    w_b = w_p.reshape(nblocks, block)
    bins = jnp.arange(npxls)

    def bin_index(v, lo):
        ix = jnp.floor((v - lo) / dx)
        # np.histogram2d closes the final bin on the right
        ix = jnp.where(v == lo + hi, npxls - 1, ix)
        return ix

    def body(H, xs):
        a, w = xs
        vr = pts_r[:, None] * a[None, :]            # (M, block)
        vi = pts_i[:, None] * a[None, :]
        ixr = bin_index(vr, lo_r[:, None])
        ixi = bin_index(vi, lo_i[:, None])
        oh_r = (ixr[..., None] == bins).astype(dtype) * w[None, :, None]
        oh_i = (ixi[..., None] == bins).astype(dtype)
        H = H + jnp.einsum("mbi,mbj->mij", oh_r, oh_i)
        return H, None

    M = pts_r.shape[0]
    H0 = jnp.zeros((M, npxls, npxls), dtype)
    H, _ = jax.lax.scan(body, H0, (amp_b, w_b))
    return H / N


@functools.partial(jax.jit, static_argnames=("M", "npxls", "individual",
                                             "shot", "has_N0", "dtype"))
def _iq_pdf_kernel(amp, esn0_db, n0_in, *, M, npxls, individual, shot,
                   has_N0, dtype):
    """Received I-Q plane PDFs per M-QAM symbol under AWGN (device core)."""
    amp = amp.astype(dtype)
    pts = define_constellation(f"{M}-QAM")          # host constant
    pts_r = jnp.asarray(pts.real, dtype)
    pts_i = jnp.asarray(pts.imag, dtype)

    mean_amp = amp.mean()
    region = (1 / (np.sqrt(M) - 1) if individual else 2.0) * mean_amp
    if has_N0:
        N0 = n0_in.astype(dtype)
    else:
        Es = ((pts_r ** 2 + pts_i ** 2) * mean_amp ** 2).mean()
        N0 = Es / 10.0 ** (esn0_db.astype(dtype) / 10.0)
    if not individual:
        # enlarge the decision region when the noise cloud would spill out
        region = jnp.maximum(region,
                             2 * (mean_amp / np.sqrt(2) + 2 * jnp.sqrt(N0)))

    dx = region / npxls
    if individual:
        lo_r = -region / 2 + pts_r * mean_amp
        lo_i = -region / 2 + pts_i * mean_amp
    else:
        lo_r = jnp.broadcast_to(-region / 2, pts_r.shape)
        lo_i = lo_r

    H = _histogram_iq(amp, pts_r, pts_i, lo_r, lo_i, dx, region, npxls, dtype)

    sigma2 = jnp.maximum(N0 / (2 * dx ** 2), 1.0)   # in bin units

    if not shot:
        x_g = jnp.linspace(-npxls / 2, npxls / 2, npxls + 1).astype(dtype)
        g = jnp.exp(-x_g ** 2 / sigma2) / jnp.sqrt(np.pi * sigma2)
        K = _toeplitz_correlate_matrix(g, npxls)
        return jnp.einsum("ij,mjk,lk->mil", K, H, K)

    # shot-noise: per-bin Gaussian whose variance scales with bin radius;
    # s = 1/(sigma2 * mult) with mult = mean_amp^2/r^2 — no infinities
    grid = jnp.arange(npxls, dtype=dtype)
    xb = lo_r[:, None] + grid[None, :] * dx          # (M, npxls) left edges
    yb = lo_i[:, None] + grid[None, :] * dx
    r2 = xb[:, :, None] ** 2 + yb[:, None, :] ** 2   # (M, i, j)
    s = r2 / (sigma2 * mean_amp ** 2)
    W = H * s / np.pi

    def row(carry, xs):
        s_i, W_i, i = xs                             # (M, npxls) each
        du = (grid[None, None, :] - i) ** 2          # (1, 1, u)
        dv = (grid[None, None, :] - grid[None, :, None]) ** 2  # (1, j, v)
        Au = jnp.exp(-du * s_i[:, :, None])          # (M, j, u)
        Av = jnp.exp(-dv * s_i[:, :, None])          # (M, j, v)
        carry = carry + jnp.einsum("mj,mju,mjv->muv", W_i, Au, Av)
        return carry, None

    out0 = jnp.zeros((M, npxls, npxls), dtype)
    out, _ = jax.lax.scan(
        row, out0,
        (jnp.moveaxis(s, 1, 0), jnp.moveaxis(W, 1, 0), grid))
    return out


def _pdf_dtype(dtype):
    if dtype is not None:
        return jnp.dtype(dtype)
    # f64 histograms for exact CPU parity; never leak f64 into TPU programs
    return jnp.float64 if (jax.config.jax_enable_x64
                           and jax.default_backend() == "cpu") else jnp.float32


def convolve_awgn_qam(samples, M, npxls, EsN0, N0=None,
                      region_size="individual", shot=False, dtype=None):
    """Received I-Q plane PDFs per M-QAM symbol under AWGN.

    Bins ``constellation[c] * |samples|`` into per-symbol 2-D histograms
    (one-hot matmuls) and smooths with the AWGN Gaussian (separable Toeplitz
    matmuls) or per-bin shot-noise Gaussians. Reference behaviour:
    ``fast/comms.py:317-415``.
    """
    if region_size not in ("individual", "full"):
        raise ValueError(
            "decision_region_size must be either 'full' or 'individual'")
    amp = np.abs(np.asarray(samples))
    has_N0 = N0 is not None
    out = _iq_pdf_kernel(
        jnp.asarray(amp), jnp.asarray(float(EsN0 if EsN0 is not None else 0)),
        jnp.asarray(float(N0 if has_N0 else 0)),
        M=int(M), npxls=int(npxls), individual=region_size == "individual",
        shot=bool(shot), has_N0=has_N0, dtype=_pdf_dtype(dtype))
    return np.asarray(out)


def _masked_log2(f):
    return jnp.where(f > 0, jnp.log2(jnp.where(f > 0, f, 1.0)), 0.0)


@functools.partial(jax.jit, static_argnames=("M",))
def _gmi_reduce(fyx, *, M):
    """Sum over bit positions of the bit-wise information integrals."""
    fy = fyx.mean(0)
    lfy = _masked_log2(fy)
    B0 = jnp.asarray(_bit_membership(M), fyx.dtype)   # (m, M): bit == 0
    half = M / 2
    fyb = jnp.stack([jnp.einsum("ic,cuv->iuv", B0, fyx) / half,
                     jnp.einsum("ic,cuv->iuv", 1 - B0, fyx) / half])
    term = jnp.where(fyb > 0, fyb * (_masked_log2(fyb) - lfy), 0.0)
    return term.sum((-1, -2)).mean(0).sum()


def generalised_mutual_information_qam(samples, M, npxls, EsN0, N0=None,
                                       shot=False, dtype=None):
    """GMI for bit-wise soft-decision decoding (Alvarado et al. 2016).

    Reference behaviour: ``fast/comms.py:265-302``; the per-bit loop is a
    single einsum against the Gray-label bit-membership matrix.
    """
    amp = np.abs(np.asarray(samples))
    has_N0 = N0 is not None
    fyx = _iq_pdf_kernel(
        jnp.asarray(amp), jnp.asarray(float(EsN0 if EsN0 is not None else 0)),
        jnp.asarray(float(N0 if has_N0 else 0)),
        M=int(M), npxls=int(npxls), individual=False, shot=bool(shot),
        has_N0=has_N0, dtype=_pdf_dtype(dtype))
    return float(_gmi_reduce(fyx, M=int(M)))


@jax.jit
def _mi_reduce(fyx):
    fy = fyx.mean(0)
    term = jnp.where(fyx > 0, fyx * (_masked_log2(fyx) - _masked_log2(fy)),
                     0.0)
    return term.sum((-1, -2)).mean()


def mutual_information_qam(samples, M, npxls, EsN0, N0=None, shot=False,
                           dtype=None):
    """Symbol-wise mutual information (Alvarado et al. 2016 eq. 16;
    reference ``fast/comms.py:304-314``)."""
    amp = np.abs(np.asarray(samples))
    has_N0 = N0 is not None
    fyx = _iq_pdf_kernel(
        jnp.asarray(amp), jnp.asarray(float(EsN0 if EsN0 is not None else 0)),
        jnp.asarray(float(N0 if has_N0 else 0)),
        M=int(M), npxls=int(npxls), individual=False, shot=bool(shot),
        has_N0=has_N0, dtype=_pdf_dtype(dtype))
    return float(_mi_reduce(fyx))


# ---------------------------------------------------------------------------
# payload packing
# ---------------------------------------------------------------------------


def pack_payload(payload, bits_per_symbol):
    """Byte payload -> (symbols, pad_bits), MSB-first within each symbol."""
    bits = np.unpackbits(np.frombuffer(payload, dtype=np.uint8))
    pad = (-len(bits)) % bits_per_symbol
    if pad:
        bits = np.concatenate([bits, np.zeros(pad, np.uint8)])
    weights = 1 << np.arange(bits_per_symbol - 1, -1, -1)
    return bits.reshape(-1, bits_per_symbol) @ weights, pad


def unpack_payload(symbols, bits_per_symbol, pad_bits=0):
    """Symbol stream -> byte payload (inverse of :func:`pack_payload`)."""
    symbols = np.asarray(symbols, dtype=np.int64)
    shifts = np.arange(bits_per_symbol - 1, -1, -1)
    bits = ((symbols[:, None] >> shifts) & 1).astype(np.uint8).ravel()
    if pad_bits:
        bits = bits[:-pad_bits]
    return np.packbits(bits).tobytes()


def flip_bits(data, ber, rng=None):
    """Randomly flip bits of a payload at rate ``ber`` (testing utility)."""
    rng = np.random.default_rng() if rng is None else rng
    if isinstance(data, str):
        raw = data.encode("ascii")
    elif isinstance(data, np.ndarray):
        raw = data.tobytes()
    else:
        raise TypeError("String or numpy array as data please")
    bits = np.unpackbits(np.frombuffer(raw, dtype=np.uint8))
    bits ^= (rng.random(bits.size) < ber).astype(np.uint8)
    out = np.packbits(bits).tobytes()
    if isinstance(data, str):
        return bytes(b & 0x7F for b in out).decode("ascii")
    return np.frombuffer(out, dtype=data.dtype).reshape(data.shape)
