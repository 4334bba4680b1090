"""Fused colored-noise screen synthesis (Pallas TPU kernel).

The hot Monte Carlo op is: draw a white complex Gaussian field on the
N x N frequency grid, color it by ``sqrt(PSD) * df``, and apply the pruned
centered inverse DFT down to the pupil crop. Done with stock XLA ops this
materialises the (batch, N, N) complex noise in HBM (~4 GB per 16k-screen
chunk at 256^2) and runs the uniform->normal conversion as a separate
bandwidth-bound pass. This kernel fuses the whole pipeline per screen:

    on-chip PRNG bits -> Box-Muller normals -> color by S -> W @ X @ W^T

so the noise never leaves VMEM, and the VPU work (RNG, transcendentals)
overlaps the MXU matmuls across grid steps. W rows are zero-padded to the
128-lane tile; padded output rows/columns are zero and cropped by the
wrapper.
"""

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

logger = logging.getLogger(__name__)

_LANE = 128

# FAST_TPU_COLFAC_PROBE=noprng: occupancy-probe mode for the merged colfac
# kernel (wrong statistics — one PRNG draw reused for every column; see
# BASELINE.md roofline analysis). Resolved ONCE at import so the flag can
# never flip between traces inside one process: probe runs use a dedicated
# process, and every cached program in a production process is guaranteed
# untouched by it. Also threaded through the kernel call as a jit-static
# argument, so even an aliased cache key could not mix the two variants.
import os as _os
_PROBE_NOPRNG = _os.environ.get("FAST_TPU_COLFAC_PROBE") == "noprng"
if _PROBE_NOPRNG:
    logger.warning("FAST_TPU_COLFAC_PROBE=noprng: colfac statistics are "
                   "INVALID in this process (occupancy probe only)")

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,  # multi-pass f32 on the MXU
    # Mosaic only legalizes DEFAULT and HIGHEST dots; 'high' (bf16x3)
    # rounds up to HIGHEST inside kernels
    "high": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,  # single-pass bf16
}

_warned_high = False


def _precision(name):
    """Resolve a PRECISION config value to a Mosaic-legal dot precision.

    Warns once when 'high' (bf16x3 in the XLA paths) silently promotes to
    HIGHEST inside Pallas kernels — same config key, stricter semantics.
    """
    global _warned_high
    if name == "high" and not _warned_high:
        _warned_high = True
        logger.warning(
            "PRECISION='high' promotes to 'highest' inside Pallas kernels "
            "(Mosaic lowers only DEFAULT/HIGHEST dots); the XLA paths use "
            "bf16x3 for the same key")
    return _PRECISIONS[name]


# π/2 split into three float32 pieces (Cody–Waite): the hi/mid pieces
# have short mantissas, so q * piece is exact for |q| ≲ 2^13 and the
# reduction error is ~|q| * ulp(lo) — negligible for the O(10¹)-rad
# residual-phase screens this package detects.
_TWO_OVER_PI = np.float32(0.6366197723675814)
_PIO2_HI = np.float32(1.5703125)
_PIO2_MID = np.float32(4.837512969970703e-4)
_PIO2_LO = np.float32(7.549789948768648e-8)


def _sincos(phi):
    """``(sin(phi), cos(phi))`` with ONE shared argument reduction.

    ``jnp.sin`` and ``jnp.cos`` each run their own range reduction on
    the VPU, and the detect stage needs both for the same phase map —
    the round-5 phase-budget probe (BASELINE.md) measured the pair at
    ~39% of the record kernel's wall, the largest single phase. This
    fused evaluation reduces ``phi`` to r ∈ [-π/4, π/4] once (3-term
    Cody–Waite, accurate for |phi| ≲ 2^13 rad), evaluates the two
    minimax polynomials (cephes sinf/cosf coefficients, ~1 ulp on the
    reduced range), and swaps/negates by quadrant with integer lane
    ops (two's complement makes the mod-4 quadrant logic sign-correct).
    Accuracy vs float64 numpy: max |Δ| ≲ 1e-6 over |phi| ≤ 4096
    (tests/test_ops.py::test_fused_sincos).
    """
    q = jnp.round(phi * _TWO_OVER_PI)
    r = phi - q * _PIO2_HI
    r = r - q * _PIO2_MID
    r = r - q * _PIO2_LO
    r2 = r * r
    s = r + r * r2 * (np.float32(-1.6666654611e-1)
                      + r2 * (np.float32(8.3321608736e-3)
                              + r2 * np.float32(-1.9515295891e-4)))
    c = 1.0 + r2 * (np.float32(-0.5)
                    + r2 * (np.float32(4.166664568298827e-2)
                            + r2 * (np.float32(-1.388731625493765e-3)
                                    + r2 * np.float32(2.443315711809948e-5))))
    qi = q.astype(jnp.int32)
    swap = (qi & 1) == 1
    sin_v = jnp.where(swap, c, s)
    cos_v = jnp.where(swap, s, c)
    neg_s = (qi & 2) == 2
    neg_c = ((qi + 1) & 2) == 2
    return (jnp.where(neg_s, -sin_v, sin_v),
            jnp.where(neg_c, -cos_v, cos_v))


def _round_up(x, m):
    return -(-x // m) * m


def _auto_tile(n, cap):
    """Largest divisor of ``n`` that is <= cap (graceful tiling for any n)."""
    t = min(int(cap), int(n))
    while n % t:
        t -= 1
    return t


_MIX_CACHE = {}


def _mixing_matrix(n):
    """Fixed deterministic orthogonal mixing matrix (host float64 QR)."""
    if n not in _MIX_CACHE:
        rng = np.random.default_rng(0x5EED)
        q, r = np.linalg.qr(rng.standard_normal((n, n)))
        _MIX_CACHE[n] = (q * np.sign(np.diag(r))).astype(np.float32)
    return _MIX_CACHE[n]


def _compiler_params(N, P):
    """Raise the VMEM scope for large grids.

    Live buffers per program: ~8 f32 intermediates of N^2 (bits, uniforms,
    Box-Muller factors, colored noise) + W pair + G pair + outputs. The
    default 16 MB scope overflows at N=512.
    """
    need = (10 * N * N + 6 * P * N + 4 * P * P) * 4
    return pltpu.CompilerParams(
        vmem_limit_bytes=max(32 * 1024 * 1024, int(need * 1.5)))


def _fused_k_select(nbatch, N, P, budget=48e6):
    """Pairs per program for the fused detector kernel.

    Batching the G' dots k-fold costs ~(10 N^2 + 4 N P) live f32 per pair
    (bits/uniforms/colored noise + G'); the 48 MB budget lands on k = 8
    at 256^2 and k = 4 at 512^2 — measured optima (interleaved A/B:
    585k -> 627k r/s at 256^2 over k=4; k=16 plateaus).
    """
    return _auto_tile(nbatch, max(1, int(
        budget / ((10 * N * N + 4 * N * P) * 4))))


def _compiler_params_k(N, P, k):
    """VMEM scope for the k-pair fused detector kernel."""
    need = ((10 * N * N + 4 * N * P) * k + 2 * N * N + 4 * P * N
            + 2 * P * P) * 4
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(110 * 1024 * 1024,
                             max(32 * 1024 * 1024, int(need * 1.5))))


def _synth_kernel(seed_ref, s_ref, wr_ref, wi_ref, or_ref, oi_ref, *,
                  precision):
    b = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], b)

    shape = s_ref.shape  # (N, N)
    bits1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    bits2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # 24-bit uniforms in (0, 1): exact in float32. Mosaic lacks a
    # uint32->f32 cast, so go through int32 (values < 2^24 are safe).
    i1 = pltpu.bitcast(bits1 >> 8, jnp.int32)
    i2 = pltpu.bitcast(bits2 >> 8, jnp.int32)
    u1 = i1.astype(jnp.float32) * (2.0 ** -24) + (2.0 ** -25)
    u2 = i2.astype(jnp.float32) * (2.0 ** -24)

    # Box-Muller: radius shared, cos/sin parts are independent N(0,1)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = (2.0 * np.pi) * u2
    s = s_ref[:]
    st, ct = _sincos(theta)
    xr = r * ct * s
    xi = r * st * s

    wr = wr_ref[:]
    wi = wi_ref[:]

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)

    def dot_t(a, b):  # a @ b.T
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)

    gr = dot(wr, xr) - dot(wi, xi)
    gi = dot(wr, xi) + dot(wi, xr)
    or_ref[0] = dot_t(gr, wr) - dot_t(gi, wi)
    oi_ref[0] = dot_t(gr, wi) + dot_t(gi, wr)


@functools.partial(jax.jit, static_argnames=("nbatch", "npup", "interpret",
                                             "precision"))
def _fused_call(seed, s_scaled, wr, wi, nbatch, npup, interpret=False,
                precision="highest"):
    # Mosaic cannot legalize the 64-bit literals jax_enable_x64 introduces;
    # trace the kernel in strict 32-bit mode (all operands are f32/i32).
    with jax.enable_x64(False):
        return _fused_call_32(seed, s_scaled, wr, wi, nbatch, npup,
                              interpret, precision)


def _fused_call_32(seed, s_scaled, wr, wi, nbatch, npup, interpret,
                   precision):
    N = s_scaled.shape[-1]
    P = wr.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbatch,),
        in_specs=[
            pl.BlockSpec((N, N), lambda b, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, N), lambda b, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, N), lambda b, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, P, P), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, P), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    out_r, out_i = pl.pallas_call(
        functools.partial(_synth_kernel,
                          precision=_precision(precision)),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nbatch, P, P), jnp.float32),
            jax.ShapeDtypeStruct((nbatch, P, P), jnp.float32),
        ],
        compiler_params=_compiler_params(N, P),
        # the TPU interpreter (not plain interpret=True) supports pltpu.prng_*
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, s_scaled, wr, wi)
    # real and imaginary parts are two independent screens (doubling trick);
    # return them stacked as floats — complex arrays at program boundaries
    # are not supported by all TPU runtimes
    return jnp.concatenate(
        [out_r[:, :npup, :npup], out_i[:, :npup, :npup]], axis=0)


def _mixed_normals(i1, i2, mix_ref, dot):
    """Near-Gaussian pair from orthogonally mixed uniforms (MXU).

    Unit-variance uniforms from the 24-bit integers, mixed by a fixed
    orthogonal matrix along the lane axis: ``z = u @ M``. Second-order
    statistics are *exact* (M^T M = I up to storage rounding); per-value
    excess kurtosis is -1.2/m (m = mixing width) before the screen's own
    many-block sum. Trades the VPU transcendentals of Box-Muller for one
    MXU dot per component.
    """
    s3 = np.float32(np.sqrt(3.0))
    u1 = i1.astype(jnp.float32) * (s3 * 2.0 ** -23) - s3
    u2 = i2.astype(jnp.float32) * (s3 * 2.0 ** -23) - s3
    m = mix_ref[:]
    return dot(u1, m), dot(u2, m)


def _synth_detect_kernel(seed_ref, s_ref, wr_ref, wi_ref, pm_ref,
                         *rest, precision, subharm, mixed, k_pairs, N):
    """Synthesis + pupil-overlap detector, fully fused, ``k_pairs`` complex
    draws per program.

    Works in the *transposed* formulation: the noise ships row-stacked as
    ``X' = X^T`` blocks of (N, N) in one (k*N, N) draw, colored by the
    transposed-and-tiled ``sqrt(PSD)`` table, so the dominant DFT-side
    dots batch into single k-times-larger MXU dots
    (``G' = X' W^T``, (k*N, N) @ (N, P)). The per-pair screens come out
    transposed (``H_j = W G'_j = phi_j^T``), which the detector absorbs by
    using the transposed ``pm`` table:
    ``sum(pm^T * f(phi^T)) == sum(pm * f(phi))``.

    Each pair reduces on-chip to one complex coupling packed into lanes
    0..3 of a (1, 128) output row. With ``subharm`` a (k, 2, P, P) block
    carries the pairs' precomputed (transposed) low-order subharmonic
    phase; with ``mixed`` an (N, N) orthogonal matrix turns scaled
    uniforms into near-Gaussian noise on the MXU
    (see :func:`_mixed_normals`).
    """
    rest = list(rest)
    mix_ref = rest.pop(0) if mixed else None
    sh_ref = rest.pop(0) if subharm else None
    (out_ref,) = rest
    b = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], b)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)

    def dot_t(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)

    shape = s_ref.shape  # (k*N, N): transposed + tiled sqrt(PSD)
    bits1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    bits2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    i1 = pltpu.bitcast(bits1 >> 8, jnp.int32)
    i2 = pltpu.bitcast(bits2 >> 8, jnp.int32)
    s = s_ref[:]
    if mixed:
        z1, z2 = _mixed_normals(i1, i2, mix_ref, dot)
    else:
        u1 = i1.astype(jnp.float32) * (2.0 ** -24) + (2.0 ** -25)
        u2 = i2.astype(jnp.float32) * (2.0 ** -24)
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        theta = (2.0 * np.pi) * u2
        st, ct = _sincos(theta)
        z1 = r * ct
        z2 = r * st
    xr = z1 * s
    xi = z2 * s

    wr = wr_ref[:]
    wi = wi_ref[:]

    # one batched dot pair for all k draws: G' = X' @ W^T, (k*N, P)
    gr = dot_t(xr, wr) - dot_t(xi, wi)
    gi = dot_t(xr, wi) + dot_t(xi, wr)

    pm = pm_ref[:]  # transposed pupil*mode
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
    for j in range(k_pairs):
        grj = gr[j * N:(j + 1) * N]
        gij = gi[j * N:(j + 1) * N]
        h1 = dot(wr, grj) - dot(wi, gij)   # phi1^T
        h2 = dot(wr, gij) + dot(wi, grj)   # phi2^T
        if subharm:
            h1 = h1 + sh_ref[j, 0]
            h2 = h2 + sh_ref[j, 1]
        s1, c1 = _sincos(h1)
        s2, c2 = _sincos(h2)
        packed = (jnp.where(lane == 0, jnp.sum(pm * c1), 0.0)
                  + jnp.where(lane == 1, jnp.sum(pm * s1), 0.0)
                  + jnp.where(lane == 2, jnp.sum(pm * c2), 0.0)
                  + jnp.where(lane == 3, jnp.sum(pm * s2), 0.0))
        out_ref[j] = packed


@functools.partial(jax.jit, static_argnames=("nbatch", "interpret",
                                             "precision"))
def _fused_detect_call(seed, s_scaled_t, wr, wi, pm_t, nbatch,
                       interpret=False, precision="highest", sh=None,
                       mix=None):
    """``s_scaled_t`` is the TRANSPOSED (N, N) table; ``pm_t`` the
    transposed padded pupil*mode; ``sh`` transposed subharmonic screens."""
    with jax.enable_x64(False):
        N = s_scaled_t.shape[-1]
        P = wr.shape[0]
        k = _fused_k_select(nbatch, N, P)
        xp = np if isinstance(s_scaled_t, np.ndarray) else jnp
        s_tiled = xp.tile(s_scaled_t, (k, 1))
        in_specs = [
            pl.BlockSpec((k * N, N), lambda b, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, N), lambda b, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, N), lambda b, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, P), lambda b, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = [seed, s_tiled, wr, wi, pm_t]
        if mix is not None:
            in_specs.append(
                pl.BlockSpec((N, N), lambda b, *_: (0, 0),
                             memory_space=pltpu.VMEM))
            operands.append(mix)
        if sh is not None:
            in_specs.append(
                pl.BlockSpec((k, 2, P, P), lambda b, *_: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM))
            operands.append(sh)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nbatch // k,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((k, 1, _LANE), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM)
            ],
        )
        [out] = pl.pallas_call(
            functools.partial(_synth_detect_kernel,
                              precision=_precision(precision),
                              subharm=sh is not None,
                              mixed=mix is not None, k_pairs=k, N=N),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((nbatch, 1, _LANE), jnp.float32)],
            compiler_params=_compiler_params_k(N, P, k),
            interpret=pltpu.InterpretParams() if interpret else False,
        )(*operands)
        out = out[:, 0, :4]  # (nbatch, 4) = [c1r, c1i, c2r, c2i]
        # (2*nbatch, 2): screens from real parts first, then imag parts
        return jnp.stack(
            [jnp.concatenate([out[:, 0], out[:, 2]]),
             jnp.concatenate([out[:, 1], out[:, 3]])], axis=-1)


def pad_subharm_screens(sh_complex, npup):
    """Pack complex subharmonic screens for the fused detector kernels.

    (nbatch, npup, npup) complex -> (nbatch, 2, P, P) float32 with the
    real/imag parts in channels 0/1, zero-padded to the 128-lane tile
    (padded pixels fall where ``pm`` is zero).
    """
    P = _round_up(npup, _LANE)
    sh = jnp.stack([jnp.real(sh_complex), jnp.imag(sh_complex)],
                   axis=1).astype(jnp.float32)
    return jnp.pad(sh, ((0, 0), (0, 0), (0, P - npup), (0, P - npup)))


def fused_synthesis_detect(seed, sqrt_powerspec, df, nbatch, W, pupil_mode,
                           interpret=False, precision="highest",
                           subharm_screens=None, noise="gauss"):
    """Monte Carlo couplings straight from the PRNG, one fused kernel.

    Returns (2*nbatch, 2) float32: the unnormalised complex coupling
    ``sum(pm * exp(i*phi))`` per screen as (real, imag). Multiply by
    ``dx^2 / norm`` downstream. ``subharm_screens`` (from
    :func:`pad_subharm_screens`, (nbatch, 2, P, P)) adds per-screen
    low-order subharmonic phase before the on-chip detector.

    All table arguments may be host numpy (embedded as constants) or
    traced arrays (e.g. per-configuration tables inside ``shard_map``).
    ``noise='mixed'`` replaces Box-Muller with orthogonally mixed
    uniforms on the MXU (see :func:`_mixed_normals`).
    """
    npup, N = W.shape
    P = _round_up(npup, _LANE)
    if isinstance(W, np.ndarray):
        # host tables split/pad in numpy: a complex jnp.asarray would be a
        # device transfer, which the axon TPU runtime cannot do (complex
        # arrays cannot cross program boundaries); inside jit the numpy
        # floats embed as constants
        wr = np.pad(np.real(W).astype(np.float32), ((0, P - npup), (0, 0)))
        wi = np.pad(np.imag(W).astype(np.float32), ((0, P - npup), (0, 0)))
    else:  # traced (e.g. per-configuration tables inside shard_map)
        W = jnp.asarray(W)
        wr = jnp.pad(jnp.real(W).astype(jnp.float32),
                     ((0, P - npup), (0, 0)))
        wi = jnp.pad(jnp.imag(W).astype(jnp.float32),
                     ((0, P - npup), (0, 0)))
    # transposed tables for the k-pair batched kernel (see
    # _synth_detect_kernel): pm^T, sqrt(PSD)^T, subharm screens^T
    xp = np if isinstance(pupil_mode, np.ndarray) else jnp
    pm_t = xp.pad(xp.asarray(pupil_mode, xp.float32).T,
                  ((0, P - npup), (0, P - npup)))
    xp = np if isinstance(sqrt_powerspec, np.ndarray) else jnp
    s_scaled_t = (xp.asarray(sqrt_powerspec, xp.float32).T
                  * xp.float32(df))
    sh = subharm_screens
    if sh is not None:
        sh = jnp.swapaxes(jnp.asarray(sh), -1, -2)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    mix = _mixing_matrix(N) if noise == "mixed" else None
    return _fused_detect_call(seed, s_scaled_t, wr, wi, pm_t, int(nbatch),
                              interpret=interpret, precision=precision,
                              sh=sh, mix=mix)


def fused_synthesis(seed, sqrt_powerspec, df, nbatch, W, interpret=False,
                    precision="highest"):
    """Pupil-cropped phase screens, fully fused on-chip.

    Distribution-equivalent to ``double_screens(synthesize_screens_pruned
    (...))``; the noise stream comes from the TPU hardware PRNG seeded by
    ``(seed, program_id)`` instead of the JAX key, so values differ from
    the stock path but the statistics are identical (verified by
    covariance tests).

    Args:
        seed: int32 scalar (derive from a JAX key for determinism).
        sqrt_powerspec: (N, N) float32 ``sqrt(PSD)``.
        df: frequency-bin spacing.
        nbatch: number of complex draws (yields ``2 * nbatch`` screens).
        W: (Npup, N) complex64 pruned inverse-DFT matrix.
        interpret: run in the Pallas interpreter (CPU testing).

    Returns:
        (2 * nbatch, Npup, Npup) float32 phase screens.
    """
    npup, N = W.shape
    P = _round_up(npup, _LANE)
    wr = np.zeros((P, N), np.float32)
    wi = np.zeros((P, N), np.float32)
    wr[:npup] = np.real(W)
    wi[:npup] = np.imag(W)
    s_scaled = (np.asarray(sqrt_powerspec, np.float32) * np.float32(df))
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    return _fused_call(seed, jnp.asarray(s_scaled), jnp.asarray(wr),
                       jnp.asarray(wi), int(nbatch), int(npup),
                       interpret=interpret, precision=precision)


def _colfac_detect_kernel(seed_ref, lr_ref, li_ref, wr_ref, wi_ref, pm_ref,
                          mix_ref, sh_ref, out_ref, accr_ref, acci_ref,
                          gr_ref, gi_ref, *, m_tile, n_mb, precision,
                          premixed=False):
    """Colfac-basis synthesis + detector, fused with a VMEM accumulator.

    Grid (batch_block, col_block); col_block is the inner (sequential)
    dimension. Per program: draw (b_tile, P) complex normals per column in
    the tile, apply that column's Cholesky factor ``G_m = z_m @ L_m^T``
    (MXU), and accumulate the screens ``acc += G_tile @ W_tile^T``. At the
    last column block the accumulated (b_tile, P, P) screens reduce
    on-chip to the pupil-overlap couplings. Normals per screen: P*N
    instead of the full-grid kernel's N^2 — the colfac saving
    (column_factors docstring) without ever materialising G in HBM.
    """
    bb = pl.program_id(0)
    mb = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0], bb * n_mb + mb)

    b_tile = accr_ref.shape[0]
    P = accr_ref.shape[1]

    @pl.when(mb == 0)
    def _init():
        accr_ref[...] = jnp.zeros_like(accr_ref)
        acci_ref[...] = jnp.zeros_like(acci_ref)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    def draw(shape):
        bits1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        bits2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        i1 = pltpu.bitcast(bits1 >> 8, jnp.int32)
        i2 = pltpu.bitcast(bits2 >> 8, jnp.int32)
        if premixed:
            # unit-variance uniforms; the orthogonal mix is folded into
            # the factor tables (colfac_pack_tables(noise='mixed')), so
            # no mixing dot is spent here — same random variables
            s3 = np.float32(np.sqrt(3.0))
            return (i1.astype(jnp.float32) * (s3 * 2.0 ** -23) - s3,
                    i2.astype(jnp.float32) * (s3 * 2.0 ** -23) - s3)
        if mix_ref is not None:
            return _mixed_normals(i1, i2, mix_ref, dot)
        u1 = i1.astype(jnp.float32) * (2.0 ** -24) + (2.0 ** -25)
        u2 = i2.astype(jnp.float32) * (2.0 ** -24)
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        theta = (2.0 * np.pi) * u2
        st, ct = _sincos(theta)
        return r * ct, r * st

    def dot_t(a, b):  # a @ b.T
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    ldt = lr_ref.dtype  # bf16 tables at PRECISION='default' (the MXU
    gdt = gr_ref.dtype  # rounds inputs to bf16 there anyway); f32 else

    def col(m, _):
        # G_m = z_m @ L_m^T, stored at row m of the (m_tile, b_tile, P)
        # scratch — leading-dim dynamic stores are cheap on TPU
        lr = lr_ref[m]
        li = li_ref[m]
        zr, zi = draw((b_tile, P))
        zr = zr.astype(ldt)
        zi = zi.astype(ldt)
        gr_ref[m] = (dot_t(zr, lr) - dot_t(zi, li)).astype(gdt)
        gi_ref[m] = (dot_t(zr, li) + dot_t(zi, lr)).astype(gdt)
        return 0

    jax.lax.fori_loop(0, m_tile, col, 0)

    def dot_m(g, w):  # contract the leading m axis: (m, bP) x (m, P) -> (bP, P)
        return jax.lax.dot_general(
            g, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    wr = wr_ref[:]  # (m_tile, P) — W columns of this tile, transposed
    wi = wi_ref[:]
    gr2 = gr_ref[...].reshape(m_tile, b_tile * P)
    gi2 = gi_ref[...].reshape(m_tile, b_tile * P)
    pr = dot_m(gr2, wr) - dot_m(gi2, wi)   # (b_tile*P, P)
    pi = dot_m(gr2, wi) + dot_m(gi2, wr)
    accr_ref[...] += pr.reshape(b_tile, P, P)
    acci_ref[...] += pi.reshape(b_tile, P, P)

    @pl.when(mb == n_mb - 1)
    def _detect():
        pm = pm_ref[:]
        phi1 = accr_ref[...]
        phi2 = acci_ref[...]
        if sh_ref is not None:
            phi1 = phi1 + sh_ref[:, 0]
            phi2 = phi2 + sh_ref[:, 1]

        def reduce2(x):  # (b_tile, P, P) -> (b_tile, 1), all ops >= 2-D
            return jnp.sum(jnp.sum(x, axis=2), axis=1, keepdims=True)

        s1, co1 = _sincos(phi1)
        s2, co2 = _sincos(phi2)
        c1r = reduce2(pm[None] * co1)
        c1i = reduce2(pm[None] * s1)
        c2r = reduce2(pm[None] * co2)
        c2i = reduce2(pm[None] * s2)
        lane = jax.lax.broadcasted_iota(jnp.int32, (b_tile, _LANE), 1)
        packed = (jnp.where(lane == 0, c1r, 0.0)
                  + jnp.where(lane == 1, c1i, 0.0)
                  + jnp.where(lane == 2, c2r, 0.0)
                  + jnp.where(lane == 3, c2i, 0.0))
        out_ref[...] = packed


@functools.partial(jax.jit, static_argnames=("nbatch", "b_tile", "m_tile",
                                             "interpret", "precision",
                                             "premixed"))
def _colfac_detect_call(seed, l2, w2, pm, nbatch, b_tile, m_tile,
                        interpret=False, precision="default", sh=None,
                        mix=None, premixed=False):
    with jax.enable_x64(False):
        N = l2.shape[1]
        P = l2.shape[2]
        n_bb = nbatch // b_tile
        n_mb = N // m_tile
        in_specs = [
            pl.BlockSpec((2, m_tile, P, P),
                         lambda bb, mb, *_: (0, mb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, m_tile, P), lambda bb, mb, *_: (0, mb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, P), lambda bb, mb, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = [seed, l2, w2, pm]
        if mix is not None:
            in_specs.append(
                pl.BlockSpec((P, P), lambda bb, mb, *_: (0, 0),
                             memory_space=pltpu.VMEM))
            operands.append(mix)
        if sh is not None:
            # same block across all column steps (fetched once per bb)
            in_specs.append(
                pl.BlockSpec((b_tile, 2, P, P),
                             lambda bb, mb, *_: (bb, 0, 0, 0),
                             memory_space=pltpu.VMEM))
            operands.append(sh)
        gdt = l2.dtype  # G scratch matches the table dtype
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_bb, n_mb),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, b_tile, _LANE), lambda bb, mb, *_: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((b_tile, P, P), jnp.float32),
                pltpu.VMEM((b_tile, P, P), jnp.float32),
                pltpu.VMEM((m_tile, b_tile, P), gdt),
                pltpu.VMEM((m_tile, b_tile, P), gdt),
            ],
        )
        kern = functools.partial(
            _colfac_detect_kernel, m_tile=m_tile, n_mb=n_mb,
            precision=_precision(precision), premixed=premixed)

        def _squeeze(seed_ref, l_ref, w_ref, pm_ref, *rest):
            rest = list(rest)
            mix_ref = rest.pop(0) if mix is not None else None
            sh_ref = rest.pop(0) if sh is not None else None
            out_ref, a, b, g1, g2 = rest
            kern(seed_ref, l_ref.at[0], l_ref.at[1], w_ref.at[0],
                 w_ref.at[1], pm_ref, mix_ref, sh_ref, out_ref.at[0], a, b,
                 g1, g2)

        [out] = pl.pallas_call(
            _squeeze,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_bb, b_tile, _LANE), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
                dimension_semantics=("parallel", "arbitrary")),
            interpret=pltpu.InterpretParams() if interpret else False,
        )(*operands)
        out = out.reshape(nbatch, _LANE)[:, :4]
        return jnp.stack(
            [jnp.concatenate([out[:, 0], out[:, 2]]),
             jnp.concatenate([out[:, 1], out[:, 3]])], axis=-1)


def _colfac_detect_kernel_merged(seed_ref, s_ref, w3_ref, pm_ref, sh_ref,
                                 out_ref, accr_ref, acci_ref, g_ref, *,
                                 m_tile, n_mb, precision, premixed=False,
                                 probe_noprng=False, pipeline=False,
                                 probe=None, fast_sincos=True):
    """Merged-dot variant of :func:`_colfac_detect_kernel`.

    Identical algorithm and *identical random variables* (same PRNG seed
    schedule, same draw shapes in the same order), restructured for MXU
    issue efficiency: the four per-column (b,P)x(P,P) complex-part dots
    merge into ONE (b,2P)x(2P,2P) dot against the real-block matrix
    ``S_m = [[L_r^T, L_i^T], [-L_i^T, L_r^T]]`` (mixing premultiplied into
    each block for 'mixed' noise), and the four K=m column-contraction
    dots merge into ONE K=2m dot against the stacked W table. Per program:
    ``m_tile + 1`` MXU issues instead of ``4*m_tile + 4``, each with 2x
    the contraction depth — same FLOPs, a quarter of the dot-issue
    latency the roofline analysis identified as the record path's bound
    (BASELINE.md round 3).
    """
    bb = pl.program_id(0)
    mb = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0], bb * n_mb + mb)

    b_tile = accr_ref.shape[0]
    P = accr_ref.shape[1]

    @pl.when(mb == 0)
    def _init():
        accr_ref[...] = jnp.zeros_like(accr_ref)
        acci_ref[...] = jnp.zeros_like(acci_ref)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    def draw():
        # same two (b, P) bit draws per column as the split kernel ->
        # identical random variables
        bits1 = pltpu.bitcast(pltpu.prng_random_bits((b_tile, P)),
                              jnp.uint32)
        bits2 = pltpu.bitcast(pltpu.prng_random_bits((b_tile, P)),
                              jnp.uint32)
        i1 = pltpu.bitcast(bits1 >> 8, jnp.int32)
        i2 = pltpu.bitcast(bits2 >> 8, jnp.int32)
        if premixed:
            s3 = np.float32(np.sqrt(3.0))
            z1 = i1.astype(jnp.float32) * (s3 * 2.0 ** -23) - s3
            z2 = i2.astype(jnp.float32) * (s3 * 2.0 ** -23) - s3
        else:
            u1 = i1.astype(jnp.float32) * (2.0 ** -24) + (2.0 ** -25)
            u2 = i2.astype(jnp.float32) * (2.0 ** -24)
            r = jnp.sqrt(-2.0 * jnp.log(u1))
            theta = (2.0 * np.pi) * u2
            st, ct = _sincos(theta)
            z1 = r * ct
            z2 = r * st
        return jnp.concatenate([z1, z2], axis=1)  # (b, 2P) = [z_r | z_i]

    sdt = s_ref.dtype
    gdt = g_ref.dtype

    # probe_noprng: occupancy probe ONLY (wrong statistics — one draw
    # reused for every column). Isolates the per-column VPU PRNG+convert
    # cost from the MXU dots for the roofline analysis in BASELINE.md.
    # Threaded through as a jit-static argument (NOT read from the
    # environment here) so the probe and production variants can never
    # alias in the trace cache.
    z_fixed = draw().astype(sdt) if probe_noprng else None

    if pipeline and not probe_noprng:
        # software-pipelined variant (round-5 probe, VERDICT r4 #8):
        # column m+1's PRNG draw (VPU) issues before column m's factor
        # dot (MXU), giving the scheduler independent VPU/MXU work to
        # overlap. Random variables are IDENTICAL per column (the stream
        # order is unchanged: draw k still colors column k); the cost is
        # one discarded tail draw per program (+1/m_tile PRNG work).
        def col(m, z):
            z_next = draw().astype(sdt)
            g = dot(z, s_ref[m])  # (b, 2P) = [G_r | G_i] for column m
            g_ref[0, m] = g[:, :P].astype(gdt)
            g_ref[1, m] = g[:, P:].astype(gdt)
            return z_next

        jax.lax.fori_loop(0, m_tile, col, draw().astype(sdt))
    else:
        def col(m, _):
            z = z_fixed if probe_noprng else draw().astype(sdt)
            if probe == "nodots":
                # phase-budget probe: skip the factor dot (WRONG stats)
                g_ref[0, m] = z[:, :P].astype(gdt)
                g_ref[1, m] = z[:, P:].astype(gdt)
                return 0
            g = dot(z, s_ref[m])  # (b, 2P) = [G_r | G_i] for column m
            g_ref[0, m] = g[:, :P].astype(gdt)
            g_ref[1, m] = g[:, P:].astype(gdt)
            return 0

        jax.lax.fori_loop(0, m_tile, col, 0)

    def dot_m(g, w):  # contract the leading (2m) axis
        return jax.lax.dot_general(
            g, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    if probe == "nocontract":
        # phase-budget probe: skip the K=2m contraction dot AND the
        # accumulator update entirely (WRONG stats — detect sees zeros).
        # Bounds contraction dot + full acc RMW together; pair with
        # 'noacc' to split the two.
        pass
    else:
        g2 = g_ref[...].reshape(2 * m_tile, b_tile * P)
        w = w3_ref[...].reshape(2 * m_tile, 2 * P)  # rows: [wr|wi], [-wi|wr]
        pp = dot_m(g2, w)  # (b*P, 2P) = [screens_r | screens_i]
        if probe == "noacc":
            # phase-budget probe: overwrite instead of accumulate (WRONG
            # stats — only the last column block survives). Isolates the
            # accumulator *read* traffic of the read-modify-write.
            accr_ref[...] = pp[:, :P].reshape(b_tile, P, P)
            acci_ref[...] = pp[:, P:].reshape(b_tile, P, P)
        else:
            accr_ref[...] += pp[:, :P].reshape(b_tile, P, P)
            acci_ref[...] += pp[:, P:].reshape(b_tile, P, P)

    @pl.when(mb == n_mb - 1)
    def _detect():
        pm = pm_ref[:]
        phi1 = accr_ref[...]
        phi2 = acci_ref[...]
        if sh_ref is not None:
            phi1 = phi1 + sh_ref[:, 0]
            phi2 = phi2 + sh_ref[:, 1]

        def reduce2(x):  # (b_tile, P, P) -> (b_tile, 1), all ops >= 2-D
            return jnp.sum(jnp.sum(x, axis=2), axis=1, keepdims=True)

        if probe == "nodetect":
            # phase-budget probe: linear reduction, no cos/sin (WRONG
            # stats — isolates the transcendental detect cost)
            c1r = reduce2(pm[None] * phi1)
            c1i = reduce2(pm[None] * phi2)
            c2r, c2i = c1r, c1i
        elif fast_sincos:
            s1, co1 = _sincos(phi1)
            s2, co2 = _sincos(phi2)
            c1r = reduce2(pm[None] * co1)
            c1i = reduce2(pm[None] * s1)
            c2r = reduce2(pm[None] * co2)
            c2i = reduce2(pm[None] * s2)
        else:
            # legacy jnp detect, kept for A/B probing only: measured
            # 1.34x slower than the fused _sincos at the record tile
            # (scripts/probe_colfac_pipeline.py, BASELINE.md round 5)
            c1r = reduce2(pm[None] * jnp.cos(phi1))
            c1i = reduce2(pm[None] * jnp.sin(phi1))
            c2r = reduce2(pm[None] * jnp.cos(phi2))
            c2i = reduce2(pm[None] * jnp.sin(phi2))
        lane = jax.lax.broadcasted_iota(jnp.int32, (b_tile, _LANE), 1)
        packed = (jnp.where(lane == 0, c1r, 0.0)
                  + jnp.where(lane == 1, c1i, 0.0)
                  + jnp.where(lane == 2, c2r, 0.0)
                  + jnp.where(lane == 3, c2i, 0.0))
        out_ref[...] = packed


@functools.partial(jax.jit, static_argnames=("nbatch", "b_tile", "m_tile",
                                             "interpret", "precision",
                                             "premixed", "probe_noprng",
                                             "pipeline", "probe",
                                             "fast_sincos"))
def _colfac_detect_call_merged(seed, s, w3, pm, nbatch, b_tile, m_tile,
                               interpret=False, precision="default",
                               sh=None, premixed=False, probe_noprng=False,
                               pipeline=False, probe=None,
                               fast_sincos=True):
    with jax.enable_x64(False):
        ncols = s.shape[0]
        P = s.shape[1] // 2
        n_bb = nbatch // b_tile
        n_mb = ncols // m_tile
        in_specs = [
            pl.BlockSpec((m_tile, 2 * P, 2 * P),
                         lambda bb, mb, *_: (mb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, m_tile, 2 * P), lambda bb, mb, *_: (0, mb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, P), lambda bb, mb, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = [seed, s, w3, pm]
        if sh is not None:
            in_specs.append(
                pl.BlockSpec((b_tile, 2, P, P),
                             lambda bb, mb, *_: (bb, 0, 0, 0),
                             memory_space=pltpu.VMEM))
            operands.append(sh)
        gdt = s.dtype  # G scratch matches the table dtype
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_bb, n_mb),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, b_tile, _LANE), lambda bb, mb, *_: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((b_tile, P, P), jnp.float32),
                pltpu.VMEM((b_tile, P, P), jnp.float32),
                pltpu.VMEM((2, m_tile, b_tile, P), gdt),
            ],
        )
        kern = functools.partial(
            _colfac_detect_kernel_merged, m_tile=m_tile, n_mb=n_mb,
            precision=_precision(precision), premixed=premixed,
            probe_noprng=probe_noprng, pipeline=pipeline, probe=probe,
            fast_sincos=fast_sincos)

        def _shim(seed_ref, s_ref, w3_ref, pm_ref, *rest):
            rest = list(rest)
            sh_ref = rest.pop(0) if sh is not None else None
            out_ref, a, b, g = rest
            kern(seed_ref, s_ref, w3_ref, pm_ref, sh_ref, out_ref.at[0],
                 a, b, g)

        [out] = pl.pallas_call(
            _shim,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_bb, b_tile, _LANE), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
                dimension_semantics=("parallel", "arbitrary")),
            interpret=pltpu.InterpretParams() if interpret else False,
        )(*operands)
        out = out.reshape(nbatch, _LANE)[:, :4]
        return jnp.stack(
            [jnp.concatenate([out[:, 0], out[:, 2]]),
             jnp.concatenate([out[:, 1], out[:, 3]])], axis=-1)


_AR_K_CAP = 16  # step-unroll cap for the fused AR kernel (N <= 256)


def ar_k_cap(N):
    """Worst-case step unroll the fused AR kernel may pick at grid N.

    The actual unroll divides ``nsteps`` and is <= this cap; callers
    sizing VMEM ahead of time (engine stream-selection) must assume the
    cap. Single source of truth for `_ar_flow_call`'s unroll rule.
    """
    return _AR_K_CAP if N <= 256 else 4


def ar_vmem_need(nlayers, N, P, boiling, k_steps=None):
    """VMEM bytes the fused single-series AR kernel keeps live.

    Four (2, L*N, N) f32 tensors (a0/ph in, final-state out, state
    scratch) + the boiling noise table + W tables + pupil, plus the
    k-step unroll live values (Ar/Ai concats ~ 2*k*N^2 and GR/GI
    ~ 2*P*k*N) the batched DFT materialises in the kernel body. Shared
    by `_ar_flow_call`'s compiler budget and the engine's
    stream-vs-resident selection so the two can never diverge.
    """
    if k_steps is None:
        k_steps = ar_k_cap(N)
    LN = nlayers * N
    return (4 * 2 * LN * N + (LN * N if boiling else 0)
            + 3 * P * N + 2 * P * P
            + 2 * k_steps * N * N + 2 * P * k_steps * N) * 4


def _ar_flow_kernel(seed_ref, a0_ref, ph_ref, ns_ref, wr_ref, wi_ref,
                    pm_ref, out_ref, afin_ref, st_ref, *, nlayers, N,
                    ngrid, k_steps, boiling, noise, precision):
    """AR(1)-in-Fourier frozen flow, fully fused: ``k_steps`` time steps
    per grid step, the (nlayers*N, N) complex state resident in VMEM
    scratch for the whole series.

    Per time step: state *= (alpha * e^{i kappa.v dt}) [folded into
    ``ph``], optionally += on-chip-PRNG noise *
    sqrt(1-alpha^2)*sqrt(PSD)*df [folded into ``ns``], layer-sum, pruned
    inverse DFT to the pupil crop (MXU dots), pupil-overlap detector —
    the screen never exists outside VMEM and HBM traffic per step is two
    floats out. Unrolling ``k_steps`` steps per program amortises the
    per-grid-step overhead.
    """
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        st_ref[...] = a0_ref[...]

    pr = ph_ref[0]
    pi = ph_ref[1]
    wr = wr_ref[:]
    wi = wi_ref[:]
    pm = pm_ref[:]
    if boiling:
        ns = ns_ref[:]
        pltpu.prng_seed(seed_ref[0], t)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    def dot_t(a, b):  # a @ b.T
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    nr = st_ref[0]
    ni = st_ref[1]
    A_rs, A_is = [], []
    for k in range(k_steps):
        ar, ai = nr, ni
        nr = ar * pr - ai * pi
        ni = ar * pi + ai * pr
        if boiling:
            shape = nr.shape  # (nlayers*N, N)
            bits1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            bits2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            i1 = pltpu.bitcast(bits1 >> 8, jnp.int32)
            i2 = pltpu.bitcast(bits2 >> 8, jnp.int32)
            if noise == "uniform":
                # unit-variance uniforms: exact second-order statistics;
                # the per-mode AR sum and the 262k-mode screen sum make
                # higher moments Gaussian by CLT (TEMPORAL_NOISE, conf.py)
                s3 = np.float32(np.sqrt(3.0))
                z1 = i1.astype(jnp.float32) * (s3 * 2.0 ** -23) - s3
                z2 = i2.astype(jnp.float32) * (s3 * 2.0 ** -23) - s3
            else:
                u1 = i1.astype(jnp.float32) * (2.0 ** -24) + (2.0 ** -25)
                u2 = i2.astype(jnp.float32) * (2.0 ** -24)
                r = jnp.sqrt(-2.0 * jnp.log(u1))
                theta = (2.0 * np.pi) * u2
                st, ct = _sincos(theta)
                z1 = r * ct
                z2 = r * st
            nr = nr + z1 * ns
            ni = ni + z2 * ns

        # layer sum via static row slices
        A_r = nr[0:N]
        A_i = ni[0:N]
        for l in range(1, nlayers):
            A_r = A_r + nr[l * N:(l + 1) * N]
            A_i = A_i + ni[l * N:(l + 1) * N]
        A_rs.append(A_r)
        A_is.append(A_i)
    st_ref[0] = nr
    st_ref[1] = ni

    # batch the unrolled steps' DFT-side dots into single k-wide MXU dots
    Ar_cat = A_rs[0] if k_steps == 1 else jnp.concatenate(A_rs, axis=1)
    Ai_cat = A_is[0] if k_steps == 1 else jnp.concatenate(A_is, axis=1)
    GR = dot(wr, Ar_cat) - dot(wi, Ai_cat)   # (P, k*N)
    GI = dot(wr, Ai_cat) + dot(wi, Ar_cat)
    for k in range(k_steps):
        grk = GR[:, k * N:(k + 1) * N]
        gik = GI[:, k * N:(k + 1) * N]
        # the series is the *real* part of the complex screen
        phi = dot_t(grk, wr) - dot_t(gik, wi)
        sp, cp = _sincos(phi)
        packed = (jnp.where(lane == 0, jnp.sum(pm * cp), 0.0)
                  + jnp.where(lane == 1, jnp.sum(pm * sp), 0.0))
        out_ref[k] = packed

    @pl.when(t == ngrid - 1)
    def _final():
        afin_ref[...] = st_ref[...]


@functools.partial(jax.jit, static_argnames=("nsteps", "nlayers",
                                             "interpret", "precision",
                                             "noise"))
def _ar_flow_call(seed, a0, ph, ns, wr, wi, pm, nsteps, nlayers,
                  interpret=False, precision="default", noise="uniform"):
    with jax.enable_x64(False):
        LN, N = a0.shape[1:]
        P = wr.shape[0]
        boiling = ns is not None
        # unroll time steps per grid step to amortise per-program overhead
        # (measured: 16 > 4 by ~5% at 256^2); larger grids keep the
        # unroll short — the concatenated DFT operands grow as k*N^2.
        # K divides nsteps, so any series length still runs
        k_steps = _auto_tile(nsteps, ar_k_cap(N))
        ngrid = nsteps // k_steps
        in_specs = [
            pl.BlockSpec((2, LN, N), lambda t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, LN, N), lambda t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = [seed, a0, ph]
        if boiling:
            in_specs.append(pl.BlockSpec((LN, N), lambda t, *_: (0, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(ns)
        in_specs += [
            pl.BlockSpec((P, N), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, N), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, P), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [wr, wi, pm]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ngrid,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((k_steps, 1, _LANE), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, LN, N), lambda t, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((2, LN, N), jnp.float32)],
        )
        kern = functools.partial(
            _ar_flow_kernel, nlayers=nlayers, N=N, ngrid=ngrid,
            k_steps=k_steps, boiling=boiling, noise=noise,
            precision=_precision(precision))

        if boiling:
            def _shim(seed_ref, a0_ref, ph_ref, ns_ref, wr_ref, wi_ref,
                      pm_ref, out_ref, afin_ref, st_ref):
                kern(seed_ref, a0_ref, ph_ref, ns_ref, wr_ref, wi_ref,
                     pm_ref, out_ref, afin_ref, st_ref)
        else:
            def _shim(seed_ref, a0_ref, ph_ref, wr_ref, wi_ref, pm_ref,
                      out_ref, afin_ref, st_ref):
                kern(seed_ref, a0_ref, ph_ref, None, wr_ref, wi_ref,
                     pm_ref, out_ref, afin_ref, st_ref)

        # VMEM budget: four (2, LN, N) tensors (a0/ph blocks, afin out, st
        # scratch) + ns block + W tables + pupil, PLUS the k-step unroll
        # live values (Ar/Ai concats ~ 2*k*N^2 and GR/GI ~ 2*P*k*N) that
        # the batched DFT materialises inside the kernel body.
        need = ar_vmem_need(LN // N, N, P, boiling, k_steps)
        out, afin = pl.pallas_call(
            _shim,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((nsteps, 1, _LANE), jnp.float32),
                jax.ShapeDtypeStruct((2, LN, N), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=max(64 * 1024 * 1024, int(need * 1.4)),
                dimension_semantics=("arbitrary",)),
            interpret=pltpu.InterpretParams() if interpret else False,
        )(*operands)
        return out[:, 0, :2], afin


def ar_flow_fused(seed, a0, step_phasor_scaled, noise_scale, W, pupil_mode,
                  nsteps, interpret=False, precision="default",
                  noise="uniform"):
    """Whole AR(1) frozen-flow coupling series from one fused kernel.

    Args:
        seed: int32 scalar (derive from a JAX key).
        a0: (nlayers, N, N) complex initial Fourier state.
        step_phasor_scaled: (nlayers, N, N) complex
            ``alpha * e^{i kappa . v dt}`` (AR decay folded in).
        noise_scale: (nlayers, N, N) real
            ``sqrt(1 - alpha^2) * sqrt(PSD) * df``, or None for pure
            frozen flow (no per-step noise).
        W: (Npup, N) complex pruned inverse-DFT matrix.
        pupil_mode: (Npup, Npup) pupil*mode weights.
        nsteps: series length.

    Returns:
        (couplings, a_final): (nsteps, 2) float32 unnormalised couplings
        (multiply by ``dx^2/norm`` downstream) and the (nlayers, N, N)
        complex state after the last step.
    """
    L, N, _ = a0.shape
    npup = W.shape[0]
    P = _round_up(npup, _LANE)
    a02 = jnp.stack([jnp.real(a0), jnp.imag(a0)]).reshape(2, L * N, N) \
        .astype(jnp.float32)
    ph2 = jnp.stack([jnp.real(step_phasor_scaled),
                     jnp.imag(step_phasor_scaled)]) \
        .reshape(2, L * N, N).astype(jnp.float32)
    ns = None
    if noise_scale is not None:
        ns = jnp.asarray(noise_scale, jnp.float32).reshape(L * N, N)
    W = jnp.asarray(W)
    wr = jnp.pad(jnp.real(W).astype(jnp.float32), ((0, P - npup), (0, 0)))
    wi = jnp.pad(jnp.imag(W).astype(jnp.float32), ((0, P - npup), (0, 0)))
    pm = jnp.pad(jnp.asarray(pupil_mode, jnp.float32),
                 ((0, P - npup), (0, P - npup)))
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    out, afin = _ar_flow_call(seed, a02, ph2, ns, wr, wi, pm, int(nsteps),
                              int(L), interpret=interpret,
                              precision=precision, noise=noise)
    a_final = jax.lax.complex(afin[0], afin[1]).reshape(L, N, N)
    return out, a_final


def _ar_flow_kernel_batch(seed_ref, a0_ref, ph_ref, ns_ref, wr_ref, wi_ref,
                          pm_ref, out_ref, afin_ref, st_ref, *, nseries,
                          nlayers, N, ngrid, k_steps, boiling, noise,
                          precision):
    """Series-batched AR(1) frozen flow: ``nseries`` independent
    trajectories evolve together per time step.

    State is (2, B*L*N, N) in VMEM scratch (series-major rows); the
    phasor/noise tables are per-series (different configurations — orbit
    samples — may batch together). Per step the B per-series layer sums
    concatenate into single (P, N) x (N, k*B*N) DFT-side dots — B times
    the per-step MXU work of the single-series kernel, which is
    issue-latency-bound at one series (BASELINE.md round 3 roofline).
    """
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        st_ref[...] = a0_ref[...]

    pr = ph_ref[0]
    pi = ph_ref[1]
    wr = wr_ref[:]
    wi = wi_ref[:]
    if boiling:
        ns = ns_ref[:]
        pltpu.prng_seed(seed_ref[0], t)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    def dot_t(a, b):  # a @ b.T
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    nr = st_ref[0]
    ni = st_ref[1]
    A_rs, A_is = [], []  # flat over (k, series)
    for k in range(k_steps):
        ar, ai = nr, ni
        nr = ar * pr - ai * pi
        ni = ar * pi + ai * pr
        if boiling:
            shape = nr.shape  # (B*L*N, N)
            bits1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            bits2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            i1 = pltpu.bitcast(bits1 >> 8, jnp.int32)
            i2 = pltpu.bitcast(bits2 >> 8, jnp.int32)
            if noise == "uniform":
                s3 = np.float32(np.sqrt(3.0))
                z1 = i1.astype(jnp.float32) * (s3 * 2.0 ** -23) - s3
                z2 = i2.astype(jnp.float32) * (s3 * 2.0 ** -23) - s3
            else:
                u1 = i1.astype(jnp.float32) * (2.0 ** -24) + (2.0 ** -25)
                u2 = i2.astype(jnp.float32) * (2.0 ** -24)
                r = jnp.sqrt(-2.0 * jnp.log(u1))
                theta = (2.0 * np.pi) * u2
                st, ct = _sincos(theta)
                z1 = r * ct
                z2 = r * st
            nr = nr + z1 * ns
            ni = ni + z2 * ns
        # per-series layer sums via static row slices
        for s in range(nseries):
            base = s * nlayers * N
            A_r = nr[base:base + N]
            A_i = ni[base:base + N]
            for l in range(1, nlayers):
                A_r = A_r + nr[base + l * N:base + (l + 1) * N]
                A_i = A_i + ni[base + l * N:base + (l + 1) * N]
            A_rs.append(A_r)
            A_is.append(A_i)
    st_ref[0] = nr
    st_ref[1] = ni

    # batch all (k, series) DFT-side dots into single wide MXU dots
    Ar_cat = A_rs[0] if len(A_rs) == 1 else jnp.concatenate(A_rs, axis=1)
    Ai_cat = A_is[0] if len(A_is) == 1 else jnp.concatenate(A_is, axis=1)
    GR = dot(wr, Ar_cat) - dot(wi, Ai_cat)   # (P, k*B*N)
    GI = dot(wr, Ai_cat) + dot(wi, Ar_cat)
    for k in range(k_steps):
        for s in range(nseries):
            j = k * nseries + s
            grk = GR[:, j * N:(j + 1) * N]
            gik = GI[:, j * N:(j + 1) * N]
            phi = dot_t(grk, wr) - dot_t(gik, wi)
            pm = pm_ref[s]
            sp, cp = _sincos(phi)
            packed = (jnp.where(lane == 0, jnp.sum(pm * cp), 0.0)
                      + jnp.where(lane == 1, jnp.sum(pm * sp),
                                  0.0))
            out_ref[k, s] = packed

    @pl.when(t == ngrid - 1)
    def _final():
        afin_ref[...] = st_ref[...]


def ar_batch_feasible(nseries, nlayers, N, npup, boiling):
    """VMEM feasibility + step-unroll pick for the batched AR kernel.

    Returns ``k_steps_cap`` (0 if the batch does not fit VMEM): four
    (2, B*L*N, N) f32 tensors (a0/ph in, state scratch, final-state out)
    + the noise table + per-k concat operands. The estimate is a guide,
    not a guarantee — Mosaic's stack allocator reuses rotation/noise
    temporaries unpredictably, so ``run_scan_sharded`` backstops a
    passing gate with a compile-failure fallback to the serial path.
    """
    P = _round_up(npup, _LANE)
    base = (4 * 2 + (1 if boiling else 0)) * nseries * nlayers * N * N * 4
    per_k = (2 * nseries * N * N + 2 * P * nseries * N) * 4
    fixed = (3 * P * N + nseries * P * P) * 4
    for k in (8, 4, 2, 1):
        if base + fixed + k * per_k <= 95e6:
            return k
    return 0


@functools.partial(jax.jit, static_argnames=("nsteps", "nseries", "nlayers",
                                             "interpret", "precision",
                                             "noise"))
def _ar_flow_call_batch(seed, a0, ph, ns, wr, wi, pm, nsteps, nseries,
                        nlayers, interpret=False, precision="default",
                        noise="uniform"):
    with jax.enable_x64(False):
        BLN, N = a0.shape[1:]
        P = wr.shape[0]
        boiling = ns is not None
        k_cap = ar_batch_feasible(nseries, nlayers, N, P, boiling)
        if k_cap == 0:
            raise ValueError(
                f"batched AR state ({nseries} series x {nlayers} layers x "
                f"{N}^2) exceeds VMEM; reduce the series batch")
        k_steps = _auto_tile(nsteps, k_cap)
        ngrid = nsteps // k_steps
        in_specs = [
            pl.BlockSpec((2, BLN, N), lambda t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BLN, N), lambda t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = [seed, a0, ph]
        if boiling:
            in_specs.append(pl.BlockSpec((BLN, N), lambda t, *_: (0, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(ns)
        in_specs += [
            pl.BlockSpec((P, N), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, N), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nseries, P, P), lambda t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [wr, wi, pm]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ngrid,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((k_steps, nseries, 1, _LANE),
                             lambda t, *_: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, BLN, N), lambda t, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((2, BLN, N), jnp.float32)],
        )
        kern = functools.partial(
            _ar_flow_kernel_batch, nseries=nseries, nlayers=nlayers, N=N,
            ngrid=ngrid, k_steps=k_steps, boiling=boiling, noise=noise,
            precision=_precision(precision))

        if boiling:
            def _shim(seed_ref, a0_ref, ph_ref, ns_ref, wr_ref, wi_ref,
                      pm_ref, out_ref, afin_ref, st_ref):
                kern(seed_ref, a0_ref, ph_ref, ns_ref, wr_ref, wi_ref,
                     pm_ref, out_ref, afin_ref, st_ref)
        else:
            def _shim(seed_ref, a0_ref, ph_ref, wr_ref, wi_ref, pm_ref,
                      out_ref, afin_ref, st_ref):
                kern(seed_ref, a0_ref, ph_ref, None, wr_ref, wi_ref,
                     pm_ref, out_ref, afin_ref, st_ref)

        # Generous scoped-VMEM limit: the stack allocator's true high-water
        # mark (state + rotation/noise temporaries + k-step concat buffers,
        # with reuse Mosaic decides) is not analytically predictable — a
        # B=4 x L=4 x 256^2 boiling config measured 83.7 MB against a
        # 78.8 MB limit derived from the old need*1.3 formula. Give the
        # compiler the headroom and let run_scan_sharded's compile-failure
        # fallback handle genuinely oversize batches.
        out, afin = pl.pallas_call(
            _shim,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((nsteps, nseries, 1, _LANE),
                                     jnp.float32),
                jax.ShapeDtypeStruct((2, BLN, N), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024,
                dimension_semantics=("arbitrary",)),
            interpret=pltpu.InterpretParams() if interpret else False,
        )(*operands)
        return out[:, :, 0, :2], afin


def ar_flow_fused_batch(seed, a0, step_phasor_scaled, noise_scale, W,
                        pupil_modes, nsteps, interpret=False,
                        precision="default", noise="uniform"):
    """``B`` independent AR(1) frozen-flow series from ONE fused kernel.

    Batched counterpart of :func:`ar_flow_fused` (identical per-series
    process): all leading-axis-``B`` inputs are per-series — different
    orbit samples / configurations sharing grid geometry batch together.

    Args:
        a0: (B, nlayers, N, N) complex initial Fourier states.
        step_phasor_scaled: (B, nlayers, N, N) complex per-series
            ``alpha * e^{i kappa . v dt}``.
        noise_scale: (B, nlayers, N, N) real per-series
            ``sqrt(1 - alpha^2) * sqrt(PSD) * df``, or None (pure frozen
            flow).
        W: (Npup, N) complex pruned inverse-DFT matrix (shared grid).
        pupil_modes: (B, Npup, Npup) per-series pupil*mode weights.

    Returns:
        (couplings, a_final): (nsteps, B, 2) float32 unnormalised
        couplings and the (B, nlayers, N, N) complex final states.
    """
    B, L, N, _ = a0.shape
    npup = W.shape[0]
    P = _round_up(npup, _LANE)
    a02 = jnp.stack([jnp.real(a0), jnp.imag(a0)]).reshape(2, B * L * N, N) \
        .astype(jnp.float32)
    ph2 = jnp.stack([jnp.real(step_phasor_scaled),
                     jnp.imag(step_phasor_scaled)]) \
        .reshape(2, B * L * N, N).astype(jnp.float32)
    ns = None
    if noise_scale is not None:
        ns = jnp.asarray(noise_scale, jnp.float32).reshape(B * L * N, N)
    W = jnp.asarray(W)
    wr = jnp.pad(jnp.real(W).astype(jnp.float32), ((0, P - npup), (0, 0)))
    wi = jnp.pad(jnp.imag(W).astype(jnp.float32), ((0, P - npup), (0, 0)))
    pms = jnp.pad(jnp.asarray(pupil_modes, jnp.float32),
                  ((0, 0), (0, P - npup), (0, P - npup)))
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    out, afin = _ar_flow_call_batch(
        seed, a02, ph2, ns, wr, wi, pms, int(nsteps), int(B), int(L),
        interpret=interpret, precision=precision, noise=noise)
    a_final = jax.lax.complex(afin[0], afin[1]).reshape(B, L, N, N)
    return out, a_final


def colfac_tile_select(nbatch, ncols, npup, precision, b_tile=None,
                       m_tile=None):
    """Static (b_tile, m_tile) selection for the colfac kernel.

    ``b_tile``/``m_tile`` are caps: the actual tiles are the largest
    divisors of ``nbatch`` / ``ncols`` not exceeding them, so any batch
    size and grid size work (awkward primes just run smaller tiles).
    ``None`` auto-sizes; an explicitly passed cap is honored in every
    branch (a caller shrinking tiles after a VMEM compile failure must
    not get its cap silently overwritten). ``m_tile=None`` auto-sizing:
    when the whole padded factor tensor fits a ~36 MB VMEM block it is
    loaded once (``m_tile=ncols``; measured +6% at 256^2 vs streaming in
    64-column blocks), else 64-column streaming.
    """
    P = _round_up(npup, _LANE)
    itemsize = 4 if precision != "default" else 2
    if m_tile is None and P >= 256:
        # Huge pupils: measured rungs (scripts/probe_1024_tiles.py).
        # Past P=128 the VMEM model stops predicting Mosaic's stack
        # high-water mark in either direction — (64, 64) fits the model
        # at P=256 yet fails to compile on chip, while (8, 64) busts a
        # double-buffered model at P=384 yet compiles — so only tiles
        # measured to compile AND win their size class are promoted.
        # Interleaved best-of-3 on v5e (default precision, bf16 tables):
        # P=256 (32,64) 102.3k r/s > (16,64) 85.3k > (16,16) 60.7k;
        # P=384 (16,16) 33.6k > (8,64) 30.3k (every m=64 rung with b>8
        # fails to compile there); P>=512 only (8,8) compiles. HIGHEST
        # precision (f32 tables, double the VMEM) is unmeasured at these
        # sizes — it gets the smallest tiles.
        cap = 128 if b_tile is None else b_tile
        if precision != "default":
            b_tile, m_tile = min(8, cap), 8
        elif P == 256:
            b_tile, m_tile = min(32, cap), 64
        elif P == 384:
            b_tile, m_tile = min(16, cap), 16
        else:
            b_tile, m_tile = min(8, cap), 8
    elif m_tile is None and precision == "default":
        # joint (b_tile, m_tile) auto-selection under a VMEM budget:
        # prefer the big batch tile (amortises the column loop's micro-
        # dot latency, measured +12% at 256^2) and the whole factor
        # tensor in VMEM (fetched once). Budget calibrated on v5e
        # (67 MB fails to compile, <=50 MB passes).
        cap = 128 if b_tile is None else b_tile

        def vmem(b, m):
            return (2 * b * P * P * 4          # f32 screen accumulators
                    + 2 * m * b * P * itemsize  # G scratch
                    + 2 * m * P * P * itemsize)  # factor block
        for b_c, m_c in ((128, ncols), (64, ncols), (128, 64), (64, 64),
                         (32, 64), (16, 64), (8, 64)):
            b_c = min(b_c, cap)
            if vmem(b_c, m_c) <= 55e6:
                b_tile, m_tile = b_c, m_c
                break
        else:  # nothing fits (unreachable at P=128): smallest tiles
            b_tile, m_tile = min(8, cap), 8
    elif m_tile is None:
        # HIGHEST-precision (multi-pass) dots need extra VMEM headroom —
        # keep the small streaming tiles there
        m_tile = 64
        if b_tile is None:
            b_tile = 64
    elif b_tile is None:
        b_tile = 64
    return _auto_tile(nbatch, b_tile), _auto_tile(ncols, m_tile)


def colfac_pack_tables(L, W, precision, noise="gauss"):
    """Pad/split the complex colfac tables for the kernel (host numpy).

    At PRECISION='default' the MXU rounds its inputs to bf16 anyway, so
    the factor tables ship and stream as bf16: half the HBM traffic /
    VMEM with identical dot results. With ``noise='mixed'`` the fixed
    orthogonal mixing matrix is *folded into the factors*
    (``z @ L^T = (u @ M) @ L^T = u @ (M L^T)``): the kernel then draws
    raw unit-variance uniforms and spends no mixing dot — identical
    random variables, ~20% fewer kernel FLOPs. Returns ``(l2, w2)``:
    (2, ncols, P, P) factors and (2, ncols, P) transposed DFT columns.
    """
    ncols, npup, _ = L.shape
    P = _round_up(npup, _LANE)
    tdt = np.float32 if precision != "default" else "bfloat16"
    l2 = np.zeros((2, ncols, P, P), np.float32)
    l2[0, :, :npup, :npup] = np.real(L)
    l2[1, :, :npup, :npup] = np.imag(L)
    if noise == "mixed":
        # kernel computes z @ l2[c, m]^T; fold the lane-mix into the table
        # (one BLAS matmul in f32 — the tables store as bf16 anyway)
        mt = _mixing_matrix(P).T
        l2 = (l2.reshape(-1, P) @ mt).reshape(l2.shape)
    w2 = np.zeros((2, ncols, P), np.float32)  # W^T: lane dim is P-tiled
    w2[0, :, :npup] = np.real(W).T
    w2[1, :, :npup] = np.imag(W).T
    return l2.astype(tdt), w2.astype(tdt)


def colfac_pack_tables_merged(L, W, precision, noise="gauss"):
    """Pack the colfac tables in the merged-dot layout (host numpy).

    Per column the real-block matrix ``S_m = [[L_r^T, L_i^T],
    [-L_i^T, L_r^T]]`` (2P, 2P) such that ``[z_r | z_i] @ S_m =
    [G_r | G_i]`` — the four complex-part dots of the split layout as one
    dense dot (every block product is needed; no wasted FLOPs). With
    ``noise='mixed'`` the orthogonal mix premultiplies each block
    (``(z @ M) @ L^T = z @ (M L^T)``) — identical random variables, no
    mixing dot. ``w3`` is (2, ncols, 2P): rows ``[W_r^T | W_i^T]`` and
    ``[-W_i^T | W_r^T]``, consumed as one stacked K=2m contraction.
    Table memory is 2x the split layout (each L part stored twice).
    """
    ncols, npup, _ = L.shape
    P = _round_up(npup, _LANE)
    tdt = np.float32 if precision != "default" else "bfloat16"
    lrT = np.zeros((ncols, P, P), np.float32)
    liT = np.zeros((ncols, P, P), np.float32)
    lrT[:, :npup, :npup] = np.real(L).transpose(0, 2, 1)
    liT[:, :npup, :npup] = np.imag(L).transpose(0, 2, 1)
    if noise == "mixed":
        M = _mixing_matrix(P)
        lrT = np.einsum("ij,mjk->mik", M, lrT)
        liT = np.einsum("ij,mjk->mik", M, liT)
    S = np.zeros((ncols, 2 * P, 2 * P), np.float32)
    S[:, :P, :P] = lrT
    S[:, :P, P:] = liT
    S[:, P:, :P] = -liT
    S[:, P:, P:] = lrT
    w3 = np.zeros((2, ncols, 2 * P), np.float32)
    w3[0, :, :npup] = np.real(W).T
    w3[0, :, P:P + npup] = np.imag(W).T
    w3[1, :, :npup] = -np.imag(W).T
    w3[1, :, P:P + npup] = np.real(W).T
    return S.astype(tdt), w3.astype(tdt)


def colfac_tile_select_merged(nbatch, ncols, npup, precision, b_tile=None,
                              m_tile=None):
    """Static (b_tile, m_tile) selection for the merged-dot colfac kernel.

    Same contract as :func:`colfac_tile_select` (``None`` auto-sizes, an
    explicit cap is honored in every branch); the VMEM model differs
    (4 P^2 per column of streamed S block, double-buffered by the
    pipeline, + the (2, m, b, P) G scratch + two f32 accumulators).
    """
    P = _round_up(npup, _LANE)
    itemsize = 4 if precision != "default" else 2
    if m_tile is None and P >= 256:
        # huge pupils: measured rungs, same evidence base as
        # :func:`colfac_tile_select` (scripts/probe_1024_tiles.py) —
        # P=256 merged (32,8) 75.1k r/s (vs (8,8) 36.3k); P=384 (16,8)
        # 30.1k ((32,8) fails to compile there); P>=512 only (8,8)
        # compiles. Note the layout auto-rule prefers 'split' at all of
        # these sizes (it wins every class); the merged rungs serve
        # explicit FAST_TPU_COLFAC_LAYOUT=merged requests.
        cap = 128 if b_tile is None else b_tile
        if precision != "default":
            b_tile, m_tile = min(8, cap), 8
        elif P == 256:
            b_tile, m_tile = min(32, cap), 8
        elif P == 384:
            b_tile, m_tile = min(16, cap), 8
        else:
            b_tile, m_tile = min(8, cap), 8
    elif m_tile is None:
        cap = 128 if b_tile is None else b_tile

        def vmem(b, m):
            return (2 * b * P * P * 4            # f32 screen accumulators
                    + 2 * m * b * P * itemsize   # G scratch
                    + 2 * m * 4 * P * P * itemsize)  # S block, x2 buffered

        for b_c, m_c in ((128, 128), (128, 64), (64, 64), (32, 64),
                         (16, 64), (8, 64)):
            b_c = min(b_c, cap)
            if vmem(b_c, m_c) <= 55e6:
                b_tile, m_tile = b_c, m_c
                break
        else:  # nothing fits (unreachable at P=128): smallest tiles
            b_tile, m_tile = min(8, cap), 8
    elif b_tile is None:
        b_tile = 128
    return _auto_tile(nbatch, b_tile), _auto_tile(ncols, m_tile)


def colfac_layout(layout=None, npup=None, precision="default"):
    """Resolve the colfac kernel layout: 'merged', 'split' or 'auto'.

    'auto' (the default) picks 'merged' — one (b, 2P)x(2P, 2P) MXU dot
    per column pair, measured ~2.5% faster at the production 256²/512²
    configs (P=128) — except at huge pupils (P>=256), where 'split'
    streams half the table bytes per column and wins every measured
    size class (`scripts/probe_1024_tiles.py`, interleaved best-of-3 on
    v5e): P=256 split (32,64) 102.3k r/s vs merged (32,8) 75.1k;
    P=384 split (16,16) 33.6k vs merged (16,8) 30.1k; P=512 split (8,8)
    6.36k vs merged (8,8) 5.23k. The matching measured tile rungs live
    in the tile-select ladders. The geometry rule needs ``npup``;
    without it 'auto' resolves to 'merged'. Override per-call or
    process-wide via ``FAST_TPU_COLFAC_LAYOUT``.
    """
    import os
    if layout is None:
        layout = os.environ.get("FAST_TPU_COLFAC_LAYOUT", "auto")
    if layout not in ("merged", "split", "auto"):
        raise ValueError(f"unknown colfac layout {layout!r}")
    if layout == "auto":
        layout = "merged"
        if npup is not None and _round_up(npup, _LANE) >= 256:
            layout = "split"
    return layout


def fused_colfac_detect_packed(seed, l2, w2, pupil_mode, nbatch, b_tile,
                               m_tile, interpret=False, precision="default",
                               subharm_screens=None, noise="gauss",
                               layout=None):
    """Traced-table colfac kernel entry (e.g. inside ``shard_map``).

    ``l2``/``w2`` from :func:`colfac_pack_tables` (split layout) or
    :func:`colfac_pack_tables_merged` (merged layout) **with the same
    ``noise`` argument** (may be traced arrays — per-configuration
    factors streamed through a mesh); ``pupil_mode`` is the *unpadded*
    (npup, npup) table, padded here (cheap, trace-safe). Tile sizes come
    from the matching tile-select function (host-static). With 'mixed'
    noise the mix lives in the tables (premixed kernel — no mixing dot).
    The layout is inferred from the table shapes when not given (the two
    packings are unambiguous: split ``w2`` is 3-D (2, ncols, P), merged
    ``w3`` is (2, ncols, 2P) with matching ``l2``).
    """
    npup = pupil_mode.shape[0]
    merged = l2.ndim == 3  # split l2 is (2, ncols, P, P); merged (n, 2P, 2P)
    if layout is not None and layout != ("merged" if merged else "split"):
        raise ValueError(
            f"layout={layout!r} does not match the packing of the supplied "
            f"tables ({'merged' if merged else 'split'})")
    P = l2.shape[-1] // 2 if merged else l2.shape[-1]
    xp = np if isinstance(pupil_mode, np.ndarray) else jnp
    pm = xp.pad(xp.asarray(pupil_mode, xp.float32),
                ((0, P - npup), (0, P - npup)))
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    if merged:
        return _colfac_detect_call_merged(
            seed, l2, w2, pm, int(nbatch), int(b_tile), int(m_tile),
            interpret=interpret, precision=precision, sh=subharm_screens,
            premixed=(noise == "mixed"), probe_noprng=_PROBE_NOPRNG)
    return _colfac_detect_call(seed, l2, w2, pm, int(nbatch), int(b_tile),
                               int(m_tile), interpret=interpret,
                               precision=precision, sh=subharm_screens,
                               mix=None, premixed=(noise == "mixed"))


def _ar_stream_kernel(scal_ref, st_ref, ph_ref, ns_ref, wr_ref, wi_ref,
                      pm_ref, st_out_ref, out_ref, acc_ref, *, n_lb,
                      k_steps, lb_layers, N, boiling, noise, precision):
    """One ``k_steps`` time-chunk of the AR flow, layer blocks streamed.

    Grid = (n_lb,): program ``lb`` loads its (2, lb_layers*N, N) state
    block from HBM, runs ``k_steps`` phasor updates (+ boiling noise),
    adds its per-step layer partial sums into the VMEM accumulator, and
    writes the updated block back. The last block program runs the pruned
    DFT + detector for all ``k_steps``. HBM traffic per chunk is one
    read+write of the state (amortised over ``k_steps`` time steps) —
    this is the beyond-VMEM path for profiles whose full Fourier state
    cannot stay resident (e.g. 1024^2 x 16 layers).
    """
    lb = pl.program_id(0)
    if boiling:
        # Mosaic accepts at most two seed values: combine (chunk, block)
        pltpu.prng_seed(scal_ref[0], scal_ref[1] * n_lb + lb)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    def dot_t(a, b):  # a @ b.T
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    @pl.when(lb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    nr = st_ref[0]
    ni = st_ref[1]
    pr = ph_ref[0]
    pi = ph_ref[1]
    if boiling:
        ns = ns_ref[:]
    for k in range(k_steps):
        ar, ai = nr, ni
        nr = ar * pr - ai * pi
        ni = ar * pi + ai * pr
        if boiling:
            shape = nr.shape  # (lb_layers*N, N)
            bits1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            bits2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            i1 = pltpu.bitcast(bits1 >> 8, jnp.int32)
            i2 = pltpu.bitcast(bits2 >> 8, jnp.int32)
            if noise == "uniform":
                s3 = np.float32(np.sqrt(3.0))
                z1 = i1.astype(jnp.float32) * (s3 * 2.0 ** -23) - s3
                z2 = i2.astype(jnp.float32) * (s3 * 2.0 ** -23) - s3
            else:
                u1 = i1.astype(jnp.float32) * (2.0 ** -24) + (2.0 ** -25)
                u2 = i2.astype(jnp.float32) * (2.0 ** -24)
                r = jnp.sqrt(-2.0 * jnp.log(u1))
                theta = (2.0 * np.pi) * u2
                st, ct = _sincos(theta)
                z1 = r * ct
                z2 = r * st
            nr = nr + z1 * ns
            ni = ni + z2 * ns
        Ar = nr[0:N]
        Ai = ni[0:N]
        for l in range(1, lb_layers):
            Ar = Ar + nr[l * N:(l + 1) * N]
            Ai = Ai + ni[l * N:(l + 1) * N]
        acc_ref[k, 0] += Ar
        acc_ref[k, 1] += Ai
    st_out_ref[0] = nr
    st_out_ref[1] = ni

    @pl.when(lb == n_lb - 1)
    def _detect():
        wr = wr_ref[:]
        wi = wi_ref[:]
        pm = pm_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
        # batch the chunk's DFT-side dots into single k-wide MXU dots
        if k_steps == 1:
            Ar_cat, Ai_cat = acc_ref[0, 0], acc_ref[0, 1]
        else:
            Ar_cat = jnp.concatenate(
                [acc_ref[k, 0] for k in range(k_steps)], axis=1)
            Ai_cat = jnp.concatenate(
                [acc_ref[k, 1] for k in range(k_steps)], axis=1)
        GR = dot(wr, Ar_cat) - dot(wi, Ai_cat)   # (P, k*N)
        GI = dot(wr, Ai_cat) + dot(wi, Ar_cat)
        for k in range(k_steps):
            grk = GR[:, k * N:(k + 1) * N]
            gik = GI[:, k * N:(k + 1) * N]
            phi = dot_t(grk, wr) - dot_t(gik, wi)
            sp, cp = _sincos(phi)
            packed = (jnp.where(lane == 0, jnp.sum(pm * cp), 0.0)
                      + jnp.where(lane == 1, jnp.sum(pm * sp),
                                  0.0))
            out_ref[k] = packed


@functools.partial(jax.jit, static_argnames=(
    "nsteps", "nlayers", "lb_layers", "k_steps", "interpret", "precision",
    "noise"))
def _ar_stream_call(seed, a0, ph, ns, wr, wi, pm, nsteps, nlayers,
                    lb_layers, k_steps, interpret=False,
                    precision="default", noise="uniform"):
    with jax.enable_x64(False):
        LN, N = a0.shape[1:]
        P = wr.shape[0]
        boiling = ns is not None
        n_lb = nlayers // lb_layers
        lbN = lb_layers * N
        nchunks = nsteps // k_steps

        in_specs = [
            pl.BlockSpec((2, lbN, N), lambda lb, *_: (0, lb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, lbN, N), lambda lb, *_: (0, lb, 0),
                         memory_space=pltpu.VMEM),
        ]
        if boiling:
            in_specs.append(pl.BlockSpec((lbN, N), lambda lb, *_: (lb, 0),
                                         memory_space=pltpu.VMEM))
        in_specs += [
            pl.BlockSpec((P, N), lambda lb, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, N), lambda lb, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, P), lambda lb, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_lb,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((2, lbN, N), lambda lb, *_: (0, lb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k_steps, 1, _LANE), lambda lb, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((k_steps, 2, N, N), jnp.float32)],
        )
        kern = functools.partial(
            _ar_stream_kernel, n_lb=n_lb, k_steps=k_steps,
            lb_layers=lb_layers, N=N, boiling=boiling, noise=noise,
            precision=_precision(precision))

        if boiling:
            def _shim(scal_ref, st_ref, ph_ref, ns_ref, wr_ref, wi_ref,
                      pm_ref, st_out_ref, out_ref, acc_ref):
                kern(scal_ref, st_ref, ph_ref, ns_ref, wr_ref, wi_ref,
                     pm_ref, st_out_ref, out_ref, acc_ref)
        else:
            def _shim(scal_ref, st_ref, ph_ref, wr_ref, wi_ref, pm_ref,
                      st_out_ref, out_ref, acc_ref):
                kern(scal_ref, st_ref, ph_ref, None, wr_ref, wi_ref,
                     pm_ref, st_out_ref, out_ref, acc_ref)

        vmem_need = ((14 * lbN + 2 * k_steps * N + 6 * P) * N
                     + 4 * P * P) * 4
        call = pl.pallas_call(
            _shim, grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((2, LN, N), jnp.float32),
                jax.ShapeDtypeStruct((k_steps, 1, _LANE), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=max(64 * 1024 * 1024, min(110 * 1024 * 1024, int(vmem_need * 1.3))),
                dimension_semantics=("arbitrary",)),
            interpret=pltpu.InterpretParams() if interpret else False)

        def body(st, tc):
            operands = [jnp.stack([seed[0], tc]), st, ph]
            if boiling:
                operands.append(ns)
            operands += [wr, wi, pm]
            st_new, out_k = call(*operands)
            return st_new, out_k

        st_fin, outs = jax.lax.scan(
            body, a0, jnp.arange(nchunks, dtype=jnp.int32))
        return outs.reshape(nsteps, 1, _LANE)[:, 0, :2], st_fin


def ar_flow_streamed(seed, a0, step_phasor_scaled, noise_scale, W,
                     pupil_mode, nsteps, interpret=False,
                     precision="default", noise="uniform"):
    """AR(1) frozen-flow coupling series with HBM-streamed layer state.

    Same process and arguments as :func:`ar_flow_fused`, for
    configurations whose (nlayers, N, N) Fourier state exceeds the fused
    kernel's VMEM budget: the state lives in HBM, carried by an XLA scan
    over ``k_steps`` time-chunks; each chunk streams the per-layer blocks
    through VMEM once (read+write amortised over the chunk's steps).
    """
    L, N, _ = a0.shape
    npup = W.shape[0]
    P = _round_up(npup, _LANE)
    # VMEM per program: streamed blocks are double-buffered by the Pallas
    # pipeline — (14*lbN + 2k*N)*N floats with lb_layers=1 — so a ~88 MB
    # budget bounds k (the accumulator is the only single-buffered piece)
    k_cap = max(1, int((22e6 / (N * N) - 14) / 2))
    k_steps = _auto_tile(nsteps, min(8, k_cap))
    a02 = jnp.stack([jnp.real(a0), jnp.imag(a0)]).reshape(2, L * N, N) \
        .astype(jnp.float32)
    ph2 = jnp.stack([jnp.real(step_phasor_scaled),
                     jnp.imag(step_phasor_scaled)]) \
        .reshape(2, L * N, N).astype(jnp.float32)
    ns = None
    if noise_scale is not None:
        ns = jnp.asarray(noise_scale, jnp.float32).reshape(L * N, N)
    W = jnp.asarray(W)
    wr = jnp.pad(jnp.real(W).astype(jnp.float32), ((0, P - npup), (0, 0)))
    wi = jnp.pad(jnp.imag(W).astype(jnp.float32), ((0, P - npup), (0, 0)))
    pm = jnp.pad(jnp.asarray(pupil_mode, jnp.float32),
                 ((0, P - npup), (0, P - npup)))
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    out, stfin = _ar_stream_call(
        seed, a02, ph2, ns, wr, wi, pm, int(nsteps), int(L), 1,
        int(k_steps), interpret=interpret, precision=precision,
        noise=noise)
    a_final = jax.lax.complex(stfin[0], stfin[1]).reshape(L, N, N)
    return out, a_final


def fused_colfac_detect(seed, L, W, pupil_mode, nbatch, b_tile=None,
                        m_tile=None, interpret=False, precision="default",
                        subharm_screens=None, noise="gauss", layout=None):
    """Monte Carlo couplings from colfac-basis noise, one fused kernel.

    Same distribution as ``synthesize_screens_colfac`` + detector — P*N
    normals per screen instead of N^2 — with the factors streamed
    block-by-block through VMEM and screens accumulated on-chip (never in
    HBM). Returns (2*nbatch, 2) float32 unnormalised couplings.

    ``layout``: 'merged' (default — one dot per column + one K=2m
    contraction, see :func:`_colfac_detect_kernel_merged`) or 'split'
    (the round-2/3 four-dot kernel); identical random variables either
    way. Tile selection per the matching tile-select function.
    ``subharm_screens`` (from :func:`pad_subharm_screens`,
    (nbatch, 2, P, P)) adds per-screen low-order subharmonic phase before
    the on-chip detector.
    """
    ncols, npup, _ = L.shape
    layout = colfac_layout(layout, npup, precision)
    if layout == "merged":
        b_tile, m_tile = colfac_tile_select_merged(
            nbatch, ncols, npup, precision, b_tile, m_tile)
        l2, w2 = colfac_pack_tables_merged(L, W, precision, noise=noise)
    else:
        b_tile, m_tile = colfac_tile_select(nbatch, ncols, npup, precision,
                                            b_tile, m_tile)
        l2, w2 = colfac_pack_tables(L, W, precision, noise=noise)
    return fused_colfac_detect_packed(
        seed, jnp.asarray(l2), jnp.asarray(w2), np.asarray(pupil_mode),
        nbatch, b_tile, m_tile, interpret=interpret, precision=precision,
        subharm_screens=subharm_screens, noise=noise)
