"""Fused Pallas synthesis kernel tests.

Shape/plumbing tests run everywhere via the Pallas TPU interpreter (whose
PRNG stub returns zeros, so statistics are only checked on real TPU
hardware — see the `tpu` marker; the statistical validation also runs in
bench warmup).
"""

import jax
import numpy as np
import pytest

from fast_tpu import synthesis
from fast_tpu.ops import pallas_synth

on_tpu = any(d.platform != "cpu" for d in jax.devices())


def test_interpret_shapes():
    N, lo, hi = 64, 20, 44
    sqrt_ps = np.ones((N, N), np.float32)
    W = synthesis.pruned_ift2_matrix(N, lo, hi, dtype=np.complex64)
    phs = pallas_synth.fused_synthesis(1, sqrt_ps, 0.3, 6, W, interpret=True)
    assert phs.shape == (12, 24, 24)
    assert phs.dtype == np.float32
    assert np.isfinite(np.asarray(phs)).all()


def test_interpret_fused_detect_shapes():
    N, lo, hi = 64, 20, 44
    sqrt_ps = np.ones((N, N), np.float32)
    W = synthesis.pruned_ift2_matrix(N, lo, hi, dtype=np.complex64)
    pm = np.ones((24, 24), np.float32)
    c = pallas_synth.fused_synthesis_detect(1, sqrt_ps, 0.3, 6, W, pm,
                                            interpret=True)
    assert c.shape == (12, 2)
    assert np.isfinite(np.asarray(c)).all()


@pytest.mark.skipif(not on_tpu, reason="needs TPU hardware PRNG")
def test_statistics_on_tpu():
    N, lo, hi = 64, 20, 44
    rng = np.random.default_rng(0)
    sqrt_ps = (rng.random((N, N)) + 0.2).astype(np.float32)
    W = synthesis.pruned_ift2_matrix(N, lo, hi, dtype=np.complex64)
    df = 0.37
    phs = np.asarray(pallas_synth.fused_synthesis(123, sqrt_ps, df, 8000, W))

    psd = sqrt_ps.astype(np.float64) ** 2
    B = np.fft.ifft2(np.fft.ifftshift(psd) * df ** 2).real * N * N
    assert abs(phs.var() - psd.sum() * df ** 2) / (psd.sum() * df ** 2) < 0.02

    def autocov(ph, dr, dc):
        a = ph[:, : ph.shape[1] - dr or None, : ph.shape[2] - dc or None]
        b = ph[:, dr:, dc:]
        return (a * b).mean()

    for (dr, dc) in [(1, 0), (0, 3), (2, 2)]:
        assert abs(autocov(phs, dr, dc) - B[dr, dc]) < 0.05 * phs.var()

    # determinism and independence
    phs2 = np.asarray(pallas_synth.fused_synthesis(123, sqrt_ps, df, 8000, W))
    np.testing.assert_array_equal(phs, phs2)
    assert abs(np.corrcoef(phs[0].ravel(), phs[1].ravel())[0, 1]) < 0.1


def test_interpret_colfac_detect_deterministic():
    """The interpreter PRNG yields zero bits, so every Box-Muller draw is
    the constant ``r0 = sqrt(-2 ln 2^-25)`` (real part) — making the whole
    kernel deterministic. Validates the factor-apply / W-contraction /
    accumulator / detector plumbing against a numpy evaluation on CPU."""
    N, npup = 128, 24
    rng = np.random.default_rng(1)
    L = (rng.normal(size=(N, npup, npup))
         + 1j * rng.normal(size=(N, npup, npup))).astype(np.complex64) * 0.01
    W = synthesis.pruned_ift2_matrix(N, 20, 44, dtype=np.complex64)
    pm = rng.random((npup, npup)).astype(np.float32)
    c = pallas_synth.fused_colfac_detect(3, L, W, pm, 128, interpret=True,
                                         precision="highest")
    assert c.shape == (256, 2)

    r0 = np.float32(np.sqrt(-2 * np.log(np.float32(2.0 ** -25))))
    # z = r0 (real), so G[p, m] = r0 * sum_q L[m, p, q]; scr = G @ W^T
    G = r0 * L.sum(axis=2).T                      # (npup, N)
    scr = G @ np.asarray(W).T                     # (npup, npup) complex
    c1 = (pm * np.cos(scr.real)).sum()            # real-part screen
    c1i = (pm * np.sin(scr.real)).sum()
    c2 = (pm * np.cos(scr.imag)).sum()
    c2i = (pm * np.sin(scr.imag)).sum()
    np.testing.assert_allclose(c[:128, 0], c1, rtol=2e-4)
    np.testing.assert_allclose(c[:128, 1], c1i, rtol=2e-4, atol=1e-3)
    np.testing.assert_allclose(c[128:, 0], c2, rtol=2e-4)
    np.testing.assert_allclose(c[128:, 1], c2i, rtol=2e-4, atol=1e-3)


def test_interpret_subharm_add_in_detect_kernels():
    """Subharmonic screens passed into the fused detectors are added to the
    phase before the on-chip ``exp``: validated against a numpy evaluation
    (the interpreter PRNG is deterministic — zero bits)."""
    N, lo, hi = 64, 20, 44
    npup = hi - lo
    rng = np.random.default_rng(5)
    sqrt_ps = (rng.random((N, N)) + 0.2).astype(np.float32)
    df = 0.3
    W = synthesis.pruned_ift2_matrix(N, lo, hi, dtype=np.complex64)
    pm = rng.random((npup, npup)).astype(np.float32)
    nbatch = 4
    shc = (rng.normal(size=(nbatch, npup, npup))
           + 1j * rng.normal(size=(nbatch, npup, npup))).astype(np.complex64)
    sh = np.asarray(pallas_synth.pad_subharm_screens(shc, npup))

    c = np.asarray(pallas_synth.fused_synthesis_detect(
        1, sqrt_ps, df, nbatch, W, pm, interpret=True, subharm_screens=sh))

    # interpreter PRNG: u1 = 2^-25, u2 = 0 -> noise = r0 * s (real)
    r0 = np.sqrt(-2 * np.log(np.float32(2.0 ** -25))).astype(np.float32)
    X = r0 * sqrt_ps * np.float32(df)
    scr = np.asarray(W) @ X.astype(np.complex64) @ np.asarray(W).T
    for b in range(nbatch):
        phi1 = scr.real + shc[b].real
        phi2 = scr.imag + shc[b].imag
        np.testing.assert_allclose(
            c[b], [(pm * np.cos(phi1)).sum(), (pm * np.sin(phi1)).sum()],
            rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(
            c[nbatch + b],
            [(pm * np.cos(phi2)).sum(), (pm * np.sin(phi2)).sum()],
            rtol=1e-3, atol=1e-3)

    # colfac variant: same screens-in, same adds
    L = (rng.normal(size=(N, npup, npup))
         + 1j * rng.normal(size=(N, npup, npup))).astype(np.complex64) * 0.01
    cc = np.asarray(pallas_synth.fused_colfac_detect(
        3, L, W, pm, nbatch, interpret=True, subharm_screens=sh,
        precision="highest"))
    G = r0 * L.sum(axis=2).T
    scr_c = G @ np.asarray(W).T
    for b in range(nbatch):
        phi1 = scr_c.real + shc[b].real
        np.testing.assert_allclose(
            cc[b], [(pm * np.cos(phi1)).sum(), (pm * np.sin(phi1)).sum()],
            rtol=1e-3, atol=1e-3)


def test_interpret_ar_flow_kernel_matches_scan_path():
    """Pure frozen flow (no boiling -> no RNG): the fused AR kernel's
    coupling series equals the stock scan path exactly, step for step,
    and the returned final state matches the AR recursion."""
    import jax.numpy as jnp

    L_layers, N, lo, hi = 2, 64, 20, 44
    npup = hi - lo
    rng = np.random.default_rng(6)
    a0 = (rng.normal(size=(L_layers, N, N))
          + 1j * rng.normal(size=(L_layers, N, N))).astype(np.complex64)
    ph = np.exp(1j * rng.uniform(-3, 3, (L_layers, N, N))) \
        .astype(np.complex64)
    W = synthesis.pruned_ift2_matrix(N, lo, hi, dtype=np.complex64)
    pm = rng.random((npup, npup)).astype(np.float32)
    nsteps = 5

    c, afin = pallas_synth.ar_flow_fused(
        1, jnp.asarray(a0), jnp.asarray(ph), None, W, pm, nsteps,
        interpret=True, precision="highest")
    c = np.asarray(c)
    assert c.shape == (nsteps, 2)

    # reference recursion in numpy
    a = a0.copy()
    for t in range(nsteps):
        a = ph * a
        A = a.sum(0)
        phi = (np.asarray(W) @ A @ np.asarray(W).T).real
        np.testing.assert_allclose(
            c[t], [(pm * np.cos(phi)).sum(), (pm * np.sin(phi)).sum()],
            rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(afin), a, rtol=2e-4, atol=2e-4)

    # same process through the scan-path helper (chi = 0, unit scaling)
    a2, _, out = synthesis.ar_flow_couplings(
        jnp.asarray(a0), jax.random.key(0), jnp.asarray(ph),
        jnp.zeros((L_layers, N, N), jnp.float32),
        jnp.ones((L_layers, 1, 1), jnp.float32),
        jnp.zeros((L_layers, 1, 1), jnp.float32),
        jnp.zeros((nsteps,), jnp.float32), W, pm, 1.0, 1.0, False,
        precision="highest")
    np.testing.assert_allclose(
        c[:, 0] + 1j * c[:, 1], np.asarray(out), rtol=5e-3, atol=5e-3)

    # multi-step-per-program unroll (nsteps=8 -> K=4) gives the same series
    c8, _ = pallas_synth.ar_flow_fused(
        1, jnp.asarray(a0), jnp.asarray(ph), None, W, pm, 8,
        interpret=True, precision="highest")
    np.testing.assert_allclose(np.asarray(c8)[:nsteps], c, rtol=1e-4,
                               atol=1e-4)


def test_interpret_ar_streamed_matches_fused():
    """The HBM-streamed AR kernel (layer blocks through VMEM, state
    carried by an XLA scan) computes the same series as the VMEM-resident
    fused kernel — exactly, in the deterministic alpha=1 case."""
    import jax.numpy as jnp

    L_layers, N, lo, hi = 3, 64, 20, 44
    npup = hi - lo
    rng = np.random.default_rng(7)
    # keep |phi| ~ 1 rad: accumulation-order f32 noise through cos/sin is
    # then comparable between the two layer-summation orders
    a0 = 0.02 * (rng.normal(size=(L_layers, N, N))
                 + 1j * rng.normal(size=(L_layers, N, N))) \
        .astype(np.complex64)
    ph = np.exp(1j * rng.uniform(-3, 3, (L_layers, N, N))) \
        .astype(np.complex64)
    W = synthesis.pruned_ift2_matrix(N, lo, hi, dtype=np.complex64)
    pm = rng.random((npup, npup)).astype(np.float32)
    nsteps = 8

    c_f, af_f = pallas_synth.ar_flow_fused(
        1, jnp.asarray(a0), jnp.asarray(ph), None, W, pm, nsteps,
        interpret=True, precision="highest")
    c_s, af_s = pallas_synth.ar_flow_streamed(
        1, jnp.asarray(a0), jnp.asarray(ph), None, W, pm, nsteps,
        interpret=True, precision="highest")
    np.testing.assert_allclose(np.asarray(c_s), np.asarray(c_f),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(af_s), np.asarray(af_f),
                               rtol=2e-4, atol=2e-4)


def test_interpret_ar_streamed_boiling_matches_fused():
    """Boiling path: zero interpreter bits make both kernels' noise the
    same deterministic constant, so streamed == fused including the
    noise-injection arithmetic."""
    import jax.numpy as jnp

    L_layers, N, lo, hi = 2, 64, 20, 44
    npup = hi - lo
    rng = np.random.default_rng(9)
    a0 = 0.02 * (rng.normal(size=(L_layers, N, N))
                 + 1j * rng.normal(size=(L_layers, N, N))) \
        .astype(np.complex64)
    alpha = 0.9
    ph = (alpha * np.exp(1j * rng.uniform(-3, 3, (L_layers, N, N)))) \
        .astype(np.complex64)
    ns = (0.01 * rng.random((L_layers, N, N))).astype(np.float32)
    W = synthesis.pruned_ift2_matrix(N, lo, hi, dtype=np.complex64)
    pm = rng.random((npup, npup)).astype(np.float32)
    nsteps = 8

    for noise in ("uniform", "gauss"):
        c_f, af_f = pallas_synth.ar_flow_fused(
            1, jnp.asarray(a0), jnp.asarray(ph), jnp.asarray(ns), W, pm,
            nsteps, interpret=True, precision="highest", noise=noise)
        c_s, af_s = pallas_synth.ar_flow_streamed(
            1, jnp.asarray(a0), jnp.asarray(ph), jnp.asarray(ns), W, pm,
            nsteps, interpret=True, precision="highest", noise=noise)
        np.testing.assert_allclose(np.asarray(c_s), np.asarray(c_f),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(af_s), np.asarray(af_f),
                                   rtol=2e-4, atol=2e-4)


def test_interpret_mixed_noise_plumbing():
    """MC_NOISE='mixed': zero interpreter bits give u = -sqrt(3)
    everywhere, so z = u @ M is deterministic — validates the orthogonal
    mixing path against numpy for both detect kernels."""
    N, lo, hi = 64, 20, 44
    npup = hi - lo
    rng = np.random.default_rng(8)
    sqrt_ps = (rng.random((N, N)) + 0.2).astype(np.float32)
    df = 0.3
    W = synthesis.pruned_ift2_matrix(N, lo, hi, dtype=np.complex64)
    pm = rng.random((npup, npup)).astype(np.float32)

    c = np.asarray(pallas_synth.fused_synthesis_detect(
        1, sqrt_ps, df, 2, W, pm, interpret=True, noise="mixed"))
    M = pallas_synth._mixing_matrix(N)
    # orthogonality of the mixing matrix itself
    np.testing.assert_allclose(M @ M.T, np.eye(N), atol=2e-6)
    # the kernel works in the transposed formulation (k-pair batching):
    # X' = z * s^T, screens H = W X' W^T come out transposed and the
    # detector uses pm^T — reproduce exactly that pipeline
    z = -np.sqrt(3, dtype=np.float32) * np.ones((N, N), np.float32) @ M
    Xt = (z * sqrt_ps.T * np.float32(df)).astype(np.complex64) * (1 + 1j)
    scr_t = np.asarray(W) @ Xt @ np.asarray(W).T
    np.testing.assert_allclose(
        c[0], [(pm.T * np.cos(scr_t.real)).sum(),
               (pm.T * np.sin(scr_t.real)).sum()],
        rtol=5e-3, atol=5e-3)

    # colfac variant: z (b, P) rows all equal -sqrt3 * colsum(M_P)
    L = (rng.normal(size=(N, npup, npup))
         + 1j * rng.normal(size=(N, npup, npup))).astype(np.complex64) * 0.01
    cc = np.asarray(pallas_synth.fused_colfac_detect(
        3, L, W, pm, 4, interpret=True, noise="mixed",
        precision="highest"))
    P = pallas_synth._round_up(npup, 128)
    MP = pallas_synth._mixing_matrix(P)
    zrow = -np.sqrt(3) * MP.sum(axis=0)  # (P,)
    zc = (zrow + 1j * zrow)[:npup]  # same for every column draw
    # kernel computes G_m = z_m @ L_m^T, i.e. G[:, m] = L_m @ z
    Gm = np.stack([L[m] @ zc for m in range(N)], axis=-1)  # (npup, N)
    scr_c = Gm @ np.asarray(W).T
    phi1 = scr_c.real
    np.testing.assert_allclose(
        cc[0], [(pm * np.cos(phi1)).sum(), (pm * np.sin(phi1)).sum()],
        rtol=5e-3, atol=5e-3)


def test_colfac_auto_tiling_any_sizes():
    """Batch/column counts that are not multiples of 64 auto-tile down:
    the tiles become the largest divisors <= the caps, so any NITER/
    NCHUNKS/grid combination runs (previously a hard divisibility
    requirement)."""
    N, npup = 96, 24            # 96 % 64 != 0 -> m_tile 48
    rng = np.random.default_rng(4)
    L = (rng.normal(size=(N, npup, npup))
         + 1j * rng.normal(size=(N, npup, npup))).astype(np.complex64) * 0.01
    W = synthesis.pruned_ift2_matrix(N, 20, 44, dtype=np.complex64)
    pm = rng.random((npup, npup)).astype(np.float32)
    for nbatch in (56, 10, 7):  # 56 -> b_tile 56; 10 -> 10; 7 (prime) -> 7
        c = pallas_synth.fused_colfac_detect(3, L, W, pm, nbatch,
                                             interpret=True,
                                             precision="highest")
        assert c.shape == (2 * nbatch, 2)
        # same deterministic plumbing identity as the divisible case
        r0 = np.float32(np.sqrt(-2 * np.log(np.float32(2.0 ** -25))))
        G = r0 * L.sum(axis=2).T
        scr = G @ np.asarray(W).T
        c1 = (pm * np.cos(scr.real)).sum()
        np.testing.assert_allclose(c[:nbatch, 0], c1, rtol=2e-4)


@pytest.mark.skipif(not on_tpu, reason="needs TPU hardware PRNG")
def test_colfac_kernel_statistics_on_tpu():
    """Colfac-basis kernel couplings match the colfac Gaussian process.

    The reference draw is pure numpy (complex arrays cannot cross program
    boundaries on the axon runtime, so the stock device path is not usable
    here); the kernel side uses the hardware PRNG.
    """
    from scipy.stats import ks_2samp

    N, lo, hi = 128, 40, 88
    rng = np.random.default_rng(2)
    sqrt_ps = (rng.random((N, N)) + 0.2).astype(np.float32) * 0.05
    Wd = synthesis.pruned_ift2_matrix(N, lo, hi, dtype=np.complex128)
    L = synthesis.column_factors(sqrt_ps.astype(np.float64), 1.0, Wd)
    W = Wd.astype(np.complex64)
    npup = hi - lo
    pm = np.ones((npup, npup), np.float32)
    c = np.asarray(pallas_synth.fused_colfac_detect(
        7, L.astype(np.complex64), W, pm, 2048))
    pc = np.abs(c[:, 0] + 1j * c[:, 1])

    z = (rng.standard_normal((2048, N, npup))
         + 1j * rng.standard_normal((2048, N, npup)))
    G = np.einsum("mpq,bmq->bpm", L, z)
    scr = G @ np.asarray(Wd).T                      # (b, npup, npup)
    phs = np.concatenate([scr.real, scr.imag])
    pc_ref = np.abs(np.exp(1j * phs).sum(axis=(-2, -1)))
    assert ks_2samp(pc, pc_ref).pvalue > 1e-3


def test_interpret_ar_flow_batch_matches_single():
    """The series-batched AR kernel evolves each series exactly as the
    single-series kernel: per-series couplings and final states match
    (pure frozen flow has no RNG; the boiling case matches too because
    zero interpreter bits make the noise the same constant)."""
    import jax.numpy as jnp

    B, L_layers, N, lo, hi = 3, 2, 64, 20, 44
    npup = hi - lo
    rng = np.random.default_rng(11)
    a0 = 0.02 * (rng.normal(size=(B, L_layers, N, N))
                 + 1j * rng.normal(size=(B, L_layers, N, N))) \
        .astype(np.complex64)
    ph = np.exp(1j * rng.uniform(-3, 3, (B, L_layers, N, N))) \
        .astype(np.complex64)
    W = synthesis.pruned_ift2_matrix(N, lo, hi, dtype=np.complex64)
    pms = rng.random((B, npup, npup)).astype(np.float32)
    nsteps = 6

    c_b, af_b = pallas_synth.ar_flow_fused_batch(
        1, jnp.asarray(a0), jnp.asarray(ph), None, W, pms, nsteps,
        interpret=True, precision="highest")
    c_b, af_b = np.asarray(c_b), np.asarray(af_b)
    assert c_b.shape == (nsteps, B, 2)
    for s in range(B):
        c1, af1 = pallas_synth.ar_flow_fused(
            1, jnp.asarray(a0[s]), jnp.asarray(ph[s]), None, W, pms[s],
            nsteps, interpret=True, precision="highest")
        np.testing.assert_allclose(c_b[:, s], np.asarray(c1), rtol=2e-4,
                                   atol=2e-4)
        np.testing.assert_allclose(af_b[s], np.asarray(af1), rtol=2e-4,
                                   atol=2e-4)

    # boiling: per-series noise tables, zero interpreter bits
    alpha = 0.9
    phb = (alpha * ph).astype(np.complex64)
    ns = (0.01 * rng.random((B, L_layers, N, N))).astype(np.float32)
    c_b, af_b = pallas_synth.ar_flow_fused_batch(
        1, jnp.asarray(a0), jnp.asarray(phb), jnp.asarray(ns), W, pms,
        nsteps, interpret=True, precision="highest", noise="uniform")
    c_b, af_b = np.asarray(c_b), np.asarray(af_b)
    for s in range(B):
        c1, af1 = pallas_synth.ar_flow_fused(
            1, jnp.asarray(a0[s]), jnp.asarray(phb[s]), jnp.asarray(ns[s]),
            W, pms[s], nsteps, interpret=True, precision="highest",
            noise="uniform")
        np.testing.assert_allclose(c_b[:, s], np.asarray(c1), rtol=2e-4,
                                   atol=2e-4)
        np.testing.assert_allclose(af_b[s], np.asarray(af1), rtol=2e-4,
                                   atol=2e-4)


def test_colfac_tile_select_honors_explicit_cap():
    """An explicitly passed b_tile is a hard cap in every branch of both
    tile selectors (a caller shrinking tiles after a VMEM compile
    failure must not get the cap silently overwritten)."""
    from fast_tpu.ops import pallas_synth as ps

    for select in (ps.colfac_tile_select, ps.colfac_tile_select_merged):
        # auto (no cap): small grids pick the big batch tile
        b_auto, _ = select(4096, 256, 128, "default")
        assert b_auto == 128
        # explicit cap honored in the auto branch
        b_cap, _ = select(4096, 256, 128, "default", 16)
        assert b_cap <= 16
        # explicit cap honored with explicit m_tile too
        b_cap2, m2 = select(4096, 256, 128, "default", 16, 64)
        assert b_cap2 <= 16 and m2 <= 64
    # explicit cap honored in the HIGHEST-precision branch (split)
    b_hp, _ = ps.colfac_tile_select(4096, 256, 128, "highest", 8)
    assert b_hp <= 8


def test_colfac_packed_tile_invariance():
    """Tile choice is blocking, not math: the packed kernel's output
    agrees across every (b_tile, m_tile) candidate, in both layouts, to
    f32 reduction-order tolerance (different m_tile = different column-
    accumulation order). De-risks promoting the huge-pupil candidates
    (merged (16,4) / split (16,16)) that the VMEM ladder may select at
    P>=384."""
    N, npup = 64, 24
    rng = np.random.default_rng(9)
    L = (rng.normal(size=(N, npup, npup))
         + 1j * rng.normal(size=(N, npup, npup))).astype(np.complex64) * 0.01
    W = synthesis.pruned_ift2_matrix(N, 20, 44, dtype=np.complex64)
    pm = rng.random((npup, npup)).astype(np.float32)
    nbatch = 32
    for pack in (pallas_synth.colfac_pack_tables,
                 pallas_synth.colfac_pack_tables_merged):
        tabs = pack(L, W, "highest", noise="gauss")
        ref = None
        for bt, mt in ((8, 8), (16, 4), (16, 8), (16, 16), (32, 64)):
            c = np.asarray(pallas_synth.fused_colfac_detect_packed(
                7, *tabs, pm, nbatch, bt, mt, interpret=True,
                precision="highest", noise="gauss"))
            assert np.isfinite(c).all()
            if ref is None:
                ref = c
            else:
                np.testing.assert_allclose(c, ref, rtol=5e-4, atol=5e-4)


def test_colfac_layout_auto_geometry():
    """'auto' layout resolution: merged wherever the merged ladder has a
    real (>=64-column) rung, split exactly where it would fall to the
    smallest-tile (8, 8) rung — there split's half-size factor block
    still fits bigger tiles (or at worst streams half the bytes:
    measured +21% at 1024^2/P=512, scripts/probe_1024_tiles.py)."""
    import os
    from fast_tpu.ops import pallas_synth as ps

    assert ps.colfac_layout() == "merged"        # no geometry: legacy
    assert ps.colfac_layout(None, 100, "default") == "merged"
    assert ps.colfac_layout(None, 402, "default") == "split"
    # an explicit layout always wins over the geometry rule
    assert ps.colfac_layout("merged", 402, "default") == "merged"
    assert ps.colfac_layout("split", 100, "default") == "split"
    # env override wins too
    os.environ["FAST_TPU_COLFAC_LAYOUT"] = "merged"
    try:
        assert ps.colfac_layout(None, 402, "default") == "merged"
    finally:
        os.environ.pop("FAST_TPU_COLFAC_LAYOUT")
    # the rule flips exactly at P=256, where the ladders switch to the
    # measured huge-pupil rungs
    for npup in (64, 128, 160, 201, 256, 384, 402, 512):
        P = ps._round_up(npup, ps._LANE)
        want = "split" if P >= 256 else "merged"
        for precision in ("default", "highest"):
            assert ps.colfac_layout(None, npup, precision) == want, (
                npup, precision)
    # the huge-pupil rungs are the measured winners per size class
    assert ps.colfac_tile_select(4096, 512, 202, "default") == (32, 64)
    assert ps.colfac_tile_select(4096, 512, 302, "default") == (16, 16)
    assert ps.colfac_tile_select(4096, 1024, 402, "default") == (8, 8)
    assert ps.colfac_tile_select_merged(4096, 512, 202, "default") == (32, 8)
    assert ps.colfac_tile_select_merged(4096, 512, 302, "default") == (16, 8)
    assert ps.colfac_tile_select_merged(4096, 1024, 402, "default") == (8, 8)
    # explicit b_tile caps are honored on the huge-pupil rungs too, and
    # HIGHEST precision (unmeasured there) stays on the smallest tiles
    assert ps.colfac_tile_select(4096, 512, 202, "default", 8) == (8, 64)
    assert ps.colfac_tile_select(4096, 512, 202, "highest") == (8, 8)
    assert ps.colfac_tile_select_merged(4096, 512, 202, "highest") == (8, 8)
