"""Monte Carlo synthesis: phase screens, subharmonics, frozen flow, detector.

Device-side hot path. The reference drew realizations through a serial
chunk loop into preallocated numpy buffers with optional pyFFTW
(``fast/fast.py:589-668``, ``fast/funcs.py:210-258``); here each chunk is a
single jitted program over a batched realization axis:

    complex normals  ->  color by sqrt(PSD)  ->  batched centered ifft2
    ->  crop to pupil  ->  pupil-overlap reduction  ->  complex coupling

Everything uses float32/complex64 by default (configurable) — the PSD is
assembled in float64 and cast once. The Hermitian "doubling" trick of the
reference (real and imaginary parts of one complex screen are two
independent realizations, ``fast/funcs.py:220-222``) is kept: only
``batch/2`` FFTs are needed per ``batch`` screens.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .ops.fourier import ft, ift2
from .ops.interp import sample_grid_periodic
from .ops.rng import complex_normal


def synthesize_screens_complex(key, sqrt_powerspec, df, nbatch, crop=None):
    """Draw ``nbatch`` complex screens whose real/imag parts are phase screens.

    Args:
        key: PRNG key.
        sqrt_powerspec: (..., N, N) float — ``sqrt(PSD)``; a leading axis
            (e.g. per-layer) broadcasts against the batch axis.
        df: frequency-bin spacing (scalar).
        nbatch: number of complex screens to draw.
        crop: optional (lo, hi) slice applied to both trailing axes after
            the FFT (the pupil cut, ``fast/fast.py:596``).

    Returns:
        (nbatch, ...) complex screens (cropped if requested).
    """
    sqrt_ps = jnp.asarray(sqrt_powerspec)
    cdtype = jnp.complex64 if sqrt_ps.dtype == jnp.float32 else jnp.complex128
    rand = complex_normal(key, (nbatch,) + sqrt_ps.shape, dtype=cdtype)
    rand = rand * (sqrt_ps * df)
    scr = ift2(rand, 1.0)  # reference scaling: ift2(rand * df, 1)
    if crop is not None:
        lo, hi = crop
        scr = scr[..., lo:hi, lo:hi]
    return scr


def pruned_ift2_matrix(N, lo, hi, dtype=jnp.complex64):
    """Slice of the centered inverse-DFT matrix for pruned synthesis.

    ``W[u, v] = exp(2j pi (u - N/2)(v - N/2) / N)`` for output rows
    ``u in [lo, hi)``. Applying it from both sides computes exactly the
    pupil-cropped rows/columns of ``ift2(X, 1)`` (same scaling), i.e. only
    ``Npup/N`` of the transform — as two thin matmuls that run on the MXU
    instead of the vector units. For ``Npup << N`` this is the fast path on
    TPU even though it does more arithmetic than an FFT.
    """
    u = np.arange(lo, hi) - N / 2
    v = np.arange(N) - N / 2
    W = np.exp(2j * np.pi * np.outer(u, v) / N)
    # host-side constant: embedded at trace time (avoids any device fetch)
    return W.astype(np.dtype(dtype))


def synthesize_screens_pruned(key, sqrt_powerspec, df, nbatch, W,
                              precision="highest"):
    """Pupil-cropped complex screens via pruned centered inverse DFT.

    Equivalent to ``synthesize_screens_complex(..., crop=(lo, hi))`` (up to
    matmul rounding) but MXU-resident: ``scr = W @ X @ W^T`` with ``X`` the
    colored noise. ``precision`` selects the TPU matmul pass count for
    float32 inputs ('highest' = full f32; 'high' = bf16x3, ~1e-6 relative
    phase error, statistically indistinguishable for Monte Carlo use).
    """
    prec = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[precision]
    sqrt_ps = jnp.asarray(sqrt_powerspec)
    cdtype = jnp.complex64 if sqrt_ps.dtype == jnp.float32 else jnp.complex128
    rand = complex_normal(key, (nbatch,) + sqrt_ps.shape, dtype=cdtype)
    rand = rand * (sqrt_ps * df)
    G = jnp.einsum("rk,bkm->brm", W, rand, precision=prec)
    return jnp.einsum("brm,cm->brc", G, W, precision=prec)


def column_factors(sqrt_powerspec, df, W, jitter=1e-10):
    """Per-column Cholesky factors of the pupil-row covariance.

    For pruned synthesis ``scr = W @ X @ W^T`` the intermediate
    ``G = W @ X`` has independent columns with covariance
    ``C_m = W diag((S[:, m] df)^2) W^H``. Drawing ``G[:, m] = L_m z_m``
    from the one-time Cholesky factors is *exactly* distribution-equivalent
    but needs ``Npup/N`` times fewer random numbers and ~3x fewer matmul
    FLOPs per screen. Host-side float64; returns (N, Npup, Npup) complex.
    """
    W = np.asarray(W, dtype=np.complex128)
    S = np.asarray(sqrt_powerspec, dtype=np.float64) * float(df)
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:  # pragma: no cover
        cpu = None
    import contextlib
    ctx = jax.default_device(cpu) if cpu else contextlib.nullcontext()
    with ctx:  # float64 factorisation stays on the CPU backend
        A = jnp.asarray(W[None, :, :] * S.T[:, None, :])  # (cols, Npup, N)
        # batched matmul + cholesky through XLA (~25x numpy on this host)
        C = jnp.matmul(A, jnp.conj(jnp.swapaxes(A, 1, 2)))
        tr = jnp.trace(C, axis1=-2, axis2=-1).real / C.shape[-1]
        # floor the jitter against the mean column power so fully-masked
        # columns (all-zero PSD) still factor
        tr = jnp.maximum(tr, tr.mean() * 1e-3 + 1e-300)
        eye = jnp.eye(C.shape[-1])
        L = jnp.linalg.cholesky(C + (jitter * tr)[:, None, None] * eye)
        return np.asarray(L)


@jax.jit
def _column_factors_device(s_scaled, w2, jitter):
    """Batched column-covariance Cholesky on the default device (f32).

    Complex tables cross the boundary as stacked (real, imag) floats.
    """
    W = jax.lax.complex(w2[0], w2[1])                  # (Npup, N) c64
    A = W[None, :, :] * s_scaled.T[:, None, :]         # (N, Npup, N)
    C = jnp.matmul(A, jnp.conj(jnp.swapaxes(A, 1, 2)),
                   precision=jax.lax.Precision.HIGHEST)
    tr = jnp.trace(C, axis1=-2, axis2=-1).real / C.shape[-1]
    tr = jnp.maximum(tr, tr.mean() * 1e-3 + 1e-30)
    eye = jnp.eye(C.shape[-1], dtype=C.dtype)
    L = jnp.linalg.cholesky(C + (jitter * tr)[:, None, None] * eye)
    return jnp.stack([L.real, L.imag])


def column_factors_device(sqrt_powerspec, df, W, jitter=3e-6, host=False):
    """Float32 colfac factorisation on the accelerator (or host XLA).

    ~30x faster than the host float64 path (the build is a batched matmul
    + Cholesky — MXU work); the f32 factors reproduce the column
    covariances to ~1e-6 relative, far below Monte Carlo resolution. Any
    non-finite column (ill-conditioned in f32 despite the scaled jitter)
    is detected by the caller, which falls back to the host float64 path.
    Returns (N, Npup, Npup) complex64.

    ``host=True`` computes the same f32 factorisation in pure
    numpy/BLAS: for large grids the accelerator round-trip is
    transfer-bound through the relay (1024²: ~63 s device compute +
    ~107 s fetching the 1.3 GB factor stack), so the engine routes big
    builds to the host. Deliberately NOT a CPU-backend jax program — a
    second-backend compile inside a live TPU-relay process can deadlock
    against the remote-compile intercept (observed in-bench).
    """
    if host:
        return _column_factors_numpy_f32(sqrt_powerspec, df, W, jitter)
    W = np.asarray(W)
    w2 = np.stack([W.real, W.imag]).astype(np.float32)
    s_scaled = (np.asarray(sqrt_powerspec) * float(df)).astype(np.float32)
    l2 = np.asarray(_column_factors_device(
        jnp.asarray(s_scaled), jnp.asarray(w2), jnp.float32(jitter)))
    return (l2[0] + 1j * l2[1]).astype(np.complex64)


def _column_factors_numpy_f32(sqrt_powerspec, df, W, jitter=3e-6):
    """Pure-numpy/BLAS f32 colfac factorisation.

    Same math as :func:`_column_factors_device`: per column,
    ``C_m = X_m X_m^H`` with ``X_m = W diag(S[:, m])`` via BLAS ``cherk``
    (hermitian rank-k — half the gemm FLOPs; only the lower triangle is
    formed, which is all LAPACK ``potrf``/``np.linalg.cholesky`` reads),
    scaled-jitter diagonal, Cholesky. The trace floor uses one sgemm:
    ``diag(C_m)_p = Σ_n |W[p,n]|² S[n,m]²``.
    """
    from scipy.linalg.blas import cherk

    W = np.ascontiguousarray(np.asarray(W, np.complex64))
    S = (np.asarray(sqrt_powerspec, np.float64) * float(df)).astype(
        np.float32)  # (N, ncols)
    npup = W.shape[0]
    ncols = S.shape[1]
    # per-column mean diagonal power, all columns in one sgemm
    trs = ((np.abs(W) ** 2) @ (S ** 2)).mean(axis=0).astype(np.float64)
    trs = np.maximum(trs, trs.mean() * 1e-3 + 1e-30)
    L = np.empty((ncols, npup, npup), np.complex64)
    for m in range(ncols):
        X = W * S[:, m]
        C = cherk(1.0, X, lower=1)
        # einsum view: writable diagonal regardless of BLAS memory order
        np.einsum("ii->i", C)[:] += np.float32(jitter * trs[m])
        try:
            L[m] = np.linalg.cholesky(C)
        except np.linalg.LinAlgError:
            # ill-conditioned in f32 despite the scaled jitter: mark the
            # column NaN (matching the device path's behaviour) so the
            # caller's finite-check falls back to the f64 factorisation
            L[m] = np.nan
    return L


def synthesize_screens_colfac(key, L, W, nbatch, precision="highest"):
    """Pupil-cropped complex screens from column-factored covariance.

    Statistically identical to :func:`synthesize_screens_pruned` (same
    Gaussian process), but the white noise is drawn directly in the
    (Npup x N) intermediate basis. ``L`` from :func:`column_factors`.
    """
    prec = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[precision]
    L = jnp.asarray(L)
    cdtype = L.dtype
    ncols, npup, _ = L.shape
    z = complex_normal(key, (nbatch, ncols, npup), dtype=cdtype)
    G = jnp.einsum("mpq,bmq->bpm", L, z, precision=prec)
    return jnp.einsum("bpm,cm->bpc", G, jnp.asarray(W, cdtype),
                      precision=prec)


def double_screens(scr):
    """Split complex screens into twice as many real ones (doubling trick)."""
    return jnp.concatenate([scr.real, scr.imag], axis=0)


def make_subharm_modes(subharm_fx, subharm_fy, N, dx, dtype=jnp.float64):
    """Complex exponential mode grids for the subharmonic levels.

    Returns (nlevels, 3, 3, N, N) complex modes ``exp(i(x fx + y fy))`` on
    the real-space grid of the main screen (``fast/funcs.py:225-246``).
    """
    D = dx * N
    coords = np.arange(-D / 2, D / 2, dx)
    if len(coords) == N + 1:
        coords = coords[:-1]
    x, y = np.meshgrid(coords, coords)
    fx = np.asarray(subharm_fx, dtype=np.dtype(dtype))  # (levels, 3, 3)
    fy = np.asarray(subharm_fy, dtype=np.dtype(dtype))
    phase = (x[None, None, None] * fx[..., None, None]
             + y[None, None, None] * fy[..., None, None])
    cdtype = np.complex64 if np.dtype(dtype) == np.float32 else np.complex128
    return np.exp(1j * phase).astype(cdtype)


def synthesize_subharm_complex(key, sqrt_powerspec_sh, df_sh, modes, nbatch,
                               crop=None):
    """Low-order subharmonic screens as a mode sum (einsum over 27 modes).

    Args:
        key: PRNG key.
        sqrt_powerspec_sh: (levels, 3, 3) float ``sqrt(PSD)`` on the
            subharmonic grids.
        df_sh: (levels,) frequency spacing per level.
        modes: output of :func:`make_subharm_modes`.
        nbatch: number of complex screens.
        crop: optional (lo, hi) pupil cut.

    Returns:
        (nbatch, ...) complex screens, mean-subtracted per screen
        (``fast/funcs.py:253``).
    """
    sqrt_ps = jnp.asarray(sqrt_powerspec_sh)
    cdtype = jnp.complex64 if sqrt_ps.dtype == jnp.float32 else jnp.complex128
    rand = complex_normal(key, (nbatch,) + sqrt_ps.shape, dtype=cdtype)
    weights = rand * (sqrt_ps * jnp.asarray(df_sh, sqrt_ps.dtype)[:, None, None])
    scr = jnp.einsum("bimn,imnxy->bxy", weights, modes.astype(cdtype))
    scr = scr - scr.mean(axis=(-2, -1), keepdims=True)
    if crop is not None:
        lo, hi = crop
        scr = scr[..., lo:hi, lo:hi]
    return scr


def synthesize_layer_screens(key, sqrt_powerspec_per_layer, df):
    """One real frozen-flow screen per layer (``fast/fast.py:611-614``)."""
    sqrt_ps = jnp.asarray(sqrt_powerspec_per_layer)
    cdtype = jnp.complex64 if sqrt_ps.dtype == jnp.float32 else jnp.complex128
    rand = complex_normal(key, sqrt_ps.shape, dtype=cdtype) * (sqrt_ps * df)
    return ift2(rand, 1.0).real


def sample_frozen_flow(screens, row_coords, col_coords):
    """Accumulate per-layer screen samples along the frozen-flow trajectory.

    Args:
        screens: (nlayers, N, N) periodic screens.
        row_coords: (nlayers, T, Npup) fractional row coordinates.
        col_coords: (nlayers, T, Npup) fractional column coordinates.

    Returns:
        (T, Npup, Npup) summed phase. Replaces the reference's double
        Python loop over layers x iterations with spline evaluation and
        wrap-roll bookkeeping (``fast/fast.py:619-633``): FFT screens are
        exactly periodic, so periodic bilinear gathers need no seam
        handling.
    """
    def per_layer(scr, rows, cols):
        return jax.vmap(lambda r, c: sample_grid_periodic(scr, r, c))(rows, cols)

    phs = jax.vmap(per_layer)(screens, row_coords, col_coords)  # (nl,T,Np,Np)
    return phs.sum(0)


def ar_flow_series(a, key, step_phasor, sqrt_psd_df, alpha, sqrt1ma, nsteps,
                   boiling):
    """Evolve the AR(1)-in-Fourier frozen-flow state by ``nsteps`` steps.

    Per Fourier mode kappa and layer l (Srinath et al. 2015,
    arXiv:1512.05424):

        a[t+1] = alpha_l * e^{i kappa . v_l dt} * a[t]
                 + sqrt(1 - alpha_l^2) * sqrt(PSD_l) df * zeta[t]

    The unit phasor is *exact* periodic translation on the fixed grid
    (replacing the reference's grid-grows-with-NITER screens,
    ``fast/fast.py:181-185,607-637``); ``alpha < 1`` adds per-mode boiling
    that also prevents the series from wrapping periodically. The
    stationary distribution equals the standard FFT screen draw for any
    ``alpha``.

    Args:
        a: (nlayers, N, N) complex state at the block start.
        key: PRNG key (consumed only when ``boiling``).
        step_phasor: (nlayers, N, N) complex ``e^{i kappa . v dt}``.
        sqrt_psd_df: (nlayers, N, N) real ``sqrt(PSD) * df``.
        alpha, sqrt1ma: (nlayers, 1, 1) AR factors.
        nsteps: static block length.
        boiling: static; False skips the noise draw entirely (pure frozen
            flow, ``alpha == 1``).

    Returns:
        (a_final, key_final, A) with ``A`` (nsteps, N, N) the layer-summed
        coefficients after each step.
    """
    def step(carry, _):
        a, k = carry
        a = step_phasor * a
        if boiling:
            k, sub = jax.random.split(k)
            z = complex_normal(sub, a.shape, dtype=a.dtype)
            a = alpha * a + sqrt1ma * (z * sqrt_psd_df)
        return (a, k), a.sum(0)

    (a, key), A = jax.lax.scan(step, (a, key), None, length=nsteps)
    return a, key, A


def ar_flow_couplings(a, key, step_phasor, sqrt_psd_df, alpha, sqrt1ma,
                      chi, W, pm, dx, norm, boiling, precision="highest"):
    """AR(1) frozen-flow step + pruned DFT + detector, fused per step.

    Same process as :func:`ar_flow_series` followed by the centered
    ``ift2`` + pupil crop + :func:`detector_coupling`, but the per-step
    screen is produced by the pruned inverse-DFT matmuls (MXU) and reduced
    to one complex coupling immediately — the scan never materialises the
    (nsteps, N, N) coefficient block in memory, so HBM traffic per step is
    a few floats instead of the full grid.

    Args:
        chi: (nsteps,) log-amplitude series for the block.
        W: (Npup, N) complex pruned inverse-DFT matrix
            (:func:`pruned_ift2_matrix`).
        pm: (Npup, Npup) pupil*mode weights.

    Returns:
        (a_final, key_final, out) with ``out`` (nsteps,) complex couplings
        already scaled by ``exp(chi) * dx^2 / norm``.
    """
    prec = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[precision]
    W = jnp.asarray(W)
    pm = jnp.asarray(pm)

    def step(carry, chi_t):
        a, k = carry
        a = step_phasor * a
        if boiling:
            k, sub = jax.random.split(k)
            z = complex_normal(sub, a.shape, dtype=a.dtype)
            a = alpha * a + sqrt1ma * (z * sqrt_psd_df)
        A = a.sum(0)
        G = jnp.einsum("rk,km->rm", W, A, precision=prec)
        phs = jnp.einsum("rm,cm->rc", G, W, precision=prec).real
        pc = detector_coupling(phs, pm, dx, norm)
        return (a, k), jnp.exp(chi_t).astype(pc.real.dtype) * pc

    (a, key), out = jax.lax.scan(step, (a, key), chi)
    return a, key, out


def detector_coupling(phs, pupil_mode, dx, normalisation):
    """Pupil-overlap reduction to one complex coupling per realization.

    ``sum(pupil * mode * exp(i phs)) * dx^2 / norm`` over the pupil cut
    (``fast/fast.py:647-657``).
    """
    pm = jnp.asarray(pupil_mode, dtype=phs.dtype)
    field = jax.lax.complex(jnp.cos(phs), jnp.sin(phs)) * pm
    return field.sum(axis=(-2, -1)) * (dx ** 2 / normalisation)


def draw_logamp(key, niter, logamp_var, temporal_powerspec=None,
                dtype=jnp.float32):
    """Log-amplitude draws for all iterations.

    iid ``N(0, logamp_var)``, or — in temporal mode — a series colored by
    the 1-D temporal log-amplitude PSD via a centered FT and scaled to the
    same total variance (``fast/funcs.py:358-375``).
    """
    if temporal_powerspec is None:
        r = jax.random.normal(key, (niter,), dtype=dtype)
        return r * jnp.sqrt(logamp_var).astype(dtype)
    ps = jnp.asarray(temporal_powerspec)
    r_fourier = complex_normal(
        key, (niter,),
        dtype=jnp.complex64 if dtype == jnp.float32 else jnp.complex128)
    r_fourier = r_fourier * jnp.sqrt(ps / ps.sum()).astype(r_fourier.dtype)
    r = ft(r_fourier, 1.0)
    return (r.real * jnp.sqrt(logamp_var)).astype(dtype)
