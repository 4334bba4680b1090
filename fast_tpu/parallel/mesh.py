"""Sharded Monte Carlo execution.

Realizations are independent, so the scaling strategy is pure data
parallelism over a 1-D ``mc`` mesh axis: every device draws its own slice
of the realization axis from a folded PRNG key and runs the identical
synthesis program; cross-device communication happens only in the final
statistics reduction (``psum`` of moments). This replaces nothing in the
reference — it had no distributed path at all (SURVEY.md §2.9).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..engine import FastResult
from .. import synthesis


def make_mesh(n=None, axis_name="mc", devices=None):
    """1-D device mesh over the Monte Carlo axis."""
    if devices is None:
        devices = jax.devices()
    if n is not None:
        devices = devices[:n]
    return Mesh(np.array(devices), (axis_name,))


def _build_shard_fn(sim, mesh, nchunks, b_local, axis_name="mc"):
    # reuse the engine's chunk program with a per-device batch size
    rng_impl = {"threefry": "threefry2x32"}.get(
        sim.params["RNG"], sim.params["RNG"])
    saved_b = sim.Niter_per_chunk
    sim.Niter_per_chunk = b_local
    try:
        # pin_tables=False: the factor stacks are pinned below with the
        # mesh-replicated sharding; a default-device pin inside
        # _chunk_body would be a dead second HBM copy
        chunk_body = sim._chunk_body(pin_tables=False)
    finally:
        sim.Niter_per_chunk = saved_b
    # colfac factor stacks ride as replicated traced arguments so the
    # program never embeds them. Re-pin them with the mesh-replicated
    # sharding here: the engine pins on the default device only, and a
    # sharding-mismatched input would be re-broadcast across the mesh
    # on EVERY call (the per-call-shipping defect this design removes)
    from jax.sharding import NamedSharding
    tables = tuple(jax.device_put(t, NamedSharding(mesh, P()))
                   for t in chunk_body.tables)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis_name)) + (P(),) * len(tables),
        out_specs=P(axis_name),
        # pallas_call's out_shape carries no varying-mesh-axes annotation
        check_vma=not sim._synth.startswith("pallas"))
    def shard_fn(key_data, chi, *tabs):
        key = jax.random.wrap_key_data(key_data, impl=rng_impl)
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        outs = []
        for i in range(nchunks):
            ki = jax.random.fold_in(key, i)
            outs.append(chunk_body(ki, chi[i * b_local:(i + 1) * b_local],
                                   *tabs))
        return jnp.concatenate(outs)

    jitted = jax.jit(shard_fn)
    if tables:
        return lambda key_data, chi: jitted(key_data, chi, *tables)
    return jitted


def run_sharded(sim, mesh=None, seed=None):
    """Run ``sim``'s Monte Carlo loop sharded over a device mesh.

    The global NITER realizations are split evenly across the mesh's
    devices; each device runs NCHUNKS jitted chunk programs with its own
    folded key. Returns a :class:`fast_tpu.engine.FastResult` over the
    gathered realizations, also stored on ``sim.result``.

    Temporal (frozen-flow) mode shards the *time* axis: the per-layer
    screens are generated identically on every device (same key), and each
    device samples its own contiguous time window, so the gathered series
    is sample-for-sample identical to the serial one — the sequence-
    parallel layout for long fading series (SURVEY.md §5.7).
    """
    if sim.temporal:
        return _run_sharded_temporal(sim, mesh, seed)

    if mesh is None:
        mesh = make_mesh()
    axis_name = mesh.axis_names[0]
    ndev = mesh.devices.size

    niter = sim.Niter
    nchunks = sim.Nchunks
    if niter % (ndev * nchunks) != 0:
        raise ValueError(
            f"NITER ({niter}) must be divisible by n_devices*NCHUNKS "
            f"({ndev}*{nchunks})")
    b_local = niter // (ndev * nchunks)
    if b_local % 2 != 0:
        raise ValueError("per-device chunk batch must be even "
                         "(Hermitian doubling)")

    from ..ops.rng import make_key
    key = make_key(seed if seed is not None else sim.seed,
                   impl=sim.params["RNG"])
    key_logamp, key_mc = jax.random.split(key)

    chi = synthesis.draw_logamp(key_logamp, niter, sim.logamp_var,
                                dtype=sim.dtype)

    # cache the built (jitted) shard program on the sim: rebuilding it
    # per call re-traces and re-embeds the closure tables every run
    from ..ops import pallas_synth
    layout = (pallas_synth.colfac_layout(
                  None, sim.Npxls_pup, sim.params["PRECISION"])
              if sim._synth == "pallas_colfac" else None)
    fn_key = (mesh, nchunks, b_local, axis_name, layout,
              getattr(sim, "_tables_version", 0))
    cached = getattr(sim, "_shard_fn_cache", None)
    if cached is None or cached[0] != fn_key:
        sim._shard_fn_cache = (
            fn_key, _build_shard_fn(sim, mesh, nchunks, b_local, axis_name))
    shard_fn = sim._shard_fn_cache[1]
    with mesh:
        out = shard_fn(jax.random.key_data(key_mc), chi)

    # summary moments + finite guard on device (collective reductions
    # under the mesh sharding); the gathered series materialises lazily —
    # on a pod the full-series fetch is the dominant host cost, exactly
    # as on the single-chip path (engine._run)
    from ..engine import Fast
    coherent = bool(sim.params["COHERENT"])
    if coherent:
        mr, mi, si, nbad = Fast._mc_stats_coherent(out)
        mean = complex(float(mr), float(mi))
    else:
        m, si, nbad = Fast._mc_stats_real(out)
        mean = float(m)
    if int(nbad):
        raise FloatingPointError(
            f"sharded Monte Carlo run produced {int(nbad)} non-finite "
            f"values over {out.shape[0]} iterates")
    sim.result = FastResult(out, sim.diffraction_limit, coherent=coherent,
                            moments=(mean, float(si)))
    return sim.result


def _run_sharded_temporal_ar_layers(sim, mesh, seed=None):
    """Layer-axis sharding of a (possibly boiling) AR frozen-flow series.

    The AR(1)-in-Fourier recursion is sequential in time but independent
    per turbulence layer, so the state shards over layers: each device
    evolves its local ``(L/ndev, N, N)`` Fourier block and a per-step
    ``psum`` over the mesh forms the layer-summed coefficients before the
    pruned DFT + detector (computed replicated — it is tiny next to the
    state update). This is the multi-device path for profiles whose AR
    state exceeds one chip's memory (e.g. 1024^2 x 16 layers), and the
    only parallel decomposition available when boiling noise makes the
    time axis sequential.
    """
    import functools as _ft

    from ..ops.rng import make_key
    from ..engine import FastResult

    if mesh is None:
        mesh = make_mesh()
    axis_name = mesh.axis_names[0]
    ndev = mesh.devices.size
    nlayers = len(sim.h)
    if nlayers % ndev != 0:
        raise ValueError(
            f"layer sharding needs nlayers ({nlayers}) divisible by "
            f"n_devices ({ndev})")
    l_local = nlayers // ndev

    dt = np.dtype(str(sim.dtype))
    cdt = np.complex64 if dt == np.float32 else np.complex128
    niter = sim.Niter

    spd = (np.asarray(sim._sqrt_psd_layers)
           * np.float64(sim.freq.main.df)).astype(dt)  # (L, N, N)
    v = np.asarray(sim.wind_vector, np.float64)
    fxm = np.asarray(sim.freq.main.fx, np.float64)
    fym = np.asarray(sim.freq.main.fy, np.float64)
    phase = (fxm[None] * v[:, 0, None, None]
             + fym[None] * v[:, 1, None, None]) * float(sim.dt)
    ph = np.exp(1j * np.angle(np.exp(1j * phase)))
    ph2 = np.stack([ph.real, ph.imag]).astype(dt)  # (2, L, N, N)
    alpha = np.asarray(sim._ar_alpha, dt)[:, None, None]
    sqrt1ma = np.sqrt(np.maximum(
        0.0, 1.0 - alpha.astype(np.float64) ** 2)).astype(dt)
    boiling = bool(np.any(np.asarray(sim._ar_alpha) < 1.0))
    W = synthesis.pruned_ift2_matrix(sim.Npxls, *sim.pup_crop, dtype=cdt)
    pm = sim._pm
    dx = sim.dx
    norm = sim._norm
    coherent = bool(sim.params["COHERENT"])
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[sim.params["PRECISION"]]

    key = make_key(seed if seed is not None else sim.seed,
                   impl=sim.params["RNG"])
    key_logamp, key_scr, _ = jax.random.split(key, 3)
    chi = synthesis.draw_logamp(
        key_logamp, niter, sim.logamp_var,
        temporal_powerspec=sim.temporal_logamp_powerspec, dtype=sim.dtype)
    rng_impl = {"threefry": "threefry2x32"}.get(
        sim.params["RNG"], sim.params["RNG"])

    @_ft.partial(shard_map, mesh=mesh,
                 in_specs=(P(), P(None, axis_name), P(axis_name),
                           P(axis_name), P(axis_name), P()),
                 out_specs=P())
    def shard_fn(key_data, ph2_l, spd_l, al_l, s1_l, chi_all):
        key = jax.random.wrap_key_data(key_data, impl=rng_impl)
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        kinit, knoise = jax.random.split(key)
        a = synthesis.complex_normal(kinit, spd_l.shape, dtype=cdt) * spd_l
        phasor = jax.lax.complex(ph2_l[0], ph2_l[1])

        def step(carry, chi_t):
            a, k = carry
            a = phasor * a
            if boiling:
                k, sub = jax.random.split(k)
                z = synthesis.complex_normal(sub, a.shape, dtype=a.dtype)
                a = al_l * a + s1_l * (z * spd_l)
            # layer sum across the mesh: the one collective per step.
            # The pruned DFT is linear, so each device transforms its
            # LOCAL layer partial and the psum moves the (P, P) pupil
            # field instead of the (N, N) Fourier field — 16x less
            # collective volume at 512²/P=128, and the dots become
            # distributed partial work instead of d redundant copies
            # (ARCHITECTURE.md "Collective cost model").
            Al = a.sum(0)
            G = jnp.einsum("rk,km->rm", W, Al, precision=prec)
            F = jnp.einsum("rm,cm->rc", G, W, precision=prec)
            phs = jax.lax.psum(F, axis_name).real
            pc = synthesis.detector_coupling(phs, jnp.asarray(pm), dx, norm)
            return (a, k), jnp.exp(chi_t).astype(pc.real.dtype) * pc

        _, out = jax.lax.scan(step, (a, knoise), chi_all)
        if not coherent:
            return jnp.abs(out) ** 2
        return jnp.stack([out.real, out.imag], axis=-1)

    with mesh:
        out = jax.jit(shard_fn)(
            jax.random.key_data(key_scr), jnp.asarray(ph2),
            jnp.asarray(spd), jnp.asarray(alpha), jnp.asarray(sqrt1ma),
            chi)

    from ..engine import Fast
    I = Fast._combine_complex(out, coherent)
    sim.result = FastResult(I, sim.diffraction_limit)
    return sim.result


def _run_sharded_temporal_ar(sim, mesh=None, seed=None):
    """Time-axis sharding of a pure frozen-flow AR series.

    With ``alpha == 1`` the AR(1)-in-Fourier state at step t is exactly
    ``a0 * phasor^t``, so each device jumps its window start directly
    (``exp(i * phase * offset)``) and runs its window locally — the
    gathered series is sample-identical to the serial one. Boiling
    (``alpha < 1``) makes the recursion genuinely sequential (per-step
    noise); those series shard over *layers* instead
    (:func:`_run_sharded_temporal_ar_layers`), or over configurations
    (``run_scan_sharded``).
    """
    import functools as _ft

    from ..ops.rng import make_key
    from ..engine import FastResult

    if np.any(np.asarray(sim._ar_alpha) < 1.0):
        return _run_sharded_temporal_ar_layers(sim, mesh, seed)
    if mesh is None:
        mesh = make_mesh()
    axis_name = mesh.axis_names[0]
    ndev = mesh.devices.size
    niter = sim.Niter
    if niter % ndev != 0:
        raise ValueError(
            f"NITER ({niter}) must be divisible by n_devices ({ndev})")
    t_local = niter // ndev

    key = make_key(seed if seed is not None else sim.seed,
                   impl=sim.params["RNG"])
    key_logamp, key_scr, _ = jax.random.split(key, 3)
    chi = synthesis.draw_logamp(
        key_logamp, niter, sim.logamp_var,
        temporal_powerspec=sim.temporal_logamp_powerspec, dtype=sim.dtype)

    dt = np.dtype(str(sim.dtype))
    cdt = np.complex64 if dt == np.float32 else np.complex128
    sqrt_psd_df = (sim._sqrt_psd_layers
                   * np.float64(sim.freq.main.df)).astype(dt)
    v = np.asarray(sim.wind_vector, np.float64)
    fxm = np.asarray(sim.freq.main.fx, np.float64)
    fym = np.asarray(sim.freq.main.fy, np.float64)
    phase64 = (fxm[None] * v[:, 0, None, None]
               + fym[None] * v[:, 1, None, None]) * float(sim.dt)
    step_phasor = np.exp(1j * phase64)
    W = synthesis.pruned_ift2_matrix(sim.Npxls, *sim.pup_crop, dtype=cdt)
    pm = sim._pm
    dx = sim.dx
    norm = sim._norm
    coherent = bool(sim.params["COHERENT"])
    precision = sim.params["PRECISION"]
    zeros = np.zeros((len(sim.h), 1, 1), dt)

    kinit, knoise = jax.random.split(key_scr)
    a0 = synthesis.complex_normal(
        kinit, sqrt_psd_df.shape, dtype=cdt) * sqrt_psd_df

    @_ft.partial(shard_map, mesh=mesh, in_specs=(P(), P(axis_name)),
                 out_specs=P(axis_name))
    def shard_fn(a0, chi_shard):
        w = jax.lax.axis_index(axis_name)
        # jump the recursion to this window's start; the accumulated angle
        # is wrapped in float64 *before* the working-precision cast so the
        # fractional cycle survives large offsets (no complex128 anywhere
        # — TPU backends lack it)
        off = (w * t_local).astype(jnp.float64)
        ang = jnp.mod(jnp.asarray(phase64) * off, 2 * np.pi).astype(dt)
        jump = jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
        a_start = a0 * jump.astype(a0.dtype)
        _, _, out = synthesis.ar_flow_couplings(
            a_start, knoise, jnp.asarray(step_phasor.astype(cdt)),
            jnp.asarray(sqrt_psd_df), jnp.asarray(zeros + 1),
            jnp.asarray(zeros), chi_shard, W, pm, dx, norm, False,
            precision=precision)
        if not coherent:
            return jnp.abs(out) ** 2
        return jnp.stack([out.real, out.imag], axis=-1)

    with mesh:
        out = jax.jit(shard_fn)(a0, chi)

    from ..engine import Fast
    I = Fast._combine_complex(out, coherent)
    sim.result = FastResult(I, sim.diffraction_limit)
    return sim.result


def _run_sharded_temporal(sim, mesh=None, seed=None):
    """Time-axis sharding of one frozen-flow series (see run_sharded)."""
    import functools as _ft

    from ..ops.rng import make_key
    from ..engine import FastResult

    if getattr(sim, "_temporal_synth", "screens") == "ar":
        return _run_sharded_temporal_ar(sim, mesh, seed)
    if mesh is None:
        mesh = make_mesh()
    axis_name = mesh.axis_names[0]
    ndev = mesh.devices.size

    niter = sim.Niter
    if niter % ndev != 0:
        raise ValueError(
            f"NITER ({niter}) must be divisible by n_devices ({ndev})")
    # each device samples its whole window in one gather (NCHUNKS does not
    # apply here); per-device memory is O(t_local * Npup^2)
    t_local = niter // ndev

    key = make_key(seed if seed is not None else sim.seed,
                   impl=sim.params["RNG"])
    key_logamp, key_scr, _ = jax.random.split(key, 3)

    # the colored log-amplitude series couples all timesteps: draw once
    chi = synthesis.draw_logamp(
        key_logamp, niter, sim.logamp_var,
        temporal_powerspec=sim.temporal_logamp_powerspec, dtype=sim.dtype)

    screens = synthesis.synthesize_layer_screens(
        key_scr, sim._sqrt_psd_layers, float(sim.freq.main.df))

    dx = sim.dx
    coherent = bool(sim.params["COHERENT"])
    norm = sim._norm
    pm = sim._pm
    dt = np.dtype(str(sim.dtype))
    # global per-step trajectory, step 0..t_local-1 for the local window;
    # per-device offset = window index * per-step shift * t_local
    dts = (np.arange(1, t_local + 1) * sim.dt).astype(dt)
    shifts_local = (dts * sim.wind_vector[..., np.newaxis] / dx).astype(dt)
    base_local = (sim.pup_coords[np.newaxis, :, np.newaxis, :].astype(dt)
                  + shifts_local[:, :, :, np.newaxis])  # (nl, 2, T_loc, Np)
    step_shift = (sim.wind_vector * sim.dt / dx).astype(dt)  # (nl, 2)

    @_ft.partial(shard_map, mesh=mesh, in_specs=(P(), P(axis_name)),
                 out_specs=P(axis_name))
    def shard_fn(screens, chi_shard):
        w = jax.lax.axis_index(axis_name).astype(dt)
        off = w * t_local
        rows = base_local[:, 0] + (off * step_shift[:, 0])[:, None, None]
        cols = base_local[:, 1] + (off * step_shift[:, 1])[:, None, None]
        phs = synthesis.sample_frozen_flow(screens, rows, cols)
        pc = synthesis.detector_coupling(phs, pm, dx, norm)
        out = jnp.exp(chi_shard).astype(pc.real.dtype) * pc
        if not coherent:
            return jnp.abs(out) ** 2
        return jnp.stack([out.real, out.imag], axis=-1)

    with mesh:
        out = jax.jit(shard_fn)(screens, chi)

    from ..engine import Fast
    I = Fast._combine_complex(out, coherent)
    sim.result = FastResult(I, sim.diffraction_limit)
    return sim.result


def sharded_moments(values, mesh=None, axis_name="mc"):
    """First four moments of a (possibly sharded) realization array via psum.

    Demonstrates the reduction pattern for fleet-scale statistics: each
    device reduces its shard locally; only four scalars cross the ICI.
    """
    if mesh is None:
        mesh = make_mesh()

    @functools.partial(shard_map, mesh=mesh, in_specs=P(axis_name),
                       out_specs=P())
    def moments(x):
        n = jax.lax.psum(jnp.asarray(x.shape[0], jnp.float32), axis_name)
        s1 = jax.lax.psum(x.sum(), axis_name)
        s2 = jax.lax.psum((x ** 2).sum(), axis_name)
        s3 = jax.lax.psum((x ** 3).sum(), axis_name)
        s4 = jax.lax.psum((x ** 4).sum(), axis_name)
        return jnp.stack([s1, s2, s3, s4]) / n

    with mesh:
        return np.asarray(moments(jnp.asarray(values)))
