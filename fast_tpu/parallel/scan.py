"""Parameter-scan sharding: a batch of link configurations x Monte Carlo.

The reference's orbit sweep builds N independent simulations and runs them
serially (``fast/complete_orbit_simulation.py:217-228``). Here the sweep
becomes the second mesh axis: configurations (orbit samples, zenith/r0/wind
grid points) shard over ``scan`` while realizations shard over ``mc``.
Every device runs the identical jitted program on its (config-block,
realization-block); no communication is needed until statistics are
reduced. This is the layout for pod-scale scans (BASELINE.json config 5) —
``scan`` maps naturally across pod slices (DCN), ``mc`` within a slice
(ICI).
"""

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..engine import FastResult
from ..ops.rng import make_key
from .. import synthesis

logger = logging.getLogger(__name__)


def make_scan_mesh(n_scan, n_mc, devices=None):
    """2-D ``(scan, mc)`` device mesh."""
    if devices is None:
        devices = jax.devices()
    devices = np.array(devices[: n_scan * n_mc]).reshape(n_scan, n_mc)
    return Mesh(devices, ("scan", "mc"))


def run_scan_sharded(sims, mesh, seed=None):
    """Run a batch of same-geometry simulations over a ``(scan, mc)`` mesh.

    Supported synthesis paths: ``fft`` / ``matmul`` / ``colfac`` (any
    backend) and ``pallas_fused`` / ``pallas_colfac`` (TPU —
    per-configuration tables stream through ``shard_map`` into the fused
    kernels; the colfac factor stacks ship prepadded, bf16 at
    PRECISION='default'). Temporal configurations (AR and grown-grid
    screens mode) shard one ordered series per configuration over the
    ``scan`` axis (mc must be 1).

    Args:
        sims: list of initialised :class:`fast_tpu.Fast` objects sharing
            grid geometry (same NPXLS/DX/pupil/NITER; PSDs may differ —
            e.g. one per orbit sample). ``len(sims)`` must be divisible by
            the mesh's scan dimension, ``NITER`` by ``n_mc * NCHUNKS``.
        mesh: mesh from :func:`make_scan_mesh`.
        seed: overrides the first sim's seed.

    Returns:
        list of :class:`FastResult`, one per sim (also stored on each sim).
    """
    s0 = sims[0]
    if s0.temporal:
        if getattr(s0, "_temporal_synth", "screens") == "ar":
            return _run_scan_sharded_temporal_ar(sims, mesh, seed)
        return _run_scan_sharded_temporal_screens(sims, mesh, seed)
    synth_override = None
    if s0._synth == "pallas":
        if all(s.params.get("SYNTH") == "auto" for s in sims):
            synth_override = "matmul"
        else:
            raise NotImplementedError(
                "scan sharding supports SYNTH 'fft'|'matmul'|'colfac'|"
                "'pallas_fused'|'pallas_colfac'; the screens-out 'pallas' "
                "kernel is not scan-shardable — use a fused kernel "
                "(or 'colfac')")
    if (s0._synth in ("pallas_fused", "pallas_colfac")
            and jax.default_backend() != "tpu"):
        if all(s.params.get("SYNTH") == "auto" for s in sims):
            synth_override = "matmul"
        else:
            raise NotImplementedError(
                f"SYNTH='{s0._synth}' scans need a TPU backend (the fused "
                "kernels have no CPU lowering); use 'matmul' or 'colfac'")
    for s in sims[1:]:
        if (s.Npxls, s.Npxls_pup, s.Niter, s.Nchunks) != (
                s0.Npxls, s0.Npxls_pup, s0.Niter, s0.Nchunks):
            raise ValueError("sims must share grid geometry and NITER")
        if (s._synth, s.subharmonics) != (s0._synth, s0.subharmonics):
            raise ValueError("sims must share SYNTH and SUBHARM settings")

    n_scan, n_mc = mesh.devices.shape
    nsims = len(sims)
    if nsims % n_scan != 0:
        raise ValueError(f"len(sims) ({nsims}) must divide by the scan "
                         f"mesh dimension ({n_scan})")
    niter = s0.Niter
    nchunks = s0.Nchunks
    if niter % (n_mc * nchunks) != 0:
        raise ValueError(
            f"NITER ({niter}) must be divisible by n_mc*NCHUNKS "
            f"({n_mc}*{nchunks})")
    b_local = niter // (n_mc * nchunks)
    if b_local % 2 != 0:
        raise ValueError("per-device chunk batch must be even")

    df = float(s0.freq.main.df)
    dx = s0.dx
    crop = s0.pup_crop
    coherent = bool(s0.params["COHERENT"])
    synth = synth_override or s0._synth
    subharm = bool(s0.subharmonics)
    precision = s0.params["PRECISION"]
    mc_noise = s0.params.get("MC_NOISE", "gauss")
    dt = np.dtype(str(s0.dtype))

    # Device-resident table cache: a repeat scan over the same sims/mesh
    # reuses the device-put table pytree instead of re-shipping the
    # (possibly 100+ MB) factor stacks host->device on every call. Keyed
    # on each sim's `_uid` (monotonic — unlike id(), never recycled by
    # the allocator) + ``_tables_version`` (bumped whenever a sim's
    # tables regenerate) so replaced or mutated sims never reuse stale
    # tables, and on the colfac kernel layout (env-switchable).
    from ..ops import pallas_synth as _ps
    layout = (_ps.colfac_layout(None, s0.Npxls_pup, precision)
              if synth == "pallas_colfac" else None)
    cache_key = (mesh, synth, subharm, precision, mc_noise, b_local,
                 layout,
                 tuple((getattr(s, "_uid", id(s)),
                        getattr(s, "_tables_version", 0)) for s in sims))
    cached = getattr(s0, "_scan_device_cache", None)
    if cached is not None and cached[0] == cache_key:
        C, pc_tiles = cached[1], cached[2]
    else:
        C, pc_tiles = _build_scan_tables(
            sims, synth, subharm, precision, mc_noise, b_local, dt)
        C = _device_put_tables(C, mesh)
        s0._scan_device_cache = (cache_key, C, pc_tiles)

    key = make_key(seed if seed is not None else s0.seed,
                   impl=s0.params["RNG"])

    local_sims = nsims // n_scan
    rng_impl = {"threefry": "threefry2x32"}.get(
        s0.params["RNG"], s0.params["RNG"])

    with mesh:
        out = _scan_program(
            jax.random.key_data(key), C, mesh=mesh, synth=synth,
            subharm=subharm, coherent=coherent, precision=precision,
            mc_noise=mc_noise, nchunks=nchunks, b_local=b_local,
            local_sims=local_sims, crop=crop, df=df, dx=float(dx),
            rng_impl=rng_impl, pc_tiles=pc_tiles, dtype=str(s0.dtype))

    from ..engine import Fast
    out = Fast._combine_complex(out, coherent)
    results = []
    for i, s in enumerate(sims):
        s.result = FastResult(out[i], s.diffraction_limit)
        results.append(s.result)
    return results


def _build_scan_tables(sims, synth, subharm, precision, mc_noise, b_local,
                       dt):
    """Assemble the host-side per-sim table pytree for one scan program.

    All per-sim tables ship in one traced pytree through a module-level
    jitted program — repeat scans with the same geometry are jit cache
    hits (no Python re-trace), and the log-amplitude series is drawn
    in-graph per device. Shared tables (same grid geometry) ship once;
    per-sim complex tables ship as stacked (real, imag) floats — complex
    arrays cannot cross program boundaries on all TPU runtimes.
    """
    s0 = sims[0]
    W = s0._W_pruned if synth in ("matmul", "colfac") else None
    W_pf = s0._W_pruned if synth == "pallas_fused" else None
    pc_tiles = None
    w2_colfac = None
    if synth == "colfac":
        Ls = np.stack([np.asarray(s._L_colfac) for s in sims])
        l2 = np.stack([Ls.real, Ls.imag]).astype(dt)  # (2, nsims, N, Np, Np)
    elif synth == "pallas_colfac":
        # per-sim factor tables streamed through the mesh as prepadded
        # (bf16 at PRECISION='default') stacks; W columns are shared.
        # Packed tables cache on the sim — repeat scans skip the
        # pad/fold host work
        from ..ops import pallas_synth
        layout = pallas_synth.colfac_layout(
            None, s0.Npxls_pup, precision)
        pack = (pallas_synth.colfac_pack_tables_merged
                if layout == "merged" else pallas_synth.colfac_pack_tables)
        packed = []
        for s in sims:
            key_pk = (precision, mc_noise, layout,
                      getattr(s, "_tables_version", 0))
            cache = getattr(s, "_colfac_packed", None)
            if cache is None or cache[0] != key_pk:
                s._colfac_packed = (key_pk, pack(
                    np.asarray(s._L_colfac), np.asarray(s._W_pruned),
                    precision, noise=mc_noise))
            packed.append(s._colfac_packed[1])
        if layout == "merged":
            # (1, nsims, ncols, 2P, 2P): dummy leading axis so the sims
            # stay on axis 1 (the shard_map spec shards axis 1)
            l2 = np.stack([t[0] for t in packed])[None]
            ncols = l2.shape[2]
            pc_tiles = pallas_synth.colfac_tile_select_merged(
                b_local // 2, ncols, s0.Npxls_pup, precision)
        else:
            # (2, nsims, ncols, P, P): sims on axis 1 like the colfac layout
            l2 = np.stack([t[0] for t in packed], axis=1)
            pc_tiles = pallas_synth.colfac_tile_select(
                b_local // 2, l2.shape[2], s0.Npxls_pup, precision)
        w2_colfac = packed[0][1]
    else:
        l2 = np.zeros((2, len(sims), 0), dt)
    if subharm:
        sqrt_psd_shs = np.stack([s._sqrt_psd_sh for s in sims])
        sh_modes = s0._sh_modes  # shared grid -> shared mode tables
        sh_df = s0._sh_df
    else:
        sqrt_psd_shs = np.zeros((len(sims), 0), dt)

    sqrt_psds = np.stack([s._sqrt_psd for s in sims])  # (nsims, N, N)
    pms = np.stack([s._pm for s in sims])
    norms = np.asarray([s._norm for s in sims], np.float32)

    C = dict(sqrt_psds=sqrt_psds, pms=pms, norms=norms, l2=l2,
             sqrt_psd_shs=sqrt_psd_shs,
             logamp_vars=np.asarray([s.logamp_var for s in sims], dt))
    if synth in ("matmul", "colfac"):
        Wb = np.asarray(W)
        C["w2"] = np.stack([Wb.real, Wb.imag]).astype(dt)
    if synth == "pallas_fused":
        Wb = np.asarray(W_pf)
        C["wpf2"] = np.stack([Wb.real, Wb.imag]).astype(np.float32)
    if synth == "pallas_colfac":
        C["w2c"] = w2_colfac
    if subharm:
        M = np.asarray(sh_modes)
        C["sh_modes2"] = np.stack([M.real, M.imag]).astype(dt)
        C["sh_df"] = np.asarray(sh_df, dt)
    return C, pc_tiles


# sharding specs of the per-sim tables inside the scan program: sims live
# on the ``scan`` mesh axis (axis 0, except the factor stack's axis 1);
# everything else is replicated. ``_device_put_tables`` pins each table
# on device with exactly the layout the shard_map consumes, so a cached
# repeat call transfers nothing.
_SCAN_TABLE_SPECS = {
    "sqrt_psds": P("scan"), "pms": P("scan"), "norms": P("scan"),
    "logamp_vars": P("scan"), "sqrt_psd_shs": P("scan"),
    "l2": P(None, "scan"),
}


def _device_put_tables(C, mesh):
    from jax.sharding import NamedSharding
    return {
        k: jax.device_put(v, NamedSharding(mesh,
                                           _SCAN_TABLE_SPECS.get(k, P())))
        for k, v in C.items()
    }


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "synth", "subharm", "coherent", "precision",
                     "mc_noise", "nchunks", "b_local", "local_sims", "crop",
                     "df", "dx", "rng_impl", "pc_tiles", "dtype"))
def _scan_program(key_data, C, *, mesh, synth, subharm, coherent, precision,
                  mc_noise, nchunks, b_local, local_sims, crop, df, dx,
                  rng_impl, pc_tiles, dtype):
    """The whole parameter scan as one shared jitted program.

    ``C`` carries every per-sim array (sqrt PSDs, pupil*mode tables,
    norms, colfac factor stacks, subharmonic spectra, log-amplitude
    variances) plus the shared complex tables as stacked (real, imag)
    floats. One compilation serves every scan with the same shapes and
    flags; the log-amplitude series draws in-graph per (scan, mc, sim).
    """
    dt = jnp.dtype(dtype)
    niter_local = nchunks * b_local
    W = jax.lax.complex(C["w2"][0], C["w2"][1]) if "w2" in C else None
    W_pf = (jax.lax.complex(C["wpf2"][0], C["wpf2"][1])
            if "wpf2" in C else None)
    if subharm:
        sh_modes = jax.lax.complex(C["sh_modes2"][0], C["sh_modes2"][1])
        sh_df = C["sh_df"]

    def chunk_body(key, chi_c, sqrt_psd, pm, norm, l2_s, sps_sh):
        kmain, ksub = jax.random.split(key)
        if synth in ("pallas_fused", "pallas_colfac"):
            from ..ops import pallas_synth
            seed = jax.random.bits(kmain, (), "uint32").astype(jnp.int32)
            sh = None
            if subharm:
                sh = pallas_synth.pad_subharm_screens(
                    synthesis.synthesize_subharm_complex(
                        ksub, sps_sh, sh_df, sh_modes, b_local // 2,
                        crop=crop), pm.shape[0])
            if synth == "pallas_colfac":
                # merged-layout stacks carry a dummy leading axis of 1
                # (split stacks lead with the (real, imag) axis of 2)
                l2_k = l2_s[0] if l2_s.shape[0] == 1 else l2_s
                c = pallas_synth.fused_colfac_detect_packed(
                    seed, l2_k, C["w2c"], pm, b_local // 2,
                    *pc_tiles, precision=precision, subharm_screens=sh,
                    noise=mc_noise)
            else:
                c = pallas_synth.fused_synthesis_detect(
                    seed, sqrt_psd, df, b_local // 2, W_pf, pm,
                    precision=precision, subharm_screens=sh,
                    noise=mc_noise)
            pc = jax.lax.complex(c[:, 0], c[:, 1]) * (dx ** 2)
            out = jnp.exp(chi_c).astype(jnp.float32) * pc / norm
            if not coherent:
                return jnp.abs(out) ** 2
            return jnp.stack([out.real, out.imag], axis=-1)
        if synth == "colfac":
            L = jax.lax.complex(l2_s[0], l2_s[1])
            scr = synthesis.synthesize_screens_colfac(
                kmain, L, W, b_local // 2, precision=precision)
        elif synth == "matmul":
            scr = synthesis.synthesize_screens_pruned(
                kmain, sqrt_psd, df, b_local // 2, W, precision=precision)
        else:
            scr = synthesis.synthesize_screens_complex(
                kmain, sqrt_psd, df, b_local // 2, crop=crop)
        if subharm:
            scr = scr + synthesis.synthesize_subharm_complex(
                ksub, sps_sh, sh_df, sh_modes, b_local // 2, crop=crop)
        phs = synthesis.double_screens(scr)
        pc = synthesis.detector_coupling(phs, pm, dx, norm)
        out = jnp.exp(chi_c).astype(pc.real.dtype) * pc
        if not coherent:
            return jnp.abs(out) ** 2
        return jnp.stack([out.real, out.imag], axis=-1)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P("scan"), P("scan"), P("scan"), P("scan"),
                  P(None, "scan"), P("scan")),
        out_specs=P("scan", "mc"),
        # pallas_call's out_shape carries no varying-mesh-axes annotation
        check_vma=not synth.startswith("pallas"))
    def shard_fn(key_data, sqrt_psd, pm, norm, lvar, l2_l, sps_sh_l):
        key = jax.random.wrap_key_data(key_data, impl=rng_impl)
        key = jax.random.fold_in(key, jax.lax.axis_index("scan"))
        key = jax.random.fold_in(key, jax.lax.axis_index("mc"))
        outs = []
        for s in range(local_sims):
            k_chi, ks = jax.random.split(jax.random.fold_in(key, s))
            chi_l = synthesis.draw_logamp(k_chi, niter_local, lvar[s],
                                          dtype=dt)
            rows = []
            for i in range(nchunks):
                ki = jax.random.fold_in(ks, i)
                rows.append(chunk_body(
                    ki, chi_l[i * b_local:(i + 1) * b_local],
                    sqrt_psd[s], pm[s], norm[s], l2_l[:, s], sps_sh_l[s]))
            outs.append(jnp.concatenate(rows))
        return jnp.stack(outs)

    return shard_fn(key_data, C["sqrt_psds"], C["pms"], C["norms"],
                    C["logamp_vars"], C["l2"], C["sqrt_psd_shs"])


# configs whose series-batched AR kernel failed Mosaic compilation this
# process — skip straight to the per-series fallback on repeat calls
_AR_BATCH_COMPILE_FAILED = set()

# per-sim tables of the temporal AR scan program: sims on the ``scan``
# axis; the pruned-DFT matrix and dx are shared/replicated.
_TEMPORAL_TABLE_SPECS = {
    "spds": P("scan"), "ph2": P("scan"), "pms": P("scan"),
    "norms": P("scan"), "alphas": P("scan"), "s1mas": P("scan"),
    "lavars": P("scan"), "tps": P("scan"),
}


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "use_batch", "boiling", "coherent",
                     "precision", "noise_kind", "local_sims", "rng_impl",
                     "nsteps", "has_tps", "dtype"))
def _temporal_ar_program(key_data, C, *, mesh, use_batch, boiling, coherent,
                         precision, noise_kind, local_sims, rng_impl,
                         nsteps, has_tps, dtype):
    """The whole sharded temporal-AR scan as one shared jitted program.

    ``C`` carries every per-sim table device-resident (see
    ``_TEMPORAL_TABLE_SPECS``); per call only the RNG key ships. The
    log-amplitude series draw in-graph (vmapped over sims).
    """
    from ..ops import pallas_synth
    dt = jnp.dtype(dtype)
    cdt = jnp.complex64 if dt == jnp.float32 else jnp.complex128
    W = jax.lax.complex(C["w2"][0], C["w2"][1])
    dx = C["dx"]
    key = jax.random.wrap_key_data(key_data, impl=rng_impl)
    key_logamp, key_scr = jax.random.split(key)
    nsims = C["spds"].shape[0]
    keys_la = jax.vmap(lambda i: jax.random.fold_in(key_logamp, i))(
        jnp.arange(nsims))
    if has_tps:
        chi = jax.vmap(lambda k, v, ps: synthesis.draw_logamp(
            k, nsteps, v, temporal_powerspec=ps, dtype=dt))(
            keys_la, C["lavars"], C["tps"])
    else:
        chi = jax.vmap(lambda k, v: synthesis.draw_logamp(
            k, nsteps, v, dtype=dt))(keys_la, C["lavars"])

    def shard_fn(key_data_scr, spd_l, ph2_l, pm_l, norm_l, al_l, s1_l,
                 chi_l):
        key = jax.random.wrap_key_data(key_data_scr, impl=rng_impl)
        key = jax.random.fold_in(key, jax.lax.axis_index("scan"))
        if use_batch:
            kinit, knoise = jax.random.split(key)
            a0 = synthesis.complex_normal(
                kinit, spd_l.shape, dtype=cdt) * spd_l  # (B, L, N, N)
            phasor = (jax.lax.complex(ph2_l[:, 0], ph2_l[:, 1])
                      * al_l.astype(cdt))
            ns = s1_l * spd_l if boiling else None
            seed = jax.random.bits(knoise, (), "uint32").astype(jnp.int32)
            c, _ = pallas_synth.ar_flow_fused_batch(
                seed, a0, phasor, ns, W, pm_l, chi_l.shape[-1],
                precision=precision, noise=noise_kind)
            pc = jax.lax.complex(c[..., 0], c[..., 1]).T  # (B, nsteps)
            out = (jnp.exp(chi_l).astype(jnp.float32) * pc
                   * (dx ** 2) / norm_l[:, None])
            if not coherent:
                return jnp.abs(out) ** 2
            return jnp.stack([out.real, out.imag], axis=-1)
        outs = []
        for s in range(local_sims):
            kinit, knoise = jax.random.split(jax.random.fold_in(key, s))
            spd = spd_l[s]
            a0 = synthesis.complex_normal(kinit, spd.shape, dtype=cdt) * spd
            phasor = jax.lax.complex(ph2_l[s, 0], ph2_l[s, 1])
            _, _, out = synthesis.ar_flow_couplings(
                a0, knoise, phasor, spd, al_l[s], s1_l[s], chi_l[s], W,
                pm_l[s], dx, norm_l[s], boiling, precision=precision)
            if not coherent:
                outs.append(jnp.abs(out) ** 2)
            else:
                outs.append(jnp.stack([out.real, out.imag], axis=-1))
        return jnp.stack(outs)

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P("scan"), P("scan"), P("scan"), P("scan"),
                  P("scan"), P("scan"), P("scan")),
        out_specs=P("scan"),
        # pallas_call's out_shape carries no varying-mesh-axes annotation
        check_vma=not use_batch)
    return fn(jax.random.key_data(key_scr), C["spds"], C["ph2"], C["pms"],
              C["norms"], C["alphas"], C["s1mas"], chi)


# per-sim tables of the temporal screens scan program (sims on ``scan``)
_TEMPORAL_SCREENS_TABLE_SPECS = {
    "spls": P("scan"), "base0": P("scan"), "shifts": P("scan"),
    "pms": P("scan"), "norms": P("scan"), "lavars": P("scan"),
    "tps": P("scan"),
}


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "coherent", "local_sims", "rng_impl",
                     "nchunks", "B", "has_tps", "dtype"))
def _temporal_screens_program(key_data, C, *, mesh, coherent, local_sims,
                              rng_impl, nchunks, B, has_tps, dtype):
    """Sharded frozen-flow (grown-grid screens) scan as one jitted program.

    Per local sim: synthesize the layer screens once, then scan the
    chunk-affine trajectory exactly like the solo program
    (``engine._run_all_temporal_screens``). Per-sim tables stay
    device-resident in ``C``; only the RNG key ships per call.
    """
    dt = jnp.dtype(dtype)
    df, dx = C["df"], C["dx"]
    key = jax.random.wrap_key_data(key_data, impl=rng_impl)
    key_logamp, key_scr = jax.random.split(key)
    nsims = C["spls"].shape[0]
    keys_la = jax.vmap(lambda i: jax.random.fold_in(key_logamp, i))(
        jnp.arange(nsims))
    niter = nchunks * B
    if has_tps:
        chi = jax.vmap(lambda k, v, ps: synthesis.draw_logamp(
            k, niter, v, temporal_powerspec=ps, dtype=dt))(
            keys_la, C["lavars"], C["tps"])
    else:
        chi = jax.vmap(lambda k, v: synthesis.draw_logamp(
            k, niter, v, dtype=dt))(keys_la, C["lavars"])

    def shard_fn(key_data_scr, spl_l, base0_l, shift_l, pm_l, norm_l,
                 chi_l):
        key = jax.random.wrap_key_data(key_data_scr, impl=rng_impl)
        key = jax.random.fold_in(key, jax.lax.axis_index("scan"))
        outs = []
        for s in range(local_sims):
            screens = synthesis.synthesize_layer_screens(
                jax.random.fold_in(key, s), spl_l[s], df)
            base0 = base0_l[s]
            shift = shift_l[s]

            def body(c, inp, screens=screens, base0=base0, shift=shift,
                     pm=pm_l[s], norm=norm_l[s]):
                i, chi_i = inp
                rows = base0[:, 0] + i * shift[:, 0, None, None]
                cols = base0[:, 1] + i * shift[:, 1, None, None]
                phs = synthesis.sample_frozen_flow(screens, rows, cols)
                pc = synthesis.detector_coupling(phs, pm, dx, norm)
                out = jnp.exp(chi_i).astype(pc.real.dtype) * pc
                if not coherent:
                    return c, jnp.abs(out) ** 2
                return c, jnp.stack([out.real, out.imag], axis=-1)

            idx = jnp.arange(nchunks, dtype=dt)
            _, o = jax.lax.scan(body, 0,
                                (idx, chi_l[s].reshape((nchunks, B))))
            outs.append(o.reshape((nchunks * B,) + o.shape[2:]))
        return jnp.stack(outs)

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P("scan"), P("scan"), P("scan"), P("scan"),
                  P("scan"), P("scan")),
        out_specs=P("scan"))
    return fn(jax.random.key_data(key_scr), C["spls"], C["base0"],
              C["shifts"], C["pms"], C["norms"], chi)


def _run_scan_sharded_temporal_screens(sims, mesh, seed=None):
    """Shard independent frozen-flow screens-mode series over ``scan``.

    Closes the last ``NotImplementedError`` in the parallel layer
    (VERDICT r4 #5): each screens-mode sim is fully independent (its
    screens synthesize once from its own PSD; the chunk trajectory is
    affine in the chunk index), so configuration-axis sharding is the
    natural layout — an orbit pass of short screens-mode series runs one
    series per scan device. Requires a shared (explicit) grid: the
    grown-grid no-wrap rule only varies the grid under NPXLS='auto',
    which :func:`fast_tpu.sweep.build_sweep` already forbids for sweeps.
    """
    s0 = sims[0]
    n_scan, n_mc = mesh.devices.shape
    if n_mc != 1:
        raise ValueError(
            "temporal scan sharding needs an (n_scan, 1) mesh: one ordered "
            "series per configuration has no mc axis")
    nsims = len(sims)
    if nsims % n_scan != 0:
        raise ValueError(f"len(sims) ({nsims}) must divide by the scan "
                         f"mesh dimension ({n_scan})")
    for s in sims[1:]:
        if (s.Npxls, s.Npxls_pup, s.Niter, s.Nchunks) != (
                s0.Npxls, s0.Npxls_pup, s0.Niter, s0.Nchunks):
            raise ValueError(
                "sims must share grid geometry, NITER and NCHUNKS "
                "(screens mode: pass explicit NPXLS so the grown grids "
                "match)")
        if s._temporal_synth != "screens":
            raise ValueError("sims must all use TEMPORAL_SYNTH='screens'")
    has_tps = s0.temporal_logamp_powerspec is not None
    for s in sims[1:]:
        if (s.temporal_logamp_powerspec is not None) != has_tps:
            raise ValueError(
                "sims must agree on temporal logamp powerspec presence")

    dt = np.dtype(str(s0.dtype))
    coherent = bool(s0.params["COHERENT"])
    local_sims = nsims // n_scan
    rng_impl = {"threefry": "threefry2x32"}.get(
        s0.params["RNG"], s0.params["RNG"])

    cache_key = (mesh, coherent, s0.Niter, s0.Nchunks, has_tps, str(dt),
                 tuple((getattr(s, "_uid", id(s)),
                        getattr(s, "_tables_version", 0)) for s in sims))
    cached = getattr(s0, "_temporal_screens_scan_cache", None)
    if cached is not None and cached[0] == cache_key:
        C = cached[1]
    else:
        def tables(s):
            base0 = (s.pup_coords[np.newaxis, :, np.newaxis, :]
                     .astype(float)
                     + s.pixel_shifts[:, :, :, np.newaxis]).astype(dt)
            shift = s.pixel_shifts[:, :, -1].astype(dt)
            return s._sqrt_psd_layers.astype(dt), base0, shift

        spls, base0s, shifts = (np.stack(x)
                                for x in zip(*(tables(s) for s in sims)))
        C = {
            "spls": spls, "base0": base0s, "shifts": shifts,
            "pms": np.stack([s._pm for s in sims]),
            "norms": np.asarray([s._norm for s in sims], dt),
            "lavars": np.asarray([s.logamp_var for s in sims], dt),
            "df": dt.type(s0.freq.main.df),
            "dx": dt.type(s0.dx),
        }
        if has_tps:
            C["tps"] = np.stack([
                np.asarray(s.temporal_logamp_powerspec, dt) for s in sims])
        from jax.sharding import NamedSharding
        C = {k: jax.device_put(v, NamedSharding(
                mesh, _TEMPORAL_SCREENS_TABLE_SPECS.get(k, P())))
             for k, v in C.items()}
        s0._temporal_screens_scan_cache = (cache_key, C)

    key = make_key(seed if seed is not None else s0.seed,
                   impl=s0.params["RNG"])
    out = _temporal_screens_program(
        jax.random.key_data(key), C, mesh=mesh, coherent=coherent,
        local_sims=local_sims, rng_impl=rng_impl, nchunks=s0.Nchunks,
        B=s0.Niter_per_chunk, has_tps=has_tps, dtype=str(dt))

    from ..engine import Fast
    out = Fast._combine_complex(out, coherent)
    results = []
    for i, s in enumerate(sims):
        s.result = FastResult(out[i], s.diffraction_limit)
        results.append(s.result)
    return results


def _run_scan_sharded_temporal_ar(sims, mesh, seed=None):
    """Shard independent AR frozen-flow series over the ``scan`` axis.

    Each configuration's series is ordered (sequential recursion), so the
    parallel axis is the *configuration* axis: every scan device evolves
    its local sims' AR(1)-in-Fourier state for the whole series. The
    ``mc`` mesh dimension must be 1 (a single series has no independent
    realization axis). This is the layout for orbit passes of temporal
    fading series — one correlated series per orbit sample, samples in
    parallel.
    """
    s0 = sims[0]
    n_scan, n_mc = mesh.devices.shape
    if n_mc != 1:
        raise ValueError(
            "temporal scan sharding needs an (n_scan, 1) mesh: one ordered "
            "series per configuration has no mc axis")
    nsims = len(sims)
    if nsims % n_scan != 0:
        raise ValueError(f"len(sims) ({nsims}) must divide by the scan "
                         f"mesh dimension ({n_scan})")
    for s in sims[1:]:
        if (s.Npxls, s.Npxls_pup, s.Niter) != (s0.Npxls, s0.Npxls_pup,
                                               s0.Niter):
            raise ValueError("sims must share grid geometry and NITER")
        if s._temporal_synth != "ar":
            raise ValueError("sims must all use TEMPORAL_SYNTH='ar'")
    boiling = bool(np.any(np.asarray(s0._ar_alpha) < 1.0))
    for s in sims[1:]:
        if bool(np.any(np.asarray(s._ar_alpha) < 1.0)) != boiling:
            raise ValueError("sims must agree on boiling (alpha < 1)")

    dt = np.dtype(str(s0.dtype))
    cdt = np.complex64 if dt == np.float32 else np.complex128
    niter = s0.Niter
    dx = s0.dx
    coherent = bool(s0.params["COHERENT"])
    precision = s0.params["PRECISION"]
    W = synthesis.pruned_ift2_matrix(s0.Npxls, *s0.pup_crop, dtype=cdt)

    local_sims = nsims // n_scan
    rng_impl = {"threefry": "threefry2x32"}.get(
        s0.params["RNG"], s0.params["RNG"])

    # Series-batched fused kernel on TPU: all of a device's series evolve
    # in ONE Pallas program. The AR step is VPU-rotation-bound (BASELINE.md
    # round 4), so the win over per-series programs is dispatch/pipeline
    # fusion, not wider dots. Falls back to the stock per-sim XLA scan
    # when off-TPU / f64 / state too large.
    from ..ops import pallas_synth
    batch_cfg = (local_sims, len(s0.h), s0.Npxls, s0.Npxls_pup, boiling)
    use_batch_kernel = (
        jax.default_backend() == "tpu" and dt == np.float32
        and batch_cfg not in _AR_BATCH_COMPILE_FAILED
        and pallas_synth.ar_batch_feasible(*batch_cfg) > 0)
    noise_kind = s0.params.get("TEMPORAL_NOISE", "uniform")

    # Device-resident table cache + one shared jitted program (mirrors the
    # iid scan): a warm repeat call ships only the RNG key — the round-3
    # path re-traced shard_fn and re-shipped the ~NL·N² phasor/PSD stacks
    # (tens of MB) every call, which dominated warm orbit-scan wall time.
    has_tps = s0.temporal_logamp_powerspec is not None
    for s in sims[1:]:
        if (s.temporal_logamp_powerspec is not None) != has_tps:
            raise ValueError(
                "sims must agree on temporal logamp powerspec presence "
                "(mixed sweeps would silently drop a sim's temporal "
                "log-amplitude spectrum)")
    cache_key = (mesh, precision, noise_kind, boiling, coherent, niter,
                 has_tps, str(dt),
                 tuple((getattr(s, "_uid", id(s)),
                        getattr(s, "_tables_version", 0)) for s in sims))
    cached = getattr(s0, "_temporal_scan_device_cache", None)
    if cached is not None and cached[0] == cache_key:
        C = cached[1]
    else:
        def tables(s):
            spd = (s._sqrt_psd_layers
                   * np.float64(s.freq.main.df)).astype(dt)
            v = np.asarray(s.wind_vector, np.float64)
            fxm = np.asarray(s.freq.main.fx, np.float64)
            fym = np.asarray(s.freq.main.fy, np.float64)
            phase = (fxm[None] * v[:, 0, None, None]
                     + fym[None] * v[:, 1, None, None]) * float(s.dt)
            phase = np.angle(np.exp(1j * phase))
            return spd, np.exp(1j * phase).astype(cdt)

        spds, phs = (np.stack(x) for x in zip(*(tables(s) for s in sims)))
        alphas = np.stack([np.asarray(s._ar_alpha, dt)[:, None, None]
                           for s in sims])
        C = {
            "spds": spds,
            "ph2": np.stack([phs.real, phs.imag], 1),  # (nsims, 2, L, N, N)
            "pms": np.stack([s._pm for s in sims]),
            "norms": np.asarray([s._norm for s in sims], np.float32),
            "alphas": alphas,
            "s1mas": np.sqrt(np.maximum(
                0.0, 1.0 - alphas.astype(np.float64) ** 2)).astype(dt),
            "lavars": np.asarray([s.logamp_var for s in sims], dt),
            "w2": np.stack([W.real, W.imag]).astype(dt),
            "dx": dt.type(dx),
        }
        if has_tps:
            C["tps"] = np.stack([
                np.asarray(s.temporal_logamp_powerspec, dt) for s in sims])
        from jax.sharding import NamedSharding
        C = {k: jax.device_put(v, NamedSharding(
                mesh, _TEMPORAL_TABLE_SPECS.get(k, P())))
             for k, v in C.items()}
        s0._temporal_scan_device_cache = (cache_key, C)

    key = make_key(seed if seed is not None else s0.seed,
                   impl=s0.params["RNG"])
    static = dict(mesh=mesh, boiling=boiling, coherent=coherent,
                  precision=precision, noise_kind=noise_kind,
                  local_sims=local_sims, rng_impl=rng_impl, nsteps=niter,
                  has_tps=has_tps, dtype=str(dt))
    if use_batch_kernel:
        try:
            out = _temporal_ar_program(jax.random.key_data(key), C,
                                       use_batch=True, **static)
        except jax.errors.JaxRuntimeError as e:
            # ar_batch_feasible's VMEM estimate is a guide, not a
            # guarantee (Mosaic stack-allocates temporaries it is free
            # to reuse) — a compile-time scoped-vmem OOM lands here;
            # fall back to the per-series XLA path. jit does not cache
            # failures, so memoise DETERMINISTIC (VMEM/Mosaic) failures
            # to avoid re-paying the failed remote compile every warm
            # call — but let transient relay/pool errors retry next
            # call rather than silently degrading the process for good.
            msg = str(e).lower()
            if any(t in msg for t in ("vmem", "mosaic", "scoped",
                                      "resource_exhausted")):
                _AR_BATCH_COMPILE_FAILED.add(batch_cfg)
            logger.warning(
                "batched AR kernel failed to compile (%s); falling "
                "back to the per-series scan path", type(e).__name__)
            out = _temporal_ar_program(jax.random.key_data(key), C,
                                       use_batch=False, **static)
    else:
        out = _temporal_ar_program(jax.random.key_data(key), C,
                                   use_batch=False, **static)

    from ..engine import Fast
    out = Fast._combine_complex(out, coherent)
    results = []
    for i, s in enumerate(sims):
        s.result = FastResult(out[i], s.diffraction_limit)
        results.append(s.result)
    return results
