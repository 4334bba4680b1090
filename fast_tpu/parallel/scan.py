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
        raise NotImplementedError("scan sharding supports TEMPORAL=False")
    synth_override = None
    if s0._synth in ("pallas", "pallas_fused", "pallas_colfac"):
        if all(s.params.get("SYNTH") == "auto" for s in sims):
            # the single-chip auto choice is a Pallas kernel, which is not
            # scan-shardable; scans use the factor-free matmul path
            logger.info(
                "auto-selected SYNTH='%s' is not scan-shardable; the scan "
                "uses SYNTH='matmul' (pass SYNTH explicitly to override)",
                s0._synth)
            synth_override = "matmul"
        else:
            raise NotImplementedError(
                "scan sharding supports SYNTH 'fft'|'matmul'|'colfac'; the "
                "Pallas kernels take their tables as compile-time constants "
                "— set SYNTH='matmul' (or 'colfac') for scans")
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
    # shared tables (same grid geometry) embed as constants; per-sim
    # complex tables ship as stacked (real, imag) floats — complex arrays
    # cannot cross program boundaries on all TPU runtimes
    W = s0._W_pruned if synth in ("matmul", "colfac") else None
    dt = np.dtype(str(s0.dtype))
    if synth == "colfac":
        Ls = np.stack([np.asarray(s._L_colfac) for s in sims])
        l2 = np.stack([Ls.real, Ls.imag]).astype(dt)  # (2, nsims, N, Np, Np)
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

    key = make_key(seed if seed is not None else s0.seed,
                   impl=s0.params["RNG"])
    key_logamp, key_mc = jax.random.split(key)
    chi = jnp.stack([
        synthesis.draw_logamp(jax.random.fold_in(key_logamp, i), niter,
                              sims[i].logamp_var, dtype=s0.dtype)
        for i in range(nsims)
    ])  # (nsims, niter)

    local_sims = nsims // n_scan

    def chunk_body(key, chi_c, sqrt_psd, pm, norm, l2_s, sps_sh):
        kmain, ksub = jax.random.split(key)
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
        in_specs=(P(), P("scan"), P("scan"), P("scan"), P("scan", "mc"),
                  P(None, "scan"), P("scan")),
        out_specs=P("scan", "mc"))
    def shard_fn(key_data, sqrt_psd, pm, norm, chi, l2_l, sps_sh_l):
        key = jax.random.wrap_key_data(key_data)
        key = jax.random.fold_in(key, jax.lax.axis_index("scan"))
        key = jax.random.fold_in(key, jax.lax.axis_index("mc"))
        outs = []
        for s in range(local_sims):
            ks = jax.random.fold_in(key, s)
            rows = []
            for i in range(nchunks):
                ki = jax.random.fold_in(ks, i)
                rows.append(chunk_body(
                    ki, chi[s, i * b_local:(i + 1) * b_local],
                    sqrt_psd[s], pm[s], norm[s], l2_l[:, s], sps_sh_l[s]))
            outs.append(jnp.concatenate(rows))
        return jnp.stack(outs)

    with mesh:
        out = jax.jit(shard_fn)(jax.random.key_data(key_mc),
                                jnp.asarray(sqrt_psds), jnp.asarray(pms),
                                jnp.asarray(norms), chi, jnp.asarray(l2),
                                jnp.asarray(sqrt_psd_shs))

    from ..engine import Fast
    out = Fast._combine_complex(out, coherent)
    results = []
    for i, s in enumerate(sims):
        s.result = FastResult(out[i], s.diffraction_limit)
        s.I = s.result.power
        results.append(s.result)
    return results
