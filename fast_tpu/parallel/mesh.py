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
    saved_b = sim.Niter_per_chunk
    sim.Niter_per_chunk = b_local
    try:
        chunk_body = sim._chunk_body()
    finally:
        sim.Niter_per_chunk = saved_b

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis_name)), out_specs=P(axis_name))
    def shard_fn(key_data, chi):
        key = jax.random.wrap_key_data(key_data)
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        outs = []
        for i in range(nchunks):
            ki = jax.random.fold_in(key, i)
            outs.append(chunk_body(ki, chi[i * b_local:(i + 1) * b_local]))
        return jnp.concatenate(outs)

    return jax.jit(shard_fn)


def run_sharded(sim, mesh=None, seed=None):
    """Run ``sim``'s Monte Carlo loop sharded over a device mesh.

    The global NITER realizations are split evenly across the mesh's
    devices; each device runs NCHUNKS jitted chunk programs with its own
    folded key. Returns a :class:`fast_tpu.engine.FastResult` over the
    gathered realizations, also stored on ``sim.result``.

    Temporal (frozen-flow) mode is inherently a single ordered time series
    and is not yet sharded here.
    """
    if sim.temporal:
        raise NotImplementedError(
            "temporal mode is a single ordered time series; shard parameter "
            "scans instead (run_sharded currently supports TEMPORAL=False)")

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

    shard_fn = _build_shard_fn(sim, mesh, nchunks, b_local, axis_name)
    with mesh:
        out = shard_fn(jax.random.key_data(key_mc), chi)

    from ..engine import Fast
    I = Fast._combine_complex(out, bool(sim.params["COHERENT"]))
    sim.result = FastResult(I, sim.diffraction_limit)
    sim.I = sim.result.power
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
