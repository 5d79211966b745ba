"""Data-parallel simulation over a device mesh.

The reference parallelizes with `mp.Process` forks and file concatenation
(simulator.py:1571-1672).  Here the batch axis (read slots) is sharded over a
`jax.sharding.Mesh`; the genome and all sampling tables are replicated, and
per-batch summary statistics are reduced with `psum` over ICI.  Because all
randomness is keyed by global slot id (ops/rng.py), output is bit-identical
for any device count.

Multi-host: each host runs the same slot schedule, writes its own shard of
accepted reads (host-local files, like the reference's per-worker subfiles),
and global sequence numbering comes from the psum'd per-device accept counts.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map as _sm

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=False):
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=check_rep)
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_sim_batch(batch_fn, mesh: Mesh, axis: str = "data"):
    """Wrap a (base_key, slots) -> BatchOut step for mesh execution.

    Slots are sharded over `axis`; everything closed over by `batch_fn`
    (genome, tables) is replicated.  Also returns the psum'd global accepted
    count so hosts can assign global sequence numbers without a gather.
    """

    def inner(base_key, slots):
        out = batch_fn(base_key, slots)
        local_accepted = out.valid.sum()
        total_accepted = jax.lax.psum(local_accepted, axis)
        return out, total_accepted

    return jax.jit(
        shard_map(
            inner,
            mesh=mesh,
            in_specs=(P(), P(axis)),
            out_specs=(P(axis), P()),
            check_rep=False,
        )
    )


def shard_sim_batch_numbered(batch_fn, mesh: Mesh, axis: str = "data"):
    """Like shard_sim_batch, but additionally returns each device's exclusive
    prefix of accepted counts so every host can assign GLOBAL sequence
    numbers to its own shard's reads without further communication.

    Because slots shard contiguously over the batch axis, numbering reads as
    ``prior + offsets[dev] + rank_within_device`` reproduces exactly the
    accept-order-by-slot numbering of the single-device driver — the psum'd
    analog of the reference's locked mp.Value counter (simulator.py:1573).

    Returns (BatchOut sharded over `axis`, offsets [n_dev] i32, total i32).
    """
    n_dev = mesh.devices.size

    def inner(base_key, slots):
        out = batch_fn(base_key, slots)
        local = out.valid.sum(dtype=jnp.int32)
        counts = jax.lax.all_gather(local, axis)  # [n_dev] on every device
        my = jax.lax.axis_index(axis)
        offset = jnp.where(jnp.arange(n_dev) < my, counts, 0).sum(dtype=jnp.int32)
        return out, offset[None], counts.sum(dtype=jnp.int32)

    return jax.jit(
        shard_map(
            inner,
            mesh=mesh,
            in_specs=(P(), P(axis)),
            out_specs=(P(axis), P(axis), P()),
            check_rep=False,
        )
    )
