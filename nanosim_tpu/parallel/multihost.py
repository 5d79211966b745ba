"""Multi-host simulation driver: per-host output shards, global numbering.

The reference scales by forking `mp.Process` workers that each write private
subfiles, merged afterwards by concatenation (simulator.py:1571-1672).  The
TPU-native shape of the same idea: every host runs the SAME sharded batch
program over the global slot schedule (`shard_sim_batch_numbered`); each host
emits only the lanes living on its own devices into host-local shard files;
global read numbers come from the all-gathered per-device accept prefix, so
the union of all shards is byte-equivalent (up to record order) to a
single-device run — and merging is plain concatenation, exactly like the
reference's subfiles.

Real pods: call `init_distributed()` (jax.distributed over DCN), pass
``host_id=jax.process_index()``/``n_hosts=jax.process_count()``, and each
process writes `{prefix}_h{host_id}` files.  The same code runs single-process
over a virtual device mesh for tests, with hosts emulated as contiguous
device groups.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import make_mesh, shard_sim_batch_numbered


def init_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """jax.distributed bring-up for multi-host pods (no-op when single)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


class MultiHostGenomeRunner:
    """Drive genome-mode simulation with host-sharded output files.

    Parameters
      sim: a GenomeSimulator (provides batch_fn, batch size, fastq flag).
      n_hosts / host_id: this process's slice of the device mesh.  Devices
        are grouped contiguously: host h owns mesh devices
        [h*D/H, (h+1)*D/H).  On a real pod these are the addressable devices;
        in tests any group can be driven from one process.
      mesh: defaults to all devices.
    """

    def __init__(self, sim, n_hosts: int, host_id: int, mesh=None):
        self.sim = sim
        self.mesh = mesh or make_mesh()
        self.n_dev = self.mesh.devices.size
        if self.n_dev % n_hosts:
            raise ValueError(f"{self.n_dev} devices not divisible by {n_hosts} hosts")
        if sim.batch % self.n_dev:
            raise ValueError(f"batch {sim.batch} not divisible by {self.n_dev} devices")
        self.n_hosts = n_hosts
        self.host_id = host_id
        self.dev_per_host = self.n_dev // n_hosts
        self.shard = sim.batch // self.n_dev
        # full event budget: sharded accept-numbering cannot splice rescued
        # lanes, so the canonical (full-budget) program runs directly —
        # identical output to the single-host lean+rescue path by construction
        self.fn = shard_sim_batch_numbered(sim.batch_fn(full_events=True), self.mesh)

    def my_devices(self):
        lo = self.host_id * self.dev_per_host
        return range(lo, lo + self.dev_per_host)

    def run(self, n_reads: int, writer, seed: int = 0) -> int:
        """Simulate until the GLOBAL accepted count reaches n_reads; this
        host emits only its own devices' lanes.  Returns the number of reads
        written BY THIS HOST."""
        from ..ops import rng
        from ..sim.output import fetch_batch

        base = rng.base_key(seed, rng.STREAM_ALIGNED)
        with_events = getattr(writer, "error_log", None) is not None and not self.sim.perfect

        written = 0
        prior = 0  # global accepted before the current batch
        slot_start = 0
        B = self.sim.batch
        while prior < n_reads:
            slots = jnp.arange(slot_start, slot_start + B, dtype=jnp.int64)
            slot_start += B
            out, offsets, total = self.fn(base, slots)
            d = fetch_batch(out, self.sim.fastq, with_events,
                            with_prehp=with_events and self.sim.kmer_bias is not None)
            offsets = np.asarray(offsets)
            for dev in self.my_devices():
                rows = np.arange(dev * self.shard, (dev + 1) * self.shard)
                lanes = rows[d["valid"][rows]]
                start = prior + int(offsets[dev])
                lanes = lanes[: max(0, n_reads - start)]
                if len(lanes):
                    written += writer.write_run(self.sim, d, lanes, start)
            prior += int(total)
        return written


def merge_host_shards(out_path: str, shard_paths, header: str = "") -> None:
    """Concatenate per-host shard files (reference: simulator.py:1626-1639)."""
    from ..sim.output import merge_files

    merge_files(out_path, list(shard_paths), header=header)
