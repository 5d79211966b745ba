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
from ..sim.output import report_progress


def init_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """jax.distributed bring-up for multi-host pods (no-op when single)."""
    if num_processes is None or num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized (per-sample re-entry)
        if "already" not in str(e):
            raise


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
            prev = prior
            prior += int(total)
            if self.host_id == 0:
                report_progress(prev, min(prior, n_reads))
        return written


class MultiHostModeRunner:
    """Generic multi-host driver for modes whose writers emit directly from a
    BatchOut (transcriptome, chimeric genome): every host runs the same
    sharded batch program, emits only its own devices' lanes at
    psum-numbered global indices, and writes host-local shard files whose
    concatenation equals the single-driver output (the TPU-native analog of
    the reference's per-worker subfiles, simulator.py:1571-1672).
    """

    def __init__(self, sim, n_hosts: int, host_id: int, mesh=None, stream=None):
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
        from ..ops import rng as _rng

        # base-key stream: aligned modes default; the unaligned pass keys its
        # slots off STREAM_UNALIGNED so both passes can share slot ids
        self.stream = _rng.STREAM_ALIGNED if stream is None else stream
        self.fn = shard_sim_batch_numbered(sim.batch_fn(), self.mesh)

    def my_devices(self):
        lo = self.host_id * self.dev_per_host
        return range(lo, lo + self.dev_per_host)

    def _unshard_segmajor(self, out):
        """Chimeric batch outputs lay events out segment-major ([S*B, E],
        row = s*B + lane); shard_map concatenates DEVICE shards along axis 0,
        interleaving the segment blocks.  Restore the global layout so the
        writers' `ev_row = s*B + lane` indexing holds."""
        B = len(np.asarray(out.valid))
        if not hasattr(out, "n_seg"):
            return out
        ev = np.asarray(out.ev_pos2x)
        if ev.shape[0] == B:
            return out
        S = ev.shape[0] // B

        def fix(a):
            A = np.asarray(a)
            A = A.reshape(self.n_dev, S, self.shard, *A.shape[1:])
            return np.ascontiguousarray(
                A.swapaxes(0, 1).reshape(S * B, *A.shape[3:])
            )

        repl = {k: fix(getattr(out, k))
                for k in ("ev_pos2x", "ev_type", "ev_len")
                if hasattr(out, k)}
        if hasattr(out, "seg_read_prehp") and out.seg_read_prehp is not None:
            if np.asarray(out.seg_read_prehp).shape[0] == S * B:
                repl["seg_read_prehp"] = fix(out.seg_read_prehp)
        return out._replace(**repl)

    def run(self, n_reads: int, writer, seed: int = 0) -> int:
        from ..ops import rng

        base = rng.base_key(seed, self.stream)
        written = 0
        prior = 0
        slot_start = 0
        B = self.sim.batch
        while prior < n_reads:
            slots = jnp.arange(slot_start, slot_start + B, dtype=jnp.int64)
            slot_start += B
            out, offsets, total = self.fn(base, slots)
            out = self._unshard_segmajor(out)
            valid = np.asarray(out.valid)
            offsets = np.asarray(offsets)
            for dev in self.my_devices():
                rows = np.arange(dev * self.shard, (dev + 1) * self.shard)
                lanes = rows[valid[rows]]
                start = prior + int(offsets[dev])
                lanes = lanes[: max(0, n_reads - start)]
                if len(lanes):
                    written += writer.write_batch(
                        self.sim, out, start, n_reads, lanes=lanes, start=start
                    )
            prev = prior
            prior += int(total)
            if self.host_id == 0:
                report_progress(prev, min(prior, n_reads))
        return written


class MultiHostMetagenomeRunner:
    """Metagenome multi-host driver.

    The species-quota assignment (assign_species_batch) is sequential
    host-side state; every host computes it identically for the FULL slot
    block, and the per-batch species base-count feedback is reduced with
    psum inside the sharded program so all hosts advance the same quota
    state.
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

        batch_fn = sim.batch_fn()
        n_species = len(sim.mset.species_names)
        species_of_chrom = sim.genome_dev.species_of_chrom
        axis = "data"

        def inner(base_key, slots, species):
            out = batch_fn(base_key, slots, species=species)
            local = out.valid.sum(dtype=jnp.int32)
            counts = jax.lax.all_gather(local, axis)
            my = jax.lax.axis_index(axis)
            offset = jnp.where(jnp.arange(self.n_dev) < my, counts, 0).sum(dtype=jnp.int32)
            # per-species accepted base counts (quota feedback), psum'd
            S = out.seg_middle_ref.shape[1]
            sp = species_of_chrom[out.chrom]  # [b, S]
            seg_mask = (jnp.arange(S)[None, :] < out.n_seg[:, None]) & out.valid[:, None]
            bases = jnp.zeros(n_species, jnp.int64).at[sp].add(
                jnp.where(seg_mask, out.seg_middle_ref, 0).astype(jnp.int64)
            )
            bases = jax.lax.psum(bases, axis)
            return out, offset[None], counts.sum(dtype=jnp.int32), bases

        from jax.sharding import PartitionSpec as P

        from .mesh import shard_map

        self.fn = jax.jit(
            shard_map(
                inner,
                mesh=self.mesh,
                in_specs=(P(), P(axis), P(axis)),
                out_specs=(P(axis), P(axis), P(), P()),
                check_rep=False,
            )
        )

    def my_devices(self):
        lo = self.host_id * self.dev_per_host
        return range(lo, lo + self.dev_per_host)

    def run(self, n_reads: int, writer, seed: int = 0) -> int:
        from ..ops import rng
        from ..sim.run_metagenome import assign_species_batch

        sim = self.sim
        base = rng.base_key(seed, rng.STREAM_ALIGNED)
        rng_py = np.random.default_rng(np.random.SeedSequence([seed, 0xA55]))
        writer.species_bases = None  # quota feedback comes from the psum
        written = 0
        prior = 0
        slot_start = 0
        B = sim.batch
        while prior < n_reads:
            slots = jnp.arange(slot_start, slot_start + B, dtype=jnp.int64)
            slot_start += B
            n_seg, m_ref = sim._phase_a(base, slots)
            species = assign_species_batch(
                m_ref, n_seg, sim.current_bases, sim.abun, sim.abun_inflated, rng_py
            )
            out, offsets, total, bases = self.fn(base, slots, jnp.asarray(species))
            out = MultiHostModeRunner._unshard_segmajor(self, out)
            valid = np.asarray(out.valid)
            offsets = np.asarray(offsets)
            for dev in self.my_devices():
                rows = np.arange(dev * self.shard, (dev + 1) * self.shard)
                lanes = rows[valid[rows]]
                start = prior + int(offsets[dev])
                lanes = lanes[: max(0, n_reads - start)]
                if len(lanes):
                    written += writer.write_batch(
                        sim, out, start, n_reads, lanes=lanes, start=start
                    )
            sim.current_bases = sim.current_bases + np.asarray(bases).astype(np.float64)
            prev = prior
            prior += int(total)
            if self.host_id == 0:
                report_progress(prev, min(prior, n_reads))
        return written


def merge_host_shards(out_path: str, shard_paths, header: str = "") -> None:
    """Concatenate per-host shard files (reference: simulator.py:1626-1639)."""
    from ..sim.output import merge_files

    merge_files(out_path, list(shard_paths), header=header)
