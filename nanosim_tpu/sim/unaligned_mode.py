"""Unaligned-read simulation pass (simulation_unaligned,
simulator.py:1482-1549).

Same batch machinery as the genome aligned pass, but: lengths come from the
unaligned-length KDE (or the median/sd lognormal), the error walk uses fixed
type probabilities (unaligned_walk), there is no head/tail, and FASTQ
qualities are all "unmapped"-class.  Read names end `_unaligned_<idx>_<F|R>`
with 0 head/tail and middle_ref as the middle length.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import apply_errors, error_walk, rng, seqops
from . import extract
from .bundles import SimTables
from .genome_mode import BatchOut, QCLASS_UNMAPPED, _kde_draw


@functools.partial(
    jax.jit,
    static_argnames=(
        "l_cap",
        "e_max",
        "fastq",
        "circular_dna",
        "min_len",
        "max_len",
        "median_len",
        "sd_len",
        "uracil",
        "transcriptome_mode",
    ),
)
def unaligned_batch(
    base_key: jax.Array,
    slots: jax.Array,
    genome: extract.GenomeDevice,
    tables: SimTables,
    *,
    l_cap: int,
    e_max: int,
    fastq: bool,
    circular_dna: bool,
    min_len: int,
    max_len: float,
    median_len: Optional[float],
    sd_len: Optional[float],
    uracil: bool = False,
    transcriptome_mode: bool = False,
) -> BatchOut:
    B = slots.shape[0]
    sk = rng.slot_keys(base_key, slots)

    if median_len is not None:
        z = rng.normal_per_slot(sk, rng.SITE_LOGNORMAL_LEN)
        ref_len_f = jnp.exp(z * sd_len + jnp.log(median_len))
    else:
        ref_len_f = _kde_draw(sk, rng.SITE_REF_LENGTH, tables.kde_unaligned, 1)[:, 0]
    m_ref = jnp.maximum(ref_len_f.astype(jnp.int32), 0)
    valid = (ref_len_f > 0) & (m_ref <= l_cap)

    walk = error_walk.unaligned_walk(sk, jnp.minimum(m_ref, l_cap), tables.mixtures, e_max)
    middle_ref, l_new = walk.middle_ref, walk.l_new
    cap_over = walk.overflow | (m_ref > l_cap) | (middle_ref > l_cap) | (l_new > l_cap)
    # length filter on middle_ref (simulator.py:1503-1504)
    valid &= ~cap_over & (middle_ref >= min_len) & (middle_ref <= max_len)

    if transcriptome_mode:
        # extract_read transcriptome branch: uniform transcript among those
        # strictly longer than the read (simulator.py:1695-1703)
        chrom, local_pos, pos_ok = extract.sample_uniform_chrom_positions(
            sk, middle_ref, genome, genome.lengths.shape[0]
        )
    else:
        chrom, local_pos, pos_ok = extract.sample_genome_positions(
            sk, middle_ref, genome, circular_dna
        )
    valid &= pos_ok
    ref_seg = extract.gather_segments(genome, chrom, local_pos, middle_ref, l_cap)
    u_iupac, u_mis = rng.uniform2_per_slot(sk, rng.SITE_IUPAC, (l_cap,))
    ref_seg = seqops.resolve_iupac(ref_seg, u_iupac)

    # unaligned walk: mutate_read's reverse splicing of the pos + 0.1
    # insertion keys makes same-pos mis/del act on contiguous POST-insertion
    # positions (build_unaligned_map)
    gm, under_ins, map_ov = apply_errors.build_unaligned_map(
        walk.events_pos2x, walk.events_type, walk.events_len, walk.events_valid,
        middle_ref, l_cap,
    )
    valid &= ~map_ov
    u_ins, _ = rng.uniform2_per_slot(sk, rng.SITE_INS_BASE, (l_cap,))
    read = apply_errors.materialize_read(gm.src, gm.qclass, gm.valid, ref_seg, u_mis, u_ins,
                                         under_ins=under_ins)

    # mutated-length filter (simulator.py:1517-1518)
    valid &= (l_new >= min_len) & (l_new <= max_len)

    u_strand = rng.uniform_per_slot(sk, rng.SITE_STRAND)
    is_rev = u_strand > tables.strandness_rate
    rc = seqops.reverse_complement(read, l_new)
    read = jnp.where(is_rev[:, None], rc, read)
    if uracil:
        read = jnp.where(read != 0, seqops.to_uracil(read), read)

    quals = jnp.zeros((B, l_cap), jnp.uint8)
    if fastq:
        u_q = rng.uniform_per_slot(sk, rng.SITE_QUAL, (l_cap,))
        q = tables.qual.sample(jnp.full((B, l_cap), QCLASS_UNMAPPED, jnp.int32), u_q)
        j = jnp.arange(l_cap, dtype=jnp.int32)[None, :]
        quals = jnp.where(j < l_new[:, None], (q + 33).astype(jnp.uint8), jnp.uint8(0))

    zero = jnp.zeros(B, jnp.int32)
    return BatchOut(
        read=read,
        quals=quals,
        valid=valid,
        total_len=l_new,
        head=zero,
        tail=zero,
        middle_ref=middle_ref,
        l_new=l_new,
        chrom=chrom,
        local_pos=local_pos,
        is_reversed=is_rev,
        ev_pos2x=walk.events_pos2x,
        ev_type=walk.events_type,
        ev_len=walk.events_len,
        ev_valid=walk.events_valid,
        n_events=walk.n_events,
        read_prehp=read,
        capacity_overflow=cap_over,
    )


class UnalignedBatchWriter:
    """Accept/number/emit an unaligned batch.

    Name format: `<chrom>_<pos>_unaligned_<idx>_<F|R>_0_<middle_ref>_0`
    (simulator.py:1511, 1534).  No error log is written for unaligned reads
    (the reference passes error_log=None, simulator.py:1515).
    """

    def __init__(self, fastx):
        self.fastx = fastx
        self._last_out = None
        self._last_fetch = None

    def write_batch(self, sim, out, accepted_so_far: int, quota: int,
                    lanes=None, start=None) -> int:
        """Emit accepted lanes.  `lanes`/`start` (multi-host runners) emit
        exactly those lanes numbered start+rank; otherwise all valid lanes
        numbered from accepted_so_far."""
        from .output import fetch_batch

        # Multi-host runners call write_batch once per device on the SAME
        # BatchOut; fetch (device->host transfer + unpack) only once per batch.
        if out is not self._last_out:
            self._last_fetch = fetch_batch(
                out, sim.fastq, with_events=False,
                pack_reads=not sim.kw.get("uracil", False),
            )
            self._last_out = out
        d = self._last_fetch
        if lanes is None:
            lanes = np.nonzero(d["valid"])[0][: quota - accepted_so_far]
            start = accepted_so_far
        if len(lanes) == 0:
            return 0
        reads = d["read"]
        quals = d.get("quals")
        total = d["total"]
        middle_ref = d["middle_ref"]
        chrom = d["chrom"]
        pos = d["pos"]
        rev = d["rev"]
        names = sim.genome_host.names
        for rank, b in enumerate(lanes):
            idx = start + rank
            strand = "R" if rev[b] else "F"
            name = f"{names[chrom[b]]}_{pos[b]}_unaligned_{idx}_{strand}_0_{middle_ref[b]}_0"
            self.fastx.write(
                name, reads[b, : total[b]], quals[b, : total[b]] if sim.fastq else None
            )
        return len(lanes)


class UnalignedSimulator:
    def __init__(
        self,
        genome,
        profile,
        *,
        fastq=False,
        circular_dna=False,
        min_len=50,
        max_len=float("inf"),
        median_len=None,
        sd_len=None,
        batch=256,
        l_cap=None,
        uracil=False,
        transcriptome_mode=False,
    ):
        from .bundles import build_tables

        self.genome_host = genome
        self.fastq = fastq
        max_len = min(max_len, genome.max_chrom)
        kde = profile.kde_unaligned
        if l_cap is None:
            if kde is not None:
                support = float(np.max(kde.data)) + 6.0 * kde.bandwidth
            else:
                support = (median_len or 5000) * 8
            l_cap = max(256, int(-(-min(support * 1.4 + 64, float(genome.max_chrom)) // 256) * 256))
        self.l_cap = l_cap
        # The unaligned walk advances ~1.3 ref bases per step in expectation
        # (0.4 match + mixture-length errors), so the step budget is ~linear
        # in the length cap.
        self.e_max = -(-(int(l_cap * 1.25) + 64) // 8) * 8
        self.tables = build_tables(profile)
        self.genome_dev = extract.GenomeDevice.from_packed(genome)
        self.kw = dict(
            l_cap=l_cap,
            e_max=self.e_max,
            fastq=fastq,
            circular_dna=circular_dna,
            min_len=min_len,
            max_len=max_len,
            median_len=median_len,
            sd_len=sd_len,
            uracil=uracil,
            transcriptome_mode=transcriptome_mode,
        )
        self.batch = batch

    def batch_fn(self):
        return functools.partial(
            unaligned_batch, genome=self.genome_dev, tables=self.tables, **self.kw
        )

    def run(self, n_reads, writer, seed=0, max_batches=None, resume_state=None):
        from .genome_mode import ResumeState, run_prefetched

        fn = self.batch_fn()
        base = rng.base_key(seed, rng.STREAM_UNALIGNED)

        def make_batch(slot_start):
            slots = jnp.arange(slot_start, slot_start + self.batch, dtype=jnp.int64)
            return fn(base, slots)

        state = ResumeState(resume_state) if resume_state else None
        return run_prefetched(make_batch, self.batch, n_reads, writer, self,
                              max_batches, state=state)
