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
        "emit_reads",
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
    emit_reads: bool = True,
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

    walk = error_walk.unaligned_walk_auto(sk, jnp.minimum(m_ref, l_cap), tables.mixtures, e_max)
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

    if not emit_reads:
        # Meta-only program (host reconstruction): no gather, no map, no
        # materialization.  The map-overflow rejection is replicated from its
        # closed form: the presentation buffer overflows iff
        # middle_ref + total inserted bases exceeds build_unaligned_map's
        # default capacity.
        p_cap = l_cap + (l_cap >> 1) + 256
        tot_ins = jnp.sum(
            jnp.where(walk.events_valid & (walk.events_type == 1), walk.events_len, 0),
            axis=1,
        )
        valid &= (middle_ref + tot_ins) <= p_cap
        valid &= (l_new >= min_len) & (l_new <= max_len)
        u_strand = rng.uniform_per_slot(sk, rng.SITE_STRAND)
        is_rev = u_strand > tables.strandness_rate
        zero = jnp.zeros(B, jnp.int32)
        dummy = jnp.zeros((B, 4), jnp.uint8)
        return BatchOut(
            read=dummy,
            quals=dummy,
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
            read_prehp=dummy,
            capacity_overflow=cap_over,
            m_ref_init=jnp.minimum(m_ref, l_cap),
        )

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

        if hasattr(out, "fetch"):  # meta-only compact handle (reconstruction)
            return self._write_recon(sim, out.fetch(), accepted_so_far, quota)
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

    def _write_recon(self, sim, cb, accepted_so_far: int, quota: int) -> int:
        """Host-reconstruct + emit a meta-only compact batch."""
        import numpy as _np

        if getattr(cb, "finish", None) is not None:
            cb.finish()  # lazy walk replay
        lanes = _np.nonzero(cb.valid & ~cb.cap_over)[0][: quota - accepted_so_far]
        if len(lanes) == 0:
            return 0
        g = sim.genome_host
        gnames = g.names
        names = []
        for rank, b in enumerate(lanes):
            idx = accepted_so_far + rank
            strand = "R" if cb.rev[b] else "F"
            names.append(
                f"{gnames[cb.chrom[b]]}_{cb.pos[b]}_unaligned_{idx}_{strand}"
                f"_0_{cb.middle_ref[b]}_0"
            )
        qt = None
        if sim.fastq:
            qd = sim.tables.qual
            qt = (_np.asarray(qd.breaks), _np.asarray(qd.vals))
        from ..io.native import NativeEmitter

        em = getattr(self, "_emitter", None)
        if em is None:
            em = self._emitter = NativeEmitter()
        if em.available and hasattr(em.lib, "emit_batch_recon_unaligned"):
            mv = em.emit_recon_unaligned(
                cb, _np.asarray(lanes, _np.int64), names,
                g_off=g.offsets[cb.chrom[lanes]], genome_flat=g.flat,
                fastq=sim.fastq, qual_table=qt,
            )
            self.fastx.flush()
            self.fastx.f.write(mv)
            return len(lanes)

        from .reconstruct import reconstruct_unaligned_batch

        seed, stream, _ = cb.recon
        out = reconstruct_unaligned_batch(cb, lanes, g, seed, stream, qual_table=qt)
        for rank, b in enumerate(lanes):
            if sim.fastq:
                read, q = out[rank]
            else:
                read, q = out[rank], None
            self.fastx.write(names[rank], read, q)
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
        genome_dev=None,
    ):
        from .bundles import build_tables

        self.genome_host = genome
        if circular_dna and not bool(np.all(genome.circular)):
            raise ValueError(
                "circular_dna=True but the genome was loaded as linear; "
                'load it with PackedGenome.from_fasta(path, dna_type="circular")'
            )
        self.profile = profile
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
        # reuse an already-uploaded GenomeDevice (the metagenome runner
        # shares its 48+ MB upload instead of paying it twice per run)
        self.genome_dev = (genome_dev if genome_dev is not None
                           else extract.GenomeDevice.from_packed(genome))
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
        import os

        from .genome_mode import ResumeState, run_prefetched

        base = rng.base_key(seed, rng.STREAM_UNALIGNED)

        # host reconstruction: the device runs meta-only (no gather /
        # presentation map / materialization) and the C++ emitter replays the
        # step stream and regenerates the bytes (reconstruct_unaligned_lane
        # is the spec; byte-equality CI-enforced in tests/test_reconstruct.py)
        recon_mode = False
        fetcher = None
        p = self.profile
        want_recon = (
            not self.kw["uracil"] and not self.kw["circular_dna"]
            and p.mix_params is not None
            and (not self.fastq or p.base_quals is not None)
            and os.environ.get("NANOSIM_TPU_RECON", "1") != "0"
        )
        if want_recon:
            from ..io.native import UnalignedWalkReplayer

            replayer = UnalignedWalkReplayer(
                p, seed, rng.STREAM_UNALIGNED, rng.SITE_UNALIGNED_WALK,
                e_guard=self.e_max,
            )
            if replayer.available:
                from .output import CompactFetcher

                kde = p.kde_unaligned
                est_bases = (
                    float(np.mean(kde.data)) * 1.2 + 64 if kde is not None
                    else self.l_cap / 3
                )
                fetcher = CompactFetcher(
                    self.fastq, with_events=False, batch=self.batch,
                    est_bases=est_bases, est_events=est_bases / 1.2,
                    replayer=replayer, with_reads=False,
                    recon_info=(seed, rng.STREAM_UNALIGNED, 0),
                    lazy_replay=True,
                )
                recon_mode = True

        fn = functools.partial(
            unaligned_batch, genome=self.genome_dev, tables=self.tables,
            emit_reads=not recon_mode, **self.kw
        )

        def make_batch(slot_start):
            slots = np.arange(slot_start, slot_start + self.batch, dtype=np.int64)
            if recon_mode:
                h = fetcher.dispatch(fn(base, jnp.asarray(slots)))
                h.slots = slots
                return h
            return fn(base, jnp.asarray(slots))

        state = ResumeState(resume_state) if resume_state else None
        return run_prefetched(make_batch, self.batch, n_reads, writer, self,
                              max_batches, state=state)
