"""Transcriptome-mode simulation.

Mirrors `simulation_aligned_transcriptome` (simulator.py:1043-1263):

  - expression-weighted transcript choice (random.choices over the TPM ECDF,
    simulator.py:1084) -> weighted inverse-CDF draw;
  - aligned length conditioned on transcript length via the 2D KDE.  The
    reference approximates the conditional by nearest-neighbor over a sample
    batch (select_nearest_kde2d, simulator.py:108-111); we sample the exact
    conditional of the isotropic Gaussian KDE (tables.KdeDevice
    .sample_conditional) with rejection until aligned < transcript length;
  - head/tail: remainder KDE + ratio CLAMPED into [0, 1]
    (simulator.py:1073-1075 — unlike genome mode, which filters);
  - polyA tails ~ int(Expon(loc=2, scale per basecaller)) for transcripts in
    the polyA list whose extraction reaches within 10 bp of the 3' end;
  - uracil (T -> U) on the final read.

Intron retention runs as a per-read feature walk over CSR structure tables
(see ir.py) and switches extraction to genome intervals.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import apply_errors, error_walk, rng, seqops
from . import extract
from .bundles import SimTables
from .genome_mode import QCLASS_HT, _kde_draw, _ndtri


class TrxBatchOut(NamedTuple):
    read: jax.Array  # [B, L_out]
    quals: jax.Array
    valid: jax.Array
    total_len: jax.Array
    head: jax.Array
    tail: jax.Array  # WITHOUT polyA (name component adds polya_len)
    polya_len: jax.Array
    middle_ref: jax.Array
    l_new: jax.Array
    trx: jax.Array  # [B] transcript index
    local_pos: jax.Array  # [B] start within transcript (or genome for IR)
    is_reversed: jax.Array
    ev_pos2x: jax.Array
    ev_type: jax.Array
    ev_len: jax.Array
    n_events: jax.Array
    has_ir: jax.Array  # [B] bool
    ir_intervals: jax.Array  # [B, I, 2] genomic retained-intron intervals
    n_ir: jax.Array  # [B]
    ref_seg: jax.Array  # [B, l_cap] IUPAC-resolved extracted reference
    read_prehp: jax.Array  # [B, l_cap] pass-1 mutated middle (log source)
    m_ref_init: jax.Array = None  # [B] walk INPUT length (2D-KDE aligned draw)
    # host-reconstruction extras (meta-only program)
    ev_cksum: jax.Array = None  # [B] uint32 walk event checksum
    ir_feat_start: jax.Array = None  # [B, F] i64 per-feature genomic starts
    ir_feat_take: jax.Array = None  # [B, F] i32 per-feature taken lengths


def pick_transcripts(sk, cum_weights: jax.Array, site=rng.SITE_TRANSCRIPT):
    u = rng.uniform_per_slot(sk, site)
    idx = jnp.searchsorted(cum_weights, u.astype(cum_weights.dtype), side="left")
    return jnp.minimum(idx, cum_weights.shape[0] - 1).astype(jnp.int32)


def draw_ht_clamped(sk, tables: SimTables, ht_cap: int):
    """Transcriptome head/tail: remainder log-KDE (int truncation), ratio
    clamped to [0, 1] (simulator.py:1072-1075, 1200-1208)."""
    rem = _kde_draw(sk, rng.SITE_REMAINDER, tables.kde_ht, 1)[:, 0]
    ratio = jnp.clip(_kde_draw(sk, rng.SITE_HT_RATIO, tables.kde_ht_ratio, 1)[:, 0], 0.0, 1.0)
    remainder = jnp.maximum(rem.astype(jnp.int32), 0)
    head = jnp.round(remainder * ratio).astype(jnp.int32)
    head = jnp.where(remainder == 0, 0, head)
    tail = remainder - head
    ok = remainder <= ht_cap
    return remainder, head, tail, ok


def polya_length(sk, retain: jax.Array, scale: float):
    """int(scipy.stats.expon.rvs(loc=2, scale)) per lane
    (simulator.py:1046-1053)."""
    u = rng.uniform_per_slot(sk, rng.SITE_POLYA)
    ln = (2.0 - scale * jnp.log1p(-u)).astype(jnp.int32)
    return jnp.where(retain, ln, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "l_cap", "l_out", "ht_cap", "e_max", "fastq", "perfect", "uracil",
        "polya_scale", "max_len", "with_ir", "kmer_bias", "hp_r_max",
        "exact_conditional", "emit_reads",
    ),
)
def transcriptome_batch(
    base_key: jax.Array,
    slots: jax.Array,
    genome: extract.GenomeDevice,  # packed TRANSCRIPTOME
    tables: SimTables,
    cum_weights: jax.Array,  # [n_eligible] expression cumulative weights
    trx_of_eligible: jax.Array,  # [n_eligible] -> transcript index
    polya_mask: jax.Array,  # [n_trx] bool
    *,
    l_cap: int,
    l_out: int,
    ht_cap: int,
    e_max: int,
    fastq: bool,
    perfect: bool,
    uracil: bool,
    polya_scale: float,
    max_len: float,
    with_ir: bool = False,
    kmer_bias: Optional[int] = None,
    hp_r_max: int = 256,
    ir_tables=None,  # IRTables pytree (dummy allowed when with_ir=False)
    ir_genome: Optional[extract.GenomeDevice] = None,
    exact_conditional: bool = False,
    emit_reads: bool = True,
) -> TrxBatchOut:
    assert emit_reads or kmer_bias is None, (
        "meta-only transcriptome program supports the plain aligned path"
    )
    B = slots.shape[0]
    sk = rng.slot_keys(base_key, slots)

    eli = pick_transcripts(sk, cum_weights)
    trx = trx_of_eligible[eli]
    trx_len = genome.lengths[trx].astype(jnp.int32)

    # aligned length given transcript length, rejected until < transcript
    # length (simulator.py:1098-1104).  Default = the reference's
    # nearest-of-pool estimator (select_nearest_kde2d) for distributional
    # parity; exact_conditional samples the true KDE conditional instead
    # (a documented statistical improvement, opt-in).
    aligned = jnp.zeros(B, jnp.int32)
    got = jnp.zeros(B, bool)
    if exact_conditional:
        u2 = rng.uniform_per_slot(sk, rng.SITE_ALIGNED_2D, (4, 2))
        for r in range(4):
            comp = u2[:, r, 0]
            z = _ndtri(jnp.clip(u2[:, r, 1], 1e-7, 1 - 1e-7))
            cand = tables.kde_aligned_2d.sample_conditional(
                trx_len.astype(jnp.float32), comp, z
            ).astype(jnp.int32)
            ok = (cand > 0) & (cand < trx_len)
            take = (~got) & ok
            aligned = jnp.where(take, cand, aligned)
            got = got | ok
    else:
        K = 256
        u2 = rng.uniform_per_slot(sk, rng.SITE_ALIGNED_2D, (2, K, 3))
        for r in range(2):
            comp = u2[:, r, :, 0]
            z0 = _ndtri(jnp.clip(u2[:, r, :, 1], 1e-7, 1 - 1e-7))
            z1 = _ndtri(jnp.clip(u2[:, r, :, 2], 1e-7, 1 - 1e-7))
            cand = tables.kde_aligned_2d.sample_nearest_pool(
                trx_len.astype(jnp.float32), comp, z0, z1
            ).astype(jnp.int32)
            ok = (cand > 0) & (cand < trx_len)
            take = (~got) & ok
            aligned = jnp.where(take, cand, aligned)
            got = got | ok
    valid = got & (aligned <= l_cap)

    if perfect:
        middle_ref = aligned
        l_new = aligned
        E1 = 8
        ev_pos2x = jnp.zeros((B, E1), jnp.int32)
        ev_type = jnp.zeros((B, E1), jnp.int32)
        ev_len = jnp.zeros((B, E1), jnp.int32)
        ev_valid = jnp.zeros((B, E1), bool)
        n_events = jnp.zeros(B, jnp.int32)
        head = jnp.zeros(B, jnp.int32)
        tail = jnp.zeros(B, jnp.int32)
    else:
        walk = error_walk.error_walk_auto(
            sk, aligned, tables.first_match, tables.match_markov, tables.mixtures,
            tables.trans, e_max,
        )
        middle_ref, l_new = walk.middle_ref, walk.l_new
        ev_pos2x, ev_type, ev_len, ev_valid = (
            walk.events_pos2x, walk.events_type, walk.events_len, walk.events_valid,
        )
        n_events = walk.n_events
        # reject when errors push past the transcript (simulator.py:1148-1149)
        valid &= ~walk.overflow & (middle_ref <= trx_len) & (middle_ref <= l_cap)
        valid &= l_new <= l_cap
        _, head, tail, ht_ok = draw_ht_clamped(sk, tables, ht_cap)
        valid &= ht_ok

    # --- intron retention decision + interval extraction -------------------
    has_ir = jnp.zeros(B, bool)
    n_ir = jnp.zeros(B, jnp.int32)
    ir_intervals = jnp.zeros((B, 1, 2), jnp.int64)
    if with_ir and not perfect:
        from .ir import ir_walk_and_extract

        (ir_seg, ir_pos, ir_extract_len, has_ir, ir_intervals, n_ir, ir_retain_end,
         ir_feat_start, ir_feat_take) = ir_walk_and_extract(
            sk, trx, middle_ref, trx_len, ir_tables, ir_genome, l_cap
        )

    # --- extraction --------------------------------------------------------
    local_pos, pos_ok = extract.sample_transcript_positions(sk, trx, middle_ref, genome)
    valid &= pos_ok
    if emit_reads:
        ref_seg = extract.gather_segments(genome, trx, local_pos, middle_ref, l_cap)
        if with_ir and not perfect:
            ref_seg = jnp.where(has_ir[:, None], ir_seg, ref_seg)
    if with_ir and not perfect:
        local_pos = jnp.where(has_ir, ir_pos, local_pos)
        valid &= jnp.where(has_ir, ir_extract_len == middle_ref, True)
    if emit_reads:
        u_iupac, u_mis = rng.uniform2_per_slot(sk, rng.SITE_IUPAC, (l_cap,))
        ref_seg = seqops.resolve_iupac(ref_seg, u_iupac)

    # polyA retention: non-IR reads reach the 3' end within 10 bp
    # (extract_read_trx, simulator.py:1683-1691); IR reads use the genomic
    # interval test (extract_read_pos, simulator.py:186-189)
    trx_has_polya = polya_mask[trx]
    reach_end = local_pos + middle_ref + 10 >= genome.lengths[trx]
    retain_polya = trx_has_polya & reach_end
    if with_ir and not perfect:
        retain_polya = jnp.where(has_ir, trx_has_polya & ir_retain_end, retain_polya)
    pa_len = polya_length(sk, retain_polya, polya_scale) if polya_scale > 0 else jnp.zeros(B, jnp.int32)

    if not emit_reads:
        # Meta-only program (host reconstruction): no ref gather map /
        # materialization / [B, l_out] assembly.  l_new is the
        # dict-overwrite-aware read length; acceptance matches the full
        # program's exactly.
        eff = apply_errors.effective_lens(ev_pos2x, ev_type, ev_len, ev_valid)
        dsum = jnp.sum(jnp.where(ev_valid & (ev_type == 2), eff, 0), axis=1)
        isum = jnp.sum(jnp.where(ev_valid & (ev_type == 1), eff, 0), axis=1)
        l_new2 = (middle_ref - dsum + isum).astype(jnp.int32)
        total = head + l_new2 + pa_len + tail
        valid &= total <= l_out
        u_strand = rng.uniform_per_slot(sk, rng.SITE_STRAND)
        is_rev = u_strand > tables.strandness_rate
        w = (
            ev_pos2x.astype(jnp.uint32)
            | (ev_len.astype(jnp.uint32) << jnp.uint32(17))
            | (ev_type.astype(jnp.uint32) << jnp.uint32(30))
        )
        e_i = jnp.arange(w.shape[1], dtype=jnp.uint32)[None, :]
        terms = (w + jnp.uint32(1)) * (jnp.uint32(2) * e_i + jnp.uint32(1))
        cksum = jnp.sum(
            jnp.where(e_i.astype(jnp.int32) < n_events[:, None], terms, jnp.uint32(0)),
            axis=1, dtype=jnp.uint32,
        )
        if with_ir and not perfect:
            feat_start, feat_take = ir_feat_start, ir_feat_take
        else:
            feat_start = jnp.zeros((B, 1), jnp.int64)
            feat_take = jnp.zeros((B, 1), jnp.int32)
        dummy = jnp.zeros((B, 4), jnp.uint8)
        return TrxBatchOut(
            read=dummy,
            quals=dummy,
            valid=valid,
            total_len=total,
            head=head,
            tail=tail,
            polya_len=pa_len,
            middle_ref=middle_ref,
            l_new=l_new2,
            trx=trx,
            local_pos=local_pos,
            is_reversed=is_rev,
            ev_pos2x=ev_pos2x,
            ev_type=ev_type,
            ev_len=ev_len,
            n_events=n_events,
            has_ir=has_ir,
            ir_intervals=ir_intervals,
            n_ir=n_ir,
            ref_seg=dummy,
            read_prehp=dummy,
            m_ref_init=aligned,
            ev_cksum=cksum,
            ir_feat_start=feat_start,
            ir_feat_take=feat_take,
        )

    read_prehp = ref_seg
    if perfect:
        read_mid = ref_seg
        qclass_mid = jnp.zeros((B, l_cap), jnp.int32)
    else:
        if kmer_bias is not None:
            from ..ops import homopolymer

            keep = homopolymer.suppress_hp_errors(
                ref_seg, middle_ref, ev_pos2x, ev_type, ev_len, ev_valid, kmer_bias
            )
            ev_len = jnp.where(keep, ev_len, 0)
        gm = apply_errors.build_gather_map(
            ev_pos2x, ev_type, ev_len, ev_valid, middle_ref, l_cap
        )
        u_ins, _ = rng.uniform2_per_slot(sk, rng.SITE_INS_BASE, (l_cap,))
        read_mid = apply_errors.materialize_read(
            gm.src, gm.qclass, gm.valid, ref_seg, u_mis, u_ins,
        )
        qclass_mid = gm.qclass
        l_new = gm.read_len
        read_prehp = read_mid
        if kmer_bias is not None:
            from ..ops import homopolymer

            read_mid, qclass_mid, l_new, hp_ok = homopolymer.resize_homopolymers(
                sk, read_mid, qclass_mid, l_new,
                tables.hp_breaks, tables.hp_vals,
                tables.hp_mis_rate, kmer_bias, hp_r_max, l_cap,
            )
            valid &= hp_ok

    # --- assembly: head + mutated middle + polyA + tail --------------------
    j = jnp.arange(l_out, dtype=jnp.int32)[None, :]
    headc = head[:, None]
    l_newc = l_new[:, None]
    pac = pa_len[:, None]
    total = head + l_new + pa_len + tail
    totalc = total[:, None]
    valid &= total <= l_out

    in_head = j < headc
    in_mid = (j >= headc) & (j < headc + l_newc)
    in_pa = (j >= headc + l_newc) & (j < headc + l_newc + pac)
    in_tail = (j >= headc + l_newc + pac) & (j < totalc)

    mid_idx = jnp.clip(j - headc, 0, l_cap - 1)
    mid_bases = jnp.take_along_axis(read_mid, mid_idx, axis=1)
    u_ht = rng.uniform_per_slot(sk, rng.SITE_HEAD_TAIL, (ht_cap,))
    ht_idx = jnp.where(in_tail, j - l_newc - pac, j)
    ht_bases = seqops.random_bases(
        jnp.take_along_axis(u_ht, jnp.clip(ht_idx, 0, ht_cap - 1), axis=1)
    )
    base = jnp.where(
        in_mid, mid_bases,
        jnp.where(in_pa, jnp.uint8(ord("A")),
                  jnp.where(in_head | in_tail, ht_bases, jnp.uint8(0))),
    )

    u_strand = rng.uniform_per_slot(sk, rng.SITE_STRAND)
    is_rev = u_strand > tables.strandness_rate
    rc = seqops.reverse_complement(base, total)
    read = jnp.where(is_rev[:, None], rc, base)
    if uracil:
        read = jnp.where(read != 0, seqops.to_uracil(read), read)

    quals = jnp.zeros((B, l_out), jnp.uint8)
    if fastq:
        cls_mid = jnp.take_along_axis(qclass_mid, mid_idx, axis=1)
        cls = jnp.where(in_mid, cls_mid, QCLASS_HT)  # polyA quals are ht-class
        u_q = rng.uniform_per_slot(sk, rng.SITE_QUAL, (l_out,))
        q = tables.qual.sample(cls, u_q)
        q = jnp.where(j < totalc, q, 0)
        q = jnp.where(is_rev[:, None], seqops.reverse_quals(q, total), q)
        quals = jnp.where(j < totalc, (q + 33).astype(jnp.uint8), jnp.uint8(0))

    return TrxBatchOut(
        read=read,
        quals=quals,
        valid=valid,
        total_len=total,
        head=head,
        tail=tail,
        polya_len=pa_len,
        middle_ref=middle_ref,
        l_new=l_new,
        trx=trx,
        local_pos=local_pos,
        is_reversed=is_rev,
        ev_pos2x=ev_pos2x,
        ev_type=ev_type,
        ev_len=ev_len,
        n_events=n_events,
        has_ir=has_ir,
        ir_intervals=ir_intervals,
        n_ir=n_ir,
        ref_seg=ref_seg,
        read_prehp=read_prehp,
        m_ref_init=aligned,
    )


TRX_META_SCALARS = 16  # valid,total,head,tail,pa,mref,lnew,trx,pos,rev,nev,cksum,mref0,has_ir,n_ir,ir_chrom


@jax.jit
def pack_trx_meta(out: TrxBatchOut, ir_chrom: jax.Array) -> jax.Array:
    """ONE [B, K] int64 transfer for the recon writer (events stay on
    device; the host replays them against the checksum)."""
    scal = [out.valid, out.total_len, out.head, out.tail, out.polya_len,
            out.middle_ref, out.l_new, out.trx, out.local_pos,
            out.is_reversed, out.n_events, out.ev_cksum, out.m_ref_init,
            out.has_ir, out.n_ir, ir_chrom]
    parts = [jnp.stack([c.astype(jnp.int64) for c in scal], axis=1)]
    B = out.ir_intervals.shape[0]
    parts.append(out.ir_intervals.reshape(B, -1).astype(jnp.int64))
    parts.append(out.ir_feat_start.astype(jnp.int64))
    parts.append(out.ir_feat_take.astype(jnp.int64))
    return jnp.concatenate(parts, axis=1)


def decode_trx_meta(meta, n_iv: int, F: int) -> dict:
    names = ["valid", "total", "head", "tail", "pa", "mref", "lnew", "trx",
             "pos", "rev", "n_events", "cksum", "mref0", "has_ir", "n_ir",
             "ir_chrom"]
    d = {nm: meta[:, i] for i, nm in enumerate(names)}
    d["valid"] = d["valid"].astype(bool)
    d["rev"] = d["rev"].astype(bool)
    d["has_ir"] = d["has_ir"].astype(bool)
    off = TRX_META_SCALARS
    d["ir_iv"] = meta[:, off : off + 2 * n_iv].reshape(len(meta), n_iv, 2)
    off += 2 * n_iv
    d["feat_start"] = meta[:, off : off + F]
    off += F
    d["feat_take"] = meta[:, off : off + F]
    return d


class TrxReconHandle:
    """A dispatched meta-only transcriptome batch."""

    def __init__(self, meta_dev, slots, sim, seed, n_iv, F):
        self.meta_dev = meta_dev
        self.slots = slots
        self.sim = sim
        self.seed = seed
        self.n_iv = n_iv
        self.F = F
