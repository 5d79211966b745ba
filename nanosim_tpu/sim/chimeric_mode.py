"""Chimeric-read simulation (genome + metagenome aligned passes).

The reference draws a Geometric segment count per read, synthesizes each
aligned segment with the full error pipeline, joins segments with
unaligned-error "gap" sequences, and applies one head/tail + strand decision
to the whole read (simulator.py:1266-1454 genome, :814-1040 metagenome).

TPU mapping: segments are extra lanes — the walk/extraction/mutation pipeline
runs once over a flattened [B * S] batch (inactive segments are dead lanes
that exit the walk immediately), gaps over [B * (S-1)] with the unaligned
walk, and a parts table (head, seg0, gap0, seg1, ..., tail) is assembled into
the final read by a row-wise searchsorted over part offsets.

Segment counts are capped at `s_max` (default 8); with the typical
segment_mean ~1.3 the clamp probability is < 1e-5 (the reference has no cap;
clamped draws are counted).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import apply_errors, error_walk, rng, seqops
from . import extract
from .bundles import SimTables, build_tables, plan_event_budget, plan_ht_capacity, plan_ref_capacity
from .genome_mode import QCLASS_HT, QCLASS_UNMAPPED, _kde_draw, draw_ht


class ChimericBatchOut(NamedTuple):
    read: jax.Array  # [B, L_out] uint8, final orientation
    quals: jax.Array  # [B, L_out] uint8 phred+33
    valid: jax.Array  # [B]
    total_len: jax.Array  # [B]
    head: jax.Array  # [B]
    tail: jax.Array  # [B]
    n_seg: jax.Array  # [B] int32
    seg_middle_ref: jax.Array  # [B, S] int32
    seg_l_new: jax.Array  # [B, S] int32
    seg_offset: jax.Array  # [B, S] int32 — read-coordinate start of each seg (pre-reverse)
    gap_len: jax.Array  # [B, S-1] int32 mutated gap lengths
    chrom: jax.Array  # [B, S] int32
    local_pos: jax.Array  # [B, S] int64
    is_reversed: jax.Array  # [B]
    ev_pos2x: jax.Array  # [B*S, E] (dummy [1,1] in meta-only outputs)
    ev_type: jax.Array  # [B*S, E]
    ev_len: jax.Array  # [B*S, E]
    n_events: jax.Array  # [B, S]
    seg_read_prehp: jax.Array  # [B*S, l_cap] pass-1 mutated segments (log source)
    # walk INPUT lengths + gap-walk provenance (bit-identity replay inputs;
    # tiny next to the event buffers)
    seg_mref_init: jax.Array = None  # [B, S] int32
    gap_mref_init: jax.Array = None  # [B, S-1] int32
    gap_chrom: jax.Array = None  # [B, S-1] int32
    gap_pos: jax.Array = None  # [B, S-1] int64
    gap_ev_pos2x: jax.Array = None  # [B*(S-1), Eg] (per-STEP, matches len 0)
    gap_ev_type: jax.Array = None
    gap_ev_len: jax.Array = None
    gap_n_steps: jax.Array = None  # [B, S-1]
    # host-reconstruction extras (meta-only program)
    gap_middle: jax.Array = None  # [B, S-1] int32 gap walk ref spans
    seg_cksum: jax.Array = None  # [B, S] uint32 event-word checksums
    gap_cksum: jax.Array = None  # [B, S-1] uint32 step-word checksums
    packed_spill: jax.Array = None  # [] bool — packed lane capacity exceeded
    # (host must re-run the batch through the unpacked program)


def _geometric(u, p):
    """np.random.geometric semantics: support 1.., P(k) = p (1-p)^(k-1)."""
    return jnp.ceil(jnp.log1p(-u) / jnp.log1p(-p)).astype(jnp.int32)


def _ev_checksum(px, ty, ln, n_ev):
    """Order-sensitive u32 checksum over packed event words (same formula as
    sim/compact.compact_pack; the host replay recomputes it per lane)."""
    w = (
        px.astype(jnp.uint32)
        | (ln.astype(jnp.uint32) << jnp.uint32(17))
        | (ty.astype(jnp.uint32) << jnp.uint32(30))
    )
    e_i = jnp.arange(w.shape[1], dtype=jnp.uint32)[None, :]
    terms = (w + jnp.uint32(1)) * (jnp.uint32(2) * e_i + jnp.uint32(1))
    mask = e_i.astype(jnp.int32) < n_ev[:, None]
    return jnp.sum(jnp.where(mask, terms, jnp.uint32(0)), axis=1, dtype=jnp.uint32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "l_cap", "l_out", "ht_cap", "e_max", "gap_cap", "gap_steps", "s_max",
        "fastq", "circular_dna", "min_len", "max_len", "segment_mean",
        "metagenome", "n_chrom", "count_gap_in_total", "perfect",
        "kmer_bias", "hp_r_max", "median_len", "sd_len", "emit_reads",
        "packed_walks", "packed_cap",
    ),
)
def chimeric_batch(
    base_key: jax.Array,
    slots: jax.Array,  # [B]
    species: jax.Array,  # [B, S] int32 (metagenome; zeros for genome)
    genome: extract.GenomeDevice,
    tables: SimTables,
    *,
    l_cap: int,
    l_out: int,
    ht_cap: int,
    e_max: int,
    gap_cap: int,
    gap_steps: int,
    s_max: int,
    fastq: bool,
    circular_dna: bool,
    min_len: int,
    max_len: float,
    segment_mean: float,
    metagenome: bool,
    n_chrom: int,
    count_gap_in_total: bool,
    perfect: bool = False,
    kmer_bias: Optional[int] = None,
    hp_r_max: int = 256,
    median_len: Optional[float] = None,
    sd_len: Optional[float] = None,
    emit_reads: bool = True,
    packed_walks: bool = True,
    # test/override clamp on the packed lane-block capacities (forces the
    # spill->unpacked-re-run path deterministically; None = mean+10-sigma)
    packed_cap: Optional[int] = None,
) -> ChimericBatchOut:
    assert emit_reads or kmer_bias is None, (
        "meta-only chimeric program supports the plain aligned and perfect "
        "paths (not -hp)"
    )
    B = slots.shape[0]
    S = s_max
    sk = rng.slot_keys(base_key, slots)

    # --- segment counts (simulator.py:1276-1279) ---
    if segment_mean > 1.0 and S > 1:
        u_seg = rng.uniform_per_slot(sk, rng.SITE_SEGMENTS)
        n_seg = jnp.minimum(_geometric(u_seg, 1.0 / segment_mean), S)
    else:
        n_seg = jnp.ones(B, jnp.int32)

    SB = S * B
    seg_active = (
        jnp.repeat(jnp.arange(S, dtype=jnp.int32), B) < jnp.tile(n_seg, S)
    )  # [S*B] segment-major

    # Dense segment packing (meta-only program).  The flattened [S*B] layout
    # spends a full walk lane on every POSSIBLE segment, but with the typical
    # segment_mean ~1.3 only ~1.3*B pairs are real — most of the walk width
    # is dead lanes that still pay every step.  Here only the ACTIVE
    # (slot, segment) pairs are routed to a [K] lane block; per-lane keys are
    # (slot, part)-addressed, so WHERE a pair computes cannot change its
    # draws, and results scatter back into the [S*B] layout.  If the active
    # count ever exceeds K (vanishingly unlikely at K=2B: mean ~1.33B,
    # sd ~0.6*sqrt(B)), packed_spill is set and the host re-runs the batch
    # through this same program unpacked — acceptance stays slot-pure.
    packed = (
        packed_walks and not emit_reads and not perfect and S > 1
        and median_len is None
    )
    spill = jnp.zeros((), bool)
    if packed:
        # capacity = mean + 10 sigma of the active-pair count (sum of B
        # truncated geometrics with mean segment_mean); spill is then a
        # >10-sigma event, handled by the unpacked re-run
        import math

        mean_act = B * segment_mean
        sd_act = math.sqrt(B) * segment_mean
        k_cap = min(SB, -(-int(mean_act + 10 * sd_act + 64) // 128) * 128)
        if packed_cap is not None:
            k_cap = min(k_cap, max(int(packed_cap), 1))
        rank = jnp.cumsum(seg_active.astype(jnp.int32)) - 1
        spill = jnp.sum(seg_active.astype(jnp.int32)) > k_cap
        scat = jnp.where(seg_active & (rank < k_cap), rank, k_cap)
        lane_src = (
            jnp.full(k_cap + 1, SB, jnp.int32)
            .at[scat].set(jnp.arange(SB, dtype=jnp.int32))[:k_cap]
        )
        seg_live = lane_src < SB
        src_c = jnp.minimum(lane_src, SB - 1)  # dead lanes mirror a real pair
        sk_seg = jax.vmap(jax.random.fold_in)(
            sk[src_c % B], rng.PART_SEGMENT_BASE + src_c // B
        )

        def seg_unpack(xk, fill):
            buf = jnp.full((SB + 1,), fill, xk.dtype)
            return buf.at[lane_src].set(xk)[:SB]
    else:
        # per-(slot, segment) keys, all S*B pairs
        seg_keys = [rng.part_slot_keys(sk, rng.PART_SEGMENT_BASE, s) for s in range(S)]
        sk_seg = jnp.concatenate(seg_keys, axis=0)  # [S*B, 2] (segment-major)
        seg_live = seg_active

        def seg_unpack(xk, fill):
            return xk

    if S > 1:
        GB = (S - 1) * B
        gap_active = (
            jnp.repeat(jnp.arange(S - 1, dtype=jnp.int32), B)
            < jnp.tile(n_seg - 1, S - 1)
        )  # [(S-1)*B] gap-major
        if packed:
            # gaps: mean active = (segment_mean - 1) * B
            import math

            mean_g = B * (segment_mean - 1.0)
            sd_g = math.sqrt(B) * segment_mean
            kg_cap = min(GB, -(-int(mean_g + 10 * sd_g + 64) // 128) * 128)
            if packed_cap is not None:
                kg_cap = min(kg_cap, max(int(packed_cap), 1))
            grank = jnp.cumsum(gap_active.astype(jnp.int32)) - 1
            spill = spill | (jnp.sum(gap_active.astype(jnp.int32)) > kg_cap)
            gscat = jnp.where(gap_active & (grank < kg_cap), grank, kg_cap)
            gap_lane_src = (
                jnp.full(kg_cap + 1, GB, jnp.int32)
                .at[gscat].set(jnp.arange(GB, dtype=jnp.int32))[:kg_cap]
            )
            gap_live = gap_lane_src < GB
            gsrc_c = jnp.minimum(gap_lane_src, GB - 1)
            sk_gap = jax.vmap(jax.random.fold_in)(
                sk[gsrc_c % B], rng.PART_GAP_BASE + gsrc_c // B
            )

            def gap_unpack(xk, fill):
                buf = jnp.full((GB + 1,), fill, xk.dtype)
                return buf.at[gap_lane_src].set(xk)[:GB]
        else:
            gap_keys = [rng.part_slot_keys(sk, rng.PART_GAP_BASE, s) for s in range(S - 1)]
            sk_gap = jnp.concatenate(gap_keys, axis=0)  # [(S-1)*B, 2]
            gap_live = gap_active

            def gap_unpack(xk, fill):
                return xk

    # --- per-segment aligned lengths (iid conditional on the reference's
    # filter: (0, max] aligned, [min, max] perfect; simulator.py:832-850) ---
    ref_c = _kde_draw(sk_seg, rng.SITE_REF_LENGTH, tables.kde_aligned, 2)
    from .genome_mode import _first_valid

    if perfect:
        ref_f, ref_ok = _first_valid(ref_c, (ref_c >= min_len) & (ref_c <= max_len))
    else:
        ref_f, ref_ok = _first_valid(ref_c, (ref_c > 0) & (ref_c <= max_len))
    m_ref_lane = jnp.where(seg_live, jnp.clip(ref_f.astype(jnp.int32), 0, l_cap), 0)
    seg_len_ok = seg_unpack(jnp.where(seg_live, ref_ok & (ref_f <= l_cap), True), True)
    m_ref_flat = seg_unpack(m_ref_lane, 0)
    seg_mref_init = m_ref_flat

    # --- head/tail (perfect reads have none; simulator.py:900-901) ---
    if perfect:
        zero_b = jnp.zeros(B, jnp.int32)
        remainder, head, tail, ht_ok = zero_b, zero_b, zero_b, jnp.ones(B, bool)
    else:
        remainder, head, tail, ht_ok = draw_ht(sk, tables, ht_cap)

    # --- median/sd lognormal lengths (metagenome/genome, single segment;
    # simulator.py:832-848) ---
    if median_len is not None:
        z = rng.normal_per_slot(sk, rng.SITE_LOGNORMAL_LEN)
        if perfect:
            ln_f = jnp.exp(z * sd_len + jnp.log(median_len))
            ok_ln = (ln_f >= min_len) & (ln_f <= max_len)
        else:
            ln_f = jnp.exp(z * sd_len + jnp.log(median_len + sd_len**2 / 2.0)) - remainder
            ok_ln = (ln_f > 0) & (ln_f <= max_len)
        m_ref_flat = jnp.where(seg_active, jnp.clip(ln_f.astype(jnp.int32), 0, l_cap), 0)
        seg_len_ok = jnp.where(seg_active, ok_ln & (ln_f <= l_cap), True)
        seg_mref_init = m_ref_flat
        m_ref_lane = m_ref_flat  # median path is never packed

    # --- segment error walks on the flattened batch ---
    if perfect:
        E1 = 8
        SB = S * B
        walk = error_walk.WalkResult(
            events_pos2x=jnp.zeros((SB, E1), jnp.int32),
            events_type=jnp.zeros((SB, E1), jnp.int32),
            events_len=jnp.zeros((SB, E1), jnp.int32),
            events_valid=jnp.zeros((SB, E1), bool),
            middle_ref=m_ref_flat,
            l_new=m_ref_flat,
            overflow=jnp.zeros(SB, bool),
            n_events=jnp.zeros(SB, jnp.int32),
            ecnt_mis=jnp.zeros(SB, jnp.int32),
            ecnt_ins=jnp.zeros(SB, jnp.int32),
            ecnt_match=m_ref_flat,
        )
    else:
        walk = error_walk.error_walk_auto(
            sk_seg, m_ref_lane, tables.first_match, tables.match_markov,
            tables.mixtures, tables.trans, e_max,
        )
    walk_mid_flat = seg_unpack(walk.middle_ref, 0)
    seg_mref = walk_mid_flat.reshape(S, B).T  # [B, S]
    seg_lnew = seg_unpack(jnp.where(seg_live, walk.l_new, 0), 0).reshape(S, B).T
    walk_ok = seg_unpack(
        jnp.where(seg_live,
                  ~walk.overflow & (walk.middle_ref <= l_cap) & (walk.l_new <= l_cap),
                  True),
        True,
    ).reshape(S, B).T.all(axis=1)

    # --- gap lengths + gap synthesis (simulator.py:1298-1299, 1552-1568) ---
    if S > 1 and not perfect:
        gap_f = _kde_draw(sk_gap, rng.SITE_GAP, tables.kde_gap, 1)[:, 0]
        gap_ref = jnp.where(gap_live, jnp.maximum(gap_f, 0).astype(jnp.int32), 0)
        gap_ref = jnp.minimum(gap_ref, gap_cap)
        gwalk = error_walk.unaligned_walk_auto(sk_gap, gap_ref, tables.mixtures, gap_steps)
        gap_ok = gap_unpack(
            jnp.where(gap_live, ~gwalk.overflow & (gwalk.l_new <= gap_cap), True), True
        ).reshape(S - 1, B).T.all(axis=1)

        # gap extraction + mutation; gap species is a UNIFORM random choice,
        # not abundance-driven (extract_read with s=None, simulator.py:1556,
        # 1704-1706)
        if metagenome:
            n_species = genome.chrom_start_of_species.shape[0] - 1
            u_sp = jax.vmap(
                lambda k: jax.random.uniform(jax.random.fold_in(k, 1), dtype=jnp.float32)
            )(sk_gap)
            g_sp = jnp.minimum((u_sp * n_species).astype(jnp.int32), n_species - 1)
            g_chrom, g_pos, g_pos_ok = extract.sample_metagenome_positions(
                sk_gap, g_sp, gwalk.middle_ref, genome, n_chrom
            )
        else:
            g_chrom, g_pos, g_pos_ok = extract.sample_genome_positions(
                sk_gap, gwalk.middle_ref, genome, circular_dna
            )
        gap_ok &= gap_unpack(
            jnp.where(gap_live, g_pos_ok, True), True
        ).reshape(S - 1, B).T.all(axis=1)
        if emit_reads:
            gap_seg = extract.gather_segments(genome, g_chrom, g_pos, gwalk.middle_ref, gap_cap)
            gu_iupac, gu_mis = rng.uniform2_per_slot(sk_gap, rng.SITE_IUPAC, (gap_cap,))
            gap_seg = seqops.resolve_iupac(gap_seg, gu_iupac)
            # gap (unaligned) walk: mutate_read's reverse splicing of the
            # pos + 0.1 insertion keys makes same-pos mis/del act on contiguous
            # POST-insertion positions (build_unaligned_map)
            ggm, g_under_ins, g_map_ov = apply_errors.build_unaligned_map(
                gwalk.events_pos2x, gwalk.events_type, gwalk.events_len, gwalk.events_valid,
                gwalk.middle_ref, gap_cap,
            )
            gu_ins, _ = rng.uniform2_per_slot(sk_gap, rng.SITE_INS_BASE, (gap_cap,))
            gap_read = apply_errors.materialize_read(
                ggm.src, ggm.qclass, ggm.valid, gap_seg, gu_mis, gu_ins,
                under_ins=g_under_ins,
            )  # [(S-1)*B, gap_cap]
        else:
            # closed form of build_unaligned_map's presentation overflow
            g_p_cap = gap_cap + (gap_cap >> 1) + 256
            g_tot_ins = jnp.sum(
                jnp.where(gwalk.events_valid & (gwalk.events_type == 1),
                          gwalk.events_len, 0), axis=1)
            g_map_ov = (gwalk.middle_ref + g_tot_ins) > g_p_cap
            gap_read = jnp.zeros((1, 1), jnp.uint8)
        gap_ok &= gap_unpack(
            jnp.where(gap_live, ~g_map_ov, True), True
        ).reshape(S - 1, B).T.all(axis=1)
        gap_lens = gap_unpack(
            jnp.where(gap_live, gwalk.l_new, 0), 0
        ).reshape(S - 1, B).T  # [B, S-1]
        gap_mref_init = gap_unpack(
            jnp.where(gap_live, gap_ref, 0), 0
        ).reshape(S - 1, B).T
        gap_chrom = gap_unpack(
            jnp.where(gap_live, g_chrom, 0), 0
        ).reshape(S - 1, B).T
        gap_pos = gap_unpack(jnp.where(gap_live, g_pos, 0), 0).reshape(S - 1, B).T
        if emit_reads:
            gap_ev = (gwalk.events_pos2x, gwalk.events_type, gwalk.events_len)
        else:  # meta-only: the host replays gap walks from the meta row
            gap_ev = tuple(jnp.zeros((1, 1), jnp.int32) for _ in range(3))
        gap_n_steps = gap_unpack(
            jnp.where(gap_live, gwalk.n_events, 0), 0
        ).reshape(S - 1, B).T
        gap_middle = gap_unpack(
            jnp.where(gap_live, gwalk.middle_ref, 0), 0
        ).reshape(S - 1, B).T
        gap_cksum = gap_unpack(_ev_checksum(
            gwalk.events_pos2x, gwalk.events_type, gwalk.events_len,
            jnp.where(gap_live, gwalk.n_events, 0),
        ), 0).reshape(S - 1, B).T
    else:
        gap_ok = jnp.ones(B, bool)
        gap_read = jnp.zeros((max(S - 1, 1) * B, gap_cap), jnp.uint8)
        gap_lens = jnp.zeros((B, max(S - 1, 1)), jnp.int32)
        gap_mref_init = jnp.zeros((B, max(S - 1, 1)), jnp.int32)
        gap_chrom = jnp.zeros((B, max(S - 1, 1)), jnp.int32)
        gap_pos = jnp.zeros((B, max(S - 1, 1)), jnp.int64)
        gap_ev = tuple(jnp.zeros((max(S - 1, 1) * B, 8), jnp.int32) for _ in range(3))
        gap_n_steps = jnp.zeros((B, max(S - 1, 1)), jnp.int32)
        gap_middle = jnp.zeros((B, max(S - 1, 1)), jnp.int32)
        gap_cksum = jnp.zeros((B, max(S - 1, 1)), jnp.uint32)

    # --- total-length filter (simulator.py:1354-1368; metagenome includes
    # gaps at :935-946, genome does not) ---
    total0 = remainder + seg_lnew.sum(axis=1)
    if count_gap_in_total:
        total0 = total0 + gap_lens.sum(axis=1)
    valid = (
        ht_ok
        & walk_ok
        & gap_ok
        & seg_len_ok.reshape(S, B).T.all(axis=1)
        & (total0 >= min_len)
        & (total0 <= max_len)
    )

    # --- segment extraction ---
    if metagenome:
        if packed:
            s_sp = species[src_c % B, src_c // B]
        else:
            s_sp = jnp.concatenate([species[:, s] for s in range(S)], axis=0)
        chrom_f, pos_f, pos_ok = extract.sample_metagenome_positions(
            sk_seg, s_sp, walk.middle_ref, genome, n_chrom
        )
    else:
        chrom_f, pos_f, pos_ok = extract.sample_genome_positions(
            sk_seg, walk.middle_ref, genome, circular_dna
        )
    valid &= seg_unpack(
        jnp.where(seg_live, pos_ok, True), True
    ).reshape(S, B).T.all(axis=1)
    # inactive lanes masked to 0 so packed and unpacked meta rows are
    # byte-identical (dead-lane draws are meaningless either way)
    chrom_flat = seg_unpack(jnp.where(seg_live, chrom_f, 0), 0)
    pos_flat = seg_unpack(jnp.where(seg_live, pos_f, 0), 0)

    if not emit_reads:
        # Meta-only program (host reconstruction): no gathers, no gather map,
        # no materialization, no [B, l_out] assembly.  seg_l_new is the
        # dict-overwrite-aware read length (gm.read_len's closed form).
        eff = apply_errors.effective_lens(
            walk.events_pos2x, walk.events_type, walk.events_len, walk.events_valid
        )
        d_sum = jnp.sum(jnp.where(walk.events_valid & (walk.events_type == 2), eff, 0), axis=1)
        i_sum = jnp.sum(jnp.where(walk.events_valid & (walk.events_type == 1), eff, 0), axis=1)
        lnew_lane = (walk.middle_ref - d_sum + i_sum).astype(jnp.int32)
        seg_lnew = seg_unpack(jnp.where(seg_live, lnew_lane, 0), 0).reshape(S, B).T
        seg_cksum = seg_unpack(_ev_checksum(
            walk.events_pos2x, walk.events_type, walk.events_len,
            jnp.where(seg_live, walk.n_events, 0),
        ), 0).reshape(S, B).T

        n_parts = 2 * S + 1
        part_len = jnp.zeros((B, n_parts), jnp.int32)
        part_len = part_len.at[:, 0].set(head)
        for s in range(S):
            part_len = part_len.at[:, 1 + 2 * s].set(seg_lnew[:, s])
            if s < S - 1:
                part_len = part_len.at[:, 2 + 2 * s].set(gap_lens[:, s])
        part_len = part_len.at[:, n_parts - 1].set(tail)
        part_off = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), jnp.cumsum(part_len, axis=1)], axis=1
        )
        total = part_off[:, -1]
        valid &= (total >= min_len) & (total <= max_len) & (total <= l_out)
        valid &= ~spill  # spilled batches re-run unpacked; never half-trust
        seg_offset = part_off[:, 1 : 1 + 2 * S : 2]
        u_strand = rng.uniform_per_slot(sk, rng.SITE_STRAND)
        is_rev = u_strand > tables.strandness_rate
        dummy = jnp.zeros((B, 4), jnp.uint8)
        dummy_ev = jnp.zeros((1, 1), jnp.int32)
        return ChimericBatchOut(
            read=dummy,
            quals=dummy,
            valid=valid,
            total_len=total,
            head=head,
            tail=tail,
            n_seg=n_seg,
            seg_middle_ref=seg_mref,
            seg_l_new=seg_lnew,
            seg_offset=seg_offset,
            gap_len=gap_lens,
            chrom=chrom_flat.reshape(S, B).T,
            local_pos=pos_flat.reshape(S, B).T,
            is_reversed=is_rev,
            ev_pos2x=dummy_ev,
            ev_type=dummy_ev,
            ev_len=dummy_ev,
            n_events=seg_unpack(
                jnp.where(seg_live, walk.n_events, 0), 0
            ).reshape(S, B).T,
            seg_read_prehp=dummy,
            seg_mref_init=seg_mref_init.reshape(S, B).T,
            gap_mref_init=gap_mref_init,
            gap_chrom=gap_chrom,
            gap_pos=gap_pos,
            gap_ev_pos2x=gap_ev[0],
            gap_ev_type=gap_ev[1],
            gap_ev_len=gap_ev[2],
            gap_n_steps=gap_n_steps,
            gap_middle=gap_middle,
            seg_cksum=seg_cksum,
            gap_cksum=gap_cksum,
            packed_spill=spill,
        )

    ref_seg = extract.gather_segments(genome, chrom_f, pos_f, walk.middle_ref, l_cap)
    su_iupac, su_mis = rng.uniform2_per_slot(sk_seg, rng.SITE_IUPAC, (l_cap,))
    ref_seg = seqops.resolve_iupac(ref_seg, su_iupac)
    ev_len_seg = walk.events_len
    if kmer_bias is not None and not perfect:
        from ..ops import homopolymer

        keep = homopolymer.suppress_hp_errors(
            ref_seg, walk.middle_ref, walk.events_pos2x, walk.events_type,
            ev_len_seg, walk.events_valid, kmer_bias,
        )
        ev_len_seg = jnp.where(keep, ev_len_seg, 0)
    gm = apply_errors.build_gather_map(
        walk.events_pos2x, walk.events_type, ev_len_seg, walk.events_valid,
        walk.middle_ref, l_cap,
    )
    su_ins, _ = rng.uniform2_per_slot(sk_seg, rng.SITE_INS_BASE, (l_cap,))
    seg_read = apply_errors.materialize_read(
        gm.src, gm.qclass, gm.valid, ref_seg, su_mis, su_ins,
    )  # [S*B, l_cap]
    seg_read_prehp = seg_read
    if kmer_bias is not None and not perfect:
        seg_read, seg_qcls2, seg_len2, hp_ok = homopolymer.resize_homopolymers(
            sk_seg, seg_read, gm.qclass, gm.read_len,
            tables.hp_breaks, tables.hp_vals,
            tables.hp_mis_rate, kmer_bias, hp_r_max, l_cap,
        )
        gm = gm._replace(qclass=seg_qcls2, read_len=seg_len2)
        valid &= jnp.where(seg_active, hp_ok, True).reshape(S, B).T.all(axis=1)
    # realized segment lengths: dict-overwritten duplicate insertions (and
    # hp resizes) are reflected in gm.read_len, not the walk's l_new
    seg_lnew = jnp.where(seg_active, gm.read_len, 0).reshape(S, B).T

    # --- parts assembly ---
    # parts per read: head, (seg s, gap s)*, tail  -> 2S+1 part slots
    n_parts = 2 * S + 1
    part_len = jnp.zeros((B, n_parts), jnp.int32)
    part_len = part_len.at[:, 0].set(head)
    for s in range(S):
        part_len = part_len.at[:, 1 + 2 * s].set(seg_lnew[:, s])
        if s < S - 1:
            part_len = part_len.at[:, 2 + 2 * s].set(gap_lens[:, s])
    part_len = part_len.at[:, n_parts - 1].set(tail)
    part_off = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.cumsum(part_len, axis=1)], axis=1
    )  # [B, n_parts+1]
    total = part_off[:, -1]
    valid &= (total >= min_len) & (total <= max_len) & (total <= l_out)
    seg_offset = part_off[:, 1 : 1 + 2 * S : 2]  # [B, S] read-coordinate seg starts

    j = jnp.arange(l_out, dtype=jnp.int32)[None, :]
    # part index per output base: row-wise searchsorted over 2S+2 offsets
    part = (
        jnp.sum(part_off[:, None, :] <= j[:, :, None], axis=2) - 1
    )  # [B, l_out]  (small inner dim: broadcast compare)
    part = jnp.clip(part, 0, n_parts - 1)
    inner = j - jnp.take_along_axis(part_off, part, axis=1)

    is_head = part == 0
    is_tail = part == n_parts - 1
    is_seg = (part % 2 == 1) & ~is_tail
    seg_idx = jnp.clip((part - 1) // 2, 0, S - 1)
    gap_idx = jnp.clip((part - 2) // 2, 0, S - 2) if S > 1 else jnp.zeros_like(part)

    # gather bases: segment buffer is [S*B, l_cap] segment-major
    b_col = jnp.arange(B, dtype=jnp.int32)[:, None]
    seg_flat_idx = (seg_idx * B + b_col) * l_cap + jnp.clip(inner, 0, l_cap - 1)
    seg_bases = jnp.take(seg_read.reshape(-1), seg_flat_idx, mode="clip")
    if S > 1:
        gap_flat_idx = (gap_idx * B + b_col) * gap_cap + jnp.clip(inner, 0, gap_cap - 1)
        gap_bases = jnp.take(gap_read.reshape(-1), gap_flat_idx, mode="clip")
    else:
        gap_bases = seg_bases

    u_ht = rng.uniform_per_slot(sk, rng.SITE_HEAD_TAIL, (ht_cap,))
    ht_idx = jnp.where(is_tail, head[:, None] + inner, inner)
    ht_bases = seqops.random_bases(
        jnp.take_along_axis(u_ht, jnp.clip(ht_idx, 0, ht_cap - 1), axis=1)
    )
    base = jnp.where(is_seg, seg_bases, jnp.where(is_head | is_tail, ht_bases, gap_bases))
    base = jnp.where(j < total[:, None], base, jnp.uint8(0))

    u_strand = rng.uniform_per_slot(sk, rng.SITE_STRAND)
    is_rev = u_strand > tables.strandness_rate
    rc = seqops.reverse_complement(base, total)
    read = jnp.where(is_rev[:, None], rc, base)

    quals = jnp.zeros((B, l_out), jnp.uint8)
    if fastq:
        seg_cls = jnp.take(gm.qclass.reshape(-1), seg_flat_idx, mode="clip")
        cls = jnp.where(
            is_seg, seg_cls, jnp.where(is_head | is_tail, QCLASS_HT, QCLASS_UNMAPPED)
        )
        u_q = rng.uniform_per_slot(sk, rng.SITE_QUAL, (l_out,))
        q = tables.qual.sample(cls, u_q)
        q = jnp.where(j < total[:, None], q, 0)
        q = jnp.where(is_rev[:, None], seqops.reverse_quals(q, total), q)
        quals = jnp.where(j < total[:, None], (q + 33).astype(jnp.uint8), jnp.uint8(0))

    return ChimericBatchOut(
        read=read,
        quals=quals,
        valid=valid,
        total_len=total,
        head=head,
        tail=tail,
        n_seg=n_seg,
        seg_middle_ref=seg_mref,
        seg_l_new=seg_lnew,
        seg_offset=seg_offset,
        gap_len=gap_lens,
        chrom=chrom_f.reshape(S, B).T,
        local_pos=pos_f.reshape(S, B).T,
        is_reversed=is_rev,
        ev_pos2x=walk.events_pos2x,
        ev_type=walk.events_type,
        ev_len=ev_len_seg,
        n_events=jnp.where(seg_active, walk.n_events, 0).reshape(S, B).T,
        seg_read_prehp=seg_read_prehp,
        seg_mref_init=seg_mref_init.reshape(S, B).T,
        gap_mref_init=gap_mref_init,
        gap_chrom=gap_chrom,
        gap_pos=gap_pos,
        gap_ev_pos2x=gap_ev[0],
        gap_ev_type=gap_ev[1],
        gap_ev_len=gap_ev[2],
        gap_n_steps=gap_n_steps,
        gap_middle=gap_middle,
    )


CHI_META_SCALARS = 7  # valid, total, head, tail, n_seg, rev, spill
CHI_META_SEG = 8  # mref, lnew, off, chrom, pos, mref_init, n_ev, cksum
CHI_META_GAP = 7  # len, mref_init, chrom, pos, n_steps, middle, cksum


@jax.jit
def pack_chimeric_meta(out: ChimericBatchOut) -> jax.Array:
    """ONE [B, K] int64 transfer with every per-lane scalar the recon writer
    needs (events stay on device; the host replays them)."""
    sp = out.packed_spill
    if sp is None:
        sp = jnp.zeros((), bool)
    scal = [out.valid, out.total_len, out.head, out.tail, out.n_seg,
            out.is_reversed, jnp.broadcast_to(sp, out.valid.shape)]
    segs = [out.seg_middle_ref, out.seg_l_new, out.seg_offset, out.chrom,
            out.local_pos, out.seg_mref_init, out.n_events, out.seg_cksum]
    gaps = [out.gap_len, out.gap_mref_init, out.gap_chrom, out.gap_pos,
            out.gap_n_steps, out.gap_middle, out.gap_cksum]
    parts = [jnp.stack([c.astype(jnp.int64) for c in scal], axis=1)]
    parts += [x.astype(jnp.int64) for x in segs]
    parts += [x.astype(jnp.int64) for x in gaps]
    return jnp.concatenate(parts, axis=1)


def decode_chimeric_meta(meta: np.ndarray, S: int) -> dict:
    d = {}
    names = ["valid", "total", "head", "tail", "n_seg", "rev", "spill"]
    for i, nm in enumerate(names):
        d[nm] = meta[:, i]
    d["valid"] = d["valid"].astype(bool)
    d["rev"] = d["rev"].astype(bool)
    d["spill"] = d["spill"].astype(bool)
    off = CHI_META_SCALARS
    for nm in ("seg_mref", "seg_lnew", "seg_off", "chrom", "pos",
               "seg_mref_init", "n_events", "seg_cksum"):
        d[nm] = meta[:, off : off + S]
        off += S
    G = max(S - 1, 1)
    for nm in ("gap_len", "gap_mref_init", "gap_chrom", "gap_pos",
               "gap_n_steps", "gap_middle", "gap_cksum"):
        d[nm] = meta[:, off : off + G]
        off += G
    return d


class ChimericReconHandle:
    """A dispatched meta-only chimeric batch."""

    def __init__(self, meta_dev, slots, sim, seed, species=None):
        self.meta_dev = meta_dev
        self.slots = slots
        self.sim = sim
        self.seed = seed
        self.species = species  # [B, S] per-segment species (metagenome)


class ChimericGenomeSimulator:
    """Host driver for chimeric genome mode."""

    def __init__(
        self,
        genome,
        profile,
        *,
        fastq: bool = False,
        circular_dna: bool = False,
        min_len: int = 50,
        max_len: float = float("inf"),
        batch: int = 128,
        s_max: int = 8,
        kmer_bias: Optional[int] = None,
    ):
        self.genome_host = genome
        if circular_dna and not bool(np.all(genome.circular)):
            raise ValueError(
                "circular_dna=True but the genome was loaded as linear; "
                'load it with PackedGenome.from_fasta(path, dna_type="circular")'
            )
        self.profile = profile
        max_len = min(max_len, genome.max_chrom)
        self.fastq = fastq
        self.batch = batch
        self.s_max = s_max
        self.kmer_bias = kmer_bias

        self.l_cap = plan_ref_capacity(profile, max_len, genome.max_chrom)
        self.ht_cap = plan_ht_capacity(profile)
        gap_support = 10.0 ** (float(np.max(profile.kde_gap.data)) + 6 * profile.kde_gap.bandwidth)
        self.gap_cap = max(128, int(-(-min(gap_support * 1.4, 1e5) // 128) * 128))
        self.gap_steps = -(-(int(self.gap_cap * 1.3) + 64) // 8) * 8
        self.l_out = self.l_cap * 2 + self.gap_cap * 2 + self.ht_cap
        self.e_max = plan_event_budget(profile, self.l_cap, slack=2.5)

        self.tables = build_tables(profile)
        self.genome_dev = extract.GenomeDevice.from_packed(genome)
        self.kw = dict(
            l_cap=self.l_cap,
            l_out=self.l_out,
            ht_cap=self.ht_cap,
            e_max=self.e_max,
            gap_cap=self.gap_cap,
            gap_steps=self.gap_steps,
            s_max=s_max,
            fastq=fastq,
            circular_dna=circular_dna,
            min_len=min_len,
            max_len=max_len,
            segment_mean=profile.segment_mean,
            metagenome=False,
            n_chrom=genome.n_chrom,
            count_gap_in_total=False,  # genome-mode quirk (simulator.py:1354-1368)
            packed_cap=(int(os.environ["NANOSIM_TPU_PACKED_CAP"])
                        if os.environ.get("NANOSIM_TPU_PACKED_CAP") else None),
            kmer_bias=kmer_bias,
            hp_r_max=max(128, self.l_cap // 32),
        )

    def batch_fn(self):
        B, S = self.batch, self.s_max
        zero_species = jnp.zeros((B, S), jnp.int32)
        return functools.partial(
            chimeric_batch,
            species=zero_species,
            genome=self.genome_dev,
            tables=self.tables,
            **self.kw,
        )

    def chimeric_meta_unpacked(self, slots, seed, species=None):
        """Spill fallback: re-run a batch through the UNPACKED meta program.
        Only reachable when the batch's active segment count exceeded the
        packed lane capacity (P ~ 0 at 2B); per-slot results are identical
        because every draw is (slot, part)-addressed."""
        base = rng.base_key(seed, rng.STREAM_ALIGNED)
        B, S = self.batch, self.s_max
        fn = functools.partial(
            chimeric_batch,
            species=jnp.zeros((B, S), jnp.int32),
            genome=self.genome_dev,
            tables=self.tables,
            emit_reads=False,
            packed_walks=False,
            **self.kw,
        )
        out = fn(base, jnp.asarray(np.asarray(slots)))
        return np.asarray(pack_chimeric_meta(out))

    def run(self, n_reads, writer, seed=0, max_batches=None):
        import os

        from .genome_mode import run_prefetched

        base = rng.base_key(seed, rng.STREAM_ALIGNED)

        # host reconstruction: meta-only device program + part-keyed C++
        # walk replays + C++ splice/emit; ~100 B/lane crosses the link
        recon = (
            self.kmer_bias is None and not self.kw["circular_dna"]
            and os.environ.get("NANOSIM_TPU_RECON", "1") != "0"
        )
        if recon:
            from ..io.native import UnalignedWalkReplayer, WalkReplayer, get_lib

            lib = get_lib()
            recon = lib is not None and hasattr(lib, "emit_chimeric_recon")
        if recon:
            self._seg_replayer = WalkReplayer(
                self.profile, seed, rng.STREAM_ALIGNED, rng.SITE_WALK,
                e_guard=self.e_max,
            )
            self._gap_replayer = UnalignedWalkReplayer(
                self.profile, seed, rng.STREAM_ALIGNED, rng.SITE_UNALIGNED_WALK,
                e_guard=self.gap_steps,
            )
            recon = self._seg_replayer.available and self._gap_replayer.available
        if recon:
            B, S = self.batch, self.s_max
            fn = functools.partial(
                chimeric_batch,
                species=jnp.zeros((B, S), jnp.int32),
                genome=self.genome_dev,
                tables=self.tables,
                emit_reads=False,
                **self.kw,
            )

            def make_batch(slot_start):
                slots = np.arange(slot_start, slot_start + self.batch, dtype=np.int64)
                out = fn(base, jnp.asarray(slots))
                return ChimericReconHandle(pack_chimeric_meta(out), slots, self, seed)

            return run_prefetched(make_batch, self.batch, n_reads, writer, self,
                                  max_batches)

        fn = self.batch_fn()

        def make_batch(slot_start):
            slots = jnp.arange(slot_start, slot_start + self.batch, dtype=jnp.int64)
            return fn(base, slots)

        return run_prefetched(make_batch, self.batch, n_reads, writer, self, max_batches)
