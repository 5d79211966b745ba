"""Genome-mode simulation: batched device step + host driver.

The reference's per-read rejection loop (`simulation_aligned_genome`,
simulator.py:1266-1454) becomes a fixed-shape batch pipeline:

  slot ids -> per-slot RNG -> KDE length draws -> error walk (lax.scan) ->
  position sampling + boundary rejection -> HBM gather -> IUPAC resolve ->
  gather-map mutation -> head/tail append -> strand flip -> qualities

Rejected lanes (length filters, boundary rejection, capacity overflow) are
simply invalid slots; the host driver keeps consuming fresh slot ranges until
the read quota is met.  Sequence numbering is by accepted-slot order, which
makes output independent of batch scheduling and device count.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import apply_errors, error_walk, homopolymer, rng, seqops
from ..profiles.profile import ReadProfile
from . import extract
from .bundles import SimTables, build_tables, plan_event_budget, plan_ht_capacity, plan_ref_capacity

QCLASS_HT = 3
QCLASS_UNMAPPED = 4


class BatchOut(NamedTuple):
    read: jax.Array  # [B, L_out] uint8 ASCII, final orientation
    quals: jax.Array  # [B, L_out] uint8 phred+33 (zeros when not fastq)
    valid: jax.Array  # [B] bool
    total_len: jax.Array  # [B] int32
    head: jax.Array  # [B] int32
    tail: jax.Array  # [B] int32
    middle_ref: jax.Array  # [B] int32
    l_new: jax.Array  # [B] int32
    chrom: jax.Array  # [B] int32
    local_pos: jax.Array  # [B] int64
    is_reversed: jax.Array  # [B] bool
    ev_pos2x: jax.Array  # [B, E] int32
    ev_type: jax.Array  # [B, E] int32
    ev_len: jax.Array  # [B, E] int32
    ev_valid: jax.Array  # [B, E] bool
    n_events: jax.Array  # [B] int32
    # pre-homopolymer-resize mutated middle ([B, l_cap]; equals the final
    # middle when -hp is off).  The ground-truth log references pass-1
    # coordinates, matching the reference's log-before-mutate_homo order.
    read_prehp: jax.Array
    # capacity overflow (walk budget / l_cap / l_out exceeded): the slot is
    # NOT statistically rejected — it must be rerun in a larger bucket
    capacity_overflow: jax.Array
    # the walk's INPUT length (clipped KDE draw) — with the slot id this
    # fully determines the event list, enabling host-side walk replay
    m_ref_init: jax.Array = None


def _ndtri(q):
    return jnp.sqrt(jnp.float32(2.0)) * jax.scipy.special.erfinv(2.0 * q - 1.0)


def _kde_draw(sk, site, kde, n_cand=1):
    """Per-slot KDE draws: [B, n_cand] samples."""
    u = rng.uniform_per_slot(sk, site, (n_cand, 2))
    comp = u[..., 0].reshape(-1)
    z = _ndtri(jnp.clip(u[..., 1].reshape(-1), 1e-7, 1 - 1e-7))
    out = kde.sample(comp, z)
    return out.reshape(u.shape[0], n_cand)


def _first_valid(cands, valid):
    """Pick the first valid candidate per lane; (value, any_valid)."""
    idx = jnp.argmax(valid, axis=1)
    return jnp.take_along_axis(cands, idx[:, None], axis=1)[:, 0], valid.any(axis=1)


def draw_ht(sk, tables: SimTables, ht_cap: int):
    """Head/tail remainder + ratio draws with the reference's filters
    (remainder >= 0, 0 <= ratio <= 1; simulator.py:1456-1479).

    Returns (remainder i32, head i32, tail i32, ok bool).
    """
    rem_c = _kde_draw(sk, rng.SITE_REMAINDER, tables.kde_ht, 4)
    rem, rem_ok = _first_valid(rem_c, rem_c >= 0)
    ratio_c = _kde_draw(sk, rng.SITE_HT_RATIO, tables.kde_ht_ratio, 4)
    ratio, ratio_ok = _first_valid(ratio_c, (ratio_c >= 0) & (ratio_c <= 1))
    remainder = rem.astype(jnp.int32)  # int() truncation
    head = jnp.round(remainder * ratio).astype(jnp.int32)
    head = jnp.where(remainder == 0, 0, head)
    tail = remainder - head
    ok = rem_ok & ratio_ok & (remainder <= ht_cap)
    return remainder, head, tail, ok


def assemble_read(
    read_mid: jax.Array,  # [B, l_cap] uint8 mutated middle
    qclass_mid: jax.Array,  # [B, l_cap] int32
    l_new: jax.Array,
    head: jax.Array,
    tail: jax.Array,
    sk: jax.Array,
    tables: SimTables,
    l_out: int,
    ht_cap: int,
    fastq: bool,
):
    """Head bases + middle + tail bases; per-base classes; strand flip; quals.

    Mirrors simulator.py:1421-1443: head/tail random bases, ht-class
    qualities at both flanks, reverse complement at 1 - strandness.

    Single-gather formulation: bases and classes are packed into one uint16
    parts buffer [read_mid | random head/tail bases]; output position j maps
    to pre-reverse coordinate jj (identity or total-1-j), selects its part
    index arithmetically, and one take_along_axis fetches base+class
    together.  The strand flip and qual reversal ride the same gather.
    """
    B = read_mid.shape[0]
    l_cap = read_mid.shape[1]
    j = jnp.arange(l_out, dtype=jnp.int32)[None, :]
    headc = head[:, None]
    l_newc = l_new[:, None]
    total = head + l_new + tail
    totalc = total[:, None]

    u_ht = rng.uniform_per_slot(sk, rng.SITE_HEAD_TAIL, (ht_cap,))
    ht_bases = seqops.random_bases(u_ht)  # [B, ht_cap]

    packed_mid = read_mid.astype(jnp.uint16) | (qclass_mid.astype(jnp.uint16) << 8)
    packed_ht = ht_bases.astype(jnp.uint16) | jnp.uint16(QCLASS_HT << 8)
    parts = jnp.concatenate([packed_mid, packed_ht], axis=1)  # [B, l_cap + ht_cap]

    u_strand = rng.uniform_per_slot(sk, rng.SITE_STRAND)
    is_rev = u_strand > tables.strandness_rate
    jj = jnp.where(is_rev[:, None], totalc - 1 - j, j)  # pre-reverse coord

    in_head = jj < headc
    in_mid = (jj >= headc) & (jj < headc + l_newc)
    idx = jnp.where(
        in_mid, jj - headc,
        jnp.where(in_head, l_cap + jj, l_cap + jj - l_newc),
    )
    fetched = jnp.take_along_axis(parts, jnp.clip(idx, 0, l_cap + ht_cap - 1), axis=1)
    base = (fetched & 0xFF).astype(jnp.uint8)
    base = jnp.where(is_rev[:, None], seqops.complement(base), base)
    in_read = j < totalc
    read = jnp.where(in_read, base, jnp.uint8(0))

    quals = jnp.zeros((B, l_out), jnp.uint8)
    if fastq:
        cls = (fetched >> 8).astype(jnp.int32)
        u_q = rng.uniform_per_slot(sk, rng.SITE_QUAL, (l_out,))
        q = tables.qual.sample(cls, u_q)
        quals = jnp.where(in_read, (q + 33).astype(jnp.uint8), jnp.uint8(0))

    return read, quals, total, is_rev


@functools.partial(
    jax.jit,
    static_argnames=(
        "l_cap",
        "l_out",
        "ht_cap",
        "e_max",
        "fastq",
        "perfect",
        "circular_dna",
        "min_len",
        "max_len",
        "median_len",
        "sd_len",
        "kmer_bias",
        "hp_r_max",
        "use_pallas_gather",
        "emit_reads",
    ),
)
def genome_batch(
    base_key: jax.Array,
    slots: jax.Array,  # [B] int64 global slot ids
    genome: extract.GenomeDevice,
    tables: SimTables,
    *,
    l_cap: int,
    l_out: int,
    ht_cap: int,
    e_max: int,
    fastq: bool,
    perfect: bool,
    circular_dna: bool,
    min_len: int,
    max_len: float,
    median_len: Optional[float],
    sd_len: Optional[float],
    kmer_bias: Optional[int] = None,
    hp_r_max: int = 256,
    use_pallas_gather: bool = False,
    emit_reads: bool = True,
) -> BatchOut:
    B = slots.shape[0]
    sk = rng.slot_keys(base_key, slots)
    E = 1 if perfect else e_max

    # --- aligned-region length (simulator.py:1284-1296) ---
    if median_len is not None:
        z = rng.normal_per_slot(sk, rng.SITE_LOGNORMAL_LEN)
        if perfect:
            ref_len_f = jnp.exp(z * sd_len + jnp.log(median_len))
        else:
            ref_len_f = jnp.exp(z * sd_len + jnp.log(median_len + sd_len**2 / 2.0))
    else:
        ref_len_f = _kde_draw(sk, rng.SITE_REF_LENGTH, tables.kde_aligned, 1)[:, 0]

    if perfect:
        valid = (ref_len_f >= min_len) & (ref_len_f <= max_len)
        m_ref = jnp.clip(ref_len_f.astype(jnp.int32), 0, l_cap)
        middle_ref = m_ref
        l_new = m_ref
        head = jnp.zeros(B, jnp.int32)
        tail = jnp.zeros(B, jnp.int32)
        ev_pos2x = jnp.zeros((B, E), jnp.int32)
        ev_type = jnp.zeros((B, E), jnp.int32)
        ev_len = jnp.zeros((B, E), jnp.int32)
        ev_valid = jnp.zeros((B, E), bool)
        n_events = jnp.zeros(B, jnp.int32)
        cap_over = ref_len_f > l_cap
        valid &= ~cap_over
    else:
        if median_len is not None:
            remainder, head, tail, ht_ok = draw_ht(sk, tables, ht_cap)
            ref_len_f = ref_len_f - remainder  # total - remainder
        else:
            remainder, head, tail, ht_ok = draw_ht(sk, tables, ht_cap)
        valid = ht_ok & (ref_len_f > 0) & (ref_len_f <= max_len) & (ref_len_f <= l_cap)
        m_ref = jnp.clip(ref_len_f.astype(jnp.int32), 0, l_cap)

        walk = error_walk.error_walk_auto(
            sk, m_ref, tables.first_match, tables.match_markov, tables.mixtures, tables.trans, e_max
        )
        middle_ref, l_new = walk.middle_ref, walk.l_new
        ev_pos2x, ev_type, ev_len, ev_valid = (
            walk.events_pos2x,
            walk.events_type,
            walk.events_len,
            walk.events_valid,
        )
        n_events = walk.n_events
        # ht_cap is bucket-independent, so remainder > ht_cap stays a plain
        # rejection (inside ht_ok) rather than a rerun-in-bigger-bucket case
        cap_over = (
            walk.overflow
            | (middle_ref > l_cap)
            | (l_new > l_cap)
            | (ref_len_f > l_cap)
        )
        total0 = remainder + l_new
        cap_over |= (total0 > l_out) & (total0 <= max_len)
        valid &= ~cap_over
        valid &= (total0 >= min_len) & (total0 <= max_len)

    # --- extraction (simulator.py:1694-1781) ---
    chrom, local_pos, pos_ok = extract.sample_genome_positions(
        sk, middle_ref, genome, circular_dna
    )
    valid &= pos_ok

    if not emit_reads:
        # Meta-only program (host read reconstruction, sim/reconstruct.py):
        # acceptance must match the full program's exactly, so the final
        # length filters run on the DEDUP-aware l_new that fused_read_v2
        # would materialize; the window-drift overflow flag is intentionally
        # absent — output is window-invariant by the rescue construction, so
        # the reconstruction equals the no-window bytes either way.
        eff = apply_errors.effective_lens(ev_pos2x, ev_type, ev_len, ev_valid)
        dsum = jnp.sum(jnp.where(ev_valid & (ev_type == 2), eff, 0), axis=1)
        isum = jnp.sum(jnp.where(ev_valid & (ev_type == 1), eff, 0), axis=1)
        l_new2 = (middle_ref - dsum + isum).astype(jnp.int32)
        total = head + l_new2 + tail
        u_strand = rng.uniform_per_slot(sk, rng.SITE_STRAND)
        is_rev = u_strand > tables.strandness_rate
        if kmer_bias is None:
            valid &= (total >= min_len) & (total <= max_len)
        # -hp: the reference's min/max filter runs ONLY on error_list's
        # pre-mutation total (simulator.py:1367-1368), already applied above
        # on total0; suppression/resize happen host-side in the recon path.
        cap_over |= total > l_out
        valid &= ~cap_over
        dummy = jnp.zeros((B, 4), jnp.uint8)
        return BatchOut(
            read=dummy,
            quals=dummy,
            valid=valid,
            total_len=total,
            head=head,
            tail=tail,
            middle_ref=middle_ref,
            l_new=l_new2,
            chrom=chrom,
            local_pos=local_pos,
            is_reversed=is_rev,
            ev_pos2x=ev_pos2x,
            ev_type=ev_type,
            ev_len=ev_len,
            ev_valid=ev_valid,
            n_events=n_events,
            read_prehp=dummy,
            capacity_overflow=cap_over,
            m_ref_init=m_ref,
        )
    # chunked path: fetch 256-byte rows and fold the intra-chunk offset into
    # the mutation gather (per-byte extraction gathers serialize on TPU);
    # circular wrap and the hp run analysis need the aligned per-byte path.
    # perfect reads ride the same chunked+fused path (zero events make it
    # pure extraction), which keeps ONE draw-indexing scheme and lets the
    # host reconstruction cover --perfect with the existing C++ spec
    chunked = not circular_dna and kmer_bias is None
    if chunked:
        ref_seg, seg_off = extract.gather_segments_padded(genome, chrom, local_pos, l_cap)
        u_iupac, u_mis = rng.uniform2_per_slot(sk, rng.SITE_IUPAC, (l_cap + extract.CHUNK,))
        ref_seg = seqops.resolve_iupac(ref_seg, u_iupac)
        u_mis = u_mis[:, :l_cap]
    else:
        seg_off = None
        ref_seg = extract.gather_segments(genome, chrom, local_pos, middle_ref, l_cap)
        u_iupac, u_mis = rng.uniform2_per_slot(sk, rng.SITE_IUPAC, (l_cap,))
        ref_seg = seqops.resolve_iupac(ref_seg, u_iupac)

    read_prehp = ref_seg
    if kmer_bias is None:
        # fast path: mutation + head/tail assembly + strand flip fused into
        # one [B, l_out] pass over 2-bit packed codes (fused_read_v2);
        # substitution/insertion uniforms are indexed by output position and
        # head/tail bases generate at their output coordinates — both
        # counter-addressed, so values are independent of buffer widths
        u_strand = rng.uniform_per_slot(sk, rng.SITE_STRAND)
        is_rev = u_strand > tables.strandness_rate
        u_mis_o, u_ins_o = rng.uniform2_per_slot(sk, rng.SITE_MIS_BASE, (l_out,))
        n_ref_codes = ref_seg.shape[1]
        ref_codes = apply_errors._pack_codes4(ref_seg)
        pad = (-ref_codes.shape[1]) % 128
        if pad:
            ref_codes = jnp.pad(ref_codes, ((0, 0), (0, pad)))
        use_window = bool(use_pallas_gather) and E <= 8191 and l_out % 1024 == 0
        read, qclass_out, l_new, total, win_ov = apply_errors.fused_read_v2(
            ev_pos2x, ev_type, ev_len, ev_valid, middle_ref, head, tail,
            is_rev, ref_codes, n_ref_codes, seg_off, sk, u_mis_o, u_ins_o,
            l_out, ht_cap, rng.SITE_HEAD_TAIL, use_window=use_window,
        )
        cap_over |= win_ov
        quals = jnp.zeros((B, l_out), jnp.uint8)
        if fastq:
            u_q = rng.uniform_per_slot(sk, rng.SITE_QUAL, (l_out,))
            q = tables.qual.sample(qclass_out, u_q)
            in_read = jnp.arange(l_out, dtype=jnp.int32)[None, :] < total[:, None]
            quals = jnp.where(in_read, (q + 33).astype(jnp.uint8), jnp.uint8(0))
        read_prehp = ref_seg[:, :l_cap]
        valid &= (total >= min_len) & (total <= max_len)
        cap_over |= total > l_out
        valid &= ~cap_over
        return BatchOut(
            read=read,
            quals=quals,
            valid=valid,
            total_len=total,
            head=head,
            tail=tail,
            middle_ref=middle_ref,
            l_new=l_new,
            chrom=chrom,
            local_pos=local_pos,
            is_reversed=is_rev,
            ev_pos2x=ev_pos2x,
            ev_type=ev_type,
            ev_len=ev_len,
            ev_valid=ev_valid,
            n_events=n_events,
            read_prehp=read_prehp,
            capacity_overflow=cap_over,
            m_ref_init=m_ref,
        )
    if perfect:
        read_mid = ref_seg
        qclass_mid = jnp.zeros((B, l_cap), jnp.int32)  # match
    else:
        if kmer_bias is not None:
            # drop error events overlapping >= k homopolymer runs
            # (mutate_read, simulator.py:1920-1950); zero-length events are
            # no-ops downstream and skipped by the log writers
            keep = homopolymer.suppress_hp_errors(
                ref_seg, middle_ref, ev_pos2x, ev_type, ev_len, ev_valid, kmer_bias
            )
            ev_len = jnp.where(keep, ev_len, 0)
        gm = apply_errors.build_gather_map(
            ev_pos2x, ev_type, ev_len, ev_valid, middle_ref, l_cap
        )
        u_ins, _ = rng.uniform2_per_slot(sk, rng.SITE_INS_BASE, (l_cap,))
        read_mid = apply_errors.materialize_read(
            gm.src, gm.qclass, gm.valid, ref_seg, u_mis, u_ins, src_offset=seg_off
        )
        qclass_mid = gm.qclass
        l_new = gm.read_len
        read_prehp = read_mid
        if kmer_bias is not None:
            # resize homopolymer runs in the mutated read (mutate_homo,
            # simulator.py:618-705)
            read_mid, qclass_mid, l_new, hp_ok = homopolymer.resize_homopolymers(
                sk, read_mid, qclass_mid, l_new,
                tables.hp_breaks, tables.hp_vals,
                tables.hp_mis_rate, kmer_bias, hp_r_max, l_cap,
            )
            # run-table overflow (and post-resize middles beyond the l_cap
            # buffer) are CAPACITY conditions, not statistical rejections:
            # the reference has no such limits, so the lane is re-run through
            # the rescue program (whose r_max = l_cap//k can never overflow)
            # to keep read numbering reference-exact
            cap_over |= ~hp_ok | (l_new > l_cap)
            valid &= hp_ok & (l_new <= l_cap)

    read, quals, total, is_rev = assemble_read(
        read_mid, qclass_mid, l_new, head, tail, sk, tables, l_out, ht_cap, fastq
    )
    # final length filter (simulator.py:1429-1430 / 897 for perfect).  The
    # -hp path must NOT re-filter on the post-resize total: the reference's
    # min/max check runs on error_list's pre-mutation total only
    # (simulator.py:1367-1368) and mutate_homo never re-checks — that filter
    # already ran above on total0.
    if kmer_bias is None:
        valid &= (total >= min_len) & (total <= max_len)
    if not perfect:
        cap_over |= total > l_out
        valid &= ~cap_over

    return BatchOut(
        read=read,
        quals=quals,
        valid=valid,
        total_len=total,
        head=head,
        tail=tail,
        middle_ref=middle_ref,
        l_new=l_new,
        chrom=chrom,
        local_pos=local_pos,
        is_reversed=is_rev,
        ev_pos2x=ev_pos2x,
        ev_type=ev_type,
        ev_len=ev_len,
        ev_valid=ev_valid,
        n_events=n_events,
        read_prehp=read_prehp,
        capacity_overflow=cap_over,
        m_ref_init=m_ref,
    )


def _profile_host_arrays(p):
    """Host-side numpy material covering everything build_tables bakes into
    the traced program (aot key input; avoids hashing device arrays)."""
    import numpy as _np

    out = []
    for t in (p.first_match, p.match_markov):
        if t is not None:
            out += [t.p_lo, t.p_hi, t.v_lo, t.v_hi, _np.asarray(t.bin_lo)]
    if p.mix_params is not None:
        out.append(_np.asarray(
            [*p.mix_params.mis, *p.mix_params.ins, *p.mix_params.dele], _np.float64))
    if p.trans_error is not None:
        out.append(_np.asarray(p.trans_error))
    for k in ("kde_aligned", "kde_aligned_2d", "kde_ht", "kde_ht_ratio",
              "kde_unaligned", "kde_gap"):
        m = getattr(p, k, None)
        if m is not None:
            out += [_np.asarray(m.data), _np.asarray([m.bandwidth]),
                    _np.asarray([1.0 if m.log_transform else 0.0])]
    if p.base_quals is not None:
        blob = repr(sorted((c, float(v["sd"]), float(v["mu"]))
                           for c, v in p.base_quals.items()))
        out.append(_np.frombuffer(blob.encode(), _np.uint8))
    if getattr(p, "hp_params", None) is not None:
        hp = p.hp_params
        blob = repr((float(hp.mis_rate), sorted(hp.pw.items()), sorted(hp.lr.items())))
        out.append(_np.frombuffer(blob.encode(), _np.uint8))
    out.append(_np.asarray([p.strandness_rate], _np.float64))
    return tuple(_np.ascontiguousarray(a) for a in out)


class OverflowRescueWriter:
    """Writer shim: lanes whose walk overflowed the lean event budget
    (capacity_overflow) are re-run through a lazily-compiled full-budget
    program and spliced back IN SLOT ORDER before emission, so the lean
    budget is invisible in the output.  Overflow is rare (the lean budget
    covers the drawn-length distribution with slack); the rescue program
    compiles only on first use.
    """

    RESCUE_BATCH = 64

    def __init__(self, sim, writer, base_key, make_fetcher):
        self.sim = sim
        self.inner = writer
        self.base = base_key
        self.make_fetcher = make_fetcher  # () -> fresh fetcher for rescue runs
        self._fn = None
        self._fetcher = None
        self.error_log = getattr(writer, "error_log", None)
        self.perfect = getattr(writer, "perfect", False)
        inner_enqueue = getattr(writer, "enqueue_task", None)
        if inner_enqueue is not None:
            self.enqueue_task = inner_enqueue

    def _rescue(self, slots):
        """Run overflow slots through the full-budget program.

        Returns {slot: (fetched, lane)} for slots that produced valid reads.
        """
        from .bundles import FULL_EVENT_SLACK, plan_event_budget

        sim = self.sim
        if self._fn is None:
            self._fn = functools.partial(
                genome_batch,
                genome=sim.genome_dev,
                tables=sim.tables,
                l_cap=sim.l_cap,
                l_out=sim.l_out,
                ht_cap=sim.ht_cap,
                e_max=plan_event_budget(sim.profile, sim.l_cap, slack=FULL_EVENT_SLACK),
                fastq=sim.fastq,
                perfect=sim.perfect,
                circular_dna=sim.circular_dna,
                min_len=sim.min_len,
                max_len=sim.max_len,
                median_len=sim.median_len,
                sd_len=sim.sd_len,
                kmer_bias=sim.kmer_bias,
                # rescue-grade run capacity: a length-l_cap read holds at most
                # l_cap//k runs of length >= k, so this program cannot hit the
                # hp_ok overflow the primary program treats as cap_over
                hp_r_max=(sim.l_cap // max(sim.kmer_bias, 1) + 1)
                if sim.kmer_bias else max(128, sim.l_cap // 32),
                use_pallas_gather=False,  # rescue must not re-trigger window overflow
            )
            self._fetcher = self.make_fetcher()
        out = {}
        B = self.RESCUE_BATCH
        for i in range(0, len(slots), B):
            ch = np.asarray(slots[i : i + B], np.int64)
            n_real = len(ch)
            if n_real < B:
                ch = np.concatenate([ch, np.full(B - n_real, ch[-1], np.int64)])
            h = self._fetcher.dispatch(self._fn(self.base, jnp.asarray(ch)))
            h.slots = ch
            d = h.fetch()
            valid = np.asarray(d["valid"])
            for lane in range(n_real):
                if valid[lane]:
                    out[int(ch[lane])] = (d, lane)
        return out

    def write_batch(self, sim, handle, accepted_so_far: int, quota: int) -> int:
        d = handle.fetch() if hasattr(handle, "fetch") else handle
        cap = np.asarray(d["cap_over"])
        valid = np.asarray(d["valid"])
        if not cap.any():
            lanes = np.nonzero(valid)[0][: quota - accepted_so_far]
            return self.inner.write_run(sim, d, lanes, accepted_so_far)

        slots = handle.slots
        from .output import RUN_STATS

        RUN_STATS.overflow_rescue_lanes += int(cap.sum())
        rescued = self._rescue(slots[cap])
        # interleave in slot order: runs of primary lanes + rescued singletons
        n = 0
        run_lanes = []
        for lane in range(len(slots)):
            if accepted_so_far + n + len(run_lanes) >= quota:
                break
            if valid[lane]:
                run_lanes.append(lane)
            elif cap[lane]:
                r = rescued.get(int(slots[lane]))
                if r is None:
                    continue
                if run_lanes:
                    n += self.inner.write_run(
                        sim, d, np.asarray(run_lanes, np.int64), accepted_so_far + n
                    )
                    run_lanes = []
                d2, lane2 = r
                n += self.inner.write_run(
                    sim, d2, np.asarray([lane2], np.int64), accepted_so_far + n
                )
        if run_lanes:
            run_lanes = run_lanes[: quota - accepted_so_far - n]
            n += self.inner.write_run(
                sim, d, np.asarray(run_lanes, np.int64), accepted_so_far + n
            )
        return n

    def drain(self):
        if hasattr(self.inner, "drain"):
            self.inner.drain()

    def close(self):
        if hasattr(self.inner, "close"):
            self.inner.close()


def run_prefetched(make_batch, batch_size: int, quota: int, writer, sim,
                   max_batches=None, state=None, depth: Optional[int] = None) -> int:
    """Pipelined accept loop: up to `depth` batches are dispatched (JAX
    async) ahead of the host consumer, so the fixed per-dispatch cost
    (tunnel RTT + program launch, ~25-30 ms on a remote TPU) overlaps both
    device compute AND the host's formatting/IO of earlier batches.  Depth 1
    is the old double-buffered behavior; the default 4 keeps the device
    stream saturated even when a single host emit stalls on the memory
    throttle (NANOSIM_TPU_PIPELINE_DEPTH overrides).

    `state` (optional ResumeState): loads (slot cursor, accepted count) on
    entry and checkpoints them after every emitted batch, enabling a
    kill-and-restart to reproduce the exact remaining output (slot-keyed
    draws make the mapping deterministic).  The checkpointed cursor is the
    first UNCONSUMED batch's slot start — in-flight dispatches beyond it are
    recomputed on resume.
    """
    from collections import deque

    if depth is None:
        depth = max(1, int(os.environ.get("NANOSIM_TPU_PIPELINE_DEPTH", "4")))
    accepted = state.accepted if state else 0
    slot_start = state.slot_start if state else 0
    dispatched = 0
    q = deque()
    while accepted < quota:
        while len(q) < depth and (max_batches is None or dispatched < max_batches):
            q.append(make_batch(slot_start))
            slot_start += batch_size
            dispatched += 1
        if not q:
            break
        pending = q.popleft()
        prev = accepted
        accepted += writer.write_batch(sim, pending, accepted, quota)
        from .output import report_progress

        report_progress(prev, accepted)
        if state is not None:
            state.checkpoint(writer, slot_start - batch_size * len(q), accepted)
    return accepted


class ResumeState:
    """Batch-granular (slot cursor, accepted count) checkpointing.

    The state on disk never runs AHEAD of the output files: with a
    synchronous writer it is written right after the batch's emission; with
    an AsyncBatchWriter the write is enqueued BEHIND the batch's emission on
    the same ordered worker queue.
    """

    def __init__(self, path: str):
        self.path = path
        self.slot_start = 0
        self.accepted = 0
        if os.path.exists(path):
            import json

            with open(path) as f:
                d = json.load(f)
            self.slot_start = int(d["slot_start"])
            self.accepted = int(d["accepted"])

    def _write(self, slot_start: int, accepted: int):
        import json

        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"slot_start": slot_start, "accepted": accepted}, f)
        os.replace(tmp, self.path)

    def checkpoint(self, writer, slot_start: int, accepted: int):
        enqueue = getattr(writer, "enqueue_task", None)
        if enqueue is not None:
            enqueue(lambda: self._write(slot_start, accepted))
        else:
            self._write(slot_start, accepted)


class GenomeSimulator:
    """Host driver: batches, slot accounting, acceptance, output."""

    def __init__(
        self,
        genome,
        profile: ReadProfile,
        *,
        fastq: bool = False,
        perfect: bool = False,
        circular_dna: bool = False,
        min_len: int = 50,
        max_len: float = float("inf"),
        median_len: Optional[float] = None,
        sd_len: Optional[float] = None,
        batch: int = 256,
        l_cap: Optional[int] = None,
        kmer_bias: Optional[int] = None,
    ):
        self.genome_host = genome
        if circular_dna and not bool(np.all(genome.circular)):
            # the wrap itself keys off the per-chromosome flags at gather
            # time; a linear-loaded genome would silently clamp at the 3' end
            raise ValueError(
                "circular_dna=True but the genome was loaded as linear; "
                'load it with PackedGenome.from_fasta(path, dna_type="circular")'
            )
        self.profile = profile
        max_len = min(max_len, genome.max_chrom)
        self.max_len = max_len
        self.min_len = min_len
        self.fastq = fastq
        self.perfect = perfect
        self.circular_dna = circular_dna
        self.median_len = median_len
        self.sd_len = sd_len
        self.batch = batch
        self.kmer_bias = kmer_bias

        self.l_cap = l_cap or plan_ref_capacity(profile, max_len, genome.max_chrom)
        self.ht_cap = plan_ht_capacity(profile)
        # l_out padded to the windowed-gather tile; harmless otherwise (the
        # per-position RNG is counter-addressed, so width never changes draws)
        self.l_out = -(-(self.l_cap + self.ht_cap) // 1024) * 1024
        self.e_max = plan_event_budget(profile, self.l_cap)

        self.tables = build_tables(profile)
        self.genome_dev = extract.GenomeDevice.from_packed(genome)

    def _pallas_gather_ok(self, l_cap: int):
        from ..ops import window_gather

        return window_gather.supported()

    def batch_fn(self, full_events: bool = False, emit_reads: bool = True):
        """full_events=True uses the full (rescue-grade) event budget in ONE
        program — canonical semantics without a rescue pass; used by runners
        that cannot splice rescued lanes (multi-host sharded numbering).
        emit_reads=False builds the meta-only program (host reconstruction)."""
        from .bundles import FULL_EVENT_SLACK

        e_max = (
            plan_event_budget(self.profile, self.l_cap, slack=FULL_EVENT_SLACK)
            if full_events
            else self.e_max
        )
        return functools.partial(
            genome_batch,
            genome=self.genome_dev,
            tables=self.tables,
            l_cap=self.l_cap,
            l_out=self.l_out,
            ht_cap=self.ht_cap,
            e_max=e_max,
            fastq=self.fastq,
            perfect=self.perfect,
            circular_dna=self.circular_dna,
            min_len=self.min_len,
            max_len=self.max_len,
            median_len=self.median_len,
            sd_len=self.sd_len,
            kmer_bias=self.kmer_bias,
            hp_r_max=max(128, self.l_cap // 32),
            # the meta-only program performs no read gather: skip the Pallas
            # probe compile (a cold-start cost on remote backends)
            use_pallas_gather=(self._pallas_gather_ok(self.l_cap)
                               if emit_reads else False),
            emit_reads=emit_reads,
        )

    # Routing margin: drawn length -> bucket whose l_cap covers the walk's
    # ref/read inflation (net indel drift is a few %% plus bounded overshoot;
    # lanes that still overflow are re-run in the big bucket).
    BUCKET_MARGIN = 1.10
    BUCKET_PAD = 512

    def plan_buckets(self):
        """Length buckets: a small bucket sized so ~85%% of draws fit plus
        the full-size bucket.  The KDE tail forces l_cap far beyond the mean
        (padding waste 2-3x); since the device cost is dominated by
        [B, l_cap]-wide gathers/cumsums, routing typical reads through a
        smaller static shape cuts most of it."""
        kde = self.profile.kde_aligned
        if kde is None or self.perfect or self.median_len is not None:
            return [self.l_cap]
        col = kde.data[:, -1] if kde.data.shape[1] > 1 else kde.data[:, 0]
        q85 = float(np.percentile(col, 85))
        small = max(512, int(-(-(q85 * self.BUCKET_MARGIN + self.BUCKET_PAD) // 256) * 256))
        if small > self.l_cap * 0.75:
            return [self.l_cap]
        return [small, self.l_cap]

    def bucket_fns(self, buckets):
        fns = {}
        for lc in buckets:
            fns[lc] = functools.partial(
                genome_batch,
                genome=self.genome_dev,
                tables=self.tables,
                l_cap=lc,
                l_out=-(-(lc + self.ht_cap) // 1024) * 1024,
                ht_cap=self.ht_cap,
                e_max=plan_event_budget(self.profile, lc),
                fastq=self.fastq,
                perfect=self.perfect,
                circular_dna=self.circular_dna,
                min_len=self.min_len,
                max_len=self.max_len,
                median_len=self.median_len,
                sd_len=self.sd_len,
                kmer_bias=self.kmer_bias,
                hp_r_max=max(128, lc // 32),
                use_pallas_gather=self._pallas_gather_ok(lc),
            )
        return fns

    def run(self, n_reads: int, writer, seed: int = 0, max_batches: Optional[int] = None,
            bucketed: Optional[bool] = None, resume_state: Optional[str] = None):
        """Simulate n_reads aligned reads into `writer`.

        resume_state: path to a (slot cursor, accepted) checkpoint file; if
        it exists the run continues from it (callers must open the output
        files in append mode), and it is updated after every batch."""
        buckets = self.plan_buckets()
        if bucketed is None:
            # measured on TPU v5e: the batch program has ~50% width-independent
            # cost (walk, RNG, fixed overheads), so a 0.55x small bucket only
            # shaves ~20% off its program while adding routing round trips and
            # pipeline bubbles — slower end to end than the flat 1-deep
            # pipeline.  Bucketing stays available for explicit opt-in (it
            # pays off when the length distribution is extremely heavy-tailed,
            # small/big < 0.3).  NANOSIM_TPU_BUCKETED=1 forces it on for
            # measurement without touching call sites.
            bucketed = os.environ.get("NANOSIM_TPU_BUCKETED", "") == "1"
        base = rng.base_key(seed, rng.STREAM_ALIGNED)
        from .output import CompactFetcher, PipelinedFetcher

        with_events = getattr(writer, "error_log", None) is not None and not self.perfect
        hp_mode = self.kmer_bias is not None and not self.perfect
        recon_mode = False
        if True:  # recon probe (hp falls back to the padded fetch below)
            from .bundles import FULL_EVENT_SLACK, estimate_mean_aligned, estimate_mean_match

            est_bases = estimate_mean_aligned(self.profile) * 1.1 + 64
            est_events = est_bases / (estimate_mean_match(self.profile) + 1.0)
            replayer = None
            p = self.profile
            # the walk replayer elides the event transfer (error log) and is
            # the prerequisite for full host read RECONSTRUCTION (FASTQ
            # qualities reconstruct too: counter-addressed draws through the
            # exact QualDevice breakpoint table).  -hp reconstructs as well:
            # suppression, pass-1 mutation and the exact-table run resizing
            # all replay host-side (sim/reconstruct.reconstruct_hp_lane)
            want_recon = (
                not self.circular_dna
                and (not self.fastq or p.base_quals is not None)
                and (not hp_mode or p.hp_params is not None)
                and os.environ.get("NANOSIM_TPU_RECON", "1") != "0"
            )
            if self.perfect:
                # no walk ran: a stand-in replayer verifies zero events and
                # the C++ recon spec degenerates to extraction + strand
                if want_recon:
                    from ..io.native import PerfectReplayer, get_lib

                    if get_lib() is not None:
                        replayer = PerfectReplayer()
            elif ((with_events or want_recon)
                    and p.first_match is not None and p.match_markov is not None
                    and p.mix_params is not None and p.trans_error is not None):
                from ..io.native import WalkReplayer, get_lib

                if get_lib() is not None:
                    replayer = WalkReplayer(
                        self.profile, seed, rng.STREAM_ALIGNED, rng.SITE_WALK,
                        e_guard=plan_event_budget(self.profile, self.l_cap,
                                                  slack=FULL_EVENT_SLACK),
                    )
            recon_mode = want_recon and replayer is not None
            if hp_mode and not recon_mode:
                # -hp without reconstruction needs the pre-resize middle
                # buffer (ground-truth log) and the device-materialized read
                make_fetcher = lambda replay=False: PipelinedFetcher(
                    self.fastq, with_events, with_prehp=True)
            else:
                make_fetcher = lambda replay=False: CompactFetcher(
                    self.fastq, with_events, self.batch, est_bases, est_events,
                    replayer=replayer if replay else None,
                    with_reads=not (recon_mode and replay),
                    recon_info=(seed, rng.STREAM_ALIGNED, self.ht_cap),
                    lazy_replay=replay,
                )
        fn = self.batch_fn(emit_reads=not recon_mode)
        if bucketed and len(buckets) > 1:
            return self._run_bucketed(n_reads, writer, base, buckets, make_fetcher,
                                      resume_state=resume_state,
                                      max_blocks=max_batches)

        fetcher = make_fetcher(replay=True)
        rescue_fetcher = make_fetcher
        if hp_mode and recon_mode:
            # rescued -hp lanes materialize on device and must carry the
            # pre-resize middle buffer so the dict write path logs them
            rescue_fetcher = lambda replay=False: PipelinedFetcher(
                self.fastq, with_events, with_prehp=True)
        wrapped = OverflowRescueWriter(self, writer, base, rescue_fetcher)

        if recon_mode:
            # warm starts: a stored jax.export artifact skips trace+lower
            from . import aot

            ex_slots = jnp.arange(self.batch, dtype=jnp.int64)
            g = self.genome_host
            host_material = (
                np.asarray(g.offsets), np.asarray(g.lengths),
                np.asarray(g.circular), np.asarray(g.flat),
                _profile_host_arrays(self.profile),
            )
            afn = aot.maybe_aot(fn, BatchOut, (base, ex_slots),
                                host_material=host_material)
            if afn is not None:
                fn = afn

        def make_batch(slot_start):
            slots = np.arange(slot_start, slot_start + self.batch, dtype=np.int64)
            h = fetcher.dispatch(fn(base, jnp.asarray(slots)))
            h.slots = slots
            return h

        state = ResumeState(resume_state) if resume_state else None
        return run_prefetched(make_batch, self.batch, n_reads, wrapped, self,
                              max_batches, state=state)

    def _run_bucketed(self, n_reads: int, writer, base, buckets, make_fetcher,
                      resume_state=None, max_blocks=None) -> int:
        """Block-synchronous bucket scheduler.

        Per block of slots: a cheap length-draw pass (dispatched one block
        ahead) routes each slot to the smallest bucket whose capacity covers
        its drawn length; every bucket batch is dispatched (with its eager
        pack programs) before any is fetched; accepted lanes are merged back
        into global slot order for deterministic numbering, and
        capacity-overflow lanes are re-run in the big bucket (identical
        slot-keyed draws, so the replayed read is the one the big bucket
        would have produced).
        """
        small, big = buckets[0], buckets[-1]
        fns = self.bucket_fns(buckets)
        # rescue program: big bucket width + full event budget (must match the
        # flat path's overflow semantics exactly)
        from .bundles import FULL_EVENT_SLACK

        RESCUE = -1
        fns[RESCUE] = functools.partial(
            genome_batch,
            genome=self.genome_dev,
            tables=self.tables,
            l_cap=big,
            l_out=-(-(big + self.ht_cap) // 1024) * 1024,
            ht_cap=self.ht_cap,
            e_max=plan_event_budget(self.profile, big, slack=FULL_EVENT_SLACK),
            fastq=self.fastq,
            perfect=self.perfect,
            circular_dna=self.circular_dna,
            min_len=self.min_len,
            max_len=self.max_len,
            median_len=self.median_len,
            sd_len=self.sd_len,
            kmer_bias=self.kmer_bias,
            hp_r_max=(big // max(self.kmer_bias, 1) + 1)
            if self.kmer_bias else max(128, big // 32),
            use_pallas_gather=False,  # rescue must not re-trigger window overflow
        )
        thresh = (small - self.BUCKET_PAD) / self.BUCKET_MARGIN

        # per-bucket fetchers: replay-backed compact transfers for the
        # primary buckets (caps lock per bucket), plain events transfer for
        # the rare rescue program
        fetchers = {lc: make_fetcher(replay=True) for lc in buckets}
        if self.kmer_bias is not None and not self.perfect:
            from .output import PipelinedFetcher

            with_ev = getattr(writer, "error_log", None) is not None
            fetchers[RESCUE] = PipelinedFetcher(self.fastq, with_ev, with_prehp=True)
        else:
            fetchers[RESCUE] = make_fetcher(replay=False)

        @jax.jit
        def draw_lengths(slots):
            sk = rng.slot_keys(base, slots)
            return _kde_draw(sk, rng.SITE_REF_LENGTH, self.tables.kde_aligned, 1)[:, 0]

        B = self.batch
        block = B * 4

        def dispatch_chunks(arr, lc):
            out = []
            for i in range(0, len(arr), B):
                ch = arr[i : i + B]
                n_real = len(ch)
                if n_real < B:
                    ch = np.concatenate(
                        [ch, np.full(B - n_real, ch[-1] if n_real else 0, np.int64)]
                    )
                h = fetchers[lc].dispatch(fns[lc](base, jnp.asarray(ch)))
                h.slots = ch  # walk replay keys off global slot ids
                out.append((h, ch, n_real, lc))
            return out

        state = ResumeState(resume_state) if resume_state else None
        c0 = state.slot_start if state else 0

        def block_stream():
            """Route + dispatch one block ahead of consumption so the device
            stream always has the next block's programs queued while the
            current block's results transfer and emit."""
            c = c0
            pending_draw = draw_lengths(jnp.asarray(np.arange(c, c + block, dtype=np.int64)))
            while True:
                slots = np.arange(c, c + block, dtype=np.int64)
                c += block
                m = np.asarray(pending_draw)
                pending_draw = draw_lengths(
                    jnp.asarray(np.arange(c, c + block, dtype=np.int64))
                )
                small_slots = slots[m <= thresh]
                big_slots = slots[m > thresh]
                yield dispatch_chunks(small_slots, small) + (
                    dispatch_chunks(big_slots, big) if len(big_slots) else []
                )

        accepted = state.accepted if state else 0
        consumed = 0
        stream = block_stream()
        dispatched = next(stream)
        while accepted < n_reads:
            nxt = next(stream)

            entries = []  # (slot, dict, lane)
            rerun_slots = []
            for h, ch, n_real, lc in dispatched:
                d = h.fetch()
                for lane in range(n_real):
                    if d["cap_over"][lane]:
                        rerun_slots.append(ch[lane])
                    elif d["valid"][lane]:
                        entries.append((ch[lane], d, lane))
            dispatched = nxt

            # rerun capacity overflows (width or walk budget) through the
            # full-budget rescue program — identical semantics to the flat
            # path's OverflowRescueWriter (rare: routing and the lean event
            # budget both carry slack)
            if rerun_slots:
                from .output import RUN_STATS

                RUN_STATS.overflow_rescue_lanes += len(rerun_slots)
                for h, ch, n_real, lc in dispatch_chunks(
                    np.asarray(rerun_slots, np.int64), RESCUE
                ):
                    d = h.fetch()
                    for lane in range(n_real):
                        if d["valid"][lane] and not d["cap_over"][lane]:
                            entries.append((ch[lane], d, lane))

            entries.sort(key=lambda e: e[0])
            from .output import report_progress

            prev_acc = accepted
            if hasattr(writer, "write_entries"):
                accepted += writer.write_entries(self, entries, accepted, n_reads)
                report_progress(prev_acc, accepted)
            else:
                # group consecutive same-dict runs for batch emission
                i = 0
                while i < len(entries) and accepted < n_reads:
                    j = i
                    d = entries[i][1]
                    lanes = []
                    while j < len(entries) and entries[j][1] is d:
                        lanes.append(entries[j][2])
                        j += 1
                    lanes = np.asarray(lanes[: n_reads - accepted], np.int64)
                    accepted += writer.write_run(self, d, lanes, accepted)
                    i = j
                report_progress(prev_acc, accepted)
            consumed += 1
            if state is not None:
                # per-block checkpoint: the next run re-routes from this
                # block cursor with identical slot-keyed draws
                state.checkpoint(writer, c0 + consumed * block, accepted)
            if max_blocks is not None and consumed >= max_blocks:
                break
        return accepted
