"""Intron retention: per-read Markov walk over transcript structures and
genome-interval extraction.

Reference behavior (simulator.py:114-191, 1156-1181):

  - per read, walk the transcript's introns through the IR Markov chain
    (update_structure); if any intron is retained, the read is extracted from
    the GENOME over the exon/retained-intron intervals instead of from the
    transcript sequence (extract_read_pos + per-interval faidx fetch);
  - the start position is uniform in [0, min(trx_len - length, len_before)]
    where len_before is the exonic length before the first retained intron
    (so the retained intron is covered);
  - '-'-strand structures are reverse-complemented after concatenation;
  - polyA is retained when the last interval reaches within 10 bp of the
    structure's genomic end.

Structures are CSR tables over features; the per-read walks are lax.scans of
F_max steps, and the interval->base mapping is a diff-scatter + cumsum over
read positions (the same trick as apply_errors), so extraction is one genome
gather — the reference's per-read faidx fetches (simulator.py:1172) become
batched HBM reads.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rng
from . import extract

IR_NO, IR_YES = 0, 1  # column order in the IR markov table
MAX_IR_OUT = 16  # retained-intron intervals reported in read names


@dataclasses.dataclass
class IRTables:
    """CSR feature tables aligned with the packed transcriptome's order."""

    feat_offset: jax.Array  # [n_trx + 1] i32
    is_intron: jax.Array  # [F] bool
    chrom: jax.Array  # [F] i32 genome chromosome index
    start: jax.Array  # [F] i64 genomic start
    length: jax.Array  # [F] i32
    n_feats: jax.Array  # [n_trx] i32
    strand_neg: jax.Array  # [n_trx] bool
    last_end: jax.Array  # [n_trx] i64 genomic end of the final feature
    ir_cum: jax.Array  # [3] cum prob of IR given state (start, no_IR, IR)
    f_max: int  # static

    @classmethod
    def build(cls, structures, trx_names, genome_names, ir_markov: np.ndarray, spliced_lens):
        """From profiles.TranscriptStructures; returns (tables, eligible_mask).

        Eligible transcripts (simulator.py:1094-1100): structure present,
        exonic length == transcript length, and every chromosome resolvable.
        """
        name_to_idx = {}
        for i, nm in enumerate(genome_names):
            name_to_idx[nm] = i
            if "chr" in nm:
                name_to_idx[nm.strip("chr")] = i
        n_trx = len(trx_names)
        offs = [0]
        is_int, chrom, start, length = [], [], [], []
        n_feats = np.zeros(n_trx, np.int32)
        strand_neg = np.zeros(n_trx, bool)
        last_end = np.zeros(n_trx, np.int64)
        eligible = np.zeros(n_trx, bool)
        for ti, nm in enumerate(trx_names):
            feats = structures.by_transcript.get(nm.split(".")[0], [])
            exon_len = sum(f[4] for f in feats if f[0] == "exon")
            ok = bool(feats) and exon_len == int(spliced_lens[ti])
            ok = ok and all(f[1] in name_to_idx for f in feats)
            if ok:
                eligible[ti] = True
                for f in feats:
                    is_int.append(f[0] == "intron")
                    chrom.append(name_to_idx[f[1]])
                    start.append(f[2])
                    length.append(f[4])
                n_feats[ti] = len(feats)
                strand_neg[ti] = feats[-1][5] == "-"
                last_end[ti] = feats[-1][3]
            offs.append(len(is_int))
        f_max = int(n_feats.max()) if n_feats.max() > 0 else 1
        ir_cum = np.cumsum(ir_markov, axis=1)[:, 0]  # P(no_IR | state)
        tables = cls(
            feat_offset=jnp.asarray(offs, jnp.int32),
            is_intron=jnp.asarray(np.array(is_int, bool) if is_int else np.zeros(1, bool)),
            chrom=jnp.asarray(np.array(chrom, np.int32) if chrom else np.zeros(1, np.int32)),
            start=jnp.asarray(np.array(start, np.int64) if start else np.zeros(1, np.int64)),
            length=jnp.asarray(np.array(length, np.int32) if length else np.zeros(1, np.int32)),
            n_feats=jnp.asarray(n_feats),
            strand_neg=jnp.asarray(strand_neg),
            last_end=jnp.asarray(last_end),
            ir_cum=jnp.asarray(ir_cum, jnp.float32),
            f_max=f_max,
        )
        return tables, eligible


jax.tree_util.register_pytree_node(
    IRTables,
    lambda t: (
        (t.feat_offset, t.is_intron, t.chrom, t.start, t.length, t.n_feats,
         t.strand_neg, t.last_end, t.ir_cum),
        (t.f_max,),
    ),
    lambda aux, data: IRTables(*data, f_max=aux[0]),
)


def ir_walk_and_extract(sk, trx, middle_ref, trx_len, t: IRTables, genome: extract.GenomeDevice, l_cap: int):
    """IR decision + genome-interval extraction for a batch.

    Returns (seg [B, l_cap] uint8, rep_pos [B] i64 first-interval start,
    extracted_len [B] i32, has_ir [B] bool, ir_intervals [B, MAX_IR_OUT, 2],
    n_ir [B] i32, reach_end [B] bool).
    """
    B = trx.shape[0]
    F = t.f_max
    ir_keys = rng.site_keys(sk, rng.SITE_IR)
    base_off = t.feat_offset[trx]
    nf = t.n_feats[trx]

    # --- phase 1: intron retention states (update_structure) ---------------
    def step1(carry, f):
        prev_state, retained = carry
        fi = base_off + jnp.minimum(f, nf - 1)
        active = f < nf
        is_int = t.is_intron[fi] & active
        u = jax.vmap(
            lambda k: jax.random.uniform(jax.random.fold_in(k, f), dtype=jnp.float32)
        )(ir_keys)
        goes_ir = u >= t.ir_cum[prev_state]
        new_state = jnp.where(is_int, jnp.where(goes_ir, 2, 1), prev_state)
        ret_here = is_int & goes_ir
        retained = jax.lax.dynamic_update_slice(
            retained, ret_here[:, None], (jnp.int32(0), f)
        )
        return (new_state, retained), None

    init = (jnp.zeros(B, jnp.int32), jnp.zeros((B, F), bool))
    (state, retained), _ = jax.lax.scan(step1, init, jnp.arange(F, dtype=jnp.int32))
    has_ir = retained.any(axis=1)

    # --- len_before: exonic length before the first retained intron --------
    feat_ids = base_off[:, None] + jnp.minimum(
        jnp.arange(F, dtype=jnp.int32)[None, :], (nf - 1)[:, None]
    )
    f_act = jnp.arange(F, dtype=jnp.int32)[None, :] < nf[:, None]
    f_int = t.is_intron[feat_ids] & f_act
    f_len = jnp.where(f_act, t.length[feat_ids], 0)
    before_first_ret = jnp.cumsum(retained.astype(jnp.int32), axis=1) == 0
    len_before = jnp.sum(
        jnp.where(before_first_ret & ~f_int, f_len, 0), axis=1
    ).astype(jnp.int32)

    # --- start position (extract_read_pos, simulator.py:162) ---------------
    u_pos = jax.vmap(
        lambda k: jax.random.uniform(jax.random.fold_in(k, F + 1), dtype=jnp.float64)
    )(ir_keys)
    hi = jnp.maximum(jnp.minimum(trx_len - middle_ref, len_before), 0)
    start_pos = jnp.minimum((u_pos * (hi + 1)).astype(jnp.int32), hi)

    # --- phase 2: interval walk --------------------------------------------
    # usable features = exons + retained introns; skipped introns vanish
    usable = f_act & (~f_int | retained)
    u_len = jnp.where(usable, f_len, 0)
    # consume start_pos, then take bases until middle_ref is exhausted
    cum_before = jnp.cumsum(u_len, axis=1) - u_len  # usable length before f
    # offset into feature f after skipping start_pos
    skip = jnp.clip(start_pos[:, None] - cum_before, 0, u_len)
    avail = u_len - skip
    cum_avail = jnp.cumsum(jnp.where(usable, avail, 0), axis=1)
    taken_end = jnp.minimum(cum_avail, middle_ref[:, None])
    taken_start = jnp.minimum(cum_avail - avail, middle_ref[:, None])
    take = jnp.where(usable, taken_end - taken_start, 0)  # bases from feature f
    extracted_len = taken_end[:, -1].astype(jnp.int32)

    g_start = t.start[feat_ids] + skip.astype(jnp.int64)  # genomic interval start
    has_take = take > 0

    # read-coordinate offset of each used interval = taken_start
    # diff-scatter genome-position deltas at interval starts, cumsum -> per-
    # base genome position (same trick as apply_errors)
    j = jnp.arange(l_cap, dtype=jnp.int32)[None, :]
    deltas = jnp.zeros((B, l_cap + 1), jnp.int64)
    b_idx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, F))
    # delta at interval k's read start: g_start[k] - (previous g position at
    # that read coordinate, i.e. j + cumulative delta) — encode as absolute:
    # delta_k = g_start[k] - taken_start[k] - (sum of previous deltas)
    # Using differences of (g_start - taken_start): contribution at read pos
    # taken_start[k] is (g_start[k] - taken_start[k]) - (g_start[k-1] -
    # taken_start[k-1]) for used intervals; implement by scattering the
    # per-interval base value at its start and taking a running "last seen"
    # via cummax over (position-tagged) values.
    base_val = g_start - taken_start.astype(jnp.int64)  # gpos = j + base_val
    scatter_pos = jnp.where(has_take, taken_start.astype(jnp.int32), l_cap)
    # Active interval per read position via scatter + running-max forward
    # fill.  Tag layout: taken_start in the high bits (later intervals always
    # win the cummax) | base_val + 2^42 in a 43-bit low field — base_val is
    # bounded by the genome size (|base_val| << 2^41), so the low field stays
    # inside its 43 bits and cannot bleed into taken_start.
    offset_bias = jnp.int64(1) << jnp.int64(42)
    tag = (taken_start.astype(jnp.int64) << jnp.int64(43)) + (base_val + offset_bias)
    tagged = jnp.full((B, l_cap + 1), jnp.int64(-1))
    tagged = tagged.at[b_idx, jnp.clip(scatter_pos, 0, l_cap)].max(
        jnp.where(has_take, tag, -1)
    )
    filled = jax.lax.cummax(tagged[:, :l_cap], axis=1)
    base_at_j = (filled & ((jnp.int64(1) << jnp.int64(43)) - 1)) - offset_bias
    gpos = j.astype(jnp.int64) + base_at_j

    chrom0 = t.chrom[base_off]  # transcripts live on one chromosome
    goff = genome.offsets[chrom0][:, None]
    glen = genome.lengths[chrom0][:, None]
    idx = goff + jnp.clip(gpos, 0, glen - 1)
    seg = jnp.take(genome.flat, idx, mode="clip")
    in_seg = j < extracted_len[:, None]
    seg = jnp.where(in_seg, seg, jnp.uint8(0))

    # '-'-strand: reverse complement the extracted block (simulator.py:1177-1178)
    from ..ops import seqops

    neg = t.strand_neg[trx]
    rc = seqops.reverse_complement(seg, extracted_len)
    seg = jnp.where(neg[:, None], rc, seg)

    # polyA reach test: last interval's genomic end + 10 >= structure end
    last_g_end = jnp.max(jnp.where(has_take, g_start + take.astype(jnp.int64), -1), axis=1)
    reach_end = last_g_end + 10 >= t.last_end[trx]

    # retained-intron intervals actually used (for read names)
    ret_used = retained & has_take
    ivl_start = jnp.where(ret_used, g_start, 0)
    ivl_end = jnp.where(ret_used, g_start + take.astype(jnp.int64), 0)
    order = jnp.argsort(~ret_used, axis=1, stable=True)[:, :MAX_IR_OUT]
    ir_intervals = jnp.stack(
        [jnp.take_along_axis(ivl_start, order, axis=1),
         jnp.take_along_axis(ivl_end, order, axis=1)],
        axis=2,
    )
    n_ir = jnp.sum(ret_used, axis=1).astype(jnp.int32)

    rep_pos = jnp.where(has_ir, jnp.min(jnp.where(has_take, g_start, 2**62), axis=1), 0)
    # per-feature (genomic start, taken length) — the host-reconstruction
    # path rebuilds the source bytes from these instead of re-walking
    feat_start = jnp.where(has_take, g_start, 0)
    feat_take = jnp.where(has_take, take, 0).astype(jnp.int32)
    return (seg, rep_pos, extracted_len, has_ir, ir_intervals, n_ir, reach_end,
            feat_start, feat_take)
