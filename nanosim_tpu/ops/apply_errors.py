"""Vectorized error application: event lists -> per-base gather maps.

The reference's `mutate_read` (simulator.py:1919-2015) splices Python strings
per error, walking events in reverse position order.  Because events never
overlap and positions refer to the *original* extracted slice, the whole edit
script can be applied in one shot:

  1. scatter events into per-ref-position difference arrays
     (deleted-range, mismatched-range, insertion-count-before-position);
  2. prefix sums give, for every kept ref base i, its read position
         r(i) = i - (#deleted before i) + (#inserted at or before i);
  3. scattering i into r(i) yields, for every read position j, its source ref
     index (or "insertion") and base class {match, mis, ins}.

Everything is [B, L] elementwise/cumsum/scatter work — no per-read loops.

Insertion key convention (`pos2x`, half-position fixed point): an insertion
with key K in the reference (K = pos - 0.5 aligned, pos + 0.1 unaligned)
inserts before ref index ceil(K) = (pos2x + 1) // 2.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

CLASS_MATCH, CLASS_MIS, CLASS_INS = 0, 1, 2


def effective_lens(ev_pos2x, ev_type, ev_len, ev_valid, dedup_ins: bool = True):
    """Reference dict-overwrite semantics for duplicate insertion keys.

    The reference stores events as `e_dict[pos - 0.5] = [type, len]`
    (simulator.py:1880-1882): consecutive insertions separated by zero-length
    matches share the key, so every one but the LAST is silently overwritten
    — it contributes to error_list's l_new (the first length filter) but is
    never spliced into the read nor logged.  Mirror that by zeroing the
    length of any insertion whose successor is an insertion with the same
    position key.  (mis/del advance the position, so only insertions can
    collide; colliding events are always adjacent.)

    dedup_ins=False leaves lengths untouched: the UNALIGNED walk's reference
    counterpart MERGES consecutive insertions into one dict entry
    (simulator.py:1810-1814), which adjacent same-key events already model.
    """
    if not dedup_ins:
        return ev_len
    nxt_ins = jnp.concatenate(
        [(ev_type[:, 1:] == 1) & ev_valid[:, 1:], jnp.zeros_like(ev_valid[:, :1])],
        axis=1,
    )
    nxt_same = jnp.concatenate(
        [ev_pos2x[:, 1:] == ev_pos2x[:, :-1], jnp.zeros_like(ev_valid[:, :1])], axis=1
    )
    dead = (ev_type == 1) & ev_valid & nxt_ins & nxt_same
    return jnp.where(dead, 0, ev_len)


class GatherMap(NamedTuple):
    """Per-output-base construction recipe.

    src:    [B, L_read] int32 — source ref index, or -1 for inserted bases.
    src_left: [B, L_read] int32 — the uncensored shift map: for inserted
        positions this resolves to the ref base just LEFT of the insertion
        point (used by homopolymer extension to replicate the run base).
    qclass: [B, L_read] int32 — CLASS_MATCH / CLASS_MIS / CLASS_INS.
    valid:  [B, L_read] bool — j < read length.
    read_len: [B] int32.
    """

    src: jax.Array
    src_left: jax.Array
    qclass: jax.Array
    valid: jax.Array
    read_len: jax.Array


@functools.partial(jax.jit, static_argnames=("l_read", "dedup_ins"))
def build_gather_map(
    events_pos2x: jax.Array,  # [B, E] int32
    events_type: jax.Array,  # [B, E] int32 (0=mis 1=ins 2=del)
    events_len: jax.Array,  # [B, E] int32
    events_valid: jax.Array,  # [B, E] bool
    middle_ref: jax.Array,  # [B] int32
    l_read: int,  # static output capacity; also bounds ref length
    dedup_ins: bool = True,
) -> GatherMap:
    B, _ = events_pos2x.shape
    L = l_read
    b_idx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], events_pos2x.shape)

    events_len = effective_lens(events_pos2x, events_type, events_len, events_valid,
                                dedup_ins)
    is_mis = events_valid & (events_type == 0)
    is_ins = events_valid & (events_type == 1)
    is_del = events_valid & (events_type == 2)

    start = events_pos2x // 2  # mis/del start (pos2x even)
    ins_before = (events_pos2x + 1) // 2  # insertion target index

    # Per-event READ-coordinate starts via cumulative sums over the (small)
    # event axis: read_start(e) = ref_start(e) - dels_before(e) + ins_before(e).
    dlen = jnp.where(is_del, events_len, 0)
    ilen = jnp.where(is_ins, events_len, 0)
    prior_del = jnp.cumsum(dlen, axis=1) - dlen
    prior_ins = jnp.cumsum(ilen, axis=1) - ilen
    ref_start = jnp.where(is_ins, ins_before, start)
    rpos = ref_start - prior_del + prior_ins  # [B, E]

    # Everything else lives in READ coordinates, built from E-sized scatters
    # and [B, L] cumsums only (no [B, L] scatters or binary searches — both
    # serialize badly on TPU):
    #   ins/mis events occupy read spans [rpos, rpos + len);
    #   deletions are zero-width points at rpos carrying weight len.
    def span_mask(flag):
        diff = jnp.zeros((B, L + 1), jnp.int32)
        f = flag.astype(jnp.int32)
        diff = diff.at[b_idx, jnp.clip(rpos, 0, L)].add(f)
        diff = diff.at[b_idx, jnp.clip(rpos + events_len, 0, L)].add(-f)
        return jnp.cumsum(diff[:, :L], axis=1) > 0

    ins_mask = span_mask(is_ins)  # read positions holding inserted bases
    mis_mask = span_mask(is_mis)  # read positions holding substituted bases

    del_pts = jnp.zeros((B, L + 1), jnp.int32)
    del_pts = del_pts.at[b_idx, jnp.clip(rpos, 0, L)].add(jnp.where(is_del, events_len, 0))
    D = jnp.cumsum(del_pts[:, :L], axis=1)  # deleted ref bases before-or-at j
    I = jnp.cumsum(ins_mask.astype(jnp.int32), axis=1)  # inserted read bases <= j

    j_idx = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None, :], (B, L))
    # For a kept read position j, its source ref index is j shifted by the
    # net indel displacement accumulated so far.
    src_kept = j_idx - I + D
    src = jnp.where(ins_mask, -1, src_kept)
    # within an insertion span the same algebra resolves to (insertion point
    # - 1), i.e. the ref base to the left — keep it for hp extensions
    src_left = jnp.where(ins_mask, src_kept - 1, src_kept)
    cls = jnp.where(ins_mask, CLASS_INS, jnp.where(mis_mask, CLASS_MIS, CLASS_MATCH))

    tot_del = jnp.sum(dlen, axis=1)
    tot_ins = jnp.sum(ilen, axis=1)
    read_len = (middle_ref - tot_del + tot_ins).astype(jnp.int32)

    valid = j_idx < read_len[:, None]
    src = jnp.where(valid, src, -1)
    return GatherMap(src=src, src_left=src_left, qclass=cls, valid=valid, read_len=read_len)


QCLASS_HT = 3


@functools.partial(jax.jit, static_argnames=("l_read", "p_cap"))
def build_unaligned_map(
    events_pos2x: jax.Array,  # [B, E] int32 (ins at 2*pos + 1)
    events_type: jax.Array,  # [B, E] int32 (0=mis 1=ins 2=del)
    events_len: jax.Array,  # [B, E] int32
    events_valid: jax.Array,  # [B, E] bool
    middle_ref: jax.Array,  # [B] int32
    l_read: int,
    p_cap: int = 0,
):
    """Gather map with the UNALIGNED walk's reference edit semantics.

    The reference keys unaligned insertions at pos + 0.1 (simulator.py:
    1810-1814), so mutate_read's reverse-order splicing makes a mis/del at
    the SAME pos act on L CONTIGUOUS post-insertion positions — starting at
    ref_pos and swallowing the just-inserted bases — not on L reference
    bases (the aligned walk's pos - 0.5 keys cannot overlap this way).
    Model: build the PRESENTATION sequence (ref bases with each ins block
    spliced after its ref_pos - 1 ... i.e. after ref_{pos}), mark mis spans /
    del spans as L contiguous presentation positions from ref_pos, then
    compress deletions out.

    Returns (GatherMap, under_ins [B, l_read] bool) — under_ins marks read
    positions whose PRE-substitution base is an inserted base (qclass says
    MIS there; materialize_read must mutate the ins draw, not the ref).
    """
    B, E = events_pos2x.shape
    P = p_cap or (l_read + (l_read >> 1) + 256)
    L = l_read
    b_idx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, E))

    is_mis = events_valid & (events_type == 0)
    is_ins = events_valid & (events_type == 1)
    is_del = events_valid & (events_type == 2)
    pos = events_pos2x // 2  # walk position of the event (ins: (2p+1)//2 = p)
    ilen = jnp.where(is_ins, events_len, 0)
    prior_ins = jnp.cumsum(ilen, axis=1) - ilen
    # K_same: summed length of the immediately-preceding consecutive ins run
    # (an ins run never spans a pos-advancing event, so consecutive-in-buffer
    # means same walk position)
    r = jnp.cumsum(ilen, axis=1)
    boundary = jnp.where(is_ins, jnp.int32(-1), r)  # value at non-ins steps
    reset = jax.lax.cummax(boundary, axis=1)
    reset_prev = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.maximum(reset[:, :-1], 0)], axis=1
    )
    k_same = (r - ilen) - reset_prev  # ins len accumulated since last non-ins

    # presentation starts
    pres_ins = pos + prior_ins + 1
    pres_err = pos + (prior_ins - k_same)
    pres_start = jnp.where(is_ins, pres_ins, pres_err)
    pres_end = pres_start + jnp.where(events_valid, events_len, 0)

    def span(flag):
        diff = jnp.zeros((B, P + 1), jnp.int32)
        f = flag.astype(jnp.int32)
        diff = diff.at[b_idx, jnp.clip(pres_start, 0, P)].add(f)
        diff = diff.at[b_idx, jnp.clip(pres_end, 0, P)].add(-f)
        return jnp.cumsum(diff[:, :P], axis=1) > 0

    ins_mask = span(is_ins)
    mis_mask = span(is_mis)
    dead = span(is_del)

    j_p = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None, :], (B, P))
    I = jnp.cumsum(ins_mask.astype(jnp.int32), axis=1)
    src_pres = jnp.where(ins_mask, -1, j_p - I)
    tot_ins = jnp.sum(ilen, axis=1)
    pres_len = middle_ref + tot_ins  # total presentation positions
    in_pres = j_p < pres_len[:, None]
    alive = in_pres & ~dead
    read_idx = jnp.cumsum(alive.astype(jnp.int32), axis=1) - 1
    read_len = jnp.sum(alive, axis=1).astype(jnp.int32)
    overflow = pres_len > P

    dst = jnp.where(alive, read_idx, L)
    src = jnp.full((B, L + 1), -1, jnp.int32).at[b_idx_p(B, P), dst].set(
        src_pres, mode="drop")[:, :L]
    misr = jnp.zeros((B, L + 1), bool).at[b_idx_p(B, P), dst].set(
        mis_mask, mode="drop")[:, :L]
    insr = jnp.zeros((B, L + 1), bool).at[b_idx_p(B, P), dst].set(
        ins_mask, mode="drop")[:, :L]

    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < read_len[:, None]
    qclass = jnp.where(misr, CLASS_MIS, jnp.where(insr, CLASS_INS, CLASS_MATCH))
    under_ins = insr
    gm = GatherMap(
        src=jnp.where(valid & ~insr, src, -1),
        src_left=src,
        qclass=qclass,
        valid=valid,
        read_len=read_len,
    )
    return gm, under_ins, overflow


def b_idx_p(B, P):
    return jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, P))


@functools.partial(jax.jit, static_argnames=("l_out", "use_pallas"))
def fused_read(
    events_pos2x: jax.Array,  # [B, E] int32
    events_type: jax.Array,  # [B, E] int32 (0=mis 1=ins 2=del)
    events_len: jax.Array,  # [B, E] int32
    events_valid: jax.Array,  # [B, E] bool
    middle_ref: jax.Array,  # [B] int32
    head: jax.Array,  # [B] int32
    tail: jax.Array,  # [B] int32
    is_rev: jax.Array,  # [B] bool
    ref_seg: jax.Array,  # [B, Lr] uint8 ASCII (IUPAC-resolved)
    seg_off,  # [B] int32 or None — intra-chunk offset into ref_seg
    ht_bases: jax.Array,  # [B, ht_cap] uint8 ASCII random bases
    u_mis: jax.Array,  # [B, l_out] uniforms, substituted-base choice
    u_ins: jax.Array,  # [B, l_out] uniforms, inserted-base choice
    l_out: int,
    use_pallas: bool = False,
):
    """Mutation + head/tail assembly + strand flip in ONE [B, l_out] gather.

    The two-gather formulation (materialize_read then the assembly shuffle)
    pays twice for TPU's per-element gather cost — the dominant device cost
    at ~85M elem/s.  Here every map is built directly in FINAL OUTPUT
    coordinates: event spans and deletion points are scattered at
    strand-selected positions (reversed lanes scatter at mirrored indices),
    the indel-displacement prefix sums run once over [B, l_out] (streaming
    ops at ~1G elem/s), and a single gather fetches each output base from
    concat(ref_seg, ht_bases).  Substitution/insertion uniforms are indexed
    by OUTPUT position (part of this framework's documented RNG contract).

    Returns (read [B, l_out] u8, qclass [B, l_out] i32 with head/tail = 3,
    l_new [B] i32, total [B] i32).  Positions >= total are zeroed.
    """
    B, E = events_pos2x.shape
    L = l_out
    Lr = ref_seg.shape[1]
    ht_cap = ht_bases.shape[1]
    b_idx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, E))

    events_len = effective_lens(events_pos2x, events_type, events_len, events_valid)
    is_mis = events_valid & (events_type == 0)
    is_ins = events_valid & (events_type == 1)
    is_del = events_valid & (events_type == 2)

    start = events_pos2x // 2
    ins_before = (events_pos2x + 1) // 2
    dlen = jnp.where(is_del, events_len, 0)
    ilen = jnp.where(is_ins, events_len, 0)
    prior_del = jnp.cumsum(dlen, axis=1) - dlen
    prior_ins = jnp.cumsum(ilen, axis=1) - ilen
    ref_start = jnp.where(is_ins, ins_before, start)
    rpos = ref_start - prior_del + prior_ins  # [B, E] middle read coords

    tot_del = jnp.sum(dlen, axis=1)
    tot_ins = jnp.sum(ilen, axis=1)
    l_new = (middle_ref - tot_del + tot_ins).astype(jnp.int32)
    total = head + l_new + tail

    h = head[:, None]
    n = l_new[:, None]
    t = tail[:, None]
    rev = is_rev[:, None]

    # Event span [a, b) in middle coords -> output coords:
    # forward [h+a, h+b); reversed [n+t-b, n+t-a).
    a = rpos
    b = rpos + events_len
    span_s = jnp.where(rev, n + t - b, h + a)
    span_e = jnp.where(rev, n + t - a, h + b)

    def span_mask(flag):
        diff = jnp.zeros((B, L + 1), jnp.int32)
        f = flag.astype(jnp.int32)
        diff = diff.at[b_idx, jnp.clip(span_s, 0, L)].add(f)
        diff = diff.at[b_idx, jnp.clip(span_e, 0, L)].add(-f)
        return jnp.cumsum(diff[:, :L], axis=1) > 0

    ins_mask = span_mask(is_ins)
    mis_mask = span_mask(is_mis)

    # Deletion weights: forward lanes count dels at output <= j (scatter at
    # h+a, inclusive prefix); reversed lanes count dels at mirrored point
    # >= j (scatter at (n+t-1-a)+1, total minus exclusive prefix).
    del_idx = jnp.where(rev, n + t - a, h + a)
    del_pts = jnp.zeros((B, L + 1), jnp.int32)
    del_pts = del_pts.at[b_idx, jnp.clip(del_idx, 0, L)].add(dlen)
    Dcum = jnp.cumsum(del_pts[:, :L], axis=1)
    D = jnp.where(rev, tot_del[:, None] - Dcum, Dcum)

    Icum = jnp.cumsum(ins_mask.astype(jnp.int32), axis=1)
    I = jnp.where(rev, tot_ins[:, None] - (Icum - ins_mask), Icum)

    j_idx = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None, :], (B, L))
    # pre-reverse coordinate and regions
    in_mid = jnp.where(rev, (j_idx >= t) & (j_idx < t + n), (j_idx >= h) & (j_idx < h + n))
    in_head = jnp.where(rev, j_idx >= n + t, j_idx < h)
    m = jnp.where(rev, n + t - 1 - j_idx, j_idx - h)

    src_mid = m - I + D
    if seg_off is not None:
        src_mid = src_mid + seg_off[:, None]
    src_mid = jnp.clip(src_mid, 0, Lr - 1)
    ht_idx = jnp.where(
        in_head,
        jnp.where(rev, t + n + h - 1 - j_idx, j_idx),
        jnp.where(rev, h + t - 1 - j_idx, j_idx - n),
    )
    ht_idx = jnp.clip(ht_idx, 0, ht_cap - 1)
    idx = jnp.where(in_mid, src_mid, Lr + ht_idx)

    parts = jnp.concatenate([ref_seg, ht_bases], axis=1)
    if use_pallas == "packed":
        # 2-bit payload: gather packed code words (8x narrower one-hot)
        from . import pallas_gather

        code = pallas_gather.gather_codes(
            _ascii_to_code(parts).astype(jnp.int32), idx
        ).astype(jnp.uint8)
    elif use_pallas:
        from . import pallas_gather

        base = pallas_gather.gather_u8(parts, idx)
        code = _ascii_to_code(base)
    else:
        base = jnp.take_along_axis(parts, idx, axis=1)
        code = _ascii_to_code(base)

    mis_off = 1 + jnp.floor(u_mis * 3.0).astype(jnp.uint8)
    mis_code = (code + jnp.minimum(mis_off, 3)) % 4
    ins_code = jnp.minimum(jnp.floor(u_ins * 4.0).astype(jnp.uint8), 3)
    mid_ins = in_mid & ins_mask
    mid_mis = in_mid & mis_mask & ~ins_mask
    out_code = jnp.where(mid_mis, mis_code, code)
    out_code = jnp.where(mid_ins, ins_code, out_code)
    # complement == 3 - code for A=0 C=1 G=2 T=3
    out_code = jnp.where(rev, 3 - out_code, out_code)

    in_read = j_idx < total[:, None]
    read = jnp.where(in_read, _code_to_ascii(out_code), jnp.uint8(0))
    qclass = jnp.where(
        mid_ins, CLASS_INS,
        jnp.where(mid_mis, CLASS_MIS, jnp.where(in_mid, CLASS_MATCH, QCLASS_HT)),
    )
    return read, qclass, l_new, total


def _pack_codes4(ascii_seq):
    """[B, L] ASCII -> [B, ceil(L/4)] packed 2-bit codes (4/byte, LE)."""
    B, L = ascii_seq.shape
    pad = (-L) % 4
    if pad:
        ascii_seq = jnp.pad(ascii_seq, ((0, 0), (0, pad)))
    c = _ascii_to_code(ascii_seq).reshape(B, (L + pad) // 4, 4)
    return (
        c[:, :, 0]
        | (c[:, :, 1] << jnp.uint8(2))
        | (c[:, :, 2] << jnp.uint8(4))
        | (c[:, :, 3] << jnp.uint8(6))
    )


# random_bases draws over (A, T, C, G) — np.random.choice order
# (seqops.random_bases) — map that choice index to 2-bit code A=0 C=1 G=2 T=3.
def _choice_to_code(idx):
    return jnp.where(idx == 0, jnp.uint8(0),
                     jnp.where(idx == 1, jnp.uint8(3),
                               jnp.where(idx == 2, jnp.uint8(1), jnp.uint8(2))))


@functools.partial(jax.jit, static_argnames=("l_out", "ht_cap", "ht_site", "use_window"))
def fused_read_v2(
    events_pos2x: jax.Array,  # [B, E] int32
    events_type: jax.Array,  # [B, E] int32 (0=mis 1=ins 2=del)
    events_len: jax.Array,  # [B, E] int32
    events_valid: jax.Array,  # [B, E] bool
    middle_ref: jax.Array,  # [B] int32
    head: jax.Array,  # [B] int32
    tail: jax.Array,  # [B] int32
    is_rev: jax.Array,  # [B] bool
    ref_codes: jax.Array,  # [B, PB] uint8 packed 2-bit ref codes (IUPAC-resolved)
    n_ref_codes: int,  # logical code count (< 4 * PB)
    seg_off,  # [B] int32 or None — code offset of the segment in the row
    sk: jax.Array,  # [B, 2] slot keys (head/tail base generation)
    u_mis: jax.Array,  # [B, l_out] uniforms, substituted-base choice
    u_ins: jax.Array,  # [B, l_out] uniforms, inserted-base choice
    l_out: int,
    ht_cap: int,
    ht_site: int = 10,  # rng.SITE_HEAD_TAIL
    use_window: bool = False,
):
    """fused_read, round 2: same output bytes, less device work.

    vs fused_read:
      * 3 scatters instead of 5 — span starts and deletion points share one
        index array (a deletion's span is zero-width in read coordinates, so
        its span-start is redefined to its deletion point), with the
        ins/mis start flags packed into one word (at most one ins and one
        mis span can START at a given output position — events advance
        their read coordinate — so 1-bit fields cannot carry);
      * head/tail bases are GENERATED at their output positions via
        counter-addressed threefry (rng.uniform_at — bit-identical to
        gathering the SITE_HEAD_TAIL pool), removing the ht concat and
        keeping gather indices near-contiguous;
      * the byte fetch runs on 2-bit packed codes, optionally through the
        windowed Pallas one-hot kernel (ops/window_gather).

    Returns (read, qclass, l_new, total, win_overflow[B]) — win_overflow
    lanes exceeded the gather window (extreme local indel drift) and must be
    re-run through a fallback program.
    """
    from . import rng as rng_mod

    B, E = events_pos2x.shape
    L = l_out
    b_idx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, E))

    events_len = effective_lens(events_pos2x, events_type, events_len, events_valid)
    is_mis = events_valid & (events_type == 0)
    is_ins = events_valid & (events_type == 1)
    is_del = events_valid & (events_type == 2)

    start = events_pos2x // 2
    ins_before = (events_pos2x + 1) // 2
    dlen = jnp.where(is_del, events_len, 0)
    ilen = jnp.where(is_ins, events_len, 0)
    prior_del = jnp.cumsum(dlen, axis=1) - dlen
    prior_ins = jnp.cumsum(ilen, axis=1) - ilen
    ref_start = jnp.where(is_ins, ins_before, start)
    rpos = ref_start - prior_del + prior_ins  # [B, E] middle read coords

    tot_del = jnp.sum(dlen, axis=1)
    tot_ins = jnp.sum(ilen, axis=1)
    l_new = (middle_ref - tot_del + tot_ins).astype(jnp.int32)
    total = head + l_new + tail

    h = head[:, None]
    n = l_new[:, None]
    t = tail[:, None]
    rev = is_rev[:, None]

    # deletions are zero-width in read coords: give them b == a so their
    # span start IS their deletion point (same index for both scatters)
    a = rpos
    b = jnp.where(is_del, rpos, rpos + events_len)
    span_s = jnp.where(rev, n + t - b, h + a)
    span_e = jnp.where(rev, n + t - a, h + b)

    f_ins = is_ins.astype(jnp.int32)
    f_mis = is_mis.astype(jnp.int32)
    # flags pack into 13-bit fields (each holds a cumsum bounded by E;
    # callers guarantee E <= 8191); del lengths ride their own scatter.
    pk_flags = f_ins | (f_mis << 13)  # 13-bit fields: cumsum counts <= E <= 8191
    acc_s = jnp.zeros((B, L + 1), jnp.int32).at[b_idx, jnp.clip(span_s, 0, L)].add(pk_flags)
    acc_e = jnp.zeros((B, L + 1), jnp.int32).at[b_idx, jnp.clip(span_e, 0, L)].add(pk_flags)
    del_pts = jnp.zeros((B, L + 1), jnp.int32).at[b_idx, jnp.clip(span_s, 0, L)].add(dlen)

    cs = jnp.cumsum(acc_s[:, :L], axis=1)
    ce = jnp.cumsum(acc_e[:, :L], axis=1)
    ins_mask = (cs & 0x1FFF) > (ce & 0x1FFF)
    mis_mask = ((cs >> 13) & 0x1FFF) > ((ce >> 13) & 0x1FFF)
    Dcum = jnp.cumsum(del_pts[:, :L], axis=1)
    D = jnp.where(rev, tot_del[:, None] - Dcum, Dcum)
    Icum = jnp.cumsum(ins_mask.astype(jnp.int32), axis=1)
    I = jnp.where(rev, tot_ins[:, None] - (Icum - ins_mask), Icum)

    j_idx = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None, :], (B, L))
    in_mid = jnp.where(rev, (j_idx >= t) & (j_idx < t + n), (j_idx >= h) & (j_idx < h + n))
    in_head = jnp.where(rev, j_idx >= n + t, j_idx < h)
    in_read = j_idx < total[:, None]
    m = jnp.where(rev, n + t - 1 - j_idx, j_idx - h)

    src_mid = m - I + D
    if seg_off is not None:
        src_mid = src_mid + seg_off[:, None]
    src_mid = jnp.clip(src_mid, 0, n_ref_codes - 1)

    mid_fetch = in_mid & ~ins_mask  # positions that actually read the ref
    win_overflow = jnp.zeros(B, bool)
    if use_window:
        from . import window_gather as wg

        n_tiles = L // wg.TILE
        assert L % wg.TILE == 0, "l_out must be padded to the gather tile"
        ws, win_overflow = wg.window_starts(src_mid, mid_fetch, n_tiles)
        byte = wg.gather_bytes_windowed(ref_codes, src_mid, ws)
    else:
        byte = jnp.take_along_axis(
            ref_codes.astype(jnp.int32),
            jnp.clip(src_mid >> 2, 0, ref_codes.shape[1] - 1),
            axis=1,
        )
    code = ((byte >> ((src_mid & 3) * 2)) & 3).astype(jnp.uint8)

    # head/tail bases generated at output coordinates (identical stream to
    # the SITE_HEAD_TAIL pool draw)
    ht_idx = jnp.where(
        in_head,
        jnp.where(rev, t + n + h - 1 - j_idx, j_idx),
        jnp.where(rev, h + t - 1 - j_idx, j_idx - n),
    )
    u_ht = rng_mod.uniform_at(sk, ht_site, ht_idx, ht_cap)
    ht_code = _choice_to_code(jnp.minimum(jnp.floor(u_ht * 4.0).astype(jnp.int32), 3))
    code = jnp.where(in_mid, code, ht_code)

    mis_off = 1 + jnp.floor(u_mis * 3.0).astype(jnp.uint8)
    mis_code = (code + jnp.minimum(mis_off, 3)) % 4
    ins_code = jnp.minimum(jnp.floor(u_ins * 4.0).astype(jnp.uint8), 3)
    mid_ins = in_mid & ins_mask
    mid_mis = in_mid & mis_mask & ~ins_mask
    out_code = jnp.where(mid_mis, mis_code, code)
    out_code = jnp.where(mid_ins, ins_code, out_code)
    out_code = jnp.where(rev, 3 - out_code, out_code)

    read = jnp.where(in_read, _code_to_ascii(out_code), jnp.uint8(0))
    qclass = jnp.where(
        mid_ins, CLASS_INS,
        jnp.where(mid_mis, CLASS_MIS, jnp.where(in_mid, CLASS_MATCH, QCLASS_HT)),
    )
    return read, qclass, l_new, total, win_overflow


# --- Base construction -----------------------------------------------------


def _ascii_to_code(seq):
    """ASCII -> 2-bit code via selects (A=0, C=1, G=2, T=3)."""
    return jnp.where(
        seq == jnp.uint8(ord("C")), jnp.uint8(1),
        jnp.where(seq == jnp.uint8(ord("G")), jnp.uint8(2),
                  jnp.where(seq == jnp.uint8(ord("T")), jnp.uint8(3), jnp.uint8(0))),
    )


def _code_to_ascii(code):
    return jnp.where(
        code == 0, jnp.uint8(ord("A")),
        jnp.where(code == 1, jnp.uint8(ord("C")),
                  jnp.where(code == 2, jnp.uint8(ord("G")), jnp.uint8(ord("T")))),
    )


@functools.partial(jax.jit, static_argnames=())
def materialize_read(
    gm_src: jax.Array,  # [B, L] int32
    gm_qclass: jax.Array,  # [B, L] int32
    gm_valid: jax.Array,  # [B, L] bool
    ref_seg: jax.Array,  # [B, L'] uint8 ASCII reference (L' >= L allowed)
    u_mis: jax.Array,  # [B, L] uniforms for substituted-base choice
    u_ins: jax.Array,  # [B, L] uniforms for inserted-base choice
    src_offset=None,  # [B] optional per-lane offset into ref_seg (chunked
    # extraction leaves the segment at an intra-chunk offset; folding it here
    # avoids a second full-width shuffle)
    under_ins=None,  # [B, L] bool: read positions whose PRE-substitution base
    # is an inserted base (unaligned-walk overlap semantics,
    # build_unaligned_map) — substitutions there mutate the ins draw
) -> jax.Array:
    """[B, L] uint8 ASCII mutated read (padding positions = 0).

    Substitutions pick uniformly among the 3 non-identical bases
    (mutate_read, simulator.py:1965-1978); insertions uniformly among 4
    (simulator.py:1986-1995).
    """
    L = gm_src.shape[1]
    src = jnp.clip(gm_src, 0, L - 1)
    if src_offset is not None:
        src = src + src_offset[:, None]
    src = jnp.clip(src, 0, ref_seg.shape[1] - 1)
    ref_base = jnp.take_along_axis(ref_seg, src, axis=1)
    code = _ascii_to_code(ref_base)

    ins_code = jnp.minimum(jnp.floor(u_ins * 4.0).astype(jnp.uint8), 3)
    if under_ins is not None:
        code = jnp.where(under_ins, ins_code, code)
    mis_off = 1 + jnp.floor(u_mis * 3.0).astype(jnp.uint8)
    mis_code = (code + jnp.minimum(mis_off, 3)) % 4

    out_code = jnp.where(gm_qclass == CLASS_MIS, mis_code, code)
    out_code = jnp.where(gm_qclass == CLASS_INS, ins_code, out_code)
    out = _code_to_ascii(out_code)
    return jnp.where(gm_valid, out, jnp.uint8(0))
