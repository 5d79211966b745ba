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


class GatherMap(NamedTuple):
    """Per-output-base construction recipe.

    src:    [B, L_read] int32 — source ref index, or -1 for inserted bases.
    qclass: [B, L_read] int32 — CLASS_MATCH / CLASS_MIS / CLASS_INS.
    valid:  [B, L_read] bool — j < read length.
    read_len: [B] int32.
    """

    src: jax.Array
    qclass: jax.Array
    valid: jax.Array
    read_len: jax.Array


@functools.partial(jax.jit, static_argnames=("l_read",))
def build_gather_map(
    events_pos2x: jax.Array,  # [B, E] int32
    events_type: jax.Array,  # [B, E] int32 (0=mis 1=ins 2=del)
    events_len: jax.Array,  # [B, E] int32
    events_valid: jax.Array,  # [B, E] bool
    middle_ref: jax.Array,  # [B] int32
    l_read: int,  # static output capacity; also bounds ref length
) -> GatherMap:
    B, _ = events_pos2x.shape
    L = l_read
    b_idx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], events_pos2x.shape)

    is_mis = events_valid & (events_type == 0)
    is_ins = events_valid & (events_type == 1)
    is_del = events_valid & (events_type == 2)

    start = events_pos2x // 2  # mis/del start (pos2x even)
    end = start + events_len
    ins_before = (events_pos2x + 1) // 2  # insertion target index

    # Range masks via difference arrays + cumsum. Clip ends into [0, L];
    # events live within middle_ref <= L by construction.
    def range_mask(flag):
        diff = jnp.zeros((B, L + 1), jnp.int32)
        diff = diff.at[b_idx, jnp.clip(start, 0, L)].add(flag.astype(jnp.int32))
        diff = diff.at[b_idx, jnp.clip(end, 0, L)].add(-flag.astype(jnp.int32))
        return jnp.cumsum(diff[:, :L], axis=1) > 0

    del_mask = range_mask(is_del)
    mis_mask = range_mask(is_mis)

    ins_at = jnp.zeros((B, L + 1), jnp.int32)
    ins_at = ins_at.at[b_idx, jnp.clip(ins_before, 0, L)].add(
        jnp.where(is_ins, events_len, 0)
    )
    cumins = jnp.cumsum(ins_at[:, :L], axis=1)  # inserted bases at or before i

    deli = del_mask.astype(jnp.int32)
    cumdel_excl = jnp.cumsum(deli, axis=1) - deli

    i_idx = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None, :], (B, L))
    read_pos = i_idx - cumdel_excl + cumins  # monotone nondecreasing per row

    in_ref = i_idx < middle_ref[:, None]
    kept = in_ref & ~del_mask

    # Invert the monotone ref->read map by batched binary search: for output
    # position j, the source ref base is the LAST i with read_pos(i) == j
    # (within an equal-read_pos run, deleted bases precede the kept one).
    # Gathers instead of [B, L] scatters — scatters serialize on TPU.
    j_idx = i_idx
    i1 = _batched_searchsorted_right(read_pos, j_idx) - 1
    i1c = jnp.clip(i1, 0, L - 1)
    rp_at = jnp.take_along_axis(read_pos, i1c, axis=1)
    kept_at = jnp.take_along_axis(kept, i1c, axis=1)
    hit = (i1 >= 0) & (rp_at == j_idx) & kept_at
    src = jnp.where(hit, i1c, -1)
    mis_at = jnp.take_along_axis(mis_mask, i1c, axis=1)
    cls = jnp.where(hit, jnp.where(mis_at, CLASS_MIS, CLASS_MATCH), CLASS_INS)

    # Read length: kept ref bases + all insertions.
    n_kept = jnp.sum(kept, axis=1)
    n_ins = jnp.sum(jnp.where(is_ins & (ins_before <= middle_ref[:, None]), events_len, 0), axis=1)
    read_len = (n_kept + n_ins).astype(jnp.int32)

    valid = j_idx < read_len[:, None]
    return GatherMap(src=src, qclass=cls, valid=valid, read_len=read_len)


def _batched_searchsorted_right(a: jax.Array, v: jax.Array) -> jax.Array:
    """Row-wise searchsorted(side='right') for sorted [B, L] rows.

    Fixed log2(L) rounds of take_along_axis — all gathers, no scatters.
    """
    B, L = a.shape
    lo = jnp.zeros_like(v)
    hi = jnp.full_like(v, L)
    # the answer lies in [0, L]: L + 1 candidates
    for _ in range(max(1, L.bit_length())):
        mid = (lo + hi) // 2
        amid = jnp.take_along_axis(a, jnp.clip(mid, 0, L - 1), axis=1)
        go_right = amid <= v
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


# --- Base construction -----------------------------------------------------

# ASCII -> 2-bit code (A=0, C=1, G=2, T=3); non-ACGT maps to 0 (callers
# resolve IUPAC codes before this point).
_ASCII2CODE = jnp.zeros(256, jnp.uint8).at[ord("C")].set(1).at[ord("G")].set(2).at[ord("T")].set(3)
_CODE2ASCII = jnp.array([ord("A"), ord("C"), ord("G"), ord("T")], jnp.uint8)


@jax.jit
def materialize_read(
    gm_src: jax.Array,  # [B, L] int32
    gm_qclass: jax.Array,  # [B, L] int32
    gm_valid: jax.Array,  # [B, L] bool
    ref_seg: jax.Array,  # [B, L] uint8 ASCII extracted reference slice
    u_mis: jax.Array,  # [B, L] uniforms for substituted-base choice
    u_ins: jax.Array,  # [B, L] uniforms for inserted-base choice
) -> jax.Array:
    """[B, L] uint8 ASCII mutated read (padding positions = 0).

    Substitutions pick uniformly among the 3 non-identical bases
    (mutate_read, simulator.py:1965-1978); insertions uniformly among 4
    (simulator.py:1986-1995).
    """
    src = jnp.clip(gm_src, 0, ref_seg.shape[1] - 1)
    ref_base = jnp.take_along_axis(ref_seg, src, axis=1)
    code = _ASCII2CODE[ref_base]

    mis_off = 1 + jnp.floor(u_mis * 3.0).astype(jnp.uint8)
    mis_code = (code + jnp.minimum(mis_off, 3)) % 4
    ins_code = jnp.minimum(jnp.floor(u_ins * 4.0).astype(jnp.uint8), 3)

    out_code = jnp.where(gm_qclass == CLASS_MIS, mis_code, code)
    out_code = jnp.where(gm_qclass == CLASS_INS, ins_code, out_code)
    out = _CODE2ASCII[out_code]
    return jnp.where(gm_valid, out, jnp.uint8(0))
