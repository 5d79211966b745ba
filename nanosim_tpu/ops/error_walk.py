"""Batched error-state Markov walk.

Re-implements the reference's per-read `error_list` loop
(simulator.py:1833-1916) as a `lax.scan` over a fixed event budget with every
read in the batch as a vector lane:

  - first match length from the `first_match` ECDF (floor-clamped to >= 2);
  - then alternating draws of error type (7-state Markov chain over
    {start, mis, ins, del, mis0, ins0, del0}), error length (Poisson-Geometric
    for mis, Weibull-Geometric for ins/del via exact inverse-CDF tables), and
    next match length (15-bin conditional ECDF; a zero match after a zero
    match is forced to 1);
  - del/mis overshoot extends `middle_ref` (the reference span) and `l_new`
    (the read length) exactly as the reference does.

Also the unaligned-read variant (`unaligned_error_list`,
simulator.py:1784-1830) with fixed type probabilities and merged consecutive
insertions.

Event coordinates are emitted in half-position fixed point (`pos2x`): mis/del
at 2*pos, ins at 2*pos - 1 — the integer form of the reference's `pos - 0.5`
insertion keys.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import rng
from .tables import EcdfDevice, MixtureDevice, TransErrorDevice

# Error-state indices (profiles.error_model.ERROR_STATES order)
STATE_START = 0
# error types: 0=mis, 1=ins, 2=del; state = type + 1 (+3 if zero-match)

E_MIS, E_INS, E_DEL = 0, 1, 2


class WalkResult(NamedTuple):
    """Batched walk outputs.

    events_*: [B, E] arrays (padded; `events_valid` marks real events).
    """

    events_pos2x: jax.Array  # int32, mis/del at 2*pos, ins at 2*pos-1
    events_type: jax.Array  # int32 0/1/2
    events_len: jax.Array  # int32
    events_valid: jax.Array  # bool
    middle_ref: jax.Array  # [B] int32 reference span consumed
    l_new: jax.Array  # [B] int32 resulting read length
    overflow: jax.Array  # [B] bool — event budget exhausted before the end
    n_events: jax.Array  # [B] int32
    ecnt_mis: jax.Array  # [B] int32 (fastq bookkeeping)
    ecnt_ins: jax.Array  # [B] int32
    ecnt_match: jax.Array  # [B] int32


@functools.partial(jax.jit, static_argnames=("max_events",))
def error_walk(
    slot_keys: jax.Array,  # [B, 2]
    m_ref: jax.Array,  # [B] int32 target aligned lengths
    first_match: EcdfDevice,
    match_markov: EcdfDevice,
    mixtures: MixtureDevice,
    trans: TransErrorDevice,
    max_events: int,
) -> WalkResult:
    B = m_ref.shape[0]
    walk_keys = rng.site_keys(slot_keys, rng.SITE_WALK)

    # --- first match (simulator.py:1843-1856) ---
    u0 = jax.vmap(lambda k: jax.random.uniform(jax.random.fold_in(k, 0), dtype=jnp.float32))(walk_keys)
    fm = first_match.invert(jnp.zeros(B, jnp.int32), u0)
    prev_match = jnp.maximum(fm, 2)
    pos = prev_match
    middle_ref = m_ref
    l_new = m_ref
    ecnt_match = jnp.minimum(prev_match, middle_ref)

    def step(carry, t):
        (pos, middle_ref, l_new, prev_state, prev_match, n_events, ecnt_mis, ecnt_ins, ecnt_match) = carry
        active = pos < middle_ref

        us = jax.vmap(lambda k: jax.random.uniform(jax.random.fold_in(k, t), (3,), dtype=jnp.float32))(walk_keys)
        u_err, u_len, u_match = us[:, 0], us[:, 1], us[:, 2]

        etype = trans.sample(prev_state, u_err)
        elen = mixtures.sample(etype, u_len)
        is_ins = etype == E_INS
        is_del = etype == E_DEL

        ev_pos2x = jnp.where(is_ins, 2 * pos - 1, 2 * pos)
        pos_after = pos + jnp.where(is_ins, 0, elen)

        # del/mis overshoot extends the reference span (simulator.py:1875-1880)
        over1 = jnp.maximum(pos_after - middle_ref, 0)
        l_new_new = l_new + jnp.where(is_ins, elen, jnp.where(is_del, -elen, 0)) + over1
        middle_ref_new = jnp.maximum(middle_ref, jnp.where(is_ins, middle_ref, pos_after))

        ecnt_mis_new = ecnt_mis + jnp.where(etype == E_MIS, elen, 0)
        ecnt_ins_new = ecnt_ins + jnp.where(is_ins, elen, 0)

        # match draw (simulator.py:1891-1906)
        bins = match_markov.select_bin(prev_match)
        mstep = match_markov.invert(bins, u_match)
        mstep = jnp.where((prev_match == 0) & (mstep == 0), 1, mstep)
        over2 = jnp.maximum(pos_after + mstep - middle_ref_new, 0)
        l_new_new = l_new_new + over2
        middle_ref_new = jnp.maximum(middle_ref_new, pos_after + mstep)
        pos_new = pos_after + mstep
        ecnt_match_new = ecnt_match + mstep
        new_state = etype + 1 + jnp.where(mstep == 0, 3, 0)

        upd = lambda new, old: jnp.where(active, new, old)
        carry = (
            upd(pos_new, pos),
            upd(middle_ref_new, middle_ref),
            upd(l_new_new, l_new),
            upd(new_state, prev_state),
            upd(mstep, prev_match),
            upd(n_events + 1, n_events),
            upd(ecnt_mis_new, ecnt_mis),
            upd(ecnt_ins_new, ecnt_ins),
            upd(ecnt_match_new, ecnt_match),
        )
        ys = (ev_pos2x, etype, elen, active)
        return carry, ys

    init = (
        pos,
        middle_ref,
        l_new,
        jnp.full(B, STATE_START, jnp.int32),
        prev_match,
        jnp.zeros(B, jnp.int32),
        jnp.zeros(B, jnp.int32),
        jnp.zeros(B, jnp.int32),
        ecnt_match,
    )
    carry, ys = jax.lax.scan(step, init, jnp.arange(1, max_events + 1))
    (pos, middle_ref, l_new, _, _, n_events, ecnt_mis, ecnt_ins, ecnt_match) = carry
    ev_pos2x, ev_type, ev_len, ev_valid = (jnp.swapaxes(y, 0, 1) for y in ys)

    return WalkResult(
        events_pos2x=ev_pos2x,
        events_type=ev_type,
        events_len=ev_len,
        events_valid=ev_valid,
        middle_ref=middle_ref,
        l_new=l_new,
        overflow=pos < middle_ref,
        n_events=n_events,
        ecnt_mis=ecnt_mis,
        ecnt_ins=ecnt_ins,
        ecnt_match=ecnt_match,
    )


@functools.partial(jax.jit, static_argnames=("max_events",))
def unaligned_walk(
    slot_keys: jax.Array,  # [B, 2]
    m_ref: jax.Array,  # [B] int32
    mixtures: MixtureDevice,
    max_events: int,
) -> WalkResult:
    """Unaligned/gap error synthesis (simulator.py:1784-1830).

    Fixed per-step type probabilities match/mis/ins/del = 0.4/0.3/0.15/0.15;
    each step advances pos by 1 (match), the error length (mis/del), or stays
    (ins; consecutive insertions share a key and merge downstream).  A mis/del
    overshoot extends middle_ref each iteration (simulator.py:1826-1828).
    Insertion keys are pos + 0.1 -> insert before ref index pos + 1
    (pos2x = 2*pos + 1).
    """
    B = m_ref.shape[0]
    walk_keys = rng.site_keys(slot_keys, rng.SITE_UNALIGNED_WALK)

    def step(carry, t):
        pos, middle_ref, l_new, n_events, last_is_ins = carry
        active = pos < middle_ref

        us = jax.vmap(lambda k: jax.random.uniform(jax.random.fold_in(k, t), (2,), dtype=jnp.float32))(walk_keys)
        u_type, u_len = us[:, 0], us[:, 1]

        # match < 0.4 <= mis < 0.7 <= ins < 0.85 <= del
        kind = (
            (u_type >= 0.4).astype(jnp.int32)
            + (u_type >= 0.7).astype(jnp.int32)
            + (u_type >= 0.85).astype(jnp.int32)
        )  # 0=match 1=mis 2=ins 3=del
        etype = jnp.clip(kind - 1, 0, 2)
        is_err = kind > 0
        elen = jnp.where(is_err, mixtures.sample(etype, u_len), 1)
        is_ins = kind == 2
        is_del = kind == 3

        # event list: ins merge handled downstream (same pos2x accumulates)
        ev_pos2x = jnp.where(is_ins, 2 * pos + 1, 2 * pos)  # ins key pos + 0.1
        emit = active & is_err

        l_new_new = l_new + jnp.where(is_ins, elen, jnp.where(is_del, -elen, 0))
        pos_after = pos + jnp.where(is_ins, 0, elen)
        over = jnp.maximum(pos_after - middle_ref, 0)
        l_new_new = l_new_new + jnp.where(is_ins, 0, over)
        middle_ref_new = jnp.maximum(middle_ref, jnp.where(is_ins, middle_ref, pos_after))

        upd = lambda new, old: jnp.where(active, new, old)
        carry = (
            upd(pos_after, pos),
            upd(middle_ref_new, middle_ref),
            upd(l_new_new, l_new),
            upd(n_events + emit.astype(jnp.int32), n_events),
            upd(is_ins, last_is_ins),
        )
        return carry, (ev_pos2x, etype, elen, emit)

    zero = jnp.zeros(B, jnp.int32)
    init = (zero, m_ref, m_ref, zero, jnp.zeros(B, bool))
    carry, ys = jax.lax.scan(step, init, jnp.arange(max_events))
    pos, middle_ref, l_new, n_events, _ = carry
    ev_pos2x, ev_type, ev_len, ev_valid = (jnp.swapaxes(y, 0, 1) for y in ys)
    return WalkResult(
        events_pos2x=ev_pos2x,
        events_type=ev_type,
        events_len=ev_len,
        events_valid=ev_valid,
        middle_ref=middle_ref,
        l_new=l_new,
        overflow=pos < middle_ref,
        n_events=n_events,
        ecnt_mis=zero,
        ecnt_ins=zero,
        ecnt_match=zero,
    )
