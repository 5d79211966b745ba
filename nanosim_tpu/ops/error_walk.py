"""Batched error-state Markov walk.

Re-implements the reference's per-read `error_list` loop
(simulator.py:1833-1916) with every read in the batch as a vector lane:

  - first match length from the `first_match` ECDF (floor-clamped to >= 2);
  - then alternating draws of error type (7-state Markov chain over
    {start, mis, ins, del, mis0, ins0, del0}), error length (Poisson-Geometric
    for mis, Weibull-Geometric for ins/del via exact inverse-CDF tables), and
    next match length (15-bin conditional ECDF; a zero match after a zero
    match is forced to 1);
  - del/mis overshoot extends `middle_ref` (the reference span) and `l_new`
    (the read length) exactly as the reference does.

Execution shape: a `lax.while_loop` that stops as soon as every lane has
consumed its reference span (typical reads need ~L/30 events, far less than
the worst-case budget), with `UNROLL` events processed per iteration to
amortize loop overhead, writing events into carried [B, E] buffers that XLA
updates in place.  Events form a per-lane prefix (one per active step), so
validity is just `step < n_events`.

Also the unaligned-read variant (`unaligned_error_list`,
simulator.py:1784-1830) with fixed type probabilities.

Event coordinates are emitted in half-position fixed point (`pos2x`): mis/del
at 2*pos, ins at 2*pos - 1 — the integer form of the reference's `pos - 0.5`
insertion keys (`pos + 0.1` -> 2*pos + 1 for the unaligned walk).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import rng
from .tables import EcdfDevice, MixtureDevice, TransErrorDevice


def use_pallas_walk() -> bool:
    """Route the walks through the Pallas TPU kernels?

    Default: yes on a real TPU backend (where the XLA while-loop walks are
    launch-overhead-bound — see ops/walk_pallas.py), no elsewhere (the CPU
    interpreter is only for tests).  `NANOSIM_TPU_PALLAS_WALK=0/1` overrides.
    """
    env = os.environ.get("NANOSIM_TPU_PALLAS_WALK")
    if env is not None:
        return env not in ("0", "false", "no")
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False

STATE_START = 0
E_MIS, E_INS, E_DEL = 0, 1, 2

UNROLL = 8


class WalkResult(NamedTuple):
    """Batched walk outputs; events_* are [B, E] with per-lane prefix validity."""

    events_pos2x: jax.Array
    events_type: jax.Array
    events_len: jax.Array
    events_valid: jax.Array
    middle_ref: jax.Array  # [B] int32
    l_new: jax.Array  # [B] int32
    overflow: jax.Array  # [B] bool
    n_events: jax.Array  # [B] int32
    ecnt_mis: jax.Array
    ecnt_ins: jax.Array
    ecnt_match: jax.Array


def _uniforms(walk_keys, t, n):
    return jax.vmap(
        lambda k: jax.random.uniform(jax.random.fold_in(k, t), (n,), dtype=jnp.float32)
    )(walk_keys)


def _bulk_uniforms(walk_keys, n_steps, n):
    """All per-step uniforms in one batched threefry pass: [n_steps, B, n].

    Bit-identical to calling `_uniforms(walk_keys, t, n)` for t in
    range(n_steps) — the per-(lane, step) stream stays fold_in(key, t) — but
    hashed in bulk OUTSIDE the sequential walk loop, where it vectorizes,
    instead of serializing ~3 threefry rounds into every loop step.  The
    output is STEP-major so a walk step's uniforms are one contiguous
    [1, B, n] slice (a lane-major layout would make every step a strided
    read across the whole buffer, and transposing afterwards costs ~3 ms
    at [1024, 1121, 3] on v5e).
    """
    ts = jnp.arange(n_steps, dtype=jnp.int32)
    return jax.vmap(
        lambda t: jax.vmap(
            lambda k: jax.random.uniform(
                jax.random.fold_in(k, t), (n,), dtype=jnp.float32
            )
        )(walk_keys)
    )(ts)


def error_walk_auto(slot_keys, m_ref, first_match, match_markov, mixtures,
                    trans, max_events: int) -> "WalkResult":
    """`error_walk`, routed through the Pallas kernel on TPU backends
    (bit-identical; ops/walk_pallas.py)."""
    if use_pallas_walk():
        from .walk_pallas import error_walk_pallas

        return error_walk_pallas(
            slot_keys, m_ref, first_match, match_markov, mixtures, trans,
            max_events,
        )
    return error_walk(
        slot_keys, m_ref, first_match, match_markov, mixtures, trans,
        max_events,
    )


def unaligned_walk_auto(slot_keys, m_ref, mixtures, max_steps: int) -> "WalkResult":
    """`unaligned_walk`, routed through the Pallas kernel on TPU backends."""
    if use_pallas_walk():
        from .walk_pallas import unaligned_walk_pallas

        return unaligned_walk_pallas(slot_keys, m_ref, mixtures, max_steps)
    return unaligned_walk(slot_keys, m_ref, mixtures, max_steps)


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
    E = max_events
    walk_keys = rng.site_keys(slot_keys, rng.SITE_WALK)

    # --- first match (simulator.py:1843-1856) ---
    u0 = _uniforms(walk_keys, 0, 1)[:, 0]
    fm = first_match.invert(jnp.zeros(B, jnp.int32), u0)
    prev_match = jnp.maximum(fm, 2)

    # per-step uniforms for t in 1..E, hashed in bulk, step-major [E+1, B, 3]
    U = _bulk_uniforms(walk_keys, E + 1, 3)

    def sub_step(t, st):
        (pos, middle_ref, l_new, prev_state, prev_match, n_events) = st
        active = pos < middle_ref

        us = jax.lax.dynamic_slice(U, (t, jnp.int32(0), jnp.int32(0)), (1, B, 3))[0]
        u_err, u_len, u_match = us[:, 0], us[:, 1], us[:, 2]

        etype = trans.sample_all(prev_state, u_err)
        elen = mixtures.sample_all(etype, u_len)
        is_ins = etype == E_INS
        is_del = etype == E_DEL

        e_pos2x = jnp.where(is_ins, 2 * pos - 1, 2 * pos)
        pos_after = pos + jnp.where(is_ins, 0, elen)

        # del/mis overshoot extends the reference span (simulator.py:1875-1880)
        over1 = jnp.maximum(pos_after - middle_ref, 0)
        l_new_n = l_new + jnp.where(is_ins, elen, jnp.where(is_del, -elen, 0)) + over1
        middle_ref_n = jnp.maximum(middle_ref, jnp.where(is_ins, middle_ref, pos_after))

        # match draw (simulator.py:1891-1906)
        bins = match_markov.select_bin(prev_match)
        mstep = match_markov.invert_all(bins, u_match)
        mstep = jnp.where((prev_match == 0) & (mstep == 0), 1, mstep)
        over2 = jnp.maximum(pos_after + mstep - middle_ref_n, 0)
        l_new_n = l_new_n + over2
        middle_ref_n = jnp.maximum(middle_ref_n, pos_after + mstep)
        new_state = etype + 1 + jnp.where(mstep == 0, 3, 0)

        # The event at this lane's current event index (= t - 1 for every
        # active lane, a prefix per lane); inactive-lane columns hold garbage
        # masked out by the prefix validity.  The three fields pack into ONE
        # u32 word; the UNROLL words of an iteration are stacked and written
        # as a single [B, UNROLL] column block into the [B, E] buffer (one
        # update per iteration, not per step — per-step column writes copy
        # the whole carried buffer on TPU, ~6 us each).  Layout
        # (device-internal only; the word is unpacked before leaving the
        # kernel): pos2x 19 bits (reads to 262k bases) | len 11 bits (mixture
        # tables cap lengths at 1024) | type 2 bits.  (native/fastwriter.cpp's
        # ev_flat uses its own independent 17|13|2 host-side packing.)
        word = (
            e_pos2x.astype(jnp.uint32)
            | (elen.astype(jnp.uint32) << jnp.uint32(19))
            | (etype.astype(jnp.uint32) << jnp.uint32(30))
        )

        upd = lambda new, old: jnp.where(active, new, old)
        return (
            upd(pos_after + mstep, pos),
            upd(middle_ref_n, middle_ref),
            upd(l_new_n, l_new),
            upd(new_state, prev_state),
            upd(mstep, prev_match),
            upd(n_events + 1, n_events),
        ), word

    def cond(carry):
        i, st, _ = carry
        pos, middle_ref = st[0], st[1]
        return (i < E) & jnp.any(pos < middle_ref)

    def body(carry):
        i, st, ev = carry
        words = []
        for k in range(UNROLL):
            st, w = sub_step(i + k + 1, st)
            words.append(w)
        block = jnp.stack(words, axis=1)  # [B, UNROLL]
        ev = jax.lax.dynamic_update_slice(ev, block, (jnp.int32(0), i))
        return (i + UNROLL, st, ev)

    zero = jnp.zeros(B, jnp.int32)
    init_st = (
        prev_match,  # pos
        m_ref,  # middle_ref
        m_ref,  # l_new
        jnp.full(B, STATE_START, jnp.int32),
        prev_match,
        zero,  # n_events
    )
    assert E % UNROLL == 0, "max_events must be a multiple of the unroll factor"
    ev0 = jnp.zeros((B, E), jnp.uint32)
    _, st, ev_word = jax.lax.while_loop(cond, body, (jnp.int32(0), init_st, ev0))
    (pos, middle_ref, l_new, _, _, n_events) = st

    ev_pos2x = (ev_word & jnp.uint32(0x7FFFF)).astype(jnp.int32)
    ev_type = (ev_word >> jnp.uint32(30)).astype(jnp.int32)
    ev_len = ((ev_word >> jnp.uint32(19)) & jnp.uint32(0x7FF)).astype(jnp.int32)
    ev_valid = jnp.arange(E, dtype=jnp.int32)[None, :] < n_events[:, None]
    # Per-type base counts, derived post-loop from the event prefix instead of
    # carried through the hot loop (they had been ~8 extra ops per step).
    # Every consumed reference base is a match, mismatch, or deletion, and the
    # walk's overshoot extension ends each completed lane at pos == middle_ref,
    # so matches = middle_ref - mis - del (for overflow lanes — rejected and
    # resampled downstream — this overstates matches by the unconsumed span).
    vlen = jnp.where(ev_valid, ev_len, 0)
    ecnt_mis = jnp.sum(jnp.where(ev_type == E_MIS, vlen, 0), axis=1)
    ecnt_ins = jnp.sum(jnp.where(ev_type == E_INS, vlen, 0), axis=1)
    ecnt_del = jnp.sum(jnp.where(ev_type == E_DEL, vlen, 0), axis=1)
    ecnt_match = middle_ref - ecnt_mis - ecnt_del
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


@functools.partial(jax.jit, static_argnames=("max_steps",))
def unaligned_walk(
    slot_keys: jax.Array,  # [B, 2]
    m_ref: jax.Array,  # [B] int32
    mixtures: MixtureDevice,
    max_steps: int,
) -> WalkResult:
    """Unaligned/gap error synthesis (simulator.py:1784-1830).

    Fixed per-step type probabilities match/mis/ins/del = 0.4/0.3/0.15/0.15;
    each step advances pos by 1 (match), the error length (mis/del), or stays
    (ins; consecutive insertions share key pos + 0.1 and merge downstream).
    Event slots are allocated per *step*, so validity is the per-lane step
    prefix with match steps masked by type < 3 encoding: we store kind-1 and
    mark matches with length 0.
    """
    B = m_ref.shape[0]
    E = max_steps
    walk_keys = rng.site_keys(slot_keys, rng.SITE_UNALIGNED_WALK)
    U = _bulk_uniforms(walk_keys, E, 2)  # [E, B, 2] step-major

    def sub_step(t, st):
        (pos, middle_ref, l_new, n_steps) = st
        active = pos < middle_ref

        us = jax.lax.dynamic_slice(U, (t, jnp.int32(0), jnp.int32(0)), (1, B, 2))[0]
        u_type, u_len = us[:, 0], us[:, 1]
        kind = (
            (u_type >= 0.4).astype(jnp.int32)
            + (u_type >= 0.7).astype(jnp.int32)
            + (u_type >= 0.85).astype(jnp.int32)
        )  # 0=match 1=mis 2=ins 3=del
        etype = jnp.clip(kind - 1, 0, 2)
        is_err = kind > 0
        elen = jnp.where(is_err, mixtures.sample_all(etype, u_len), 1)
        is_ins = kind == 2
        is_del = kind == 3

        e_pos2x = jnp.where(is_ins, 2 * pos + 1, 2 * pos)
        e_len_store = jnp.where(is_err, elen, 0)  # matches -> length-0 events

        pos_after = pos + jnp.where(is_ins, 0, elen)
        over = jnp.maximum(pos_after - middle_ref, 0)
        l_new_n = l_new + jnp.where(is_ins, elen, jnp.where(is_del, -elen, 0))
        l_new_n = l_new_n + jnp.where(is_ins, 0, over)
        middle_ref_n = jnp.maximum(middle_ref, jnp.where(is_ins, middle_ref, pos_after))

        word = (
            e_pos2x.astype(jnp.uint32)
            | (e_len_store.astype(jnp.uint32) << jnp.uint32(19))
            | (etype.astype(jnp.uint32) << jnp.uint32(30))
        )

        upd = lambda new, old: jnp.where(active, new, old)
        return (
            upd(pos_after, pos),
            upd(middle_ref_n, middle_ref),
            upd(l_new_n, l_new),
            upd(n_steps + 1, n_steps),
        ), word

    def cond(carry):
        i, st, _ = carry
        return (i < E) & jnp.any(st[0] < st[1])

    def body(carry):
        i, st, ev = carry
        words = []
        for k in range(UNROLL):
            st, w = sub_step(i + k, st)
            words.append(w)
        ev = jax.lax.dynamic_update_slice(ev, jnp.stack(words, axis=1), (jnp.int32(0), i))
        return (i + UNROLL, st, ev)

    zero = jnp.zeros(B, jnp.int32)
    init = (
        zero,
        m_ref,
        m_ref,
        zero,
    )
    assert E % UNROLL == 0, "max_steps must be a multiple of the unroll factor"
    ev0 = jnp.zeros((B, E), jnp.uint32)
    _, st, ev_word = jax.lax.while_loop(cond, body, (jnp.int32(0), init, ev0))
    pos, middle_ref, l_new, n_steps = st

    ev_pos2x = (ev_word & jnp.uint32(0x7FFFF)).astype(jnp.int32)
    ev_type = (ev_word >> jnp.uint32(30)).astype(jnp.int32)
    ev_len = ((ev_word >> jnp.uint32(19)) & jnp.uint32(0x7FF)).astype(jnp.int32)
    ev_valid = (jnp.arange(E, dtype=jnp.int32)[None, :] < n_steps[:, None]) & (ev_len > 0)
    return WalkResult(
        events_pos2x=ev_pos2x,
        events_type=ev_type,
        events_len=ev_len,
        events_valid=ev_valid,
        middle_ref=middle_ref,
        l_new=l_new,
        overflow=pos < middle_ref,
        n_events=n_steps,
        ecnt_mis=zero,
        ecnt_ins=zero,
        ecnt_match=zero,
    )
