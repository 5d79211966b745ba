"""Pallas TPU kernels for the batched error-state walks.

The XLA `lax.while_loop` walks in :mod:`.error_walk` are bound by per-op
fixed costs, not compute: each unrolled sub-step lowers to a handful of
separate fused kernels over narrow [B] vectors, and a ~400-step walk pays
that launch overhead ~3000 times (measured ~27 ms for the chimeric segment
walk at 1920 lanes — ~60 us/step against ~2 us of actual VPU work).  Here
the ENTIRE walk is one Mosaic kernel: state lives in registers/VMEM, the
per-step uniforms are threefry-generated in-kernel (bit-identical to
`jax.random`'s partitionable threefry — same recipe the C++ replay in
native/fastwriter.cpp uses), and the inverse-CDF tables are applied with a
single-pass bf16 limb-plane one-hot MXU matmul row-select (exact: every
output sums exactly one nonzero term per limb plane, and the 3-limb bf16
decomposition reconstructs each f32 exactly) followed by VPU
compare-reduces.

Execution shape: a 1-D grid over lane blocks of `BLOCK` lanes; each block
runs its own `while` loop and EXITS AS SOON AS ITS OWN LANES are done —
unlike the XLA walk, where one long straggler keeps every lane stepping.
Event words stream to HBM in [UNROLL, BLOCK] slabs via async copies from a
VMEM staging buffer, so the event budget E never enters the VMEM footprint.

Outputs are bit-identical to :func:`..ops.error_walk.error_walk` /
:func:`..ops.error_walk.unaligned_walk` on every valid event and state
field (enforced by tests/test_walk_pallas.py in interpret mode and by the
on-chip parity scripts in bench/); invalid event slots are zeroed rather
than carrying the XLA version's masked garbage.

Reference semantics being implemented: the per-read `error_list` /
`unaligned_error_list` loops (/root/reference/src/simulator.py:1833-1916,
:1784-1830).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import rng
from .error_walk import UNROLL, WalkResult, _uniforms
from .tables import EcdfDevice, MixtureDevice, TransErrorDevice

def _tf_block(k0, k1, x0, x1):
    """Threefry-2x32 (20 rounds) on uint32 arrays; broadcasting operands.

    Bit-identical to jax._src.prng's threefry2x32 (same rotation schedule);
    mirrors rng._threefry2x32 but kept local so the kernel has no closure on
    traced globals.
    """
    rot0 = (13, 15, 26, 6)
    rot1 = (17, 29, 16, 24)
    k0 = k0.astype(jnp.uint32)
    k1 = k1.astype(jnp.uint32)
    k2 = k0 ^ k1 ^ jnp.uint32(0x1BD11BDA)
    x0 = x0.astype(jnp.uint32) + k0
    x1 = x1.astype(jnp.uint32) + k1

    def rnd(x0, x1, r):
        x0 = x0 + x1
        x1 = (x1 << jnp.uint32(r)) | (x1 >> jnp.uint32(32 - r))
        return x0, x0 ^ x1

    ks = (k0, k1, k2)
    for i in range(5):
        rots = rot0 if i % 2 == 0 else rot1
        for r in rots:
            x0, x1 = rnd(x0, x1, r)
        x0 = x0 + ks[(i + 1) % 3]
        x1 = x1 + ks[(i + 2) % 3] + jnp.uint32(i + 1)
    return x0, x1


def _bits_to_uniform(b):
    """uint32 -> f32 in [0, 1), exactly as jax.random.uniform."""
    f = (b >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
    return jax.lax.bitcast_convert_type(f, jnp.float32) - jnp.float32(1.0)


def _step_uniforms(wk0, wk1, t0, n_draws):
    """Per-step uniforms for one UNROLL group, (UNROLL, BLK) per draw slot.

    Step t's uniforms are jax.random.uniform(fold_in(walk_key, t), (n,)) —
    under partitionable threefry, draw j is tf(folded_key, (0, j)), bits
    y0 ^ y1 (the layout native/fastwriter.cpp replays).  One fold pass plus
    one pass per draw slot, all at full-tile (UNROLL, BLK) shapes.
    """
    tvec = t0.astype(jnp.uint32) + jax.lax.broadcasted_iota(
        jnp.uint32, (UNROLL, 1), 0
    )
    f0, f1 = _tf_block(wk0, wk1, jnp.uint32(0), tvec)  # (UNROLL, BLK)
    out = []
    for j in range(n_draws):
        y0, y1 = _tf_block(f0, f1, jnp.uint32(0), jnp.uint32(j))
        out.append(_bits_to_uniform(y0 ^ y1))
    return out


def _limb_planes3(table_t):
    """f32 (W, n) -> (3W, n) bf16 limb planes with hi+mid+lo == x EXACTLY.

    The standard 3-limb bf16 decomposition of f32 (the same one XLA's
    HIGHEST-precision matmul relies on): hi = bf16(x), mid = bf16(x - hi),
    lo = bf16(x - hi - mid).  Both residual subtractions are exact in f32,
    and the three limbs' significands cover all 24 mantissa bits, so the
    f32 sum hi + mid + lo reconstructs x exactly (each partial sum's true
    value is representable, so round-to-nearest returns it)."""
    hi = table_t.astype(jnp.bfloat16)
    r1 = table_t - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, mid, lo], axis=0)


def _onehot_rows_limbs(limb_t, sel, n_sel, W):
    """Row-gather `table[sel[lane], :]` as a ONE-PASS bf16 one-hot MXU matmul.

    limb_t: (3W, n_sel) bf16 limb planes of the transposed f32 table
    (from :func:`_limb_planes3`); sel: (1, BLK) int lane selectors.
    Returns (W, BLK) f32, bit-equal to gathering the f32 table directly.

    Exact: the one-hot operand is 0/1 (exact in bf16), so each output
    element of the dot is a single bf16 limb promoted to the f32
    accumulator, and the plane sum reconstructs the f32 value exactly.
    Replaces a 6-pass HIGHEST f32 dot with one bf16 pass over 1.5x the
    rows — measured ~2.8x cheaper at the walk's shapes (bench/micro_walk9:
    2048-step kernel 27.7 -> 23.7 ms against a 21.5 ms no-table floor).
    """
    iota = jax.lax.broadcasted_iota(sel.dtype, (n_sel, 1), 0)
    onehot = (iota == sel).astype(jnp.bfloat16)  # (n_sel, BLK)
    planes = jax.lax.dot_general(
        limb_t,
        onehot,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (3W, BLK)
    return planes[:W] + planes[W : 2 * W] + planes[2 * W :]


def _blend_rows(table_t, sel, n_sel):
    """Row-gather `table[sel[lane], :]` as an elementwise one-hot blend.

    For tiny selector ranges (trans: 7 states, mixtures: 3 types) the MXU
    one-hot dot's fixed relayout cost dominates; n_sel multiply-add passes on
    the VPU are cheaper.  Exact for the same reason as _onehot_rows: one
    1.0 * v term per output, the rest +0.0.
    """
    acc = None
    for v in range(n_sel):
        m = (sel == jnp.int32(v)).astype(jnp.float32)  # (1, BLK)
        term = table_t[:, v : v + 1] * m  # (W, BLK)
        acc = term if acc is None else acc + term
    return acc


def _aligned_substep(
    u_err, u_len, u_match, st, mix_t, binlo, mm_comb_t, cum_t,
    n_states, nb, K,
):
    """One aligned-walk event step on (1, BLK) state vectors.

    Mirrors error_walk.error_walk's sub_step exactly (which itself mirrors
    the reference's error_list, simulator.py:1856-1906)."""
    (pos, middle_ref, l_new, prev_state, prev_match, n_events) = st
    active = pos < middle_ref
    # all-i32 literals: weak Python ints become i64 scalars under x64, which
    # Mosaic cannot convert in-kernel
    c0, c1, c2, c3 = (jnp.int32(0), jnp.int32(1), jnp.int32(2), jnp.int32(3))

    # error type: cum rows via one-hot blend, then threshold count (<=)
    rows3 = _blend_rows(cum_t, prev_state, n_states)  # (3, BLK)
    etype = jnp.minimum(
        jnp.sum((rows3 <= u_err).astype(jnp.int32), axis=0, keepdims=True,
                dtype=jnp.int32), c2
    )
    # error length: truncated mixture CDF row, count of entries < u
    mrow = _blend_rows(mix_t, etype, 3)  # (n_t, BLK)
    elen = c1 + jnp.sum((mrow < u_len).astype(jnp.int32), axis=0, keepdims=True,
                        dtype=jnp.int32)

    is_ins = etype == c1
    is_del = etype == c2
    e_pos2x = jnp.where(is_ins, c2 * pos - c1, c2 * pos)
    pos_after = pos + jnp.where(is_ins, c0, elen)
    over1 = jnp.maximum(pos_after - middle_ref, c0)
    l_new_n = l_new + jnp.where(is_ins, elen, jnp.where(is_del, -elen, c0)) + over1
    middle_ref_n = jnp.maximum(middle_ref, jnp.where(is_ins, middle_ref, pos_after))

    # match draw: bin select (count-compare) + one-hot row gather + masked
    # monotone max (EcdfDevice.invert_all semantics)
    lane = jnp.clip(
        jnp.sum((binlo <= prev_match).astype(jnp.int32), axis=0, keepdims=True,
                dtype=jnp.int32) - c1,
        c0,
        jnp.int32(nb - 1),
    )
    # ONE bf16 limb-plane dot for breaks and vals together (the MXU work is
    # the kernel's largest per-step item; stacking + 1-pass bf16 limbs
    # minimize it)
    rows_bv = _onehot_rows_limbs(mm_comb_t, lane, nb, 2 * K)  # (2K, BLK)
    rows_b = rows_bv[:K]
    rows_v = rows_bv[K:]  # f32 (exact ints)
    hit = rows_b <= u_match
    mval = jnp.max(jnp.where(hit, rows_v, jnp.float32(-1.0)), axis=0,
                   keepdims=True)
    mstep = jnp.maximum(mval, rows_v[0:1, :]).astype(jnp.int32)
    mstep = jnp.where((prev_match == c0) & (mstep == c0), c1, mstep)

    over2 = jnp.maximum(pos_after + mstep - middle_ref_n, c0)
    l_new_n = l_new_n + over2
    middle_ref_n = jnp.maximum(middle_ref_n, pos_after + mstep)
    new_state = etype + c1 + jnp.where(mstep == c0, c3, c0)

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
        upd(n_events + c1, n_events),
    ), word


def _unaligned_substep(u_type, u_len, st, mix_t):
    """One unaligned/gap step (error_walk.unaligned_walk's sub_step)."""
    (pos, middle_ref, l_new, n_steps) = st
    active = pos < middle_ref
    c0, c1, c2, c3 = (jnp.int32(0), jnp.int32(1), jnp.int32(2), jnp.int32(3))
    kind = (
        (u_type >= jnp.float32(0.4)).astype(jnp.int32)
        + (u_type >= jnp.float32(0.7)).astype(jnp.int32)
        + (u_type >= jnp.float32(0.85)).astype(jnp.int32)
    )
    etype = jnp.clip(kind - c1, c0, c2)
    is_err = kind > c0
    mrow = _blend_rows(mix_t, etype, 3)
    elen_mix = c1 + jnp.sum((mrow < u_len).astype(jnp.int32), axis=0,
                            keepdims=True, dtype=jnp.int32)
    elen = jnp.where(is_err, elen_mix, c1)
    is_ins = kind == c2
    is_del = kind == c3

    e_pos2x = jnp.where(is_ins, c2 * pos + c1, c2 * pos)
    e_len_store = jnp.where(is_err, elen, c0)
    pos_after = pos + jnp.where(is_ins, c0, elen)
    over = jnp.maximum(pos_after - middle_ref, c0)
    l_new_n = l_new + jnp.where(is_ins, elen, jnp.where(is_del, -elen, c0))
    l_new_n = l_new_n + jnp.where(is_ins, c0, over)
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
        upd(n_steps + c1, n_steps),
    ), word


def _make_aligned_kernel(E, BLK, n_states, nb, K):
    def kernel(
        wk0_ref, wk1_ref, mref_ref, pm_ref,
        mix_t_ref, binlo_ref, mm_comb_t_ref, cum_t_ref,
        ev_ref, pos_ref, mid_ref, lnew_ref, nev_ref,
        stage_ref, sem,
    ):
        g = pl.program_id(0)
        wk0 = wk0_ref[0]
        wk1 = wk1_ref[0]
        m_ref = mref_ref[0]
        pm = pm_ref[0]
        mix_t = mix_t_ref[:]
        binlo = binlo_ref[:]
        mm_bv = mm_comb_t_ref[:]
        cum_t = cum_t_ref[:]
        zero = jnp.zeros_like(m_ref)

        def cond(c):
            i, st = c
            # (jnp.any's scalar bool reduce lowers through f64 in Mosaic)
            n_active = jnp.max((st[0] < st[1]).astype(jnp.int32))
            return (i < jnp.int32(E)) & (n_active > 0)

        def body(c):
            i, st = c
            # walk uniforms for steps i+1 .. i+UNROLL
            u_err8, u_len8, u_match8 = _step_uniforms(wk0, wk1, i + jnp.int32(1), 3)
            words = []
            for k in range(UNROLL):
                st, w = _aligned_substep(
                    u_err8[k : k + 1], u_len8[k : k + 1], u_match8[k : k + 1],
                    st, mix_t, binlo, mm_bv, cum_t, n_states, nb, K,
                )
                words.append(w)
            stage_ref[:] = jnp.concatenate(words, axis=0)
            cp = pltpu.make_async_copy(
                stage_ref,
                ev_ref.at[g, pl.ds(pl.multiple_of(i, UNROLL), UNROLL), :],
                sem,
            )
            cp.start()
            cp.wait()
            return (i + jnp.int32(UNROLL), st)

        init = (pm, m_ref, m_ref, zero, pm, zero)
        _, st = jax.lax.while_loop(cond, body, (jnp.int32(0), init))
        pos_ref[0] = st[0]
        mid_ref[0] = st[1]
        lnew_ref[0] = st[2]
        nev_ref[0] = st[5]

    return kernel


def _make_unaligned_kernel(E, BLK):
    def kernel(
        wk0_ref, wk1_ref, mref_ref, mix_t_ref,
        ev_ref, pos_ref, mid_ref, lnew_ref, nev_ref,
        stage_ref, sem,
    ):
        g = pl.program_id(0)
        wk0 = wk0_ref[0]
        wk1 = wk1_ref[0]
        m_ref = mref_ref[0]
        mix_t = mix_t_ref[:]
        zero = jnp.zeros_like(m_ref)

        def cond(c):
            i, st = c
            # (jnp.any's scalar bool reduce lowers through f64 in Mosaic)
            n_active = jnp.max((st[0] < st[1]).astype(jnp.int32))
            return (i < jnp.int32(E)) & (n_active > 0)

        def body(c):
            i, st = c
            u_type8, u_len8 = _step_uniforms(wk0, wk1, i, 2)
            words = []
            for k in range(UNROLL):
                st, w = _unaligned_substep(
                    u_type8[k : k + 1], u_len8[k : k + 1], st, mix_t
                )
                words.append(w)
            stage_ref[:] = jnp.concatenate(words, axis=0)
            cp = pltpu.make_async_copy(
                stage_ref,
                ev_ref.at[g, pl.ds(pl.multiple_of(i, UNROLL), UNROLL), :],
                sem,
            )
            cp.start()
            cp.wait()
            return (i + jnp.int32(UNROLL), st)

        init = (zero, m_ref, m_ref, zero)
        _, st = jax.lax.while_loop(cond, body, (jnp.int32(0), init))
        pos_ref[0] = st[0]
        mid_ref[0] = st[1]
        lnew_ref[0] = st[2]
        nev_ref[0] = st[3]

    return kernel


def _pad_block(x, B_pad, G, BLK, fill=0):
    x = jnp.pad(x, (0, B_pad - x.shape[0]), constant_values=fill)
    # (G, 1, BLK): a (1, 1, BLK) block satisfies Mosaic's tiling constraint
    # (the second-to-last block dim equals the array dim)
    return x.reshape(G, 1, BLK)


def _block_of(B: int, block: int) -> int:
    """Lane-block width: `block`, shrunk to one 128-multiple covering small
    batches (min tile width)."""
    if B >= block:
        return block
    return max(128, -(-B // 128) * 128)


def _lane_specs(BLK, n):
    # index-map zeros pinned to i32 INSIDE the lambda: weak Python ints trace
    # to i64 under x64 (Mosaic rejects them), and values created outside
    # count as captured constants
    return [
        pl.BlockSpec(
            (1, 1, BLK),
            lambda i: (i, jnp.int32(0), jnp.int32(0)),
            memory_space=pltpu.VMEM,
        )
        for _ in range(n)
    ]


def _table_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(
        shape,
        lambda i, _nd=nd: tuple(jnp.int32(0) for _ in range(_nd)),
        memory_space=pltpu.VMEM,
    )


def _permute(res: WalkResult, inv: jax.Array) -> WalkResult:
    """Undo a lane permutation on every WalkResult field (rows for the
    event buffers, elements for the per-lane state)."""
    return WalkResult(*(f[inv] for f in res))


def _finish(ev, pos, mid, lnew, nev, B, E, aligned: bool):
    """[G, E, BLK] events + [G, BLK] state -> WalkResult ([B, E] layout)."""
    ev = jnp.transpose(ev, (0, 2, 1)).reshape(-1, E)[:B]
    pos = pos.reshape(-1)[:B]
    mid = mid.reshape(-1)[:B]
    lnew = lnew.reshape(-1)[:B]
    nev = nev.reshape(-1)[:B]
    # zero everything beyond the per-lane step prefix (the XLA walks leave
    # masked garbage there; consumers — incl. the replay checksums — only
    # read the prefix, so zeros are equivalent and stricter)
    ev_valid = jnp.arange(E, dtype=jnp.int32)[None, :] < nev[:, None]
    ev = jnp.where(ev_valid, ev, jnp.uint32(0))
    ev_pos2x = (ev & jnp.uint32(0x7FFFF)).astype(jnp.int32)
    ev_type = (ev >> jnp.uint32(30)).astype(jnp.int32)
    ev_len = ((ev >> jnp.uint32(19)) & jnp.uint32(0x7FF)).astype(jnp.int32)
    zero = jnp.zeros_like(pos)
    if aligned:
        vlen = jnp.where(ev_valid, ev_len, 0)
        ecnt_mis = jnp.sum(jnp.where(ev_type == 0, vlen, 0), axis=1)
        ecnt_ins = jnp.sum(jnp.where(ev_type == 1, vlen, 0), axis=1)
        ecnt_del = jnp.sum(jnp.where(ev_type == 2, vlen, 0), axis=1)
        ecnt_match = mid - ecnt_mis - ecnt_del
    else:
        ev_valid = ev_valid & (ev_len > 0)
        ecnt_mis = ecnt_ins = ecnt_match = zero
    return WalkResult(
        events_pos2x=ev_pos2x,
        events_type=ev_type,
        events_len=ev_len,
        events_valid=ev_valid,
        middle_ref=mid,
        l_new=lnew,
        overflow=pos < mid,
        n_events=nev,
        ecnt_mis=ecnt_mis,
        ecnt_ins=ecnt_ins,
        ecnt_match=ecnt_match,
    )


@functools.partial(
    jax.jit, static_argnames=("max_events", "block", "interpret")
)
def error_walk_pallas(
    slot_keys: jax.Array,  # [B, 2]
    m_ref: jax.Array,  # [B] int32
    first_match: EcdfDevice,
    match_markov: EcdfDevice,
    mixtures: MixtureDevice,
    trans: TransErrorDevice,
    max_events: int,
    block: int = 1024,
    interpret: bool = False,
) -> WalkResult:
    """Drop-in Pallas replacement for :func:`..ops.error_walk.error_walk`."""
    B = m_ref.shape[0]
    E = max_events
    assert E % UNROLL == 0
    walk_keys = rng.site_keys(slot_keys, rng.SITE_WALK)

    # first match (outside the kernel; one draw per lane)
    u0 = _uniforms(walk_keys, 0, 1)[:, 0]
    fm = first_match.invert(jnp.zeros(B, jnp.int32), u0)
    prev_match = jnp.maximum(fm, 2)

    BLK = _block_of(B, block)
    G = -(-B // BLK)
    B_pad = G * BLK
    m_ref = m_ref.astype(jnp.int32)
    # With several lane blocks, sort lanes by m_ref (descending) so each
    # block's early exit fires at ITS max instead of the global one (the sum
    # of sorted block maxima tracks the mean walk length, not the tail).
    # Free semantically: draws are (slot, site)-key-addressed, so placement
    # cannot change them, and the permutation is undone on every output.
    inv = None
    if G > 1:
        order = jnp.argsort(-m_ref)
        inv = jnp.argsort(order)
        walk_keys = walk_keys[order]
        m_ref = m_ref[order]
        prev_match = prev_match[order]
    wk0 = _pad_block(walk_keys[:, 0].astype(jnp.uint32), B_pad, G, BLK)
    wk1 = _pad_block(walk_keys[:, 1].astype(jnp.uint32), B_pad, G, BLK)
    mref_b = _pad_block(m_ref, B_pad, G, BLK)
    pm_b = _pad_block(prev_match.astype(jnp.int32), B_pad, G, BLK, fill=2)

    mix_t = mixtures.cdf_t.T  # (n_t, 3)
    binlo = match_markov.bin_lo.astype(jnp.int32)[:, None]  # (nb, 1)
    # breaks stacked over vals -> ONE row-select dot in the kernel, stored
    # as 3 exact bf16 limb planes for a single-pass MXU select
    mm_comb_t = _limb_planes3(
        jnp.concatenate(
            [match_markov.breaks.T, match_markov.vals.astype(jnp.float32).T],
            axis=0,
        )
    )  # (6K, nb) bf16
    cum_t = trans.cum.T  # (3, n_states)
    nb = match_markov.breaks.shape[0]
    K = match_markov.breaks.shape[1]
    n_states = trans.cum.shape[0]

    kernel = _make_aligned_kernel(E, BLK, n_states, nb, K)
    ev, pos, mid, lnew, nev = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=_lane_specs(BLK, 4)
        + [
            _table_spec(mix_t.shape),
            _table_spec(binlo.shape),
            _table_spec(mm_comb_t.shape),
            _table_spec(cum_t.shape),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] + _lane_specs(BLK, 4),
        out_shape=[
            jax.ShapeDtypeStruct((G, E, BLK), jnp.uint32),
            jax.ShapeDtypeStruct((G, 1, BLK), jnp.int32),
            jax.ShapeDtypeStruct((G, 1, BLK), jnp.int32),
            jax.ShapeDtypeStruct((G, 1, BLK), jnp.int32),
            jax.ShapeDtypeStruct((G, 1, BLK), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((UNROLL, BLK), jnp.uint32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(wk0, wk1, mref_b, pm_b, mix_t, binlo, mm_comb_t, cum_t)
    res = _finish(ev, pos, mid, lnew, nev, B, E, aligned=True)
    return _permute(res, inv) if inv is not None else res


@functools.partial(
    jax.jit, static_argnames=("max_steps", "block", "interpret")
)
def unaligned_walk_pallas(
    slot_keys: jax.Array,  # [B, 2]
    m_ref: jax.Array,  # [B] int32
    mixtures: MixtureDevice,
    max_steps: int,
    block: int = 1024,
    interpret: bool = False,
) -> WalkResult:
    """Drop-in Pallas replacement for :func:`..ops.error_walk.unaligned_walk`."""
    B = m_ref.shape[0]
    E = max_steps
    assert E % UNROLL == 0
    walk_keys = rng.site_keys(slot_keys, rng.SITE_UNALIGNED_WALK)

    BLK = _block_of(B, block)
    G = -(-B // BLK)
    B_pad = G * BLK
    m_ref = m_ref.astype(jnp.int32)
    inv = None
    if G > 1:  # sorted lane blocks — see error_walk_pallas
        order = jnp.argsort(-m_ref)
        inv = jnp.argsort(order)
        walk_keys = walk_keys[order]
        m_ref = m_ref[order]
    wk0 = _pad_block(walk_keys[:, 0].astype(jnp.uint32), B_pad, G, BLK)
    wk1 = _pad_block(walk_keys[:, 1].astype(jnp.uint32), B_pad, G, BLK)
    mref_b = _pad_block(m_ref, B_pad, G, BLK)
    mix_t = mixtures.cdf_t.T  # (n_t, 3)

    kernel = _make_unaligned_kernel(E, BLK)
    ev, pos, mid, lnew, nev = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=_lane_specs(BLK, 3) + [_table_spec(mix_t.shape)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] + _lane_specs(BLK, 4),
        out_shape=[
            jax.ShapeDtypeStruct((G, E, BLK), jnp.uint32),
            jax.ShapeDtypeStruct((G, 1, BLK), jnp.int32),
            jax.ShapeDtypeStruct((G, 1, BLK), jnp.int32),
            jax.ShapeDtypeStruct((G, 1, BLK), jnp.int32),
            jax.ShapeDtypeStruct((G, 1, BLK), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((UNROLL, BLK), jnp.uint32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(wk0, wk1, mref_b, mix_t)
    res = _finish(ev, pos, mid, lnew, nev, B, E, aligned=False)
    return _permute(res, inv) if inv is not None else res
