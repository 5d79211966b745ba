#!/usr/bin/env python
"""Walk-kernel candidate prototype bench: measures full-walk-shaped loops.

Variants (all E steps, UNROLL substeps per iteration, realistic state):
  A: empty-body loop               -> pure iteration overhead
  B: compare-all substeps, U step-major [E,3,B], block event writes
  C: row-gather substeps (current style), U lane-major [B,E,3], per-step col writes
  B16: variant B with UNROLL=16
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--E", type=int, default=1120)
    ap.add_argument("--trunc", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    B, E = args.batch, args.E
    log("devices:", jax.devices())

    cdf = jnp.sort(jax.random.uniform(jax.random.PRNGKey(1), (3, 1024)), axis=1)
    cdf_t = cdf[:, : args.trunc]
    breaks = jnp.sort(jax.random.uniform(jax.random.PRNGKey(2), (15, 150)), axis=1)
    vals = jnp.cumsum(jax.random.randint(jax.random.PRNGKey(3), (15, 150), 0, 3), axis=1).astype(jnp.int32)
    cum7 = jnp.sort(jax.random.uniform(jax.random.PRNGKey(4), (7, 3)), axis=1)
    bin_lo = jnp.arange(15, dtype=jnp.int32) * 20
    m_ref = jax.random.randint(jax.random.PRNGKey(5), (B,), 2000, 18000)

    U_lane = jax.random.uniform(jax.random.PRNGKey(0), (B, E + 1, 3), dtype=jnp.float32)
    U_step = jnp.transpose(U_lane, (1, 2, 0))  # [E+1, 3, B]

    def t_of(fn, *a, reps=5):
        r = jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*a)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / reps

    # --- A: empty loop ---
    @jax.jit
    def empty_loop(m_ref):
        def cond(c):
            i, pos = c
            return (i < E) & jnp.any(pos < m_ref)

        def body(c):
            i, pos = c
            return (i + 8, pos + 1)

        return jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.zeros(B, jnp.int32)))

    t = t_of(empty_loop, m_ref)
    log(f"  A empty while ({E // 8} iters):      {t * 1e3:7.2f} ms")

    # --- B: compare-all, step-major U, block writes ---
    def make_b(unroll):
        @jax.jit
        def walk_b(U_step, m_ref):
            def sub(t, st):
                pos, mref, lnew, state, pm, nev, words = st
                active = pos < mref
                us = jax.lax.dynamic_slice(U_step, (t, 0, 0), (1, 3, B))[0]
                u_err, u_len, u_match = us[0], us[1], us[2]
                # etype: compare-all over 7 states then one-hot select
                cnt73 = jnp.minimum(
                    jnp.sum((cum7[None, :, :] <= u_err[:, None, None]), axis=-1), 2
                )  # [B,7]
                etype = jnp.sum(
                    jnp.where(state[:, None] == jnp.arange(7)[None, :], cnt73, 0), axis=1
                )
                # elen: compare-all over 3 truncated rows
                cnt3 = jnp.sum(cdf_t[None, :, :] < u_len[:, None, None], axis=-1)  # [B,3]
                elen = 1 + jnp.sum(
                    jnp.where(etype[:, None] == jnp.arange(3)[None, :], cnt3, 0), axis=1
                )
                # mstep: masked monotone-max over (bin, breaks) with bin one-hot folded in
                bin_ = jnp.clip(
                    jnp.sum((bin_lo[None, :] <= pm[:, None]).astype(jnp.int32), axis=1) - 1,
                    0, 14,
                )
                sel = bin_[:, None] == jnp.arange(15)[None, :]  # [B,15]
                hit = u_match[:, None, None] >= breaks[None, :, :]  # [B,15,150]
                v = jnp.where(hit & sel[:, :, None], vals[None, :, :], -1)
                fallback = jnp.sum(jnp.where(sel, vals[None, :, 0], 0), axis=1)
                mstep = jnp.maximum(jnp.max(v, axis=(1, 2)), fallback)
                mstep = jnp.where((pm == 0) & (mstep == 0), 1, mstep)

                is_ins = etype == 1
                is_del = etype == 2
                pos_after = pos + jnp.where(is_ins, 0, elen)
                over1 = jnp.maximum(pos_after - mref, 0)
                lnew_n = lnew + jnp.where(is_ins, elen, jnp.where(is_del, -elen, 0)) + over1
                mref_n = jnp.maximum(mref, jnp.where(is_ins, mref, pos_after))
                over2 = jnp.maximum(pos_after + mstep - mref_n, 0)
                lnew_n = lnew_n + over2
                mref_n = jnp.maximum(mref_n, pos_after + mstep)
                new_state = etype + 1 + jnp.where(mstep == 0, 3, 0)
                word = elen.astype(jnp.uint32) | (etype.astype(jnp.uint32) << 20)

                upd = lambda n, o: jnp.where(active, n, o)
                return (
                    upd(pos_after + mstep, pos), upd(mref_n, mref), upd(lnew_n, lnew),
                    upd(new_state, state), upd(mstep, pm), upd(nev + 1, nev),
                    words + [word],
                )

            def cond(c):
                i, st, ev = c
                return (i < E) & jnp.any(st[0] < st[1])

            def body(c):
                i, st, ev = c
                st = st + ([],)
                for k in range(unroll):
                    st = sub(i + k, st)
                words = st[-1]
                st = st[:-1]
                block = jnp.stack(words, axis=0)  # [unroll, B]
                ev = jax.lax.dynamic_update_slice(ev, block, (i, jnp.int32(0)))
                return (i + unroll, st, ev)

            zero = jnp.zeros(B, jnp.int32)
            st0 = (zero, m_ref, m_ref, zero, zero + 10, zero)
            ev0 = jnp.zeros((E, B), jnp.uint32)
            i, st, ev = jax.lax.while_loop(cond, body, (jnp.int32(0), st0, ev0))
            return st[0], ev

        return walk_b

    for unroll in (8, 16):
        fn = make_b(unroll)
        t = t_of(fn, U_step, m_ref)
        log(f"  B compare-all UNROLL={unroll}:        {t * 1e3:7.2f} ms")

    # --- C: current row-gather style ---
    @jax.jit
    def walk_c(U_lane, m_ref):
        def sub(t, st):
            pos, mref, lnew, state, pm, nev, ev = st
            active = pos < mref
            us = jax.lax.dynamic_slice(U_lane, (jnp.int32(0), t, jnp.int32(0)), (B, 1, 3))[:, 0, :]
            u_err, u_len, u_match = us[:, 0], us[:, 1], us[:, 2]
            rows = cum7[state]
            etype = jnp.minimum(jnp.sum(rows <= u_err[:, None], axis=-1), 2).astype(jnp.int32)
            rowsm = cdf[etype]
            elen = 1 + jnp.sum(rowsm < u_len[:, None], axis=-1).astype(jnp.int32)
            bin_ = jnp.clip(jnp.sum((bin_lo[None, :] <= pm[:, None]).astype(jnp.int32), axis=1) - 1, 0, 14)
            rowsb = breaks[bin_]
            cnt = jnp.sum((rowsb <= u_match[:, None]).astype(jnp.int32), axis=-1)
            mstep = vals[bin_, jnp.clip(cnt - 1, 0, 149)]
            mstep = jnp.where((pm == 0) & (mstep == 0), 1, mstep)
            is_ins = etype == 1
            is_del = etype == 2
            pos_after = pos + jnp.where(is_ins, 0, elen)
            over1 = jnp.maximum(pos_after - mref, 0)
            lnew_n = lnew + jnp.where(is_ins, elen, jnp.where(is_del, -elen, 0)) + over1
            mref_n = jnp.maximum(mref, jnp.where(is_ins, mref, pos_after))
            over2 = jnp.maximum(pos_after + mstep - mref_n, 0)
            lnew_n = lnew_n + over2
            mref_n = jnp.maximum(mref_n, pos_after + mstep)
            new_state = etype + 1 + jnp.where(mstep == 0, 3, 0)
            word = elen.astype(jnp.uint32) | (etype.astype(jnp.uint32) << 20)
            ev = jax.lax.dynamic_update_slice(ev, word[:, None], (jnp.int32(0), t))
            upd = lambda n, o: jnp.where(active, n, o)
            return (
                upd(pos_after + mstep, pos), upd(mref_n, mref), upd(lnew_n, lnew),
                upd(new_state, state), upd(mstep, pm), upd(nev + 1, nev), ev,
            )

        def cond(c):
            i, st = c
            return (i < E) & jnp.any(st[0] < st[1])

        def body(c):
            i, st = c
            for k in range(8):
                st = sub(i + k, st)
            return (i + 8, st)

        zero = jnp.zeros(B, jnp.int32)
        st0 = (zero, m_ref, m_ref, zero, zero + 10, zero, jnp.zeros((B, E), jnp.uint32))
        i, st = jax.lax.while_loop(cond, body, (jnp.int32(0), st0))
        return st[0], st[6]

    t = t_of(walk_c, U_lane, m_ref)
    log(f"  C row-gather (current style):   {t * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
