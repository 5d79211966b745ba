#!/usr/bin/env python
"""Walk-primitive microbench v2: amortize dispatch by iterating inside jit.

Each candidate primitive runs R times inside one jitted fori_loop (data
threaded through to defeat CSE), so per-call tunnel overhead (~3 ms via
axon) is divided out.
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
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--R", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    B, E, C, R = args.batch, args.E, args.chunk, args.R
    log("devices:", jax.devices())

    U = jax.random.uniform(jax.random.PRNGKey(0), (B, C), dtype=jnp.float32)
    cdf = jnp.sort(jax.random.uniform(jax.random.PRNGKey(1), (3, 1024)), axis=1)
    breaks = jnp.sort(jax.random.uniform(jax.random.PRNGKey(2), (15, 150)), axis=1)
    vals = jnp.cumsum(jax.random.randint(jax.random.PRNGKey(3), (15, 150), 0, 3), axis=1).astype(jnp.int32)
    cum7 = jnp.sort(jax.random.uniform(jax.random.PRNGKey(4), (7, 3)), axis=1)
    bin_lo = jnp.arange(15, dtype=jnp.int32) * 20

    def reps(body):
        @jax.jit
        def run(u):
            def it(i, carry):
                u2 = u + carry * 1e-12
                return body(u2)
            return jax.lax.fori_loop(0, R, it, jnp.float32(0.0))
        return run

    def t_of(run, u):
        r = jax.block_until_ready(run(u))
        t0 = time.perf_counter()
        for _ in range(3):
            r = run(u)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / 3 / R

    # elen: compare+reduce over [B,C,3,1024]
    def elen_body(u):
        s = jnp.sum((u[:, :, None, None] > cdf[None, None, :, :]).astype(jnp.int32), axis=-1)
        return jnp.float32(jnp.sum(s))
    t = t_of(reps(elen_body), U)
    log(f"  bulk_elen:  {t * 1e3:7.3f} ms/chunk -> {t * (E / C) * 1e3:7.2f} ms/E")

    # mval: masked max over [B,C,15,150]
    def mval_body(u):
        m = u[:, :, None, None] >= breaks[None, None, :, :]
        v = jnp.where(m, vals[None, None, :, :], vals[None, None, :, 0:1])
        return jnp.float32(jnp.sum(jnp.max(v, axis=-1)))
    t = t_of(reps(mval_body), U)
    log(f"  bulk_mval:  {t * 1e3:7.3f} ms/chunk -> {t * (E / C) * 1e3:7.2f} ms/E")

    # etype
    def etype_body(u):
        s = jnp.minimum(jnp.sum((cum7[None, None, :, :] <= u[:, :, None, None]).astype(jnp.int32), axis=-1), 2)
        return jnp.float32(jnp.sum(s))
    t = t_of(reps(etype_body), U)
    log(f"  bulk_etype: {t * 1e3:7.3f} ms/chunk -> {t * (E / C) * 1e3:7.2f} ms/E")

    # select loop over C steps with UNROLL=8
    UNROLL = 8
    elen3 = jnp.ones((B, C, 3), jnp.int32)
    mval15 = jnp.ones((B, C, 15), jnp.int32)
    etype7 = jnp.ones((B, C, 7), jnp.int32)

    @jax.jit
    def select_run(elen3, mval15, etype7):
        def outer(i, carry):
            def sub(t, st):
                pos, state, pm, acc = st
                e7 = jax.lax.dynamic_slice(etype7, (0, t, 0), (B, 1, 7))[:, 0, :]
                l3 = jax.lax.dynamic_slice(elen3, (0, t, 0), (B, 1, 3))[:, 0, :]
                m15 = jax.lax.dynamic_slice(mval15, (0, t, 0), (B, 1, 15))[:, 0, :]
                etype = jnp.sum(jnp.where(state[:, None] == jnp.arange(7)[None, :], e7, 0), axis=1)
                elen = jnp.sum(jnp.where(etype[:, None] == jnp.arange(3)[None, :], l3, 0), axis=1)
                bin_ = jnp.clip(jnp.sum((bin_lo[None, :] <= pm[:, None]).astype(jnp.int32), axis=1) - 1, 0, 14)
                mstep = jnp.sum(jnp.where(bin_[:, None] == jnp.arange(15)[None, :], m15, 0), axis=1)
                return (pos + elen + mstep, (state + etype) % 7, mstep % 300, acc + jnp.sum(mstep))

            def body(c, st):
                for k in range(UNROLL):
                    st = sub(c * UNROLL + k, st)
                return st

            st = (jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32), carry)
            st = jax.lax.fori_loop(0, C // UNROLL, body, st)
            return st[3]
        return jax.lax.fori_loop(0, R, outer, jnp.int32(0))

    r = jax.block_until_ready(select_run(elen3, mval15, etype7))
    t0 = time.perf_counter()
    for _ in range(3):
        r = select_run(elen3, mval15, etype7)
    jax.block_until_ready(r)
    t = (time.perf_counter() - t0) / 3 / R
    log(f"  select loop: {t * 1e3:7.3f} ms/chunk -> {t * (E / C) * 1e3:7.2f} ms/E")

    # ev_word column writes, C per chunk
    @jax.jit
    def evw_run(x):
        def outer(i, carry):
            def body(t, ev):
                w = (jnp.arange(B, dtype=jnp.uint32) + jnp.uint32(t))
                return jax.lax.dynamic_update_slice(ev, w[:, None], (jnp.int32(0), t))
            ev = jax.lax.fori_loop(0, C, body, carry)
            return ev
        return jax.lax.fori_loop(0, R, outer, x)

    x = jnp.zeros((B, E), jnp.uint32)
    r = jax.block_until_ready(evw_run(x))
    t0 = time.perf_counter()
    for _ in range(3):
        r = evw_run(x)
    jax.block_until_ready(r)
    t = (time.perf_counter() - t0) / 3 / R
    log(f"  ev_word col writes: {t * 1e3:7.3f} ms/chunk -> {t * (E / C) * 1e3:7.2f} ms/E")


if __name__ == "__main__":
    main()
