#!/usr/bin/env python
"""Microbenchmarks for walk-kernel design candidates (VERDICT r4 item 1).

Times, on the real chip, the candidate primitives for restructuring the
error walk: bulk chunk precomputes (compare+reduce over all states/bins)
vs the current per-step row-gather scans, and the cheap one-hot select
loop. Informs the chunked walk design before committing to it.

    python bench/micro_walk.py [--batch 1024] [--E 1120] [--chunk 128]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, n=10, warm=2):
    import jax

    for _ in range(warm):
        r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--E", type=int, default=1120)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    B, E, C = args.batch, args.E, args.chunk
    log("devices:", jax.devices())

    key = jax.random.PRNGKey(0)
    U = jax.random.uniform(key, (B, E + 1, 3), dtype=jnp.float32)
    cdf = jnp.sort(jax.random.uniform(jax.random.PRNGKey(1), (3, 1024)), axis=1)
    breaks = jnp.sort(jax.random.uniform(jax.random.PRNGKey(2), (15, 150)), axis=1)
    vals = jnp.cumsum(jax.random.randint(jax.random.PRNGKey(3), (15, 150), 0, 3), axis=1).astype(jnp.int32)
    cum7 = jnp.sort(jax.random.uniform(jax.random.PRNGKey(4), (7, 3)), axis=1)
    bin_lo = jnp.arange(15, dtype=jnp.int32) * 20

    # --- bulk chunk precomputes, per-chunk [B, C] uniforms ---
    @jax.jit
    def bulk_elen(u):  # [B, C] -> [B, C, 3]
        return 1 + jnp.sum(u[:, :, None, None] > cdf[None, None, :, :], axis=-1).astype(jnp.int32)

    @jax.jit
    def bulk_mval(u):  # [B, C] -> [B, C, 15]
        m = u[:, :, None, None] >= breaks[None, None, :, :]
        v = jnp.where(m, vals[None, None, :, :], vals[None, None, :, 0:1])
        return jnp.max(v, axis=-1)

    @jax.jit
    def bulk_etype(u):  # [B, C] -> [B, C, 7]
        return jnp.minimum(
            jnp.sum(cum7[None, None, :, :] <= u[:, :, None, None], axis=-1), 2
        ).astype(jnp.int32)

    uC = U[:, :C, 0]
    for name, fn in [("bulk_elen [B,C,3,1024]", bulk_elen), ("bulk_mval [B,C,15,150]", bulk_mval), ("bulk_etype [B,C,7,3]", bulk_etype)]:
        r = jax.block_until_ready(fn(uC))
        t = timeit(lambda fn=fn: fn(uC), n=args.reps)
        per_E = t * (E / C)
        log(f"  {name}: {t * 1e3:7.2f} ms/chunk  -> {per_E * 1e3:7.2f} ms for E={E}")

    # --- the cheap select loop over one chunk's tables ---
    elen3 = bulk_elen(uC)
    mval15 = bulk_mval(uC)
    etype7 = bulk_etype(uC)

    UNROLL = 8

    @jax.jit
    def select_loop(elen3, mval15, etype7):
        def sub(t, st):
            pos, mref, state, pm, ev = st
            e7 = jax.lax.dynamic_slice(etype7, (0, t, 0), (B, 1, 7))[:, 0, :]
            l3 = jax.lax.dynamic_slice(elen3, (0, t, 0), (B, 1, 3))[:, 0, :]
            m15 = jax.lax.dynamic_slice(mval15, (0, t, 0), (B, 1, 15))[:, 0, :]
            etype = jnp.sum(jnp.where(state[:, None] == jnp.arange(7)[None, :], e7, 0), axis=1)
            elen = jnp.sum(jnp.where(etype[:, None] == jnp.arange(3)[None, :], l3, 0), axis=1)
            bin_ = jnp.clip(jnp.sum((bin_lo[None, :] <= pm[:, None]).astype(jnp.int32), axis=1) - 1, 0, 14)
            mstep = jnp.sum(jnp.where(bin_[:, None] == jnp.arange(15)[None, :], m15, 0), axis=1)
            active = pos < mref
            word = (elen.astype(jnp.uint32) | (etype.astype(jnp.uint32) << 20))
            ev = jax.lax.dynamic_update_slice(ev, word[:, None], (jnp.int32(0), t))
            upd = lambda n, o: jnp.where(active, n, o)
            return (upd(pos + elen + mstep, pos), mref, upd(etype + 1, state), upd(mstep, pm), ev)

        def body(c, st):
            for k in range(UNROLL):
                st = sub(c * UNROLL + k, st)
            return st

        st = (jnp.zeros(B, jnp.int32), jnp.full(B, 10**6, jnp.int32),
              jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
              jnp.zeros((B, E), jnp.uint32))
        st = jax.lax.fori_loop(0, C // UNROLL, body, st)
        return st[0], st[4]

    r = jax.block_until_ready(select_loop(elen3, mval15, etype7))
    t = timeit(lambda: select_loop(elen3, mval15, etype7), n=args.reps)
    log(f"  select loop (C={C} steps): {t * 1e3:7.2f} ms/chunk -> {t * (E / C) * 1e3:7.2f} ms for E={E}")

    # --- current per-step row-gather primitives, C steps for comparison ---
    @jax.jit
    def gather_loop(u):
        def body(t, acc):
            uu = jax.lax.dynamic_slice(u, (0, t), (B, 1))[:, 0]
            et = jnp.minimum(acc[0] % 3, 2)
            rows = cdf[et]
            idx = jnp.sum(rows < uu[:, None], axis=-1)
            lane = acc[0] % 15
            rows2 = breaks[lane]
            cnt = jnp.sum((rows2 <= uu[:, None]).astype(jnp.int32), axis=-1)
            v = vals[lane, jnp.clip(cnt - 1, 0, 149)]
            return (acc[0] + idx + v, acc[1])

        return jax.lax.fori_loop(0, C, body, (jnp.zeros(B, jnp.int32), jnp.int32(0)))

    r = jax.block_until_ready(gather_loop(uC))
    t = timeit(lambda: gather_loop(uC), n=args.reps)
    log(f"  row-gather loop (C={C} steps): {t * 1e3:7.2f} ms/chunk -> {t * (E / C) * 1e3:7.2f} ms for E={E}")


if __name__ == "__main__":
    main()
