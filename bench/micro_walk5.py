#!/usr/bin/env python
"""Ablation bench: walk loop with individual substep components disabled."""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


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
    import tempfile

    import jax
    import jax.numpy as jnp

    from nanosim_tpu.ops import error_walk, rng
    from nanosim_tpu.ops.error_walk import UNROLL, E_INS, E_DEL, E_MIS, STATE_START, _bulk_uniforms, _uniforms
    from nanosim_tpu.profiles import fixtures, profile
    from nanosim_tpu.sim.bundles import build_tables

    log("devices:", jax.devices())
    d = tempfile.mkdtemp(prefix="nanosim_prof_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    prefix = os.path.join(d, "training")
    fixtures.make_model_dir(prefix, mean_read_len=8000, sd_read_len=2200, n_kde_points=2000)
    prof = profile.load_profile(prefix, mode="genome")
    tables = build_tables(prof)
    B, E = 1024, 1120
    fmt, mmt, mix, trans = tables.first_match, tables.match_markov, tables.mixtures, tables.trans

    base = rng.base_key(0, rng.STREAM_ALIGNED)
    slots = jnp.arange(B, dtype=jnp.int64)
    sk = rng.slot_keys(base, slots)
    m_ref = jnp.clip(
        (jax.random.normal(jax.random.PRNGKey(7), (B,)) * 2200 + 8000).astype(jnp.int32), 100, 17664
    )

    import functools

    @functools.partial(jax.jit, static_argnames=("no_trans", "no_mix", "no_match", "no_ev", "no_uslice"))
    def walk_var(sk, m_ref, no_trans=False, no_mix=False, no_match=False, no_ev=False, no_uslice=False):
        walk_keys = rng.site_keys(sk, rng.SITE_WALK)
        u0 = _uniforms(walk_keys, 0, 1)[:, 0]
        fm = fmt.invert(jnp.zeros(B, jnp.int32), u0)
        prev_match = jnp.maximum(fm, 2)
        U = _bulk_uniforms(walk_keys, E + 1, 3)

        def sub_step(t, st):
            (pos, middle_ref, l_new, prev_state, pm, n_events) = st
            active = pos < middle_ref
            if no_uslice:
                u_err = u_len = u_match = (jnp.float32(t) * 0.13) % 1.0 + jnp.zeros(B)
            else:
                us = jax.lax.dynamic_slice(U, (t, jnp.int32(0), jnp.int32(0)), (1, B, 3))[0]
                u_err, u_len, u_match = us[:, 0], us[:, 1], us[:, 2]
            etype = (jnp.zeros(B, jnp.int32) if no_trans else trans.sample_all(prev_state, u_err))
            elen = (jnp.ones(B, jnp.int32) if no_mix else mix.sample_all(etype, u_len))
            is_ins = etype == E_INS
            is_del = etype == E_DEL
            e_pos2x = jnp.where(is_ins, 2 * pos - 1, 2 * pos)
            pos_after = pos + jnp.where(is_ins, 0, elen)
            over1 = jnp.maximum(pos_after - middle_ref, 0)
            l_new_n = l_new + jnp.where(is_ins, elen, jnp.where(is_del, -elen, 0)) + over1
            middle_ref_n = jnp.maximum(middle_ref, jnp.where(is_ins, middle_ref, pos_after))
            if no_match:
                mstep = jnp.full(B, 17, jnp.int32)
            else:
                bins = mmt.select_bin(pm)
                mstep = mmt.invert(bins, u_match)
            mstep = jnp.where((pm == 0) & (mstep == 0), 1, mstep)
            over2 = jnp.maximum(pos_after + mstep - middle_ref_n, 0)
            l_new_n = l_new_n + over2
            middle_ref_n = jnp.maximum(middle_ref_n, pos_after + mstep)
            new_state = etype + 1 + jnp.where(mstep == 0, 3, 0)
            word = (
                e_pos2x.astype(jnp.uint32)
                | (elen.astype(jnp.uint32) << jnp.uint32(19))
                | (etype.astype(jnp.uint32) << jnp.uint32(30))
            )
            upd = lambda n_, o: jnp.where(active, n_, o)
            return (
                upd(pos_after + mstep, pos), upd(middle_ref_n, middle_ref), upd(l_new_n, l_new),
                upd(new_state, prev_state), upd(mstep, pm), upd(n_events + 1, n_events),
            ), word

        def cond(c):
            i, st, _ = c
            return (i < E) & jnp.any(st[0] < st[1])

        def body(c):
            i, st, ev = c
            words = []
            for k in range(UNROLL):
                st, w = sub_step(i + k + 1, st)
                words.append(w)
            if not no_ev:
                ev = jax.lax.dynamic_update_slice(ev, jnp.stack(words, axis=1), (jnp.int32(0), i))
            else:
                ev = ev + words[-1][:, None] * 0  # keep carry alive
            return (i + UNROLL, st, ev)

        zero = jnp.zeros(B, jnp.int32)
        st0 = (prev_match, m_ref, m_ref, jnp.full(B, STATE_START, jnp.int32), prev_match, zero)
        ev0 = jnp.zeros((B, E), jnp.uint32)
        i, st, ev = jax.lax.while_loop(cond, body, (jnp.int32(0), st0, ev0))
        return st[0], st[5], ev, i

    variants = [
        ("full", {}),
        ("no_trans", dict(no_trans=True)),
        ("no_mix", dict(no_mix=True)),
        ("no_match(fixed mstep)", dict(no_match=True)),
        ("no_ev_write", dict(no_ev=True)),
        ("no_uslice", dict(no_uslice=True)),
        ("bare(loop only)", dict(no_trans=True, no_mix=True, no_match=True, no_ev=True, no_uslice=True)),
    ]
    for name, kw in variants:
        fn = lambda kw=kw: walk_var(sk, m_ref, **kw)
        r = jax.block_until_ready(fn())
        t = timeit(fn)
        iters = int(np.asarray(r[3]))
        log(f"  {name:24s}: {t * 1e3:7.2f} ms  (iters={iters})")


if __name__ == "__main__":
    main()
