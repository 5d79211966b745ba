#!/usr/bin/env python
"""Decompose the remaining walk cost: bulk hashing vs loop, and step count."""

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

    from nanosim_tpu.io import PackedGenome
    from nanosim_tpu.ops import error_walk, rng
    from nanosim_tpu.profiles import fixtures, profile
    from nanosim_tpu.sim.genome_mode import GenomeSimulator, _kde_draw, draw_ht

    log("devices:", jax.devices())
    d = tempfile.mkdtemp(prefix="nanosim_prof_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    prefix = os.path.join(d, "training")
    fixtures.make_model_dir(prefix, mean_read_len=8000, sd_read_len=2200, n_kde_points=2000)
    ref_fa = os.path.join(d, "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [2 * 10**6] * 2, seed=11)
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome")
    sim = GenomeSimulator(genome, prof, batch=1024)
    B, E = sim.batch, sim.e_max
    log(f"e_max={E} mixture cdf_t width: {sim.tables.mixtures.cdf_t.shape}")

    base = rng.base_key(0, rng.STREAM_ALIGNED)
    slots = jnp.arange(B, dtype=jnp.int64)
    sk = rng.slot_keys(base, slots)

    @jax.jit
    def draws(sk):
        ref_len_f = _kde_draw(sk, rng.SITE_REF_LENGTH, sim.tables.kde_aligned, 1)[:, 0]
        remainder, head, tail, ht_ok = draw_ht(sk, sim.tables, sim.ht_cap)
        return ref_len_f, remainder

    ref_len_f, remainder = jax.block_until_ready(draws(sk))
    m_ref = jnp.clip((ref_len_f - remainder).astype(jnp.int32), 0, sim.l_cap)

    # full walk
    walk_fn = jax.jit(
        lambda sk, m_ref: error_walk.error_walk(
            sk, m_ref, sim.tables.first_match, sim.tables.match_markov,
            sim.tables.mixtures, sim.tables.trans, E,
        )
    )
    w = jax.block_until_ready(walk_fn(sk, m_ref))
    t = timeit(lambda: walk_fn(sk, m_ref))
    ne = np.asarray(w.n_events)
    log(f"walk: {t * 1e3:7.2f} ms   n_events mean={ne.mean():.0f} max={ne.max()} "
        f"(executed iterations ~= {-(-int(ne.max()) // error_walk.UNROLL)})")

    # hashing only
    @jax.jit
    def hash_only(sk):
        wk = rng.site_keys(sk, rng.SITE_WALK)
        return jnp.transpose(error_walk._bulk_uniforms(wk, E + 1, 3), (1, 2, 0))

    r = jax.block_until_ready(hash_only(sk))
    t = timeit(lambda: hash_only(sk))
    log(f"bulk uniforms [B,{E + 1},3] + transpose: {t * 1e3:7.2f} ms")

    # final transpose cost proxy
    ev = jnp.zeros((E, B), jnp.uint32)

    @jax.jit
    def tp(x):
        return jnp.transpose(x) + jnp.uint32(1)

    r = jax.block_until_ready(tp(ev))
    t = timeit(lambda: tp(ev))
    log(f"[E,B] -> [B,E] transpose: {t * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
