"""Pallas walk kernels vs XLA while-loop walks: on-chip parity + timing."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from nanosim_tpu.io import PackedGenome
from nanosim_tpu.ops import error_walk, rng
from nanosim_tpu.ops.walk_pallas import error_walk_pallas, unaligned_walk_pallas
from nanosim_tpu.profiles import profile

root = "/dev/shm/chimpack"
genome = PackedGenome.from_fasta(os.path.join(root, "ref.fa"))
prof = profile.load_profile(os.path.join(root, "training"), mode="genome", chimeric=True)
from nanosim_tpu.sim.chimeric_mode import ChimericGenomeSimulator

B = 1024
sim = ChimericGenomeSimulator(genome, prof, batch=B)
tab = sim.tables
base = rng.base_key(7, rng.STREAM_ALIGNED)
k_seg, k_gap = 1920, 768
sk_seg = jax.vmap(lambda k: jax.random.fold_in(k, rng.PART_SEGMENT_BASE))(
    rng.slot_keys(base, jnp.arange(k_seg, dtype=jnp.int64)))
sk_gap = jax.vmap(lambda k: jax.random.fold_in(k, rng.PART_GAP_BASE))(
    rng.slot_keys(base, jnp.arange(k_gap, dtype=jnp.int64)))
rr = np.random.default_rng(1)
# mixed realistic lengths (KDE-ish spread), plus dead lanes
m_seg = jnp.asarray(np.where(rr.random(k_seg) < 0.3, 0,
                             rr.lognormal(np.log(6000), 0.6, k_seg)).astype(np.int32))
m_gap = jnp.asarray(np.where(rr.random(k_gap) < 0.5, 0,
                             rr.lognormal(np.log(300), 1.0, k_gap)).astype(np.int32))
m_gap = jnp.minimum(m_gap, sim.gap_cap)

import functools

@jax.jit
def seg_xla(keys, m):
    return error_walk.error_walk(keys, m, tab.first_match, tab.match_markov,
                                 tab.mixtures, tab.trans, sim.e_max)

@jax.jit
def seg_pl(keys, m):
    return error_walk_pallas(keys, m, tab.first_match, tab.match_markov,
                             tab.mixtures, tab.trans, sim.e_max)

@jax.jit
def gap_xla(keys, m):
    return error_walk.unaligned_walk(keys, m, tab.mixtures, sim.gap_steps)

@jax.jit
def gap_pl(keys, m):
    return unaligned_walk_pallas(keys, m, tab.mixtures, sim.gap_steps)


def compare(name, wa, wb, full_prefix):
    for f in ("middle_ref", "l_new", "overflow", "n_events"):
        a, b = np.asarray(getattr(wa, f)), np.asarray(getattr(wb, f))
        assert (a == b).all(), (name, f, np.flatnonzero(a != b)[:5])
    va, vb = np.asarray(wa.events_valid), np.asarray(wb.events_valid)
    assert (va == vb).all(), name
    m = (np.arange(va.shape[1])[None, :] < np.asarray(wa.n_events)[:, None]
         if full_prefix else va)
    for f in ("events_pos2x", "events_type", "events_len"):
        a, b = np.asarray(getattr(wa, f)), np.asarray(getattr(wb, f))
        assert (a[m] == b[m]).all(), (name, f)
    print(f"{name}: parity OK ({int(np.asarray(wa.n_events).sum())} events)")


t0 = time.time()
wb = seg_pl(sk_seg, m_seg); jax.block_until_ready(wb)
print(f"segwalk pallas compile+run: {time.time()-t0:.1f} s")
wa = seg_xla(sk_seg, m_seg); jax.block_until_ready(wa)
compare("segwalk", wa, wb, False)

t0 = time.time()
ub = gap_pl(sk_gap, m_gap); jax.block_until_ready(ub)
print(f"gapwalk pallas compile+run: {time.time()-t0:.1f} s")
ua = gap_xla(sk_gap, m_gap); jax.block_until_ready(ua)
compare("gapwalk", ua, ub, True)

for name, fn, keys, m in (("seg_xla", seg_xla, sk_seg, m_seg),
                          ("seg_pl", seg_pl, sk_seg, m_seg),
                          ("gap_xla", gap_xla, sk_gap, m_gap),
                          ("gap_pl", gap_pl, sk_gap, m_gap)):
    r = fn(keys, m); jax.block_until_ready(r)
    ts = []
    for i in range(5):
        t0 = time.time()
        r = fn(keys, m); jax.block_until_ready(r)
        ts.append((time.time() - t0) * 1e3)
    print(f"{name}: {min(ts):.1f} ms (min of {['%.1f' % t for t in ts]})")

# worst-case uniform lengths (the stages-script config)
m_seg8k = jnp.full(k_seg, 8000, jnp.int32)
wa = seg_xla(sk_seg, m_seg8k); wb = seg_pl(sk_seg, m_seg8k)
jax.block_until_ready((wa, wb))
compare("segwalk@8k", wa, wb, False)
for name, fn in (("seg_xla@8k", seg_xla), ("seg_pl@8k", seg_pl)):
    r = fn(sk_seg, m_seg8k); jax.block_until_ready(r)
    ts = []
    for i in range(5):
        t0 = time.time()
        r = fn(sk_seg, m_seg8k); jax.block_until_ready(r)
        ts.append((time.time() - t0) * 1e3)
    print(f"{name}: {min(ts):.1f} ms")

# --- chained-dispatch device-time measurement (amortizes tunnel RTT) --------
import functools as _ft

def make_chain(walk_fn, keys, reps):
    @jax.jit
    def chain(m):
        tot = jnp.int32(0)
        for _ in range(reps):
            w = walk_fn(keys, m)
            m = m ^ (w.n_events & 1)  # data dependency; ±1 wiggle
            tot = tot + jnp.sum(w.n_events, dtype=jnp.int32)
        return tot, m
    return chain

REPS = 10
print("\nchained x%d (per-call device ms):" % REPS)
for name, fn, keys, m in (
    ("seg_xla", lambda k, m: seg_xla(k, m), sk_seg, m_seg),
    ("seg_pl", lambda k, m: seg_pl(k, m), sk_seg, m_seg),
    ("gap_xla", lambda k, m: gap_xla(k, m), sk_gap, m_gap),
    ("gap_pl", lambda k, m: gap_pl(k, m), sk_gap, m_gap),
    ("seg_xla@8k", lambda k, m: seg_xla(k, m), sk_seg, m_seg8k),
    ("seg_pl@8k", lambda k, m: seg_pl(k, m), sk_seg, m_seg8k),
):
    ch = make_chain(fn, keys, REPS)
    r = ch(m); jax.block_until_ready(r)
    ts = []
    for i in range(3):
        t0 = time.time()
        r = ch(m); jax.block_until_ready(r)
        ts.append((time.time() - t0) * 1e3 / REPS)
    print(f"{name}: {min(ts):.2f} ms/call")
