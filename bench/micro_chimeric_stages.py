"""Stage timing inside the packed chimeric meta program (real chip)."""
import functools, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from nanosim_tpu.io import PackedGenome
from nanosim_tpu.ops import error_walk, rng
from nanosim_tpu.profiles import fixtures, profile
from nanosim_tpu.sim.chimeric_mode import ChimericGenomeSimulator

root = "/dev/shm/chimpack"
genome = PackedGenome.from_fasta(os.path.join(root, "ref.fa"))
prof = profile.load_profile(os.path.join(root, "training"), mode="genome", chimeric=True)
B = 1024
sim = ChimericGenomeSimulator(genome, prof, batch=B)
base = rng.base_key(7, rng.STREAM_ALIGNED)
sk = rng.slot_keys(base, jnp.arange(B, dtype=jnp.int64))
k_seg = 1920  # ~ mean+10sd at segment_mean 1.25
k_gap = 768
print(f"e_max={sim.e_max} gap_steps={sim.gap_steps} k_seg={k_seg} k_gap={k_gap}")

sk_seg = jax.vmap(lambda k: jax.random.fold_in(k, rng.PART_SEGMENT_BASE))(
    rng.slot_keys(base, jnp.arange(k_seg, dtype=jnp.int64)))
sk_gap = jax.vmap(lambda k: jax.random.fold_in(k, rng.PART_GAP_BASE))(
    rng.slot_keys(base, jnp.arange(k_gap, dtype=jnp.int64)))
m_ref = jnp.full(k_seg, 8000, jnp.int32)
g_ref = jnp.full(k_gap, 4000, jnp.int32)

@jax.jit
def segwalk(keys, m):
    w = error_walk.error_walk(keys, m, sim.tables.first_match,
                              sim.tables.match_markov, sim.tables.mixtures,
                              sim.tables.trans, sim.e_max)
    return w.l_new, w.n_events

@jax.jit
def gapwalk(keys, m):
    w = error_walk.unaligned_walk(keys, m, sim.tables.mixtures, sim.gap_steps)
    return w.l_new, w.n_events

for name, fn, keys, m in (("segwalk", segwalk, sk_seg, m_ref),
                          ("gapwalk", gapwalk, sk_gap, g_ref)):
    r = fn(keys, m); jax.block_until_ready(r)
    ts = []
    for i in range(5):
        t0 = time.time()
        r = fn(keys, m); jax.block_until_ready(r)
        ts.append((time.time() - t0) * 1e3)
    print(f"{name}: {min(ts):.1f} ms (min of {['%.1f' % t for t in ts]})")
