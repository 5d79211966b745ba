import functools, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from nanosim_tpu.io import PackedGenome
from nanosim_tpu.ops import rng
from nanosim_tpu.profiles import fixtures, profile
from nanosim_tpu.sim.chimeric_mode import ChimericGenomeSimulator, chimeric_batch, pack_chimeric_meta

root = "/dev/shm/chimpack"
prefix = os.path.join(root, "training"); ref_fa = os.path.join(root, "ref.fa")
genome = PackedGenome.from_fasta(ref_fa)
prof = profile.load_profile(prefix, mode="genome", chimeric=True)
B = 1024
sim = ChimericGenomeSimulator(genome, prof, batch=B)
base = rng.base_key(7, rng.STREAM_ALIGNED)
for packed in (False, True, False, True):
    fn = functools.partial(
        chimeric_batch, species=jnp.zeros((B, sim.s_max), jnp.int32),
        genome=sim.genome_dev, tables=sim.tables, emit_reads=False,
        packed_walks=packed, **sim.kw)
    m = pack_chimeric_meta(fn(base, jnp.arange(B, dtype=jnp.int64)))
    np.asarray(m)  # force + fetch
    ts = []
    for i in range(6):
        t0 = time.time()
        m = pack_chimeric_meta(fn(base, jnp.arange((i+1)*B, (i+2)*B, dtype=jnp.int64)))
        m.block_until_ready()
        ts.append(time.time() - t0)
    print(f"packed={packed}: per-call {[f'{t*1e3:.1f}' for t in ts]} ms")
