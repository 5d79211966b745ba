"""Packed vs unpacked chimeric meta program, real chip, dispatch amortized."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
import numpy as np

from nanosim_tpu.io import PackedGenome
from nanosim_tpu.ops import rng
from nanosim_tpu.profiles import error_model, fixtures, profile
from nanosim_tpu.sim.chimeric_mode import ChimericGenomeSimulator, chimeric_batch, pack_chimeric_meta

root = os.environ.get("BENCH_DIR", "/dev/shm/chimpack")
os.makedirs(root, exist_ok=True)
prefix = os.path.join(root, "training")
if not os.path.exists(prefix + "_model_profile"):
    fixtures.make_model_dir(prefix, mean_read_len=7800, sd_read_len=2900,
                            n_kde_points=2000)
ref_fa = os.path.join(root, "ref.fa")
if not os.path.exists(ref_fa):
    fixtures.make_reference_fasta(ref_fa, [2_000_000, 1_500_000, 800_000], seed=5)
genome = PackedGenome.from_fasta(ref_fa)
prof = profile.load_profile(prefix, mode="genome", chimeric=True)
B = int(os.environ.get("BENCH_B", "1024"))
sim = ChimericGenomeSimulator(genome, prof, batch=B)
print(f"B={B} S={sim.s_max} l_cap={sim.l_cap} e_max={sim.e_max} "
      f"gap_steps={sim.gap_steps} segment_mean={prof.segment_mean}")
base = rng.base_key(7, rng.STREAM_ALIGNED)

for packed in (True, False):
    fn = functools.partial(
        chimeric_batch, species=jnp.zeros((B, sim.s_max), jnp.int32),
        genome=sim.genome_dev, tables=sim.tables, emit_reads=False,
        packed_walks=packed, **sim.kw)

    def meta_of(slots):
        return pack_chimeric_meta(fn(base, slots))

    m = meta_of(jnp.arange(B, dtype=jnp.int64))
    m.block_until_ready()  # compile
    N = 10
    t0 = time.time()
    outs = [meta_of(jnp.arange(i * B, (i + 1) * B, dtype=jnp.int64)) for i in range(N)]
    for o in outs:
        o.block_until_ready()
    dt = (time.time() - t0) / N
    print(f"packed={packed}: {dt*1e3:.1f} ms/batch -> {B/dt:.0f} lanes/s")
