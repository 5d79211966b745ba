#!/usr/bin/env python
"""Split the bench workload into device / transfer / host phases (stderr only).

Not part of the framework: a measurement harness to direct optimization.
"""

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_BATCHES = int(os.environ.get("PROF_BATCHES", "6"))
BATCH = int(os.environ.get("BENCH_BATCH", "1024"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nanosim_tpu.io import PackedGenome
    from nanosim_tpu.profiles import fixtures, profile
    from nanosim_tpu.sim import output as out_mod
    from nanosim_tpu.sim.genome_mode import GenomeSimulator

    d = tempfile.mkdtemp(prefix="nanosim_prof_", dir="/dev/shm")
    prefix = os.path.join(d, "training")
    fixtures.make_model_dir(prefix, mean_read_len=8000.0, sd_read_len=2200.0, n_kde_points=2000)
    ref_fa = os.path.join(d, "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [12_000_000] * 4, seed=11)

    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome")
    sim = GenomeSimulator(genome, prof, batch=BATCH)
    log(f"devices={jax.devices()} l_cap={sim.l_cap} e_max={sim.e_max} ht_cap={sim.ht_cap}")

    from nanosim_tpu.ops import rng

    base = rng.base_key(0, rng.STREAM_ALIGNED)
    fn = sim.batch_fn()

    def dispatch(s):
        slots = jnp.arange(s, s + BATCH, dtype=jnp.int64)
        return fn(base, slots)

    t0 = time.time()
    out = dispatch(0)
    jax.block_until_ready(out.valid)
    log(f"warmup(batch compile) {time.time() - t0:.1f}s")

    # 1. device-only: dispatch N batches back to back, block on device arrays
    t0 = time.time()
    outs = [dispatch((i + 1) * BATCH) for i in range(N_BATCHES)]
    for o in outs:
        jax.block_until_ready(o.read)
    dt = time.time() - t0
    log(f"device-only: {dt / N_BATCHES * 1e3:.0f} ms/batch ({BATCH / (dt / N_BATCHES):.0f} reads/s equiv)")

    # 2. transfers, phase by phase (warm the pack programs first)
    d0 = out_mod.fetch_batch(outs[0], False, True)
    log(f"(pack warmup done; wide width={sum(v.shape[1] for k, v in d0.items() if getattr(v, 'ndim', 1) == 2)})")

    meta_t = wide_t = 0.0
    wide_bytes = 0
    for o in outs[1:]:
        global_fetch = out_mod._FETCH
        t0 = time.time()
        meta = np.asarray(
            global_fetch.pack_meta(
                o.valid, o.total_len, o.head, o.tail, o.middle_ref,
                o.l_new, o.chrom, o.local_pos, o.is_reversed, o.n_events,
                o.capacity_overflow,
            )
        )
        meta_t += time.time() - t0
        sizes = meta[-1]
        lt = out_mod._pow2_at_least(max(int(sizes[0]), 1), 256, o.read.shape[1])
        k = out_mod._pow2_at_least(max(int(sizes[1]), 1), 64, o.ev_pos2x.shape[1])
        f = global_fetch.pack_wide(k, lt, False, True, 0, True)
        t0 = time.time()
        wide = np.asarray(
            f(o.ev_pos2x, o.ev_type, o.ev_len, o.read,
              np.zeros((BATCH, 1), np.uint8), np.zeros((BATCH, 4), np.uint8))
        )
        wide_t += time.time() - t0
        wide_bytes += wide.nbytes
        log(f"  lt={lt} k_ev={k} wide={wide.nbytes / 1e6:.1f} MB")
    n = len(outs) - 1
    log(f"meta transfer: {meta_t / n * 1e3:.0f} ms/batch")
    log(f"wide transfer: {wide_t / n * 1e3:.0f} ms/batch ({wide_bytes / max(wide_t, 1e-9) / 1e6:.1f} MB/s)")

    # 3. host emit cost on one fetched dict
    fw = out_mod.FastxWriter(os.path.join(d, "o.fasta"), False)
    el = out_mod.ErrorLogWriter(os.path.join(d, "o_err"))
    w = out_mod.GenomeBatchWriter(fw, el)
    t0 = time.time()
    lanes = np.nonzero(d0["valid"])[0]
    w.write_run(sim, d0, lanes, 0)
    log(f"host emit: {(time.time() - t0) * 1e3:.0f} ms/batch ({len(lanes)} lanes)")
    fw.close()
    el.close()

    # 4. end-to-end pipelined (what bench measures), short run
    fw = out_mod.FastxWriter(os.path.join(d, "o2.fasta"), False)
    el = out_mod.ErrorLogWriter(os.path.join(d, "o2_err"))
    w = out_mod.AsyncBatchWriter(out_mod.GenomeBatchWriter(fw, el))
    t0 = time.time()
    got = sim.run(N_BATCHES * BATCH, w, seed=0)
    w.close()
    dt = time.time() - t0
    log(f"pipelined e2e: {got} reads in {dt:.2f}s -> {got / dt:.0f} reads/s")
    fw.close()
    el.close()

    import shutil

    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
