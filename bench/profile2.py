#!/usr/bin/env python
"""Phase profile of the compact-transfer genome path (stderr only)."""

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

    d = tempfile.mkdtemp(prefix="nanosim_prof2_", dir="/dev/shm")
    prefix = os.path.join(d, "training")
    fixtures.make_model_dir(prefix, mean_read_len=8000.0, sd_read_len=2200.0, n_kde_points=2000)
    ref_fa = os.path.join(d, "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [12_000_000] * 4, seed=11)

    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome")
    sim = GenomeSimulator(genome, prof, batch=BATCH)
    log(f"devices={jax.devices()} l_cap={sim.l_cap} e_max={sim.e_max} ht_cap={sim.ht_cap}")

    from nanosim_tpu.ops import rng
    from nanosim_tpu.sim.bundles import estimate_mean_aligned, estimate_mean_match

    base = rng.base_key(0, rng.STREAM_ALIGNED)
    fn = sim.batch_fn()

    def dispatch(s):
        slots = jnp.arange(s, s + BATCH, dtype=jnp.int64)
        return fn(base, slots)

    t0 = time.time()
    out = dispatch(0)
    jax.block_until_ready(out.valid)
    log(f"warmup(batch compile) {time.time() - t0:.1f}s")

    # 1. device-only
    t0 = time.time()
    outs = [dispatch((i + 1) * BATCH) for i in range(N_BATCHES)]
    for o in outs:
        jax.block_until_ready(o.read)
    dt = time.time() - t0
    log(f"device-only: {dt / N_BATCHES * 1e3:.0f} ms/batch ({BATCH / (dt / N_BATCHES):.0f} reads/s equiv)")

    # 2. compact pack + transfer
    est_bases = estimate_mean_aligned(sim.profile) * 1.1 + 64
    est_events = est_bases / (estimate_mean_match(sim.profile) + 1.0)
    fetcher = out_mod.CompactFetcher(False, True, BATCH, est_bases, est_events)
    log(f"caps: nr={fetcher.nr_cap} ne={fetcher.ne_cap} (chunks)")
    h0 = fetcher.dispatch(outs[0])
    cb0 = h0.fetch()  # warm compile
    pack_t = xfer_t = 0.0
    nbytes = 0
    for o in outs[1:]:
        t0 = time.time()
        h = fetcher.dispatch(o)
        jax.block_until_ready(h.buf_dev)
        pack_t += time.time() - t0
        t0 = time.time()
        buf = np.asarray(h.buf_dev)
        xfer_t += time.time() - t0
        nbytes += buf.nbytes
    n = len(outs) - 1
    log(f"compact pack (device): {pack_t / n * 1e3:.0f} ms/batch")
    log(f"transfer: {xfer_t / n * 1e3:.0f} ms/batch ({nbytes / max(xfer_t, 1e-9) / 1e6:.1f} MB/s, {nbytes / n / 1e6:.2f} MB/batch)")

    # 3. flat emit
    fw = out_mod.FastxWriter(os.path.join(d, "o.fasta"), False)
    el = out_mod.ErrorLogWriter(os.path.join(d, "o_err"))
    w = out_mod.GenomeBatchWriter(fw, el)
    lanes = np.nonzero(cb0.valid)[0]
    t0 = time.time()
    w.write_run(sim, cb0, lanes, 0)
    log(f"flat emit+write: {(time.time() - t0) * 1e3:.0f} ms/batch ({len(lanes)} lanes)")
    t0 = time.time()
    w.write_run(sim, cb0, lanes, 0)
    log(f"flat emit+write (2nd): {(time.time() - t0) * 1e3:.0f} ms/batch")
    fw.close()
    el.close()

    # 4. pipelined e2e
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
