#!/usr/bin/env python
"""Decompose the genome-mode device batch cost on the real chip.

Times each stage of the batch program independently (walk, fused read
assembly, gather variants, compaction, transfer) so optimization effort
goes where the milliseconds are.  Run on axon (1 TPU chip):

    python bench/profile_device.py [--batch 1024] [--mean 8000]
"""

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--mean", type=float, default=8000)
    ap.add_argument("--sd", type=float, default=2200)
    ap.add_argument("--genome-mb", type=float, default=48)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import tempfile

    import jax
    import jax.numpy as jnp

    from nanosim_tpu.io import PackedGenome
    from nanosim_tpu.ops import apply_errors, error_walk, rng
    from nanosim_tpu.profiles import fixtures, profile
    from nanosim_tpu.sim import compact, extract
    from nanosim_tpu.sim.genome_mode import GenomeSimulator, _kde_draw, draw_ht

    log("devices:", jax.devices())
    d = tempfile.mkdtemp(prefix="nanosim_prof_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    prefix = os.path.join(d, "training")
    fixtures.make_model_dir(prefix, mean_read_len=args.mean, sd_read_len=args.sd, n_kde_points=2000)
    ref_fa = os.path.join(d, "ref.fa")
    per = int(args.genome_mb * 1e6 / 4)
    fixtures.make_reference_fasta(ref_fa, [per] * 4, seed=11)
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome")
    sim = GenomeSimulator(genome, prof, batch=args.batch)
    log(f"l_cap={sim.l_cap} l_out={sim.l_out} e_max={sim.e_max} ht_cap={sim.ht_cap} batch={sim.batch}")

    B = args.batch
    base = rng.base_key(0, rng.STREAM_ALIGNED)
    slots = jnp.arange(B, dtype=jnp.int64)
    sk = rng.slot_keys(base, slots)

    fn = sim.batch_fn()
    out = fn(base, slots)
    jax.block_until_ready(out)

    t_full = timeit(lambda: fn(base, slots), n=args.reps)
    log(f"full genome_batch:        {t_full * 1e3:8.1f} ms")

    # --- stage: length draws + ht ---
    @jax.jit
    def draws(sk):
        ref_len_f = _kde_draw(sk, rng.SITE_REF_LENGTH, sim.tables.kde_aligned, 1)[:, 0]
        remainder, head, tail, ht_ok = draw_ht(sk, sim.tables, sim.ht_cap)
        return ref_len_f, remainder, head, tail

    ref_len_f, remainder, head, tail = jax.block_until_ready(draws(sk))
    t_draws = timeit(lambda: draws(sk), n=args.reps)
    log(f"  length/ht draws:        {t_draws * 1e3:8.1f} ms")

    m_ref = jnp.clip((ref_len_f - remainder).astype(jnp.int32), 0, sim.l_cap)

    # --- stage: error walk ---
    walk_fn = jax.jit(
        lambda sk, m_ref: error_walk.error_walk(
            sk, m_ref, sim.tables.first_match, sim.tables.match_markov,
            sim.tables.mixtures, sim.tables.trans, sim.e_max,
        )
    )
    walk = jax.block_until_ready(walk_fn(sk, m_ref))
    t_walk = timeit(lambda: walk_fn(sk, m_ref), n=args.reps)
    log(f"  error walk (E={sim.e_max}):  {t_walk * 1e3:8.1f} ms")

    # --- stage: position sample + segment gather + iupac ---
    @jax.jit
    def extract_stage(sk, middle_ref):
        chrom, local_pos, pos_ok = extract.sample_genome_positions(
            sk, middle_ref, sim.genome_dev, False
        )
        ref_seg, seg_off = extract.gather_segments_padded(sim.genome_dev, chrom, local_pos, sim.l_cap)
        from nanosim_tpu.ops import seqops

        u_iupac, u_mis = rng.uniform2_per_slot(sk, rng.SITE_IUPAC, (sim.l_cap + extract.CHUNK,))
        ref_seg = seqops.resolve_iupac(ref_seg, u_iupac)
        return chrom, local_pos, ref_seg, seg_off

    chrom, local_pos, ref_seg, seg_off = jax.block_until_ready(extract_stage(sk, walk.middle_ref))
    t_ext = timeit(lambda: extract_stage(sk, walk.middle_ref), n=args.reps)
    log(f"  extract+iupac:          {t_ext * 1e3:8.1f} ms")

    # --- stage: fused_read_v2 (window vs plain XLA gather) ---
    u_strand = rng.uniform_per_slot(sk, rng.SITE_STRAND)
    is_rev = u_strand > sim.tables.strandness_rate
    u_mis_o, u_ins_o = rng.uniform2_per_slot(sk, rng.SITE_MIS_BASE, (sim.l_out,))
    ref_codes = apply_errors._pack_codes4(ref_seg)
    pad = (-ref_codes.shape[1]) % 128
    if pad:
        ref_codes = jnp.pad(ref_codes, ((0, 0), (0, pad)))
    n_ref_codes = ref_seg.shape[1]
    args_v2 = (
        walk.events_pos2x, walk.events_type, walk.events_len, walk.events_valid,
        walk.middle_ref, head, tail, is_rev, ref_codes, n_ref_codes, seg_off,
        sk, u_mis_o, u_ins_o,
    )

    for use_window in (True, False):
        try:
            fr = lambda uw=use_window: apply_errors.fused_read_v2(
                *args_v2, sim.l_out, sim.ht_cap, rng.SITE_HEAD_TAIL, use_window=uw
            )
            jax.block_until_ready(fr())
            t = timeit(fr, n=args.reps)
            log(f"  fused_read_v2 win={use_window!s:5}: {t * 1e3:8.1f} ms")
        except Exception as e:
            log(f"  fused_read_v2 win={use_window}: FAILED {type(e).__name__}: {e}")

    # --- stage: compaction pack + transfer ---
    read, qclass_out, l_new, total, win_ov = apply_errors.fused_read_v2(
        *args_v2, sim.l_out, sim.ht_cap, rng.SITE_HEAD_TAIL, use_window=True
    )
    from nanosim_tpu.sim.bundles import estimate_mean_aligned, estimate_mean_match

    est_bases = estimate_mean_aligned(prof) * 1.1 + 64
    est_events = est_bases / (estimate_mean_match(prof) + 1.0)
    nr_cap = max(256, -(-int(B * (est_bases / 4.0 / compact.CHUNK + 1) * 1.1) // 256) * 256)

    def pack():
        return compact.compact_pack(
            out.read, out.quals, out.valid, out.total_len, out.head, out.tail,
            out.middle_ref, out.l_new, out.chrom, out.local_pos,
            out.is_reversed, out.n_events, out.capacity_overflow,
            out.ev_pos2x, out.ev_type, out.ev_len, out.m_ref_init,
            nr_cap=nr_cap, ne_cap=1, nq_cap=1, fastq=False, with_events=False,
            pack_reads=True, with_checksum=True,
        )

    buf = jax.block_until_ready(pack())
    t_pack = timeit(pack, n=args.reps)
    log(f"  compact pack:           {t_pack * 1e3:8.1f} ms  (buf {np.asarray(buf).nbytes / 1e6:.1f} MB)")

    t_xfer = timeit(lambda: np.asarray(buf), n=args.reps)
    log(f"  transfer (buf->host):   {t_xfer * 1e3:8.1f} ms")

    # e2e pipelined estimate
    log(f"sum of stages:            {(t_draws + t_walk + t_ext + t_pack) * 1e3:8.1f} ms (+fused above)")
    log(f"reads/s upper bound (device only): {B / t_full:,.0f}")


if __name__ == "__main__":
    main()
