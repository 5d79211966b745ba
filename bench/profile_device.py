#!/usr/bin/env python
"""Per-stage device timing of the genome batch program (stderr only)."""

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = int(os.environ.get("BENCH_BATCH", "1024"))
REPS = int(os.environ.get("PROF_REPS", "6"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(tag, fn, *args, **kw):
    import jax

    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / REPS
    log(f"{tag}: {dt * 1e3:.1f} ms")
    return out


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nanosim_tpu.io import PackedGenome
    from nanosim_tpu.ops import apply_errors, error_walk, rng, seqops
    from nanosim_tpu.profiles import fixtures, profile
    from nanosim_tpu.sim import extract
    from nanosim_tpu.sim.bundles import build_tables
    from nanosim_tpu.sim.genome_mode import GenomeSimulator, _kde_draw, draw_ht

    d = tempfile.mkdtemp(prefix="nanosim_pd_", dir="/dev/shm")
    prefix = os.path.join(d, "training")
    fixtures.make_model_dir(prefix, mean_read_len=8000.0, sd_read_len=2200.0, n_kde_points=2000)
    ref_fa = os.path.join(d, "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [12_000_000] * 4, seed=11)

    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome")
    sim = GenomeSimulator(genome, prof, batch=BATCH)
    tables = sim.tables
    gdev = sim.genome_dev
    B, l_cap, l_out, ht_cap, E = BATCH, sim.l_cap, sim.l_out, sim.ht_cap, sim.e_max
    log(f"devices={jax.devices()} l_cap={l_cap} l_out={l_out} e_max={E}")

    base = rng.base_key(0, rng.STREAM_ALIGNED)
    slots = jnp.arange(BATCH, dtype=jnp.int64)

    sk = timeit("slot_keys", jax.jit(rng.slot_keys), base, slots)

    f_len = jax.jit(lambda sk: _kde_draw(sk, rng.SITE_REF_LENGTH, tables.kde_aligned, 1)[:, 0])
    ref_len_f = timeit("kde length draw", f_len, sk)
    f_ht = jax.jit(lambda sk: draw_ht(sk, tables, ht_cap))
    remainder, head, tail, ht_ok = f_ht(sk)
    timeit("draw_ht", f_ht, sk)
    m_ref = jnp.clip(ref_len_f.astype(jnp.int32), 0, l_cap)

    f_walk = jax.jit(lambda sk, m: error_walk.error_walk(
        sk, m, tables.first_match, tables.match_markov, tables.mixtures, tables.trans, E))
    walk = timeit("error_walk", f_walk, sk, m_ref)

    f_pos = jax.jit(lambda sk, m: extract.sample_genome_positions(sk, m, gdev, False))
    chrom, local_pos, pos_ok = timeit("positions", f_pos, sk, walk.middle_ref)

    f_seg = jax.jit(lambda c, p: extract.gather_segments_padded(gdev, c, p, l_cap))
    ref_seg, seg_off = timeit("extract rows", f_seg, chrom, local_pos)

    f_iupac = jax.jit(lambda sk, seg: seqops.resolve_iupac(
        seg, rng.uniform2_per_slot(sk, rng.SITE_IUPAC, (l_cap + extract.CHUNK,))[0]))
    ref_res = timeit("iupac uniforms+resolve", f_iupac, sk, ref_seg)

    f_urand = jax.jit(lambda sk: rng.uniform2_per_slot(sk, rng.SITE_MIS_BASE, (l_out,)))
    u_mis_o, u_ins_o = timeit("per-base uniforms [B,l_out]", f_urand, sk)

    f_ht_bases = jax.jit(lambda sk: seqops.random_bases(
        rng.uniform_per_slot(sk, rng.SITE_HEAD_TAIL, (ht_cap,))))
    ht_bases = timeit("ht bases", f_ht_bases, sk)

    u_strand = rng.uniform_per_slot(sk, rng.SITE_STRAND)
    is_rev = u_strand > tables.strandness_rate

    for mode, tag in ((False, "fused_read XLA gather"),
                      (True, "fused_read pallas byte"),
                      ("packed", "fused_read pallas packed")):
        try:
            f_fr = jax.jit(lambda *a: apply_errors.fused_read(*a, l_out=l_out, use_pallas=mode))
            timeit(tag, f_fr, walk.events_pos2x, walk.events_type, walk.events_len,
                   walk.events_valid, walk.middle_ref, head, tail, is_rev,
                   ref_res, seg_off, ht_bases, u_mis_o, u_ins_o)
        except Exception as e:
            log(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}")

    # scatter cost isolation: the three span/del scatters alone
    def spans_only(ev_p, ev_t, ev_l, ev_v, mref, head, tail, is_rev):
        B_, E_ = ev_p.shape
        L = l_out
        b_idx = jnp.broadcast_to(jnp.arange(B_, dtype=jnp.int32)[:, None], (B_, E_))
        is_mis = ev_v & (ev_t == 0)
        is_ins = ev_v & (ev_t == 1)
        is_del = ev_v & (ev_t == 2)
        rpos = ev_p // 2
        def span_mask(flag):
            diff = jnp.zeros((B_, L + 1), jnp.int32)
            f = flag.astype(jnp.int32)
            diff = diff.at[b_idx, jnp.clip(rpos, 0, L)].add(f)
            diff = diff.at[b_idx, jnp.clip(rpos + ev_l, 0, L)].add(-f)
            return jnp.cumsum(diff[:, :L], axis=1) > 0
        i_m = span_mask(is_ins)
        m_m = span_mask(is_mis)
        del_pts = jnp.zeros((B_, L + 1), jnp.int32)
        del_pts = del_pts.at[b_idx, jnp.clip(rpos, 0, L)].add(jnp.where(is_del, ev_l, 0))
        D = jnp.cumsum(del_pts[:, :L], axis=1)
        return i_m.sum() + m_m.sum() + D.sum()

    f_sp = jax.jit(spans_only)
    timeit("span scatters+cumsums only", f_sp, walk.events_pos2x, walk.events_type,
           walk.events_len, walk.events_valid, walk.middle_ref, head, tail, is_rev)

    import shutil

    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
