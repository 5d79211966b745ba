"""Ablation timing of the pallas walk kernel's per-iteration parts.

Runs stripped kernel variants for a FIXED step count (every lane active the
whole time) to attribute the per-iteration cost: threefry, table dots,
elementwise chain, event staging + DMA.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from nanosim_tpu.io import PackedGenome
from nanosim_tpu.ops import rng
from nanosim_tpu.ops import walk_pallas as wp
from nanosim_tpu.profiles import profile

root = "/dev/shm/chimpack"
genome = PackedGenome.from_fasta(os.path.join(root, "ref.fa"))
prof = profile.load_profile(os.path.join(root, "training"), mode="genome", chimeric=True)
from nanosim_tpu.sim.chimeric_mode import ChimericGenomeSimulator

sim = ChimericGenomeSimulator(genome, prof, batch=1024)
tab = sim.tables
BLK = 1024
E = 8192
UNROLL = wp.UNROLL
base = rng.base_key(7, rng.STREAM_ALIGNED)
sk = rng.slot_keys(base, jnp.arange(BLK, dtype=jnp.int64))
wkeys = rng.site_keys(sk, rng.SITE_WALK)
wk0 = wkeys[:, 0].astype(jnp.uint32).reshape(1, 1, BLK)
wk1 = wkeys[:, 1].astype(jnp.uint32).reshape(1, 1, BLK)
mref = jnp.full((1, 1, BLK), 10**8, jnp.int32)
pm = jnp.full((1, 1, BLK), 2, jnp.int32)

mix_t = tab.mixtures.cdf_t.T
binlo = tab.match_markov.bin_lo.astype(jnp.int32)[:, None]
mm_b_t = tab.match_markov.breaks.T
mm_v_t = tab.match_markov.vals.astype(jnp.float32).T
mm_bv_t = jnp.concatenate([mm_b_t, mm_v_t], axis=0)
cum_t = tab.trans.cum.T
nb = tab.match_markov.breaks.shape[0]
K = tab.match_markov.breaks.shape[1]
n_states = tab.trans.cum.shape[0]


def make(variant):
    def kernel(wk0_ref, wk1_ref, mref_ref, pm_ref,
               mix_t_ref, binlo_ref, mm_bv_ref, cum_t_ref,
               ev_ref, pos_ref, stage_ref, sem):
        g = pl.program_id(0)
        wk0 = wk0_ref[0]
        wk1 = wk1_ref[0]
        m_ref = mref_ref[0]
        pm0 = pm_ref[0]
        mix_tt = mix_t_ref[:]
        binlo_t = binlo_ref[:]
        mm_bv = mm_bv_ref[:]
        cum_tt = cum_t_ref[:]
        c0, c1, c2, c3 = (jnp.int32(0), jnp.int32(1), jnp.int32(2), jnp.int32(3))

        def cond(c):
            i, st = c
            return i < jnp.int32(E)

        def body(c):
            i, st = c
            (pos, mid, lnew, pstate, pmatch, nev) = st
            if variant == "nothreefry":
                u8 = [jnp.full((UNROLL, BLK), 0.5, jnp.float32)] * 3
            else:
                u8 = wp._step_uniforms(wk0, wk1, i + jnp.int32(1), 3)
            words = []
            for k in range(UNROLL):
                u_err, u_len, u_match = (u8[0][k:k+1], u8[1][k:k+1], u8[2][k:k+1])
                active = pos < mid
                if variant in ("full", "nothreefry", "nodma", "onlytables"):
                    rows3 = wp._blend_rows(cum_tt, pstate, n_states)
                    etype = jnp.minimum(jnp.sum((rows3 <= u_err).astype(jnp.int32),
                                                axis=0, keepdims=True, dtype=jnp.int32), c2)
                    mrow = wp._blend_rows(mix_tt, etype, 3)
                    elen = c1 + jnp.sum((mrow < u_len).astype(jnp.int32), axis=0,
                                        keepdims=True, dtype=jnp.int32)
                else:
                    etype = (u_err < 0.5).astype(jnp.int32)
                    elen = c1 + etype
                if variant in ("full", "nothreefry", "nodma", "onlymatch", "onlytables"):
                    lane = jnp.clip(jnp.sum((binlo_t <= pmatch).astype(jnp.int32),
                                            axis=0, keepdims=True, dtype=jnp.int32) - c1,
                                    c0, jnp.int32(nb - 1))
                    rows_bv = wp._onehot_rows_limbs(
                        wp._limb_planes3(mm_bv), lane, nb, 2 * K)
                    rows_b = rows_bv[:K]
                    rows_v = rows_bv[K:]
                    hit = rows_b <= u_match
                    mval = jnp.max(jnp.where(hit, rows_v, jnp.float32(-1.0)),
                                   axis=0, keepdims=True)
                    mstep = jnp.maximum(mval, rows_v[0:1, :]).astype(jnp.int32)
                else:
                    mstep = (u_match * 20).astype(jnp.int32)
                mstep = jnp.where((pmatch == c0) & (mstep == c0), c1, mstep)
                is_ins = etype == c1
                is_del = etype == c2
                e_pos2x = jnp.where(is_ins, c2 * pos - c1, c2 * pos)
                pos_after = pos + jnp.where(is_ins, c0, elen)
                over1 = jnp.maximum(pos_after - mid, c0)
                lnew_n = lnew + jnp.where(is_ins, elen, jnp.where(is_del, -elen, c0)) + over1
                mid_n = jnp.maximum(mid, jnp.where(is_ins, mid, pos_after))
                over2 = jnp.maximum(pos_after + mstep - mid_n, c0)
                lnew_n = lnew_n + over2
                mid_n = jnp.maximum(mid_n, pos_after + mstep)
                nstate = etype + c1 + jnp.where(mstep == c0, c3, c0)
                word = (e_pos2x.astype(jnp.uint32)
                        | (elen.astype(jnp.uint32) << jnp.uint32(19))
                        | (etype.astype(jnp.uint32) << jnp.uint32(30)))
                upd = lambda new, old: jnp.where(active, new, old)
                st = (upd(pos_after + mstep, pos), upd(mid_n, mid), upd(lnew_n, lnew),
                      upd(nstate, pstate), upd(mstep, pmatch), upd(nev + c1, nev))
                (pos, mid, lnew, pstate, pmatch, nev) = st
                words.append(word)
            if variant != "nodma":
                stage_ref[:] = jnp.concatenate(words, axis=0)
                cp = pltpu.make_async_copy(
                    stage_ref,
                    ev_ref.at[g, pl.ds(pl.multiple_of(i, UNROLL), UNROLL), :], sem)
                cp.start()
                cp.wait()
            else:
                # keep words alive via the carried state
                pos = pos + (words[-1] & jnp.uint32(0)).astype(jnp.int32)
                st = (pos, mid, lnew, pstate, pmatch, nev)
            return (i + jnp.int32(UNROLL), st)

        zero = jnp.zeros_like(m_ref)
        init = (pm0, m_ref, m_ref, zero, pm0, zero)
        _, st = jax.lax.while_loop(cond, body, (jnp.int32(0), init))
        pos_ref[0] = st[0] + st[2] + st[5]

    import functools
    @jax.jit
    def run():
        z = jnp.int32(0)
        ev, pos = pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec((1, 1, BLK), lambda i: (i, jnp.int32(0), jnp.int32(0)),
                                   memory_space=pltpu.VMEM) for _ in range(4)]
            + [wp._table_spec(mix_t.shape), wp._table_spec(binlo.shape),
               wp._table_spec(mm_bv_t.shape), wp._table_spec(cum_t.shape)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                       pl.BlockSpec((1, 1, BLK), lambda i: (i, jnp.int32(0), jnp.int32(0)),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((1, E, BLK), jnp.uint32),
                       jax.ShapeDtypeStruct((1, 1, BLK), jnp.int32)],
            scratch_shapes=[pltpu.VMEM((UNROLL, BLK), jnp.uint32),
                            pltpu.SemaphoreType.DMA],
        )(wk0, wk1, mref, pm, mix_t, binlo, mm_bv_t, cum_t)
        return pos
    return run


for variant in ("full", "nothreefry", "nodma", "onlymatch", "onlytables", "min"):
    try:
        fn = make(variant)
        r = fn(); jax.block_until_ready(r)
        # chain not needed: E=2048 fixed steps, one dispatch ~ RTT(25ms) + T
        ts = []
        for i in range(4):
            t0 = time.time()
            r = fn(); jax.block_until_ready(r)
            ts.append((time.time() - t0) * 1e3)
        t = min(ts)
        print(f"{variant}: {t:.1f} ms total, {(t)/ (E/UNROLL):.1f} us/iter (incl ~25ms RTT)")
    except Exception as e:
        print(variant, "FAILED", str(e)[:200])
