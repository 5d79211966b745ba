"""Match-table row-select variants inside the pallas walk kernel.

micro_walk8 attributed ~95% of the walk's per-iteration cost to the match
ECDF one-hot MXU dot (HIGHEST precision = 6 bf16 limb passes over a
(2K, BLK) output).  This script times exact alternatives at the real walk
shapes (nb=15 bins, K=150 breakpoints, BLK=1024):

  dot_highest  current kernel: one (2K, nb) x (nb, BLK) dot, HIGHEST
  dot_high     same dot at HIGH (3 limb passes; exact for one-hot selects:
               each output sums exactly one nonzero term, and the selected
               f32 value reconstructs exactly from its 3 bf16 limbs)
  blend        no MXU: nb masked select passes over (2K, BLK) on the VPU
  min          no table work at all (floor: threefry + elementwise + DMA)

All variants run the FULL kernel loop (threefry, elementwise chain, event
DMA) for a fixed E steps with every lane active, so deltas are attributable.
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
E = 2048
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
mm_bv_t = jnp.concatenate(
    [tab.match_markov.breaks.T, tab.match_markov.vals.astype(jnp.float32).T], axis=0
)
cum_t = tab.trans.cum.T
nb = tab.match_markov.breaks.shape[0]
K = tab.match_markov.breaks.shape[1]
n_states = tab.trans.cum.shape[0]


def _limb_split3(x):
    """f32 -> 3 bf16 limbs, hi+mid+lo == x exactly (the decomposition XLA's
    HIGHEST 6-pass algorithm relies on)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    r2 = r1 - mid.astype(jnp.float32)
    lo = r2.astype(jnp.bfloat16)
    return hi, mid, lo


# limb-plane table: breaks (3 planes) + vals (2 planes: ints < 2^16), bf16
_b_t = tab.match_markov.breaks.T  # (K, nb)
_v_t = tab.match_markov.vals.astype(jnp.float32).T
_bh, _bm, _bl = _limb_split3(_b_t)
_vh = _v_t.astype(jnp.bfloat16)
_vl = (_v_t - _vh.astype(jnp.float32)).astype(jnp.bfloat16)
mm_limb_t = jnp.concatenate([_bh, _bm, _bl, _vh, _vl], axis=0)  # (5K, nb) bf16


def make(variant):
    def kernel(wk0_ref, wk1_ref, mref_ref, pm_ref,
               mix_t_ref, binlo_ref, mm_bv_ref, cum_t_ref, mm_limb_ref,
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
            u8 = wp._step_uniforms(wk0, wk1, i + jnp.int32(1), 3)
            words = []
            for k in range(UNROLL):
                u_err, u_len, u_match = (u8[0][k:k+1], u8[1][k:k+1], u8[2][k:k+1])
                active = pos < mid
                rows3 = wp._blend_rows(cum_tt, pstate, n_states)
                etype = jnp.minimum(jnp.sum((rows3 <= u_err).astype(jnp.int32),
                                            axis=0, keepdims=True, dtype=jnp.int32), c2)
                mrow = wp._blend_rows(mix_tt, etype, 3)
                elen = c1 + jnp.sum((mrow < u_len).astype(jnp.int32), axis=0,
                                    keepdims=True, dtype=jnp.int32)
                lane = jnp.clip(jnp.sum((binlo_t <= pmatch).astype(jnp.int32),
                                        axis=0, keepdims=True, dtype=jnp.int32) - c1,
                                c0, jnp.int32(nb - 1))
                if variant == "min":
                    mstep = (u_match * 20).astype(jnp.int32)
                else:
                    if variant == "blend":
                        rows_bv = wp._blend_rows(mm_bv, lane, nb)
                        rows_b = rows_bv[:K]
                        rows_v = rows_bv[K:]
                    elif variant == "dot_default":
                        # TIMING ONLY (inexact): 1-pass bf16 on the f32 table
                        iota = jax.lax.broadcasted_iota(lane.dtype, (nb, 1), 0)
                        onehot = (iota == lane).astype(jnp.float32)
                        rows_bv = jax.lax.dot_general(
                            mm_bv, onehot, (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.DEFAULT,
                            preferred_element_type=jnp.float32)
                        rows_b = rows_bv[:K]
                        rows_v = rows_bv[K:]
                    elif variant == "dot_limbs":
                        # EXACT 1-pass bf16: limb planes reconstructed in f32
                        iota = jax.lax.broadcasted_iota(lane.dtype, (nb, 1), 0)
                        onehot = (iota == lane).astype(jnp.bfloat16)
                        planes = jax.lax.dot_general(
                            mm_limb_ref[:], onehot, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        rows_b = planes[:K] + planes[K:2*K] + planes[2*K:3*K]
                        rows_v = planes[3*K:4*K] + planes[4*K:]
                    else:  # dot_highest (the pre-round-5 kernel's approach)
                        iota = jax.lax.broadcasted_iota(lane.dtype, (nb, 1), 0)
                        onehot = (iota == lane).astype(jnp.float32)
                        rows_bv = jax.lax.dot_general(
                            mm_bv, onehot, (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
                        rows_b = rows_bv[:K]
                        rows_v = rows_bv[K:]
                    hit = rows_b <= u_match
                    mval = jnp.max(jnp.where(hit, rows_v, jnp.float32(-1.0)),
                                   axis=0, keepdims=True)
                    mstep = jnp.maximum(mval, rows_v[0:1, :]).astype(jnp.int32)
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
            stage_ref[:] = jnp.concatenate(words, axis=0)
            cp = pltpu.make_async_copy(
                stage_ref,
                ev_ref.at[g, pl.ds(pl.multiple_of(i, UNROLL), UNROLL), :], sem)
            cp.start()
            cp.wait()
            return (i + jnp.int32(UNROLL), st)

        zero = jnp.zeros_like(m_ref)
        init = (pm, m_ref, m_ref, zero, pm, zero)
        init = (pm0, m_ref, m_ref, zero, pm0, zero)
        _, st = jax.lax.while_loop(cond, body, (jnp.int32(0), init))
        pos_ref[0] = st[0] + st[2] + st[5]

    @jax.jit
    def run():
        ev, pos = pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec((1, 1, BLK), lambda i: (i, jnp.int32(0), jnp.int32(0)),
                                   memory_space=pltpu.VMEM) for _ in range(4)]
            + [wp._table_spec(mix_t.shape), wp._table_spec(binlo.shape),
               wp._table_spec(mm_bv_t.shape), wp._table_spec(cum_t.shape),
               wp._table_spec(mm_limb_t.shape)],
            out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec((1, 1, BLK), lambda i: (i, jnp.int32(0), jnp.int32(0)),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((1, E, BLK), jnp.uint32),
                       jax.ShapeDtypeStruct((1, 1, BLK), jnp.int32)],
            scratch_shapes=[pltpu.VMEM((UNROLL, BLK), jnp.uint32),
                            pltpu.SemaphoreType.DMA],
        )(wk0, wk1, mref, pm, mix_t, binlo, mm_bv_t, cum_t, mm_limb_t)
        return pos
    return run


results = {}
for variant in ("dot_highest", "dot_limbs", "dot_default", "blend", "min"):
    try:
        fn = make(variant)
        r = fn(); jax.block_until_ready(r)
        results[variant] = np.asarray(r)
        ts = []
        for i in range(4):
            t0 = time.time()
            r = fn(); jax.block_until_ready(r)
            ts.append((time.time() - t0) * 1e3)
        t = min(ts)
        print(f"{variant}: {t:.1f} ms total ({E} fixed steps, BLK={BLK})")
    except Exception as e:
        print(variant, "FAILED", str(e)[:300])

for v in ("dot_limbs", "blend"):
    if v in results and "dot_highest" in results:
        same = np.array_equal(results[v], results["dot_highest"])
        print(f"{v} bit-identical to dot_highest: {same}")
