"""One-hot MXU row-select vs masked-max compare-reduce for the walk tables.

The walk's per-step cost is dominated by EcdfDevice.invert_all's masked max
over [B, nb, K] (nb*K = 2250 for the match table) and MixtureDevice.
sample_all's [B, 3, n_t] compare-reduce.  A one-hot [B, nb] f32 matmul
against the [nb, K] table gathers each lane's row on the MXU (exact: every
output is a sum with exactly one nonzero term, and 1.0 * v is exact under
any limb decomposition), after which the compare/max runs on [B, K] —
nb-times less VPU work.  This script measures both forms on the real chip
inside the same while-loop harness as the walk, and asserts bit-identity.
"""
import functools, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from nanosim_tpu.io import PackedGenome
from nanosim_tpu.ops import error_walk, rng
from nanosim_tpu.profiles import fixtures, profile
from nanosim_tpu.sim.chimeric_mode import ChimericGenomeSimulator

HIGHEST = jax.lax.Precision.HIGHEST

root = "/dev/shm/chimpack"
genome = PackedGenome.from_fasta(os.path.join(root, "ref.fa"))
prof = profile.load_profile(os.path.join(root, "training"), mode="genome", chimeric=True)
B = 1024
sim = ChimericGenomeSimulator(genome, prof, batch=B)
tab = sim.tables
base = rng.base_key(7, rng.STREAM_ALIGNED)
k_seg = 1920
sk_seg = jax.vmap(lambda k: jax.random.fold_in(k, rng.PART_SEGMENT_BASE))(
    rng.slot_keys(base, jnp.arange(k_seg, dtype=jnp.int64)))
m_ref = jnp.full(k_seg, 8000, jnp.int32)

mm = tab.match_markov
mix = tab.mixtures
tr = tab.trans

# --- correctness: random lanes/uniforms, all three tables -------------------
key = jax.random.PRNGKey(0)
nlanes = mm.breaks.shape[0]
lane = jax.random.randint(key, (65536,), 0, nlanes)
p = jax.random.uniform(jax.random.fold_in(key, 1), (65536,))


def mm_invert_mxu(ecdf, lane, p):
    nb, K = ecdf.breaks.shape
    onehot = (lane[:, None] == jnp.arange(nb, dtype=lane.dtype)[None, :]).astype(jnp.float32)
    rows_b = jax.lax.dot(onehot, ecdf.breaks, precision=HIGHEST)
    rows_v = jax.lax.dot(onehot, ecdf.vals.astype(jnp.float32), precision=HIGHEST)
    hit = rows_b <= p[:, None]
    out = jnp.maximum(jnp.max(jnp.where(hit, rows_v, -1.0), axis=1), rows_v[:, 0])
    return out.astype(jnp.int32)


def mix_sample_mxu(m, etype, u):
    onehot = (etype[:, None] == jnp.arange(3, dtype=etype.dtype)[None, :]).astype(jnp.float32)
    row = jax.lax.dot(onehot, m.cdf_t, precision=HIGHEST)
    return (1 + jnp.sum(row < u[:, None], axis=-1)).astype(jnp.int32)


def tr_sample_mxu(t, state, u):
    n = t.cum.shape[0]
    onehot = (state[:, None] == jnp.arange(n, dtype=state.dtype)[None, :]).astype(jnp.float32)
    row = jax.lax.dot(onehot, t.cum, precision=HIGHEST)
    return jnp.minimum(jnp.sum(row <= u[:, None], axis=-1), 2).astype(jnp.int32)


a = jax.jit(lambda l, q: mm.invert_all(l, q))(lane, p)
b = jax.jit(mm_invert_mxu, static_argnums=())(mm, lane, p)
assert (np.asarray(a) == np.asarray(b)).all(), "match invert mismatch"
et = jax.random.randint(jax.random.fold_in(key, 2), (65536,), 0, 3)
a = jax.jit(lambda e, q: mix.sample_all(e, q))(et, p)
b = jax.jit(mix_sample_mxu)(mix, et, p)
assert (np.asarray(a) == np.asarray(b)).all(), "mixture sample mismatch"
st = jax.random.randint(jax.random.fold_in(key, 3), (65536,), 0, 7)
a = jax.jit(lambda s, q: tr.sample_all(s, q))(st, p)
b = jax.jit(tr_sample_mxu)(tr, st, p)
assert (np.asarray(a) == np.asarray(b)).all(), "trans sample mismatch"
print("bit-identity: OK (match/mixture/trans, 65536 random draws)")

# --- walk timing: current vs MXU table ops ----------------------------------
@jax.jit
def segwalk(keys, m):
    w = error_walk.error_walk(keys, m, tab.first_match, tab.match_markov,
                              tab.mixtures, tab.trans, sim.e_max)
    return w.l_new, w.n_events


def walk_mxu(slot_keys, m_ref, first_match, match_markov, mixtures, trans, max_events):
    """error_walk with the three table ops swapped for the MXU forms."""
    B = m_ref.shape[0]
    E = max_events
    walk_keys = rng.site_keys(slot_keys, rng.SITE_WALK)
    u0 = error_walk._uniforms(walk_keys, 0, 1)[:, 0]
    fm = first_match.invert(jnp.zeros(B, jnp.int32), u0)
    prev_match = jnp.maximum(fm, 2)
    U = error_walk._bulk_uniforms(walk_keys, E + 1, 3)

    def sub_step(t, st):
        (pos, middle_ref, l_new, prev_state, prev_match, n_events) = st
        active = pos < middle_ref
        us = jax.lax.dynamic_slice(U, (t, jnp.int32(0), jnp.int32(0)), (1, B, 3))[0]
        u_err, u_len, u_match = us[:, 0], us[:, 1], us[:, 2]
        etype = tr_sample_mxu(trans, prev_state, u_err)
        elen = mix_sample_mxu(mixtures, etype, u_len)
        is_ins = etype == 1
        is_del = etype == 2
        e_pos2x = jnp.where(is_ins, 2 * pos - 1, 2 * pos)
        pos_after = pos + jnp.where(is_ins, 0, elen)
        over1 = jnp.maximum(pos_after - middle_ref, 0)
        l_new_n = l_new + jnp.where(is_ins, elen, jnp.where(is_del, -elen, 0)) + over1
        middle_ref_n = jnp.maximum(middle_ref, jnp.where(is_ins, middle_ref, pos_after))
        bins = match_markov.select_bin(prev_match)
        mstep = mm_invert_mxu(match_markov, bins, u_match)
        mstep = jnp.where((prev_match == 0) & (mstep == 0), 1, mstep)
        over2 = jnp.maximum(pos_after + mstep - middle_ref_n, 0)
        l_new_n = l_new_n + over2
        middle_ref_n = jnp.maximum(middle_ref_n, pos_after + mstep)
        new_state = etype + 1 + jnp.where(mstep == 0, 3, 0)
        word = (e_pos2x.astype(jnp.uint32)
                | (elen.astype(jnp.uint32) << jnp.uint32(19))
                | (etype.astype(jnp.uint32) << jnp.uint32(30)))
        upd = lambda new, old: jnp.where(active, new, old)
        return (upd(pos_after + mstep, pos), upd(middle_ref_n, middle_ref),
                upd(l_new_n, l_new), upd(new_state, prev_state),
                upd(mstep, prev_match), upd(n_events + 1, n_events)), word

    def cond(c):
        i, st, _ = c
        return (i < E) & jnp.any(st[0] < st[1])

    def body(c):
        i, st, ev = c
        words = []
        for k in range(error_walk.UNROLL):
            st, w = sub_step(i + k + 1, st)
            words.append(w)
        ev = jax.lax.dynamic_update_slice(ev, jnp.stack(words, axis=1), (jnp.int32(0), i))
        return (i + error_walk.UNROLL, st, ev)

    zero = jnp.zeros(B, jnp.int32)
    init = (prev_match, m_ref, m_ref, jnp.full(B, 0, jnp.int32), prev_match, zero)
    ev0 = jnp.zeros((B, E), jnp.uint32)
    _, st, ev = jax.lax.while_loop(cond, body, (jnp.int32(0), init, ev0))
    return st[2], st[5], ev


@functools.partial(jax.jit)
def segwalk_mxu(keys, m):
    l_new, n_ev, _ = walk_mxu(keys, m, tab.first_match, tab.match_markov,
                              tab.mixtures, tab.trans, sim.e_max)
    return l_new, n_ev


for name, fn in (("segwalk(current)", segwalk), ("segwalk(mxu)", segwalk_mxu)):
    r = fn(sk_seg, m_ref); jax.block_until_ready(r)
    ts = []
    for i in range(5):
        t0 = time.time()
        r = fn(sk_seg, m_ref); jax.block_until_ready(r)
        ts.append((time.time() - t0) * 1e3)
    print(f"{name}: {min(ts):.1f} ms (min of {['%.1f' % t for t in ts]})")

ra = segwalk(sk_seg, m_ref)
rb = segwalk_mxu(sk_seg, m_ref)
assert (np.asarray(ra[0]) == np.asarray(rb[0])).all()
assert (np.asarray(ra[1]) == np.asarray(rb[1])).all()
print("walk outputs bit-identical (l_new, n_events)")
