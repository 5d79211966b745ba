"""Homopolymer simulation (`-hp -k`): error suppression + run resizing.

Reference semantics:

* mutate_read first DROPS any error event overlapping a homopolymer run of
  length >= k in the extracted reference segment (simulator.py:1920-1950);
  for FASTQ the dropped events' bases become match-class.
* mutate_homo then rewrites every run of length >= k in the MUTATED read:
  the new length is round(Normal(mu, sigma)) clamped at 0 with mu/sigma from
  the piecewise/linear homopolymer regressions (AT vs CG pooled), and each
  emitted base mismatches with probability hp_mis_rate (uniform over the
  other three bases) (simulator.py:618-705).  Resizes are NOT written to the
  ground-truth error log (the reference never logs them either).

TPU mapping: run detection is two segmented-cumsum passes (forward +
flipped), event suppression is two gathers into the run-coverage prefix sum,
and resizing compacts runs to a [B, R] table (k-th-set-bit binary search),
turns them into del/ins events in the pass-1 read's coordinates, and reuses
the same cumsum gather-map machinery; extension bases come from the
"source to the left" map so they replicate the run base.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import rng
from .apply_errors import CLASS_INS, CLASS_MIS, _code_to_ascii, _ascii_to_code


def run_info(seq: jax.Array, lengths: jax.Array):
    """Per-position homopolymer run structure.

    Returns (run_start [B, L] i32, run_len [B, L] i32, is_start [B, L] bool)
    over the valid prefix of each lane.
    """
    B, L = seq.shape
    i = jnp.arange(L, dtype=jnp.int32)[None, :]
    in_seq = i < lengths[:, None]
    prev = jnp.concatenate([jnp.zeros((B, 1), seq.dtype), seq[:, :-1]], axis=1)
    sb = (seq != prev) | (i == 0)
    sb = sb & in_seq

    run_start = jax.lax.cummax(jnp.where(sb, i, 0), axis=1)
    cnt_fwd = i - run_start + 1  # position index within the run (1-based)

    # backward pass on the flipped array gives the count to the run's end
    seq_r = jnp.flip(seq, axis=1)
    prev_r = jnp.concatenate([jnp.zeros((B, 1), seq.dtype), seq_r[:, :-1]], axis=1)
    sb_r = (seq_r != prev_r) | (i == 0)
    start_r = jax.lax.cummax(jnp.where(sb_r, i, 0), axis=1)
    cnt_bwd = jnp.flip(i - start_r + 1, axis=1)

    run_len = jnp.where(in_seq, cnt_fwd + cnt_bwd - 1, 0)
    return run_start, run_len, sb & in_seq


def suppress_hp_errors(
    ref_seg: jax.Array,  # [B, L] extracted (IUPAC-resolved) reference
    middle_ref: jax.Array,  # [B]
    ev_pos2x: jax.Array,  # [B, E]
    ev_type: jax.Array,
    ev_len: jax.Array,
    ev_valid: jax.Array,
    k: int,
):
    """Events overlapping >= k runs are dropped (simulator.py:1920-1950).

    Overlap test on real intervals: a mis/del [p, p+len) overlaps a run
    covering any integer position in [p, p+len); an ins with key p - 0.5
    overlaps one covering any position in [p-1, p+len-1].
    Returns the new ev_valid mask.
    """
    _, run_len, _ = run_info(ref_seg, middle_ref)
    in_hp = run_len >= k
    cum = jnp.cumsum(in_hp.astype(jnp.int32), axis=1)  # inclusive prefix

    L = ref_seg.shape[1]
    is_ins = ev_type == 1
    p = (ev_pos2x + 1) // 2
    lo = jnp.where(is_ins, p - 1, ev_pos2x // 2)
    hi = jnp.where(is_ins, p + ev_len - 1, ev_pos2x // 2 + ev_len - 1)  # inclusive
    lo_c = jnp.clip(lo, 0, L - 1)
    hi_c = jnp.clip(hi, 0, L - 1)
    cum_hi = jnp.take_along_axis(cum, hi_c, axis=1)
    cum_lo = jnp.take_along_axis(cum, lo_c, axis=1)
    at_lo = jnp.take_along_axis(in_hp, lo_c, axis=1)
    covered = (cum_hi - cum_lo) > 0
    covered = covered | (at_lo & (lo >= 0))
    return ev_valid & ~covered


def _batched_kth_set_bit(cum: jax.Array, r_max: int):
    """Positions of the r-th set bit per row from an inclusive prefix sum.

    Returns [B, r_max] int32 positions (L where absent)."""
    B, L = cum.shape
    targets = jnp.arange(1, r_max + 1, dtype=jnp.int32)[None, :]
    lo = jnp.zeros((B, r_max), jnp.int32)
    hi = jnp.full((B, r_max), L, jnp.int32)
    for _ in range(max(1, L.bit_length())):
        mid = (lo + hi) // 2
        cmid = jnp.take_along_axis(cum, jnp.clip(mid, 0, L - 1), axis=1)
        go_right = cmid < targets
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo  # first index with cum >= target


@functools.partial(jax.jit, static_argnames=("k", "r_max", "l_cap"))
def resize_homopolymers(
    sk: jax.Array,  # [B, 2] slot keys
    read_mid: jax.Array,  # [B, L] pass-1 mutated read
    qclass_mid: jax.Array,  # [B, L] pass-1 classes
    l_new: jax.Array,  # [B] pass-1 read length
    hp_breaks: jax.Array,  # [2*(M+1), N] f32 exact u-space breakpoints
    hp_vals: jax.Array,  # [2*(M+1), N] i32 new-size values
    hp_mis_rate: float,
    k: int,
    r_max: int,
    l_cap: int,
):
    """mutate_homo as a second gather-map pass.

    The new run size is an exact inverse-CDF table lookup on a per-run
    uniform (ops/tables.build_hp_breakpoints defines the step function in
    f64; pure f32 comparisons here make it bit-identical across TPU / CPU /
    the C++ and numpy host reconstructions).  Run lengths beyond the table
    use its last row.

    Returns (read [B, L], qclass [B, L], new_len [B], ok [B]).
    ok is False when a lane exceeds the run-table capacity (callers treat it
    as capacity overflow and re-run through a bigger-r_max program).
    """
    B, L = read_mid.shape
    run_start, run_len, is_start = run_info(read_mid, l_new)
    big = run_len >= k
    start_mask = is_start & big
    cum_sm = jnp.cumsum(start_mask.astype(jnp.int32), axis=1)
    n_runs = cum_sm[:, -1]
    ok = n_runs <= r_max

    s_r = _batched_kth_set_bit(cum_sm, r_max)  # [B, R]
    has_run = jnp.arange(r_max, dtype=jnp.int32)[None, :] < n_runs[:, None]
    s_rc = jnp.clip(s_r, 0, L - 1)
    m_r = jnp.where(has_run, jnp.take_along_axis(run_len, s_rc, axis=1), 0)
    c_r = jnp.take_along_axis(read_mid, s_rc, axis=1)  # run base ASCII

    # new size = table(pool, run length, u) pooled AT vs CG (get_nd_par,
    # model_homopolymer_lengths.py:246-260; sampling simulator.py:639-665)
    is_at = (c_r == jnp.uint8(ord("A"))) | (c_r == jnp.uint8(ord("T")))
    M = hp_breaks.shape[0] // 2 - 1
    u = rng.uniform_per_slot(sk, rng.SITE_HOMOPOLYMER, (r_max,))  # [B, R]
    row = jnp.where(is_at, 0, M + 1) + jnp.minimum(m_r, M)
    rows_b = hp_breaks[row]  # [B, R, N]
    cnt = jnp.sum((rows_b <= u[:, :, None]).astype(jnp.int32), axis=-1)
    n_r = jnp.take_along_axis(hp_vals[row], (cnt - 1)[..., None], axis=-1)[..., 0]
    n_r = jnp.where(has_run, jnp.minimum(n_r, l_cap // 2), m_r)

    # del/ins events in pass-1 read coordinates
    shrink = n_r < m_r
    grow = n_r > m_r
    ev_pos2x = jnp.where(
        shrink, 2 * (s_r + n_r), 2 * (s_r + m_r) - 1
    )  # del at s+n; ins before s+m
    ev_type = jnp.where(shrink, 2, 1).astype(jnp.int32)
    ev_len = jnp.abs(n_r - m_r)
    ev_valid = has_run & (shrink | grow)

    from .apply_errors import build_gather_map

    gm = build_gather_map(ev_pos2x, ev_type, ev_len, ev_valid, l_new, L)

    # materialize: kept positions copy pass-1 bases+classes; extension
    # positions replicate the run base (source-to-the-left self-correction);
    # in-run mismatches at hp_mis_rate
    src = jnp.where(gm.qclass == CLASS_INS, gm.src_left, gm.src)
    src = jnp.clip(src, 0, L - 1)
    packed = read_mid.astype(jnp.uint16) | (qclass_mid.astype(jnp.uint16) << 8)
    fetched = jnp.take_along_axis(packed, src, axis=1)
    base = (fetched & 0xFF).astype(jnp.uint8)
    cls = jnp.where(gm.qclass == CLASS_INS, CLASS_INS, (fetched >> 8).astype(jnp.int32))

    # new-run coverage in output coordinates: positions whose source (or left
    # source) lies inside a >= k run of the pass-1 read
    src_big = jnp.take_along_axis(big, src, axis=1)
    u = rng.uniform_per_slot(sk, rng.SITE_HP_QUAL, (L,))
    # reference draws p = random.random() and mutates when 0 < p <= rate
    do_mis = src_big & (u <= hp_mis_rate) & (u > 0)
    code = _ascii_to_code(base)
    # own site: SITE_HOMOPOLYMER's counter stream is consumed by the per-run
    # size normals above; sharing it here would correlate the mis-base
    # choices at low positions with the run-size draws
    u2 = rng.uniform_per_slot(sk, rng.SITE_HP_MIS_BASE, (L,))
    off = 1 + jnp.minimum(jnp.floor(u2 * 3.0).astype(jnp.uint8), 2)
    mis_base = _code_to_ascii((code + off) % 4)
    base = jnp.where(do_mis, mis_base, base)
    cls = jnp.where(do_mis, CLASS_MIS, cls)

    base = jnp.where(gm.valid, base, jnp.uint8(0))
    return base, cls, gm.read_len, ok
