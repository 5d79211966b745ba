"""Pallas TPU kernel: read assembly via per-lane dynamic rolls.

The XLA formulation of head+middle+tail assembly and the strand flip is a
[B, L] `take_along_axis` whose per-element indices serialize into a generic
gather.  The access pattern is actually three constant-per-lane shifts plus
an optional reversal — exactly what `pltpu.roll` with a dynamic shift
expresses.  Per grid row:

    pre[j]  = ht[j]                 j <  head          (head bases)
            = mid[j - head]         j <  head + l_new  (mutated middle)
            = ht[j - l_new]         j <  total         (tail bases)
    out     = pre                                   (forward strand)
            = complement(reverse(pre))              (reverse strand)

`mid`/`ht` arrive packed as uint16 base|class so the class map rides along
for FASTQ quality sampling.  Everything is VPU selects/rolls in VMEM; the
only HBM traffic is the streaming row reads/writes.

The kernel is verified against a numpy reference in interpret mode.  On the
axon remote-TPU backend in this image, `pltpu.roll` with a dynamic shift
crashes the Mosaic compile helper, so `assemble_supported()` reports False
and the XLA assembly path stays active; on standard TPU runtimes the probe
enables it (opt-in via NANOSIM_TPU_PALLAS=1 until compiled-mode correctness
can be verified on real hardware).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _complement_packed(x):
    """A<->T, C<->G on the low byte of packed base|class uint16."""
    base = x & jnp.uint16(0xFF)
    cls = x & jnp.uint16(0xFF00)
    A, C, G, T = (jnp.uint16(ord(c)) for c in "ACGT")
    comp = jnp.where(
        base == A, T,
        jnp.where(base == T, A, jnp.where(base == C, G, jnp.where(base == G, C, base))),
    )
    return comp | cls


ROWS = 8  # sublane tile: 8 rows per grid program


def _kernel(meta_ref, mid_ref, ht_ref, out_ref, scratch):
    # meta row: [head, l_new, total, is_rev]
    blk = pl.program_id(0)
    L = out_ref.shape[1]
    l_cap = mid_ref.shape[1]
    ht_cap = ht_ref.shape[1]
    j = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)

    for r in range(ROWS):
        b = blk * ROWS + r
        head = meta_ref[b, 0]
        l_new = meta_ref[b, 1]
        total = meta_ref[b, 2]
        is_rev = meta_ref[b, 3]
        # jnp.flip has no Pallas TPU lowering, so reversed lanes are built
        # RIGHT-aligned (+ complemented) here and a cheap global XLA reverse
        # outside the kernel finishes the orientation.
        pad = jnp.where(is_rev != 0, L - total, 0)

        # zero-padded [1, L] copies of the middle and head/tail pools
        scratch[0:1, :] = jnp.zeros((1, L), jnp.uint16)
        scratch[0:1, :l_cap] = mid_ref[r : r + 1, :]
        mid_pad = scratch[0:1, :]
        scratch[1:2, :] = jnp.zeros((1, L), jnp.uint16)
        scratch[1:2, :ht_cap] = ht_ref[r : r + 1, :]
        ht_pad = scratch[1:2, :]

        head_roll = pltpu.roll(ht_pad, pad, 1)
        mid_roll = pltpu.roll(mid_pad, pad + head, 1)
        tail_roll = pltpu.roll(ht_pad, pad + l_new, 1)
        pre = jnp.where(
            (j >= pad) & (j < pad + head), head_roll,
            jnp.where((j >= pad + head) & (j < pad + head + l_new), mid_roll,
                      jnp.where((j >= pad + head + l_new) & (j < pad + total),
                                tail_roll, jnp.uint16(0))),
        )
        out = jnp.where(is_rev != 0, _complement_packed(pre), pre)
        out_ref[r : r + 1, :] = out


@functools.partial(jax.jit, static_argnames=("l_out", "interpret"))
def assemble_rolls(
    packed_mid: jax.Array,  # [B, l_cap] uint16 base|class
    packed_ht: jax.Array,  # [B, ht_cap] uint16
    head: jax.Array,  # [B] int32
    l_new: jax.Array,  # [B] int32
    total: jax.Array,  # [B] int32
    is_rev: jax.Array,  # [B] bool
    l_out: int,
    interpret: bool = False,
) -> jax.Array:
    """[B, l_out] packed uint16 assembled reads (final orientation)."""
    B, l_cap = packed_mid.shape
    assert B % ROWS == 0, "batch must be a multiple of the row tile (8)"
    meta = jnp.stack(
        [head, l_new, total, is_rev.astype(jnp.int32)], axis=1
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, l_cap), lambda b, meta: (b, 0)),
            pl.BlockSpec((ROWS, packed_ht.shape[1]), lambda b, meta: (b, 0)),
        ],
        out_specs=pl.BlockSpec((ROWS, l_out), lambda b, meta: (b, 0)),
        scratch_shapes=[pltpu.VMEM((2, l_out), jnp.uint16)],
    )
    raw = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, l_out), jnp.uint16),
        interpret=interpret,
    )(meta, packed_mid, packed_ht)
    # reversed lanes come out right-aligned + complemented; a global reverse
    # (cheap XLA layout op) puts them in final orientation
    flipped = jnp.flip(raw, axis=1)
    return jnp.where(is_rev[:, None], flipped, raw)


_SUPPORTED = None


def assemble_supported() -> bool:
    """Probe once whether the Pallas kernel compiles+runs on this backend."""
    global _SUPPORTED
    if _SUPPORTED is None:
        try:
            out = assemble_rolls(
                jnp.zeros((8, 256), jnp.uint16),
                jnp.zeros((8, 128), jnp.uint16),
                jnp.zeros(8, jnp.int32),
                jnp.full(8, 10, jnp.int32),
                jnp.full(8, 10, jnp.int32),
                jnp.zeros(8, bool),
                384,
            )
            out.block_until_ready()
            _SUPPORTED = True
        except Exception:
            _SUPPORTED = False
    return _SUPPORTED
