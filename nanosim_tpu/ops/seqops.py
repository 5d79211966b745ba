"""Elementwise sequence ops: IUPAC resolution, reverse-complement, uracil.

All operate on [B, L] uint8 ASCII buffers with per-lane valid lengths.

Implementation note: table lookups (e.g. `LUT[seq]`) lower to generic
gathers, which serialize badly on TPU; every map here is therefore a
compare/select chain on the VPU instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_A, _C, _G, _T = ord("A"), ord("C"), ord("G"), ord("T")


def _eq(seq, ch):
    return seq == jnp.uint8(ord(ch))


def _sel4(idx, b0, b1, b2, b3):
    return jnp.where(idx == 0, b0, jnp.where(idx == 1, b1, jnp.where(idx == 2, b2, b3)))


def _u8(ch):
    return jnp.uint8(ord(ch))


# IUPAC candidate sets (case_convert, simulator.py:743-755)
_IUPAC2 = {"Y": "CT", "R": "AG", "W": "AT", "S": "GC", "K": "TG", "M": "CA"}
_IUPAC3 = {"D": "AGT", "V": "ACG", "H": "ACT"}
_IUPAC3B = {"B": "CGT"}
_IUPAC4 = ("N", "X")


@jax.jit
def resolve_iupac(seq: jax.Array, u: jax.Array) -> jax.Array:
    """ASCII + uniforms -> ASCII with ambiguity codes randomized (uniform
    choice among the candidate set, like the reference's random.choice).
    Non-IUPAC characters pass through."""
    is_acgt = _eq(seq, "A") | _eq(seq, "C") | _eq(seq, "G") | _eq(seq, "T")

    cnt = jnp.full(seq.shape, 1, jnp.int32)
    for ch in _IUPAC2:
        cnt = jnp.where(_eq(seq, ch), 2, cnt)
    for ch in list(_IUPAC3) + list(_IUPAC3B):
        cnt = jnp.where(_eq(seq, ch), 3, cnt)
    for ch in _IUPAC4:
        cnt = jnp.where(_eq(seq, ch), 4, cnt)

    idx = jnp.minimum(jnp.floor(u * cnt).astype(jnp.int32), cnt - 1)

    out = seq
    for ch, opts in _IUPAC2.items():
        pick = jnp.where(idx == 0, _u8(opts[0]), _u8(opts[1]))
        out = jnp.where(_eq(seq, ch), pick, out)
    for ch, opts in {**_IUPAC3, **_IUPAC3B}.items():
        pick = _sel4(idx, _u8(opts[0]), _u8(opts[1]), _u8(opts[2]), _u8(opts[2]))
        out = jnp.where(_eq(seq, ch), pick, out)
    for ch in _IUPAC4:
        pick = _sel4(idx, _u8("A"), _u8("T"), _u8("C"), _u8("G"))
        out = jnp.where(_eq(seq, ch), pick, out)
    return jnp.where(is_acgt, seq, out)


def complement(seq: jax.Array) -> jax.Array:
    """A<->T, C<->G; other characters unchanged (simulator.py:1675-1680)."""
    return jnp.where(
        _eq(seq, "A"), _u8("T"),
        jnp.where(_eq(seq, "T"), _u8("A"),
                  jnp.where(_eq(seq, "C"), _u8("G"),
                            jnp.where(_eq(seq, "G"), _u8("C"), seq))),
    )


@jax.jit
def reverse_complement(seq: jax.Array, lengths: jax.Array) -> jax.Array:
    """Per-lane reverse complement of the valid prefix; padding stays 0."""
    B, L = seq.shape
    j = jnp.arange(L)[None, :]
    src = lengths[:, None] - 1 - j
    gathered = jnp.take_along_axis(seq, jnp.clip(src, 0, L - 1), axis=1)
    out = complement(gathered)
    return jnp.where(j < lengths[:, None], out, jnp.uint8(0))


@jax.jit
def reverse_quals(quals: jax.Array, lengths: jax.Array) -> jax.Array:
    """Per-lane reversal (for base_quals.reverse() on reversed reads)."""
    B, L = quals.shape
    j = jnp.arange(L)[None, :]
    src = lengths[:, None] - 1 - j
    out = jnp.take_along_axis(quals, jnp.clip(src, 0, L - 1), axis=1)
    return jnp.where(j < lengths[:, None], out, 0)


@jax.jit
def to_uracil(seq: jax.Array) -> jax.Array:
    return jnp.where(_eq(seq, "T"), _u8("U"), jnp.where(_eq(seq, "t"), _u8("u"), seq))


def random_bases(u: jax.Array) -> jax.Array:
    """uniforms -> ASCII bases, uniform over A/T/C/G (np.random.choice order)."""
    idx = jnp.minimum(jnp.floor(u * 4.0).astype(jnp.int32), 3)
    return _sel4(idx, _u8("A"), _u8("T"), _u8("C"), _u8("G"))
