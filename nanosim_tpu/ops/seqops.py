"""Elementwise sequence ops: IUPAC resolution, reverse-complement, uracil.

All operate on [B, L] uint8 ASCII buffers with per-lane valid lengths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# --- IUPAC ambiguity resolution (case_convert, simulator.py:743-755) -------

_IUPAC = {
    "Y": "CT",
    "R": "AG",
    "W": "AT",
    "S": "GC",
    "K": "TG",
    "M": "CA",
    "D": "AGT",
    "V": "ACG",
    "H": "ACT",
    "B": "CGT",
    "N": "ATCG",
    "X": "ATCG",
}


def _build_iupac_tables():
    cand = np.zeros((256, 4), np.uint8)
    count = np.ones(256, np.int32)
    for c in range(256):
        cand[c, :] = c
    # lowercase is uppercased first (the genome loader already uppercases,
    # but map here too for safety)
    for code, opts in _IUPAC.items():
        for tgt in (code, code.lower()):
            cand[ord(tgt), : len(opts)] = [ord(o) for o in opts]
            count[ord(tgt)] = len(opts)
    return jnp.asarray(cand), jnp.asarray(count)


_IUPAC_CAND, _IUPAC_COUNT = _build_iupac_tables()


@jax.jit
def resolve_iupac(seq: jax.Array, u: jax.Array) -> jax.Array:
    """[B, L] ASCII + uniforms -> ASCII with ambiguity codes randomized
    (uniform choice among the candidate set, like the reference's
    random.choice)."""
    cnt = _IUPAC_COUNT[seq]
    idx = jnp.minimum(jnp.floor(u * cnt).astype(jnp.int32), cnt - 1)
    return _IUPAC_CAND[seq, idx]


# --- Reverse complement (simulator.py:1675-1680) ---------------------------


def _build_comp():
    comp = np.arange(256, dtype=np.uint8)
    for a, b in (("A", "T"), ("C", "G"), ("a", "t"), ("c", "g")):
        comp[ord(a)] = ord(b)
        comp[ord(b)] = ord(a)
    return jnp.asarray(comp)


_COMP = _build_comp()


@jax.jit
def reverse_complement(seq: jax.Array, lengths: jax.Array) -> jax.Array:
    """Per-lane reverse complement of the valid prefix; padding stays 0."""
    B, L = seq.shape
    j = jnp.arange(L)[None, :]
    src = lengths[:, None] - 1 - j
    gathered = jnp.take_along_axis(seq, jnp.clip(src, 0, L - 1), axis=1)
    out = _COMP[gathered]
    return jnp.where(j < lengths[:, None], out, jnp.uint8(0))


@jax.jit
def reverse_quals(quals: jax.Array, lengths: jax.Array) -> jax.Array:
    """Per-lane reversal (for base_quals.reverse() on reversed reads)."""
    B, L = quals.shape
    j = jnp.arange(L)[None, :]
    src = lengths[:, None] - 1 - j
    out = jnp.take_along_axis(quals, jnp.clip(src, 0, L - 1), axis=1)
    return jnp.where(j < lengths[:, None], out, 0)


# --- Uracil (T -> U, simulator.py:30-32, 1247-1248) ------------------------

_URACIL = jnp.asarray(
    np.arange(256, dtype=np.uint8)
    .copy()
)
_URACIL = _URACIL.at[ord("T")].set(ord("U")).at[ord("t")].set(ord("u"))


@jax.jit
def to_uracil(seq: jax.Array) -> jax.Array:
    return _URACIL[seq]


# --- Random bases for head/tail (simulator.py:1425-1427) -------------------

_BASES = jnp.asarray(np.frombuffer(b"ATCG", np.uint8))


def random_bases(u: jax.Array) -> jax.Array:
    """uniforms -> ASCII bases, uniform over A/T/C/G (np.random.choice order)."""
    idx = jnp.minimum(jnp.floor(u * 4.0).astype(jnp.int32), 3)
    return _BASES[idx]
