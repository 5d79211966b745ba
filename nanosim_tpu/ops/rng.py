"""Counter-based RNG streams: the fixed seed mapping.

The reference's randomness is a tangle of `random` and `np.random` global
state, re-seeded from OS entropy before every worker fork
(simulator.py:1590-1592) — multi-process runs are not reproducible at all.
This module *defines* the seed mapping for the TPU build:

    slot_key  = fold_in(fold_in(threefry(seed), STREAM), slot_id)
    draw_key  = fold_in(slot_key, site_id)          # one site per draw kind
    retry     = fold_in(draw_key, round)            # rejection-retry rounds

Every random decision for a read is keyed only by its global *slot id* (a
monotonically increasing counter over candidate reads) and a static *site id*
enumerated below.  Consequences:

* identical output for a fixed (seed, batch size) regardless of device count
  or host count — slots are sharded, not re-randomized;
* replaying any single read requires only its slot id;
* rejected slots perturb nothing: accepted reads keep their draws.

Site ids are part of the on-disk reproducibility contract — append, never
renumber.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# --- Site enumeration (append-only) ---------------------------------------
SITE_REF_LENGTH = 0  # aligned-region / total length KDE draw
SITE_REMAINDER = 1  # head+tail length KDE draw
SITE_HT_RATIO = 2  # head/(head+tail) ratio KDE draw
SITE_STRAND = 3  # reverse-complement decision
SITE_WALK = 4  # error-state Markov walk (fold in step index)
SITE_POSITION = 5  # reference start position (fold in retry round)
SITE_IUPAC = 6  # ambiguity-code base resolution
SITE_MIS_BASE = 7  # substituted base choice
SITE_INS_BASE = 8  # inserted base choice
SITE_QUAL = 9  # per-base quality draw
SITE_HEAD_TAIL = 10  # head/tail random bases
SITE_HOMOPOLYMER = 11  # homopolymer resize + in-run mismatches
SITE_SEGMENTS = 12  # chimeric segment count (geometric)
SITE_GAP = 13  # chimeric gap length + gap error walk
SITE_SPECIES = 14  # metagenome species/chromosome choice
SITE_POLYA = 15  # polyA tail length
SITE_IR = 16  # intron-retention Markov walk
SITE_TRANSCRIPT = 17  # weighted transcript choice
SITE_LOGNORMAL_LEN = 18  # median/sd lognormal length mode
SITE_UNALIGNED_WALK = 19  # unaligned-read error walk
SITE_ALIGNED_2D = 20  # conditional 2D-KDE aligned-length draw
SITE_HP_QUAL = 21  # homopolymer in-run mismatch decision (p draw)
SITE_HP_MIS_BASE = 22  # homopolymer in-run substituted-base choice

# Distinct top-level streams so aligned/unaligned/gap slot counters never
# collide.
STREAM_ALIGNED = 0
STREAM_UNALIGNED = 1
STREAM_GAP = 2


# Chimeric reads consume several independent draw streams per slot (one per
# segment and one per gap); parts get pseudo-slot keys offset into a
# reserved range so their site draws never collide with the read-level ones.
PART_SEGMENT_BASE = 0x50000
PART_GAP_BASE = 0x60000


def base_key(seed: int, stream: int = STREAM_ALIGNED) -> jax.Array:
    return jax.random.fold_in(jax.random.PRNGKey(seed), stream)


def part_slot_keys(slot_keys_arr: jax.Array, part_base: int, part_idx: int) -> jax.Array:
    """Per-(slot, part) keys for chimeric segments/gaps."""
    return jax.vmap(lambda k: jax.random.fold_in(k, part_base + part_idx))(slot_keys_arr)


def slot_keys(base: jax.Array, slot_ids: jax.Array) -> jax.Array:
    """[B] slot ids -> [B, 2] per-slot keys (vmapped fold_in)."""
    return jax.vmap(lambda s: jax.random.fold_in(base, s))(slot_ids)


def site_keys(slot_keys_arr: jax.Array, site: int) -> jax.Array:
    return jax.vmap(lambda k: jax.random.fold_in(k, site))(slot_keys_arr)


def uniform_per_slot(slot_keys_arr: jax.Array, site: int, shape=(), dtype=jnp.float32) -> jax.Array:
    """Per-slot uniform(0,1) draws of `shape` per lane -> [B, *shape]."""
    ks = site_keys(slot_keys_arr, site)
    return jax.vmap(lambda k: jax.random.uniform(k, shape, dtype=dtype))(ks)


def normal_per_slot(slot_keys_arr: jax.Array, site: int, shape=(), dtype=jnp.float32) -> jax.Array:
    ks = site_keys(slot_keys_arr, site)
    return jax.vmap(lambda k: jax.random.normal(k, shape, dtype=dtype))(ks)


def bits_per_slot(slot_keys_arr: jax.Array, site: int, shape=()) -> jax.Array:
    ks = site_keys(slot_keys_arr, site)
    return jax.vmap(lambda k: jax.random.bits(k, shape, dtype=jnp.uint32))(ks)


def _threefry2x32(k0, k1, x0, x1):
    """Threefry-2x32 (20 rounds), elementwise over broadcastable uint32
    arrays — bit-identical to jax.random's threefry2x32 primitive (verified
    in tests/test_ops.py).  Exists so draws can be computed at ARBITRARY
    counter positions (jax.random only exposes dense iota counters), which
    turns gathers from random-base pools into direct generation."""
    rot0 = (13, 15, 26, 6)
    rot1 = (17, 29, 16, 24)
    k0 = k0.astype(jnp.uint32)
    k1 = k1.astype(jnp.uint32)
    k2 = k0 ^ k1 ^ jnp.uint32(0x1BD11BDA)
    x0 = x0.astype(jnp.uint32) + k0
    x1 = x1.astype(jnp.uint32) + k1

    def rnd(x0, x1, r):
        x0 = x0 + x1
        x1 = (x1 << r) | (x1 >> (32 - r))
        return x0, x0 ^ x1

    ks = (k0, k1, k2)
    for i in range(5):
        rots = rot0 if i % 2 == 0 else rot1
        for r in rots:
            x0, x1 = rnd(x0, x1, r)
        x0 = x0 + ks[(i + 1) % 3]
        x1 = x1 + ks[(i + 2) % 3] + jnp.uint32(i + 1)
    return x0, x1


def _bits_to_uniform(bits):
    """uint32 -> float32 in [0, 1), exactly as jax.random.uniform."""
    f = (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
    return jax.lax.bitcast_convert_type(f, jnp.float32) - jnp.float32(1.0)


def uniform_at(slot_keys_arr: jax.Array, site: int, pos: jax.Array, n: int):
    """uniform_per_slot(sk, site, (n,))[b, pos[b, ...]] WITHOUT materializing
    or gathering the pool: the threefry block for each requested position is
    computed directly.  Under jax's partitionable threefry (the default),
    flat position p draws counter pair (0, p) and emits y0 ^ y1.

    Bit-identical to the gathered form for pos in [0, n); out-of-range pos
    are clamped.
    """
    ks = site_keys(slot_keys_arr, site)  # [B, 2]
    B = ks.shape[0]
    extra = (1,) * (pos.ndim - 1)
    k0 = ks[:, 0].reshape(B, *extra).astype(jnp.uint32)
    k1 = ks[:, 1].reshape(B, *extra).astype(jnp.uint32)
    p = jnp.clip(pos, 0, n - 1).astype(jnp.uint32)
    y0, y1 = _threefry2x32(k0, k1, jnp.zeros_like(p), p)
    return _bits_to_uniform(y0 ^ y1)


def uniform2_per_slot(slot_keys_arr: jax.Array, site: int, shape=()):
    """Two independent uniform(0,1) fields from ONE u32 draw per position
    (16-bit resolution each — ample for categorical/base choices, and half
    the RNG compute + memory traffic of two float draws)."""
    bits = bits_per_slot(slot_keys_arr, site, shape)
    scale = jnp.float32(1.0 / 65536.0)
    lo = (bits & jnp.uint32(0xFFFF)).astype(jnp.float32) * scale
    hi = (bits >> jnp.uint32(16)).astype(jnp.float32) * scale
    return lo, hi
