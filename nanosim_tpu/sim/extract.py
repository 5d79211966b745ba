"""Batched reference extraction: position sampling + gathers.

Replaces the reference's per-read string slicing (`extract_read`,
simulator.py:1694-1781).  The genome lives in HBM as one flat uint8 array;
start positions are sampled per lane with the reference's semantics
(uniform over the concatenated genome, rejecting reads that span a
chromosome boundary; circular chromosomes wrap), and the read becomes a
[B, L] gather.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..io.genome import MetagenomeSet, PackedGenome
from ..ops import rng


@jax.jit
def _unpack_genome(packed: jax.Array, exc_idx: jax.Array, exc_val: jax.Array):
    """[P] packed 2-bit codes -> [P*4] uint8 ASCII with sparse exception
    bytes (IUPAC codes etc.) scattered back in (padding indices drop)."""
    shifts = jnp.arange(4, dtype=jnp.uint8) * 2
    codes = (packed[:, None] >> shifts[None, :]) & jnp.uint8(3)
    ascii_ = jnp.where(
        codes == 0, jnp.uint8(ord("A")),
        jnp.where(codes == 1, jnp.uint8(ord("C")),
                  jnp.where(codes == 2, jnp.uint8(ord("G")), jnp.uint8(ord("T")))),
    ).reshape(-1)
    return ascii_.at[exc_idx].set(exc_val, mode="drop")


@dataclasses.dataclass
class GenomeDevice:
    """Device-resident packed genome."""

    flat: jax.Array  # [total] uint8
    flat_chunks: jax.Array  # [ceil(total/256), 256] uint8 — chunked view for
    # bulk extraction (per-byte gathers serialize on TPU)
    offsets: jax.Array  # [n_chrom + 1] int64
    lengths: jax.Array  # [n_chrom] int64
    circular: jax.Array  # [n_chrom] bool
    genome_len: int  # static
    # metagenome extras (empty for plain genomes)
    species_of_chrom: jax.Array  # [n_chrom] int32
    chrom_start_of_species: jax.Array  # [n_species + 1] int32

    @staticmethod
    def _chunked(flat: np.ndarray) -> np.ndarray:
        pad = (-len(flat)) % 256
        if pad:
            flat = np.concatenate([flat, np.zeros(pad, np.uint8)])
        return flat.reshape(-1, 256)

    @staticmethod
    def _upload_flat(flat_np: np.ndarray):
        """Upload the genome 2-bit packed (+ sparse non-ACGT exceptions) and
        unpack on device: 4x fewer bytes over the host link than raw ASCII —
        the genome transfer, not compilation, dominates warm cold-start on
        slow links.  Returns (flat [Ppad*4] u8 ascii, chunks view [.,256]);
        the padded tail holds 'A' and is never addressed (all gathers clip
        to chromosome bounds)."""
        n = len(flat_np)
        # pad the PACKED array to 1 MiB tiers so the unpack program compiles
        # for a handful of shapes, not one per genome
        pb = -(-((n + 3) // 4) // (1 << 20)) * (1 << 20)
        lut = np.zeros(256, np.uint8)
        lut[ord("C")] = 1
        lut[ord("G")] = 2
        lut[ord("T")] = 3
        codes = lut[flat_np]
        packed = np.zeros(pb, np.uint8)
        c4 = np.zeros(pb * 4, np.uint8)
        c4[:n] = codes
        c4 = c4.reshape(-1, 4)
        packed = (c4[:, 0] | (c4[:, 1] << 2) | (c4[:, 2] << 4) | (c4[:, 3] << 6)).astype(np.uint8)
        # 256-entry LUT, not np.isin: isin's sort path costs ~9 s on a
        # 48 MB genome and dominated per-run startup
        plain_lut = np.zeros(256, bool)
        plain_lut[np.frombuffer(b"ACGT", np.uint8)] = True
        is_plain = plain_lut[flat_np]
        exc_idx = np.nonzero(~is_plain)[0]
        exc_val = flat_np[exc_idx]
        et = max(256, 1 << int(np.ceil(np.log2(max(len(exc_idx), 1) + 1))))
        exc_i = np.full(et, pb * 4, np.int64)  # pad -> dropped by the scatter
        exc_v = np.zeros(et, np.uint8)
        exc_i[: len(exc_idx)] = exc_idx
        exc_v[: len(exc_idx)] = exc_val
        flat_dev = _unpack_genome(
            jnp.asarray(packed), jnp.asarray(exc_i), jnp.asarray(exc_v)
        )
        return flat_dev, flat_dev.reshape(-1, 256)

    @classmethod
    def from_packed(cls, g: PackedGenome) -> "GenomeDevice":
        n = g.n_chrom
        flat_dev, chunks = cls._upload_flat(g.flat)
        return cls(
            flat=flat_dev,
            flat_chunks=chunks,
            offsets=jnp.asarray(g.offsets, jnp.int64),
            lengths=jnp.asarray(g.lengths, jnp.int64),
            circular=jnp.asarray(g.circular),
            genome_len=g.total_len,
            species_of_chrom=jnp.zeros(n, jnp.int32),
            chrom_start_of_species=jnp.asarray([0, n], jnp.int32),
        )

    @classmethod
    def from_metagenome(cls, m: MetagenomeSet) -> "GenomeDevice":
        g = m.packed
        flat_dev, chunks = cls._upload_flat(g.flat)
        return cls(
            flat=flat_dev,
            flat_chunks=chunks,
            offsets=jnp.asarray(g.offsets, jnp.int64),
            lengths=jnp.asarray(g.lengths, jnp.int64),
            circular=jnp.asarray(g.circular),
            genome_len=g.total_len,
            species_of_chrom=jnp.asarray(m.species_of_chrom, jnp.int32),
            chrom_start_of_species=jnp.asarray(m.chrom_start_of_species, jnp.int32),
        )


jax.tree_util.register_pytree_node(
    GenomeDevice,
    lambda g: (
        (g.flat, g.flat_chunks, g.offsets, g.lengths, g.circular,
         g.species_of_chrom, g.chrom_start_of_species),
        (g.genome_len,),
    ),
    lambda static, data: GenomeDevice(
        flat=data[0],
        flat_chunks=data[1],
        offsets=data[2],
        lengths=data[3],
        circular=data[4],
        genome_len=static[0],
        species_of_chrom=data[5],
        chrom_start_of_species=data[6],
    ),
)


def sample_genome_positions(
    slot_keys: jax.Array,  # [B, 2]
    lengths: jax.Array,  # [B] int32 middle_ref per lane
    genome: GenomeDevice,
    dna_type_circular: bool,
    n_retries: int = 8,
    site: int = rng.SITE_POSITION,
):
    """Sample start positions, genome mode (simulator.py:1750-1781).

    Linear: uniform global position over the concatenated genome, rejected
    unless the read fits inside one chromosome; up to `n_retries` fresh draws
    per lane (the reference retries unboundedly; failures here surface in
    `ok` and the slot is rejected upstream).

    Circular (single chromosome): any position, wraps.

    Returns (chrom [B] i32, local_pos [B] i64, ok [B] bool).
    """
    B = slot_keys.shape[0]
    pos_keys = rng.site_keys(slot_keys, site)
    glen = genome.genome_len

    def draw(r):
        ks = jax.vmap(lambda k: jax.random.fold_in(k, r))(pos_keys)
        u = jax.vmap(lambda k: jax.random.uniform(k, dtype=jnp.float64))(ks)
        # random.randint(0, genome_len) is inclusive on both ends
        return jnp.minimum((u * (glen + 1)).astype(jnp.int64), glen)

    if dna_type_circular:
        g = draw(0)
        # single chromosome; wrap handled at gather time
        return jnp.zeros(B, jnp.int32), g, jnp.ones(B, bool)

    chrom = jnp.zeros(B, jnp.int32)
    local = jnp.zeros(B, jnp.int64)
    ok = jnp.zeros(B, bool)
    for r in range(n_retries):
        g = draw(r)
        c = jnp.clip(jnp.searchsorted(genome.offsets, g, side="right") - 1, 0, genome.lengths.shape[0] - 1)
        lp = g - genome.offsets[c]
        fits = lp + lengths <= genome.lengths[c]
        take = (~ok) & fits
        chrom = jnp.where(take, c.astype(jnp.int32), chrom)
        local = jnp.where(take, lp, local)
        ok = ok | fits
    return chrom, local, ok


def sample_transcript_positions(
    slot_keys: jax.Array,
    trx_idx: jax.Array,  # [B] int32 transcript per lane
    lengths: jax.Array,  # [B] int32
    genome: GenomeDevice,
    site: int = rng.SITE_POSITION,
):
    """extract_read_trx (simulator.py:1683-1691): uniform start in
    [0, seq_len - length], inclusive.  Returns (local_pos [B] i64, ok)."""
    pos_keys = rng.site_keys(slot_keys, site)
    u = jax.vmap(lambda k: jax.random.uniform(k, dtype=jnp.float64))(pos_keys)
    span = genome.lengths[trx_idx] - lengths.astype(jnp.int64)
    ok = span >= 0
    hi = jnp.maximum(span, 0) + 1
    pos = jnp.minimum((u * hi).astype(jnp.int64), jnp.maximum(span, 0))
    return pos, ok


def sample_metagenome_positions(
    slot_keys: jax.Array,
    species: jax.Array,  # [B] int32
    lengths: jax.Array,  # [B] int32
    genome: GenomeDevice,
    n_chrom: int,
    site: int = rng.SITE_SPECIES,
):
    """Metagenome extraction (simulator.py:1704-1747).

    Choose a uniform chromosome of the species; if too short, fall back to a
    uniform choice among longer chromosomes of the same species, else among
    longer chromosomes anywhere.  Circular chromosomes start anywhere and
    wrap; linear ones start in [0, len - length].

    Returns (chrom [B] i32, local_pos [B] i64, ok [B] bool).
    """
    keys = rng.site_keys(slot_keys, site)
    us = jax.vmap(lambda k: jax.random.uniform(k, (3,), dtype=jnp.float64))(keys)
    u_chrom, u_fallback, u_pos = us[:, 0], us[:, 1], us[:, 2]

    cs = genome.chrom_start_of_species
    lo = cs[species]
    n_of_sp = cs[species + 1] - lo
    chrom = lo + jnp.minimum((u_chrom * n_of_sp).astype(jnp.int32), n_of_sp - 1)

    fits = lengths.astype(jnp.int64) <= genome.lengths[chrom]

    # Fallback: uniform among longer chromosomes, preferring the same species.
    chrom_ids = jnp.arange(n_chrom)
    longer = lengths.astype(jnp.int64)[:, None] < genome.lengths[None, :]  # [B, C]
    same_sp = genome.species_of_chrom[None, :] == species[:, None]
    cand_same = longer & same_sp
    cand_any = longer & ~same_sp
    n_same = jnp.sum(cand_same, axis=1)
    n_any = jnp.sum(cand_any, axis=1)
    use_same = n_same > 0
    cand = jnp.where(use_same[:, None], cand_same, cand_any)
    n_cand = jnp.where(use_same, n_same, n_any)
    kth = jnp.minimum((u_fallback * n_cand).astype(jnp.int32), jnp.maximum(n_cand - 1, 0))
    cum = jnp.cumsum(cand.astype(jnp.int32), axis=1)
    fb_chrom = jnp.argmax(cum > kth[:, None], axis=1).astype(jnp.int32)
    ok = fits | (n_cand > 0)
    chrom = jnp.where(fits, chrom, fb_chrom)

    clen = genome.lengths[chrom]
    circ = genome.circular[chrom]
    # circular: randint(0, len) inclusive; linear: randint(0, len - length)
    span = jnp.where(circ, clen, clen - lengths.astype(jnp.int64))
    pos = jnp.minimum((u_pos * (span + 1)).astype(jnp.int64), span)
    return chrom, pos, ok


def sample_uniform_chrom_positions(
    slot_keys: jax.Array,
    lengths: jax.Array,  # [B] int32
    genome: GenomeDevice,
    n_chrom: int,
    site: int = rng.SITE_POSITION,
):
    """Uniform random chromosome/transcript among those STRICTLY longer than
    the read (extract_read transcriptome branch, simulator.py:1695-1703),
    then uniform start in [0, len - length] inclusive.

    Returns (chrom [B] i32, pos [B] i64, ok [B] bool)."""
    keys = rng.site_keys(slot_keys, site)
    us = jax.vmap(lambda k: jax.random.uniform(k, (2,), dtype=jnp.float64))(keys)
    eligible = lengths.astype(jnp.int64)[:, None] < genome.lengths[None, :]  # [B, C]
    n_eli = jnp.sum(eligible, axis=1)
    kth = jnp.minimum((us[:, 0] * n_eli).astype(jnp.int32), jnp.maximum(n_eli - 1, 0))
    cum = jnp.cumsum(eligible.astype(jnp.int32), axis=1)
    chrom = jnp.argmax(cum > kth[:, None], axis=1).astype(jnp.int32)
    ok = n_eli > 0
    span = genome.lengths[chrom] - lengths.astype(jnp.int64)
    pos = jnp.minimum((us[:, 1] * (span + 1)).astype(jnp.int64), jnp.maximum(span, 0))
    return chrom, pos, ok


CHUNK = 256


@functools.partial(jax.jit, static_argnames=("l_cap",))
def gather_segments_padded(
    genome: GenomeDevice,
    chrom: jax.Array,  # [B] int32
    local_pos: jax.Array,  # [B] int64
    l_cap: int,
):
    """Chunked linear extraction: returns (ref_padded [B, l_cap + CHUNK]
    uint8, off [B] int32) with the segment at ref_padded[b, off[b]:...].

    Per-byte gathers serialize on TPU; fetching whole CHUNK-byte rows moves
    256x more data per gather index, and the residual intra-chunk offset is
    folded into the downstream mutation gather instead of a second shuffle.
    Linear chromosomes only (circular wrap breaks chunk contiguity — callers
    use the per-byte path there).
    """
    B = chrom.shape[0]
    gstart = genome.offsets[chrom] + local_pos  # global byte start
    n_chunks_needed = l_cap // CHUNK + 1
    chunk0 = (gstart // CHUNK).astype(jnp.int32)
    off = (gstart % CHUNK).astype(jnp.int32)
    total_chunks = genome.flat_chunks.shape[0]
    idx = jnp.clip(
        chunk0[:, None] + jnp.arange(n_chunks_needed, dtype=jnp.int32)[None, :],
        0,
        total_chunks - 1,
    )
    rows = jnp.take(genome.flat_chunks, idx, axis=0)  # [B, C, CHUNK]
    return rows.reshape(B, n_chunks_needed * CHUNK), off


@functools.partial(jax.jit, static_argnames=("l_cap",))
def gather_segments(
    genome: GenomeDevice,
    chrom: jax.Array,  # [B] int32
    local_pos: jax.Array,  # [B] int64
    seg_len: jax.Array,  # [B] int32
    l_cap: int,
) -> jax.Array:
    """[B, l_cap] uint8 reference slices with circular wrap.

    Index math stays in int32 when the genome fits (int64 gathers are
    emulated on TPU); genomes beyond 2^31 bases use the int64 path.
    """
    dt = jnp.int32 if genome.genome_len + l_cap < 2**31 else jnp.int64
    i = jnp.arange(l_cap, dtype=dt)[None, :]
    clen = genome.lengths[chrom].astype(dt)[:, None]
    raw = local_pos.astype(dt)[:, None] + i
    wrapped = jnp.where(genome.circular[chrom][:, None], raw % clen, raw)
    idx = genome.offsets[chrom].astype(dt)[:, None] + jnp.minimum(wrapped, clen - 1)
    seg = jnp.take(genome.flat, idx, mode="clip")
    return jnp.where(i < seg_len[:, None], seg, jnp.uint8(0))
