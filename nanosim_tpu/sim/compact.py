"""Device-side batch compaction: valid lanes -> chunk-aligned flat buffers.

The padded [B, l_out] layout is right for device compute but wrong for the
host link: at ONT lengths the rows are ~2.7x wider than the mean read and
every byte crosses the (slow) host interconnect.  This module packs a whole
batch, ON DEVICE, into three flat buffers holding only the valid lanes' used
prefixes:

  reads  -> 2-bit codes (4 bases/byte), each lane starting at a 512-byte
            aligned offset;
  events -> one u32 per walk event (pos2x | len << 17 | type << 30), each
            lane starting at a 128-word (512-byte) aligned offset;
  quals  -> raw phred+33 bytes (FASTQ only), 512-byte aligned offsets.

Chunk alignment makes the compaction a *row gather*: the padded buffer is
reshaped to 512-byte rows and each output chunk pulls one row — a structured
copy XLA executes near memory bandwidth, unlike per-byte gathers.  The waste
is <= 511 bytes/lane (~10% at 8 kb reads) against a 2.7-4x saving.

Offsets are a pure function of (valid, total, n_events), so the host
recomputes them from the metadata instead of transferring them.  Everything
(metadata + the three streams) is fused into ONE uint8 buffer = ONE
device->host round trip per batch on high-latency links.

Capacities are static (jit shapes).  The packer reports the needed chunk
counts in the metadata tail; a batch that overflows its capacity is repacked
at the next tier (rare when the caller sizes with margin — batch sums
concentrate hard around B * mean).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = 256  # bytes per aligned chunk (reads/quals); events use 64 u32 words

# valid,total,head,tail,middle_ref,l_new,chrom,pos,rev,n_events,cap_over,
# m_ref_init, ev_checksum (walk-replay verification)
META_COLS = 13


def _le_bytes64(x):
    """[...] int64 -> [..., 8] uint8 little-endian."""
    u = x.astype(jnp.uint64)
    return jnp.stack(
        [(u >> jnp.uint64(8 * i)).astype(jnp.uint8) for i in range(8)], axis=-1
    )


def _le_bytes32(x):
    u = x.astype(jnp.uint32)
    return jnp.stack(
        [(u >> jnp.uint32(8 * i)).astype(jnp.uint8) for i in range(4)], axis=-1
    )


def _ascii_to_code(seq):
    return jnp.where(
        seq == jnp.uint8(ord("C")), jnp.uint8(1),
        jnp.where(seq == jnp.uint8(ord("G")), jnp.uint8(2),
                  jnp.where(seq == jnp.uint8(ord("T")), jnp.uint8(3), jnp.uint8(0))),
    )


def _pack2(seq_ascii):
    """[B, L] ASCII -> [B, ceil(L/4)] packed bytes (base 4w+j at bits 2j)."""
    B, L = seq_ascii.shape
    pad = (-L) % 4
    if pad:
        seq_ascii = jnp.pad(seq_ascii, ((0, 0), (0, pad)))
    c = _ascii_to_code(seq_ascii).reshape(B, (L + pad) // 4, 4)
    return (
        c[:, :, 0]
        | (c[:, :, 1] << jnp.uint8(2))
        | (c[:, :, 2] << jnp.uint8(4))
        | (c[:, :, 3] << jnp.uint8(6))
    )


def _chunk_compact(rows_bytes, lane_bytes, cap_chunks):
    """Compact per-lane byte prefixes into a flat chunk-aligned buffer.

    rows_bytes: [B, W] uint8 (W a multiple of CHUNK)
    lane_bytes: [B] int32 used bytes per lane (0 for skipped lanes)
    cap_chunks: static output capacity in CHUNK-byte chunks

    Returns (flat [cap_chunks * CHUNK] u8, n_chunks_needed [] i32).
    """
    B, W = rows_bytes.shape
    mc = W // CHUNK  # max chunks per lane
    rows = rows_bytes.reshape(B * mc, CHUNK)
    nch = (lane_bytes + (CHUNK - 1)) // CHUNK  # [B]
    off = jnp.cumsum(nch) - nch  # exclusive prefix
    need = off[-1] + nch[-1]

    c = jnp.arange(mc, dtype=jnp.int32)[None, :]
    mask = c < nch[:, None]
    dst = jnp.where(mask, off[:, None] + c, cap_chunks)  # OOB -> dropped
    src_rows = jnp.arange(B, dtype=jnp.int32)[:, None] * mc + c
    chunk_src = (
        jnp.zeros(cap_chunks, jnp.int32)
        .at[dst.reshape(-1)]
        .set(src_rows.reshape(-1), mode="drop")
    )
    flat = jnp.take(rows, chunk_src, axis=0, mode="clip")
    return flat.reshape(cap_chunks * CHUNK), need.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "nr_cap", "ne_cap", "nq_cap", "fastq", "with_events", "pack_reads",
        "with_checksum", "with_reads",
    ),
)
def compact_pack(
    read,  # [B, l_out] uint8 ASCII, final orientation
    quals,  # [B, l_out] uint8 (zeros when not fastq)
    valid,  # [B] bool
    total,  # [B] int32
    head,
    tail,
    middle_ref,
    l_new,
    chrom,
    local_pos,
    is_rev,
    n_events,
    cap_over,
    ev_pos2x,  # [B, E] int32
    ev_type,
    ev_len,
    m_ref_init=None,  # [B] int32 (walk replay) or None
    *,
    nr_cap: int,  # read capacity, CHUNK-byte chunks
    ne_cap: int,  # event capacity, CHUNK-byte chunks
    nq_cap: int,  # qual capacity, CHUNK-byte chunks (0 unless fastq)
    fastq: bool,
    with_events: bool,
    pack_reads: bool = True,
    with_checksum: bool = False,
    with_reads: bool = True,
) -> jax.Array:
    """ONE uint8 transfer buffer:

    [ meta (B+1 rows x META_COLS i64 LE; last row = needed chunk counts) |
      flat reads | flat events | flat quals ]
    """
    B = read.shape[0]
    v32 = valid.astype(jnp.int32)

    parts = []

    # --- reads ---
    need_r = jnp.int32(0)
    if with_reads:
        if pack_reads:
            packed = _pack2(read)  # [B, P4]
            lane_bytes = v32 * ((total + 3) // 4)
        else:
            packed = read  # raw bytes (uracil-bearing output)
            lane_bytes = v32 * total
        padw = (-packed.shape[1]) % CHUNK
        if padw:
            packed = jnp.pad(packed, ((0, 0), (0, padw)))
        flat_r, need_r = _chunk_compact(packed, lane_bytes, nr_cap)
        parts.append(flat_r)

    # --- events ---
    need_e = jnp.int32(0)
    if with_events:
        p = ev_pos2x.astype(jnp.uint32)
        ln = ev_len.astype(jnp.uint32)
        t = ev_type.astype(jnp.uint32)
        ev = p | (ln << jnp.uint32(17)) | (t << jnp.uint32(30))
        evb = _le_bytes32(ev).reshape(B, -1)  # [B, 4E]
        pade = (-evb.shape[1]) % CHUNK
        if pade:
            evb = jnp.pad(evb, ((0, 0), (0, pade)))
        ev_bytes = v32 * 4 * n_events
        flat_e, need_e = _chunk_compact(evb, ev_bytes, ne_cap)
        parts.append(flat_e)

    # --- quals ---
    need_q = jnp.int32(0)
    if fastq:
        q = quals
        padq = (-q.shape[1]) % CHUNK
        if padq:
            q = jnp.pad(q, ((0, 0), (0, padq)))
        flat_q, need_q = _chunk_compact(q, v32 * total, nq_cap)
        parts.append(flat_q)

    # --- metadata (built last so the chunk-count row is available) ---
    mref_col = m_ref_init if m_ref_init is not None else jnp.zeros(B, jnp.int32)
    if with_checksum:
        # order-sensitive 32-bit checksum over the packed event words (the
        # host walk replay recomputes it; mismatching lanes re-fetch exactly)
        w = (
            ev_pos2x.astype(jnp.uint32)
            | (ev_len.astype(jnp.uint32) << jnp.uint32(17))
            | (ev_type.astype(jnp.uint32) << jnp.uint32(30))
        )
        e_i = jnp.arange(w.shape[1], dtype=jnp.uint32)[None, :]
        terms = (w + jnp.uint32(1)) * (jnp.uint32(2) * e_i + jnp.uint32(1))
        mask = e_i.astype(jnp.int32) < n_events[:, None]
        cksum = jnp.sum(jnp.where(mask, terms, jnp.uint32(0)), axis=1, dtype=jnp.uint32)
    else:
        cksum = jnp.zeros(B, jnp.uint32)
    cols = [valid, total, head, tail, middle_ref, l_new, chrom, local_pos,
            is_rev, n_events, cap_over, mref_col, cksum]
    meta = jnp.stack([c.astype(jnp.int64) for c in cols], axis=1)  # [B, 13]
    tail_row = (
        jnp.zeros((1, META_COLS), jnp.int64)
        .at[0, 0].set(need_r.astype(jnp.int64))
        .at[0, 1].set(need_e.astype(jnp.int64))
        .at[0, 2].set(need_q.astype(jnp.int64))
    )
    meta = jnp.concatenate([meta, tail_row])  # [B+1, 11]
    meta_bytes = _le_bytes64(meta).reshape(-1)

    return jnp.concatenate([meta_bytes] + [p.reshape(-1) for p in parts])


# --- host-side decoding ------------------------------------------------------


class CompactBatch:
    """Host view of a compacted batch: metadata dict + flat streams with
    per-lane offsets recomputed from the metadata (same arithmetic as the
    device packer, by construction)."""

    __slots__ = (
        "valid", "total", "head", "tail", "middle_ref", "l_new", "chrom",
        "pos", "rev", "n_events", "cap_over",
        "reads_flat", "read_off", "ev_flat", "ev_off", "quals_flat", "qual_off",
        "pack_reads", "needs", "m_ref", "ev_checksum", "slots", "recon",
        "finish",
    )

    def __getitem__(self, k):  # dict-style access for writer compatibility
        return getattr(self, "pos" if k == "pos" else k)

    def __contains__(self, k):
        return hasattr(self, k)


def decode_compact(
    buf: np.ndarray,
    B: int,
    nr_cap: int,
    ne_cap: int,
    nq_cap: int,
    fastq: bool,
    with_events: bool,
    pack_reads: bool = True,
    with_reads: bool = True,
):
    """Parse the fused transfer buffer.  Returns (CompactBatch, ok) where
    ok=False means a stream overflowed its capacity (repack needed)."""
    meta_n = (B + 1) * META_COLS * 8
    meta = buf[:meta_n].view("<i8").reshape(B + 1, META_COLS)
    need_r, need_e, need_q = int(meta[B, 0]), int(meta[B, 1]), int(meta[B, 2])
    if need_r > nr_cap or need_e > ne_cap or need_q > nq_cap:
        return (need_r, need_e, need_q), False

    cb = CompactBatch()
    cb.needs = (need_r, need_e, need_q)
    m = meta[:B]
    cb.valid = m[:, 0].astype(bool)
    cb.total = m[:, 1]
    cb.head = m[:, 2]
    cb.tail = m[:, 3]
    cb.middle_ref = m[:, 4]
    cb.l_new = m[:, 5]
    cb.chrom = m[:, 6]
    cb.pos = m[:, 7]
    cb.rev = m[:, 8].astype(bool)
    cb.n_events = m[:, 9]
    cb.cap_over = m[:, 10].astype(bool)
    cb.m_ref = m[:, 11]
    cb.ev_checksum = m[:, 12].astype(np.uint32)
    cb.pack_reads = pack_reads

    v = cb.valid.astype(np.int64)
    off = meta_n
    cb.recon = None
    cb.finish = None

    if with_reads:
        lane_bytes = v * ((cb.total + 3) // 4 if pack_reads else cb.total)
        nch = (lane_bytes + CHUNK - 1) // CHUNK
        cb.read_off = (np.cumsum(nch) - nch) * CHUNK
        cb.reads_flat = buf[off : off + nr_cap * CHUNK]
        off += nr_cap * CHUNK
    else:
        cb.read_off = None
        cb.reads_flat = None

    if with_events:
        ev_bytes = v * 4 * cb.n_events
        ech = (ev_bytes + CHUNK - 1) // CHUNK
        cb.ev_off = (np.cumsum(ech) - ech) * (CHUNK // 4)  # word offsets
        cb.ev_flat = buf[off : off + ne_cap * CHUNK].view("<u4")
        off += ne_cap * CHUNK
    else:
        cb.ev_off = np.zeros(B, np.int64)
        cb.ev_flat = np.zeros(1, np.uint32)

    if fastq:
        qch = (v * cb.total + CHUNK - 1) // CHUNK
        cb.qual_off = (np.cumsum(qch) - qch) * CHUNK
        cb.quals_flat = buf[off : off + nq_cap * CHUNK]
    else:
        cb.qual_off = np.zeros(B, np.int64)
        cb.quals_flat = np.zeros(1, np.uint8)

    return cb, True


_DEC_LUT = None


def decode_reads_ascii(cb: CompactBatch, lanes) -> list:
    """Decode selected lanes back to ASCII arrays (testing / python writers)."""
    global _DEC_LUT
    if _DEC_LUT is None:
        lut = np.zeros(256, np.uint32)
        bases = b"ACGT"
        for vv in range(256):
            b4 = bytes(bases[(vv >> (2 * i)) & 3] for i in range(4))
            lut[vv] = np.frombuffer(b4, np.uint32)[0]
        _DEC_LUT = lut
    out = []
    for b in lanes:
        t = int(cb.total[b])
        o = int(cb.read_off[b])
        if cb.pack_reads:
            nb = (t + 3) // 4
            dec = _DEC_LUT[cb.reads_flat[o : o + nb]].view(np.uint8)[:t]
        else:
            dec = cb.reads_flat[o : o + t]
        out.append(dec)
    return out
