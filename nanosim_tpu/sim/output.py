"""Host-side output: FASTA/FASTQ emission, read naming, ground-truth error log.

Naming and file layout match the reference exactly:

* aligned reads -> `<out>_aligned_reads.fasta|fastq`, names
  `<chrom>_<pos>_aligned_<idx>[_chimeric]_<F|R>_<head>_<middle;...>_<tail>`
  (simulator.py:1390-1402); perfect reads use `_perfect_`, unaligned
  `_unaligned_` with 0 head/tail (simulator.py:1534).
* every introduced error -> `<out>_aligned_error_profile` rows
  `Seq_name  Seq_pos  error_type  error_length  ref_base  seq_base`
  written per read in reverse position order (mutate_read,
  simulator.py:2006-2008; header at simulator.py:1634).
"""

from __future__ import annotations

import sys

import numpy as np

_COMP_LUT = np.arange(256, dtype=np.uint8)
for _a, _b in ((ord("A"), ord("T")), (ord("C"), ord("G"))):
    _COMP_LUT[_a], _COMP_LUT[_b] = _b, _a

_ETYPE_NAMES = np.array(["mis", "ins", "del"])


class RunStats:
    """Process-wide capacity-event counters (observability for the rescue
    machinery): a production workload that spills or rescues every batch is
    silently ~2x slower — these make it attributable.  Printed by the run
    orchestrators' stage logs and by bench.py on stderr."""

    def __init__(self):
        self.reset()

    def reset(self):
        # packed chimeric meta batches whose active (slot, segment) count
        # exceeded the mean+10-sigma lane block -> whole-batch unpacked re-run
        self.packed_spills = 0
        # lanes re-run through a full-budget rescue program (walk-budget /
        # width / hp run-table overflow)
        self.overflow_rescue_lanes = 0

    def summary(self) -> str:
        return (f"capacity events: packed_spills={self.packed_spills} "
                f"overflow_rescue_lanes={self.overflow_rescue_lanes}")

    def report(self, log=None) -> None:
        """Emit the counters when any fired (log: callable or None=stderr)."""
        if not (self.packed_spills or self.overflow_rescue_lanes):
            return
        if log is None:
            print("[nanosim-tpu] " + self.summary(), file=sys.stderr)
        else:
            log(self.summary())


RUN_STATS = RunStats()


def report_progress(prev: int, now: int) -> None:
    """Batch-granular progress line at every 10k-read crossing.

    Mirrors the reference's per-read ticker (`check_print_progress`,
    simulator.py:52-56: at sequence_index % 10000 == 0 it prints
    `Number of reads simulated >> <index+1>`, carriage-return terminated) at
    the batch level: the batch assigned indices [prev, now), so one line per
    10k multiple the batch covered, each printing mark+1 for byte parity.
    """
    first = -(-prev // 10000) * 10000
    if first >= now:
        return
    import sys
    from time import strftime

    for mark in range(first, now, 10000):
        sys.stdout.write(
            strftime("%Y-%m-%d %H:%M:%S") + ": Number of reads simulated >> " + str(mark + 1) + "\r"
        )
    sys.stdout.flush()


class FastxWriter:
    """Buffered FASTA/FASTQ writer over uint8 token rows."""

    def __init__(self, path: str, fastq: bool, append: bool = False):
        self.f = open(path, "ab" if append else "wb")
        self.fastq = fastq
        self._buf = []
        self._buf_bytes = 0

    def write(self, name: str, seq: np.ndarray, quals=None):
        head = ("@" if self.fastq else ">") + name + "\n"
        self._buf.append(head.encode())
        self._buf.append(seq.tobytes())
        self._buf.append(b"\n")
        if self.fastq:
            self._buf.append(b"+\n")
            self._buf.append(quals.tobytes())
            self._buf.append(b"\n")
        self._buf_bytes += len(head) + len(seq) * (2 if self.fastq else 1) + 8
        if self._buf_bytes > 8 << 20:
            self.flush()

    def flush(self):
        if self._buf:
            self.f.write(b"".join(self._buf))
            self._buf = []
            self._buf_bytes = 0

    def close(self):
        self.flush()
        self.f.close()


class ErrorLogWriter:
    """Ground-truth error log, reference row format."""

    HEADER = "Seq_name\tSeq_pos\terror_type\terror_length\tref_base\tseq_base\n"

    def __init__(self, path: str, header: bool = False, append: bool = False):
        self.f = open(path, "ab" if append else "wb", buffering=1 << 20)
        if header and not append:
            self.f.write(self.HEADER.encode())

    def write_read_events(self, name, keys, types, lens, refs, seqs):
        # reverse position order, as mutate_read logs them
        out = self.f
        for i in range(len(keys) - 1, -1, -1):
            out.write(
                f"{name}\t{keys[i]}\t{types[i]}\t{lens[i]}\t{refs[i]}\t{seqs[i]}\n".encode()
            )

    def write_bytes(self, data: bytes):
        self.f.write(data)

    def close(self):
        self.f.close()


def effective_lens_np(ev_pos2x, ev_type, ev_len, ev_valid, dedup_ins=True):
    """numpy twin of ops.apply_errors.effective_lens (reference dict-overwrite
    semantics: of consecutive same-key insertions only the LAST survives)."""
    if not dedup_ins:
        return ev_len
    nxt_ins = np.zeros_like(ev_valid)
    nxt_ins[:, :-1] = (ev_type[:, 1:] == 1) & ev_valid[:, 1:]
    nxt_same = np.zeros_like(ev_valid)
    nxt_same[:, :-1] = ev_pos2x[:, 1:] == ev_pos2x[:, :-1]
    dead = (ev_type == 1) & ev_valid & nxt_ins & nxt_same
    return np.where(dead, 0, ev_len)


def event_read_positions(ev_pos2x, ev_type, ev_len, ev_valid, dedup_ins=True):
    """Per-event read-coordinate starts (vectorized over [B, E]).

    read_start(e) = ref_start(e) - (deleted bases before e) + (inserted bases
    before e); events arrive in ascending position order from the walk.
    Overwritten duplicate insertions count as length 0.
    """
    ev_len = effective_lens_np(ev_pos2x, ev_type, ev_len, ev_valid, dedup_ins)
    is_ins = ev_valid & (ev_type == 1)
    is_del = ev_valid & (ev_type == 2)
    dlen = np.where(is_del, ev_len, 0)
    ilen = np.where(is_ins, ev_len, 0)
    prior_del = np.cumsum(dlen, axis=1) - dlen
    prior_ins = np.cumsum(ilen, axis=1) - ilen
    key = (ev_pos2x + 1) // 2  # ceil of the reference's float key
    ref_start = ev_pos2x // 2
    ref_start = np.where(is_ins, key, ref_start)
    return key, ref_start - prior_del + prior_ins, ev_len


def _pow2_at_least(x: int, lo: int, hi: int) -> int:
    k = lo
    while k < min(x, hi):
        k *= 2
    return min(k, hi)


class _DeviceFetch:
    """Batched device->host transfer helpers.

    Each np.asarray round-trip costs fixed latency (large on remote-TPU
    tunnels), so a batch comes back in exactly TWO transfers: (1) the
    per-lane scalars plus the used widths of the variable buffers, packed
    into one int64 array; (2) everything wide — events, reads, quals,
    pre-hp middles — sliced to those widths (quantized to powers of two to
    bound recompiles), packed to 2 bits/base where possible, and fused into
    a single uint8 buffer.
    """

    def __init__(self):
        import functools

        import jax
        import jax.numpy as jnp

        def _pack2bit(x, k):
            # ACGT -> 2-bit codes, 4 bases/byte (A=0 C=1 G=2 T=3); padding
            # zeros decode to 'A' bytes that the length masks drop
            x = x[:, :k]
            code = jnp.where(
                x == jnp.uint8(ord("C")), jnp.uint8(1),
                jnp.where(x == jnp.uint8(ord("G")), jnp.uint8(2),
                          jnp.where(x == jnp.uint8(ord("T")), jnp.uint8(3), jnp.uint8(0))),
            )
            c = code.reshape(x.shape[0], k // 4, 4)
            return (
                c[:, :, 0]
                | (c[:, :, 1] << jnp.uint8(2))
                | (c[:, :, 2] << jnp.uint8(4))
                | (c[:, :, 3] << jnp.uint8(6))
            )

        @jax.jit
        def pack_meta(valid, total, head, tail, middle_ref, l_new, chrom, pos, rev, n_events, cap_over):
            cols = [valid, total, head, tail, middle_ref, l_new, chrom, pos, rev, n_events, cap_over]
            meta = jnp.stack([c.astype(jnp.int64) for c in cols], axis=1)  # [B, 11]
            v = meta[:, 0] != 0
            mx = lambda col: jnp.max(jnp.where(v, col, 0))
            sizes = jnp.stack(
                [mx(meta[:, 1]), mx(meta[:, 9]), mx(meta[:, 5])]
            )  # max total, max n_events, max l_new over valid lanes
            row = jnp.zeros((1, 11), jnp.int64).at[0, :3].set(sizes)
            return jnp.concatenate([meta, row])

        # fused wide transfer: [B, W] uint8 = [events u32 | read | quals | prehp]
        @functools.lru_cache(maxsize=64)
        def pack_wide(k_ev, lt, fastq, pack_reads, lp, pack_ev):
            def le_bytes(u32):
                # explicit little-endian u32 -> 4 bytes (no bitcast layout
                # assumptions across backends)
                B = u32.shape[0]
                b = jnp.stack(
                    [(u32 >> jnp.uint32(8 * i)).astype(jnp.uint8) for i in range(4)],
                    axis=-1,
                )
                return b.reshape(B, -1)

            @jax.jit
            def f(ev_pos2x, ev_type, ev_len, read, quals, prehp):
                B = read.shape[0]
                parts = []
                if k_ev:
                    if pack_ev:
                        # pos2x (17 bits) | len (13 bits) | type (2 bits)
                        p = ev_pos2x[:, :k_ev].astype(jnp.uint32)
                        l = ev_len[:, :k_ev].astype(jnp.uint32)
                        t = ev_type[:, :k_ev].astype(jnp.uint32)
                        ev = p | (l << jnp.uint32(17)) | (t << jnp.uint32(30))
                    else:
                        ev = jnp.concatenate(
                            [ev_pos2x[:, :k_ev], ev_type[:, :k_ev], ev_len[:, :k_ev]],
                            axis=1,
                        ).astype(jnp.uint32)
                    parts.append(le_bytes(ev))
                if pack_reads:
                    parts.append(_pack2bit(read, lt))
                else:
                    parts.append(read[:, :lt])
                if fastq:
                    parts.append(quals[:, :lt])
                if lp:
                    parts.append(_pack2bit(prehp, lp))
                return jnp.concatenate(parts, axis=1)

            return f

        self.pack_meta = pack_meta
        self.pack_wide = pack_wide
        # byte -> 4 ASCII bases decode table
        lut = np.zeros(256, np.uint32)
        bases = np.frombuffer(b"ACGT", np.uint8)
        for v in range(256):
            b4 = bytes(
                int(bases[(v >> (2 * i)) & 3]) for i in range(4)
            )
            lut[v] = np.frombuffer(b4, np.uint32)[0]
        self.unpack_lut = lut

    def decode2bit(self, packed: np.ndarray) -> np.ndarray:
        return self.unpack_lut[packed].view(np.uint8).reshape(
            packed.shape[0], packed.shape[1] * 4
        )


_FETCH = None


def _meta_dict(meta: np.ndarray) -> dict:
    return {
        "valid": meta[:, 0].astype(bool),
        "total": meta[:, 1].astype(np.int64),
        "head": meta[:, 2].astype(np.int64),
        "tail": meta[:, 3].astype(np.int64),
        "middle_ref": meta[:, 4].astype(np.int64),
        "l_new": meta[:, 5].astype(np.int64),
        "chrom": meta[:, 6].astype(np.int64),
        "pos": meta[:, 7].astype(np.int64),
        "rev": meta[:, 8].astype(bool),
        "n_events": meta[:, 9].astype(np.int64),
        "cap_over": meta[:, 10].astype(bool),
    }


def _decode_wide(d, wide, lt, k, lp, fastq, pack_reads, pack_ev):
    off = 0
    if k:
        if pack_ev:
            ev = np.ascontiguousarray(wide[:, : 4 * k]).view(np.uint32)
            d["ev_pos2x"] = (ev & 0x1FFFF).astype(np.int64)
            d["ev_len"] = ((ev >> 17) & 0x1FFF).astype(np.int64)
            d["ev_type"] = (ev >> 30).astype(np.int64)
            off = 4 * k
        else:
            ev = np.ascontiguousarray(wide[:, : 12 * k]).view(np.int32)
            d["ev_pos2x"] = ev[:, :k]
            d["ev_type"] = ev[:, k : 2 * k]
            d["ev_len"] = ev[:, 2 * k : 3 * k]
            off = 12 * k
        d["ev_valid"] = (
            np.arange(k, dtype=np.int64)[None, :] < d["n_events"][:, None]
        )
    if pack_reads:
        d["read"] = _FETCH.decode2bit(np.ascontiguousarray(wide[:, off : off + lt // 4]))
        off += lt // 4
    else:
        d["read"] = np.ascontiguousarray(wide[:, off : off + lt])
        off += lt
    if fastq:
        d["quals"] = np.ascontiguousarray(wide[:, off : off + lt])
        off += lt
    if lp:
        d["prehp"] = _FETCH.decode2bit(np.ascontiguousarray(wide[:, off : off + lp // 4]))
    return d


def fetch_batch(out, fastq: bool, with_events: bool, with_prehp: bool = False, pack_reads: bool = True):
    """Transfer a BatchOut in two round trips; returns a dict of np arrays
    (reads/quals sliced to the used width, events to max n_events)."""
    global _FETCH
    if _FETCH is None:
        _FETCH = _DeviceFetch()
    meta = np.asarray(
        _FETCH.pack_meta(
            out.valid, out.total_len, out.head, out.tail, out.middle_ref,
            out.l_new, out.chrom, out.local_pos, out.is_reversed, out.n_events,
            getattr(out, "capacity_overflow", out.valid),
        )
    )
    sizes = meta[-1]
    meta = meta[:-1]
    d = _meta_dict(meta)
    B = meta.shape[0]
    l_out = out.read.shape[1]
    lt = _pow2_at_least(max(int(sizes[0]), 1), 256, l_out)
    # FASTA reads are pure ACGT post-pipeline: ship 2 bits/base and decode
    # host-side with a byte->4-chars table (4x less tunnel/PCIe); disabled
    # for uracil output, which carries 'U' bytes
    pack_ev = True
    k = 0
    if with_events:
        e_cap = out.ev_pos2x.shape[1]
        k = _pow2_at_least(max(int(sizes[1]), 1), 64, e_cap)
        pack_ev = l_out < (1 << 16)  # pos2x fits 17 bits
    lp = 0
    if with_prehp:
        lp = _pow2_at_least(max(int(sizes[2]), 1) + 64, 256, out.read_prehp.shape[1])

    fn = _FETCH.pack_wide(k, lt, fastq, pack_reads, lp, pack_ev)
    wide = np.asarray(
        fn(
            out.ev_pos2x if with_events else np.zeros((B, 1), np.int32),
            out.ev_type if with_events else np.zeros((B, 1), np.int32),
            out.ev_len if with_events else np.zeros((B, 1), np.int32),
            out.read,
            out.quals if fastq else np.zeros((B, 1), np.uint8),
            out.read_prehp if with_prehp else np.zeros((B, 4), np.uint8),
        )
    )
    return _decode_wide(d, wide, lt, k if with_events else 0,
                        lp if with_prehp else 0, fastq, pack_reads, pack_ev)


class GenomeBatchWriter:
    """Accept/number/emit a genome-mode batch (aligned reads)."""

    def __init__(self, fastx: FastxWriter, error_log=None, perfect: bool = False):
        self.fastx = fastx
        self.error_log = error_log
        self.perfect = perfect
        from ..io.native import NativeEmitter

        self._emitter = NativeEmitter()

    def write_batch(self, sim, out, accepted_so_far: int, quota: int) -> int:
        with_events = self.error_log is not None and not self.perfect
        # -hp rewrites homopolymer runs AFTER the logged pass-1 mutation, so
        # the log must slice seq bases from the pre-resize middle buffer
        hp_mode = with_events and getattr(sim, "kmer_bias", None) is not None
        if hasattr(out, "fetch"):
            d = out.fetch()
        else:
            d = fetch_batch(out, sim.fastq, with_events, with_prehp=hp_mode)
        valid = d["valid"]
        lanes = np.nonzero(valid)[0]
        remaining = quota - accepted_so_far
        lanes = lanes[:remaining]
        return self.write_run(sim, d, lanes, accepted_so_far)

    def write_run(self, sim, d, lanes, accepted_so_far: int) -> int:
        """Emit already-fetched lanes (in the given order) starting at
        sequence number `accepted_so_far` (bucketed runs call this with
        slot-ordered lane groups)."""
        if len(lanes) == 0:
            return 0
        with_events = self.error_log is not None and not self.perfect
        if hasattr(d, "reads_flat"):  # CompactBatch
            return self._write_flat(sim, d, lanes, accepted_so_far, with_events)
        hp_mode = with_events and "prehp" in d

        if self._emitter.available and not hp_mode:
            return self._write_native(sim, d, lanes, accepted_so_far, with_events)
        if self._emitter.available and hp_mode:
            # records via the native emitter, log via the pre-hp python path
            n = self._write_native(sim, d, lanes, accepted_so_far, with_events=False)
            self._log_hp_batch(sim, d, lanes, accepted_so_far)
            return n

        reads = d["read"]
        quals = d.get("quals")
        total = d["total"]
        head = d["head"]
        tail = d["tail"]
        middle_ref = d["middle_ref"]
        l_new = d["l_new"]
        chrom = d["chrom"]
        pos = d["pos"]
        rev = d["rev"]
        names = sim.genome_host.names

        if with_events:
            ev_pos2x = d["ev_pos2x"]
            ev_type = d["ev_type"]
            ev_len = d["ev_len"]
            ev_valid = d["ev_valid"]
            keys_all, rpos_all, ev_len = event_read_positions(ev_pos2x, ev_type, ev_len, ev_valid)

        for rank, b in enumerate(lanes):
            idx = accepted_so_far + rank
            strand = "R" if rev[b] else "F"
            kind = "perfect" if self.perfect else "aligned"
            name = (
                f"{names[chrom[b]]}_{pos[b]}_{kind}_{idx}_{strand}"
                f"_{head[b]}_{middle_ref[b]}_{tail[b]}"
            )
            seq = reads[b, : total[b]]
            self.fastx.write(name, seq, quals[b, : total[b]] if sim.fastq else None)

            if with_events:
                self._log_lane(
                    sim, name, b, head[b], total[b], l_new[b], rev[b],
                    chrom[b], pos[b], reads[b],
                    ev_valid[b], ev_type[b], ev_len[b], keys_all[b], rpos_all[b],
                )
        return len(lanes)

    def _lane_names(self, sim, cb, lanes, accepted_so_far: int):
        names = []
        gnames = sim.genome_host.names
        kind = "perfect" if self.perfect else "aligned"
        chrom = cb.chrom
        pos = cb.pos
        rev = cb.rev
        head = cb.head
        middle_ref = cb.middle_ref
        tail = cb.tail
        for rank, b in enumerate(lanes):
            idx = accepted_so_far + rank
            strand = "R" if rev[b] else "F"
            names.append(
                f"{gnames[chrom[b]]}_{pos[b]}_{kind}_{idx}_{strand}"
                f"_{head[b]}_{middle_ref[b]}_{tail[b]}"
            )
        return names

    def _write_flat(self, sim, cb, lanes, accepted_so_far: int, with_events: bool) -> int:
        """Emit a compacted batch (2-bit flat reads + packed events; or a
        meta-only batch whose read bytes are reconstructed host-side)."""
        fin = getattr(cb, "finish", None)
        if fin is not None:
            fin()  # lazy walk replay (idempotent), in the emission worker
        if (cb.reads_flat is None and getattr(sim, "kmer_bias", None) is not None
                and not getattr(sim, "perfect", False)):
            return self._write_flat_hp(sim, cb, lanes, accepted_so_far, with_events)
        g = sim.genome_host
        names = self._lane_names(sim, cb, lanes, accepted_so_far)
        chrom = cb.chrom[lanes]
        recon = cb.reads_flat is None
        if self._emitter.available and (not recon or self._emitter.recon_available):
            emit = self._emitter.emit_recon if recon else self._emitter.emit_flat
            kw = {}
            if recon and sim.fastq:
                q = sim.tables.qual
                kw["qual_table"] = (np.asarray(q.breaks), np.asarray(q.vals))
            fastx_mv, err_mv = emit(
                cb, np.asarray(lanes, np.int64), names,
                g_off=g.offsets[chrom], g_len=g.lengths[chrom],
                g_circ=np.ascontiguousarray(g.circular[chrom], np.uint8),
                genome_flat=g.flat, fastq=sim.fastq,
                write_errors=with_events, **kw,
            )
            io = getattr(self, "io_pool", None)
            if io is not None:
                # hand the composed bytes to the io stage (copies out of the
                # emitter's reused buffers; ~3 GB/s warm vs the file write's
                # first-touch fault cost, which then overlaps the next emit)
                fdata = bytes(fastx_mv)
                edata = bytes(err_mv) if (with_events and self.error_log is not None) else None

                def do_io(fdata=fdata, edata=edata):
                    self.fastx.flush()
                    self.fastx.f.write(fdata)
                    if edata is not None:
                        self.error_log.write_bytes(edata)

                io.submit(do_io)
                return len(lanes)
            self.fastx.flush()
            self.fastx.f.write(fastx_mv)
            if with_events and self.error_log is not None:
                self.error_log.write_bytes(err_mv)
            return len(lanes)

        # pure-python fallback (native emitter unavailable)
        from . import compact as _c

        io = getattr(self, "io_pool", None)
        if io is not None:
            io.drain()  # keep file-write ordering with the io stage
        recon_quals = None
        if recon:
            from .reconstruct import reconstruct_batch

            seed, stream, ht_cap = cb.recon
            qt = None
            if sim.fastq:
                qd = sim.tables.qual
                qt = (np.asarray(qd.breaks), np.asarray(qd.vals))
            out = reconstruct_batch(cb, lanes, g, seed, stream, ht_cap, qual_table=qt)
            if sim.fastq:
                reads = [r for r, _ in out]
                recon_quals = [q for _, q in out]
            else:
                reads = out
        else:
            reads = _c.decode_reads_ascii(cb, lanes)
        for rank, b in enumerate(lanes):
            name = names[rank]
            seq = reads[rank]
            q = None
            if sim.fastq:
                if recon_quals is not None:
                    q = recon_quals[rank]
                else:
                    o = int(cb.qual_off[b])
                    q = cb.quals_flat[o : o + int(cb.total[b])]
            self.fastx.write(name, seq, q)
            if with_events:
                ne = int(cb.n_events[b])
                if ne == 0:
                    continue
                o = int(cb.ev_off[b])
                w = cb.ev_flat[o : o + ne]
                ev_pos2x = (w & np.uint32(0x1FFFF)).astype(np.int64)[None, :]
                ev_type = (w >> np.uint32(30)).astype(np.int64)[None, :]
                ev_len = ((w >> np.uint32(17)) & np.uint32(0x1FFF)).astype(np.int64)[None, :]
                keys, rpos, ev_len = event_read_positions(
                    ev_pos2x, ev_type, ev_len, np.ones((1, ne), bool)
                )
                self._log_lane(
                    sim, name, 0, int(cb.head[b]), int(cb.total[b]),
                    int(cb.l_new[b]), bool(cb.rev[b]), int(cb.chrom[b]),
                    int(cb.pos[b]), seq,
                    np.ones(ne, bool), ev_type[0], ev_len[0], keys[0], rpos[0],
                )
        return len(lanes)

    def _write_flat_hp(self, sim, cb, lanes, accepted_so_far: int,
                       with_events: bool) -> int:
        """Emit a meta-only -hp batch: suppression, pass-1 mutation, exact
        run resizing and the pre-resize ground-truth log all replay host-side
        (sim/reconstruct.reconstruct_hp_lane is the spec; the native
        emit_batch_recon_hp mirrors it)."""
        g = sim.genome_host
        names = self._lane_names(sim, cb, lanes, accepted_so_far)
        seed, stream, ht_cap = cb.recon
        qt = None
        if sim.fastq:
            qd = sim.tables.qual
            qt = (np.asarray(qd.breaks), np.asarray(qd.vals))
        hp_tab = (np.asarray(sim.tables.hp_breaks), np.asarray(sim.tables.hp_vals))
        write_errors = with_events and self.error_log is not None
        chrom = cb.chrom[lanes]

        if self._emitter.available and getattr(self._emitter, "recon_hp_available", False):
            fastx_mv, err_mv = self._emitter.emit_recon_hp(
                cb, np.asarray(lanes, np.int64), names,
                g_off=g.offsets[chrom], g_len=g.lengths[chrom],
                genome_flat=g.flat, fastq=sim.fastq,
                write_errors=write_errors, k=sim.kmer_bias,
                hp_tab=hp_tab, hp_mis_rate=sim.tables.hp_mis_rate,
                l_cap=sim.l_cap, qual_table=qt,
            )
            io = getattr(self, "io_pool", None)
            if io is not None:
                fdata = bytes(fastx_mv)
                edata = bytes(err_mv) if write_errors else None

                def do_io(fdata=fdata, edata=edata):
                    self.fastx.flush()
                    self.fastx.f.write(fdata)
                    if edata is not None:
                        self.error_log.write_bytes(edata)

                io.submit(do_io)
                return len(lanes)
            self.fastx.flush()
            self.fastx.f.write(fastx_mv)
            if write_errors:
                self.error_log.write_bytes(err_mv)
            return len(lanes)

        from .reconstruct import reconstruct_hp_batch

        io = getattr(self, "io_pool", None)
        if io is not None:
            io.drain()
        recs = reconstruct_hp_batch(
            cb, lanes, g, seed, stream, ht_cap, sim.kmer_bias, hp_tab,
            sim.tables.hp_mis_rate, sim.l_cap, qual_table=qt,
        )
        for rank, b in enumerate(lanes):
            r = recs[rank]
            self.fastx.write(names[rank], r["read"],
                             r["quals"] if sim.fastq else None)
            if not write_errors:
                continue
            lk, lt_, ll, lr = r["log"]
            if len(lk) == 0:
                continue
            mid1 = r["mid1"]
            goff = g.offsets[cb.chrom[b]]
            spos = int(cb.pos[b])
            refs, seqs, tnames = [], [], []
            for kk, t, ln, rp in zip(lk, lt_, ll, lr):
                if t == 1:
                    refs.append("-" * ln)
                    seqs.append(mid1[rp : rp + ln].tobytes().decode())
                else:
                    st = spos + kk
                    refs.append(g.flat[goff + st : goff + st + ln].tobytes().decode())
                    seqs.append(mid1[rp : rp + ln].tobytes().decode() if t == 0 else "-" * ln)
                tnames.append(_ETYPE_NAMES[t])
            self.error_log.write_read_events(names[rank], lk, tnames, ll, refs, seqs)
        return len(lanes)

    def _log_hp_batch(self, sim, d, lanes, accepted_so_far: int):
        """Pre-hp ground-truth log (mid rows are direct pass-1 buffers)."""
        keys_all, rpos_all, eff_len_all = event_read_positions(
            d["ev_pos2x"], d["ev_type"], d["ev_len"], d["ev_valid"]
        )
        g = sim.genome_host
        names = g.names
        for rank, b in enumerate(lanes):
            idx = accepted_so_far + rank
            strand = "R" if d["rev"][b] else "F"
            name = (
                f"{names[d['chrom'][b]]}_{d['pos'][b]}_aligned_{idx}_{strand}"
                f"_{d['head'][b]}_{d['middle_ref'][b]}_{d['tail'][b]}"
            )
            ne = int(d["n_events"][b])
            if ne == 0:
                continue
            mid = d["prehp"][b]
            goff = g.offsets[d["chrom"][b]]
            glen = g.lengths[d["chrom"][b]]
            circ = bool(g.circular[d["chrom"][b]])
            spos = d["pos"][b]
            keys_v = keys_all[b, :ne]
            types_v = d["ev_type"][b, :ne]
            lens_v = eff_len_all[b, :ne]
            rpos_v = rpos_all[b, :ne]
            refs, seqs, tnames = [], [], []
            keep = lens_v > 0
            keys_v, types_v, lens_v, rpos_v = (
                keys_v[keep], types_v[keep], lens_v[keep], rpos_v[keep]
            )
            for k, t, ln, rp in zip(keys_v, types_v, lens_v, rpos_v):
                if t == 1:
                    refs.append("-" * ln)
                    seqs.append(mid[rp : rp + ln].tobytes().decode())
                else:
                    st = spos + k
                    if circ:
                        idxs = (np.arange(st, st + ln) % glen) + goff
                        refs.append(g.flat[idxs].tobytes().decode())
                    else:
                        refs.append(g.flat[goff + st : goff + st + ln].tobytes().decode())
                    seqs.append(mid[rp : rp + ln].tobytes().decode() if t == 0 else "-" * ln)
                tnames.append(_ETYPE_NAMES[t])
            self.error_log.write_read_events(name, keys_v, tnames, lens_v, refs, seqs)

    def write_entries(self, sim, entries, accepted_so_far: int, quota: int) -> int:
        """Emit a slot-ordered list of (slot, fetched-dict, lane) entries.

        Bucketed scheduling interleaves lanes from several fetched batches in
        slot order; emitting them via per-run calls fragments into hundreds
        of tiny native-emitter invocations (each re-marshaling whole [B, E]
        arrays).  Here the accepted rows are first staged into contiguous
        arrays (vectorized scatter per source dict), then formatted in ONE
        emitter call."""
        k = min(len(entries), quota - accepted_so_far)
        if k <= 0:
            return 0
        entries = entries[:k]
        with_events = self.error_log is not None and not self.perfect
        hp_mode = with_events and "prehp" in entries[0][1]
        if (not self._emitter.available or hp_mode
                or hasattr(entries[0][1], "reads_flat")):
            # grouped write_run calls (CompactBatch entries emit per
            # contiguous same-batch group through the flat emitter)
            n = 0
            i = 0
            while i < len(entries):
                j = i
                d = entries[i][1]
                lanes = []
                while j < len(entries) and entries[j][1] is d:
                    lanes.append(entries[j][2])
                    j += 1
                n += self.write_run(
                    sim, d, np.asarray(lanes, np.int64), accepted_so_far + n
                )
                i = j
            return n

        dicts = []
        dmap = {}
        drow = np.empty(k, np.int32)
        dlane = np.empty(k, np.int64)
        for p, (s, d, lane) in enumerate(entries):
            i = dmap.get(id(d))
            if i is None:
                i = dmap[id(d)] = len(dicts)
                dicts.append(d)
            drow[p] = i
            dlane[p] = lane

        Lmax = max(d["read"].shape[1] for d in dicts)
        reads = np.zeros((k, Lmax), np.uint8)
        quals = np.zeros((k, Lmax), np.uint8) if sim.fastq else None
        kmax = max(d["ev_pos2x"].shape[1] for d in dicts) if with_events else 1
        ev_p = np.zeros((k, kmax), np.int32)
        ev_t = np.zeros((k, kmax), np.int32)
        ev_l = np.zeros((k, kmax), np.int32)
        scalars = {
            name: np.empty(k, np.int64)
            for name in ("total", "head", "tail", "middle_ref", "l_new", "chrom",
                         "pos", "n_events")
        }
        rev = np.empty(k, bool)
        for di, d in enumerate(dicts):
            pos = np.nonzero(drow == di)[0]
            lanes = dlane[pos]
            L = d["read"].shape[1]
            reads[pos[:, None], np.arange(L)[None, :]] = d["read"][lanes]
            if quals is not None:
                quals[pos[:, None], np.arange(L)[None, :]] = d["quals"][lanes]
            if with_events:
                ke = d["ev_pos2x"].shape[1]
                cols = np.arange(ke)[None, :]
                ev_p[pos[:, None], cols] = d["ev_pos2x"][lanes]
                ev_t[pos[:, None], cols] = d["ev_type"][lanes]
                ev_l[pos[:, None], cols] = d["ev_len"][lanes]
            for name in scalars:
                scalars[name][pos] = d[name][lanes]
            rev[pos] = d["rev"][lanes]

        g = sim.genome_host
        chrom = scalars["chrom"]
        names = []
        kind = "perfect" if self.perfect else "aligned"
        gnames = g.names
        for r in range(k):
            idx = accepted_so_far + r
            strand = "R" if rev[r] else "F"
            names.append(
                f"{gnames[chrom[r]]}_{scalars['pos'][r]}_{kind}_{idx}_{strand}"
                f"_{scalars['head'][r]}_{scalars['middle_ref'][r]}_{scalars['tail'][r]}"
            )
        fastx_bytes, err_bytes = self._emitter.emit(
            reads=reads,
            quals=quals,
            lanes=np.arange(k, dtype=np.int64),
            names=names,
            total_len=scalars["total"],
            head=scalars["head"],
            l_new=scalars["l_new"],
            rev=rev,
            ev_pos2x=ev_p if with_events else None,
            ev_type=ev_t if with_events else None,
            ev_len=ev_l if with_events else None,
            n_events=scalars["n_events"] if with_events else np.zeros(k, np.int64),
            g_off=g.offsets[chrom],
            g_len=g.lengths[chrom],
            g_circ=np.ascontiguousarray(g.circular[chrom], np.uint8),
            start_pos=scalars["pos"],
            genome_flat=g.flat,
            fastq=sim.fastq,
            write_errors=with_events,
        )
        self.fastx.flush()
        self.fastx.f.write(fastx_bytes)
        if with_events and self.error_log is not None:
            self.error_log.write_bytes(err_bytes)
        return k

    def _write_native(self, sim, d, lanes, accepted_so_far: int, with_events: bool) -> int:
        """Format the whole accepted batch through the C++ emitter."""
        g = sim.genome_host
        chrom = d["chrom"][lanes]
        pos = d["pos"][lanes]
        rev = d["rev"][lanes]
        head = d["head"][lanes]
        middle_ref = d["middle_ref"][lanes]
        tail = d["tail"][lanes]
        names = []
        kind = "perfect" if self.perfect else "aligned"
        gnames = g.names
        for rank in range(len(lanes)):
            idx = accepted_so_far + rank
            strand = "R" if rev[rank] else "F"
            names.append(
                f"{gnames[chrom[rank]]}_{pos[rank]}_{kind}_{idx}_{strand}"
                f"_{head[rank]}_{middle_ref[rank]}_{tail[rank]}"
            )
        n_events = (
            d["n_events"][lanes] if with_events else np.zeros(len(lanes), np.int64)
        )
        fastx_bytes, err_bytes = self._emitter.emit(
            reads=d["read"],
            quals=d.get("quals"),
            lanes=lanes.astype(np.int64),
            names=names,
            total_len=d["total"][lanes],
            head=head,
            l_new=d["l_new"][lanes],
            rev=rev,
            ev_pos2x=d.get("ev_pos2x"),
            ev_type=d.get("ev_type"),
            ev_len=d.get("ev_len"),
            n_events=n_events,
            g_off=g.offsets[chrom],
            g_len=g.lengths[chrom],
            g_circ=np.ascontiguousarray(g.circular[chrom], np.uint8),
            start_pos=pos,
            genome_flat=g.flat,
            fastq=sim.fastq,
            write_errors=with_events,
        )
        self.fastx.flush()
        self.fastx.f.write(fastx_bytes)
        if with_events and self.error_log is not None:
            self.error_log.write_bytes(err_bytes)
        return len(lanes)

    def _log_lane(
        self, sim, name, b, head, total, l_new, rev, chrom, pos, read_row,
        evv, evt, evl, keys, rpos,
    ):
        n_ev = int(evv.sum())
        if n_ev == 0:
            return
        # middle segment in pre-reverse orientation
        seq = read_row[:total]
        if rev:
            seq = _COMP_LUT[seq[::-1]]
        mid = seq[head : head + l_new]

        g = sim.genome_host
        goff = g.offsets[chrom]
        glen = g.lengths[chrom]
        flat = g.flat
        keys_v = keys[evv][:n_ev]
        types_v = evt[evv][:n_ev]
        lens_v = evl[evv][:n_ev]
        rpos_v = rpos[evv][:n_ev]

        refs, seqs, tnames = [], [], []
        keep = lens_v > 0  # hp-suppressed events carry zero length
        keys_v, types_v, lens_v, rpos_v = (
            keys_v[keep], types_v[keep], lens_v[keep], rpos_v[keep]
        )
        for k, t, ln, rp in zip(keys_v, types_v, lens_v, rpos_v):
            if t == 1:  # ins
                refs.append("-" * ln)
                seqs.append(mid[rp : rp + ln].tobytes().decode())
            else:
                s = pos + k
                if bool(g.circular[chrom]):
                    idxs = (np.arange(s, s + ln) % glen) + goff
                    ref_b = flat[idxs].tobytes().decode()
                else:
                    ref_b = flat[goff + s : goff + s + ln].tobytes().decode()
                refs.append(ref_b)
                if t == 0:  # mis
                    seqs.append(mid[rp : rp + ln].tobytes().decode())
                else:  # del
                    seqs.append("-" * ln)
            tnames.append(_ETYPE_NAMES[t])
        self.error_log.write_read_events(name, keys_v, tnames, lens_v, refs, seqs)


def _quant(x: int, step: int, hi: int) -> int:
    return int(min(-(-max(x, 1) // step) * step, hi))


class PrefetchHandle:
    """A dispatched batch plus its already-queued pack programs."""

    def __init__(self, fetcher, out, meta_dev, wide_dev, sizes):
        self.fetcher = fetcher
        self.out = out
        self.meta_dev = meta_dev
        self.wide_dev = wide_dev
        self.sizes = sizes  # (lt, k, lp) the wide pack was built with

    def fetch(self) -> dict:
        return self.fetcher._fetch(self)


class PipelinedFetcher:
    """Eager-dispatch batch fetcher.

    `fetch_batch` picks the wide-transfer widths from the batch's own maxima,
    which forces the pack programs to be dispatched only after the metadata
    round trip — by which point the NEXT batch's program is already queued on
    the device stream, so every fetch waits a full extra program. This
    fetcher instead locks widths after the first batch (with margin,
    quantized) and dispatches the pack programs immediately after the batch
    program, letting their transfers overlap the next program's compute.
    Batches that exceed the locked widths fall back to an on-demand pack
    (rare; widths are bumped for subsequent batches).
    """

    MARGIN = 1.2

    def __init__(self, fastq: bool, with_events: bool, with_prehp: bool = False,
                 pack_reads: bool = True):
        global _FETCH
        if _FETCH is None:
            _FETCH = _DeviceFetch()
        self.fastq = fastq
        self.with_events = with_events
        self.with_prehp = with_prehp
        self.pack_reads = pack_reads
        self.lt = None
        self.k = None
        self.lp = None

    def _dispatch_wide(self, out, lt, k, lp):
        import numpy as _np

        B = out.read.shape[0]
        pack_ev = out.read.shape[1] < (1 << 16)
        fn = _FETCH.pack_wide(k, lt, self.fastq, self.pack_reads, lp, pack_ev)
        return fn(
            out.ev_pos2x if self.with_events else _np.zeros((B, 1), _np.int32),
            out.ev_type if self.with_events else _np.zeros((B, 1), _np.int32),
            out.ev_len if self.with_events else _np.zeros((B, 1), _np.int32),
            out.read,
            out.quals if self.fastq else _np.zeros((B, 1), _np.uint8),
            out.read_prehp if self.with_prehp else _np.zeros((B, 4), _np.uint8),
        )

    def dispatch(self, out) -> PrefetchHandle:
        meta_dev = _FETCH.pack_meta(
            out.valid, out.total_len, out.head, out.tail, out.middle_ref,
            out.l_new, out.chrom, out.local_pos, out.is_reversed, out.n_events,
            getattr(out, "capacity_overflow", out.valid),
        )
        wide_dev = None
        sizes = None
        if self.lt is not None:
            sizes = (self.lt, self.k, self.lp)
            wide_dev = self._dispatch_wide(out, *sizes)
        return PrefetchHandle(self, out, meta_dev, wide_dev, sizes)

    def _choose(self, out, mt, mn, ml):
        l_out = out.read.shape[1]
        self.lt = _quant(int(mt * self.MARGIN), 2048, l_out)
        if self.with_events:
            e_cap = out.ev_pos2x.shape[1]
            self.k = _quant(int(mn * self.MARGIN) or 1, 256, e_cap)
        else:
            self.k = 0
        if self.with_prehp:
            self.lp = _quant(int(ml * self.MARGIN) + 64, 2048, out.read_prehp.shape[1])
        else:
            self.lp = 0

    def _fetch(self, h: PrefetchHandle) -> dict:
        meta = np.asarray(h.meta_dev)
        sizes_row = meta[-1]
        meta = meta[:-1]
        d = _meta_dict(meta)
        mt, mn, ml = int(sizes_row[0]), int(sizes_row[1]), int(sizes_row[2])
        out = h.out
        wide_dev, sizes = h.wide_dev, h.sizes
        if (
            wide_dev is None
            or mt > sizes[0]
            or (self.with_events and mn > sizes[1])
            or (self.with_prehp and ml + 64 > sizes[2])
        ):
            self._choose(out, mt, mn, ml)
            sizes = (self.lt, self.k, self.lp)
            wide_dev = self._dispatch_wide(out, *sizes)
        wide = np.asarray(wide_dev)
        lt, k, lp = sizes
        pack_ev = out.read.shape[1] < (1 << 16)
        _decode_wide(d, wide, lt, k if self.with_events else 0, lp,
                     self.fastq, self.pack_reads, pack_ev)
        d["slots"] = getattr(h, "slots", None)
        return d


class CompactHandle:
    """A dispatched batch plus its queued device-compaction program."""

    def __init__(self, fetcher, out, buf_dev, caps):
        self.fetcher = fetcher
        self.out = out
        self.buf_dev = buf_dev
        self.caps = caps

    def fetch(self):
        return self.fetcher._fetch(self)


class CompactFetcher:
    """Single-round-trip batch fetcher via device-side compaction.

    The padded-layout fetch (PipelinedFetcher) transfers quantized maximum
    widths for every lane; this one transfers only the valid lanes' used
    bytes (2-bit reads, packed u32 events) chunk-aligned, with metadata fused
    into the same uint8 buffer — one np.asarray per batch.  Capacities are
    estimated from profile statistics and bumped (with a repack) on the rare
    batch that overflows.
    """

    # first batch: generous margin (estimates only); then lock to the
    # observed need + LOCKED_MARGIN (batch sums concentrate hard: the std of
    # sum-of-chunks over B lanes is well under 1%)
    FIRST_MARGIN = 1.35
    LOCKED_MARGIN = 1.06

    def __init__(self, fastq: bool, with_events: bool, batch: int,
                 est_bases: float, est_events: float, pack_reads: bool = True,
                 replayer=None, with_reads: bool = True, recon_info=None,
                 lazy_replay: bool = False):
        from . import compact as _c

        self._c = _c
        self.fastq = fastq
        self.with_events = with_events
        self.pack_reads = pack_reads
        # with a walk replayer, events are REGENERATED host-side and verified
        # against the device checksum — the event stream stays off the link.
        # with_reads=False additionally drops the read payload: the host
        # RECONSTRUCTS the bytes (sim/reconstruct.py) from the replayed
        # events + genome + counter RNG; recon_info = (seed, stream, ht_cap).
        self.replayer = replayer if (replayer is not None
                                     and replayer.available) else None
        self.with_reads = with_reads or self.replayer is None
        self.recon_info = recon_info
        self.transfer_events = with_events and self.replayer is None
        # reconstruction regenerates FASTQ qualities host-side too, so the
        # qual stream only crosses the link when the read bytes do
        self.transfer_quals = fastq and self.with_reads
        # lazy_replay: defer the host walk replay from the fetch (critical
        # path of the accept loop) to an idempotent cb.finish() the emission
        # worker calls — the replay's CPU then overlaps the next batch
        self.lazy_replay = lazy_replay
        self._locked = False
        B = batch
        ch = _c.CHUNK
        rb = (est_bases / 4.0 if pack_reads else est_bases)
        self.nr_cap = (self._tier(int(B * (rb / ch + 1) * self.FIRST_MARGIN))
                       if self.with_reads else 1)
        self.ne_cap = (
            self._tier(int(B * (est_events * 4.0 / ch + 1) * self.FIRST_MARGIN))
            if with_events else 1
        )
        self.nq_cap = (
            self._tier(int(B * (est_bases / ch + 1) * self.FIRST_MARGIN))
            if self.transfer_quals else 1
        )

    @staticmethod
    def _tier(n: int) -> int:
        """Round capacities up to 256-chunk steps (bounds recompiles while
        keeping the transferred buffer tight)."""
        return max(256, -(-n // 256) * 256)

    def _lock(self, need_r, need_e, need_q):
        """Shrink capacities to the first observed batch's need (the full
        capacity is what crosses the link, so slack = wasted bandwidth)."""
        if self.with_reads:
            self.nr_cap = self._tier(int(need_r * self.LOCKED_MARGIN) + 1)
        if self.transfer_events:
            self.ne_cap = self._tier(int(need_e * self.LOCKED_MARGIN) + 1)
        if self.transfer_quals:
            self.nq_cap = self._tier(int(need_q * self.LOCKED_MARGIN) + 1)
        self._locked = True

    def _dispatch(self, out, force_events: bool = False):
        transfer_events = self.transfer_events or force_events
        caps = (self.nr_cap, self.ne_cap if transfer_events else 1, self.nq_cap)
        buf = self._c.compact_pack(
            out.read, out.quals, out.valid, out.total_len, out.head, out.tail,
            out.middle_ref, out.l_new, out.chrom, out.local_pos,
            out.is_reversed, out.n_events,
            getattr(out, "capacity_overflow", out.valid),
            out.ev_pos2x, out.ev_type, out.ev_len,
            getattr(out, "m_ref_init", None),
            nr_cap=caps[0], ne_cap=caps[1], nq_cap=caps[2],
            fastq=self.transfer_quals, with_events=transfer_events,
            pack_reads=self.pack_reads,
            with_checksum=self.replayer is not None and not force_events,
            with_reads=self.with_reads,
        )
        return buf, caps

    def dispatch(self, out) -> CompactHandle:
        buf, caps = self._dispatch(out)
        return CompactHandle(self, out, buf, caps)

    def _fetch(self, h: CompactHandle):
        buf = np.asarray(h.buf_dev)
        B = h.out.read.shape[0]
        caps = h.caps
        cb, ok = self._c.decode_compact(
            buf, B, caps[0], caps[1], caps[2], self.transfer_quals,
            self.transfer_events, self.pack_reads, self.with_reads,
        )
        if not ok:
            need_r, need_e, need_q = cb
            if self.with_reads:
                self.nr_cap = max(self.nr_cap, self._tier(int(need_r * 1.1) + 1))
            if self.transfer_events:
                self.ne_cap = max(self.ne_cap, self._tier(int(need_e * 1.1) + 1))
            if self.transfer_quals:
                self.nq_cap = max(self.nq_cap, self._tier(int(need_q * 1.1) + 1))
            self._locked = True
            buf_dev, caps = self._dispatch(h.out)
            cb, ok = self._c.decode_compact(
                np.asarray(buf_dev), B, caps[0], caps[1], caps[2],
                self.transfer_quals, self.transfer_events, self.pack_reads,
                self.with_reads,
            )
            assert ok, "compaction overflow after capacity bump"
        elif not self._locked:
            self._lock(*cb.needs)
        cb.slots = getattr(h, "slots", None)
        if not self.with_reads:
            cb.recon = self.recon_info
        if self.replayer is not None:
            if self.lazy_replay:
                done = []

                def finish(fetcher=self, handle=h, batch=cb):
                    if not done:
                        fetcher._replay_events(handle, batch)
                        done.append(True)

                cb.finish = finish
            else:
                self._replay_events(h, cb)
        return cb

    def _replay_events(self, h: CompactHandle, cb):
        """Regenerate event lists host-side; fall back to an exact device
        fetch for any lane failing checksum verification."""
        _c = self._c
        B = len(cb.valid)
        v = cb.valid & ~cb.cap_over
        ev_bytes = np.where(v, 4 * cb.n_events, 0)
        ch = -(-ev_bytes // _c.CHUNK)
        off_words = (np.cumsum(ch) - ch) * (_c.CHUNK // 4)
        total_words = int(ch.sum()) * (_c.CHUNK // 4)
        ev_out = np.zeros(max(total_words, 1), np.uint32)
        okl = self.replayer.replay(
            h.slots, v.astype(np.uint8), cb.m_ref, cb.n_events,
            cb.ev_checksum, ev_out, off_words,
        )
        if bool((okl | ~v).all()):
            cb.ev_flat = ev_out
            cb.ev_off = off_words
            return
        # rare exact fallback: pull the device's own event stream
        for _ in range(3):
            buf_dev, caps = self._dispatch(h.out, force_events=True)
            cb2, ok = _c.decode_compact(
                np.asarray(buf_dev), B, caps[0], caps[1], caps[2],
                self.transfer_quals, True, self.pack_reads, self.with_reads,
            )
            if ok:
                cb.ev_flat = cb2.ev_flat
                cb.ev_off = cb2.ev_off
                return
            self.ne_cap = max(self.ne_cap, self._tier(int(cb2[1] * 1.15) + 1))
        raise RuntimeError("event fallback transfer kept overflowing")


class _OrderedIO:
    """Single-thread ordered file-write stage (the second pipeline stage
    behind the emit worker): composing the batch's bytes and writing them to
    the filesystem then overlap batch-to-batch."""

    def __init__(self, depth: int = 4):
        import queue
        import threading

        self._q = queue.Queue(maxsize=depth)
        self.exc = None
        self._t = threading.Thread(target=self._worker, daemon=True)
        self._t.start()

    def _worker(self):
        while True:
            fn = self._q.get()
            if fn is None:
                return
            try:
                if self.exc is None:
                    fn()
            except BaseException as e:
                self.exc = e
            finally:
                self._q.task_done()

    def submit(self, fn):
        if self.exc is not None:
            raise self.exc
        self._q.put(fn)

    def drain(self):
        self._q.join()
        if self.exc is not None:
            raise self.exc

    def close(self):
        self.drain()
        self._q.put(None)
        self._t.join()


class AsyncBatchWriter:
    """Pipelined wrapper around a batch writer.

    `write_batch` fetches the batch (device->host transfer) and counts the
    accepted lanes synchronously — the accept loop needs the count to track
    its quota — but hands the expensive formatting + file IO to a single
    worker thread (the C++ emitter and file writes run outside the GIL, so
    they overlap the next batch's transfers).  Queue depth is bounded so
    host memory stays flat; writes happen in submission order, keeping the
    output byte-identical to the synchronous path.

    A second `_OrderedIO` stage takes the file writes off the emit worker
    (writers that support it submit their composed bytes to `io_pool`), so
    walk replay + emission overlap the previous batch's first-touch page
    faults — the dominant host cost on memory-throttled VMs.
    """

    def __init__(self, inner, depth: int = 2):
        import queue
        import threading

        self.inner = inner
        self.error_log = getattr(inner, "error_log", None)
        self.perfect = getattr(inner, "perfect", False)
        self._q = queue.Queue(maxsize=depth)
        self._exc = None
        self._io = _OrderedIO()
        if hasattr(inner, "_write_flat"):
            inner.io_pool = self._io
        self._t = threading.Thread(target=self._worker, daemon=True)
        self._t.start()

    def enqueue_task(self, fn):
        """Run `fn` AFTER all previously queued writes have reached the
        FILES (resume-state checkpoints must not outrun them): enqueue a
        forwarding task so it lands on the io stage behind this batch's
        writes."""
        self._q.put(("task", lambda: self._io.submit(fn)))

    def _worker(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            try:
                if self._exc is None:
                    if item[0] == "task":
                        item[1]()
                    elif item[0] == "entries":
                        _, sim, entries, start = item
                        self.inner.write_entries(sim, entries, start, start + len(entries))
                    else:
                        _, sim, d, lanes, start = item
                        self.inner.write_run(sim, d, lanes, start)
            except BaseException as e:  # surfaced on the producer side
                self._exc = e
            finally:
                self._q.task_done()

    def write_batch(self, sim, out, accepted_so_far: int, quota: int) -> int:
        if self._exc is not None:
            raise self._exc
        with_events = self.error_log is not None and not self.perfect
        hp_mode = with_events and getattr(sim, "kmer_bias", None) is not None
        if hasattr(out, "fetch"):
            d = out.fetch()
        else:
            d = fetch_batch(out, sim.fastq, with_events, with_prehp=hp_mode)
        lanes = np.nonzero(d["valid"])[0][: quota - accepted_so_far]
        if len(lanes):
            self._q.put(("run", sim, d, lanes, accepted_so_far))
        return len(lanes)

    def write_run(self, sim, d, lanes, accepted_so_far: int) -> int:
        if self._exc is not None:
            raise self._exc
        if len(lanes):
            self._q.put(("run", sim, d, lanes, accepted_so_far))
        return len(lanes)

    def write_entries(self, sim, entries, accepted_so_far: int, quota: int) -> int:
        if self._exc is not None:
            raise self._exc
        k = min(len(entries), quota - accepted_so_far)
        if k > 0:
            self._q.put(("entries", sim, entries[:k], accepted_so_far))
        return max(k, 0)

    def drain(self):
        self._q.join()
        self._io.drain()
        if self._exc is not None:
            raise self._exc

    def close(self):
        self.drain()
        self._q.put(None)
        self._t.join()
        self._io.close()
        if getattr(self.inner, "io_pool", None) is self._io:
            self.inner.io_pool = None


def merge_files(out_path: str, parts, header: str = ""):
    """Concatenate per-worker/host subfiles (simulator.py:1626-1639)."""
    with open(out_path, "wb") as out:
        if header:
            out.write(header.encode())
        for p in parts:
            with open(p, "rb") as f:
                while True:
                    chunk = f.read(8 << 20)
                    if not chunk:
                        break
                    out.write(chunk)


class ChimericBatchWriter:
    """Accept/number/emit a chimeric batch (genome or metagenome).

    Names: ';'-joined per-segment `<chrom>_<pos>` components (metagenome
    interleaves `gap_<len>` components), `_chimeric` marker when > 1 segment,
    middle lengths joined with ';' (simulator.py:1390-1402, 966-984).
    """

    def __init__(self, fastx: FastxWriter, error_log=None, species_names=None,
                 species_of_chrom=None, metagenome: bool = False, perfect: bool = False):
        self.fastx = fastx
        self.error_log = error_log
        self.species_names = species_names
        self.species_of_chrom = species_of_chrom
        self.metagenome = metagenome
        self.perfect = perfect
        # base-level quota feedback for metagenome abundance accounting
        self.species_bases = None
        from ..io.native import NativeEmitter

        self._emitter = NativeEmitter()

    def prepare_recon_chimeric(self, sim, h, accepted_so_far: int, quota: int):
        """Decode a meta-only chimeric batch, select its accepted lanes, and
        advance the species-quota feedback — the cheap sequential head of a
        batch.  The expensive replay+emit (`_write_recon_chimeric` with
        `prepared=`) can then run AFTER the next batch has been assigned and
        dispatched, overlapping host emission with device compute."""
        from .chimeric_mode import decode_chimeric_meta

        S = sim.s_max
        meta = np.asarray(h.meta_dev)
        d = decode_chimeric_meta(meta, S)
        if d["spill"].any():
            RUN_STATS.packed_spills += 1
            meta = sim.chimeric_meta_unpacked(h.slots, h.seed, h.species)
            d = decode_chimeric_meta(meta, S)
        lanes = np.nonzero(d["valid"])[0][: quota - accepted_so_far]
        self._advance_species_quota(d, lanes)
        return {"d": d, "lanes": lanes, "start": accepted_so_far}

    def _advance_species_quota(self, d, lanes):
        if self.species_bases is None or len(lanes) == 0:
            return
        S = d["chrom"].shape[1]
        n_seg_l = d["n_seg"][lanes]
        chrom_l = d["chrom"][lanes]
        sp_rs = np.asarray(self.species_of_chrom)[chrom_l]
        seg_mask = np.arange(S)[None, :] < n_seg_l[:, None]
        np.add.at(self.species_bases, sp_rs[seg_mask],
                  d["seg_mref"][lanes][seg_mask])

    def _write_recon_chimeric(self, sim, h, accepted_so_far: int, quota: int,
                              lanes=None, start=None, prepared=None) -> int:
        """Host-reconstruct + emit a meta-only chimeric batch (genome mode):
        part-keyed C++ walk replays (checksum-verified) + C++ splicing of
        head | segments | gaps | tail."""
        from ..ops import rng as rng_mod
        from .chimeric_mode import decode_chimeric_meta

        S = sim.s_max
        G = max(S - 1, 1)
        quota_done = prepared is not None
        if prepared is not None:
            d = prepared["d"]
            lanes = prepared["lanes"]
            start = prepared["start"]
        else:
            meta = np.asarray(h.meta_dev)
            d = decode_chimeric_meta(meta, S)
            if d["spill"].any():
                # packed lane capacity exceeded (vanishingly rare): identical
                # per-slot results via the unpacked program
                RUN_STATS.packed_spills += 1
                meta = sim.chimeric_meta_unpacked(h.slots, h.seed, h.species)
                d = decode_chimeric_meta(meta, S)
        if lanes is None:
            lanes = np.nonzero(d["valid"])[0][: quota - accepted_so_far]
            start = accepted_so_far
        if len(lanes) == 0:
            return 0
        k = len(lanes)
        slots = np.asarray(h.slots)
        g = sim.genome_host
        names_g = g.names

        names = []
        kind = "perfect" if self.perfect else "aligned"
        for rank, b in enumerate(lanes):
            idx = start + rank
            ns = int(d["n_seg"][b])
            comps = []
            for s in range(ns):
                comp = f"{names_g[d['chrom'][b, s]]}_{d['pos'][b, s]}"
                if self.metagenome and self.species_names is not None:
                    sp = self.species_names[self.species_of_chrom[d["chrom"][b, s]]]
                    comp = f"{sp}-{comp}"
                comps.append(comp)
                if self.metagenome and s < ns - 1:
                    comps.append(f"gap_{d['gap_len'][b, s]}")
            name = ";".join(comps) + f"_{kind}_{idx}"
            if ns > 1:
                name += "_chimeric"
            name += "_R" if d["rev"][b] else "_F"
            mids = ";".join(str(d["seg_mref"][b, s]) for s in range(ns))
            name += f"_{d['head'][b]}_{mids}_{d['tail'][b]}"
            names.append(name)

        n_seg_l = d["n_seg"][lanes]
        seg_do = np.arange(S)[None, :] < n_seg_l[:, None]
        nev_flat = np.where(seg_do, d["n_events"][lanes], 0).reshape(-1)
        off_flat = np.concatenate([[0], np.cumsum(nev_flat)])[:-1]
        ev_out = np.zeros(max(int(nev_flat.sum()), 1), np.uint32)
        ok = sim._seg_replayer.replay(
            np.repeat(slots[lanes], S), seg_do.reshape(-1).astype(np.uint8),
            d["seg_mref_init"][lanes].reshape(-1), nev_flat,
            d["seg_cksum"][lanes].reshape(-1).astype(np.uint32),
            ev_out, off_flat,
            part_ids=np.tile(np.arange(S, dtype=np.int64) + rng_mod.PART_SEGMENT_BASE, k),
        )
        if not bool((ok | ~seg_do.reshape(-1)).all()):
            raise RuntimeError(
                "chimeric segment walk replay failed checksum verification; "
                "set NANOSIM_TPU_RECON=0 to fall back to device materialization"
            )

        gap_do = np.arange(G)[None, :] < (n_seg_l - 1)[:, None]
        gsteps = np.where(gap_do, d["gap_n_steps"][lanes], 0).reshape(-1)
        goff_flat = np.concatenate([[0], np.cumsum(gsteps)])[:-1]
        gev_out = np.zeros(max(int(gsteps.sum()), 1), np.uint32)
        gok = sim._gap_replayer.replay(
            np.repeat(slots[lanes], G), gap_do.reshape(-1).astype(np.uint8),
            d["gap_mref_init"][lanes].reshape(-1), gsteps,
            d["gap_cksum"][lanes].reshape(-1).astype(np.uint32),
            gev_out, goff_flat,
            part_ids=np.tile(np.arange(G, dtype=np.int64) + rng_mod.PART_GAP_BASE, k),
        )
        if not bool((gok | ~gap_do.reshape(-1)).all()):
            raise RuntimeError(
                "chimeric gap walk replay failed checksum verification; "
                "set NANOSIM_TPU_RECON=0 to fall back to device materialization"
            )

        with_events = self.error_log is not None and not self.perfect
        qt = None
        if sim.fastq:
            qd = sim.tables.qual
            qt = (np.asarray(qd.breaks), np.asarray(qd.vals))

        lib = getattr(self._emitter, "lib", None)
        if lib is None or not hasattr(lib, "emit_chimeric_recon"):
            # pure-python fallback (numpy spec, sim/reconstruct.py)
            from .reconstruct import reconstruct_chimeric_lane

            for rank, b in enumerate(lanes):
                ns = int(d["n_seg"][b])
                fr = rank  # flat row base
                segs, gaps = [], []
                for s in range(ns):
                    rs = rank * S + s
                    o, ne = int(off_flat[rs]), int(nev_flat[rs])
                    w = ev_out[o : o + ne]
                    events = (
                        (w & np.uint32(0x1FFFF)).astype(np.int64),
                        (w >> np.uint32(30)).astype(np.int64),
                        ((w >> np.uint32(17)) & np.uint32(0x1FFF)).astype(np.int64),
                    )
                    segs.append((int(d["seg_off"][b, s]), int(d["seg_lnew"][b, s]),
                                 int(d["seg_mref"][b, s]),
                                 int(g.offsets[d["chrom"][b, s]]),
                                 int(d["pos"][b, s]), events))
                for gi in range(ns - 1):
                    rg = rank * G + gi
                    o, nst = int(goff_flat[rg]), int(gsteps[rg])
                    w = gev_out[o : o + nst]
                    steps = (
                        (w & np.uint32(0x1FFFF)).astype(np.int64),
                        (w >> np.uint32(30)).astype(np.int64),
                        ((w >> np.uint32(17)) & np.uint32(0x1FFF)).astype(np.int64),
                    )
                    gaps.append((int(d["seg_off"][b, gi] + d["seg_lnew"][b, gi]),
                                 int(d["gap_len"][b, gi]),
                                 int(d["gap_middle"][b, gi]),
                                 int(g.offsets[np.clip(d["gap_chrom"][b, gi], 0, len(g.offsets) - 1)]),
                                 int(d["gap_pos"][b, gi]), steps))
                rec = dict(head=int(d["head"][b]), tail=int(d["tail"][b]),
                           total=int(d["total"][b]), rev=bool(d["rev"][b]),
                           n_seg=ns, segs=segs, gaps=gaps)
                read, quals, seg_mids = reconstruct_chimeric_lane(
                    g, h.seed, rng_mod.STREAM_ALIGNED, int(slots[lanes][rank]),
                    rec, sim.ht_cap, qual_table=qt,
                )
                self.fastx.write(names[rank], read, quals)
                if not with_events:
                    continue
                for s in range(ns):
                    rs = rank * S + s
                    ne = int(nev_flat[rs])
                    if ne == 0:
                        continue
                    o = int(off_flat[rs])
                    w = ev_out[o : o + ne]
                    px = (w & np.uint32(0x1FFFF)).astype(np.int64)[None, :]
                    ty = (w >> np.uint32(30)).astype(np.int64)[None, :]
                    ln = ((w >> np.uint32(17)) & np.uint32(0x1FFF)).astype(np.int64)[None, :]
                    keys, rpos, eff = event_read_positions(
                        px, ty, ln, np.ones((1, ne), bool))
                    goff = int(g.offsets[d["chrom"][b, s]])
                    spos = int(d["pos"][b, s])
                    mid = seg_mids[s]
                    ks, tn, lv, rf, sq = [], [], [], [], []
                    for e in range(ne - 1, -1, -1):
                        t = int(ty[0, e])
                        l_ = int(eff[0, e])
                        if l_ == 0:
                            continue
                        kk = int(keys[0, e])
                        rp = int(rpos[0, e])
                        ks.append(kk)
                        tn.append(_ETYPE_NAMES[t])
                        lv.append(l_)
                        rf.append("-" * l_ if t == 1 else
                                  g.flat[goff + spos + kk : goff + spos + kk + l_].tobytes().decode())
                        sq.append("-" * l_ if t == 2 else
                                  mid[rp : rp + l_].tobytes().decode())
                    # write_read_events reverses; feed in ascending order
                    self.error_log.write_read_events(
                        names[rank], ks[::-1], tn[::-1], lv[::-1], rf[::-1], sq[::-1])
            if self.species_bases is not None and not quota_done:
                chrom_l = d["chrom"][lanes]
                sp_rs = np.asarray(self.species_of_chrom)[chrom_l]
                seg_mask = np.arange(S)[None, :] < n_seg_l[:, None]
                np.add.at(self.species_bases, sp_rs[seg_mask],
                          d["seg_mref"][lanes][seg_mask])
            return k

        fastx_mv, err_mv = self._emitter.emit_chimeric_recon(
            seed=h.seed, stream=rng_mod.STREAM_ALIGNED, ht_cap=sim.ht_cap, S=S,
            slots=slots[lanes], names=names,
            total=d["total"][lanes], head=d["head"][lanes], tail=d["tail"][lanes],
            n_seg=n_seg_l, rev=d["rev"][lanes].astype(np.uint8),
            seg_part_off=d["seg_off"][lanes].reshape(-1),
            seg_lnew=d["seg_lnew"][lanes].reshape(-1),
            seg_mid=d["seg_mref"][lanes].reshape(-1),
            seg_goff=g.offsets[d["chrom"][lanes].reshape(-1)],
            seg_spos=d["pos"][lanes].reshape(-1),
            seg_ev_flat=ev_out, seg_ev_off=off_flat, seg_n_ev=nev_flat,
            gap_part_off=(d["seg_off"][lanes][:, :G]
                          + d["seg_lnew"][lanes][:, :G]).reshape(-1),
            gap_lnew=d["gap_len"][lanes].reshape(-1),
            gap_mid=d["gap_middle"][lanes].reshape(-1),
            gap_goff=g.offsets[np.clip(d["gap_chrom"][lanes].reshape(-1), 0,
                                       len(g.offsets) - 1)],
            gap_spos=d["gap_pos"][lanes].reshape(-1),
            gap_ev_flat=gev_out, gap_ev_off=goff_flat, gap_n_steps=gsteps,
            genome_flat=g.flat, fastq=sim.fastq, write_errors=with_events,
            qual_table=qt,
        )
        self.fastx.flush()
        self.fastx.f.write(fastx_mv)
        if with_events and self.error_log is not None:
            self.error_log.write_bytes(err_mv)
        if self.species_bases is not None and not quota_done:
            # metagenome quota feedback (same accounting as the padded path)
            chrom_l = d["chrom"][lanes]
            sp_rs = np.asarray(self.species_of_chrom)[chrom_l]
            seg_mask = np.arange(S)[None, :] < n_seg_l[:, None]
            np.add.at(self.species_bases, sp_rs[seg_mask],
                      d["seg_mref"][lanes][seg_mask])
        return k

    def write_batch(self, sim, out, accepted_so_far: int, quota: int,
                    lanes=None, start=None, prepared=None) -> int:
        from .chimeric_mode import ChimericReconHandle

        if isinstance(out, ChimericReconHandle):
            return self._write_recon_chimeric(sim, out, accepted_so_far, quota,
                                              lanes, start, prepared=prepared)
        if lanes is None:
            valid = np.asarray(out.valid)
            lanes = np.nonzero(valid)[0][: quota - accepted_so_far]
        if start is not None:
            accepted_so_far = start
        if len(lanes) == 0:
            return 0
        reads = np.asarray(out.read)
        quals = np.asarray(out.quals) if sim.fastq else None
        total = np.asarray(out.total_len)
        head = np.asarray(out.head)
        tail = np.asarray(out.tail)
        n_seg = np.asarray(out.n_seg)
        seg_mref = np.asarray(out.seg_middle_ref)
        seg_lnew = np.asarray(out.seg_l_new)
        seg_off = np.asarray(out.seg_offset)
        gap_len = np.asarray(out.gap_len)
        chrom = np.asarray(out.chrom)
        pos = np.asarray(out.local_pos)
        rev = np.asarray(out.is_reversed)
        n_events = np.asarray(out.n_events)
        ev_pos2x = np.asarray(out.ev_pos2x)
        ev_type = np.asarray(out.ev_type)
        ev_len = np.asarray(out.ev_len)
        hp_mode = getattr(sim, "kmer_bias", None) is not None
        prehp = np.asarray(out.seg_read_prehp) if hp_mode else None

        g = sim.genome_host
        names = g.names
        B = reads.shape[0]
        S = seg_mref.shape[1]

        def lane_name(rank, b):
            idx = accepted_so_far + rank
            ns = int(n_seg[b])
            comps = []
            for s in range(ns):
                comp = f"{names[chrom[b, s]]}_{pos[b, s]}"
                if self.metagenome and self.species_names is not None:
                    sp = self.species_names[self.species_of_chrom[chrom[b, s]]]
                    comp = f"{sp}-{names[chrom[b, s]]}_{pos[b, s]}"
                comps.append(comp)
                if self.metagenome and s < ns - 1:
                    comps.append(f"gap_{gap_len[b, s]}")
            kind = "perfect" if self.perfect else "aligned"
            name = ";".join(comps) + f"_{kind}_{idx}"
            if ns > 1:
                name += "_chimeric"
            name += "_R" if rev[b] else "_F"
            mids = ";".join(str(seg_mref[b, s]) for s in range(ns))
            name += f"_{head[b]}_{mids}_{tail[b]}"
            return name

        with_events = self.error_log is not None and not self.perfect
        if self._emitter.available and not hp_mode:
            # C++ batch formatter (records + per-segment error log)
            lane_arr = lanes.astype(np.int64)
            rec_names = [lane_name(rank, b) for rank, b in enumerate(lanes)]
            chrom_l = chrom[lane_arr]  # [k, S]
            ev_rows = (np.arange(S, dtype=np.int64)[None, :] * B + lane_arr[:, None])
            fastx_bytes, err_bytes = self._emitter.emit_chimeric(
                reads=reads,
                quals=quals,
                lanes=lane_arr,
                names=rec_names,
                total_len=total[lane_arr],
                rev=rev[lane_arr],
                n_seg=n_seg[lane_arr],
                seg_off=seg_off[lane_arr],
                ev_row=ev_rows,
                n_events_rs=(n_events[lane_arr] if with_events
                             else np.zeros((len(lane_arr), S), np.int64)),
                ev_pos2x=ev_pos2x,
                ev_type=ev_type,
                ev_len=ev_len,
                g_off=g.offsets[chrom_l],
                g_len=g.lengths[chrom_l],
                g_circ=np.ascontiguousarray(g.circular[chrom_l], np.uint8),
                start_pos=pos[lane_arr],
                genome_flat=g.flat,
                fastq=sim.fastq,
                write_errors=with_events,
            )
            self.fastx.flush()
            self.fastx.f.write(fastx_bytes)
            if with_events:
                self.error_log.write_bytes(err_bytes)
            if self.species_bases is not None:
                sp_rs = np.asarray(self.species_of_chrom)[chrom_l]
                seg_mask = np.arange(S)[None, :] < n_seg[lane_arr][:, None]
                np.add.at(self.species_bases, sp_rs[seg_mask],
                          seg_mref[lane_arr][seg_mask])
            return len(lanes)

        for rank, b in enumerate(lanes):
            ns = int(n_seg[b])
            name = lane_name(rank, b)
            seq = reads[b, : total[b]]
            self.fastx.write(name, seq, quals[b, : total[b]] if sim.fastq else None)

            if self.species_bases is not None:
                for s in range(ns):
                    sp_i = int(self.species_of_chrom[chrom[b, s]])
                    self.species_bases[sp_i] += int(seg_mref[b, s])

            if self.error_log is not None and not self.perfect:
                pre = seq
                if rev[b]:
                    pre = _COMP_LUT[pre[::-1]]
                for s in range(ns):
                    flat = s * B + b  # segment-major flattened lane
                    ne = int(n_events[b, s])
                    if ne == 0:
                        continue
                    if hp_mode:
                        mid_row = prehp[flat]
                    evv = np.zeros(ev_pos2x.shape[1], bool)
                    evv[:ne] = True
                    keys, rpos, eff = event_read_positions(
                        ev_pos2x[flat : flat + 1],
                        ev_type[flat : flat + 1],
                        ev_len[flat : flat + 1],
                        evv[None, :],
                    )
                    keys, rpos, eff = keys[0], rpos[0], eff[0]
                    if hp_mode:
                        mid = mid_row
                    else:
                        mid = pre[seg_off[b, s] : seg_off[b, s] + seg_lnew[b, s]]
                    goff = g.offsets[chrom[b, s]]
                    glen = g.lengths[chrom[b, s]]
                    circ = bool(g.circular[chrom[b, s]])
                    spos = pos[b, s]
                    refs, seqs, tnames = [], [], []
                    kept_rows = []
                    for e in range(ne):
                        k, t, ln = int(keys[e]), int(ev_type[flat, e]), int(eff[e])
                        if ln == 0:
                            continue
                        kept_rows.append(e)
                        rp = int(rpos[e])
                        if t == 1:
                            refs.append("-" * ln)
                            seqs.append(mid[rp : rp + ln].tobytes().decode())
                        else:
                            st = spos + k
                            if circ:
                                idxs = (np.arange(st, st + ln) % glen) + goff
                                refs.append(g.flat[idxs].tobytes().decode())
                            else:
                                refs.append(g.flat[goff + st : goff + st + ln].tobytes().decode())
                            seqs.append(
                                mid[rp : rp + ln].tobytes().decode() if t == 0 else "-" * ln
                            )
                        tnames.append(_ETYPE_NAMES[t])
                    kr = np.asarray(kept_rows, int)
                    self.error_log.write_read_events(
                        name, keys[kr], tnames, eff[kr], refs, seqs
                    )
        return len(lanes)
