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

import numpy as np

_COMP_LUT = np.arange(256, dtype=np.uint8)
for _a, _b in ((ord("A"), ord("T")), (ord("C"), ord("G"))):
    _COMP_LUT[_a], _COMP_LUT[_b] = _b, _a

_ETYPE_NAMES = np.array(["mis", "ins", "del"])


class FastxWriter:
    """Buffered FASTA/FASTQ writer over uint8 token rows."""

    def __init__(self, path: str, fastq: bool):
        self.f = open(path, "wb")
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

    def __init__(self, path: str, header: bool = False):
        self.f = open(path, "w", buffering=1 << 20)
        if header:
            self.f.write(self.HEADER)

    def write_read_events(self, name, keys, types, lens, refs, seqs):
        # reverse position order, as mutate_read logs them
        out = self.f
        for i in range(len(keys) - 1, -1, -1):
            out.write(
                f"{name}\t{keys[i]}\t{types[i]}\t{lens[i]}\t{refs[i]}\t{seqs[i]}\n"
            )

    def close(self):
        self.f.close()


def event_read_positions(ev_pos2x, ev_type, ev_len, ev_valid):
    """Per-event read-coordinate starts (vectorized over [B, E]).

    read_start(e) = ref_start(e) - (deleted bases before e) + (inserted bases
    before e); events arrive in ascending position order from the walk.
    """
    is_ins = ev_valid & (ev_type == 1)
    is_del = ev_valid & (ev_type == 2)
    dlen = np.where(is_del, ev_len, 0)
    ilen = np.where(is_ins, ev_len, 0)
    prior_del = np.cumsum(dlen, axis=1) - dlen
    prior_ins = np.cumsum(ilen, axis=1) - ilen
    key = (ev_pos2x + 1) // 2  # ceil of the reference's float key
    ref_start = ev_pos2x // 2
    ref_start = np.where(is_ins, key, ref_start)
    return key, ref_start - prior_del + prior_ins


class GenomeBatchWriter:
    """Accept/number/emit a genome-mode batch (aligned reads)."""

    def __init__(self, fastx: FastxWriter, error_log=None, perfect: bool = False):
        self.fastx = fastx
        self.error_log = error_log
        self.perfect = perfect

    def write_batch(self, sim, out, accepted_so_far: int, quota: int) -> int:
        valid = np.asarray(out.valid)
        lanes = np.nonzero(valid)[0]
        remaining = quota - accepted_so_far
        lanes = lanes[:remaining]
        if len(lanes) == 0:
            return 0

        reads = np.asarray(out.read)
        quals = np.asarray(out.quals) if sim.fastq else None
        total = np.asarray(out.total_len)
        head = np.asarray(out.head)
        tail = np.asarray(out.tail)
        middle_ref = np.asarray(out.middle_ref)
        l_new = np.asarray(out.l_new)
        chrom = np.asarray(out.chrom)
        pos = np.asarray(out.local_pos)
        rev = np.asarray(out.is_reversed)
        names = sim.genome_host.names

        if self.error_log is not None and not self.perfect:
            ev_pos2x = np.asarray(out.ev_pos2x)
            ev_type = np.asarray(out.ev_type)
            ev_len = np.asarray(out.ev_len)
            ev_valid = np.asarray(out.ev_valid)
            keys_all, rpos_all = event_read_positions(ev_pos2x, ev_type, ev_len, ev_valid)

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

            if self.error_log is not None and not self.perfect:
                self._log_lane(
                    sim, name, b, head[b], total[b], l_new[b], rev[b],
                    chrom[b], pos[b], reads[b],
                    ev_valid[b], ev_type[b], ev_len[b], keys_all[b], rpos_all[b],
                )
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
