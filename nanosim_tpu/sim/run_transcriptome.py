"""Transcriptome-mode driver, writer, and top-level run.

Read names (simulator.py:1188-1219):
  `<trx>_<pos>_aligned_<idx>[_RetainedIntron_<s>-<e>;...]_<F|R>_<head>_<mid>_<tail+polyA>`
Perfect reads use `_perfect_` with 0 head and `<tail>` = polyA length.
"""

from __future__ import annotations

import functools
import sys
from time import strftime
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..io.genome import PackedGenome
from ..ops import rng
from ..profiles import profile as profile_mod
from . import extract, output
from .bundles import build_tables, plan_event_budget, plan_ht_capacity, plan_ref_capacity
from .transcriptome_mode import TrxBatchOut, transcriptome_batch

POLYA_SCALE = {"albacore": 2.409858743694814, "guppy": 4.168299657168961}


def _log(msg):
    sys.stderr.write(strftime("%Y-%m-%d %H:%M:%S") + ": " + msg + "\n")
    sys.stderr.flush()


class TrxBatchWriter:
    """Accept/number/emit a transcriptome batch.

    Records and ground-truth log go through the C++ batch formatter
    (io/native.py) like the genome/chimeric writers; per-event reference
    bases come from the batch's own extracted ref rows (passed as the
    emitter's flat 'genome' with per-lane offsets), which also covers
    intron-retention reads whose sequence source is genomic intervals."""

    def __init__(self, fastx, error_log=None, perfect: bool = False):
        self.fastx = fastx
        self.error_log = error_log
        self.perfect = perfect
        from ..io.native import NativeEmitter

        self._emitter = NativeEmitter()

    def write_batch(self, sim, out, accepted_so_far: int, quota: int,
                    lanes=None, start=None) -> int:
        from .transcriptome_mode import TrxReconHandle

        if isinstance(out, TrxReconHandle):
            return _trx_recon_write(self, sim, out, accepted_so_far, quota,
                                    lanes, start)
        if lanes is None:
            valid = np.asarray(out.valid)
            lanes = np.nonzero(valid)[0][: quota - accepted_so_far]
        if start is None:
            start = accepted_so_far
        accepted_so_far = start
        if len(lanes) == 0:
            return 0
        reads = np.asarray(out.read)
        quals = np.asarray(out.quals) if sim.fastq else None
        total = np.asarray(out.total_len)
        head = np.asarray(out.head)
        tail = np.asarray(out.tail)
        pa = np.asarray(out.polya_len)
        middle_ref = np.asarray(out.middle_ref)
        l_new = np.asarray(out.l_new)
        trx = np.asarray(out.trx)
        pos = np.asarray(out.local_pos)
        rev = np.asarray(out.is_reversed)
        has_ir = np.asarray(out.has_ir)
        ir_iv = np.asarray(out.ir_intervals)
        n_ir = np.asarray(out.n_ir)
        n_events = np.asarray(out.n_events)
        ev_p = np.asarray(out.ev_pos2x)
        ev_t = np.asarray(out.ev_type)
        ev_l = np.asarray(out.ev_len)
        ref_seg = np.asarray(out.ref_seg)
        hp_mode = getattr(sim, "kmer_bias", None) is not None
        prehp = np.asarray(out.read_prehp) if hp_mode else None
        names = sim.genome_host.names
        kind = "perfect" if self.perfect else "aligned"

        rec_names = []
        for rank, b in enumerate(lanes):
            idx = accepted_so_far + rank
            name = f"{names[trx[b]]}_{pos[b]}_{kind}_{idx}"
            if n_ir[b] > 0:
                name += "_RetainedIntron_"
                for k in range(n_ir[b]):
                    name += f"{ir_iv[b, k, 0]}-{ir_iv[b, k, 1]};"
            name += "_R" if rev[b] else "_F"
            name += f"_{head[b]}_{middle_ref[b]}_{tail[b] + pa[b]}"
            rec_names.append(name)

        with_events = self.error_log is not None and not self.perfect
        if self._emitter.available and not hp_mode and not getattr(sim, "uracil", False):
            # the per-event ref bases live in this batch's extracted rows:
            # hand them to the emitter as the flat "genome" with per-lane
            # offsets and start position 0
            lane_arr = np.ascontiguousarray(lanes, np.int64)
            Lr = ref_seg.shape[1]
            ref_flat = np.ascontiguousarray(ref_seg).reshape(-1)
            fastx_bytes, err_bytes = self._emitter.emit(
                reads=reads,
                quals=quals,
                lanes=lane_arr,
                names=rec_names,
                total_len=total[lane_arr],
                head=head[lane_arr],
                l_new=l_new[lane_arr],
                rev=rev[lane_arr],
                ev_pos2x=ev_p if with_events else None,
                ev_type=ev_t if with_events else None,
                ev_len=ev_l if with_events else None,
                n_events=(n_events[lane_arr] if with_events
                          else np.zeros(len(lane_arr), np.int64)),
                g_off=lane_arr * Lr,
                g_len=np.full(len(lane_arr), Lr, np.int64),
                g_circ=np.zeros(len(lane_arr), np.uint8),
                start_pos=np.zeros(len(lane_arr), np.int64),
                genome_flat=ref_flat,
                fastq=sim.fastq,
                write_errors=with_events,
            )
            self.fastx.flush()
            self.fastx.f.write(fastx_bytes)
            if with_events and self.error_log is not None:
                self.error_log.write_bytes(err_bytes)
            return len(lanes)

        for rank, b in enumerate(lanes):
            name = rec_names[rank]
            seq = reads[b, : total[b]]
            self.fastx.write(name, seq, quals[b, : total[b]] if sim.fastq else None)

            if with_events and n_events[b] > 0:
                self._log_lane(
                    b, name, seq, head[b], l_new[b], rev[b],
                    n_events[b], ev_p[b], ev_t[b], ev_l[b], ref_seg[b],
                    prehp[b] if hp_mode else None,
                )
        return len(lanes)

    def _log_lane(self, b, name, seq, head, l_new, rev, ne, ev_p, ev_t, ev_l, ref_row, prehp_row=None):
        if prehp_row is not None:
            mid = prehp_row  # pass-1 coordinates (pre-hp resize)
        else:
            # the ground-truth log records pre-uracil bases (the reference
            # translates T->U after mutate_read's logging, simulator.py:1247)
            seq = np.where(seq == ord("U"), np.uint8(ord("T")), seq)
            pre = seq
            if rev:
                pre = output._COMP_LUT[pre[::-1]]
            mid = pre[head : head + l_new]
        evv = np.zeros(len(ev_p), bool)
        evv[:ne] = True
        keys, rpos, eff = output.event_read_positions(
            ev_p[None, :], ev_t[None, :], ev_l[None, :], evv[None, :]
        )
        keys, rpos, eff = keys[0], rpos[0], eff[0]
        refs, seqs, tnames = [], [], []
        kept = []
        for e in range(ne):
            k, t, ln, rp = int(keys[e]), int(ev_t[e]), int(eff[e]), int(rpos[e])
            if ln == 0:
                continue
            kept.append(e)
            if t == 1:
                refs.append("-" * ln)
                seqs.append(mid[rp : rp + ln].tobytes().decode())
            else:
                refs.append(ref_row[k : k + ln].tobytes().decode())
                seqs.append(mid[rp : rp + ln].tobytes().decode() if t == 0 else "-" * ln)
            tnames.append(output._ETYPE_NAMES[t])
        import numpy as _np

        kr = _np.asarray(kept, int)
        self.error_log.write_read_events(name, keys[kr], tnames, eff[kr], refs, seqs)


def _trx_recon_write(writer, sim, h, accepted_so_far: int, quota: int,
                     lanes=None, start=None) -> int:
    """Host-reconstruct + emit a meta-only transcriptome batch."""
    from .transcriptome_mode import decode_trx_meta

    meta = np.asarray(h.meta_dev)
    d = decode_trx_meta(meta, h.n_iv, h.F)
    if lanes is None:
        lanes = np.nonzero(d["valid"])[0][: quota - accepted_so_far]
        start = accepted_so_far
    if start is None:
        start = accepted_so_far
    if len(lanes) == 0:
        return 0
    k = len(lanes)
    slots = np.asarray(h.slots)
    trx_host = sim.genome_host
    names_t = trx_host.names

    names = []
    for rank, b in enumerate(lanes):
        idx = start + rank
        kind = "perfect" if getattr(writer, "perfect", False) else "aligned"
        name = f"{names_t[d['trx'][b]]}_{d['pos'][b]}_{kind}_{idx}"
        if d["n_ir"][b] > 0:
            name += "_RetainedIntron_"
            for kk in range(d["n_ir"][b]):
                name += f"{d['ir_iv'][b, kk, 0]}-{d['ir_iv'][b, kk, 1]};"
        name += "_R" if d["rev"][b] else "_F"
        name += f"_{d['head'][b]}_{d['mref'][b]}_{d['tail'][b] + d['pa'][b]}"
        names.append(name)

    # replay the aligned walk for the selected lanes (checksum-verified)
    nev = d["n_events"][lanes]
    off = np.concatenate([[0], np.cumsum(nev)])[:-1]
    ev_out = np.zeros(max(int(nev.sum()), 1), np.uint32)
    ok = sim._replayer.replay(
        slots[lanes], np.ones(k, np.uint8), d["mref0"][lanes], nev,
        d["cksum"][lanes].astype(np.uint32), ev_out, off,
    )
    if not bool(ok.all()):
        raise RuntimeError(
            "transcriptome walk replay failed checksum verification; "
            "set NANOSIM_TPU_RECON=0 to fall back to device materialization"
        )

    # sources: transcript slices, or host-assembled IR interval concats
    use_b = np.zeros(k, np.uint8)
    src_off = np.zeros(k, np.int64)
    aux_parts = []
    aux_pos = 0
    t_off = np.asarray(trx_host.offsets)
    for rank, b in enumerate(lanes):
        if d["has_ir"][b]:
            g = sim.ir_genome_host
            goff = int(np.asarray(g.offsets)[d["ir_chrom"][b]])
            chunks = []
            for f in range(h.F):
                take = int(d["feat_take"][b, f])
                if take <= 0:
                    continue
                s0 = goff + int(d["feat_start"][b, f])
                chunks.append(g.flat[s0 : s0 + take])
            buf = np.concatenate(chunks) if chunks else np.zeros(0, np.uint8)
            use_b[rank] = 1
            src_off[rank] = aux_pos
            aux_parts.append(buf)
            aux_pos += len(buf)
        else:
            src_off[rank] = int(t_off[d["trx"][b]]) + int(d["pos"][b])
    src_b = (np.concatenate(aux_parts) if aux_parts else np.zeros(1, np.uint8))

    with_events = writer.error_log is not None and not writer.perfect
    qt = None
    if sim.fastq:
        qd = sim.tables.qual
        qt = (np.asarray(qd.breaks), np.asarray(qd.vals))
    fastx_mv, err_mv = writer._emitter.emit_trx_recon(
        seed=h.seed, stream=rng.STREAM_ALIGNED, ht_cap=sim.ht_cap,
        slots=slots[lanes], names=names,
        total=d["total"][lanes], head=d["head"][lanes], tail=d["tail"][lanes],
        pa_len=d["pa"][lanes], l_new=d["lnew"][lanes],
        middle_ref=d["mref"][lanes], rev=d["rev"][lanes].astype(np.uint8),
        ev_flat=ev_out, ev_off=off, n_events=nev,
        src_a=trx_host.flat, src_b=src_b, use_b=use_b, src_off=src_off,
        fastq=sim.fastq, uracil=getattr(sim, "uracil", False),
        write_errors=with_events, qual_table=qt,
    )
    writer.fastx.flush()
    writer.fastx.f.write(fastx_mv)
    if with_events and writer.error_log is not None:
        writer.error_log.write_bytes(err_mv)
    return k


class TranscriptomeSimulator:
    def __init__(
        self,
        transcriptome: PackedGenome,
        profile,
        expression,
        *,
        fastq: bool = False,
        perfect: bool = False,
        uracil: bool = False,
        polya_scale: float = 0.0,
        model_ir: bool = False,
        ir_genome: Optional[PackedGenome] = None,
        max_len: float = float("inf"),
        batch: int = 256,
        kmer_bias: Optional[int] = None,
        exact_conditional: bool = False,
    ):
        self.genome_host = transcriptome
        self.profile = profile
        self.fastq = fastq
        self.perfect = perfect
        self.batch = batch
        self.kmer_bias = kmer_bias
        # the uracil flag routes emission to the python writer (the native
        # emitter would log post-translate U bases; the reference logs
        # BEFORE the T->U translate, simulator.py:1247)
        self.uracil = uracil

        name_to_idx = transcriptome.name_index()
        # expression-eligible transcripts present in the reference
        eli_idx, weights = [], []
        for nm, w in zip(expression.names, expression.weights):
            if nm in name_to_idx:
                eli_idx.append(name_to_idx[nm])
                weights.append(w)
        if not eli_idx:
            raise ValueError("no expressed transcripts match the reference transcriptome")

        self.ir_tables = None
        self.ir_genome_dev = None
        with_ir = False
        if model_ir and profile.structures is not None and ir_genome is not None:
            from .ir import IRTables

            tables_ir, ok_mask = IRTables.build(
                profile.structures,
                transcriptome.names,
                ir_genome.names,
                profile.ir_markov,
                transcriptome.lengths,
            )
            # IR mode only simulates structure-eligible transcripts
            # (simulator.py:1094-1100 rejection loop)
            keep = [(i, w) for i, w in zip(eli_idx, weights) if ok_mask[i]]
            if keep:
                eli_idx = [i for i, _ in keep]
                weights = [w for _, w in keep]
                self.ir_tables = tables_ir
                self.ir_genome_dev = extract.GenomeDevice.from_packed(ir_genome)
                self.ir_genome_host = ir_genome
                with_ir = True
            else:
                _log("WARNING: no expressed transcripts match the GFF structures; IR disabled")
        self.with_ir = with_ir

        w = np.asarray(weights, np.float64)
        w = w / w.sum()
        self.cum_weights = jnp.asarray(np.cumsum(w))
        self.trx_of_eligible = jnp.asarray(np.asarray(eli_idx, np.int32))
        polya_mask = np.zeros(transcriptome.n_chrom, bool)
        if profile.polya:
            for nm in profile.polya:
                if nm in name_to_idx:
                    polya_mask[name_to_idx[nm]] = True
        self.polya_mask = jnp.asarray(polya_mask)

        self.l_cap = plan_ref_capacity(profile, max_len, transcriptome.max_chrom)
        self.ht_cap = plan_ht_capacity(profile)
        self.l_out = self.l_cap + self.ht_cap + 512  # + polyA slack
        self.e_max = plan_event_budget(profile, self.l_cap, slack=2.5)
        self.tables = build_tables(profile)
        self.genome_dev = extract.GenomeDevice.from_packed(transcriptome)
        self.kw = dict(
            exact_conditional=exact_conditional,
            l_cap=self.l_cap,
            l_out=self.l_out,
            ht_cap=self.ht_cap,
            e_max=self.e_max,
            fastq=fastq,
            perfect=perfect,
            uracil=uracil,
            polya_scale=polya_scale,
            max_len=max_len,
            with_ir=with_ir,
            kmer_bias=kmer_bias,
            hp_r_max=max(128, self.l_cap // 32),
        )

    def batch_fn(self):
        return functools.partial(
            transcriptome_batch,
            genome=self.genome_dev,
            tables=self.tables,
            cum_weights=self.cum_weights,
            trx_of_eligible=self.trx_of_eligible,
            polya_mask=self.polya_mask,
            ir_tables=self.ir_tables,
            ir_genome=self.ir_genome_dev,
            **self.kw,
        )

    def run(self, n_reads, writer, seed=0, max_batches=None, resume_state=None):
        import os

        from .genome_mode import ResumeState, run_prefetched

        base = rng.base_key(seed, rng.STREAM_ALIGNED)

        # host reconstruction: meta-only device program + C++ walk replay +
        # C++ emit (head | middle | polyA | tail, IR interval sources
        # host-assembled).  ~130 B/lane crosses the link.
        recon = (
            self.kmer_bias is None
            and (self.perfect or self.profile.mix_params is not None)
            and (not self.fastq or self.profile.base_quals is not None)
            and os.environ.get("NANOSIM_TPU_RECON", "1") != "0"
        )
        if recon:
            from ..io.native import PerfectReplayer, WalkReplayer, get_lib

            lib = get_lib()
            recon = lib is not None and hasattr(lib, "emit_trx_recon")
            if recon:
                if self.perfect:
                    # no walk ran: verify the zero-event invariant per lane
                    self._replayer = PerfectReplayer()
                else:
                    self._replayer = WalkReplayer(
                        self.profile, seed, rng.STREAM_ALIGNED, rng.SITE_WALK,
                        e_guard=self.e_max,
                    )
                recon = self._replayer.available
        if recon:
            from .transcriptome_mode import TrxReconHandle, pack_trx_meta
            from .ir import MAX_IR_OUT

            fn_meta = functools.partial(
                transcriptome_batch,
                genome=self.genome_dev,
                tables=self.tables,
                cum_weights=self.cum_weights,
                trx_of_eligible=self.trx_of_eligible,
                polya_mask=self.polya_mask,
                ir_tables=self.ir_tables,
                ir_genome=self.ir_genome_dev,
                emit_reads=False,
                **self.kw,
            )
            # ir_intervals width is min(f_max, MAX_IR_OUT) (sim/ir.py argsort slice)
            n_iv = min(MAX_IR_OUT, self.ir_tables.f_max) if self.with_ir else 1
            F = self.ir_tables.f_max if self.with_ir else 1

            def make_batch(slot_start):
                slots = np.arange(slot_start, slot_start + self.batch, dtype=np.int64)
                out = fn_meta(base, jnp.asarray(slots))
                if self.with_ir:
                    irc = self.ir_tables.chrom[self.ir_tables.feat_offset[out.trx]]
                else:
                    irc = jnp.zeros(self.batch, jnp.int32)
                return TrxReconHandle(pack_trx_meta(out, irc), slots, self, seed,
                                      n_iv, F)

            state = ResumeState(resume_state) if resume_state else None
            return run_prefetched(make_batch, self.batch, n_reads, writer, self,
                                  max_batches, state=state)

        fn = self.batch_fn()

        def make_batch(slot_start):
            slots = jnp.arange(slot_start, slot_start + self.batch, dtype=jnp.int64)
            return fn(base, slots)

        state = ResumeState(resume_state) if resume_state else None
        return run_prefetched(make_batch, self.batch, n_reads, writer, self, max_batches,
                              state=state)


def simulate_transcriptome(
    ref_t: str,
    ref_g: str,
    exp_path: str,
    model_prefix: str,
    out: str,
    number: int = 20000,
    *,
    perfect: bool = False,
    fastq: bool = False,
    kmer_bias=None,
    homopolymer: bool = False,
    strandness=None,
    model_ir: bool = True,
    polya=None,
    basecaller=None,
    uracil: bool = False,
    min_len: int = 50,
    max_len: float = float("inf"),
    seed: int = 0,
    batch: int = 256,
    n_hosts: int = 1,
    host_id: int = 0,
    coordinator=None,
    resume: bool = False,
) -> dict:
    """Full transcriptome run (reference main transcriptome branch,
    simulator.py:2322-2414).  With n_hosts > 1, this process writes
    `{out}_h{host_id}` shards of the aligned pass (concatenation == the
    single-host output); the unaligned pass runs on host 0."""
    _log("Read in reference transcriptome")
    transcriptome = PackedGenome.from_fasta(ref_t)
    ir_genome = None
    if model_ir and ref_g:
        _log("Read in reference genome")
        ir_genome = PackedGenome.from_fasta(ref_g)

    prof = profile_mod.load_profile(
        model_prefix,
        mode="transcriptome",
        perfect=perfect,
        homopolymer=homopolymer,
        fastq=fastq,
        model_ir=model_ir,
        polya_path=polya,
        strandness=strandness,
    )
    _log("Read in expression profile")
    seq_len = dict(zip(transcriptome.names, (int(x) for x in transcriptome.lengths)))
    expression = profile_mod.load_expression(exp_path, seq_len)

    n_aligned, n_unaligned = profile_mod.split_aligned_unaligned(
        [number], prof.aligned_rate, perfect
    )
    polya_scale = POLYA_SCALE.get(basecaller, 0.0) if polya else 0.0
    ext = ".fastq" if fastq else ".fasta"

    _log("Start simulation of aligned reads")
    sim = TranscriptomeSimulator(
        transcriptome,
        prof,
        expression,
        fastq=fastq,
        perfect=perfect,
        uracil=uracil,
        polya_scale=polya_scale,
        model_ir=model_ir,
        ir_genome=ir_genome,
        max_len=max_len,
        batch=batch,
        kmer_bias=kmer_bias,
    )
    if n_hosts > 1:
        from ..parallel import MultiHostModeRunner, init_distributed

        init_distributed(coordinator, n_hosts if coordinator else None, host_id)
        tag = f"_h{host_id}"
        fw = output.FastxWriter(out + "_aligned_reads" + tag + ext, fastq)
        el = output.ErrorLogWriter(out + "_aligned_error_profile" + tag,
                                   header=(host_id == 0))
        runner = MultiHostModeRunner(sim, n_hosts, host_id)
        runner.run(n_aligned[0], TrxBatchWriter(fw, el, perfect=perfect), seed=seed)
    else:
        import os as _os

        state_path = out + "_aligned.resume.json"
        resuming = resume and _os.path.exists(state_path)
        fw = output.FastxWriter(out + "_aligned_reads" + ext, fastq, append=resuming)
        el = output.ErrorLogWriter(out + "_aligned_error_profile", header=True,
                                   append=resuming)
        sim.run(n_aligned[0], TrxBatchWriter(fw, el, perfect=perfect), seed=seed,
                resume_state=state_path if resume else None)
    fw.close()
    el.close()

    if not perfect and n_unaligned[0] > 0 and host_id == 0:
        import os as _os

        _log("Start simulation of random reads")
        from .unaligned_mode import UnalignedBatchWriter, UnalignedSimulator

        usim = UnalignedSimulator(
            transcriptome,
            prof,
            fastq=fastq,
            min_len=min_len,
            max_len=max_len,
            batch=batch,
            uracil=uracil,
            transcriptome_mode=True,
        )
        ustate = out + "_unaligned.resume.json"
        uresuming = resume and _os.path.exists(ustate)
        ufw = output.FastxWriter(out + "_unaligned_reads" + ext, fastq, append=uresuming)
        usim.run(n_unaligned[0], UnalignedBatchWriter(ufw), seed=seed,
                 resume_state=ustate if resume else None)
        ufw.close()

    from . import output as _out
    _out.RUN_STATS.report(_log)
    _log("Finished!")
    return {"aligned": n_aligned[0], "unaligned": 0 if perfect else n_unaligned[0]}
