"""Transcriptome bit-identity vs the reference: the non-IR family
(expression-weighted transcript choice, 2D-KDE aligned lengths, polyA
tails; simulator.py:1043-1263) AND the intron-retention path (per-intron
Markov walk + genome-interval extraction; simulator.py:114-191,
1156-1181)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "refshim"))

from nanosim_tpu.io import PackedGenome
from nanosim_tpu.profiles import fixtures, profile
from nanosim_tpu.sim import output as out_mod
from nanosim_tpu.sim.run_transcriptome import TranscriptomeSimulator, TrxBatchWriter


class RecordingTrxWriter(TrxBatchWriter):
    def __init__(self, fastx, error_log, batch: int, uracil: bool = False):
        super().__init__(fastx, error_log)
        self.records = []
        self.batch = batch
        self.uracil = uracil
        self._batch_no = 0

    def write_batch(self, sim, out, accepted_so_far: int, quota: int,
                    lanes=None, start=None) -> int:
        B = self.batch
        slot0 = self._batch_no * B
        self._batch_no += 1
        valid = np.asarray(out.valid)
        sel = np.nonzero(valid)[0][: quota - accepted_so_far]
        reads = np.asarray(out.read)
        total = np.asarray(out.total_len)
        head = np.asarray(out.head)
        tail = np.asarray(out.tail)
        pa = np.asarray(out.polya_len)
        mref = np.asarray(out.middle_ref)
        m_init = np.asarray(out.m_ref_init)
        l_new = np.asarray(out.l_new)
        trx = np.asarray(out.trx)
        pos = np.asarray(out.local_pos)
        rev = np.asarray(out.is_reversed)
        ne_arr = np.asarray(out.n_events)
        px = np.asarray(out.ev_pos2x)
        ty = np.asarray(out.ev_type)
        ln = np.asarray(out.ev_len)
        names = sim.genome_host.names
        lengths = sim.genome_host.lengths

        for b in sel:
            ne = int(ne_arr[b])
            read = reads[b, : int(total[b])].copy()
            if self.uracil:
                read = np.where(read == ord("U"), np.uint8(ord("T")), read)
            self.records.append(dict(
                slot=slot0 + int(b),
                trx_name=names[int(trx[b])],
                trx_len=int(lengths[int(trx[b])]),
                m_ref=int(m_init[b]),
                middle_ref=int(mref[b]),
                l_new=int(l_new[b]),
                pos=int(pos[b]),
                head=int(head[b]),
                tail=int(tail[b]),
                polya_len=int(pa[b]),
                total=int(total[b]),
                rev=bool(rev[b]),
                read=read,
                n_events=ne,
                ev_pos2x=px[b, :ne].astype(np.int64),
                ev_type=ty[b, :ne].astype(np.int64),
                ev_len=ln[b, :ne].astype(np.int64),
            ))
        return super().write_batch(sim, out, accepted_so_far, quota,
                                   lanes=lanes, start=start)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("bit")
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=400, sd_read_len=150,
                            transcriptome=True, mean_2d_ref_len=1200)
    trx_fa = str(d / "trx.fa")
    fixtures.make_reference_fasta(trx_fa, [2500] * 10 + [1200] * 6, seed=21,
                                  name_prefix="ENST")
    trx = PackedGenome.from_fasta(trx_fa)
    seq_len = dict(zip(trx.names, (int(x) for x in trx.lengths)))
    exp = str(d / "exp.tsv")
    fixtures.make_expression_tsv(exp, [(n, l) for n, l in seq_len.items()], seed=8)
    polya = str(d / "polya.txt")
    with open(polya, "w") as f:
        for name in trx.names[:8]:
            f.write(name + "\n")
    return d, prefix, trx_fa, exp, polya, trx, seq_len


def _run(setup, uracil: bool, seed: int, n: int, tag: str, monkeypatch):
    # the capture writer needs the device-materialized path; the recon path
    # is separately byte-proven equal in tests/test_reconstruct.py
    monkeypatch.setenv("NANOSIM_TPU_RECON", "0")
    d, prefix, trx_fa, exp, polya, trx, seq_len = setup
    prof = profile.load_profile(prefix, mode="transcriptome", model_ir=False,
                                polya_path=polya)
    expression = profile.load_expression(exp, seq_len)
    sim = TranscriptomeSimulator(
        trx, prof, expression, model_ir=False, batch=64,
        polya_scale=4.168299657168961, uracil=uracil,  # guppy scale
    )
    ours_reads = str(d / f"ours_{tag}.fasta")
    ours_err = str(d / f"ours_{tag}.err")
    fw = out_mod.FastxWriter(ours_reads, False)
    el = out_mod.ErrorLogWriter(ours_err)
    w = RecordingTrxWriter(fw, el, batch=64, uracil=uracil)
    got = sim.run(n, w, seed=seed)
    fw.close()
    el.close()
    assert got == n and len(w.records) == n
    assert any(r["polya_len"] > 0 for r in w.records), "no polyA tails sampled"

    from refshim.bitident import run_reference_fed_transcriptome

    ref_reads, ref_err = run_reference_fed_transcriptome(
        prefix, trx_fa, exp, polya, w.records, prof, trx, seed, str(d), n,
        basecaller="guppy", uracil=uracil,
    )
    ours_b = open(ours_reads, "rb").read()
    ref_b = open(ref_reads, "rb").read()
    if ours_b != ref_b:
        a = ours_b.split(b">")
        r = ref_b.split(b">")
        for i, (x, y) in enumerate(zip(a, r)):
            assert x == y, f"record {i} differs:\nOURS: {x[:300]}\nREF : {y[:300]}"
        assert len(a) == len(r)
    assert open(ours_err, "rb").read() == open(ref_err, "rb").read()


def test_bit_identity_transcriptome_cdna_polya(setup, monkeypatch):
    _run(setup, uracil=False, seed=19, n=120, tag="cdna", monkeypatch=monkeypatch)


def test_bit_identity_transcriptome_uracil(setup, monkeypatch):
    _run(setup, uracil=True, seed=29, n=100, tag="drna", monkeypatch=monkeypatch)


class RecordingIrWriter(RecordingTrxWriter):
    def write_batch(self, sim, out, accepted_so_far: int, quota: int,
                    lanes=None, start=None) -> int:
        first = len(self.records)
        got = super().write_batch(sim, out, accepted_so_far, quota,
                                  lanes=lanes, start=start)
        has_ir = np.asarray(out.has_ir)
        valid = np.asarray(out.valid)
        sel = np.nonzero(valid)[0][: quota - accepted_so_far]
        for rank, b in enumerate(sel):
            self.records[first + rank]["has_ir"] = bool(has_ir[b])
        return got


def test_bit_identity_transcriptome_cdna_ir(tmp_path_factory, monkeypatch):
    """8th bit-identity config (VERDICT r3 item 4): cDNA with model_ir=True —
    the per-intron retention walk, the retained-intron-covering start draw,
    and exon/retained-intron genome-interval extraction, byte-equal."""
    d = tmp_path_factory.mktemp("bitir")
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=400, sd_read_len=150,
                            transcriptome=True, mean_2d_ref_len=1200)
    genome_fa, trx_fa, gff, trxs = fixtures.make_ir_fixture(str(d), n_transcripts=14, seed=7)
    from nanosim_tpu.profiles import error_model

    error_model.write_ir_markov(
        prefix + "_IR_markov_model", np.array([[0.55, 0.45], [0.5, 0.5], [0.35, 0.65]])
    )
    exp = str(d / "exp.tsv")
    fixtures.make_expression_tsv(exp, trxs, seed=8)
    polya = str(d / "polya.txt")
    with open(polya, "w") as f:
        for name, _ in trxs[:7]:
            f.write(name + "\n")

    trx = PackedGenome.from_fasta(trx_fa)
    seq_len = dict(zip(trx.names, (int(x) for x in trx.lengths)))
    prof = profile.load_profile(prefix, mode="transcriptome", model_ir=True,
                                polya_path=polya)
    expression = profile.load_expression(exp, seq_len)
    sim = TranscriptomeSimulator(
        trx, prof, expression, model_ir=True,
        ir_genome=PackedGenome.from_fasta(genome_fa), batch=64,
        polya_scale=4.168299657168961,
    )
    monkeypatch.setenv("NANOSIM_TPU_RECON", "0")
    n, seed = 120, 11
    ours_reads = str(d / "ours_ir.fasta")
    ours_err = str(d / "ours_ir.err")
    fw = out_mod.FastxWriter(ours_reads, False)
    el = out_mod.ErrorLogWriter(ours_err)
    w = RecordingIrWriter(fw, el, batch=64)
    got = sim.run(n, w, seed=seed)
    fw.close()
    el.close()
    assert got == n and len(w.records) == n
    n_ir = sum(1 for r in w.records if r["has_ir"])
    assert n_ir >= 15, f"only {n_ir} IR reads"
    assert any(b"RetainedIntron" in open(ours_reads, "rb").read().splitlines()[i]
               for i in range(0, 2 * n, 2))

    from refshim.bitident import run_reference_fed_transcriptome

    ref_reads, ref_err = run_reference_fed_transcriptome(
        prefix, trx_fa, exp, polya, w.records, prof, trx, seed, str(d), n,
        basecaller="guppy", model_ir=True, ref_g=genome_fa, our_sim=sim,
    )
    ours_b = open(ours_reads, "rb").read()
    ref_b = open(ref_reads, "rb").read()
    if ours_b != ref_b:
        a = ours_b.split(b">")
        r = ref_b.split(b">")
        for i, (x, y) in enumerate(zip(a, r)):
            assert x == y, f"record {i} differs:\nOURS: {x[:300]}\nREF : {y[:300]}"
        assert len(a) == len(r)
    assert open(ours_err, "rb").read() == open(ref_err, "rb").read()
