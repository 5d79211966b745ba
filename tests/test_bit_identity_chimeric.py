"""Chimeric-genome bit-identity vs the reference (gap walk + segment
splicing; simulator.py:1266-1454, 1552-1568).

Extends the aligned-genome harness to the chimeric family: our simulator
runs first, then the reference's `simulation_aligned_genome(chimeric=True)`
is driven with every primitive draw fed from our counter-based stream
(per-segment / per-gap part keys) and must reproduce the FASTA records and
ground-truth error logs byte-for-byte.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "refshim"))

from nanosim_tpu.io import PackedGenome
from nanosim_tpu.profiles import fixtures, profile
from nanosim_tpu.sim import output as out_mod
from nanosim_tpu.sim.chimeric_mode import ChimericGenomeSimulator


class RecordingChimericWriter(out_mod.ChimericBatchWriter):
    """ChimericBatchWriter that captures per-accepted-read replay records."""

    def __init__(self, fastx, error_log, batch: int):
        super().__init__(fastx, error_log)
        self.records = []
        self.batch = batch
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
        n_seg = np.asarray(out.n_seg)
        seg_mref_init = np.asarray(out.seg_mref_init)
        seg_mref = np.asarray(out.seg_middle_ref)
        seg_lnew = np.asarray(out.seg_l_new)
        seg_off = np.asarray(out.seg_offset)
        gap_len = np.asarray(out.gap_len)
        gap_mref_init = np.asarray(out.gap_mref_init)
        gap_chrom = np.asarray(out.gap_chrom)
        gap_pos = np.asarray(out.gap_pos)
        gap_n_steps = np.asarray(out.gap_n_steps)
        gap_px = np.asarray(out.gap_ev_pos2x)
        gap_ty = np.asarray(out.gap_ev_type)
        gap_ln = np.asarray(out.gap_ev_len)
        chrom = np.asarray(out.chrom)
        pos = np.asarray(out.local_pos)
        rev = np.asarray(out.is_reversed)
        n_events = np.asarray(out.n_events)
        ev_px = np.asarray(out.ev_pos2x)
        ev_ty = np.asarray(out.ev_type)
        ev_ln = np.asarray(out.ev_len)

        for b in sel:
            ns = int(n_seg[b])
            segs = []
            for s in range(ns):
                row = s * B + b
                ne = int(n_events[b, s])
                segs.append(dict(
                    m_ref=int(seg_mref_init[b, s]),
                    middle_ref=int(seg_mref[b, s]),
                    l_new=int(seg_lnew[b, s]),
                    off=int(seg_off[b, s]),
                    chrom=int(chrom[b, s]),
                    pos=int(pos[b, s]),
                    ev_pos2x=ev_px[row, :ne].astype(np.int64),
                    ev_type=ev_ty[row, :ne].astype(np.int64),
                    ev_len=ev_ln[row, :ne].astype(np.int64),
                ))
            gaps = []
            for g in range(ns - 1):
                row = g * B + b
                nst = int(gap_n_steps[b, g])
                gaps.append(dict(
                    gap_ref=int(gap_mref_init[b, g]),
                    l_new=int(gap_len[b, g]),
                    off=int(seg_off[b, g]) + int(seg_lnew[b, g]),
                    chrom=int(gap_chrom[b, g]),
                    pos=int(gap_pos[b, g]),
                    n_steps=nst,
                    st_pos2x=gap_px[row, :nst].astype(np.int64),
                    st_type=gap_ty[row, :nst].astype(np.int64),
                    st_len=gap_ln[row, :nst].astype(np.int64),
                ))
            self.records.append(dict(
                slot=slot0 + int(b),
                n_seg=ns,
                head=int(head[b]),
                tail=int(tail[b]),
                total=int(total[b]),
                rev=bool(rev[b]),
                read=reads[b, : int(total[b])].copy(),
                segs=segs,
                gaps=gaps,
            ))
        return super().write_batch(sim, out, accepted_so_far, quota,
                                   lanes=lanes, start=start)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("bic")
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=500, sd_read_len=180)
    from nanosim_tpu.profiles import error_model

    error_model.write_chimeric_info(prefix + "_chimeric_info", 1.7, 0.2)
    ref_fa = str(d / "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [40000, 15000], seed=9)
    return d, prefix, ref_fa


def test_bit_identity_chimeric_genome_1k(tmp_path_factory, monkeypatch):
    """Dense-sampling variant (VERDICT r3 item 8): n=1000 with a small second
    chromosome so segment-boundary rejection, retry rounds, and long
    multi-segment chains are exercised at density, byte-equal end to end."""
    # the capture writer needs the device-materialized (padded) path; the
    # recon path is separately byte-proven equal in tests/test_reconstruct.py
    monkeypatch.setenv("NANOSIM_TPU_RECON", "0")
    d = tmp_path_factory.mktemp("bic1k")
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=450, sd_read_len=200)
    from nanosim_tpu.profiles import error_model

    error_model.write_chimeric_info(prefix + "_chimeric_info", 1.9, 0.2)
    ref_fa = str(d / "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [30000, 6000], seed=21)

    n, seed = 1000, 13
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome", chimeric=True)
    sim = ChimericGenomeSimulator(genome, prof, batch=128)

    ours_reads = str(d / "ours.fasta")
    ours_err = str(d / "ours.err")
    fw = out_mod.FastxWriter(ours_reads, False)
    el = out_mod.ErrorLogWriter(ours_err)
    w = RecordingChimericWriter(fw, el, batch=128)
    got = sim.run(n, w, seed=seed)
    fw.close()
    el.close()
    assert got == n and len(w.records) == n
    n_multi = sum(1 for r in w.records if r["n_seg"] > 1)
    assert n_multi >= 100, f"only {n_multi} multi-segment reads"

    from refshim.bitident import run_reference_fed_chimeric

    ref_reads, ref_err = run_reference_fed_chimeric(
        prefix, ref_fa, w.records, prof, genome, seed, str(d), n,
    )
    ours_b = open(ours_reads, "rb").read()
    ref_b = open(ref_reads, "rb").read()
    if ours_b != ref_b:
        a_recs = ours_b.split(b">")
        r_recs = ref_b.split(b">")
        for i, (x, y) in enumerate(zip(a_recs, r_recs)):
            assert x == y, f"record {i} differs:\nOURS: {x[:400]}\nREF : {y[:400]}"
        assert len(a_recs) == len(r_recs)
    assert open(ours_err, "rb").read() == open(ref_err, "rb").read()


def test_bit_identity_chimeric_genome(setup, monkeypatch):
    monkeypatch.setenv("NANOSIM_TPU_RECON", "0")
    d, prefix, ref_fa = setup
    n, seed = 120, 7
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome", chimeric=True)
    sim = ChimericGenomeSimulator(genome, prof, batch=64)

    ours_reads = str(d / "ours.fasta")
    ours_err = str(d / "ours.err")
    fw = out_mod.FastxWriter(ours_reads, False)
    el = out_mod.ErrorLogWriter(ours_err)
    w = RecordingChimericWriter(fw, el, batch=64)
    got = sim.run(n, w, seed=seed)
    fw.close()
    el.close()
    assert got == n
    assert len(w.records) == n
    assert any(r["n_seg"] > 1 for r in w.records), "fixture produced no chimeras"

    from refshim.bitident import run_reference_fed_chimeric

    ref_reads, ref_err = run_reference_fed_chimeric(
        prefix, ref_fa, w.records, prof, genome, seed, str(d), n,
    )
    ours_b = open(ours_reads, "rb").read()
    ref_b = open(ref_reads, "rb").read()
    if ours_b != ref_b:
        a_recs = ours_b.split(b">")
        r_recs = ref_b.split(b">")
        for i, (x, y) in enumerate(zip(a_recs, r_recs)):
            assert x == y, f"record {i} differs:\nOURS: {x[:400]}\nREF : {y[:400]}"
        assert len(a_recs) == len(r_recs)
    assert open(ours_err, "rb").read() == open(ref_err, "rb").read()
