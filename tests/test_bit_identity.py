"""Bit-identity vs the reference (the north-star correctness bar).

Our simulator runs first; the reference then runs with every primitive RNG
draw fed from our counter-based stream (refshim/bitident.py).  The FASTA
records and ground-truth error logs must match BYTE FOR BYTE — proving the
batched device kernels implement exactly the transforms of the reference's
per-read Python loops (error_list, mutate_read, extract_read, strand flip,
record formatting; simulator.py:1266-1454, 1833-1916, 1919-2015).
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
from nanosim_tpu.sim.genome_mode import GenomeSimulator


class RecordingWriter(out_mod.GenomeBatchWriter):
    """GenomeBatchWriter that also captures per-accepted-read records."""

    def __init__(self, fastx, error_log):
        super().__init__(fastx, error_log)
        self.records = []

    def write_run(self, sim, d, lanes, accepted_so_far: int) -> int:
        assert hasattr(d, "reads_flat"), "bit-identity capture needs the compact path"
        from nanosim_tpu.sim import compact as _c

        if getattr(d, "finish", None) is not None:
            d.finish()

        rquals = None
        if d.reads_flat is None:  # meta-only batch: host reconstruction
            from nanosim_tpu.sim.reconstruct import reconstruct_batch

            seed, stream, ht_cap = d.recon
            qt = None
            if self.fastx.fastq:
                qd = sim.tables.qual
                qt = (np.asarray(qd.breaks), np.asarray(qd.vals))
            out = reconstruct_batch(d, lanes, sim.genome_host, seed, stream,
                                    ht_cap, qual_table=qt)
            if qt is not None:
                reads = [r for r, _ in out]
                rquals = [q for _, q in out]
            else:
                reads = out
        else:
            reads = _c.decode_reads_ascii(d, lanes)
        assert d.slots is not None
        for rank, b in enumerate(lanes):
            ne = int(d.n_events[b])
            o = int(d.ev_off[b])
            w = d.ev_flat[o : o + ne]
            quals = None
            if self.fastx.fastq:
                if rquals is not None:
                    quals = rquals[rank]
                else:
                    qo = int(d.qual_off[b])
                    quals = np.array(d.quals_flat[qo : qo + int(d.total[b])], np.uint8)
            self.records.append(dict(
                slot=int(d.slots[b]),
                m_ref=int(d.m_ref[b]),
                middle_ref=int(d.middle_ref[b]),
                n_events=ne,
                ev_pos2x=(w & np.uint32(0x1FFFF)).astype(np.int64),
                ev_type=(w >> np.uint32(30)).astype(np.int64),
                ev_len=((w >> np.uint32(17)) & np.uint32(0x1FFF)).astype(np.int64),
                head=int(d.head[b]),
                tail=int(d.tail[b]),
                l_new=int(d.l_new[b]),
                total=int(d.total[b]),
                rev=bool(d.rev[b]),
                chrom=int(d.chrom[b]),
                pos=int(d.pos[b]),
                read=np.array(reads[rank], np.uint8),
                quals=quals,
            ))
        return super().write_run(sim, d, lanes, accepted_so_far)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("bi")
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=700, sd_read_len=250)
    ref_fa = str(d / "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [40000, 15000], seed=5)
    return d, prefix, ref_fa


def _run_bit_identity(setup, fastq: bool, seed: int, n: int):
    d, prefix, ref_fa = setup
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome", fastq=fastq)
    sim = GenomeSimulator(genome, prof, batch=64, fastq=fastq)

    ext = "fastq" if fastq else "fasta"
    ours_reads = str(d / f"ours_{ext}.{ext}")
    ours_err = str(d / f"ours_{ext}.err")
    fw = out_mod.FastxWriter(ours_reads, fastq)
    el = out_mod.ErrorLogWriter(ours_err)
    w = RecordingWriter(fw, el)
    got = sim.run(n, w, seed=seed)
    fw.close()
    el.close()
    assert got == n
    assert len(w.records) == n

    from refshim.bitident import run_reference_fed

    ref_reads, ref_err = run_reference_fed(
        prefix, ref_fa, w.records, prof, genome, seed, str(d), n, fastq=fastq,
    )

    ours_b = open(ours_reads, "rb").read()
    ref_b = open(ref_reads, "rb").read()
    if ours_b != ref_b:
        sep = b"@" if fastq else b">"
        a_recs = ours_b.split(sep)
        r_recs = ref_b.split(sep)
        for i, (x, y) in enumerate(zip(a_recs, r_recs)):
            assert x == y, f"record {i} differs:\nOURS: {x[:300]}\nREF : {y[:300]}"
        assert len(a_recs) == len(r_recs)
    assert open(ours_err, "rb").read() == open(ref_err, "rb").read()


def test_bit_identity_genome_fasta(setup):
    _run_bit_identity(setup, fastq=False, seed=11, n=120)


def test_bit_identity_genome_fastq(setup):
    _run_bit_identity(setup, fastq=True, seed=23, n=100)


def test_bit_identity_genome_10k(setup):
    """Scale the byte-equality guarantee to 10k reads so the edge cases it
    exists to catch (ECDF inversion boundaries, 8-retry position rejection,
    dedup-insertion chains, capacity rescue splicing) get dense sampling
    (VERDICT r2 weak-point 8)."""
    _run_bit_identity(setup, fastq=False, seed=3, n=10000)


def test_bit_identity_genome_circular(tmp_path_factory, monkeypatch):
    """Circular-DNA genome config: wraparound extraction (simulator.py:
    1752-1760) byte-equal end to end (reads + error log, including
    wrap-spanning events' logged ref bases)."""
    monkeypatch.setenv("NANOSIM_TPU_RECON", "0")  # capture needs compact path
    d = tmp_path_factory.mktemp("bicirc")
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=700, sd_read_len=250)
    ref_fa = str(d / "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [9000], seed=31)  # single chromosome

    n, seed = 150, 17
    genome = PackedGenome.from_fasta(ref_fa, dna_type="circular")
    prof = profile.load_profile(prefix, mode="genome")
    sim = GenomeSimulator(genome, prof, batch=64, circular_dna=True)

    ours_reads = str(d / "ours.fasta")
    ours_err = str(d / "ours.err")
    fw = out_mod.FastxWriter(ours_reads, False)
    el = out_mod.ErrorLogWriter(ours_err)
    w = RecordingWriter(fw, el)
    got = sim.run(n, w, seed=seed)
    fw.close()
    el.close()
    assert got == n and len(w.records) == n
    # non-vacuity: some reads must wrap the origin
    n_wrap = sum(1 for r in w.records
                 if int(r["pos"]) + int(r["middle_ref"]) > 9000)
    assert n_wrap >= 5, f"only {n_wrap} wrap-spanning reads"

    from refshim.bitident import run_reference_fed

    ref_reads, ref_err = run_reference_fed(
        prefix, ref_fa, w.records, prof, genome, seed, str(d), n, circular=True,
    )
    ours_b = open(ours_reads, "rb").read()
    ref_b = open(ref_reads, "rb").read()
    if ours_b != ref_b:
        for i, (x, y) in enumerate(zip(ours_b.split(b">"), ref_b.split(b">"))):
            assert x == y, f"record {i} differs:\nOURS: {x[:300]}\nREF : {y[:300]}"
    assert ours_b == ref_b
    assert open(ours_err, "rb").read() == open(ref_err, "rb").read()
