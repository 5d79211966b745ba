"""End-to-end genome-mode tests: self-consistency via the ground-truth error
log (the reference's own oracle mechanism) and output-format checks."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "refshim"))

from nanosim_tpu.io import PackedGenome
from nanosim_tpu.profiles import fixtures, profile
from nanosim_tpu.sim import output as out_mod
from nanosim_tpu.sim.genome_mode import GenomeSimulator

COMP = {"A": "T", "T": "A", "C": "G", "G": "C"}


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("g")
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=600, sd_read_len=200)
    ref_fa = str(d / "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [30000, 12000], seed=5)
    return d, prefix, ref_fa


def _run(setup, n=300, fastq=False, perfect=False, seed=3, **kw):
    d, prefix, ref_fa = setup
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome", fastq=fastq, perfect=perfect)
    sim = GenomeSimulator(genome, prof, fastq=fastq, perfect=perfect, batch=128, **kw)
    ext = ".fastq" if fastq else ".fasta"
    reads_path = str(d / f"out_aligned_reads{ext}")
    err_path = str(d / "out_errors")
    fw = out_mod.FastxWriter(reads_path, fastq)
    el = out_mod.ErrorLogWriter(err_path)
    w = out_mod.GenomeBatchWriter(fw, el, perfect=perfect)
    got = sim.run(n, w, seed=seed)
    fw.close()
    el.close()
    return genome, reads_path, err_path, got


def _parse_errors(err_path):
    by_read = {}
    with open(err_path) as f:
        for line in f:
            name, key, etype, elen, ref_b, seq_b = line.rstrip("\n").split("\t")
            by_read.setdefault(name, []).append((int(key), etype, int(elen), ref_b, seq_b))
    return by_read


def _apply_events(ref_slice, events):
    """Replay the error log onto the reference slice (reverse order, as
    mutate_read applies: simulator.py:1957-2004)."""
    read = ref_slice
    for key, etype, elen, ref_b, seq_b in events:  # already reverse-sorted
        if etype == "mis":
            read = read[:key] + seq_b + read[key + elen :]
        elif etype == "del":
            read = read[:key] + read[key + elen :]
        else:
            read = read[:key] + seq_b + read[key:]
    return read


def test_genome_fasta_consistency(setup):
    genome, reads_path, err_path, got = _run(setup, n=300)
    assert got >= 300
    from refshim.oracle import parse_fastx_records

    records = parse_fastx_records(reads_path)
    assert len(records) == 300
    errors = _parse_errors(err_path)

    n_checked = 0
    for name, seq, _ in records:
        parts = name.split("_")
        chrom, pos, kind, idx, strand, head, middle_ref, tail = parts
        assert kind == "aligned"
        pos, head, middle_ref, tail = int(pos), int(head), int(middle_ref), int(tail)
        ci = genome.names.index(chrom)
        ref_slice = genome.slice(ci, pos, middle_ref).tobytes().decode()
        mid_expected = _apply_events(ref_slice, errors.get(name, []))
        if strand == "R":
            seq = "".join(COMP.get(c, c) for c in reversed(seq))
        mid_actual = seq[head : len(seq) - tail]
        # positions where mid differs from ref must be exactly the error sites
        assert mid_actual == mid_expected, name
        assert len(seq) == head + len(mid_expected) + tail
        n_checked += 1
    assert n_checked == 300


def test_genome_fastq(setup):
    genome, reads_path, err_path, got = _run(setup, n=64, fastq=True)
    from refshim.oracle import parse_fastx_records

    records = parse_fastx_records(reads_path)
    assert len(records) == 64
    for name, seq, qual in records:
        assert qual is not None and len(qual) == len(seq)
        q = np.frombuffer(qual.encode(), np.uint8) - 33
        assert q.min() >= 1 and q.max() <= 93


def test_genome_perfect(setup):
    genome, reads_path, err_path, got = _run(setup, n=64, perfect=True)
    from refshim.oracle import parse_fastx_records

    records = parse_fastx_records(reads_path)
    assert len(records) == 64
    for name, seq, _ in records:
        parts = name.split("_")
        chrom, pos, kind, idx, strand, head, middle_ref, tail = parts
        assert kind == "perfect" and head == "0" and tail == "0"
        ci = genome.names.index(chrom)
        ref_slice = genome.slice(ci, int(pos), int(middle_ref)).tobytes().decode()
        if strand == "R":
            seq = "".join(COMP.get(c, c) for c in reversed(seq))
        assert seq == ref_slice


def test_genome_determinism(setup):
    _, p1, e1, _ = _run(setup, n=50, seed=7)
    import hashlib

    h1 = hashlib.sha256(open(p1, "rb").read()).hexdigest()
    _, p2, e2, _ = _run(setup, n=50, seed=7)
    h2 = hashlib.sha256(open(p2, "rb").read()).hexdigest()
    assert h1 == h2
    _, p3, _, _ = _run(setup, n=50, seed=8)
    h3 = hashlib.sha256(open(p3, "rb").read()).hexdigest()
    assert h1 != h3


def test_genome_circular(tmp_path):
    prefix = str(tmp_path / "training")
    fixtures.make_model_dir(prefix, mean_read_len=500, sd_read_len=150)
    ref_fa = str(tmp_path / "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [4000], seed=9)
    genome = PackedGenome.from_fasta(ref_fa, dna_type="circular")
    prof = profile.load_profile(prefix, mode="genome")
    sim = GenomeSimulator(genome, prof, circular_dna=True, batch=64)
    reads_path = str(tmp_path / "c_aligned_reads.fasta")
    fw = out_mod.FastxWriter(reads_path, False)
    el = out_mod.ErrorLogWriter(str(tmp_path / "c_err"))
    got = sim.run(40, out_mod.GenomeBatchWriter(fw, el), seed=1)
    fw.close()
    el.close()
    from refshim.oracle import parse_fastx_records

    records = parse_fastx_records(reads_path)
    assert len(records) == 40
    # some reads should wrap the origin
    wrapped = 0
    for name, seq, _ in records:
        pos = int(name.split("_")[1])
        mref = int(name.split("_")[-2])
        if pos + mref > 4000:
            wrapped += 1
    errors = _parse_errors(str(tmp_path / "c_err"))
    for name, seq, _ in records:
        parts = name.split("_")
        pos, head, middle_ref, tail = int(parts[1]), int(parts[-3]), int(parts[-2]), int(parts[-1])
        ref_slice = genome.slice(0, pos, middle_ref).tobytes().decode()
        mid = _apply_events(ref_slice, errors.get(name, []))
        s = seq
        if parts[4] == "R":
            s = "".join(COMP.get(c, c) for c in reversed(s))
        assert s[head : len(s) - tail] == mid, name


def test_bucketed_matches_unbucketed_default_profile(setup):
    """Length bucketing must not change output at all: draws are slot-keyed
    and numbering is slot-ordered, so the small/large-bucket split is purely
    an execution-shape choice."""
    import hashlib

    d, prefix, ref_fa = setup
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome")

    outs = {}
    for tag, bucketed in (("flat", False), ("bucketed", True)):
        sim = GenomeSimulator(genome, prof, batch=64)
        rp = str(d / f"bk_{tag}.fasta")
        fw = out_mod.FastxWriter(rp, False)
        el = out_mod.ErrorLogWriter(str(d / f"bk_{tag}_err"))
        got = sim.run(300, out_mod.GenomeBatchWriter(fw, el), seed=11, bucketed=bucketed)
        fw.close()
        el.close()
        assert got == 300
        outs[tag] = (
            hashlib.sha256(open(rp, "rb").read()).hexdigest(),
            hashlib.sha256(open(str(d / f"bk_{tag}_err"), "rb").read()).hexdigest(),
        )
        if tag == "bucketed":
            assert len(sim.plan_buckets()) >= 1
    assert outs["flat"] == outs["bucketed"]


def test_bucketed_matches_unbucketed(tmp_path):
    """Length-bucketed scheduling must reproduce the single-bucket output
    byte-for-byte: slot-keyed RNG makes draws independent of batch shape,
    and accepted lanes are merged in slot order."""
    import filecmp

    from nanosim_tpu.io import PackedGenome
    from nanosim_tpu.profiles import fixtures, profile as profmod
    from nanosim_tpu.sim import output
    from nanosim_tpu.sim.genome_mode import GenomeSimulator

    prefix = str(tmp_path / "training")
    fixtures.make_model_dir(prefix, mean_read_len=2000, sd_read_len=1500, n_kde_points=400)
    ref_fa = str(tmp_path / "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [300000, 200000], seed=9)
    prof = profmod.load_profile(prefix, mode="genome")
    genome = PackedGenome.from_fasta(ref_fa)
    sim = GenomeSimulator(genome, prof, batch=64)
    buckets = sim.plan_buckets()
    assert len(buckets) == 2, f"fixture must trigger bucketing, got {buckets}"

    def run(tag, bucketed):
        fa = output.FastxWriter(str(tmp_path / f"{tag}.fa"), False)
        el = output.ErrorLogWriter(str(tmp_path / f"{tag}.err"))
        w = output.GenomeBatchWriter(fa, el)
        n = sim.run(200, w, seed=11, bucketed=bucketed)
        fa.close()
        el.close()
        return n

    assert run("flat", False) == run("bucket", True) == 200
    for ext in (".fa", ".err"):
        assert filecmp.cmp(
            str(tmp_path / ("flat" + ext)), str(tmp_path / ("bucket" + ext)), shallow=False
        ), ext
