"""Transcriptome-mode tests: expression weighting, conditional lengths,
polyA, uracil, error-log replay, and intron retention vs an independent
host-side replication of the reference semantics."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "refshim"))

from refshim.oracle import parse_fastx_records

from nanosim_tpu.io import PackedGenome
from nanosim_tpu.profiles import error_model, fixtures, profile
from nanosim_tpu.sim.run_transcriptome import simulate_transcriptome

COMP = dict(zip("ACGT", "TGCA"))


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("trx")
    prefix = str(d / "training")
    fixtures.make_model_dir(
        prefix, mean_read_len=700, sd_read_len=200, transcriptome=True, mean_2d_ref_len=1500
    )
    trx_fa = str(d / "trx.fa")
    trxs = fixtures.make_transcript_reference(trx_fa, n_transcripts=25, mean_len=1800, seed=3)
    exp = str(d / "exp.tsv")
    fixtures.make_expression_tsv(exp, trxs, seed=4)
    polya = str(d / "polya.txt")
    with open(polya, "w") as f:
        for name, _ in trxs[:10]:
            f.write(name + "\n")
    return d, prefix, trx_fa, exp, polya, trxs


def _replay(ref_slice, events):
    read = ref_slice
    for key, etype, elen, ref_b, seq_b in events:
        if etype == "mis":
            read = read[:key] + seq_b + read[key + elen :]
        elif etype == "del":
            read = read[:key] + read[key + elen :]
        else:
            read = read[:key] + seq_b + read[key:]
    return read


def test_transcriptome_basic(setup):
    d, prefix, trx_fa, exp, polya, trxs = setup
    out = str(d / "sim")
    res = simulate_transcriptome(
        trx_fa, "", exp, prefix, out, number=200, model_ir=False,
        polya=polya, basecaller="guppy", seed=1, batch=128,
    )
    records = parse_fastx_records(out + "_aligned_reads.fasta")
    assert len(records) == res["aligned"] == 180

    genome = PackedGenome.from_fasta(trx_fa)
    name_idx = genome.name_index()
    lens = dict((n, l) for n, l in trxs)

    errors = {}
    with open(out + "_aligned_error_profile") as f:
        f.readline()
        for line in f:
            nm, key, et, el, rb, sb = line.rstrip("\n").split("\t")
            errors.setdefault(nm, []).append((int(key), et, int(el), rb, sb))

    n_polya = 0
    per_trx = {}
    for name, seq, _ in records:
        trx_name = name.split("_")[0]
        per_trx[trx_name] = per_trx.get(trx_name, 0) + 1
        fields = name.split("_")
        pos, head, mref = int(fields[1]), int(fields[-3]), int(fields[-2])
        tail_plus_pa = int(fields[-1])
        assert mref < lens[trx_name]
        s = seq
        if fields[-4] == "R":
            s = "".join(COMP.get(c, c) for c in reversed(s))
        ref_slice = genome.slice(name_idx[trx_name], pos, mref).tobytes().decode()
        mid = _replay(ref_slice, errors.get(name, []))
        got_mid = s[head : len(s) - tail_plus_pa]
        assert got_mid == mid, name
        # polyA tails: trailing As before the tail
        if tail_plus_pa > 3 and s[len(s) - tail_plus_pa - 1] == "A":
            n_polya += 1
    # expression weighting: the most-expressed transcript should dominate
    assert max(per_trx.values()) >= 2

    # unaligned transcriptome reads
    urecords = parse_fastx_records(out + "_unaligned_reads.fasta")
    assert len(urecords) == 20
    for name, seq, _ in urecords:
        assert "_unaligned_" in name


def test_transcriptome_uracil_fastq(setup):
    d, prefix, trx_fa, exp, polya, trxs = setup
    out = str(d / "simu")
    simulate_transcriptome(
        trx_fa, "", exp, prefix, out, number=40, model_ir=False,
        uracil=True, fastq=True, seed=2, batch=64,
    )
    records = parse_fastx_records(out + "_aligned_reads.fastq")
    assert len(records) == 36
    for name, seq, qual in records:
        assert "T" not in seq and "U" in seq
        assert len(qual) == len(seq)


def test_transcriptome_perfect(setup):
    d, prefix, trx_fa, exp, polya, trxs = setup
    out = str(d / "simp")
    simulate_transcriptome(
        trx_fa, "", exp, prefix, out, number=40, model_ir=False, perfect=True,
        seed=3, batch=64,
    )
    records = parse_fastx_records(out + "_aligned_reads.fasta")
    assert len(records) == 40
    genome = PackedGenome.from_fasta(trx_fa)
    name_idx = genome.name_index()
    for name, seq, _ in records:
        fields = name.split("_")
        assert fields[2] == "perfect"
        pos, mref = int(fields[1]), int(fields[-2])
        s = seq
        if fields[-4] == "R":
            s = "".join(COMP.get(c, c) for c in reversed(s))
        ref = genome.slice(name_idx[fields[0]], pos, mref).tobytes().decode()
        assert s == ref


def test_intron_retention(tmp_path):
    d = str(tmp_path)
    genome_fa, trx_fa, gff, trxs = fixtures.make_ir_fixture(d, n_transcripts=10, seed=7)
    prefix = os.path.join(d, "training")
    fixtures.make_model_dir(
        prefix, mean_read_len=600, sd_read_len=150, transcriptome=True, mean_2d_ref_len=1800
    )
    # high IR probabilities so retention is common
    error_model.write_ir_markov(
        prefix + "_IR_markov_model", np.array([[0.5, 0.5], [0.5, 0.5], [0.3, 0.7]])
    )
    exp = os.path.join(d, "exp.tsv")
    fixtures.make_expression_tsv(exp, trxs, seed=8)

    out = os.path.join(d, "sim")
    simulate_transcriptome(
        trx_fa, genome_fa, exp, prefix, out, number=150, model_ir=True, seed=5, batch=128
    )
    records = parse_fastx_records(out + "_aligned_reads.fasta")
    assert len(records) == 135
    ir_reads = [r for r in records if "_RetainedIntron_" in r[0]]
    assert len(ir_reads) > 10, "expected retained-intron reads"

    genome = PackedGenome.from_fasta(genome_fa)
    # every retained-intron interval must lie inside an annotated intron
    introns = []
    with open(gff) as f:
        for line in f:
            if "\tintron\t" in line:
                c = line.split("\t")
                introns.append((int(c[3]) - 1, int(c[4])))

    errors = {}
    with open(out + "_aligned_error_profile") as f:
        f.readline()
        for line in f:
            nm, key, et, el, rb, sb = line.rstrip("\n").split("\t")
            errors.setdefault(nm, []).append((int(key), et, int(el), rb, sb))

    for name, seq, _ in ir_reads:
        iv_part = name.split("_RetainedIntron_")[1].split("_")[0]
        for tup in iv_part.split(";"):
            if not tup:
                continue
            s_, e_ = (int(x) for x in tup.split("-"))
            assert any(s_ >= si and e_ <= ei for si, ei in introns), (name, s_, e_)

        # IR reads' middles replay consistently from the error log: events'
        # ref bases come from the IR-extracted segment, so match positions of
        # the read equal the log-reconstructed sequence except at unknown
        # (non-event, genome-interval) positions — verify length only here.
        fields = name.split("_")
        head, mref, tail = int(fields[-3]), int(fields[-2]), int(fields[-1])
        evs = errors.get(name, [])
        delta = sum(
            (e[2] if e[1] == "ins" else -e[2] if e[1] == "del" else 0) for e in evs
        )
        assert len(seq) == head + mref + delta + tail, name
