"""Characterization tests.

The central test is a round trip: simulate reads from a known synthetic
model, reconstruct the alignment SAM (cs tags) from the simulator's own
ground-truth error log, characterize it, and verify the recovered model
files approximate the originals."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "refshim"))

from refshim.oracle import parse_fastx_records

from nanosim_tpu.io import PackedGenome
from nanosim_tpu.profiles import ecdf, error_model, fixtures, kde, profile
from nanosim_tpu.sim import output as out_mod
from nanosim_tpu.sim.genome_mode import GenomeSimulator
from nanosim_tpu.sim.unaligned_mode import UnalignedBatchWriter, UnalignedSimulator

COMP = dict(zip("ACGT", "TGCA"))


def _revcomp(s):
    return "".join(COMP.get(c, c) for c in reversed(s))


def _cs_and_cigar(ref_slice, events, head, tail, l_new):
    """cs tag + CIGAR from ground-truth events (ascending key order)."""
    evs = sorted(events, key=lambda e: (e[0], 0 if e[1] != "ins" else -1))
    cs = []
    cigar = []
    cursor = 0

    def add_cigar(n, op):
        if n <= 0:
            return
        if cigar and cigar[-1][1] == op:
            cigar[-1][0] += n
        else:
            cigar.append([n, op])

    for key, etype, elen, ref_b, seq_b in evs:
        if key > cursor:
            n = key - cursor
            cs.append(f":{n}")
            add_cigar(n, "M")
            cursor = key
        if etype == "mis":
            for rb, sb in zip(ref_b, seq_b):
                cs.append(f"*{rb.lower()}{sb.lower()}")
            add_cigar(elen, "M")
            cursor += elen
        elif etype == "del":
            cs.append("-" + ref_b.lower())
            add_cigar(elen, "D")
            cursor += elen
        else:
            cs.append("+" + seq_b.lower())
            add_cigar(elen, "I")
    if cursor < len(ref_slice):
        n = len(ref_slice) - cursor
        cs.append(f":{n}")
        add_cigar(n, "M")
    return "".join(cs), cigar


def build_sam_from_ground_truth(genome, records, errors, out_path, quals=None):
    """SAM text with cs tags reconstructed from simulator ground truth."""
    with open(out_path, "w") as f:
        f.write("@HD\tVN:1.6\tSO:unsorted\n")
        for nm, ln in zip(genome.names, genome.lengths):
            f.write(f"@SQ\tSN:{nm}\tLN:{ln}\n")
        for name, seq, qual in records:
            parts = name.split("_")
            if "unaligned" in parts:
                f.write(f"{name}\t4\t*\t0\t0\t*\t*\t0\t0\t{seq}\t{qual or '*'}\n")
                continue
            chrom, pos = parts[0], int(parts[1])
            strand, head, mref, tail = parts[-4], int(parts[-3]), int(parts[-2]), int(parts[-1])
            pre = _revcomp(seq) if strand == "R" else seq
            pre_q = qual[::-1] if (qual and strand == "R") else qual
            l_new = len(pre) - head - tail
            ci = genome.names.index(chrom)
            ref_slice = genome.slice(ci, pos, mref).tobytes().decode()
            evs = errors.get(name, [])
            cs, cigar = _cs_and_cigar(ref_slice, evs, head, tail, l_new)
            flag = 16 if strand == "R" else 0
            # SAM stores SEQ in reference-forward orientation
            sam_seq = pre
            sam_q = pre_q or "*"
            cig = ""
            lead, trail = (head, tail)
            if lead:
                cig += f"{lead}S"
            cig += "".join(f"{n}{op}" for n, op in cigar)
            if trail:
                cig += f"{trail}S"
            f.write(
                f"{name}\t{flag}\t{chrom}\t{pos + 1}\t60\t{cig}\t*\t0\t0\t{sam_seq}\t{sam_q}"
                f"\tNM:i:0\tcs:Z:{cs}\n"
            )


@pytest.fixture(scope="module")
def roundtrip(tmp_path_factory):
    d = tmp_path_factory.mktemp("char")
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=800, sd_read_len=250)
    ref_fa = str(d / "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [60000, 30000], seed=21)
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome", fastq=True)

    sim = GenomeSimulator(genome, prof, fastq=True, batch=256)
    fw = out_mod.FastxWriter(str(d / "reads_aligned.fastq"), True)
    el = out_mod.ErrorLogWriter(str(d / "err"))
    sim.run(700, out_mod.GenomeBatchWriter(fw, el), seed=9)
    fw.close()
    el.close()
    usim = UnalignedSimulator(genome, prof, fastq=True, batch=256)
    ufw = out_mod.FastxWriter(str(d / "reads_unaligned.fastq"), True)
    usim.run(78, UnalignedBatchWriter(ufw), seed=9)
    ufw.close()

    records = parse_fastx_records(str(d / "reads_aligned.fastq"))
    urecords = parse_fastx_records(str(d / "reads_unaligned.fastq"))
    errors = {}
    with open(str(d / "err")) as f:
        for line in f:
            nm, key, et, elen, rb, sb = line.rstrip("\n").split("\t")
            errors.setdefault(nm, []).append((int(key), et, int(elen), rb, sb))

    sam_path = str(d / "gt.sam")
    build_sam_from_ground_truth(genome, records + urecords, errors, sam_path)

    out_prefix = str(d / "refit")
    from nanosim_tpu.characterization.main import characterize_genome

    characterize_genome(
        str(d / "reads_aligned.fastq"), ref_fa, out_prefix, g_alnm=sam_path, fastq=True
    )
    return d, prefix, out_prefix, records


def test_roundtrip_rates(roundtrip):
    d, orig, refit, records = roundtrip
    strandness = error_model.read_strandness(refit + "_strandness_rate")
    assert 0.4 <= strandness <= 0.6
    rate = error_model.read_alignment_rate(refit + "_reads_alignment_rate")
    assert rate is not None and 7.0 <= rate <= 11.5


def test_roundtrip_error_markov(roundtrip):
    d, orig, refit, records = roundtrip
    got = error_model.read_error_markov(refit + "_error_markov_model")
    want = error_model.read_error_markov(orig + "_error_markov_model")
    # transition rows are empirical estimates; rows with enough mass converge
    np.testing.assert_allclose(got[0], want[0], atol=0.05)  # start row
    for r in range(1, 4):  # mis/ins/del rows
        np.testing.assert_allclose(got[r], want[r], atol=0.08)


def test_roundtrip_first_match_and_match_ecdf(roundtrip):
    d, orig, refit, records = roundtrip

    def mean_of(table, lane=0):
        n = table.n_entries[lane]
        p = np.concatenate([[0.0], table.p_hi[lane, :n]])
        w = np.diff(p)
        v = 0.5 * (table.v_lo[lane, :n] + table.v_hi[lane, :n])
        return float((w * v).sum() / max(w.sum(), 1e-9))

    got_fm = ecdf.read_ecdf_file(refit + "_first_match.hist")
    want_fm = ecdf.read_ecdf_file(orig + "_first_match.hist")
    assert abs(mean_of(got_fm) - mean_of(want_fm)) < 3.0

    got_mm = ecdf.read_ecdf_file(refit + "_match_markov_model")
    assert got_mm.n_bins >= 10  # 15 bins unless mass collapses


def test_roundtrip_error_rates(roundtrip):
    d, orig, refit, records = roundtrip
    rates = {}
    with open(refit + "_error_rate.tsv") as f:
        for line in f:
            k, v = line.split("\t")
            rates[k.strip(":")] = float(v)
    # fixture's walk yields a few percent of each error type
    assert 0.005 < rates["Mismatch rate"] < 0.2
    assert 0.005 < rates["Insertion rate"] < 0.2
    assert 0.005 < rates["Deletion rate"] < 0.2


def test_roundtrip_length_kdes(roundtrip):
    d, orig, refit, records = roundtrip
    got = kde.load_kde(refit + "_aligned_region.pkl")
    want = kde.load_kde(orig + "_aligned_region.pkl")
    assert abs(got.data.mean() - want.data.mean()) < 110
    for suffix in ("_aligned_reads.pkl", "_ht_length.pkl", "_ht_ratio.pkl", "_unaligned_length.pkl"):
        assert os.path.exists(refit + suffix), suffix


def test_roundtrip_model_profile(roundtrip):
    d, orig, refit, records = roundtrip
    got = error_model.read_model_profile(refit + "_model_profile")
    want = error_model.read_model_profile(orig + "_model_profile")

    # compare implied mean error lengths rather than raw parameters
    from nanosim_tpu.ops.tables import MixtureDevice

    def mean_len(params, row):
        dev = MixtureDevice.from_params(params, 256)
        cdf = np.asarray(dev.cdf[row], np.float64)
        pmf = np.diff(np.concatenate([[0.0], cdf]))
        return float((pmf * np.arange(1, len(pmf) + 1)).sum())

    for row in range(3):
        g, w = mean_len(got, row), mean_len(want, row)
        assert abs(g - w) < max(0.35 * w, 0.35), (row, g, w)


def test_roundtrip_base_quality(roundtrip):
    d, orig, refit, records = roundtrip
    got = error_model.read_base_quality_params(refit + "_base_qualities_model_parameters.tsv")
    want = error_model.read_base_quality_params(orig + "_base_qualities_model_parameters.tsv")
    for cls in ("match", "mis", "ins", "ht", "unmapped"):
        # medians (= exp(mu)) should agree within ~20%
        assert abs(np.exp(got[cls]["mu"]) - np.exp(want[cls]["mu"])) < 0.25 * np.exp(
            want[cls]["mu"]
        ) + 1.0, cls


def test_em_meta():
    from nanosim_tpu.characterization.primary import EM_meta

    reads = {}
    for i in range(60):
        reads[(f"r{i}", (0, 100))] = ["A"]
    for i in range(60, 80):
        reads[(f"r{i}", (0, 100))] = ["B"]
    for i in range(80, 100):
        reads[(f"r{i}", (0, 100))] = ["A", "B"]
    ab = EM_meta(reads, {"A": 0, "B": 0})
    assert 60 < ab["A"] < 80 and 20 < ab["B"] < 40
    assert abs(ab["A"] + ab["B"] - 100) < 1e-6


def test_em_trans_tpm():
    from nanosim_tpu.characterization.primary import EM_trans

    reads = {}
    for i in range(80):
        reads[(f"r{i}", (0, 50))] = ["T1"]
    for i in range(80, 100):
        reads[(f"r{i}", (0, 50))] = ["T2"]
    tpm = EM_trans(reads, {"T1": 1000, "T2": 2000}, normalize=True)
    assert tpm["T1"][0] == 80 and tpm["T2"][0] == 20
    total_tpm = tpm["T1"][1] + tpm["T2"][1]
    assert abs(total_tpm - 1e6) < 1.0
    # normalization by length: T1 is shorter so its TPM share exceeds 80%
    assert tpm["T1"][1] / total_tpm > 0.85


def test_piecewise_fit():
    from nanosim_tpu.characterization.hp_model import fit_piecewise_1bp

    x = np.arange(4, 30, dtype=np.float64)
    y = 0.5 + 0.9 * x + (-0.3) * np.maximum(x - 14, 0)
    c, a, b, bp = fit_piecewise_1bp(x, y)
    assert abs(c - 0.5) < 0.2 and abs(a - 0.9) < 0.05
    assert abs(b + 0.3) < 0.05 and abs(bp - 14) < 1.5


def test_quantify_meta(tmp_path):
    """Metagenome quantify mode: base-weighted EM abundance from a crafted
    species-tagged SAM."""
    from nanosim_tpu.characterization.main import quantify
    from nanosim_tpu.profiles import fixtures as fx

    d = str(tmp_path)
    fx.make_reference_fasta(os.path.join(d, "a.fa"), [4000], seed=1, name_prefix="ac")
    fx.make_reference_fasta(os.path.join(d, "b.fa"), [4000], seed=2, name_prefix="bc")
    gl = os.path.join(d, "gl.tsv")
    with open(gl, "w") as f:
        f.write(f"Alpha\t{d}/a.fa\t70\nBeta\t{d}/b.fa\t30\n")

    sam = os.path.join(d, "aln.sam")
    with open(sam, "w") as f:
        f.write("@SQ\tSN:Alpha_ac1\tLN:4000\n@SQ\tSN:Beta_bc1\tLN:4000\n")
        for i in range(70):
            f.write(f"r{i}\t0\tAlpha_ac1\t10\t60\t200M\t*\t0\t0\t{'A' * 200}\t*\tNM:i:0\n")
        for i in range(70, 100):
            f.write(f"r{i}\t0\tBeta_bc1\t10\t60\t200M\t*\t0\t0\t{'A' * 200}\t*\tNM:i:0\n")
    quantify("unused", prefix=os.path.join(d, "q"), mode="meta", genome_list=gl, g_alnm=sam)
    abun = {}
    with open(os.path.join(d, "q_quantification.tsv")) as f:
        f.readline()
        for line in f:
            k, v = line.split("\t")
            abun[k] = float(v)
    assert abs(abun["Alpha"] - 70) < 2 and abs(abun["Beta"] - 30) < 2
