"""Host read reconstruction must be byte-identical to the device read path.

The meta-only batch program (emit_reads=False) + sim/reconstruct.py (and its
C++ mirror in native/fastwriter.cpp) replace the device's fused_read_v2
materialization + read transfer.  These tests run the SAME simulation twice —
device-materialized reads vs host-reconstructed — and require byte-equal
FASTA and error-log files, on genomes with and without IUPAC ambiguity
codes.
"""

import os

import numpy as np
import pytest

from nanosim_tpu.io import PackedGenome
from nanosim_tpu.profiles import fixtures, profile
from nanosim_tpu.sim import output as out_mod
from nanosim_tpu.sim.genome_mode import GenomeSimulator


def _run(d, tag, ref_fa, prefix, n, seed, recon, monkeypatch, batch=64,
         fastq=False):
    monkeypatch.setenv("NANOSIM_TPU_RECON", "1" if recon else "0")
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome", fastq=fastq)
    sim = GenomeSimulator(genome, prof, batch=batch, fastq=fastq)
    fa = str(d / (f"{tag}.fastq" if fastq else f"{tag}.fasta"))
    er = str(d / f"{tag}.err")
    fw = out_mod.FastxWriter(fa, fastq)
    el = out_mod.ErrorLogWriter(er)
    got = sim.run(n, out_mod.GenomeBatchWriter(fw, el), seed=seed)
    fw.close()
    el.close()
    assert got == n
    return fa, er


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("recon")
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=700, sd_read_len=250)
    ref_fa = str(d / "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [50000, 20000], seed=7)
    # IUPAC variant: sprinkle ambiguity codes through a copy of the genome
    iupac_fa = str(d / "ref_iupac.fa")
    rs = np.random.RandomState(3)
    lines = open(ref_fa).read().splitlines()
    amb = "NRYWSKMBDHV"
    out = []
    for line in lines:
        if line.startswith(">"):
            out.append(line)
            continue
        chars = list(line)
        for i in rs.choice(len(chars), max(1, len(chars) // 40), replace=False):
            chars[i] = amb[rs.randint(len(amb))]
        out.append("".join(chars))
    with open(iupac_fa, "w") as f:
        f.write("\n".join(out) + "\n")
    return d, prefix, ref_fa, iupac_fa


def test_recon_matches_device_reads(setup, monkeypatch):
    d, prefix, ref_fa, _ = setup
    fa0, er0 = _run(d, "dev", ref_fa, prefix, 150, 31, False, monkeypatch)
    fa1, er1 = _run(d, "rec", ref_fa, prefix, 150, 31, True, monkeypatch)
    assert open(fa0, "rb").read() == open(fa1, "rb").read()
    assert open(er0, "rb").read() == open(er1, "rb").read()


def test_recon_matches_device_reads_iupac(setup, monkeypatch):
    d, prefix, _, iupac_fa = setup
    fa0, er0 = _run(d, "devi", iupac_fa, prefix, 120, 5, False, monkeypatch)
    fa1, er1 = _run(d, "reci", iupac_fa, prefix, 120, 5, True, monkeypatch)
    assert open(fa0, "rb").read() == open(fa1, "rb").read()
    assert open(er0, "rb").read() == open(er1, "rb").read()


def test_recon_matches_device_reads_fastq(setup, monkeypatch):
    """FASTQ reconstruction: bases AND qualities byte-equal the device path
    (qualities are counter-addressed draws through the exact QualDevice
    breakpoint table on both sides)."""
    d, prefix, ref_fa, _ = setup
    fa0, er0 = _run(d, "devq", ref_fa, prefix, 120, 23, False, monkeypatch, fastq=True)
    fa1, er1 = _run(d, "recq", ref_fa, prefix, 120, 23, True, monkeypatch, fastq=True)
    assert open(fa0, "rb").read() == open(fa1, "rb").read()
    assert open(er0, "rb").read() == open(er1, "rb").read()


def test_recon_python_equals_native_fastq(setup, monkeypatch):
    from nanosim_tpu.io import native

    if native.get_lib() is None or not hasattr(native.get_lib(), "emit_batch_recon"):
        pytest.skip("native reconstruction not built")
    d, prefix, ref_fa, _ = setup
    fa0, er0 = _run(d, "natrecq", ref_fa, prefix, 80, 29, True, monkeypatch, fastq=True)
    monkeypatch.setattr(
        native.NativeEmitter, "recon_available", property(lambda self: False)
    )
    fa1, er1 = _run(d, "pyrecq", ref_fa, prefix, 80, 29, True, monkeypatch, fastq=True)
    assert open(fa0, "rb").read() == open(fa1, "rb").read()
    assert open(er0, "rb").read() == open(er1, "rb").read()


def test_recon_python_equals_native(setup, monkeypatch):
    """The C++ reconstruction and the numpy reference must agree (the numpy
    path is forced by disabling the native emitter)."""
    from nanosim_tpu.io import native

    if native.get_lib() is None or not hasattr(native.get_lib(), "emit_batch_recon"):
        pytest.skip("native reconstruction not built")
    d, prefix, ref_fa, _ = setup
    fa0, er0 = _run(d, "natrec", ref_fa, prefix, 100, 17, True, monkeypatch)

    import nanosim_tpu.sim.output as om

    class NoRecon:
        def __get__(self, obj, owner=None):
            return False

    monkeypatch.setattr(
        native.NativeEmitter, "recon_available", property(lambda self: False)
    )
    fa1, er1 = _run(d, "pyrec", ref_fa, prefix, 100, 17, True, monkeypatch)
    assert open(fa0, "rb").read() == open(fa1, "rb").read()
    assert open(er0, "rb").read() == open(er1, "rb").read()


# --- unaligned pass reconstruction ------------------------------------------


def _run_hp(d, tag, ref_fa, prefix, n, seed, recon, monkeypatch, fastq=False,
            k=5):
    monkeypatch.setenv("NANOSIM_TPU_RECON", "1" if recon else "0")
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome", fastq=fastq,
                                homopolymer=True)
    sim = GenomeSimulator(genome, prof, batch=64, fastq=fastq, kmer_bias=k)
    fa = str(d / (f"{tag}.fastq" if fastq else f"{tag}.fasta"))
    er = str(d / f"{tag}.err")
    fw = out_mod.FastxWriter(fa, fastq)
    el = out_mod.ErrorLogWriter(er)
    got = sim.run(n, out_mod.GenomeBatchWriter(fw, el), seed=seed)
    fw.close()
    el.close()
    assert got == n
    return fa, er


@pytest.fixture(scope="module")
def hp_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("reconhp")
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=600, sd_read_len=200)
    ref_fa = str(d / "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [40000, 20000], seed=19, hp_bias=0.6)
    return d, prefix, ref_fa


def test_hp_recon_matches_device(hp_setup, monkeypatch):
    d, prefix, ref_fa = hp_setup
    fa0, er0 = _run_hp(d, "hdev", ref_fa, prefix, 120, 11, False, monkeypatch)
    fa1, er1 = _run_hp(d, "hrec", ref_fa, prefix, 120, 11, True, monkeypatch)
    assert open(fa0, "rb").read() == open(fa1, "rb").read()
    assert open(er0, "rb").read() == open(er1, "rb").read()
    # non-vacuity: the -hp machinery must have fired
    assert os.path.getsize(er0) > 0


def test_hp_recon_matches_device_fastq(hp_setup, monkeypatch):
    d, prefix, ref_fa = hp_setup
    fa0, er0 = _run_hp(d, "hdevq", ref_fa, prefix, 120, 13, False, monkeypatch,
                       fastq=True)
    fa1, er1 = _run_hp(d, "hrecq", ref_fa, prefix, 120, 13, True, monkeypatch,
                       fastq=True)
    assert open(fa0, "rb").read() == open(fa1, "rb").read()
    assert open(er0, "rb").read() == open(er1, "rb").read()


def test_hp_recon_python_equals_native(hp_setup, monkeypatch):
    """The numpy reconstruct_hp_lane spec and the C++ emit_batch_recon_hp
    mirror must produce identical files (records + logs)."""
    from nanosim_tpu.io import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    d, prefix, ref_fa = hp_setup
    fa0, er0 = _run_hp(d, "hnat", ref_fa, prefix, 100, 17, True, monkeypatch,
                       fastq=True)
    monkeypatch.setattr(
        native.NativeEmitter, "recon_hp_available", property(lambda self: False)
    )
    fa1, er1 = _run_hp(d, "hpy", ref_fa, prefix, 100, 17, True, monkeypatch,
                       fastq=True)
    assert open(fa0, "rb").read() == open(fa1, "rb").read()
    assert open(er0, "rb").read() == open(er1, "rb").read()


def _run_unaligned(d, tag, ref_fa, prefix, n, seed, recon, monkeypatch, fastq=False):
    from nanosim_tpu.sim.unaligned_mode import UnalignedBatchWriter, UnalignedSimulator

    monkeypatch.setenv("NANOSIM_TPU_RECON", "1" if recon else "0")
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome", fastq=fastq)
    sim = UnalignedSimulator(genome, prof, batch=64, fastq=fastq)
    fa = str(d / (f"{tag}.fastq" if fastq else f"{tag}.fasta"))
    fw = out_mod.FastxWriter(fa, fastq)
    got = sim.run(n, UnalignedBatchWriter(fw), seed=seed)
    fw.close()
    assert got == n
    return fa


def test_unaligned_recon_matches_device(setup, monkeypatch):
    d, prefix, ref_fa, _ = setup
    fa0 = _run_unaligned(d, "udev", ref_fa, prefix, 120, 31, False, monkeypatch)
    fa1 = _run_unaligned(d, "urec", ref_fa, prefix, 120, 31, True, monkeypatch)
    assert open(fa0, "rb").read() == open(fa1, "rb").read()


def test_unaligned_recon_matches_device_iupac_fastq(setup, monkeypatch):
    d, prefix, _, iupac_fa = setup
    fa0 = _run_unaligned(d, "udevq", iupac_fa, prefix, 100, 7, False, monkeypatch, fastq=True)
    fa1 = _run_unaligned(d, "urecq", iupac_fa, prefix, 100, 7, True, monkeypatch, fastq=True)
    assert open(fa0, "rb").read() == open(fa1, "rb").read()


def test_unaligned_recon_python_equals_native(setup, monkeypatch):
    from nanosim_tpu.io import native

    if native.get_lib() is None or not hasattr(native.get_lib(), "emit_batch_recon_unaligned"):
        pytest.skip("native unaligned reconstruction not built")
    d, prefix, ref_fa, _ = setup
    fa0 = _run_unaligned(d, "unat", ref_fa, prefix, 80, 13, True, monkeypatch, fastq=True)
    import nanosim_tpu.sim.unaligned_mode as um

    class _NoLib:
        available = False

    monkeypatch.setattr(native.NativeEmitter, "available", property(lambda self: False))
    fa1 = _run_unaligned(d, "upy", ref_fa, prefix, 80, 13, True, monkeypatch, fastq=True)
    assert open(fa0, "rb").read() == open(fa1, "rb").read()


# --- chimeric reconstruction -------------------------------------------------


def _run_chimeric(d, tag, ref_fa, prefix, n, seed, recon, monkeypatch, fastq=False):
    from nanosim_tpu.sim.chimeric_mode import ChimericGenomeSimulator

    monkeypatch.setenv("NANOSIM_TPU_RECON", "1" if recon else "0")
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome", chimeric=True, fastq=fastq)
    sim = ChimericGenomeSimulator(genome, prof, batch=64, fastq=fastq)
    fa = str(d / (f"{tag}.fastq" if fastq else f"{tag}.fasta"))
    er = str(d / f"{tag}.err")
    fw = out_mod.FastxWriter(fa, fastq)
    el = out_mod.ErrorLogWriter(er)
    w = out_mod.ChimericBatchWriter(fw, el)
    got = sim.run(n, w, seed=seed)
    fw.close()
    el.close()
    assert got == n
    return fa, er


@pytest.fixture(scope="module")
def chi_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("chirec")
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=500, sd_read_len=180)
    from nanosim_tpu.profiles import error_model

    error_model.write_chimeric_info(prefix + "_chimeric_info", 1.8, 0.2)
    ref_fa = str(d / "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [40000, 15000], seed=9)
    return d, prefix, ref_fa


def test_chimeric_recon_matches_device(chi_setup, monkeypatch):
    d, prefix, ref_fa = chi_setup
    fa0, er0 = _run_chimeric(d, "cdev", ref_fa, prefix, 150, 7, False, monkeypatch)
    fa1, er1 = _run_chimeric(d, "crec", ref_fa, prefix, 150, 7, True, monkeypatch)
    a, b = open(fa0, "rb").read(), open(fa1, "rb").read()
    if a != b:
        ar, br = a.split(b">"), b.split(b">")
        for i, (x, y) in enumerate(zip(ar, br)):
            assert x == y, f"record {i} differs:\nDEV: {x[:400]}\nREC: {y[:400]}"
    assert a == b
    assert open(er0, "rb").read() == open(er1, "rb").read()


def test_chimeric_recon_matches_device_fastq(chi_setup, monkeypatch):
    d, prefix, ref_fa = chi_setup
    fa0, er0 = _run_chimeric(d, "cdevq", ref_fa, prefix, 120, 3, False, monkeypatch, fastq=True)
    fa1, er1 = _run_chimeric(d, "crecq", ref_fa, prefix, 120, 3, True, monkeypatch, fastq=True)
    a, b = open(fa0, "rb").read(), open(fa1, "rb").read()
    if a != b:
        ar, br = a.split(b"@"), b.split(b"@")
        for i, (x, y) in enumerate(zip(ar, br)):
            assert x == y, f"record {i} differs:\nDEV: {x[:400]}\nREC: {y[:400]}"
    assert a == b
    assert open(er0, "rb").read() == open(er1, "rb").read()


def test_metagenome_recon_matches_device(tmp_path, monkeypatch):
    """Metagenome (chimeric, multi-species, quota feedback) through host
    reconstruction must byte-equal the padded device path."""
    from nanosim_tpu.profiles import error_model
    from nanosim_tpu.sim.run_metagenome import simulate_metagenome

    d = str(tmp_path)
    prefix = os.path.join(d, "training")
    fixtures.make_model_dir(prefix, mean_read_len=400, sd_read_len=130)
    error_model.write_chimeric_info(prefix + "_chimeric_info", 1.5, 0.2)
    species = ["Escherichia_coli", "Bacillus_subtilis"]
    gl = os.path.join(d, "genome_list.tsv")
    with open(gl, "w") as f:
        for i, sp in enumerate(species):
            p = os.path.join(d, f"{sp}.fa")
            fixtures.make_reference_fasta(p, [30000], seed=40 + i, name_prefix=f"{sp[:3]}chr")
            f.write(f"{sp}\t{p}\n")
    dl = os.path.join(d, "dna_types.tsv")
    with open(dl, "w") as f:
        for sp in species:
            f.write(f"{sp}\t{sp[:3]}chr1\tlinear\n")
    abun = os.path.join(d, "abun.tsv")
    with open(abun, "w") as f:
        f.write("Species\t100\nEscherichia coli\t65\nBacillus subtilis\t35\n")

    outs = {}
    for tag, recon in (("dev", "0"), ("rec", "1")):
        monkeypatch.setenv("NANOSIM_TPU_RECON", recon)
        out = os.path.join(d, tag)
        simulate_metagenome(gl, abun, dl, prefix, out, chimeric=True,
                            seed=5, batch=64)
        outs[tag] = out
    a = open(outs["dev"] + "_sample0_aligned_reads.fasta", "rb").read()
    b = open(outs["rec"] + "_sample0_aligned_reads.fasta", "rb").read()
    if a != b:
        ar, br = a.split(b">"), b.split(b">")
        for i, (x, y) in enumerate(zip(ar, br)):
            assert x == y, f"record {i} differs:\nDEV: {x[:400]}\nREC: {y[:400]}"
    assert a == b
    assert (open(outs["dev"] + "_sample0_aligned_error_profile", "rb").read()
            == open(outs["rec"] + "_sample0_aligned_error_profile", "rb").read())


# --- transcriptome reconstruction --------------------------------------------


def _run_trx(d, tag, recon, monkeypatch, model_ir=False, uracil=False,
             fastq=False, n=100, seed=9):
    from nanosim_tpu.profiles import error_model
    from nanosim_tpu.sim.run_transcriptome import TranscriptomeSimulator, TrxBatchWriter

    monkeypatch.setenv("NANOSIM_TPU_RECON", "1" if recon else "0")
    prefix = str(d / "training")
    trx = PackedGenome.from_fasta(str(d / ("transcripts.fa" if model_ir else "trx.fa")))
    seq_len = dict(zip(trx.names, (int(x) for x in trx.lengths)))
    prof = profile.load_profile(prefix, mode="transcriptome", model_ir=model_ir,
                                polya_path=str(d / "polya.txt"), fastq=fastq)
    expression = profile.load_expression(str(d / "exp.tsv"), seq_len)
    kw = dict(model_ir=model_ir, batch=64, polya_scale=4.168299657168961,
              uracil=uracil, fastq=fastq)
    if model_ir:
        kw["ir_genome"] = PackedGenome.from_fasta(str(d / "genome.fa"))
    sim = TranscriptomeSimulator(trx, prof, expression, **kw)
    fa = str(d / (f"{tag}.fastq" if fastq else f"{tag}.fasta"))
    er = str(d / f"{tag}.err")
    fw = out_mod.FastxWriter(fa, fastq)
    el = out_mod.ErrorLogWriter(er)
    got = sim.run(n, TrxBatchWriter(fw, el), seed=seed)
    fw.close()
    el.close()
    assert got == n
    return fa, er


@pytest.fixture(scope="module")
def trx_setup(tmp_path_factory):
    from nanosim_tpu.profiles import error_model

    d = tmp_path_factory.mktemp("trxrec")
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=400, sd_read_len=150,
                            transcriptome=True, mean_2d_ref_len=1200)
    fixtures.make_reference_fasta(str(d / "trx.fa"), [2500] * 8 + [1200] * 5,
                                  seed=21, name_prefix="ENST")
    genome_fa, trx_fa, gff, trxs = fixtures.make_ir_fixture(str(d), n_transcripts=10, seed=7)
    error_model.write_ir_markov(
        prefix + "_IR_markov_model", np.array([[0.5, 0.5], [0.5, 0.5], [0.3, 0.7]])
    )
    trx = PackedGenome.from_fasta(str(d / "trx.fa"))
    all_names = list(trx.names) + [n for n, _ in trxs]
    all_lens = list(map(int, trx.lengths)) + [l for _, l in trxs]
    fixtures.make_expression_tsv(str(d / "exp.tsv"), list(zip(all_names, all_lens)), seed=8)
    with open(d / "polya.txt", "w") as f:
        for nm in all_names[:8]:
            f.write(nm + "\n")
    return d


def test_trx_recon_matches_device(trx_setup, monkeypatch):
    d = trx_setup
    fa0, er0 = _run_trx(d, "tdev", False, monkeypatch)
    fa1, er1 = _run_trx(d, "trec", True, monkeypatch)
    a, b = open(fa0, "rb").read(), open(fa1, "rb").read()
    if a != b:
        for i, (x, y) in enumerate(zip(a.split(b">"), b.split(b">"))):
            assert x == y, f"record {i} differs:\nDEV: {x[:400]}\nREC: {y[:400]}"
    assert a == b
    assert open(er0, "rb").read() == open(er1, "rb").read()


def test_trx_recon_matches_device_uracil_fastq(trx_setup, monkeypatch):
    d = trx_setup
    fa0, er0 = _run_trx(d, "tdevu", False, monkeypatch, uracil=True, fastq=True, seed=3)
    fa1, er1 = _run_trx(d, "trecu", True, monkeypatch, uracil=True, fastq=True, seed=3)
    a, b = open(fa0, "rb").read(), open(fa1, "rb").read()
    if a != b:
        for i, (x, y) in enumerate(zip(a.split(b"@"), b.split(b"@"))):
            assert x == y, f"record {i} differs:\nDEV: {x[:400]}\nREC: {y[:400]}"
    assert a == b
    assert open(er0, "rb").read() == open(er1, "rb").read()


def test_trx_recon_matches_device_ir(trx_setup, monkeypatch):
    d = trx_setup
    fa0, er0 = _run_trx(d, "tdevi", False, monkeypatch, model_ir=True, seed=11)
    fa1, er1 = _run_trx(d, "treci", True, monkeypatch, model_ir=True, seed=11)
    a, b = open(fa0, "rb").read(), open(fa1, "rb").read()
    if a != b:
        for i, (x, y) in enumerate(zip(a.split(b">"), b.split(b">"))):
            assert x == y, f"record {i} differs:\nDEV: {x[:400]}\nREC: {y[:400]}"
    assert a == b
    assert b"RetainedIntron" in a
    assert open(er0, "rb").read() == open(er1, "rb").read()


def _run_perfect(d, tag, ref_fa, prefix, n, seed, recon, monkeypatch,
                 fastq=False):
    monkeypatch.setenv("NANOSIM_TPU_RECON", "1" if recon else "0")
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome", fastq=fastq)
    sim = GenomeSimulator(genome, prof, batch=64, fastq=fastq, perfect=True)
    fa = str(d / (f"{tag}.fastq" if fastq else f"{tag}.fasta"))
    fw = out_mod.FastxWriter(fa, fastq)
    got = sim.run(n, out_mod.GenomeBatchWriter(fw, None, perfect=True), seed=seed)
    fw.close()
    assert got == n
    return fa


def test_perfect_recon_matches_device(setup, monkeypatch):
    """--perfect through host reconstruction: zero-event degenerate case of
    the recon spec (extraction + IUPAC + strand), byte-equal on an
    ambiguity-code genome."""
    d, prefix, _, iupac_fa = setup
    fa0 = _run_perfect(d, "perf_dev", iupac_fa, prefix, 150, 13, False, monkeypatch)
    fa1 = _run_perfect(d, "perf_rec", iupac_fa, prefix, 150, 13, True, monkeypatch)
    assert open(fa0, "rb").read() == open(fa1, "rb").read()


def test_perfect_recon_matches_device_fastq(setup, monkeypatch):
    d, prefix, ref_fa, _ = setup
    fa0 = _run_perfect(d, "perfq_dev", ref_fa, prefix, 120, 23, False,
                       monkeypatch, fastq=True)
    fa1 = _run_perfect(d, "perfq_rec", ref_fa, prefix, 120, 23, True,
                       monkeypatch, fastq=True)
    assert open(fa0, "rb").read() == open(fa1, "rb").read()


def test_metagenome_perfect_recon_matches_device(tmp_path, monkeypatch):
    """Metagenome --perfect through host reconstruction: zero-event chimeric
    recon (multi-segment extraction + strand), byte-equal to the device
    path including the perfect naming and species quota accounting."""
    from nanosim_tpu.profiles import error_model
    from nanosim_tpu.sim.run_metagenome import simulate_metagenome

    d = str(tmp_path)
    prefix = os.path.join(d, "training")
    fixtures.make_model_dir(prefix, mean_read_len=400, sd_read_len=130)
    error_model.write_chimeric_info(prefix + "_chimeric_info", 1.5, 0.2)
    species = ["Escherichia_coli", "Bacillus_subtilis"]
    gl = os.path.join(d, "genome_list.tsv")
    with open(gl, "w") as f:
        for i, sp in enumerate(species):
            p = os.path.join(d, f"{sp}.fa")
            fixtures.make_reference_fasta(p, [30000], seed=40 + i, name_prefix=f"{sp[:3]}chr")
            f.write(f"{sp}\t{p}\n")
    dl = os.path.join(d, "dna_types.tsv")
    with open(dl, "w") as f:
        for sp in species:
            f.write(f"{sp}\t{sp[:3]}chr1\tlinear\n")
    abun = os.path.join(d, "abun.tsv")
    with open(abun, "w") as f:
        f.write("Species\t100\nEscherichia coli\t65\nBacillus subtilis\t35\n")

    outs = {}
    for tag, recon in (("dev", "0"), ("rec", "1")):
        monkeypatch.setenv("NANOSIM_TPU_RECON", recon)
        out = os.path.join(d, tag)
        simulate_metagenome(gl, abun, dl, prefix, out, chimeric=True,
                            perfect=True, seed=5, batch=64)
        outs[tag] = out
    a = open(outs["dev"] + "_sample0_aligned_reads.fasta", "rb").read()
    b = open(outs["rec"] + "_sample0_aligned_reads.fasta", "rb").read()
    if a != b:
        ar, br = a.split(b">"), b.split(b">")
        for i, (x, y) in enumerate(zip(ar, br)):
            assert x == y, f"record {i} differs:\nDEV: {x[:400]}\nREC: {y[:400]}"
    assert a == b
    assert b.count(b"_perfect_") >= 50


def test_trx_perfect_recon_matches_device(trx_setup, monkeypatch):
    """Transcriptome --perfect through host reconstruction (zero-event
    middle + polyA retention + strand), byte-equal to the device path."""
    from nanosim_tpu.sim.run_transcriptome import TranscriptomeSimulator, TrxBatchWriter

    d = trx_setup
    outs = {}
    for tag, recon in (("pdev", False), ("prec", True)):
        monkeypatch.setenv("NANOSIM_TPU_RECON", "1" if recon else "0")
        trx = PackedGenome.from_fasta(str(d / "trx.fa"))
        seq_len = dict(zip(trx.names, (int(x) for x in trx.lengths)))
        prof = profile.load_profile(str(d / "training"), mode="transcriptome",
                                    model_ir=False, polya_path=str(d / "polya.txt"))
        expression = profile.load_expression(str(d / "exp.tsv"), seq_len)
        sim = TranscriptomeSimulator(trx, prof, expression, model_ir=False,
                                     batch=64, polya_scale=4.168299657168961,
                                     perfect=True)
        fa = str(d / f"{tag}.fasta")
        fw = out_mod.FastxWriter(fa, False)
        got = sim.run(100, TrxBatchWriter(fw, None, perfect=True), seed=13)
        fw.close()
        assert got == 100
        outs[tag] = fa
    a = open(outs["pdev"], "rb").read()
    b = open(outs["prec"], "rb").read()
    if a != b:
        for i, (x, y) in enumerate(zip(a.split(b">"), b.split(b">"))):
            assert x == y, f"record {i} differs:\nDEV: {x[:300]}\nREC: {y[:300]}"
    assert a == b
    assert a.count(b"_perfect_") == 100


def test_trx_emitter_qual_scratch_boundary():
    """Regression: the FASTQ quality-uniform scratch in the trx/unaligned
    recon emitters is filled in 8-wide threefry passes (up to total+7
    floats), but its resize guard only covered `total`.  A record slightly
    shorter than the previous one while crossing an 8-boundary (999 then
    1007 with a 1007-float buffer) overwrote the heap by up to 7 floats —
    seen as `double free or corruption` in the dRNA bench config."""
    import numpy as np

    from nanosim_tpu.io import native

    if native.get_lib() is None:
        import pytest

        pytest.skip("native emitter unavailable")
    em = native.NativeEmitter()
    totals = np.array([999, 1007], np.int64)
    zeros = np.zeros(2, np.int64)
    src = np.frombuffer(b"ACGT" * 300, np.uint8).copy()
    qb = np.zeros((5, 2), np.float32)
    qb[:, 1] = 0.5
    qv = np.full((5, 2), 30, np.int32)
    fastx, err = em.emit_trx_recon(
        seed=1, stream=0, ht_cap=64,
        slots=np.array([0, 1], np.int64), names=["r0", "r1"],
        total=totals, head=zeros, tail=zeros, pa_len=zeros,
        l_new=totals, middle_ref=totals, rev=np.zeros(2, np.uint8),
        ev_flat=np.zeros(1, np.uint32), ev_off=zeros,
        n_events=zeros,
        src_a=np.tile(src, 2)[: 2048], src_b=np.zeros(1, np.uint8),
        use_b=np.zeros(2, np.uint8), src_off=np.array([0, 0], np.int64),
        fastq=True, uracil=False, write_errors=False,
        qual_table=(qb, qv), n_threads=1,
    )
    lines = bytes(fastx).split(b"\n")
    assert lines[0] == b"@r0" and len(lines[1]) == 999 and len(lines[3]) == 999
    assert lines[4] == b"@r1" and len(lines[5]) == 1007 and len(lines[7]) == 1007
