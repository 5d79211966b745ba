"""Kill-and-resume byte identity for every mode with a resume path
(VERDICT r2 item 7): transcriptome, metagenome (quota + RNG state), the
unaligned pass, and the bucketed genome scheduler."""

import filecmp
import os

import numpy as np
import pytest

from nanosim_tpu.io import PackedGenome
from nanosim_tpu.profiles import error_model, fixtures, profile
from nanosim_tpu.sim import output as out_mod


def test_transcriptome_kill_and_resume(tmp_path):
    from nanosim_tpu.sim.run_transcriptome import TranscriptomeSimulator, TrxBatchWriter

    d = tmp_path
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=300, sd_read_len=100,
                            transcriptome=True, mean_2d_ref_len=900)
    trx_fa = str(d / "trx.fa")
    fixtures.make_reference_fasta(trx_fa, [3000] * 12, seed=3, name_prefix="trx")
    trx = PackedGenome.from_fasta(trx_fa)
    prof = profile.load_profile(prefix, mode="transcriptome", model_ir=False)
    seq_len = dict(zip(trx.names, (int(x) for x in trx.lengths)))
    exp = str(d / "exp.tsv")
    fixtures.make_expression_tsv(exp, [(n, int(l)) for n, l in seq_len.items()], seed=5)
    expression = profile.load_expression(exp, seq_len)
    quota, seed = 150, 3

    def make_sim():
        return TranscriptomeSimulator(trx, prof, expression, model_ir=False, batch=64)

    fw = out_mod.FastxWriter(str(d / "uni.fasta"), False)
    el = out_mod.ErrorLogWriter(str(d / "uni.err"))
    got = make_sim().run(quota, TrxBatchWriter(fw, el), seed=seed)
    fw.close(); el.close()
    assert got == quota

    state = str(d / "t.resume.json")
    fw = out_mod.FastxWriter(str(d / "res.fasta"), False)
    el = out_mod.ErrorLogWriter(str(d / "res.err"))
    got1 = make_sim().run(quota, TrxBatchWriter(fw, el), seed=seed,
                          max_batches=1, resume_state=state)
    fw.close(); el.close()
    assert 0 < got1 < quota and os.path.exists(state)

    fw = out_mod.FastxWriter(str(d / "res.fasta"), False, append=True)
    el = out_mod.ErrorLogWriter(str(d / "res.err"), append=True)
    got2 = make_sim().run(quota, TrxBatchWriter(fw, el), seed=seed, resume_state=state)
    fw.close(); el.close()
    assert got2 == quota
    assert filecmp.cmp(str(d / "uni.fasta"), str(d / "res.fasta"), shallow=False)
    assert filecmp.cmp(str(d / "uni.err"), str(d / "res.err"), shallow=False)


def test_metagenome_kill_and_resume(tmp_path):
    from nanosim_tpu.io.genome import MetagenomeSet
    from nanosim_tpu.sim.run_metagenome import MetagenomeSimulator

    d = tmp_path
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=300, sd_read_len=100)
    error_model.write_chimeric_info(prefix + "_chimeric_info", 1.5, 0.2)
    species = ["Escherichia_coli", "Bacillus_subtilis"]
    gl = str(d / "gl.tsv")
    with open(gl, "w") as f:
        for i, sp in enumerate(species):
            p = str(d / f"{sp}.fa")
            fixtures.make_reference_fasta(p, [30000], seed=20 + i, name_prefix=f"{sp[:3]}c")
            f.write(f"{sp}\t{p}\n")
    dl = str(d / "dl.tsv")
    with open(dl, "w") as f:
        for sp in species:
            f.write(f"{sp}\t{sp[:3]}c1\tlinear\n")
    mset = MetagenomeSet.from_genome_list(gl, dl)
    prof = profile.load_profile(prefix, mode="metagenome", chimeric=True)
    abun = {"Escherichia_coli": 70.0, "Bacillus_subtilis": 30.0}
    quota, seed = 120, 11

    def make_sim():
        return MetagenomeSimulator(mset, prof, abun, chimeric=True, batch=64)

    def writer_for(fa, er):
        fw = out_mod.FastxWriter(fa, False)
        el = out_mod.ErrorLogWriter(er)
        w = out_mod.ChimericBatchWriter(
            fw, el, species_names=mset.species_names,
            species_of_chrom=mset.species_of_chrom, metagenome=True)
        return fw, el, w

    fw, el, w = writer_for(str(d / "uni.fasta"), str(d / "uni.err"))
    got = make_sim().run(quota, w, seed=seed)
    fw.close(); el.close()
    assert got == quota

    state = str(d / "m.resume.json")
    fw, el, w = writer_for(str(d / "res.fasta"), str(d / "res.err"))
    got1 = make_sim().run(quota, w, seed=seed, max_batches=1, resume_state=state)
    fw.close(); el.close()
    assert 0 < got1 < quota and os.path.exists(state)

    fw = out_mod.FastxWriter(str(d / "res.fasta"), False, append=True)
    el = out_mod.ErrorLogWriter(str(d / "res.err"), append=True)
    w = out_mod.ChimericBatchWriter(
        fw, el, species_names=mset.species_names,
        species_of_chrom=mset.species_of_chrom, metagenome=True)
    got2 = make_sim().run(quota, w, seed=seed, resume_state=state)
    fw.close(); el.close()
    assert got2 == quota
    assert filecmp.cmp(str(d / "uni.fasta"), str(d / "res.fasta"), shallow=False)
    assert filecmp.cmp(str(d / "uni.err"), str(d / "res.err"), shallow=False)


def test_unaligned_kill_and_resume(tmp_path):
    from nanosim_tpu.sim.unaligned_mode import UnalignedBatchWriter, UnalignedSimulator

    d = tmp_path
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=400, sd_read_len=120)
    ref_fa = str(d / "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [50000], seed=4)
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome")
    quota, seed = 150, 9

    fw = out_mod.FastxWriter(str(d / "uni.fasta"), False)
    got = UnalignedSimulator(genome, prof, batch=64).run(
        quota, UnalignedBatchWriter(fw), seed=seed)
    fw.close()
    assert got == quota

    state = str(d / "u.resume.json")
    fw = out_mod.FastxWriter(str(d / "res.fasta"), False)
    got1 = UnalignedSimulator(genome, prof, batch=64).run(
        quota, UnalignedBatchWriter(fw), seed=seed, max_batches=1, resume_state=state)
    fw.close()
    assert 0 < got1 < quota
    fw = out_mod.FastxWriter(str(d / "res.fasta"), False, append=True)
    got2 = UnalignedSimulator(genome, prof, batch=64).run(
        quota, UnalignedBatchWriter(fw), seed=seed, resume_state=state)
    fw.close()
    assert got2 == quota
    assert filecmp.cmp(str(d / "uni.fasta"), str(d / "res.fasta"), shallow=False)


def test_bucketed_kill_and_resume(tmp_path, monkeypatch):
    from nanosim_tpu.sim.genome_mode import GenomeSimulator

    d = tmp_path
    prefix = str(d / "training")
    # heavy-tailed model so plan_buckets yields two buckets
    fixtures.make_model_dir(prefix, mean_read_len=600, sd_read_len=500)
    ref_fa = str(d / "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [60000], seed=6)
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome")
    quota, seed = 420, 13  # > one 4*batch block's yield

    def make_sim():
        return GenomeSimulator(genome, prof, batch=64)

    if len(make_sim().plan_buckets()) < 2:
        pytest.skip("fixture yields a single bucket")
    monkeypatch.setenv("NANOSIM_TPU_BUCKETED", "1")

    fw = out_mod.FastxWriter(str(d / "uni.fasta"), False)
    el = out_mod.ErrorLogWriter(str(d / "uni.err"))
    got = make_sim().run(quota, out_mod.GenomeBatchWriter(fw, el), seed=seed)
    fw.close(); el.close()
    assert got == quota

    # interrupted after one block (max_batches acts as the block cap)
    state = str(d / "b.resume.json")
    fw = out_mod.FastxWriter(str(d / "res.fasta"), False)
    el = out_mod.ErrorLogWriter(str(d / "res.err"))
    got1 = make_sim().run(quota, out_mod.GenomeBatchWriter(fw, el), seed=seed,
                          resume_state=state, max_batches=1)
    fw.close(); el.close()
    assert 0 < got1 < quota and os.path.exists(state)

    fw = out_mod.FastxWriter(str(d / "res.fasta"), False, append=True)
    el = out_mod.ErrorLogWriter(str(d / "res.err"), append=True)
    got2 = make_sim().run(quota, out_mod.GenomeBatchWriter(fw, el), seed=seed,
                          resume_state=state)
    fw.close(); el.close()
    assert got2 == quota

    # resumed output must byte-extend the uninterrupted run's
    uni = open(str(d / "uni.fasta"), "rb").read()
    res = open(str(d / "res.fasta"), "rb").read()
    assert res == uni or res.startswith(uni) or uni.startswith(res), \
        "bucketed resume diverged from the uninterrupted run"
    assert res == uni
