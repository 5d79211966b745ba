"""Multi-host driver: per-host shard files merge to the single-driver output."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "refshim"))

from refshim.oracle import parse_fastx_records

from nanosim_tpu.io import PackedGenome
from nanosim_tpu.parallel import MultiHostGenomeRunner, make_mesh, merge_host_shards
from nanosim_tpu.profiles import fixtures, profile
from nanosim_tpu.sim import output as out_mod
from nanosim_tpu.sim.genome_mode import GenomeSimulator


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("mh")
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=300, sd_read_len=100)
    ref_fa = str(d / "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [30000], seed=7)
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome")
    return d, genome, prof


def _read_err(path, skip_header=True):
    rows = {}
    with open(path) as f:
        if skip_header:
            f.readline()
        for line in f:
            nm = line.split("\t", 1)[0]
            rows.setdefault(nm, []).append(line)
    return rows


def test_four_hosts_merge_equals_single(setup):
    d, genome, prof = setup
    quota, seed = 150, 11

    # single-driver run
    sim = GenomeSimulator(genome, prof, batch=64)
    fw = out_mod.FastxWriter(str(d / "flat.fasta"), False)
    el = out_mod.ErrorLogWriter(str(d / "flat_err"), header=True)
    got = sim.run(quota, out_mod.GenomeBatchWriter(fw, el), seed=seed)
    fw.close()
    el.close()
    assert got == quota

    # 4 emulated hosts x 2 devices over the same mesh/batch/seed
    mesh = make_mesh(8)
    shard_fastas, shard_errs = [], []
    host_written = []
    for h in range(4):
        sim_h = GenomeSimulator(genome, prof, batch=64)
        runner = MultiHostGenomeRunner(sim_h, n_hosts=4, host_id=h, mesh=mesh)
        fa = str(d / f"shard{h}.fasta")
        er = str(d / f"shard{h}_err")
        fw = out_mod.FastxWriter(fa, False)
        el = out_mod.ErrorLogWriter(er)
        w = out_mod.GenomeBatchWriter(fw, el)
        host_written.append(runner.run(quota, w, seed=seed))
        fw.close()
        el.close()
        shard_fastas.append(fa)
        shard_errs.append(er)

    assert sum(host_written) == quota

    merge_host_shards(str(d / "merged.fasta"), shard_fastas)
    merge_host_shards(str(d / "merged_err"), shard_errs,
                      header="Seq_name\tSeq_pos\terror_type\terror_length\tref_base\tseq_base\n")

    flat = sorted(parse_fastx_records(str(d / "flat.fasta")),
                  key=lambda r: int(r[0].split("_")[3]))
    merged = sorted(parse_fastx_records(str(d / "merged.fasta")),
                    key=lambda r: int(r[0].split("_")[3]))
    assert [r[0] for r in flat] == [r[0] for r in merged]
    assert [r[1] for r in flat] == [r[1] for r in merged]
    # numbering is gapless 0..quota-1
    assert [int(r[0].split("_")[3]) for r in merged] == list(range(quota))

    assert _read_err(str(d / "flat_err")) == _read_err(str(d / "merged_err"))


def test_host_shards_are_disjoint(setup):
    d, _, _ = setup
    seen = set()
    for h in range(4):
        for name, _, _ in parse_fastx_records(str(d / f"shard{h}.fasta")):
            assert name not in seen
            seen.add(name)
    assert len(seen) == 150


def _sorted_records(path, idx_field=None):
    recs = parse_fastx_records(path)

    def key(r):
        parts = r[0].split("_")
        for p in parts:
            if p.isdigit():
                pass
        # sequence index: the token after 'aligned'/'perfect'
        toks = r[0].replace(";", "_").split("_")
        for i, t in enumerate(toks):
            if t in ("aligned", "perfect"):
                return int(toks[i + 1])
        raise AssertionError(r[0])

    return sorted(recs, key=key)


def test_multihost_chimeric_genome(setup):
    """Chimeric genome mode: 2 emulated hosts x 4 devices == single driver."""
    from nanosim_tpu.parallel import MultiHostModeRunner
    from nanosim_tpu.sim.chimeric_mode import ChimericGenomeSimulator

    d, genome, _ = setup
    from nanosim_tpu.profiles import error_model

    prefix = str(d / "ctraining")
    fixtures.make_model_dir(prefix, mean_read_len=300, sd_read_len=100)
    error_model.write_chimeric_info(prefix + "_chimeric_info", 1.6, 0.2)
    prof = profile.load_profile(prefix, mode="genome", chimeric=True)
    quota, seed = 90, 13

    sim = ChimericGenomeSimulator(genome, prof, batch=64)
    fw = out_mod.FastxWriter(str(d / "cflat.fasta"), False)
    el = out_mod.ErrorLogWriter(str(d / "cflat_err"), header=True)
    got = sim.run(quota, out_mod.ChimericBatchWriter(fw, el), seed=seed)
    fw.close()
    el.close()
    assert got == quota

    mesh = make_mesh(8)
    shards, errs = [], []
    for h in range(2):
        sim_h = ChimericGenomeSimulator(genome, prof, batch=64)
        runner = MultiHostModeRunner(sim_h, n_hosts=2, host_id=h, mesh=mesh)
        fa = str(d / f"cshard{h}.fasta")
        er = str(d / f"cshard{h}_err")
        fw = out_mod.FastxWriter(fa, False)
        el = out_mod.ErrorLogWriter(er)
        runner.run(quota, out_mod.ChimericBatchWriter(fw, el), seed=seed)
        fw.close()
        el.close()
        shards.append(fa)
        errs.append(er)
    merge_host_shards(str(d / "cmerged.fasta"), shards)
    merge_host_shards(str(d / "cmerged_err"), errs,
                      header="Seq_name\tSeq_pos\terror_type\terror_length\tref_base\tseq_base\n")
    flat = _sorted_records(str(d / "cflat.fasta"))
    merged = _sorted_records(str(d / "cmerged.fasta"))
    assert [r[0] for r in flat] == [r[0] for r in merged]
    assert [r[1] for r in flat] == [r[1] for r in merged]
    assert _read_err(str(d / "cflat_err")) == _read_err(str(d / "cmerged_err"))


def test_multihost_transcriptome(tmp_path):
    """Transcriptome mode: 2 emulated hosts x 4 devices == single driver."""
    from nanosim_tpu.parallel import MultiHostModeRunner
    from nanosim_tpu.profiles import profile as profmod
    from nanosim_tpu.sim import output
    from nanosim_tpu.sim.run_transcriptome import TranscriptomeSimulator, TrxBatchWriter

    d = tmp_path
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=500, sd_read_len=150,
                            transcriptome=True, mean_2d_ref_len=1200)
    trx_fa = str(d / "trx.fa")
    trxs = fixtures.make_transcript_reference(trx_fa, n_transcripts=20, mean_len=1500, seed=3)
    exp = str(d / "exp.tsv")
    fixtures.make_expression_tsv(exp, trxs, seed=4)
    transcriptome = PackedGenome.from_fasta(trx_fa)
    prof = profmod.load_profile(prefix, mode="transcriptome", model_ir=False)
    seq_len = dict(zip(transcriptome.names, (int(x) for x in transcriptome.lengths)))
    expression = profmod.load_expression(exp, seq_len)
    quota, seed = 80, 9

    def make_sim():
        return TranscriptomeSimulator(
            transcriptome, prof, expression, model_ir=False, batch=64,
        )

    sim = make_sim()
    fw = output.FastxWriter(str(d / "tflat.fasta"), False)
    el = output.ErrorLogWriter(str(d / "tflat_err"), header=True)
    got = sim.run(quota, TrxBatchWriter(fw, el), seed=seed)
    fw.close()
    el.close()
    assert got == quota

    mesh = make_mesh(8)
    shards, errs = [], []
    for h in range(2):
        runner = MultiHostModeRunner(make_sim(), n_hosts=2, host_id=h, mesh=mesh)
        fa = str(d / f"tshard{h}.fasta")
        er = str(d / f"tshard{h}_err")
        fw = output.FastxWriter(fa, False)
        el = output.ErrorLogWriter(er)
        runner.run(quota, TrxBatchWriter(fw, el), seed=seed)
        fw.close()
        el.close()
        shards.append(fa)
        errs.append(er)
    merge_host_shards(str(d / "tmerged.fasta"), shards)
    merge_host_shards(str(d / "tmerged_err"), errs,
                      header="Seq_name\tSeq_pos\terror_type\terror_length\tref_base\tseq_base\n")
    flat = _sorted_records(str(d / "tflat.fasta"))
    merged = _sorted_records(str(d / "tmerged.fasta"))
    assert [r[0] for r in flat] == [r[0] for r in merged]
    assert [r[1] for r in flat] == [r[1] for r in merged]
    assert _read_err(str(d / "tflat_err")) == _read_err(str(d / "tmerged_err"))


def test_multihost_metagenome(tmp_path):
    """Metagenome (chimeric) mode: 2 emulated hosts == single driver,
    including the psum'd species-quota feedback."""
    from nanosim_tpu.io.genome import MetagenomeSet
    from nanosim_tpu.parallel import MultiHostMetagenomeRunner
    from nanosim_tpu.profiles import profile as profmod
    from nanosim_tpu.sim import output
    from nanosim_tpu.sim.run_metagenome import MetagenomeSimulator

    from nanosim_tpu.profiles import error_model

    d = tmp_path
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=300, sd_read_len=100)
    error_model.write_chimeric_info(prefix + "_chimeric_info", 1.6, 0.2)
    species = ["Escherichia_coli", "Bacillus_subtilis"]
    sizes = [[30000], [20000, 8000]]
    gl = str(d / "genome_list.tsv")
    with open(gl, "w") as f:
        for i, (sp, sz) in enumerate(zip(species, sizes)):
            p = str(d / f"{sp}.fa")
            fixtures.make_reference_fasta(p, sz, seed=10 + i, name_prefix=f"{sp[:3]}chr")
            f.write(f"{sp}\t{p}\n")
    dl = str(d / "dna_types.tsv")
    with open(dl, "w") as f:
        for sp, sz in zip(species, sizes):
            for ci in range(len(sz)):
                f.write(f"{sp}\t{sp[:3]}chr{ci + 1}\tlinear\n")
    mset = MetagenomeSet.from_genome_list(gl, dl)
    prof = profmod.load_profile(prefix, mode="metagenome", chimeric=True)
    dict_abun = {"Escherichia_coli": 60.0, "Bacillus_subtilis": 40.0}
    quota, seed = 60, 5

    def make_sim():
        return MetagenomeSimulator(
            mset, prof, dict_abun, chimeric=True, batch=64,
        )

    def writer_for(fa, er):
        fw = output.FastxWriter(fa, False)
        el = output.ErrorLogWriter(er)
        w = output.ChimericBatchWriter(
            fw, el, species_names=mset.species_names,
            species_of_chrom=mset.species_of_chrom, metagenome=True,
        )
        return fw, el, w

    sim = make_sim()
    fw, el, w = writer_for(str(d / "mflat.fasta"), str(d / "mflat_err"))
    w.species_bases = sim.current_bases
    got = sim.run(quota, w, seed=seed)
    fw.close()
    el.close()
    assert got == quota

    mesh = make_mesh(8)
    shards, errs = [], []
    for h in range(2):
        runner = MultiHostMetagenomeRunner(make_sim(), n_hosts=2, host_id=h, mesh=mesh)
        fa = str(d / f"mshard{h}.fasta")
        er = str(d / f"mshard{h}_err")
        fw, el, w = writer_for(fa, er)
        runner.run(quota, w, seed=seed)
        fw.close()
        el.close()
        shards.append(fa)
        errs.append(er)
    merge_host_shards(str(d / "mmerged.fasta"), shards)
    flat = _sorted_records(str(d / "mflat.fasta"))
    merged = _sorted_records(str(d / "mmerged.fasta"))
    assert [r[0] for r in flat] == [r[0] for r in merged]
    assert [r[1] for r in flat] == [r[1] for r in merged]


def test_multihost_unaligned(setup):
    """Unaligned pass: 2 emulated hosts x 4 devices == single driver."""
    from nanosim_tpu.ops import rng
    from nanosim_tpu.parallel import MultiHostModeRunner
    from nanosim_tpu.sim.unaligned_mode import UnalignedBatchWriter, UnalignedSimulator

    d, genome, prof = setup
    quota, seed = 60, 17

    sim = UnalignedSimulator(genome, prof, batch=64)
    fw = out_mod.FastxWriter(str(d / "uflat.fasta"), False)
    got = sim.run(quota, UnalignedBatchWriter(fw), seed=seed)
    fw.close()
    assert got == quota

    mesh = make_mesh(8)
    shards = []
    written = []
    for h in range(2):
        sim_h = UnalignedSimulator(genome, prof, batch=64)
        runner = MultiHostModeRunner(sim_h, n_hosts=2, host_id=h, mesh=mesh,
                                     stream=rng.STREAM_UNALIGNED)
        fa = str(d / f"ushard{h}.fasta")
        fw = out_mod.FastxWriter(fa, False)
        written.append(runner.run(quota, UnalignedBatchWriter(fw), seed=seed))
        fw.close()
        shards.append(fa)
    assert sum(written) == quota

    merge_host_shards(str(d / "umerged.fasta"), shards)

    def key(r):
        toks = r[0].split("_")
        return int(toks[toks.index("unaligned") + 1])

    flat = sorted(parse_fastx_records(str(d / "uflat.fasta")), key=key)
    merged = sorted(parse_fastx_records(str(d / "umerged.fasta")), key=key)
    assert [r[0] for r in flat] == [r[0] for r in merged]
    assert [r[1] for r in flat] == [r[1] for r in merged]
    assert [key(r) for r in merged] == list(range(quota))
