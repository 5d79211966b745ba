"""AOT program store (sim/aot.py): saving and loading a jax.export artifact
must leave the output byte-identical, and a mismatched key must miss."""

import filecmp
import glob
import os

import pytest

from nanosim_tpu.io import PackedGenome
from nanosim_tpu.profiles import fixtures, profile
from nanosim_tpu.sim import output as out_mod
from nanosim_tpu.sim.genome_mode import GenomeSimulator


def test_aot_roundtrip_byte_identical(tmp_path, monkeypatch):
    d = tmp_path
    monkeypatch.setenv("NANOSIM_TPU_AOT_DIR", str(d / "aot"))
    os.makedirs(str(d / "aot"))
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=500, sd_read_len=150)
    ref_fa = str(d / "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [50000], seed=5)
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome")

    def run(tag):
        sim = GenomeSimulator(genome, prof, batch=64)
        fw = out_mod.FastxWriter(str(d / f"{tag}.fasta"), False)
        el = out_mod.ErrorLogWriter(str(d / f"{tag}.err"))
        got = sim.run(150, out_mod.GenomeBatchWriter(fw, el), seed=3)
        fw.close()
        el.close()
        return got

    monkeypatch.setenv("NANOSIM_TPU_AOT", "0")
    assert run("plain") == 150
    monkeypatch.setenv("NANOSIM_TPU_AOT", "1")
    monkeypatch.setenv("NANOSIM_TPU_AOT_SAVE", "1")
    assert run("save") == 150
    arts = glob.glob(str(d / "aot" / "*.jaxexp"))
    assert len(arts) == 1
    monkeypatch.delenv("NANOSIM_TPU_AOT_SAVE")
    assert run("loaded") == 150

    assert filecmp.cmp(str(d / "plain.fasta"), str(d / "save.fasta"), shallow=False)
    assert filecmp.cmp(str(d / "plain.fasta"), str(d / "loaded.fasta"), shallow=False)
    assert filecmp.cmp(str(d / "plain.err"), str(d / "loaded.err"), shallow=False)

    # a different model (different tables digest) must MISS, not mis-hit
    prefix2 = str(d / "training2")
    fixtures.make_model_dir(prefix2, mean_read_len=420, sd_read_len=150)
    prof2 = profile.load_profile(prefix2, mode="genome")
    from nanosim_tpu.sim import aot

    sim2 = GenomeSimulator(genome, prof2, batch=64)
    fn2 = sim2.batch_fn(emit_reads=False)
    fn1 = GenomeSimulator(genome, prof, batch=64).batch_fn(emit_reads=False)
    assert aot.aot_key(fn2) != aot.aot_key(fn1)
