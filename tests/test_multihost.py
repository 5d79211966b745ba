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
