"""Metagenome-mode tests: abundance targeting, naming, chimeric, replay."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "refshim"))

from refshim.oracle import parse_fastx_records

from nanosim_tpu.profiles import error_model, fixtures
from nanosim_tpu.sim.run_metagenome import simulate_metagenome


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("meta")
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=400, sd_read_len=120)
    error_model.write_chimeric_info(prefix + "_chimeric_info", 1.6, 0.2)

    species = ["Escherichia_coli", "Bacillus_subtilis", "Salmonella_enterica"]
    sizes = [[30000], [20000, 8000], [25000]]
    gpaths = []
    for i, (sp, sz) in enumerate(zip(species, sizes)):
        p = str(d / f"{sp}.fa")
        fixtures.make_reference_fasta(p, sz, seed=10 + i, name_prefix=f"{sp[:3]}chr")
        gpaths.append(p)
    glist = str(d / "genome_list.tsv")
    with open(glist, "w") as f:
        for sp, p in zip(species, gpaths):
            f.write(f"{sp}\t{p}\n")
    abun = str(d / "abun.tsv")
    with open(abun, "w") as f:
        f.write("Species\t120\t80\n")
        f.write("Escherichia coli\t60\t20\n")
        f.write("Bacillus subtilis\t30\t50\n")
        f.write("Salmonella enterica\t10\t30\n")
    dl = str(d / "dna_types.tsv")
    with open(dl, "w") as f:
        for sp, sz in zip(species, sizes):
            for ci in range(len(sz)):
                f.write(f"{sp}\t{sp[:3]}chr{ci + 1}\tlinear\n")
    return d, prefix, glist, abun, dl, species


def test_metagenome_basic(setup):
    d, prefix, glist, abun, dl, species = setup
    out = str(d / "sim")
    totals = simulate_metagenome(
        glist, abun, dl, prefix, out, seed=1, batch=64, min_len=50
    )
    assert totals["sample0"] >= 108  # 120 * 9/10
    assert totals["sample1"] >= 72

    for sample, want_pct in (("sample0", {"Escherichia": 60, "Bacillus": 30, "Salmonella": 10}),):
        records = parse_fastx_records(out + f"_{sample}_aligned_reads.fasta")
        bases_per_sp = {k: 0 for k in want_pct}
        for name, seq, _ in records:
            sp = name.split("-")[0].split("_")[0]
            assert sp in bases_per_sp, name
            bases_per_sp[sp] += len(seq)
        total = sum(bases_per_sp.values())
        for sp, want in want_pct.items():
            got = 100 * bases_per_sp[sp] / total
            assert abs(got - want) < 12, (sp, got, want)

    # unaligned reads exist
    assert os.path.exists(out + "_sample0_unaligned_reads.fasta")


def test_metagenome_chimeric(setup):
    d, prefix, glist, abun, dl, species = setup
    out = str(d / "simchim")
    totals = simulate_metagenome(
        glist, abun, dl, prefix, out, seed=2, batch=64, chimeric=True
    )
    records = parse_fastx_records(out + "_sample0_aligned_reads.fasta")
    n_chim = sum(1 for n, _, _ in records if "_chimeric_" in n)
    assert n_chim > 3
    # chimeric names interleave gap components
    for name, _, _ in records:
        if "_chimeric_" in name and ";" in name:
            comps = name.split("_aligned_")[0].split(";")
            assert any(c.startswith("gap_") for c in comps) or len(comps) >= 2


def test_metagenome_perfect(setup):
    d, prefix, glist, abun, dl, species = setup
    out = str(d / "simperf")
    totals = simulate_metagenome(
        glist, abun, dl, prefix, out, seed=3, batch=64, perfect=True
    )
    assert totals["sample0"] == 120
    records = parse_fastx_records(out + "_sample0_aligned_reads.fasta")
    assert len(records) == 120
    # perfect reads match reference slices verbatim
    from nanosim_tpu.io import MetagenomeSet

    mset = MetagenomeSet.from_genome_list(glist, dl)
    name_to_global = {}
    for gi, nm in enumerate(mset.packed.names):
        sp = mset.species_names[mset.species_of_chrom[gi]]
        name_to_global[f"{sp}-{nm}"] = gi
    COMP = dict(zip("ACGT", "TGCA"))
    for name, seq, _ in records:
        comp = name.split("_perfect_")[0]
        chrom_key, pos = comp.rsplit("_", 1)
        gi = name_to_global[chrom_key]
        fields = name.split("_")
        mref = int(fields[-2])
        s = seq
        if fields[-4] == "R":
            s = "".join(COMP.get(c, c) for c in reversed(s))
        ref = mset.packed.slice(gi, int(pos), mref).tobytes().decode()
        assert s == ref, name
