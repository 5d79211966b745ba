"""End-to-end distribution comparison against the reference CLI run on the
same synthetic model directory."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "refshim"))

from refshim.oracle import parse_fastx_records, run_reference_cli

from nanosim_tpu.io import PackedGenome
from nanosim_tpu.profiles import fixtures, profile
from nanosim_tpu.sim import output as out_mod
from nanosim_tpu.sim.genome_mode import GenomeSimulator


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("cmp")
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=700, sd_read_len=250)
    ref_fa = str(d / "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [40000, 20000], seed=5)
    return d, prefix, ref_fa


def _error_stats(err_path, skip_header=False):
    per_type = {"mis": [0, 0], "ins": [0, 0], "del": [0, 0]}  # events, bases
    with open(err_path) as f:
        if skip_header:
            f.readline()
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 4 or parts[2] not in per_type:
                continue
            per_type[parts[2]][0] += 1
            per_type[parts[2]][1] += int(parts[3])
    return per_type


def test_reference_cli_runs_and_distributions_match(setup):
    d, prefix, ref_fa = setup
    n = 150

    res = run_reference_cli(
        [
            "genome",
            "-rg",
            ref_fa,
            "-c",
            prefix,
            "-o",
            str(d / "refout"),
            "-n",
            str(n),
            "--seed",
            "1",
            "-t",
            "1",
        ],
        timeout=900,
    )
    assert res.returncode == 0, res.stderr[-3000:]

    ref_reads = parse_fastx_records(str(d / "refout_aligned_reads.fasta"))
    # reference splits 150 * 9/10 aligned
    assert len(ref_reads) == 135

    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome")
    sim = GenomeSimulator(genome, prof, batch=256)
    fw = out_mod.FastxWriter(str(d / "ours_aligned_reads.fasta"), False)
    el = out_mod.ErrorLogWriter(str(d / "ours_err"))
    sim.run(135, out_mod.GenomeBatchWriter(fw, el), seed=0)
    fw.close()
    el.close()
    our_reads = parse_fastx_records(str(d / "ours_aligned_reads.fasta"))
    assert len(our_reads) == 135

    ref_lens = np.array([len(s) for _, s, _ in ref_reads], float)
    our_lens = np.array([len(s) for _, s, _ in our_reads], float)
    se = np.sqrt(ref_lens.var() / len(ref_lens) + our_lens.var() / len(our_lens))
    assert abs(ref_lens.mean() - our_lens.mean()) < 5 * se + 0.05 * ref_lens.mean(), (
        ref_lens.mean(),
        our_lens.mean(),
    )

    # error rates per simulated base
    ref_err = _error_stats(str(d / "refout_aligned_error_profile"), skip_header=True)
    our_err = _error_stats(str(d / "ours_err"))
    ref_total = ref_lens.sum()
    our_total = our_lens.sum()
    for t in ("mis", "ins", "del"):
        r_rate = ref_err[t][1] / ref_total
        o_rate = our_err[t][1] / our_total
        assert abs(r_rate - o_rate) < 0.25 * max(r_rate, 0.005), (t, r_rate, o_rate)

    # strand balance ~50%
    our_rev = sum(1 for nm, _, _ in our_reads if nm.split("_")[4] == "R")
    assert 40 <= our_rev <= 95
