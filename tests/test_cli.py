"""CLI smoke tests (argparse surface + end-to-end genome run)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=1800):  # 2-core box: compiles contend with the rest of the suite
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "nanosim_tpu"] + args,
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=REPO,
    )


def test_help():
    res = _run(["--help"])
    assert "simulate" in res.stdout and "characterize" in res.stdout


def test_simulate_genome_cli(tmp_path):
    from nanosim_tpu.profiles import fixtures

    prefix = str(tmp_path / "training")
    fixtures.make_model_dir(prefix, mean_read_len=400, sd_read_len=120)
    ref_fa = str(tmp_path / "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [20000], seed=5)
    out = str(tmp_path / "sim")
    res = _run(
        [
            "simulate", "genome", "-rg", ref_fa, "-c", prefix, "-o", out,
            "-n", "50", "--seed", "1", "--batch", "64",
        ]
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert os.path.exists(out + "_aligned_reads.fasta")
    assert os.path.exists(out + "_aligned_error_profile")
    assert os.path.exists(out + "_unaligned_reads.fasta")
    with open(out + "_aligned_error_profile") as f:
        assert f.readline().startswith("Seq_name\t")


def test_simulate_genome_chimeric_cli(tmp_path):
    from nanosim_tpu.profiles import fixtures

    prefix = str(tmp_path / "training")
    fixtures.make_model_dir(prefix, mean_read_len=400, sd_read_len=120)
    ref_fa = str(tmp_path / "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [20000, 12000], seed=5)
    out = str(tmp_path / "simc")
    res = _run(
        [
            "simulate", "genome", "-rg", ref_fa, "-c", prefix, "-o", out,
            "-n", "40", "--seed", "1", "--batch", "64", "--chimeric",
        ]
    )
    assert res.returncode == 0, res.stderr[-2000:]
    names = [l for l in open(out + "_aligned_reads.fasta") if l.startswith(">")]
    assert len(names) >= 30
    assert any("chimeric" in n for n in names)
    assert os.path.getsize(out + "_aligned_error_profile") > 0


def test_simulate_validation_errors(tmp_path):
    res = _run(["simulate", "genome", "-rg", "x.fa", "--perfect", "--chimeric"])
    assert res.returncode != 0


def test_quantify_paf_cli(tmp_path):
    paf = str(tmp_path / "aln.paf")
    with open(paf, "w") as f:
        # qname qlen qstart qend strand tname tlen tstart tend matches alnlen mapq
        f.write("r1\t500\t0\t480\t+\tT1\t1000\t5\t490\t450\t500\t60\n")
        f.write("r2\t400\t0\t380\t+\tT1\t1000\t2\t400\t370\t400\t60\n")
        f.write("r3\t300\t0\t290\t+\tT2\t800\t3\t300\t280\t300\t60\n")
    out = str(tmp_path / "abun.tsv")
    res = _run(["quantify_paf", "-i", paf, "-o", out])
    assert res.returncode == 0, res.stderr[-500:]
    lines = open(out).read().strip().split("\n")
    assert lines[0] == "target_id\test_counts\ttpm"
    vals = {l.split("\t")[0]: float(l.split("\t")[2]) for l in lines[1:]}
    assert abs(vals["T1"] - 2 / 3 * 1e6) < 1e3
    assert abs(vals["T2"] - 1 / 3 * 1e6) < 1e3


def test_coverage_calculation(tmp_path):
    from nanosim_tpu.profiles import fixtures
    from nanosim_tpu.sim.run import calculate_read_number_from_coverage

    prefix = str(tmp_path / "training")
    fixtures.make_model_dir(prefix, mean_read_len=500, sd_read_len=100)
    ref_fa = str(tmp_path / "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [50000], seed=2)
    n = calculate_read_number_from_coverage(ref_fa, prefix, 2.0, n_estimation=50000)
    # mean read length ~ (0.9*525 + 0.1*200) => 2x coverage of 50kb is ~200 reads
    assert 150 < n < 260, n
