"""Homopolymer-mode tests: run detection, deterministic resizing, error
suppression, end-to-end genome -hp run."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "refshim"))

import jax.numpy as jnp

from nanosim_tpu.ops import homopolymer, rng, tables
from nanosim_tpu.profiles import error_model, fixtures, profile
from nanosim_tpu.io import PackedGenome


def _pad(s, L):
    a = np.zeros((1, L), np.uint8)
    b = np.frombuffer(s.encode(), np.uint8)
    a[0, : len(b)] = b
    return jnp.asarray(a), jnp.asarray([len(b)], jnp.int32)


def test_run_info():
    seq, ln = _pad("AAACCGGGGT", 16)
    start, length, is_start = homopolymer.run_info(seq, ln)
    start = np.asarray(start)[0]
    length = np.asarray(length)[0]
    assert list(length[:10]) == [3, 3, 3, 2, 2, 4, 4, 4, 4, 1]
    assert list(start[:10]) == [0, 0, 0, 3, 3, 5, 5, 5, 5, 9]
    assert list(np.asarray(is_start)[0][:10]) == [1, 0, 0, 1, 0, 1, 0, 0, 0, 1]


def test_resize_deterministic_shrink_grow():
    # sigma = 0 so resizes are deterministic:
    # AT: n = round(0.8 * m)  -> A-run of 7 -> 6 (shrink)
    # CG: n = round(1.2 * m)  -> G-run of 10 -> 12 (grow)
    s = "TT" + "A" * 7 + "CGC" + "G" * 10 + "AT"
    L = 64
    seq, ln = _pad(s, L)
    cls = jnp.zeros((1, L), jnp.int32)
    sk = rng.slot_keys(rng.base_key(0), jnp.arange(1, dtype=jnp.int64))
    br, vl = tables.build_hp_breakpoints_from_vecs(
        [0.0, 0.8, 0.0, 99.0], [0.0, 1.2, 0.0, 99.0], [0.0, 0.0], [0.0, 0.0],
        m_tab=32,
    )
    read, qcls, new_len, ok = homopolymer.resize_homopolymers(
        sk, seq, cls, ln,
        jnp.asarray(br), jnp.asarray(vl),
        hp_mis_rate=0.0,
        k=5,
        r_max=8,
        l_cap=L,
    )
    assert bool(ok[0])
    expected = "TT" + "A" * 6 + "CGC" + "G" * 12 + "AT"
    out = np.asarray(read)[0][: int(new_len[0])].tobytes().decode()
    assert out == expected
    assert int(new_len[0]) == len(expected)
    # grow positions are ins-class
    qc = np.asarray(qcls)[0]
    g_start = expected.index("G" * 12)
    assert (qc[g_start + 10 : g_start + 12] == 2).all()


def test_resize_mismatch_rate():
    s = "C" * 200
    L = 256
    seq, ln = _pad(s, L)
    cls = jnp.zeros((1, L), jnp.int32)
    sk = rng.slot_keys(rng.base_key(3), jnp.arange(1, dtype=jnp.int64))
    br, vl = tables.build_hp_breakpoints_from_vecs(
        [0.0, 1.0, 0.0, 999.0], [0.0, 1.0, 0.0, 999.0], [0.0, 0.0], [0.0, 0.0],
        m_tab=256,
    )
    read, qcls, new_len, ok = homopolymer.resize_homopolymers(
        sk, seq, cls, ln,
        jnp.asarray(br), jnp.asarray(vl),
        hp_mis_rate=0.3,
        k=5,
        r_max=8,
        l_cap=L,
    )
    out = np.asarray(read)[0][: int(new_len[0])].tobytes().decode()
    n_mis = sum(1 for c in out if c != "C")
    assert 30 <= n_mis <= 90  # ~0.3 * 200
    assert all(c in "AGT" for c in out if c != "C")
    qc = np.asarray(qcls)[0][: int(new_len[0])]
    assert (qc[np.frombuffer(out.encode(), np.uint8) != ord("C")] == 1).all()


def test_suppression():
    # hp run of 8 As at positions 4..12
    s = "CGTA" + "A" * 7 + "GTCGTACGT"
    L = 32
    seq, ln = _pad(s, L)
    # events: mis at 1 (no overlap), del at 10 (inside), ins key 4-0.5 (ins
    # before 4: covers position 3.5-4.5 -> overlaps), mis at 12 (ends at 13,
    # run ends at 11 exclusive... run [4, 11): mis at 11 not overlapping)
    ev_pos2x = jnp.asarray([[2, 20, 7, 22]], jnp.int32)
    ev_type = jnp.asarray([[0, 2, 1, 0]], jnp.int32)
    ev_len = jnp.asarray([[1, 2, 1, 1]], jnp.int32)
    ev_valid = jnp.ones((1, 4), bool)
    keep = homopolymer.suppress_hp_errors(seq, ln, ev_pos2x, ev_type, ev_len, ev_valid, 5)
    keep = np.asarray(keep)[0]
    assert list(keep) == [True, False, False, True]


@pytest.fixture(scope="module")
def hp_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("hp")
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=500, sd_read_len=150)
    # strong contraction so the effect is measurable
    hp = error_model.HomopolymerParams(
        mis_rate=0.05,
        pw={
            "AT": {"const": 0.0, "alpha1": 0.75, "beta1": 0.0, "breakpoint1": 50.0},
            "CG": {"const": 0.0, "alpha1": 0.75, "beta1": 0.0, "breakpoint1": 50.0},
        },
        lr={"AT": {"intercept": 0.0, "slope": 0.05}, "CG": {"intercept": 0.0, "slope": 0.05}},
    )
    error_model.write_homopolymer_params(prefix + "_hp_lengths_model_parameters.tsv", hp)
    ref_fa = str(d / "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [40000], seed=11, hp_bias=0.55)
    return d, prefix, ref_fa


def _mean_big_run(seqs, k=5):
    tot, n = 0, 0
    for s in seqs:
        run = 1
        for i in range(1, len(s) + 1):
            if i < len(s) and s[i] == s[i - 1]:
                run += 1
            else:
                if run >= k:
                    tot += run
                    n += 1
                run = 1
    return tot / max(n, 1)


def test_hp_genome_end_to_end(hp_setup):
    from nanosim_tpu.sim import output as out_mod
    from nanosim_tpu.sim.genome_mode import GenomeSimulator

    d, prefix, ref_fa = hp_setup
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome", homopolymer=True)
    sim = GenomeSimulator(genome, prof, batch=128, kmer_bias=5)
    reads_path = str(d / "hp_aligned_reads.fasta")
    fw = out_mod.FastxWriter(reads_path, False)
    el = out_mod.ErrorLogWriter(str(d / "hp_err"))
    got = sim.run(150, out_mod.GenomeBatchWriter(fw, el), seed=2)
    fw.close()
    el.close()
    assert got >= 150

    from refshim.oracle import parse_fastx_records

    records = parse_fastx_records(reads_path)
    # contraction: mean >= 5-run length in reads < in the genome
    genome_runs = _mean_big_run([genome.flat.tobytes().decode()[:40000]])
    read_runs = _mean_big_run([s for _, s, _ in records])
    assert read_runs < genome_runs - 0.5, (read_runs, genome_runs)

    # suppressed events never overlap >= 5 runs of the reference slice
    COMP = dict(zip("ACGT", "TGCA"))
    by_read = {}
    with open(str(d / "hp_err")) as f:
        for line in f:
            nm, key, et, el_, rb, sb = line.rstrip("\n").split("\t")
            by_read.setdefault(nm, []).append((int(key), et, int(el_)))
    checked = 0
    for name, _, _ in records:
        if name not in by_read:
            continue
        parts = name.split("_")
        pos, mref = int(parts[1]), int(parts[-2])
        ref = genome.slice(0, pos, mref).tobytes().decode()
        # hp intervals of the slice
        runs = []
        i = 0
        while i < len(ref):
            j = i
            while j < len(ref) and ref[j] == ref[i]:
                j += 1
            if j - i >= 5:
                runs.append((i, j))
            i = j
        for key, et, ln in by_read[name]:
            lo = key - 1 if et == "ins" else key
            hi = key + ln - 1 if et == "ins" else key + ln - 1
            for s_, e_ in runs:
                assert not (lo <= e_ - 1 and s_ <= hi), (name, key, et, ln, s_, e_)
            checked += 1
    assert checked > 100
