"""Model-file I/O parity tests against the reference parsers."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "refshim"))

from nanosim_tpu.profiles import ecdf, error_model, fixtures, kde, profile


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("model")
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, transcriptome=True)
    return prefix


def test_ecdf_parity_with_reference(model_dir):
    """Our EcdfTable inversion must match the reference's read_ecdf + lookup."""
    from refshim.oracle import import_reference_simulator

    ref_sim = import_reference_simulator()

    for fname, kind in [("_first_match.hist", "fm"), ("_match_markov_model", "mm")]:
        with open(model_dir + fname) as f:
            ref_tab = ref_sim.read_ecdf(f)
        ours = ecdf.read_ecdf_file(model_dir + fname)

        ref_keys = sorted(ref_tab.keys())
        assert ours.n_bins == len(ref_keys)

        rng = np.random.default_rng(0)
        for lane, key in enumerate(ref_keys):
            intervals = ref_tab[key]
            for p in rng.uniform(1e-6, 1.0 - 1e-6, 200):
                ref_val = None
                for (plo, phi), (vlo, vhi) in intervals.items():
                    if plo < p <= phi:
                        ref_val = int(np.floor((p - plo) / (phi - plo) * (vhi - vlo) + vlo))
                        break
                our_val = ours.invert(lane, p)
                if ref_val is not None:
                    assert our_val == ref_val, (fname, lane, p)


def test_match_markov_bin_selection(model_dir):
    ours = ecdf.read_ecdf_file(model_dir + "_match_markov_model")
    # bins are contiguous; beyond-last clamps to last (reference fall-through)
    assert ours.select_bin(0) == 0
    assert ours.select_bin(int(ours.bin_lo[3])) == 3
    assert ours.select_bin(10 ** 6) == ours.n_bins - 1


def test_model_profile_roundtrip(model_dir):
    mp = error_model.read_model_profile(model_dir + "_model_profile")
    assert mp.mis.shape == (4,)
    out2 = model_dir + "_model_profile2"
    error_model.write_model_profile(out2, mp)
    mp2 = error_model.read_model_profile(out2)
    np.testing.assert_allclose(mp.mis, mp2.mis)
    np.testing.assert_allclose(mp.ins, mp2.ins)
    np.testing.assert_allclose(mp.dele, mp2.dele)


def test_error_markov_roundtrip(model_dir):
    probs = error_model.read_error_markov(model_dir + "_error_markov_model")
    assert probs.shape == (7, 3)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-9)
    out2 = model_dir + "_error_markov_model2"
    error_model.write_error_markov(out2, probs)
    probs2 = error_model.read_error_markov(out2)
    np.testing.assert_allclose(probs, probs2)


def test_error_markov_parity_with_reference(model_dir):
    """Interval structure parsed by the reference == our matrix."""
    import importlib

    from refshim.oracle import import_reference_simulator

    import_reference_simulator()
    probs = error_model.read_error_markov(model_dir + "_error_markov_model")
    trans = {}
    with open(model_dir + "_error_markov_model") as f:
        f.readline()
        for line in f:
            info = line.strip().split()
            k = info[0]
            trans[k] = [float(x) for x in info[1:4]]
    for i, state in enumerate(error_model.ERROR_STATES):
        np.testing.assert_allclose(probs[i], trans[state])


def test_kde_roundtrip(tmp_path):
    data = np.random.default_rng(0).normal(5000, 1000, 300)
    path = str(tmp_path / "test.pkl")
    kde.save_kde(path, data, 10.0)
    model = kde.load_kde(path)
    assert model.bandwidth == 10.0
    np.testing.assert_allclose(np.sort(model.data[:, 0]), np.sort(data))
    samples = model.sample(np.random.default_rng(1), 20000)
    assert abs(samples.mean() - data.mean()) < 50


def test_kde_tolerant_loader(tmp_path):
    """The tolerant path extracts the same arrays as the sklearn path."""
    data = np.random.default_rng(2).normal(100, 10, 128)
    path = str(tmp_path / "t.pkl")
    kde.save_kde(path, data, 0.01)
    tolerant = kde._load_tolerant(path)
    assert tolerant.bandwidth == 0.01
    assert tolerant.data.shape[0] == 128


def test_kde_matches_sklearn_sampling(tmp_path):
    """Our sampling formula == sklearn KernelDensity.sample distributionally."""
    import joblib

    data = np.random.default_rng(3).normal(0, 1, 500)
    path = str(tmp_path / "s.pkl")
    kde.save_kde(path, data, 0.5)
    sk = joblib.load(path)
    sk_samples = sk.sample(50000, random_state=0).flatten()
    ours = kde.load_kde(path).sample(np.random.default_rng(0), 50000).flatten()
    assert abs(sk_samples.mean() - ours.mean()) < 0.05
    assert abs(sk_samples.std() - ours.std()) < 0.05


def test_base_quality_params_roundtrip(model_dir):
    params = error_model.read_base_quality_params(
        model_dir + "_base_qualities_model_parameters.tsv"
    )
    assert set(params) == set(error_model.QUAL_TYPES)
    assert params["match"]["mu"] == pytest.approx(np.log(14.0))


def test_homopolymer_params(model_dir):
    hp = error_model.read_homopolymer_params(model_dir + "_hp_lengths_model_parameters.tsv")
    assert hp.mis_rate == pytest.approx(0.02)
    mu, sigma = hp.mean_std("AT", 6.0)
    assert mu == pytest.approx(0.35 + 0.93 * 6.0)
    assert sigma == pytest.approx(0.16 * 6.0)
    mu15, _ = hp.mean_std("AT", 15.0)
    assert mu15 == pytest.approx(0.35 + 0.93 * 15.0 - 0.10 * 3.0)


def test_load_profile_full(model_dir):
    p = profile.load_profile(
        model_dir, mode="genome", chimeric=True, homopolymer=True, fastq=True
    )
    assert p.strandness_rate == pytest.approx(0.5)
    assert p.aligned_rate == pytest.approx(9.0)
    assert p.mix_params is not None
    assert p.trans_error.shape == (7, 3)
    assert p.first_match.n_bins == 1
    assert p.match_markov.n_bins == 15
    assert p.kde_aligned is not None and not p.kde_aligned.log_transform
    assert p.kde_ht.log_transform
    assert p.segment_mean == pytest.approx(1.25)
    assert p.kde_gap.log_transform
    assert p.base_quals is not None and p.hp_params is not None
    aligned, unaligned = profile.split_aligned_unaligned([1000], p.aligned_rate, False)
    assert aligned[0] == 900 and unaligned[0] == 100


def test_alignment_rate_100pct(tmp_path):
    path = str(tmp_path / "_rar")
    error_model.write_alignment_rate(path, None)
    assert error_model.read_alignment_rate(path) is None
    aligned, unaligned = profile.split_aligned_unaligned([1000], None, False)
    assert aligned[0] == 1000 and unaligned[0] == 0


def test_expression_profile(tmp_path):
    trx = [("ENST1", 1000), ("ENST2", 2000), ("ENST3", 500)]
    path = str(tmp_path / "exp.tsv")
    with open(path, "w") as f:
        f.write("id\tcount\ttpm\n")
        f.write("ENST1.4\t10\t50.0\nENST2\t10\t30.0\nENST3\t0\t0.0\nENSTX\t1\t20.0\n")
    exp = profile.load_expression(path, dict(trx))
    # ENST3 excluded (tpm=0), ENSTX excluded (not in reference)
    assert set(exp.names) == {"ENST1", "ENST2"}
    np.testing.assert_allclose(exp.weights.sum(), 1.0)
    assert exp.cum_weights[-1] == pytest.approx(1.0)


def test_gff3_structures(tmp_path):
    path = str(tmp_path / "x.gff3")
    with open(path, "w") as f:
        f.write("##gff-version 3\n")
        # ID starting with a non-"transcript" prefix -> skipped (reference
        # simulator.py:433-440 falls through to `continue`)
        f.write("chr1\tx\texon\t1\t9\t.\t+\t.\tID=exon:ENST01.2:1;Parent=transcript:ENST01.2\n")
        f.write("chr1\tx\texon\t11\t20\t.\t+\t.\tParent=transcript:ENST01.2\n")
        f.write("chr1\tx\tintron\t21\t30\t.\t+\t.\ttranscript_id=ENST01.2\n")
        f.write("chr1\tx\texon\t31\t40\t.\t+\t.\tID=transcript:ENST01.2;Parent=gene:G1\n")
    st = profile.load_transcript_structures(path)
    assert "ENST01" in st.by_transcript
    items = st.by_transcript["ENST01"]
    assert len(items) == 3
    assert items[0] == ("exon", "1", 10, 20, 10, "+")
    assert items[1][0] == "intron"
    assert items[2] == ("exon", "1", 30, 40, 10, "+")


def test_fixture_reference_fasta(tmp_path):
    from nanosim_tpu.io import PackedGenome

    path = str(tmp_path / "ref.fa")
    fixtures.make_reference_fasta(path, [1000, 500], seed=7)
    g = PackedGenome.from_fasta(path)
    assert g.names == ["chr1", "chr2"]
    assert g.total_len == 1500
    assert g.max_chrom == 1000
    assert set(np.unique(g.flat)) <= set(b"ACGT")


def test_sklearn_0221_pickle_fixture():
    """A checked-in KDE pickle with scikit-learn 0.22.1's exact object
    layout (the version the reference pins, README.md:41) must round-trip
    through the tolerant loader even though CURRENT sklearn cannot unpickle
    it at all (sklearn.neighbors._dist_metrics was removed in 1.3)."""
    import sys

    import numpy as np
    import pytest

    fixdir = os.path.join(os.path.dirname(__file__), "fixtures")
    path = os.path.join(fixdir, "kde_sklearn_0221.pkl")
    sys.path.insert(0, fixdir)
    try:
        from gen_sklearn022_kde import BANDWIDTH, fixture_data
    finally:
        sys.path.remove(fixdir)

    import joblib

    with pytest.raises(Exception):
        joblib.load(path)  # the modern-sklearn failure mode for 0.22 models

    from nanosim_tpu.profiles import kde

    m = kde.load_kde(path)
    np.testing.assert_array_equal(m.data, fixture_data())
    assert m.bandwidth == BANDWIDTH
    # usable end to end: device table + draw
    from nanosim_tpu.ops.tables import KdeDevice

    dev = KdeDevice.from_model(m)
    import jax.numpy as jnp

    s = np.asarray(dev.sample(jnp.asarray([0.3, 0.9]), jnp.asarray([0.0, 1.0])))
    assert np.isfinite(s).all()
