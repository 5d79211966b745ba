"""Device-ops tests: sampler exactness and walk/mutation parity with the
reference implementation (distribution-level, and structural for mutation)."""

import math
import os
import random
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "refshim"))

import jax
import jax.numpy as jnp

from nanosim_tpu.ops import apply_errors, error_walk, rng, seqops, tables
from nanosim_tpu.profiles import ecdf, error_model, fixtures


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("model")
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix)
    return prefix


@pytest.fixture(scope="module")
def ref_sim():
    from refshim.oracle import import_reference_simulator

    return import_reference_simulator()


def _reference_error_tables(model_dir):
    """Build the dict structures the reference's error_list consumes, using
    the reference's own parsing conventions (simulator.py:473-501)."""
    mix = error_model.read_model_profile(model_dir + "_model_profile")
    error_par = {
        "mis": list(mix.mis),
        "ins": list(mix.ins),
        "del": list(mix.dele),
    }
    trans_error_pr = {}
    with open(model_dir + "_error_markov_model") as f:
        f.readline()
        for line in f:
            info = line.strip().split()
            k = info[0]
            trans_error_pr[k] = {}
            trans_error_pr[k][(0, float(info[1]))] = "mis"
            trans_error_pr[k][(float(info[1]), float(info[1]) + float(info[2]))] = "ins"
            trans_error_pr[k][(1 - float(info[3]), 1)] = "del"
    return error_par, trans_error_pr


def test_mixture_sampler_matches_reference_distribution(model_dir, ref_sim):
    mix = error_model.read_model_profile(model_dir + "_model_profile")
    dev = tables.MixtureDevice.from_params(mix)

    n = 40000
    np.random.seed(0)
    ref_mis = [ref_sim.mm.pois_geom(mix.mis[0], mix.mis[2], mix.mis[3]) for _ in range(n)]
    ref_ins = [
        ref_sim.mm.wei_geom(mix.ins[0], mix.ins[1], mix.ins[2], mix.ins[3]) for _ in range(n)
    ]

    key = jax.random.PRNGKey(1)
    u = jax.random.uniform(key, (n,))
    ours_mis = np.asarray(dev.sample(jnp.zeros(n, jnp.int32), u))
    ours_ins = np.asarray(dev.sample(jnp.ones(n, jnp.int32), u))

    for ref, ours in ((ref_mis, ours_mis), (ref_ins, ours_ins)):
        ref = np.asarray(ref)
        se = math.sqrt(ref.var() / n + ours.var() / n)
        assert abs(ref.mean() - ours.mean()) < 5 * se + 1e-3
        assert ours.min() >= 1


def test_trans_error_sampler(model_dir):
    probs = error_model.read_error_markov(model_dir + "_error_markov_model")
    dev = tables.TransErrorDevice.from_probs(probs)
    n = 30000
    u = jax.random.uniform(jax.random.PRNGKey(0), (n,))
    for state in range(7):
        res = np.asarray(dev.sample(jnp.full(n, state, jnp.int32), u))
        freq = np.bincount(res, minlength=3) / n
        np.testing.assert_allclose(freq, probs[state], atol=0.02)


def test_qual_sampler_matches_scipy(model_dir):
    """Analytic truncated-lognormal inverse CDF vs the reference's
    rv_discrete-based sampler."""
    sys.path.insert(0, "/root/reference/src")
    import model_base_qualities as ref_quals

    params = error_model.read_base_quality_params(
        model_dir + "_base_qualities_model_parameters.tsv"
    )
    dev = tables.QualDevice.from_params(params)
    n = 20000
    np.random.seed(3)
    for ci, cls in enumerate(tables.QualDevice.CLASSES):
        p = params[cls]
        ref = np.asarray(
            ref_quals.predict_base_qualities(p["sd"], p["loc"], np.exp(p["mu"]), n)
        )
        u = jax.random.uniform(jax.random.PRNGKey(ci), (n,))
        ours = np.asarray(dev.sample(jnp.full(n, ci, jnp.int32), u))
        assert ours.min() >= 1 and ours.max() <= 93
        se = math.sqrt(ref.var() / n + ours.var() / n)
        assert abs(ref.mean() - ours.mean()) < 6 * se + 0.05, cls


def _run_reference_walks(ref_sim, model_dir, m_ref, n, seed=11):
    error_par, trans_error_pr = _reference_error_tables(model_dir)
    with open(model_dir + "_first_match.hist") as f:
        match_ht_list = ref_sim.read_ecdf(f)
    with open(model_dir + "_match_markov_model") as f:
        match_markov_model = ref_sim.read_ecdf(f)
    random.seed(seed)
    np.random.seed(seed)
    out = []
    for _ in range(n):
        l_new, middle_ref, e_dict, e_count = ref_sim.error_list(
            m_ref, match_markov_model, match_ht_list, error_par, trans_error_pr, True
        )
        out.append((l_new, middle_ref, e_dict, e_count))
    return out


def _our_walk(model_dir, m_ref, n, max_events=512, seed=5):
    mix = error_model.read_model_profile(model_dir + "_model_profile")
    probs = error_model.read_error_markov(model_dir + "_error_markov_model")
    fm = tables.EcdfDevice.from_table(ecdf.read_ecdf_file(model_dir + "_first_match.hist"))
    mm = tables.EcdfDevice.from_table(ecdf.read_ecdf_file(model_dir + "_match_markov_model"))
    mixd = tables.MixtureDevice.from_params(mix)
    trans = tables.TransErrorDevice.from_probs(probs)
    base = rng.base_key(seed)
    sk = rng.slot_keys(base, jnp.arange(n))
    return error_walk.error_walk(
        sk, jnp.full(n, m_ref, jnp.int32), fm, mm, mixd, trans, max_events
    )


def test_error_walk_distribution_parity(model_dir, ref_sim):
    m_ref, n = 400, 2500
    ref = _run_reference_walks(ref_sim, model_dir, m_ref, n)
    res = _our_walk(model_dir, m_ref, n)
    assert not bool(np.asarray(res.overflow).any())

    ref_lnew = np.array([r[0] for r in ref], dtype=np.float64)
    ref_mref = np.array([r[1] for r in ref], dtype=np.float64)
    ref_nev = np.array([len(r[2]) for r in ref], dtype=np.float64)

    our_lnew = np.asarray(res.l_new, dtype=np.float64)
    our_mref = np.asarray(res.middle_ref, dtype=np.float64)
    our_nev = np.asarray(res.n_events, dtype=np.float64)

    for a, b, name in (
        (ref_lnew, our_lnew, "l_new"),
        (ref_mref, our_mref, "middle_ref"),
        (ref_nev, our_nev, "n_events"),
    ):
        se = math.sqrt(a.var() / n + b.var() / n)
        assert abs(a.mean() - b.mean()) < 5 * se + 0.02 * abs(a.mean()), (
            name,
            a.mean(),
            b.mean(),
        )

    # per-type event counts
    ref_types = {"mis": 0, "ins": 0, "del": 0}
    for _, _, e_dict, _ in ref:
        for v in e_dict.values():
            ref_types[v[0]] += 1
    ev_type = np.asarray(res.events_type)
    ev_valid = np.asarray(res.events_valid)
    our_types = {
        "mis": int(((ev_type == 0) & ev_valid).sum()),
        "ins": int(((ev_type == 1) & ev_valid).sum()),
        "del": int(((ev_type == 2) & ev_valid).sum()),
    }
    for t in ref_types:
        assert abs(ref_types[t] - our_types[t]) < 0.1 * max(ref_types[t], 100), (
            t,
            ref_types,
            our_types,
        )


def test_gather_map_consistency_with_walk(model_dir):
    """Applying the walk's events must reproduce exactly l_new bases."""
    n = 256
    res = _our_walk(model_dir, 300, n, max_events=400)
    L = 1024
    gm = apply_errors.build_gather_map(
        res.events_pos2x, res.events_type, res.events_len, res.events_valid, res.middle_ref, L
    )
    # the walk's l_new counts ALL insertions; the realized read drops
    # dict-overwritten duplicate insertions (reference semantics)
    eff = np.asarray(apply_errors.effective_lens(
        res.events_pos2x, res.events_type, res.events_len, res.events_valid))
    raw = np.asarray(res.events_len)
    is_ins = np.asarray(res.events_type) == 1
    dead = ((raw - eff) * (is_ins & np.asarray(res.events_valid))).sum(axis=1)
    np.testing.assert_array_equal(np.asarray(gm.read_len), np.asarray(res.l_new) - dead)
    # every valid j has either a source or is an insertion; sources ascend
    src = np.asarray(gm.src)
    valid = np.asarray(gm.valid)
    for b in range(0, n, 37):
        s = src[b][valid[b]]
        s = s[s >= 0]
        assert (np.diff(s) > 0).all()


def test_mutation_structural_parity(model_dir, ref_sim):
    """Feed identical event lists through our gather map and the reference's
    mutate_read; kept-base structure must agree exactly."""
    error_par, trans_error_pr = _reference_error_tables(model_dir)
    with open(model_dir + "_first_match.hist") as f:
        match_ht_list = ref_sim.read_ecdf(f)
    with open(model_dir + "_match_markov_model") as f:
        match_markov_model = ref_sim.read_ecdf(f)

    rnd = np.random.default_rng(0)
    random.seed(7)
    np.random.seed(7)
    for trial in range(40):
        m_ref = int(rnd.integers(60, 400))
        l_new, middle_ref, e_dict, e_count = ref_sim.error_list(
            m_ref, match_markov_model, match_ht_list, error_par, trans_error_pr, False
        )
        ref_seq = "".join(rnd.choice(list("ACGT"), middle_ref))
        ref_out, _ = ref_sim.mutate_read(ref_seq, "r", None, dict(e_dict), dict(e_count), False, False)
        # NOTE: len(ref_out) may differ from l_new in the reference when an
        # ins follows an ins through a zero-length match: e_dict[pos - 0.5]
        # is *overwritten* (simulator.py:1882), dropping the earlier insertion
        # from the edit script while l_new still counts it.  Our walk merges
        # such insertions instead (consistent, like unaligned_error_list).
        # Here we feed the reference's post-overwrite e_dict through our
        # gather map, so lengths must agree with the reference's output.

        # convert e_dict to event arrays (fixed width to avoid recompiles)
        E = 128
        assert len(e_dict) <= E
        pos2x = np.zeros((1, E), np.int32)
        etype = np.zeros((1, E), np.int32)
        elen = np.zeros((1, E), np.int32)
        valid = np.zeros((1, E), bool)
        tmap = {"mis": 0, "ins": 1, "del": 2}
        for i, (k, v) in enumerate(e_dict.items()):
            pos2x[0, i] = int(round(k * 2))
            etype[0, i] = tmap[v[0]]
            elen[0, i] = v[1]
            valid[0, i] = True

        L = 1024
        gm = apply_errors.build_gather_map(
            jnp.asarray(pos2x),
            jnp.asarray(etype),
            jnp.asarray(elen),
            jnp.asarray(valid),
            jnp.asarray([middle_ref], jnp.int32),
            L,
        )
        assert int(gm.read_len[0]) == len(ref_out), trial

        ref_seg = np.zeros((1, L), np.uint8)
        ref_seg[0, :middle_ref] = np.frombuffer(ref_seq.encode(), np.uint8)
        out = apply_errors.materialize_read(
            gm.src,
            gm.qclass,
            gm.valid,
            jnp.asarray(ref_seg),
            jnp.zeros((1, L)),
            jnp.zeros((1, L)),
        )
        ours = np.asarray(out)[0]
        cls = np.asarray(gm.qclass)[0]
        vld = np.asarray(gm.valid)[0]
        ref_bytes = np.frombuffer(ref_out.encode(), np.uint8)
        match_pos = vld & (cls == apply_errors.CLASS_MATCH)
        # at match positions both outputs carry the untouched reference base
        np.testing.assert_array_equal(
            ours[match_pos[: len(ref_bytes)].nonzero()[0]],
            ref_bytes[match_pos[: len(ref_bytes)].nonzero()[0]],
        )


def test_seqops_iupac_and_revcomp():
    seq = np.frombuffer(b"ACGTNYRX", np.uint8)[None, :].copy()
    u = jnp.full((1, 8), 0.99)
    out = np.asarray(seqops.resolve_iupac(jnp.asarray(seq), u))
    txt = out.tobytes().decode()
    assert txt[:4] == "ACGT"
    assert all(c in "ACGT" for c in txt[4:])

    seq2 = np.zeros((1, 8), np.uint8)
    seq2[0, :5] = np.frombuffer(b"AACGT", np.uint8)
    rc = np.asarray(seqops.reverse_complement(jnp.asarray(seq2), jnp.asarray([5])))
    assert rc[0, :5].tobytes() == b"ACGTT"
    assert (rc[0, 5:] == 0).all()


def test_unaligned_walk_basic(model_dir):
    mix = error_model.read_model_profile(model_dir + "_model_profile")
    mixd = tables.MixtureDevice.from_params(mix)
    base = rng.base_key(9, rng.STREAM_UNALIGNED)
    n = 512
    sk = rng.slot_keys(base, jnp.arange(n))
    res = error_walk.unaligned_walk(sk, jnp.full(n, 200, jnp.int32), mixd, 512)
    assert not bool(np.asarray(res.overflow).any())
    gm = apply_errors.build_gather_map(
        res.events_pos2x, res.events_type, res.events_len, res.events_valid,
        res.middle_ref, 1024, dedup_ins=False,  # unaligned: ins events merge
    )
    np.testing.assert_array_equal(np.asarray(gm.read_len), np.asarray(res.l_new))
    # error rate should be substantial (0.6 error prob per step)
    assert np.asarray(res.l_new).mean() != 200.0
