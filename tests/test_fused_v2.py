"""fused_read_v2 must reproduce fused_read byte-for-byte.

v2 re-plumbs the same math (3 packed scatters, 2-bit packed ref codes,
counter-addressed head/tail bases, optional windowed Pallas gather) — the
output contract is unchanged.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from nanosim_tpu.ops import apply_errors, error_walk, rng, seqops
from nanosim_tpu.profiles import fixtures, profile
from nanosim_tpu.sim.bundles import build_tables


@pytest.fixture(scope="module")
def walk_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("fv2")
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=800, sd_read_len=300)
    prof = profile.load_profile(prefix, mode="genome")
    tables = build_tables(prof)

    B, E, l_cap, ht_cap = 32, 256, 2048, 1024
    l_out = 3072  # multiple of the gather tile
    base = rng.base_key(3, rng.STREAM_ALIGNED)
    sk = rng.slot_keys(base, jnp.arange(B, dtype=jnp.int64))
    m_ref = jnp.asarray(
        np.random.RandomState(0).randint(300, 1600, B).astype(np.int32)
    )
    walk = error_walk.error_walk(
        sk, m_ref, tables.first_match, tables.match_markov, tables.mixtures,
        tables.trans, E,
    )
    rs = np.random.RandomState(1)
    head = jnp.asarray(rs.randint(0, 200, B).astype(np.int32))
    tail = jnp.asarray(rs.randint(0, 200, B).astype(np.int32))
    is_rev = jnp.asarray(rs.rand(B) > 0.5)
    # IUPAC-resolved-looking ref segment (pure ACGT)
    ref_seg = jnp.asarray(
        np.frombuffer(b"ACGT", np.uint8)[rs.randint(0, 4, (B, l_cap + 256))]
    )
    seg_off = jnp.asarray(rs.randint(0, 256, B).astype(np.int32))
    u_ht = rng.uniform_per_slot(sk, rng.SITE_HEAD_TAIL, (ht_cap,))
    ht_bases = seqops.random_bases(u_ht)
    u_mis, u_ins = rng.uniform2_per_slot(sk, rng.SITE_MIS_BASE, (l_out,))
    return dict(
        walk=walk, head=head, tail=tail, is_rev=is_rev, ref_seg=ref_seg,
        seg_off=seg_off, sk=sk, ht_bases=ht_bases, u_mis=u_mis, u_ins=u_ins,
        l_out=l_out, ht_cap=ht_cap,
    )


def _run_v1(s):
    return apply_errors.fused_read(
        s["walk"].events_pos2x, s["walk"].events_type, s["walk"].events_len,
        s["walk"].events_valid, s["walk"].middle_ref, s["head"], s["tail"],
        s["is_rev"], s["ref_seg"], s["seg_off"], s["ht_bases"], s["u_mis"],
        s["u_ins"], s["l_out"], use_pallas=False,
    )


def _run_v2(s, use_window):
    ref_codes = apply_errors._pack_codes4(s["ref_seg"])
    pad = (-ref_codes.shape[1]) % 128
    if pad:
        ref_codes = jnp.pad(ref_codes, ((0, 0), (0, pad)))
    return apply_errors.fused_read_v2(
        s["walk"].events_pos2x, s["walk"].events_type, s["walk"].events_len,
        s["walk"].events_valid, s["walk"].middle_ref, s["head"], s["tail"],
        s["is_rev"], ref_codes, s["ref_seg"].shape[1], s["seg_off"], s["sk"],
        s["u_mis"], s["u_ins"], s["l_out"], s["ht_cap"],
        rng.SITE_HEAD_TAIL, use_window=use_window,
    )


def test_v2_xla_matches_v1(walk_setup):
    r1, q1, ln1, t1 = _run_v1(walk_setup)
    r2, q2, ln2, t2, ov = _run_v2(walk_setup, use_window=False)
    np.testing.assert_array_equal(np.asarray(ln1), np.asarray(ln2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
    assert not np.asarray(ov).any()


def test_v2_window_interpret_matches_v1(walk_setup, monkeypatch):
    """Windowed-kernel path (interpret mode on CPU) == v1 for non-overflow
    lanes."""
    from nanosim_tpu.ops import window_gather as wg

    real = wg.gather_bytes_windowed
    monkeypatch.setattr(
        wg, "gather_bytes_windowed",
        lambda p, i, w, interpret=False: real(p, i, w, interpret=True),
    )
    r1, q1, ln1, t1 = _run_v1(walk_setup)
    r2, q2, ln2, t2, ov = _run_v2(walk_setup, use_window=True)
    ok = ~np.asarray(ov)
    assert ok.sum() > 0
    np.testing.assert_array_equal(np.asarray(r1)[ok], np.asarray(r2)[ok])
    np.testing.assert_array_equal(np.asarray(q1)[ok], np.asarray(q2)[ok])
