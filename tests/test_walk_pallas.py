"""Bit-identity of the Pallas walk kernels vs the XLA while-loop walks.

Runs the Mosaic kernels in interpreter mode (CPU CI); the same parity is
checked compiled on real TPU hardware by bench/micro_walk7.py (state fields,
valid events, and — for the unaligned walk — the full step prefix the replay
checksums read).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(autouse=True)
def _no_compilation_cache():
    """Compile the interpret-mode kernels fresh: deserializing their cached
    CPU executables inside a long pytest process segfaults in
    jax's compilation-cache read path (reproducibly at the multi-block
    variant, only after ~150 prior tests; standalone loads are fine).
    Recompiling costs a few seconds and avoids the fragile path.

    jax memoizes `is_cache_used` per process, so flipping the flag alone
    is a no-op mid-run; the memo must be reset around the change.

    Bypassing the cache-read path was not enough: the very same compile can
    also segfault inside backend_compile_and_load when the process carries
    ~150 tests' worth of live compiled executables (XLA CPU JIT code-page
    pressure).  Dropping every cached executable first (jax.clear_caches)
    removes that state; the later tests that re-need programs simply
    recompile."""
    import gc

    from jax._src import compilation_cache as _cc

    old = jax.config.jax_compilation_cache_dir
    _cc.reset_cache()
    jax.config.update("jax_compilation_cache_dir", None)
    jax.clear_caches()
    gc.collect()
    yield
    jax.config.update("jax_compilation_cache_dir", old)
    _cc.reset_cache()

from nanosim_tpu.ops import error_walk, rng
from nanosim_tpu.ops.walk_pallas import error_walk_pallas, unaligned_walk_pallas
from nanosim_tpu.profiles import fixtures, profile
from nanosim_tpu.sim.bundles import build_tables


@pytest.fixture(scope="module")
def tables(tmp_path_factory):
    d = tmp_path_factory.mktemp("walkpl")
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=800, sd_read_len=300)
    return build_tables(profile.load_profile(prefix, mode="genome"))


def _slot_keys(n, seed=3):
    base = rng.base_key(seed, rng.STREAM_ALIGNED)
    return rng.slot_keys(base, jnp.arange(n, dtype=jnp.int64))


def _m_ref(n, hi=900, dead_frac=0.25, seed=0):
    r = np.random.default_rng(seed)
    m = r.integers(0, hi, n)
    m[r.random(n) < dead_frac] = 0  # dead lanes exit immediately
    return jnp.asarray(m, jnp.int32)


def _assert_walks_equal(wa, wb, E, full_prefix):
    for f in ("middle_ref", "l_new", "overflow", "n_events",
              "ecnt_mis", "ecnt_ins", "ecnt_match"):
        a, b = np.asarray(getattr(wa, f)), np.asarray(getattr(wb, f))
        np.testing.assert_array_equal(a, b, err_msg=f)
    va, vb = np.asarray(wa.events_valid), np.asarray(wb.events_valid)
    np.testing.assert_array_equal(va, vb)
    # aligned: valid prefix; unaligned: the FULL step prefix (match steps
    # included — the replay checksum reads them)
    m = (np.arange(E)[None, :] < np.asarray(wa.n_events)[:, None]
         if full_prefix else va)
    for f in ("events_pos2x", "events_type", "events_len"):
        a, b = np.asarray(getattr(wa, f)), np.asarray(getattr(wb, f))
        np.testing.assert_array_equal(a[m], b[m], err_msg=f)


def test_error_walk_pallas_bit_identity(tables):
    B, E = 96, 64
    sk = _slot_keys(B)
    m_ref = _m_ref(B)
    wa = error_walk.error_walk(
        sk, m_ref, tables.first_match, tables.match_markov, tables.mixtures,
        tables.trans, E,
    )
    wb = error_walk_pallas(
        sk, m_ref, tables.first_match, tables.match_markov, tables.mixtures,
        tables.trans, E, interpret=True,
    )
    assert int(np.asarray(wa.n_events).sum()) > 50  # non-vacuous
    _assert_walks_equal(wa, wb, E, full_prefix=False)


def test_error_walk_pallas_overflow_lanes(tables):
    # a tiny budget forces overflow lanes; flags must agree exactly
    B, E = 64, 16
    sk = _slot_keys(B, seed=11)
    m_ref = jnp.full(B, 2000, jnp.int32)
    args = (sk, m_ref, tables.first_match, tables.match_markov,
            tables.mixtures, tables.trans, E)
    wa = error_walk.error_walk(*args)
    wb = error_walk_pallas(*args, interpret=True)
    assert bool(np.asarray(wa.overflow).any())
    _assert_walks_equal(wa, wb, E, full_prefix=False)


def test_error_walk_pallas_multiblock(tables):
    # more lanes than one 128-lane block -> grid > 1 with a ragged tail
    B, E = 200, 64
    sk = _slot_keys(B, seed=5)
    m_ref = _m_ref(B, seed=7)
    args = (sk, m_ref, tables.first_match, tables.match_markov,
            tables.mixtures, tables.trans, E)
    wa = error_walk.error_walk(*args)
    wb = error_walk_pallas(*args, interpret=True)
    _assert_walks_equal(wa, wb, E, full_prefix=False)


def test_unaligned_walk_pallas_bit_identity(tables):
    B, E = 96, 96
    sk = _slot_keys(B, seed=9)
    m_ref = _m_ref(B, hi=120, seed=2)
    wa = error_walk.unaligned_walk(sk, m_ref, tables.mixtures, E)
    wb = unaligned_walk_pallas(sk, m_ref, tables.mixtures, E, interpret=True)
    assert int(np.asarray(wa.n_events).sum()) > 50
    _assert_walks_equal(wa, wb, E, full_prefix=True)
