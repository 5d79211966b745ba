"""Multi-device semantics: slot-keyed RNG makes output identical across
device counts (SURVEY §2.2's determinism contract), psum'd accept counts."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nanosim_tpu.io import PackedGenome
from nanosim_tpu.ops import rng
from nanosim_tpu.parallel import make_mesh, shard_sim_batch
from nanosim_tpu.profiles import fixtures, profile
from nanosim_tpu.sim.genome_mode import GenomeSimulator


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    d = tmp_path_factory.mktemp("md")
    prefix = str(d / "training")
    fixtures.make_model_dir(prefix, mean_read_len=300, sd_read_len=100)
    ref_fa = str(d / "ref.fa")
    fixtures.make_reference_fasta(ref_fa, [20000], seed=3)
    genome = PackedGenome.from_fasta(ref_fa)
    prof = profile.load_profile(prefix, mode="genome")
    return GenomeSimulator(genome, prof, batch=64)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_single_vs_sharded_identical(sim):
    base = rng.base_key(5)
    slots = jnp.arange(64, dtype=jnp.int64)

    fn1 = sim.batch_fn()
    out1 = fn1(base, slots)

    mesh = make_mesh(8)
    fn8 = shard_sim_batch(sim.batch_fn(), mesh)
    out8, total = fn8(base, slots)

    np.testing.assert_array_equal(np.asarray(out1.read), np.asarray(out8.read))
    np.testing.assert_array_equal(np.asarray(out1.valid), np.asarray(out8.valid))
    # event buffers beyond each lane's n_events hold garbage whose content
    # depends on the shard's early-exit step count; only the valid prefix is
    # meaningful
    ne1 = np.asarray(out1.n_events)
    np.testing.assert_array_equal(ne1, np.asarray(out8.n_events))
    mask = np.arange(out1.ev_len.shape[1])[None, :] < ne1[:, None]
    np.testing.assert_array_equal(
        np.asarray(out1.ev_len) * mask, np.asarray(out8.ev_len) * mask
    )
    assert int(total) == int(np.asarray(out1.valid).sum())


def test_mesh_sizes_agree(sim):
    base = rng.base_key(6)
    slots = jnp.arange(64, dtype=jnp.int64)
    reads = []
    for n in (2, 4, 8):
        mesh = make_mesh(n)
        fn = shard_sim_batch(sim.batch_fn(), mesh)
        out, _ = fn(base, slots)
        reads.append(np.asarray(out.read))
    np.testing.assert_array_equal(reads[0], reads[1])
    np.testing.assert_array_equal(reads[1], reads[2])
