"""pallas_gather.gather_u8 (one-hot matmul gather) vs jnp.take_along_axis.

Runs the kernel in interpret mode so the equivalence holds on the CPU test
mesh; on TPU the compiled kernel replaces the XLA gather inside fused_read
(gated by pallas_gather.supported())."""

import numpy as np
import jax.numpy as jnp

from nanosim_tpu.ops import pallas_gather


def test_gather_u8_matches_take_along_axis():
    rng = np.random.default_rng(7)
    for B, W, L in [(8, 1000, 1024), (16, 23040, 2048), (8, 256, 100)]:
        parts = rng.integers(0, 256, (B, W), dtype=np.uint8)
        idx = rng.integers(0, W, (B, L), dtype=np.int32)
        out = np.asarray(
            pallas_gather.gather_u8(jnp.asarray(parts), jnp.asarray(idx), interpret=True)
        )
        exp = np.take_along_axis(parts, idx, axis=1)
        np.testing.assert_array_equal(out, exp, err_msg=f"{(B, W, L)}")


def test_gather_u8_odd_batch():
    rng = np.random.default_rng(8)
    parts = rng.integers(0, 256, (5, 300), dtype=np.uint8)
    idx = rng.integers(0, 300, (5, 77), dtype=np.int32)
    out = np.asarray(
        pallas_gather.gather_u8(jnp.asarray(parts), jnp.asarray(idx), interpret=True)
    )
    np.testing.assert_array_equal(out, np.take_along_axis(parts, idx, axis=1))


def test_pack_codes():
    rng = np.random.default_rng(9)
    P = pallas_gather.PACK
    codes = rng.integers(0, 4, (3, 21), dtype=np.int32)
    words = np.asarray(pallas_gather.pack_codes(jnp.asarray(codes)))
    assert words.shape == (3, -(-21 // P))
    for b in range(3):
        for i in range(21):
            assert (words[b, i // P] >> (2 * (i % P))) & 3 == codes[b, i]


def test_gather_codes_matches_take_along_axis():
    rng = np.random.default_rng(10)
    for B, W, L in [(8, 1000, 1024), (16, 23040, 2048), (5, 300, 77)]:
        codes = rng.integers(0, 4, (B, W), dtype=np.int32)
        idx = rng.integers(0, W, (B, L), dtype=np.int32)
        out = np.asarray(
            pallas_gather.gather_codes(jnp.asarray(codes), jnp.asarray(idx), interpret=True)
        )
        exp = np.take_along_axis(codes, idx, axis=1)
        np.testing.assert_array_equal(out, exp, err_msg=f"{(B, W, L)}")
