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


def test_window_gather_multiblock_multitile():
    """gather_bytes_windowed at several ROW blocks x several tiles, with
    per-(block, tile) window starts (regression: the window-start operand is
    block-indexed SMEM — a whole-array scalar prefetch overflowed SMEM at
    B >= ~8k, and per-block indexing must still address the right rows)."""
    from nanosim_tpu.ops import window_gather as wg

    rng = np.random.default_rng(11)
    B = 4 * wg.ROWS  # 4 lane blocks
    n_tiles = 3
    L = n_tiles * wg.TILE
    PB = 4096  # 16384 codes
    packed = rng.integers(0, 256, (B, PB)).astype(np.uint8)
    # per-tile index runs confined to DIFFERENT 512-aligned windows per
    # (lane, tile) so wrong ws addressing cannot silently match
    idx = np.empty((B, L), np.int32)
    ws = np.empty((B, n_tiles), np.int32)
    for b in range(B):
        for t in range(n_tiles):
            start = int(rng.integers(0, (4 * PB - wg.WINDOW_CODES) // 512)) * 512
            ws[b, t] = start
            lo = rng.integers(start, start + wg.WINDOW_CODES, wg.TILE)
            lo.sort()
            idx[b, t * wg.TILE : (t + 1) * wg.TILE] = lo
    out = np.asarray(
        wg.gather_bytes_windowed(
            jnp.asarray(packed), jnp.asarray(idx), jnp.asarray(ws), interpret=True
        )
    )
    want = packed[np.arange(B)[:, None], idx >> 2]
    np.testing.assert_array_equal(out, want)
