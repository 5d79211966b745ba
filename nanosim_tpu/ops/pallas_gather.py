"""Pallas TPU kernel: batched per-row gather as one-hot matmul.

`jnp.take_along_axis` over [B, L] with arbitrary per-row indices lowers to a
generic per-element gather (~85M elem/s on v5e) — the dominant device cost
of read assembly (apply_errors.fused_read).  This kernel reformulates the
gather as structured MXU/VPU work:

    parts row  -> [P, 128] matrix (128-base "rows")
    index      -> (hi, lo) = (idx >> 7, idx & 127)
    row select -> one-hot[TILE, P] @ parts_mat  (MXU, f32 — exact for u8)
    lane select-> sum(cand * onehot128(lo), axis=1)  (VPU)

measured ~3.7x the XLA gather on v5e (79ms vs 297ms for 1024x22784).

Constraints of the axon Mosaic toolchain baked in here: no 8/16-bit dtypes
inside the kernel (i32/f32 only — callers convert outside), f32 MXU (bf16
casts crash the compile helper), TILE=1024 outputs per inner step (smaller
tiles are program-overhead-bound).

Cost scales with L x P (one-hot width = whole parts row), i.e. quadratic in
read length; `supported()` gates on P so pathological capacities fall back
to the XLA gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE = 1024
ROWS = 8
MAX_P = 512  # beyond this the one-hot matmul loses to the XLA gather


def _kernel(parts_ref, idx_ref, out_ref):
    P = parts_ref.shape[1]
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (TILE, P), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (TILE, 128), 1)
    for r in range(ROWS):
        idx = idx_ref[r, :]
        hi = idx >> 7
        lo = idx & 127
        oh = (hi[:, None] == iota_p).astype(jnp.float32)
        cand = jax.lax.dot_general(
            oh,
            parts_ref[r].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TILE, 128]
        ohl = (lo[:, None] == iota_l).astype(jnp.float32)
        out_ref[r, :] = jnp.sum(cand * ohl, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_i32(parts3d: jax.Array, idx: jax.Array, interpret: bool = False) -> jax.Array:
    B, P, _ = parts3d.shape
    L = idx.shape[1]
    # The package enables jax_enable_x64 (genome coordinates), under which
    # Pallas index maps trace their constants as i64 — Mosaic then fails to
    # legalize the index-map function.  Force 32-bit mode around the
    # pallas_call construction; the operands are i32 either way.
    with jax.enable_x64(False):
        return pl.pallas_call(
            _kernel,
            grid=(B // ROWS, L // TILE),
            in_specs=[
                pl.BlockSpec((ROWS, P, 128), lambda b, t: (b, 0, 0)),
                pl.BlockSpec((ROWS, TILE), lambda b, t: (b, t)),
            ],
            out_specs=pl.BlockSpec((ROWS, TILE), lambda b, t: (b, t)),
            out_shape=jax.ShapeDtypeStruct((B, L), jnp.int32),
            interpret=interpret,
        )(parts3d, idx)


def gather_u8(parts: jax.Array, idx: jax.Array, interpret: bool = False) -> jax.Array:
    """take_along_axis(parts, idx, axis=1) for uint8 parts, int32 idx.

    idx must already be clipped to [0, parts.shape[1]).  Call sites gate on
    `supported()`; this function itself only handles shape padding.
    """
    B, W = parts.shape
    L = idx.shape[1]
    pad_w = (-W) % 128
    if pad_w:
        parts = jnp.pad(parts, ((0, 0), (0, pad_w)))
    P = (W + pad_w) // 128
    pad_l = (-L) % TILE
    if pad_l:
        idx = jnp.pad(idx, ((0, 0), (0, pad_l)))
    pad_b = (-B) % ROWS
    if pad_b:
        parts = jnp.pad(parts, ((0, pad_b), (0, 0)))
        idx = jnp.pad(idx, ((0, pad_b), (0, 0)))
    parts3d = parts.astype(jnp.int32).reshape(parts.shape[0], P, 128)
    out = _gather_i32(parts3d, idx.astype(jnp.int32), interpret=interpret)
    return out[:B, :L].astype(jnp.uint8)


# --- packed-code gather ------------------------------------------------------
#
# A major share of the one-hot formulation's cost scales with P (the one-hot
# width): the [TILE, P] one-hot build and the [TILE, P] @ [P, 128] matmul.
# For read assembly the payload is a 2-bit base code, so packing 4 codes per
# byte shrinks P 4x while REUSING the byte kernel unchanged (no new Mosaic
# constructs to mis-legalize); the 2-bit field extraction runs as plain XLA
# elementwise ops on the fetched byte.

PACK = 4  # codes per byte


def pack_codes(codes: jax.Array) -> jax.Array:
    """[B, W] 2-bit codes -> [B, ceil(W/4)] packed uint8 bytes (code k of
    byte w is bits [2k, 2k+2); base index = 4w + k)."""
    B, W = codes.shape
    pad = (-W) % PACK
    if pad:
        codes = jnp.pad(codes, ((0, 0), (0, pad)))
    c = codes.astype(jnp.int32).reshape(B, (W + pad) // PACK, PACK)
    shifts = (jnp.arange(PACK, dtype=jnp.int32) * 2)[None, None, :]
    return jnp.sum(c << shifts, axis=2, dtype=jnp.int32).astype(jnp.uint8)


def gather_codes(codes: jax.Array, idx: jax.Array, interpret: bool = False) -> jax.Array:
    """take_along_axis(codes, idx, axis=1) for 2-bit codes: 4-per-byte
    packing + the byte one-hot kernel + XLA field extraction.
    codes: [B, W] integer 0..3; idx clipped to [0, W).  Returns [B, L] i32."""
    idx = idx.astype(jnp.int32)
    words = pack_codes(codes)  # [B, ceil(W/4)] u8
    byte = gather_u8(words, idx >> 2, interpret=interpret)
    sub = (idx & 3).astype(jnp.uint8) * 2
    return ((byte >> sub) & 3).astype(jnp.int32)


_SUPPORTED = None


def supported() -> bool:
    """Probe once whether the kernel compiles+runs on this backend (the axon
    Mosaic helper rejects several constructs; other runtimes vary)."""
    global _SUPPORTED
    if _SUPPORTED is None:
        import os

        if os.environ.get("NANOSIM_TPU_NO_PALLAS"):
            _SUPPORTED = False
            return False
        try:
            if jax.default_backend() not in ("tpu", "axon"):
                _SUPPORTED = False
                return False
            import numpy as np

            parts = jnp.asarray(np.arange(ROWS * 256, dtype=np.uint8).reshape(ROWS, 256))
            idx = jnp.zeros((ROWS, TILE), jnp.int32).at[:, 1].set(5)
            out = np.asarray(gather_u8(parts, idx))
            _SUPPORTED = bool((out[:, 0] == parts[:, 0]).all() and (out[0, 1] == parts[0, 5]))
        except Exception:
            _SUPPORTED = False
    return _SUPPORTED


def usable_for(width: int) -> bool:
    return supported() and (width + 127) // 128 <= MAX_P


_PACKED_SUPPORTED = None


def packed_supported() -> bool:
    """Probe the packed-code kernel (variable shifts etc. may not legalize
    on every Mosaic toolchain; fall back to the byte kernel if not)."""
    global _PACKED_SUPPORTED
    if _PACKED_SUPPORTED is None:
        import os

        if os.environ.get("NANOSIM_TPU_NO_PALLAS") or os.environ.get(
            "NANOSIM_TPU_NO_PACKED_GATHER"
        ):
            _PACKED_SUPPORTED = False
            return False
        try:
            if jax.default_backend() not in ("tpu", "axon"):
                _PACKED_SUPPORTED = False
                return False
            import numpy as np

            rng = np.random.RandomState(0)
            codes = rng.randint(0, 4, (ROWS, 2048)).astype(np.int32)
            idx = rng.randint(0, 2048, (ROWS, TILE)).astype(np.int32)
            out = np.asarray(gather_codes(jnp.asarray(codes), jnp.asarray(idx)))
            want = np.take_along_axis(codes, idx, axis=1)
            _PACKED_SUPPORTED = bool((out == want).all())
        except Exception:
            _PACKED_SUPPORTED = False
    return _PACKED_SUPPORTED


def gather_mode(width: int):
    """Best available gather implementation for a parts row of `width`:
    'packed' (2-bit one-hot kernel), True (byte kernel), or False (XLA)."""
    if packed_supported():
        return "packed"
    return usable_for(width)
