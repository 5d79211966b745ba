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
