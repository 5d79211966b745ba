"""Pallas TPU kernel: windowed per-row byte gather for read assembly.

The full-width one-hot gather (pallas_gather.py) pays TILE x P work where P
spans the WHOLE parts row (~45 x 128-byte subrows at ONT capacities).  But
read-assembly source indices are NEARLY CONTIGUOUS: within a tile of output
positions the source span is the tile width plus local indel drift.  This
kernel exploits that with a two-level one-hot:

    coarse:  one-hot [W8, P]  @ parts [P, 128]   -> window  [W8, 128]
    fine:    one-hot [TILE, W8] @ window          -> cand   [TILE, 128]
    lane:    sum(cand * one-hot128(lo), axis=1)   -> bytes  [TILE]

with W8 = 8 window subrows (1024 bytes) versus P ~ 45 — the expensive fine
stage shrinks ~P/W8 ~ 6x.  Window starts (per lane x tile, in CODE units,
512-aligned) and the drift-overflow check are computed by the caller in XLA;
tiles whose index span exceeds the window are flagged and the lane re-runs
through the full-budget/XLA-gather rescue program.

Same Mosaic constructs as the proven pallas_gather kernel (broadcasted_iota,
compares, f32 dot_general) — no dynamic slices, no rolls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import os

TILE = 1024  # output positions per grid step
ROWS = int(os.environ.get("NANOSIM_TPU_GATHER_ROWS", "8"))  # lanes per grid step
W8 = 8  # window subrows of 128 bytes = 1024-byte window = 4096 codes
WINDOW_CODES = W8 * 128 * 4


def _kernel(ws_ref, parts_ref, idx_ref, out_ref):
    # ws_ref is a per-block SMEM operand holding this block's ROWS of window
    # starts for EVERY tile (tiny: ROWS x n_tiles i32).  A whole-array
    # scalar-prefetch here would pin [B, n_tiles] in SMEM, which overflows
    # the ~1 MB SMEM budget at B >= ~8k lanes (observed as a Mosaic
    # "would exceed memory (space=smem)" compile failure).
    P = parts_ref.shape[1]
    t = pl.program_id(1)
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (W8, P), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (TILE, W8), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (TILE, 128), 1)
    for r in range(ROWS):
        ws = ws_ref[r, t]  # window start, codes (512-aligned)
        wb = ws >> 9  # window start subrow (128 bytes = 512 codes)
        coarse = ((wb + jax.lax.broadcasted_iota(jnp.int32, (W8, P), 0)) == iota_p).astype(
            jnp.float32
        )
        window = jax.lax.dot_general(
            coarse,
            parts_ref[r].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [W8, 128]
        lb = jnp.clip((idx_ref[r, :] - (wb << 9)) >> 2, 0, W8 * 128 - 1)
        rowsel = ((lb[:, None] >> 7) == iota_w).astype(jnp.float32)
        cand = jax.lax.dot_general(
            rowsel,
            window,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TILE, 128]
        ohl = ((lb[:, None] & 127) == iota_l).astype(jnp.float32)
        out_ref[r, :] = jnp.sum(cand * ohl, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_windowed_i32(parts3d, idx, ws, interpret=False):
    B, P, _ = parts3d.shape
    L = idx.shape[1]
    n_tiles = ws.shape[1]
    with jax.enable_x64(False):
        from jax.experimental.pallas import tpu as pltpu

        return pl.pallas_call(
            _kernel,
            grid=(B // ROWS, L // TILE),
            in_specs=[
                pl.BlockSpec((ROWS, n_tiles), lambda b, t: (b, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((ROWS, P, 128), lambda b, t: (b, 0, 0)),
                pl.BlockSpec((ROWS, TILE), lambda b, t: (b, t)),
            ],
            out_specs=pl.BlockSpec((ROWS, TILE), lambda b, t: (b, t)),
            out_shape=jax.ShapeDtypeStruct((B, L), jnp.int32),
            interpret=interpret,
        )(ws, parts3d, idx)


def window_starts(idx: jax.Array, mask: jax.Array, n_tiles: int):
    """Per-(lane, tile) window starts + per-lane drift-overflow flag.

    idx:  [B, L] code indices (only meaningful where mask)
    mask: [B, L] positions that will actually be read
    Returns (ws [B, n_tiles] i32 512-aligned, overflow [B] bool).
    """
    B, L = idx.shape
    big = jnp.int32(2**30)
    m = jnp.where(mask, idx, big).reshape(B, n_tiles, TILE)
    tmin = jnp.min(m, axis=2)
    mx = jnp.where(mask, idx, -1).reshape(B, n_tiles, TILE)
    tmax = jnp.max(mx, axis=2)
    ws = jnp.where(tmin == big, 0, tmin & ~jnp.int32(511))
    overflow = jnp.any(tmax - ws >= WINDOW_CODES, axis=1)
    return ws, overflow


def gather_bytes_windowed(
    packed: jax.Array,  # [B, PB] uint8 packed codes (4/byte)
    idx: jax.Array,  # [B, L] int32 code indices (clipped to [0, 4*PB))
    ws: jax.Array,  # [B, n_tiles] int32 window starts (512-aligned codes)
    interpret: bool = False,
) -> jax.Array:
    """[B, L] int32 packed byte containing code idx (extract bits outside)."""
    B, PB = packed.shape
    L = idx.shape[1]
    pad_w = (-PB) % 128
    if pad_w:
        packed = jnp.pad(packed, ((0, 0), (0, pad_w)))
    P = (PB + pad_w) // 128
    pad_l = (-L) % TILE
    assert pad_l == 0, "pad L to TILE multiple in the caller"
    pad_b = (-B) % ROWS
    if pad_b:
        packed = jnp.pad(packed, ((0, pad_b), (0, 0)))
        idx = jnp.pad(idx, ((0, pad_b), (0, 0)))
        ws = jnp.pad(ws, ((0, pad_b), (0, 0)))
    parts3d = packed.astype(jnp.int32).reshape(packed.shape[0], P, 128)
    out = _gather_windowed_i32(parts3d, idx.astype(jnp.int32), ws.astype(jnp.int32),
                               interpret=interpret)
    return out[:B]


_SUPPORTED = None


def supported() -> bool:
    """Probe once whether the kernel compiles+runs on this backend."""
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

            rs = np.random.RandomState(0)
            PB = 1024
            packed = rs.randint(0, 256, (ROWS, PB)).astype(np.uint8)
            idx = rs.randint(0, 2048, (ROWS, TILE)).astype(np.int32)
            idx.sort(axis=1)
            ws = np.zeros((ROWS, 1), np.int32)
            out = np.asarray(
                gather_bytes_windowed(jnp.asarray(packed), jnp.asarray(idx), jnp.asarray(ws))
            )
            want = packed[np.arange(ROWS)[:, None], idx >> 2]
            _SUPPORTED = bool((out == want).all())
        except Exception:
            _SUPPORTED = False
    return _SUPPORTED
