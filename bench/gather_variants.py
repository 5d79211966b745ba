#!/usr/bin/env python
"""Window-gather kernel variant sweep (KT tiles/step, W8 window subrows,
matmul dtype).  One process, all variants, shared fixture."""

import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TILE = 1024
    ROWS = 8

    def make_gather(KT, W8v, dt):
        def kernel(ws_ref, parts_ref, idx_ref, out_ref):
            P = parts_ref.shape[1]
            blk = pl.program_id(0)
            tt = pl.program_id(1)
            iota_p = lax.broadcasted_iota(jnp.int32, (W8v, P), 1)
            iota_pr = lax.broadcasted_iota(jnp.int32, (W8v, P), 0)
            iota_w = lax.broadcasted_iota(jnp.int32, (TILE, W8v), 1)
            iota_l = lax.broadcasted_iota(jnp.int32, (TILE, 128), 1)
            for kt in range(KT):
                t = tt * KT + kt
                for r in range(ROWS):
                    ws = ws_ref[blk * ROWS + r, t]
                    wb = ws >> 9
                    coarse = ((wb + iota_pr) == iota_p).astype(dt)
                    window = lax.dot_general(
                        coarse, parts_ref[r].astype(dt),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    lb = jnp.clip(
                        (idx_ref[r, kt * TILE:(kt + 1) * TILE] - (wb << 9)) >> 2,
                        0, W8v * 128 - 1,
                    )
                    rowsel = ((lb[:, None] >> 7) == iota_w).astype(dt)
                    cand = lax.dot_general(
                        rowsel, window.astype(dt),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    ohl = ((lb[:, None] & 127) == iota_l).astype(jnp.float32)
                    out_ref[r, kt * TILE:(kt + 1) * TILE] = jnp.sum(
                        cand * ohl, axis=1
                    ).astype(jnp.int32)

        @functools.partial(jax.jit, static_argnames=())
        def run(parts3d, idx, ws):
            B, P, _ = parts3d.shape
            L = idx.shape[1]
            with jax.enable_x64(False):
                grid_spec = pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(B // ROWS, L // (TILE * KT)),
                    in_specs=[
                        pl.BlockSpec((ROWS, P, 128), lambda b, t, ws: (b, 0, 0)),
                        pl.BlockSpec((ROWS, TILE * KT), lambda b, t, ws: (b, t)),
                    ],
                    out_specs=pl.BlockSpec((ROWS, TILE * KT), lambda b, t, ws: (b, t)),
                )
                return pl.pallas_call(
                    kernel,
                    grid_spec=grid_spec,
                    out_shape=jax.ShapeDtypeStruct((B, L), jnp.int32),
                )(ws, parts3d, idx)

        return run

    from bench.bench_gather import realistic_idx

    B = int(os.environ.get("GB_B", "1024"))
    L = int(os.environ.get("GB_L", "19456"))
    PB = int(os.environ.get("GB_PB", "4608"))
    reps = int(os.environ.get("GB_REPS", "10"))
    rs = np.random.RandomState(0)
    packed = rs.randint(0, 256, (B, PB)).astype(np.uint8)
    idx = realistic_idx(B, L, PB * 4, rs)
    want = packed[np.arange(B)[:, None], idx >> 2]

    pad_w = (-PB) % 128
    packedp = np.pad(packed, ((0, 0), (0, pad_w)))
    P = (PB + pad_w) // 128
    parts3d = jnp.asarray(packedp.astype(np.int32).reshape(B, P, 128))
    ji = jnp.asarray(idx)

    from nanosim_tpu.ops import window_gather as wg

    n_tiles = L // TILE
    ws8, ov = wg.window_starts(jnp.asarray(idx), jnp.ones((B, L), bool), n_tiles)
    ws8 = np.asarray(ws8)
    print("overflow(4k):", int(np.asarray(ov).sum()), file=sys.stderr)

    def timeit(f, n=reps):
        r = f()
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = f()
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / n

    import jax.numpy as jnp2

    for name, KT, W8v, dt in [
        ("KT4 W8 f32 ", 4, 8, jnp.float32),
        ("KT4 W4 f32 ", 4, 4, jnp.float32),
        ("KT4 W4 bf16", 4, 4, jnp.bfloat16),
        ("KT8 W4 bf16", 8, 4, jnp.bfloat16),
    ]:
        Lp = -(-L // (TILE * KT)) * (TILE * KT)
        if Lp != L:
            jix = jnp.pad(ji, ((0, 0), (0, Lp - L)))
            wsx = np.pad(ws8, ((0, 0), (0, Lp // TILE - n_tiles)))
        else:
            jix, wsx = ji, ws8
        # variant window must still cover each tile's span
        span_ok = True
        if W8v < 8:
            mx = np.where(np.ones((B, L), bool), idx, -1).reshape(B, n_tiles, TILE).max(2)
            span_ok = bool((mx - ws8[:, :n_tiles] < W8v * 128 * 4).all())
        fn = make_gather(KT, W8v, dt)
        try:
            out = np.asarray(fn(parts3d, jix, jnp.asarray(wsx)))[:, :L]
            ok = (out == want).all() and span_ok
            t = timeit(lambda: fn(parts3d, jix, jnp.asarray(wsx)))
            print(f"{name}: {t * 1e3:8.2f} ms  correct={ok}", file=sys.stderr)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", file=sys.stderr)


if __name__ == "__main__":
    main()
