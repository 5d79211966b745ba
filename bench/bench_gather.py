#!/usr/bin/env python
"""Microbenchmark window-gather kernel variants at bench shapes.

Builds realistic near-affine source indices (slope-1 runs with indel drift,
like read assembly) and times each variant on the live backend.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def realistic_idx(B, L, n_codes, rs):
    """Piecewise slope-1 index maps with event-like drift."""
    idx = np.zeros((B, L), np.int32)
    for b in range(B):
        drift = 0
        j = 0
        base = 0
        row = np.arange(L, dtype=np.int64)
        # drift changes every ~170 positions by -8..8
        n_ev = L // 170
        pts = np.sort(rs.randint(0, L, n_ev))
        deltas = rs.randint(-8, 9, n_ev)
        d = np.zeros(L, np.int64)
        d[pts] += deltas
        idx[b] = np.clip(row + np.cumsum(d), 0, n_codes - 1).astype(np.int32)
    return idx


def main():
    import jax
    import jax.numpy as jnp

    from nanosim_tpu.ops import window_gather as wg

    B = int(os.environ.get("GB_B", "1024"))
    L = int(os.environ.get("GB_L", "19456"))
    PB = int(os.environ.get("GB_PB", "4608"))
    reps = int(os.environ.get("GB_REPS", "10"))
    rs = np.random.RandomState(0)
    packed = rs.randint(0, 256, (B, PB)).astype(np.uint8)
    idx = realistic_idx(B, L, PB * 4, rs)
    mask = np.ones((B, L), bool)

    jp = jnp.asarray(packed)
    ji = jnp.asarray(idx)
    n_tiles = L // wg.TILE
    ws, ov = wg.window_starts(jnp.asarray(idx), jnp.asarray(mask), n_tiles)
    ws = jax.block_until_ready(ws)
    print("overflow lanes:", int(np.asarray(ov).sum()), file=sys.stderr)

    want = packed[np.arange(B)[:, None], idx >> 2]

    def timeit(f, n=reps):
        r = f()
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = f()
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / n

    out = np.asarray(wg.gather_bytes_windowed(jp, ji, ws))
    ok = (out == want).all()
    t = timeit(lambda: wg.gather_bytes_windowed(jp, ji, ws))
    print(f"window_gather v1:  {t * 1e3:8.2f} ms  correct={ok}", file=sys.stderr)

    if hasattr(wg, "gather_bytes_windowed_v2"):
        out2 = np.asarray(wg.gather_bytes_windowed_v2(jp, ji, ws))
        ok2 = (out2 == want).all()
        t2 = timeit(lambda: wg.gather_bytes_windowed_v2(jp, ji, ws))
        print(f"window_gather v2:  {t2 * 1e3:8.2f} ms  correct={ok2}", file=sys.stderr)

    t3 = timeit(lambda: jnp.take_along_axis(
        jp.astype(jnp.int32), jnp.clip(ji >> 2, 0, PB - 1), axis=1))
    print(f"xla take_along:    {t3 * 1e3:8.2f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
