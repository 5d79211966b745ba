"""Pallas assembly kernel vs a numpy reference implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

from nanosim_tpu.ops.pallas_assemble import assemble_rolls

COMP = {ord("A"): ord("T"), ord("T"): ord("A"), ord("C"): ord("G"), ord("G"): ord("C")}


def _numpy_reference(mid, ht, head, l_new, total, is_rev, l_out):
    B = mid.shape[0]
    out = np.zeros((B, l_out), np.uint16)
    for b in range(B):
        pre = np.zeros(l_out, np.uint16)
        h, ln, t = head[b], l_new[b], total[b]
        pre[:h] = ht[b, :h]
        pre[h : h + ln] = mid[b, :ln]
        pre[h + ln : t] = ht[b, h : h + (t - h - ln)]
        if is_rev[b]:
            rev = pre[:t][::-1].copy()
            base = rev & 0xFF
            cls = rev & 0xFF00
            cb = np.array([COMP.get(x, x) for x in base], np.uint16)
            out[b, :t] = cb | cls
        else:
            out[b, :t] = pre[:t]
    return out


@pytest.mark.parametrize("interpret", [True])
def test_assemble_rolls_matches_reference(interpret):
    rng = np.random.default_rng(0)
    B, l_cap, ht_cap, l_out = 16, 256, 128, 384
    bases = np.frombuffer(b"ACGT", np.uint8)
    mid = (
        bases[rng.integers(0, 4, (B, l_cap))].astype(np.uint16)
        | (rng.integers(0, 3, (B, l_cap)).astype(np.uint16) << 8)
    )
    ht = bases[rng.integers(0, 4, (B, ht_cap))].astype(np.uint16) | (3 << 8)
    l_new = rng.integers(10, l_cap, B).astype(np.int32)
    head = rng.integers(0, 60, B).astype(np.int32)
    tail = rng.integers(0, 60, B).astype(np.int32)
    total = (head + l_new + tail).astype(np.int32)
    is_rev = rng.random(B) < 0.5

    got = np.asarray(
        assemble_rolls(
            jnp.asarray(mid), jnp.asarray(ht), jnp.asarray(head), jnp.asarray(l_new),
            jnp.asarray(total), jnp.asarray(is_rev), l_out, interpret=interpret,
        )
    )
    want = _numpy_reference(mid, ht, head, l_new, total, is_rev, l_out)
    np.testing.assert_array_equal(got, want)
