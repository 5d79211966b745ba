"""AOT program store: skip trace+lower on warm starts.

The XLA persistent cache removes backend COMPILATION, but jax must still
trace and lower the (large) batch program to compute the cache key — 90 to
160 s for the genome pipeline on this host.  `jax.export` captures the
lowered module once; deserializing it costs milliseconds and the first call
goes straight to the (cached) executable, cutting warm cold-start to
seconds.

Safety: the exported module BAKES IN everything that was a closure constant
under jit — the model tables, the genome's chromosome offsets/lengths, every
static shape — so an artifact is only valid for the exact same inputs.  The
store key is therefore a digest of (static kwargs, the tables pytree bytes,
genome metadata, backend platform, and a fingerprint of the source files
that define the traced semantics).  A stale or mismatched artifact simply
misses and the normal trace path runs.

Enabled per-run via NANOSIM_TPU_AOT_DIR (defaults to `<repo>/.xla_cache/aot`
when that directory exists); artifacts are only WRITTEN when
NANOSIM_TPU_AOT_SAVE=1 (exporting costs a trace, so saving is an explicit
prebuild step — e.g. priming the committed cache with the bench shapes).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

_SRC_FP = None


def _code_fingerprint() -> str:
    """Digest of the sources that define the traced program's semantics."""
    global _SRC_FP
    if _SRC_FP is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for rel in (
            "ops/rng.py", "ops/error_walk.py", "ops/walk_pallas.py",
            "ops/apply_errors.py",
            "ops/tables.py", "ops/seqops.py", "ops/homopolymer.py",
            "sim/genome_mode.py", "sim/extract.py", "sim/bundles.py",
        ):
            p = os.path.join(root, rel)
            try:
                with open(p, "rb") as f:
                    h.update(f.read())
            except OSError:
                h.update(rel.encode())
        _SRC_FP = h.hexdigest()[:16]
    return _SRC_FP


def _hash_pytree(h, tree):
    import jax

    for leaf in jax.tree_util.tree_leaves(tree):
        a = np.asarray(leaf)
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(a.tobytes())


def aot_key(fn_partial, host_material=None) -> str:
    """Digest for a functools.partial(genome_batch, genome=..., tables=...,
    **static_kwargs).

    host_material, when provided, replaces hashing the genome/tables device
    pytrees: per-leaf np.asarray on a remote backend costs one tunnel round
    trip EACH (~25 s total measured), so callers pass host-side numpy
    arrays/bytes covering the same state instead."""
    import jax

    h = hashlib.sha256()
    h.update(_code_fingerprint().encode())
    h.update(jax.default_backend().encode())
    kw = dict(fn_partial.keywords)
    genome = kw.pop("genome")
    tables = kw.pop("tables")
    for k in sorted(kw):
        h.update(f"{k}={kw[k]!r};".encode())
    if host_material is not None:
        _hash_pytree(h, host_material)
    else:
        _hash_pytree(h, (genome.offsets, genome.lengths, genome.circular,
                         genome.species_of_chrom, genome.chrom_start_of_species))
        h.update(str(genome.genome_len).encode())
        _hash_pytree(h, tables)
    return h.hexdigest()[:24]


def _store_dir():
    d = os.environ.get("NANOSIM_TPU_AOT_DIR")
    if d:
        return d
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cand = os.path.join(repo, ".xla_cache", "aot")
    return cand if os.path.isdir(cand) else None


def maybe_aot(fn_partial, out_cls, example_args, host_material=None):
    """Return a drop-in replacement for fn_partial(base, slots) backed by a
    deserialized export when available (or freshly exported when
    NANOSIM_TPU_AOT_SAVE=1); None when no artifact applies."""
    if os.environ.get("NANOSIM_TPU_AOT", "1") == "0":
        return None
    d = _store_dir()
    if d is None:
        return None
    try:
        from jax import export as jexport
    except ImportError:
        return None
    key = aot_key(fn_partial, host_material)
    path = os.path.join(d, key + ".jaxexp")
    exp = None
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                exp = jexport.deserialize(bytearray(f.read()))
        except Exception:
            exp = None
    if exp is None and os.environ.get("NANOSIM_TPU_AOT_SAVE") == "1":
        import jax

        try:
            exp = jexport.export(jax.jit(lambda b, s: tuple(fn_partial(b, s))))(
                *example_args)
            os.makedirs(d, exist_ok=True)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(exp.serialize())
            os.replace(tmp, path)
        except Exception as e:  # pragma: no cover - fall back to tracing
            import sys

            print(f"AOT export failed ({type(e).__name__}: {e}); tracing normally",
                  file=sys.stderr)
            return None
    if exp is None:
        return None

    def call(base, slots):
        return out_cls(*exp.call(base, slots))

    return call
