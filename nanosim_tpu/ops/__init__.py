"""Batched JAX/Pallas device kernels for the simulation hot path.

x64 is enabled so reference-genome coordinates (> 2^31 for mammalian genomes)
fit in int64; all hot-path arrays remain explicitly int32/uint8/float32.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# Honor JAX_PLATFORMS even when a backend plugin (e.g. the axon TPU plugin)
# overrides it at import time: a user asking for cpu must get cpu — otherwise
# CLI subprocesses silently queue on a remote TPU.  But do NOT clobber an
# explicit `jax.config.update("jax_platforms", ...)` made by an embedding
# application (e.g. tests forcing cpu): only re-apply the env value when the
# current config is unset or still the plugin's own override ("axon...").
_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    _cur = getattr(jax.config, "jax_platforms", None)
    if _cur is None or _cur == _plat or str(_cur).startswith("axon"):
        try:
            jax.config.update("jax_platforms", _plat)
        except Exception:
            pass

# Persistent compilation cache: the batch pipelines are large programs and
# remote-TPU compiles are expensive; cache survives across runs.  A
# repo-local `.xla_cache/` (prebuilt and committed with the bench shapes)
# takes precedence so a fresh checkout starts warm; otherwise a user cache.
_repo_cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".xla_cache",
)
_cache_dir = os.environ.get(
    "NANOSIM_TPU_COMPILATION_CACHE",
    _repo_cache if os.path.isdir(_repo_cache) else os.path.expanduser("~/.cache/nanosim_tpu_xla"),
)
if _cache_dir:
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
