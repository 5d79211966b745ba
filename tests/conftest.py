"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env before any jax import (SURVEY.md §4: multi-host semantics are
tested via CPU device-count spoofing).
"""

import os
import sys

# NANOSIM_TPU_TEST_TPU=1 keeps the session's real backend (single real
# chip) so targeted tests — e.g. the reference bit-identity proofs — can be
# executed against the TPU compute path (Pallas walks included); the
# default stays the 8-device virtual CPU mesh the suite is designed for.
_REAL_TPU = os.environ.get("NANOSIM_TPU_TEST_TPU") == "1"
if not _REAL_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
# tests must not pollute the repo-local prebuilt cache (.xla_cache ships the
# bench shapes); route their compile cache to the user cache instead
os.environ.setdefault(
    "NANOSIM_TPU_COMPILATION_CACHE", os.path.expanduser("~/.cache/nanosim_tpu_xla")
)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin in this image overrides JAX_PLATFORMS at import time;
# force CPU through the config API before any backend initialization.
import jax  # noqa: E402

if not _REAL_TPU:
    jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
