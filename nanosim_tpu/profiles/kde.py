"""Gaussian-KDE length models (`*_aligned_region.pkl`, `*_ht_length.pkl`, ...).

The reference persists sklearn ``KernelDensity`` objects with joblib
(head_align_tail_dist.py:244-278) and samples them with ``kde.sample(n)``
(simulator.py:234-241).  For a Gaussian kernel that sampling is exactly

    x = data[i] + N(0, bandwidth),   i ~ U{0..n-1}

so the only state we need on device is the fitted data matrix and the
bandwidth.  :func:`load_kde` extracts those from any sklearn/joblib pickle —
including old-version pickles whose class definitions no longer import — via a
tolerant unpickler that records constructor/setstate payloads instead of
executing sklearn internals.

:func:`save_kde` writes a real sklearn ``KernelDensity`` via joblib so model
directories produced by our characterization stage remain loadable by the
reference implementation.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class KdeModel:
    """Sampling parameters of a fitted Gaussian KDE."""

    data: np.ndarray  # [n, d] float64 fitted points
    bandwidth: float
    log_transform: bool = False  # sampled as 10**x - 1 (simulator.py:237-238)

    @property
    def n(self) -> int:
        return self.data.shape[0]

    @property
    def dim(self) -> int:
        return self.data.shape[1]

    def sample(self, rng: np.random.Generator, num: int) -> np.ndarray:
        """Host-side sampling mirroring sklearn KernelDensity.sample."""
        i = (rng.uniform(0, 1, num) * self.n).astype(np.int64)
        out = self.data[i] + rng.normal(0.0, self.bandwidth, (num, self.dim))
        if self.log_transform:
            out = np.power(10.0, out) - 1
        return out


class _Opaque:
    """Base for placeholder classes standing in for classes we won't import."""

    _qualname = "?"
    _args = ()
    _kwargs: dict = {}
    _state = None

    def __init__(self, *args, **kwargs):
        self._args = args
        self._kwargs = kwargs

    def __setstate__(self, state):
        self._state = state


def _make_opaque(qualname: str):
    cls = type("Opaque_" + qualname.rsplit(".", 1)[-1], (_Opaque,), {"_qualname": qualname})
    return cls


_SAFE_MODULE_ROOTS = ("numpy", "joblib", "builtins", "collections", "copyreg", "_codecs")


def _tolerant_find_class(super_find, module, name):
    if module.split(".")[0] in _SAFE_MODULE_ROOTS:
        return super_find(module, name)
    return _make_opaque(f"{module}.{name}")


def _walk_for_arrays(obj, out, depth=0):
    """Collect every 2-D float ndarray reachable from an opaque pickle graph."""
    if depth > 8:
        return
    if isinstance(obj, np.ndarray):
        if obj.ndim == 2 and obj.dtype.kind == "f":
            out.append(obj)
        return
    if isinstance(obj, (list, tuple)):
        for x in obj:
            _walk_for_arrays(x, out, depth + 1)
    elif isinstance(obj, dict):
        for x in obj.values():
            _walk_for_arrays(x, out, depth + 1)
    elif isinstance(obj, _Opaque):
        _walk_for_arrays(obj._args, out, depth + 1)
        _walk_for_arrays(obj._kwargs, out, depth + 1)
        _walk_for_arrays(obj._state, out, depth + 1)
        _walk_for_arrays(dict(vars(obj)), out, depth + 1)


def _find_bandwidth(obj, depth=0):
    if depth > 6:
        return None
    if isinstance(obj, dict):
        for key in ("bandwidth_", "bandwidth"):
            if key in obj and isinstance(obj[key], (int, float)):
                return float(obj[key])
        for x in obj.values():
            bw = _find_bandwidth(x, depth + 1)
            if bw is not None:
                return bw
    elif isinstance(obj, _Opaque):
        for src in (obj._state, obj._kwargs, dict(vars(obj))):
            bw = _find_bandwidth(src, depth + 1)
            if bw is not None:
                return bw
    elif isinstance(obj, (list, tuple)):
        for x in obj:
            bw = _find_bandwidth(x, depth + 1)
            if bw is not None:
                return bw
    return None


def _load_tolerant(path: str) -> KdeModel:
    """Unpickle a joblib KDE file without importing sklearn classes.

    Rides joblib's NumpyUnpickler (which restores inlined ndarray payloads)
    but swaps every non-{numpy,joblib,stdlib} class for an opaque state
    holder, then mines the object graph for the fitted data + bandwidth.
    Handles pickles from sklearn versions whose module layout no longer
    imports (e.g. the 0.22-era models shipped with the reference).
    """
    from joblib.numpy_pickle import NumpyUnpickler

    class _Tolerant(NumpyUnpickler):
        def find_class(self, module, name):
            return _tolerant_find_class(super().find_class, module, name)

    import inspect

    kwargs = {}
    if "ensure_native_byte_order" in inspect.signature(NumpyUnpickler.__init__).parameters:
        kwargs["ensure_native_byte_order"] = True
    with open(path, "rb") as f:
        obj = _Tolerant(path, f, **kwargs).load()
    arrays: list[np.ndarray] = []
    _walk_for_arrays(obj, arrays)
    if not arrays:
        raise ValueError(f"no fitted data arrays found in {path}")
    # The KD/Ball tree's first (and largest) 2-D float array is the data.
    data = max(arrays, key=lambda a: a.size)
    bw = _find_bandwidth(obj)
    if bw is None:
        raise ValueError(f"no bandwidth found in {path}")
    return KdeModel(data=np.asarray(data, dtype=np.float64), bandwidth=bw)


def load_kde(path: str, log_transform: bool = False) -> KdeModel:
    """Extract (data, bandwidth) from a pickled sklearn KernelDensity."""
    try:
        import joblib

        kde = joblib.load(path)
        data = np.asarray(kde.tree_.data, dtype=np.float64)
        bw = float(getattr(kde, "bandwidth_", None) or kde.bandwidth)
        return KdeModel(data=data, bandwidth=bw, log_transform=log_transform)
    except Exception:
        model = _load_tolerant(path)
        model.log_transform = log_transform
        return model


def save_kde(path: str, data: np.ndarray, bandwidth: float) -> None:
    """Persist as a real sklearn KernelDensity for reference compatibility."""
    import joblib
    from sklearn.neighbors import KernelDensity

    data = np.asarray(data, dtype=np.float64)
    if data.ndim == 1:
        data = data[:, None]
    kde = KernelDensity(bandwidth=float(bandwidth)).fit(data)
    joblib.dump(kde, path)
