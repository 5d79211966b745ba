"""Generator for kde_sklearn_0221.pkl: a KDE pickle with scikit-learn
0.22.1's EXACT on-disk object layout.

The reference pins scikit-learn==0.22.1 (/root/reference/README.md:41) and
ships pre-trained models as joblib pickles of fitted ``KernelDensity``
objects.  Those tarballs are absent from this checkout, so this script
reconstructs the 0.22.1 pickle structure opcode-by-opcode (the layout is
documented and stable):

* ``sklearn.neighbors._kde.KernelDensity`` — protocol-2 NEWOBJ + a BUILD
  dict of the 0.22.1 constructor params (``algorithm, atol, bandwidth,
  breadth_first, kernel, leaf_size, metric, metric_params, rtol``) plus the
  fitted ``tree_``; NO ``feature_names_in_`` / ``n_features_in_`` (added in
  0.23/1.0) and NO ``bandwidth_`` (added in 1.0).
* ``tree_`` — ``sklearn.neighbors._kd_tree.newObj(KDTree)`` rebuilt through
  the 0.22.1 ``BinaryTree.__getstate__`` 13-tuple:
  ``(data, idx_array, node_data, node_bounds, leaf_size, n_levels, n_nodes,
  n_trims, n_leaves, n_splits, n_calls, dist_metric, sample_weight_arr)``
  with ``node_data``'s structured NodeData dtype
  ``[(idx_start, i8), (idx_end, i8), (is_leaf, i8), (radius, f8)]``.
* ``dist_metric`` — ``sklearn.neighbors._dist_metrics.newObj
  (EuclideanDistance)`` with the 0.22.1 ``DistanceMetric.__getstate__``
  ``(p, vec, mat)`` state.

``sklearn.neighbors._dist_metrics`` was removed from scikit-learn in 1.3
(moved to ``sklearn.metrics`` in 1.1), so CURRENT sklearn cannot unpickle
this file at all (ModuleNotFoundError mid-stream) — exactly the failure mode
a real 0.22-era model file produces today — while profiles/kde.py's tolerant
loader must still extract (data, bandwidth).

Each embedded object is spliced in as a self-contained protocol-2 fragment
(memo indices restart per fragment; intra-fragment GETs only ever reference
the fragment's own PUTs, so overwriting earlier slots is harmless).
"""

import os
import pickle

import numpy as np

NODE_DTYPE = np.dtype([
    ("idx_start", "<i8"), ("idx_end", "<i8"), ("is_leaf", "<i8"),
    ("radius", "<f8"),
])

BANDWIDTH = 42.75  # aligned-length-KDE-scale bandwidth


def fixture_data() -> np.ndarray:
    """The fitted data matrix embedded in the fixture (deterministic)."""
    rs = np.random.RandomState(20221)
    return np.sort(rs.lognormal(7.5, 0.55, size=(257, 1)), axis=0)


def _g(module: str, name: str) -> bytes:
    return b"c" + module.encode() + b"\n" + name.encode() + b"\n"


def _sub(obj) -> bytes:
    b = pickle.dumps(obj, protocol=2)
    assert b[:2] == b"\x80\x02" and b[-1:] == b"."
    return b[2:-1]


def build(path: str) -> None:
    data = fixture_data()
    n, d = data.shape
    idx = np.arange(n, dtype=np.int64)
    node_data = np.zeros(1, NODE_DTYPE)
    node_data[0] = (0, n, 1, float(data.max() - data.min()) / 2.0)
    node_bounds = np.stack([data.min(0)[None, :], data.max(0)[None, :]])

    dist_metric = (
        _g("sklearn.neighbors._dist_metrics", "newObj")
        + b"(" + _g("sklearn.neighbors._dist_metrics", "EuclideanDistance")
        + b"tR"
        + _sub((2.0, np.zeros(1), np.zeros((1, 1))))
        + b"b"
    )
    tree_state = (
        b"(" + _sub(data) + _sub(idx) + _sub(node_data) + _sub(node_bounds)
        + _sub(40) + _sub(1) + _sub(1) + _sub(0) + _sub(1) + _sub(0) + _sub(0)
        + dist_metric + _sub(None) + b"t"
    )
    tree = (
        _g("sklearn.neighbors._kd_tree", "newObj")
        + b"(" + _g("sklearn.neighbors._kd_tree", "KDTree") + b"tR"
        + tree_state + b"b"
    )
    kv = b""
    for key, val in (
        ("algorithm", "auto"), ("atol", 0), ("bandwidth", BANDWIDTH),
        ("breadth_first", True), ("kernel", "gaussian"), ("leaf_size", 40),
        ("metric", "euclidean"), ("metric_params", None), ("rtol", 0),
    ):
        kv += _sub(key) + _sub(val)
    kv += _sub("tree_") + tree
    kde = (
        _g("sklearn.neighbors._kde", "KernelDensity") + b")\x81"
        + b"}(" + kv + b"u" + b"b"
    )
    with open(path, "wb") as f:
        f.write(b"\x80\x02" + kde + b".")


if __name__ == "__main__":
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "kde_sklearn_0221.pkl")
    build(out)
    print("wrote", out, os.path.getsize(out), "bytes")
