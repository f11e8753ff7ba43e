"""Trajectory artifact IO: nested pytrees <-> compressed .npz.

Shipped trajectory artifacts are .npz, not pickle: pickles execute
arbitrary code on load (a hazard for anything distributed with a repo) and
are opaque to non-Python tooling. A nested {dict, list, leaf-array} tree is
flattened to slash-separated keys ("infos/world/mid_price", "rewards/0");
lists are recognised on load by all-integer child keys. `None` leaves are
recorded with a sentinel key so round-trips are exact.

Reference parity note: the upstream eval harness pickles `traj_batch`
(baseline_JAXMARL.py:624-679); this is the same artifact with a safe,
portable container.
"""
from __future__ import annotations

import numpy as np

_NONE_KEY = "__none__"


def _flatten(obj, prefix, out):
    if obj is None:
        out[prefix + _NONE_KEY] = np.zeros((), np.int8)
    elif isinstance(obj, dict):
        for k, v in obj.items():
            _flatten(v, f"{prefix}{k}/", out)
    elif isinstance(obj, (list, tuple)):
        for i, v in enumerate(obj):
            _flatten(v, f"{prefix}{i}/", out)
    elif isinstance(obj, (str, bytes)):
        out[prefix.rstrip("/")] = np.asarray(obj)
    else:
        out[prefix.rstrip("/")] = np.asarray(obj)


def save_traj(path: str, tree) -> None:
    """Write a nested {dict,list,array,str,None} tree as compressed npz."""
    flat = {}
    _flatten(tree, "", flat)
    np.savez_compressed(path, **flat)


def _insert(root, parts, value):
    node = root
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _listify(node):
    if not isinstance(node, dict):
        return node
    if len(node) == 1 and _NONE_KEY in node:
        return None
    out = {k: _listify(v) for k, v in node.items()}
    if out and all(k.isdigit() for k in out):
        return [out[str(i)] for i in range(len(out))]
    return out


def load_traj(path: str):
    """Inverse of save_traj. Scalar string arrays come back as str."""
    with np.load(path, allow_pickle=False) as z:
        root = {}
        for k in z.files:
            v = z[k]
            if v.dtype.kind in ("U", "S") and v.ndim == 0:
                v = str(v)
            _insert(root, k.split("/"), v)
    return _listify(root)
