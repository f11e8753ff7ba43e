"""Trajectory artifact IO: nested pytrees <-> compressed .npz.

Shipped trajectory artifacts are .npz, not pickle: pickles execute
arbitrary code on load (a hazard for anything distributed with a repo) and
are opaque to non-Python tooling. A nested {dict, list, leaf} tree is
flattened to slash-separated keys ("infos/world/mid_price", "rewards/0").
Lists are marked explicitly with a length key (``<prefix>/__len__``) so a
dict that happens to have digit keys round-trips as a dict, empty
containers survive, and `None` leaves are recorded with a sentinel key —
round-trips are exact for {dict, list/tuple, ndarray, str, bytes, None}
(tuples come back as lists).

Reference parity note: the upstream eval harness pickles `traj_batch`
(baseline_JAXMARL.py:624-679); this is the same artifact with a safe,
portable container.
"""
from __future__ import annotations

import numpy as np

_NONE_KEY = "__none__"
_LEN_KEY = "__len__"
_EMPTY_DICT_KEY = "__empty_dict__"


def _flatten(obj, prefix, out):
    if obj is None:
        out[prefix + _NONE_KEY] = np.zeros((), np.int8)
    elif isinstance(obj, dict):
        if not obj:
            out[prefix + _EMPTY_DICT_KEY] = np.zeros((), np.int8)
        for k, v in obj.items():
            # keys that collide with the encoding (path separator or
            # sentinel names) must fail loudly at SAVE time — they would
            # otherwise silently round-trip to a different tree structure
            # at load time (e.g. a literal '__len__' key rebuilds the dict
            # as a list, 'a/b' rebuilds as nested dicts). Digit-only keys
            # are safe: lists are marked by an explicit __len__ sentinel.
            if not isinstance(k, str):
                raise ValueError(f"dict key {k!r} is not a str (path "
                                 f"{prefix!r}); npz traj keys must be str")
            if "/" in k or k in (_NONE_KEY, _LEN_KEY, _EMPTY_DICT_KEY):
                raise ValueError(
                    f"dict key {k!r} (path {prefix!r}) collides with the "
                    "flat-key encoding ('/' or sentinel name) and would "
                    "corrupt the round-trip")
            _flatten(v, f"{prefix}{k}/", out)
    elif isinstance(obj, (list, tuple)):
        out[prefix + _LEN_KEY] = np.asarray(len(obj), np.int64)
        for i, v in enumerate(obj):
            _flatten(v, f"{prefix}{i}/", out)
    else:
        out[prefix.rstrip("/")] = np.asarray(obj)


def save_traj(path: str, tree) -> None:
    """Write a nested {dict,list,ndarray,str,bytes,None} tree as
    compressed npz."""
    flat = {}
    _flatten(tree, "", flat)
    np.savez_compressed(path, **flat)


def _insert(root, parts, value):
    node = root
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _rebuild(node):
    if not isinstance(node, dict):
        return node
    if _NONE_KEY in node:
        return None
    if _EMPTY_DICT_KEY in node:
        return {}
    if _LEN_KEY in node:
        n = int(node[_LEN_KEY])
        return [_rebuild(node[str(i)]) for i in range(n)]
    return {k: _rebuild(v) for k, v in node.items()}


def load_traj(path: str):
    """Inverse of save_traj. 0-dim string/bytes arrays come back as
    str/bytes."""
    with np.load(path, allow_pickle=False) as z:
        root = {}
        for k in z.files:
            v = z[k]
            if v.ndim == 0 and v.dtype.kind in ("U", "S"):
                v = v.item()          # str for U, bytes for S
            _insert(root, k.split("/"), v)
    return _rebuild(root)
