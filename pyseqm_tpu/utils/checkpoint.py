"""Checkpoint / resume for MD and training state.

The reference has no checkpointing; its closest mechanisms are returning
(P, Pt) from XL_BOMD.run for manual resume (XLBOMD.py:309-368) and the
density-reuse SCF guess.  Here every driver state (MDState / XLBOMDState /
NHState) is a registered pytree, so checkpointing is generic: flatten,
save leaves + treedef structure, restore.

Plain .npz is used (dependency-free, works for multi-GB states); for
multi-host async checkpointing swap in orbax-checkpoint — the pytrees are
already compatible.
"""
from __future__ import annotations

import json
from typing import Any

import jax
import numpy as np


def _structure_sig(tree: Any) -> str:
    """Version-stable structural signature: sorted leaf key-paths.

    ``str(treedef)`` is not stable across JAX versions, so it is kept only
    for error messages; validation compares key paths (ADVICE r2)."""
    paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    return json.dumps([jax.tree_util.keystr(p) for p, _ in paths])


def save_state(path: str, state: Any):
    """Serialize a pytree state to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__structure__"] = np.frombuffer(
        _structure_sig(state).encode(), dtype=np.uint8)
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_state(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save_state`.

    ``like`` provides the tree structure (e.g. a freshly-initialized state
    of the same shape); leaf values are replaced from the file.
    """
    d = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    if "__structure__" in d:
        saved = bytes(d["__structure__"]).decode()
        if saved != _structure_sig(like):
            raise ValueError(
                f"checkpoint structure mismatch:\n"
                f"  saved:    {json.loads(saved)}\n"
                f"  expected: {json.loads(_structure_sig(like))}")
    elif "__treedef__" in d:
        # legacy checkpoints (pre-__structure__): best-effort repr compare
        saved_td = json.loads(bytes(d["__treedef__"]).decode())
        if saved_td != str(treedef):
            raise ValueError(
                f"checkpoint structure mismatch:\n  saved:    {saved_td}\n"
                f"  expected: {treedef}")
    n = len(leaves)
    n_saved = sum(1 for k in d.files if k.startswith("leaf_"))
    if n_saved != n:
        raise ValueError(
            f"checkpoint has {n_saved} leaves, target structure has {n}")
    loaded = [d[f"leaf_{i}"] for i in range(n)]
    out = []
    for i, (ref, new) in enumerate(zip(leaves, loaded)):
        arr = np.asarray(new)
        if hasattr(ref, "shape") and arr.shape != tuple(ref.shape):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != expected "
                f"{tuple(ref.shape)}")
        if hasattr(ref, "dtype") and arr.dtype != ref.dtype:
            arr = arr.astype(ref.dtype)
        out.append(arr)
    return jax.tree_util.tree_unflatten(treedef, out)
