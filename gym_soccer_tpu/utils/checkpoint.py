"""Checkpoint / resume for learner and environment state.

The reference's only persistence is pickling policy dicts
(policies.py:17-27); SURVEY.md §5.4 asks for save/restore of learner
state (Q-tables), env batch state, and PRNG keys as arrays.  Pytrees are
flattened to .npz (portable, dependency-free); PRNG-key leaves are
serialized via key_data and restored with the same impl.  An orbax-backed
variant is provided when orbax is importable (it is in this image).
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def _is_key(leaf) -> bool:
    return isinstance(leaf, jax.Array) and jax.dtypes.issubdtype(
        leaf.dtype, jax.dtypes.prng_key)


def save_pytree(path: str, tree: Any) -> None:
    """Flatten a pytree of arrays (PRNG keys allowed) into one .npz."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays, meta = {}, []
    for i, leaf in enumerate(leaves):
        if _is_key(leaf):
            arrays[f"leaf_{i}"] = np.asarray(jax.random.key_data(leaf))
            meta.append({"i": i, "kind": "prng_key",
                         "impl": str(jax.random.key_impl(leaf))})
        else:
            arrays[f"leaf_{i}"] = np.asarray(leaf)
            meta.append({"i": i, "kind": "array"})
    arrays["__meta__"] = np.frombuffer(
        json.dumps({"leaves": meta}).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic finalize


def load_pytree(path: str, template: Any) -> Any:
    """Restore into the structure of `template` (its treedef defines the
    output pytree; leaf values are ignored)."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())["leaves"]
        leaves_t, treedef = jax.tree.flatten(template)
        assert len(leaves_t) == len(meta), (
            f"checkpoint has {len(meta)} leaves, template has "
            f"{len(leaves_t)}")
        out = []
        for m, tmpl in zip(meta, leaves_t):
            arr = data[f"leaf_{m['i']}"]
            if m["kind"] == "prng_key":
                out.append(jax.random.wrap_key_data(arr))
            else:
                out.append(arr)
        return jax.tree.unflatten(treedef, out)


def save_orbax(path: str, tree: Any) -> None:
    """Orbax-backed checkpoint (for multi-host / async use cases)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, template: Any) -> Any:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
