"""Checkpointing with true resume.

Strict superset of the reference's save-only best-model checkpointing
(train.py:96-112 saves {model_state_dict, optimizer_state_dict, epoch,
val_hitrate} but never restores the optimizer — SURVEY.md §5): here both model
and optimizer state round-trip, plus the RNG key, plateau/early-stop state and
config, so training resumes mid-run bit-compatibly.

Format: one ``.npz`` of flattened pytree leaves + a JSON sidecar holding the
treedef paths and scalar metadata. No framework dependency, readable anywhere.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_paths:
        key = prefix + "/".join(_path_str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    if hasattr(p, "name"):
        return str(p.name)
    return str(p)


def save_pytree(path: str, tree: Any, meta: dict[str, Any] | None = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = _flatten(tree)
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)
    sidecar = {
        "keys": sorted(flat.keys()),
        "meta": meta or {},
    }
    with open(_sidecar_path(path), "w") as f:
        json.dump(sidecar, f, indent=2, default=str)


def _sidecar_path(path: str) -> str:
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".meta.json"


def load_pytree(path: str, like: Any) -> Any:
    """Restore into the structure of ``like`` (a template pytree with the
    right treedef; leaf values are replaced)."""
    npz_path = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz_path)
    template_flat = _flatten(like)
    keys = sorted(template_flat.keys())
    stored = sorted(data.files)
    if keys != stored:
        missing = sorted(set(keys) - set(stored))
        extra = sorted(set(stored) - set(keys))
        raise ValueError(
            f"checkpoint structure mismatch: template has {len(keys)} leaves, "
            f"file has {len(stored)}; only in template: {missing[:5]}; "
            f"only in file: {extra[:5]}"
        )
    leaves, treedef = jax.tree_util.tree_flatten(like)
    path_leaves = jax.tree_util.tree_flatten_with_path(like)[0]
    new_leaves = []
    for (p, leaf) in path_leaves:
        key = "/".join(_path_str(x) for x in p)
        arr = data[key]
        new_leaves.append(jax.numpy.asarray(arr, dtype=leaf.dtype if hasattr(leaf, "dtype") else None))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_meta(path: str) -> dict[str, Any]:
    with open(_sidecar_path(path)) as f:
        return json.load(f)["meta"]


def save_embeddings(path: str, embeddings: np.ndarray, movie_ids: np.ndarray) -> None:
    """Persist item embeddings + raw-id mapping (reference saves
    output/movie_embeddings.pt at run.py:250 and a movieId<->idx CSV at
    inference.py:146-170)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz",
             embeddings=np.asarray(embeddings), movie_ids=np.asarray(movie_ids))


def load_embeddings(path: str) -> tuple[np.ndarray, np.ndarray]:
    npz_path = path if path.endswith(".npz") else path + ".npz"
    d = np.load(npz_path)
    return d["embeddings"], d["movie_ids"]
