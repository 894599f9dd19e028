"""Pytree checkpointing to .npz (model weights, optimizer state).

The reference checkpoints Keras .h5 weights at every val-loss improvement
(``unet3d.py:566-573``, ``ffn.py:211-213``); here any JAX pytree round-trips
through a flat .npz keyed by its tree path — dependency-free and
human-inspectable.  (Orbax is available for large sharded states; .npz is
the default for these small models.)
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Union

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_pytree(tree: Any, path: Union[str, Path]) -> None:
    """Save to EXACTLY ``path`` (``np.savez`` on a filename silently
    appends ``.npz`` when absent, which would break the
    save/``load_pytree`` round-trip for any other extension — writing
    through an open file object keeps the name verbatim)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    arrays = {_path_str(p): np.asarray(v) for p, v in flat}
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_pytree(template: Any, path: Union[str, Path]) -> Any:
    """Load arrays saved by ``save_pytree`` into the structure of
    ``template`` (shapes/keys must match).

    Leaves come back as DEVICE arrays (one upload here): numpy leaves
    would instead ride inside EVERY jitted call that takes them — a
    loaded StarDist backbone (11 MB of params) re-uploaded per volume
    cost ~120 ms/dispatch through the tunneled dev link, 7x the whole
    seg program's device time (caught by the round-4 trained-model
    bench; random-init models always held device params, hiding it)."""
    import jax.numpy as jnp

    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    with np.load(str(path)) as data:
        for p, v in flat:
            key = _path_str(p)
            if key not in data:
                raise KeyError(f"checkpoint {path} missing leaf {key}")
            arr = data[key]
            if arr.shape != np.shape(v):
                raise ValueError(
                    f"leaf {key}: shape {arr.shape} != template "
                    f"{np.shape(v)}")
            leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)
