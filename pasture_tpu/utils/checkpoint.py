"""Checkpoint/resume for pipeline state (PointBatch maps, pose graphs).

Thin orbax wrapper: any pytree of jax/numpy arrays saves and restores; a
registration pipeline checkpoints its map blocks + keyframe poses and
resumes after preemption.  Falls back to a numpy .npz codec when orbax is
unavailable.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Union

import jax
import numpy as np

__all__ = ["save_pytree", "load_pytree"]


def _orbax():
    try:
        import orbax.checkpoint as ocp
        return ocp
    except ImportError:
        return None


def save_pytree(tree: Any, path: Union[str, Path]) -> None:
    """Save a pytree of arrays to ``path`` (directory for orbax, .npz
    otherwise)."""
    path = Path(path)
    ocp = _orbax()
    if ocp is not None and path.suffix != ".npz":
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path.absolute(), tree, force=True)
        ckptr.wait_until_finished()
        return
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    np.savez(path,
             __treedef__=np.frombuffer(str(treedef).encode(), np.uint8),
             **{f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)})


def load_pytree(path: Union[str, Path], like: Any) -> Any:
    """Restore a pytree saved by :func:`save_pytree`; ``like`` provides the
    structure (and, for orbax, shapes/dtypes)."""
    path = Path(path)
    ocp = _orbax()
    if ocp is not None and path.is_dir():
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path.absolute(), like)
    if not path.exists() and path.with_suffix(".npz").exists():
        path = path.with_suffix(".npz")
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    restored = [data[f"leaf_{i}"] for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, restored)
