"""Checkpoint / resume of the full engine state as a pytree.

Reference parity: the reference only persists the host voxel store
(ITMGlobalCache::SaveToFile) and generic memory blocks
(ORUtils/MemoryBlockPersister.h); here the ENTIRE engine state — volume,
render state, tracking state, swap states, pose history, frame counter — is
one pytree snapshot (SURVEY.md §5 checkpoint/resume plan).
"""

from __future__ import annotations

import json
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def save_pytree(path: str, tree: Any, meta: dict | None = None) -> None:
    """Save any pytree of arrays to one .npz (leaf order + structure kept)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(str(treedef).encode(), dtype=np.uint8)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_pytree(path: str, like: Any) -> Tuple[Any, dict]:
    """Load into the structure of `like` (same treedef required)."""
    z = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    n = len(leaves_like)
    leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
    meta = json.loads(bytes(z["__meta__"]).decode()) if "__meta__" in z else {}
    return jax.tree_util.tree_unflatten(treedef, leaves), meta


def save_engine(path: str, engine) -> None:
    """Snapshot a MainEngine (device state + swap cache + counters)."""
    tree = {
        "vol": engine.vol,
        "render_state": engine.render_state,
        "tracking_state": engine.tracking_state,
        "swap_states": engine.swap_states,
    }
    save_pytree(path, tree, meta={"frame_no": engine.frame_no})
    if engine.global_cache is not None:
        engine.global_cache.save(path + ".cache.npz")


def load_engine(path: str, engine) -> None:
    """Restore a snapshot into a compatibly-configured MainEngine."""
    import os

    tree = {
        "vol": engine.vol,
        "render_state": engine.render_state,
        "tracking_state": engine.tracking_state,
        "swap_states": engine.swap_states,
    }
    loaded, meta = load_pytree(path, tree)
    engine.vol = loaded["vol"]
    engine.render_state = loaded["render_state"]
    engine.tracking_state = loaded["tracking_state"]
    engine.swap_states = loaded["swap_states"]
    engine.frame_no = int(meta.get("frame_no", 0))
    cache_path = path + ".cache.npz"
    if engine.global_cache is not None and os.path.exists(cache_path):
        from infinitam_tpu.engine.swapping import GlobalCache

        engine.global_cache = GlobalCache.load(cache_path)
