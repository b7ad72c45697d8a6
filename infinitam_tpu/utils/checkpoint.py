"""Checkpoint / resume of the full engine state as a pytree.

Reference parity: the reference only persists the host voxel store
(ITMGlobalCache::SaveToFile) and generic memory blocks
(ORUtils/MemoryBlockPersister.h); here the ENTIRE engine state — volume,
render state, tracking state, swap states, pose history, frame counter — is
one pytree snapshot (SURVEY.md §5 checkpoint/resume plan).

Format: leaves are stored KEYED BY TREE PATH (not position), so snapshots
survive fields being added to or removed from the state pytrees: missing
leaves keep the live default and the accelerator caches are rebuilt from
the canonical hash state on load; unknown stored leaves are ignored.
Restores VALIDATE the volume invariants (sentinel row untouched, free-stack
bounds) and fail loudly on corruption instead of re-enabling the Pallas
integrate lost-update hazard."""

from __future__ import annotations

import json
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 2


def _path_names(tree: Any):
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(tree)
    names = [jax.tree_util.keystr(p) for p, _ in leaves_with_path]
    leaves = [x for _, x in leaves_with_path]
    return names, leaves, treedef


def save_pytree(path: str, tree: Any, meta: dict | None = None) -> None:
    """Save any pytree of arrays to one .npz, leaves keyed by tree path."""
    names, leaves, _ = _path_names(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = dict(meta or {})
    meta["__format__"] = FORMAT_VERSION
    meta["__names__"] = names
    arrays["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_pytree(path: str, like: Any) -> Tuple[Any, dict, list]:
    """Load into the structure of `like`, matching leaves BY PATH NAME.

    Returns (tree, meta, missing_names) — leaves absent from the snapshot
    keep `like`'s value and are listed in missing_names (the caller decides
    whether that needs a cache rebuild or is an error)."""
    z = np.load(path)
    meta = json.loads(bytes(z["__meta__"]).decode()) if "__meta__" in z else {}
    names, leaves_like, treedef = _path_names(like)
    stored_names = meta.get("__names__")
    missing: list = []
    if stored_names is None:
        # format v1: positional leaves — only loadable when the leaf count
        # still matches; otherwise the state layout has changed since the
        # snapshot was written, and guessing would corrupt the volume.
        n_stored = sum(1 for k in z.files if k.startswith("leaf_"))
        if n_stored != len(leaves_like):
            raise ValueError(
                f"checkpoint {path!r} is format v1 with {n_stored} leaves but "
                f"the live state has {len(leaves_like)}; re-save with the "
                "current version (leaf names are recorded since format v2)"
            )
        leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n_stored)]
    else:
        by_name = {n: i for i, n in enumerate(stored_names)}
        leaves = []
        for n, fallback in zip(names, leaves_like):
            if n in by_name:
                leaves.append(jnp.asarray(z[f"leaf_{by_name[n]}"]))
            else:
                missing.append(n)
                leaves.append(fallback)
    return jax.tree_util.tree_unflatten(treedef, leaves), meta, missing


def validate_volume(vol, settings) -> None:
    """Assert the volume invariants a snapshot must satisfy (the Pallas
    integrate kernel routes masked lanes through the reserved sentinel row —
    a snapshot that allocated it would alias live data)."""
    from infinitam_tpu.engine.hash_volume import sentinel_row

    B = settings.hashing.n_blocks
    sent = sentinel_row(settings.hashing)
    if bool(jnp.any(vol.entry_ptr == sent)):
        raise ValueError(
            f"snapshot violates the sentinel-row invariant: some hash entry "
            f"points at reserved VBA row {sent} (pre-sentinel snapshot?)"
        )
    lfb = int(vol.last_free_block)
    if not (-1 <= lfb <= B - 2):
        raise ValueError(f"snapshot free-stack top {lfb} outside [-1, {B - 2}]")
    if int(vol.last_free_excess) >= settings.hashing.n_excess:
        raise ValueError("snapshot excess free-stack top out of range")


def save_engine(path: str, engine) -> None:
    """Snapshot a MainEngine (device state + swap cache + counters)."""
    if getattr(engine, "swapping", False):
        # drain the pipelined exchange so the snapshot reflects every frame
        engine.flush_swap()
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
    """Restore a snapshot into a compatibly-configured MainEngine.

    Validates the volume invariants (fails loudly on corruption) and
    rebuilds the accelerator caches from the canonical hash state whenever
    any cache/epoch leaf was missing from the snapshot (older formats)."""
    import os

    from infinitam_tpu.engine import hash_volume as hv

    tree = {
        "vol": engine.vol,
        "render_state": engine.render_state,
        "tracking_state": engine.tracking_state,
        "swap_states": engine.swap_states,
    }
    loaded, meta, missing = load_pytree(path, tree)
    vol = loaded["vol"]
    rs = loaded["render_state"]
    validate_volume(vol, engine.settings)
    needs_cache_rebuild = any(
        ("entry_grid" in n) or ("block_grid" in n) for n in missing
    )
    if vol.entry_grid is not None and needs_cache_rebuild:
        vol = hv.refresh_caches(vol, engine.settings.block_grid)
    needs_epoch_reset = any(
        ("cell_claim" in n) or ("cell_epoch" in n)  # pre-r5 name
        or ("entry_epoch" in n) or ("epoch" in n)
        for n in missing
    )
    if rs.cell_claim is not None and needs_epoch_reset:
        rs = rs._replace(
            cell_claim=jnp.zeros_like(rs.cell_claim),
            entry_epoch=jnp.zeros_like(rs.entry_epoch),
            epoch=jnp.zeros_like(rs.epoch),
        )
    engine.vol = vol
    engine.render_state = rs
    engine.tracking_state = loaded["tracking_state"]
    engine.swap_states = loaded["swap_states"]
    engine.frame_no = int(meta.get("frame_no", 0))
    cache_path = path + ".cache.npz"
    if engine.global_cache is not None and os.path.exists(cache_path):
        from infinitam_tpu.engine.swapping import GlobalCache

        engine.global_cache = GlobalCache.load(cache_path)
