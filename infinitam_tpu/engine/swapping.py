"""Host↔HBM voxel-block streaming (swapping) — scenes larger than device
memory.

Reference parity: ITMLib/Objects/ITMGlobalCache.h:18-129 (host block store +
3-state machine + bounded transfer buffers) and
ITMSwappingEngine_CUDA.cu:42-296:
  swap-in : state==1 entries → compacted needed-list (≤ transfer cap) → host
            gather → upload → weighted-average merge into the VBA → state=2
  swap-out: state==2 ∧ allocated ∧ invisible → move+clear blocks → return to
            free list (ptr→−1) → download → host scatter → state=0

TPU-native shape: the device steps are three jitted fixed-shape programs
(compaction via nonzero(size=cap), merge/evict as gathers+scatters); the host
tier is plain numpy arrays with `jax.device_get/put` at the slab boundary —
the analogue of the reference's pinned-buffer cudaMemcpy path.

swap_states codes (reference ITMHashSwapState): 0 = most recent data on
host / nowhere, 1 = on host, needs combining with device, 2 = device newest.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from infinitam_tpu.config import Settings
from infinitam_tpu.engine.hash_volume import HashVolume, RenderStateVH


@dataclasses.dataclass
class GlobalCache:
    """Host-side store of all addressable blocks (reference: ITMGlobalCache —
    which stores WHOLE TVoxels, i.e. color planes too when the voxel type has
    them, ITMGlobalCache.h:18-40). Indexed by hash-entry id like the
    reference."""

    stored_sdf: np.ndarray  # [E, S³] int16 (×32767, like the live volume)
    stored_w: np.ndarray  # [E, S³] uint8
    has_stored: np.ndarray  # [E] bool
    stored_clr: Optional[np.ndarray] = None  # [E, S³, 3] uint8 (use_color)
    stored_wc: Optional[np.ndarray] = None  # [E, S³] uint8

    @classmethod
    def create(cls, settings: Settings) -> "GlobalCache":
        E = settings.hashing.n_entries
        S3 = settings.hashing.block_volume
        return cls(
            stored_sdf=np.full((E, S3), 32767, dtype=np.int16),
            stored_w=np.zeros((E, S3), dtype=np.uint8),
            has_stored=np.zeros((E,), dtype=bool),
            stored_clr=np.zeros((E, S3, 3), dtype=np.uint8) if settings.use_color else None,
            stored_wc=np.zeros((E, S3), dtype=np.uint8) if settings.use_color else None,
        )

    def save(self, path: str) -> None:
        """reference: ITMGlobalCache::SaveToFile."""
        extra = {}
        if self.stored_clr is not None:
            extra = {"clr": self.stored_clr, "wc": self.stored_wc}
        np.savez_compressed(
            path, sdf=self.stored_sdf, w=self.stored_w, has=self.has_stored, **extra
        )

    @classmethod
    def load(cls, path: str) -> "GlobalCache":
        z = np.load(path)
        return cls(
            stored_sdf=z["sdf"], stored_w=z["w"], has_stored=z["has"],
            stored_clr=z["clr"] if "clr" in z else None,
            stored_wc=z["wc"] if "wc" in z else None,
        )


def create_swap_states(settings: Settings) -> jnp.ndarray:
    return jnp.zeros((settings.hashing.n_entries,), dtype=jnp.int32)


@partial(jax.jit, static_argnames=("cap",))
def build_swap_in_list(swap_states: jnp.ndarray, cap: int):
    """reference: buildListToSwapIn_device — state==1, compacted, capped."""
    mask = swap_states == 1
    ids = jnp.nonzero(mask, size=cap, fill_value=-1)[0].astype(jnp.int32)
    return ids, jnp.minimum(jnp.sum(mask), cap).astype(jnp.int32)


@partial(jax.jit, static_argnames=("settings",))
def merge_swapped_in(
    vol: HashVolume,
    swap_states: jnp.ndarray,
    needed_ids: jnp.ndarray,  # [cap] entry ids, −1 padded
    buf_sdf: jnp.ndarray,  # [cap, S³] int16 host-gathered blocks
    buf_w: jnp.ndarray,  # [cap, S³] uint8
    has_data: jnp.ndarray,  # [cap] bool
    settings: Settings,
    buf_clr: Optional[jnp.ndarray] = None,  # [cap, S³, 3]
    buf_wc: Optional[jnp.ndarray] = None,  # [cap, S³]
) -> Tuple[HashVolume, jnp.ndarray]:
    """reference: integrateOldIntoActiveData_device + combineVoxel*
    (DeviceAgnostic/ITMSwappingEngine.h:7-63) — fold the streamed-in running
    averages into the live blocks (depth AND color when the voxel has color);
    state→2 for every needed entry (even without stored data, matching the
    reference)."""
    hp = settings.hashing
    E = hp.n_entries
    B = vol.vox.shape[0]
    max_w = settings.scene.max_w

    ids_c = jnp.clip(needed_ids, 0, E - 1)
    ptr = vol.entry_ptr[ids_c]
    valid = (needed_ids >= 0) & (ptr >= 0) & has_data
    ptr_c = jnp.where(valid, ptr, 0)

    from infinitam_tpu.engine.hash_volume import (
        clr_from_q,
        clr_to_q,
        pack_rgb,
        pack_vox,
        rgb_clr_q,
        rgb_wc,
        sdf_from_q,
        sdf_to_q,
        vox_sdf,
        vox_w,
    )

    dst_vox = vol.vox[ptr_c]
    dst_sdf = vox_sdf(dst_vox)
    dst_w = vox_w(dst_vox)
    src_w = buf_w.astype(jnp.int32)
    src_sdf = sdf_from_q(buf_sdf)

    # combineVoxelDepthInformation: if oldW (host) == 0 keep device voxel;
    # newF = (oldW·oldF + newW·newF)/(oldW+newW); newW capped at maxW.
    merged_w_raw = dst_w + src_w
    merged_sdf = (src_w * src_sdf + dst_w * dst_sdf) / jnp.maximum(merged_w_raw, 1)
    merged_w = jnp.minimum(merged_w_raw, max_w)
    use = (src_w > 0) & valid[:, None]
    out_sdf = jnp.where(use, merged_sdf, dst_sdf)
    out_w = jnp.where(use, merged_w, dst_w)

    scatter_idx = jnp.where(valid, ptr_c, B)
    vox = vol.vox.at[scatter_idx].set(
        pack_vox(sdf_to_q(out_sdf), out_w), mode="drop"
    )
    vox_rgb = vol.vox_rgb
    if vol.vox_rgb is not None and buf_clr is not None:
        # combineVoxelColorInformation: same running average on (clr, w_color)
        dst_rgb = vol.vox_rgb[ptr_c]
        dst_clr = clr_from_q(rgb_clr_q(dst_rgb))
        dst_wc = rgb_wc(dst_rgb)
        src_wc = buf_wc.astype(jnp.int32)
        merged_wc_raw = dst_wc + src_wc
        merged_clr = (
            src_wc[..., None] * clr_from_q(buf_clr) + dst_wc[..., None] * dst_clr
        ) / jnp.maximum(merged_wc_raw, 1)[..., None]
        merged_wc = jnp.minimum(merged_wc_raw, max_w)
        use_c = (src_wc > 0) & valid[:, None]
        out_clr = jnp.where(use_c[..., None], merged_clr, dst_clr)
        out_wc = jnp.where(use_c, merged_wc, dst_wc)
        vox_rgb = vol.vox_rgb.at[scatter_idx].set(
            pack_rgb(clr_to_q(out_clr), out_wc), mode="drop"
        )

    sidx = jnp.where(needed_ids >= 0, ids_c, E)
    swap_states = swap_states.at[sidx].set(2, mode="drop")
    return vol._replace(vox=vox, vox_rgb=vox_rgb), swap_states


@partial(jax.jit, static_argnames=("settings",))
def evict_blocks(
    vol: HashVolume,
    swap_states: jnp.ndarray,
    visible_type: jnp.ndarray,
    settings: Settings,
):
    """reference: buildListToSwapOut + moveActiveDataToTransferBuffer +
    cleanMemory — select state==2 ∧ allocated ∧ invisible entries (≤ cap),
    copy their blocks out, reset them to empty, return blocks to the free
    list, ptr→−1 (swapped out), state→0.

    Returns (vol, swap_states, evicted_ids, buf_sdf, buf_w, buf_clr, buf_wc, n)
    — color buffers are None when the volume has no color planes."""
    hp = settings.hashing
    E = hp.n_entries
    B = vol.vox.shape[0]
    cap = hp.n_transfer_blocks

    mask = (swap_states == 2) & (vol.entry_ptr >= 0) & (visible_type == 0)
    ids = jnp.nonzero(mask, size=cap, fill_value=-1)[0].astype(jnp.int32)
    n = jnp.minimum(jnp.sum(mask), cap).astype(jnp.int32)
    valid = ids >= 0
    ids_c = jnp.clip(ids, 0, E - 1)
    ptr = vol.entry_ptr[ids_c]
    ptr_c = jnp.where(valid, ptr, 0)

    from infinitam_tpu.engine.hash_volume import (
        VOX_INIT,
        rgb_clr_q,
        rgb_wc,
        vox_sdf_q,
        vox_w,
    )

    buf_vox = vol.vox[ptr_c]
    # host cache keeps the reference TVoxel plane layout (int16 sdf, uchar w)
    buf_sdf = vox_sdf_q(buf_vox).astype(jnp.int16)
    buf_w = vox_w(buf_vox).astype(jnp.uint8)

    # clear evicted blocks (reference clears to TVoxel() = sdf 1, w 0,
    # clr 0, w_color 0)
    scatter_idx = jnp.where(valid, ptr_c, B)
    vox = vol.vox.at[scatter_idx].set(
        jnp.full_like(buf_vox, VOX_INIT), mode="drop"
    )
    buf_clr = buf_wc = None
    vox_rgb = vol.vox_rgb
    if vol.vox_rgb is not None:
        buf_rgb = vol.vox_rgb[ptr_c]
        buf_clr = rgb_clr_q(buf_rgb).astype(jnp.uint8)
        buf_wc = rgb_wc(buf_rgb).astype(jnp.uint8)
        vox_rgb = vol.vox_rgb.at[scatter_idx].set(jnp.zeros_like(buf_rgb), mode="drop")

    # push blocks back on the free stack
    k = jnp.cumsum(valid.astype(jnp.int32)) - 1  # rank among evicted
    stack_idx = vol.last_free_block + 1 + k
    ok = valid & (stack_idx < hp.n_blocks)
    alloc_list = vol.alloc_list.at[jnp.where(ok, stack_idx, hp.n_blocks)].set(
        ptr_c, mode="drop"
    )
    n_freed = jnp.sum(ok).astype(jnp.int32)

    eidx = jnp.where(valid, ids_c, E)
    entry_ptr = vol.entry_ptr.at[eidx].set(-1, mode="drop")  # swapped out
    swap_states = swap_states.at[eidx].set(0, mode="drop")

    new_vol = vol._replace(
        vox=vox,
        vox_rgb=vox_rgb,
        alloc_list=alloc_list,
        last_free_block=vol.last_free_block + n_freed,
        entry_ptr=entry_ptr,
    )
    if vol.entry_grid is not None:
        from infinitam_tpu.engine.hash_volume import grid_cell

        cell, inb = grid_cell(vol.entry_pos[ids_c], settings.block_grid)
        G3 = vol.entry_grid.shape[0]
        cidx = jnp.where(valid & inb, cell, G3)
        new_vol = new_vol._replace(
            entry_grid=vol.entry_grid.at[cidx].set((ids_c << 1) | 1, mode="drop"),
            block_grid=vol.block_grid.at[cidx].set(-1, mode="drop"),
        )
    return new_vol, swap_states, ids, buf_sdf, buf_w, buf_clr, buf_wc, n


def swap_in(
    vol: HashVolume, swap_states: jnp.ndarray, cache: GlobalCache, settings: Settings
) -> Tuple[HashVolume, jnp.ndarray]:
    """IntegrateGlobalIntoLocal: device needed-list → host gather → merge."""
    cap = settings.hashing.n_transfer_blocks
    ids, n = build_swap_in_list(swap_states, cap)
    n = int(n)
    if n == 0:
        # still must flip state 1→2 for zero entries? n==0 means none in state 1
        return vol, swap_states
    ids_np = np.asarray(ids)
    sel = np.clip(ids_np, 0, cache.stored_sdf.shape[0] - 1)
    has = cache.has_stored[sel] & (ids_np >= 0)
    buf_sdf = cache.stored_sdf[sel]
    buf_w = np.where(has[:, None], cache.stored_w[sel], 0)
    buf_clr = buf_wc = None
    if vol.vox_rgb is not None and cache.stored_clr is not None:
        buf_clr = jnp.asarray(cache.stored_clr[sel])
        buf_wc = jnp.asarray(np.where(has[:, None], cache.stored_wc[sel], 0))
    vol, swap_states = merge_swapped_in(
        vol,
        swap_states,
        ids,
        jnp.asarray(buf_sdf),
        jnp.asarray(buf_w),
        jnp.asarray(has),
        settings,
        buf_clr=buf_clr,
        buf_wc=buf_wc,
    )
    return vol, swap_states


def swap_out_device(
    vol: HashVolume,
    swap_states: jnp.ndarray,
    render_state: RenderStateVH,
    settings: Settings,
):
    """Device half of SaveToGlobalMemory: evict + clear + free-list return.
    Returns (vol, swap_states, host_job) — host_job is a closure that
    completes the host-store scatter. Call it AFTER dispatching the next
    device program (raycast prepare): the D2H readback and the numpy scatter
    then overlap device compute instead of sitting on the critical path
    (SURVEY §7 swap-latency hiding)."""
    vol, swap_states, ids, buf_sdf, buf_w, buf_clr, buf_wc, n = evict_blocks(
        vol, swap_states, render_state.visible_type, settings
    )

    def host_job(cache: GlobalCache) -> None:
        n_ = int(n)
        if n_ == 0:
            return
        ids_np = np.asarray(ids[:n_])
        cache.stored_sdf[ids_np] = np.asarray(buf_sdf[:n_])
        cache.stored_w[ids_np] = np.asarray(buf_w[:n_])
        if buf_clr is not None and cache.stored_clr is not None:
            cache.stored_clr[ids_np] = np.asarray(buf_clr[:n_])
            cache.stored_wc[ids_np] = np.asarray(buf_wc[:n_])
        cache.has_stored[ids_np] = True

    return vol, swap_states, host_job


def swap_out(
    vol: HashVolume,
    swap_states: jnp.ndarray,
    render_state: RenderStateVH,
    cache: GlobalCache,
    settings: Settings,
) -> Tuple[HashVolume, jnp.ndarray]:
    """SaveToGlobalMemory: evict invisible device-newest blocks to the host
    store (synchronous variant; MainEngine uses swap_out_device + deferred
    host_job to overlap the host scatter with the raycast prepare)."""
    vol, swap_states, host_job = swap_out_device(
        vol, swap_states, render_state, settings
    )
    host_job(cache)
    return vol, swap_states


@partial(jax.jit, static_argnames=())
def mark_visible_for_swap(swap_states: jnp.ndarray, visible_type: jnp.ndarray) -> jnp.ndarray:
    """reference: buildVisibleList_device — visible entries not already
    device-newest need a swap-in check (state→1)."""
    return jnp.where((visible_type > 0) & (swap_states != 2), 1, swap_states)


@partial(jax.jit, static_argnames=("settings",))
def reallocate_swapped_out(
    vol: HashVolume,
    visible_type: jnp.ndarray,
    settings: Settings,
    visible_ids: Optional[jnp.ndarray] = None,
) -> HashVolume:
    """reference: reAllocateSwappedOutVoxelBlocks_device — visible entries
    with ptr==−1 get a fresh block from the free list. With `visible_ids`
    (the compact visible list, which by construction contains every entry
    with visible_type>0) the scan runs over ≤V rows instead of all E."""
    hp = settings.hashing
    E = hp.n_entries
    if visible_ids is not None:
        ids_c = jnp.clip(visible_ids, 0, E - 1)
        need = (visible_ids >= 0) & (visible_type[ids_c] > 0) & (vol.entry_ptr[ids_c] == -1)
        rank = jnp.cumsum(need.astype(jnp.int32)) - 1
        list_idx = vol.last_free_block - rank
        ok = need & (list_idx >= 0)
        new_block = vol.alloc_list[jnp.clip(list_idx, 0, hp.n_blocks - 1)]
        idx = jnp.where(ok, ids_c, E)
    else:
        need = (visible_type > 0) & (vol.entry_ptr == -1)
        rank = jnp.cumsum(need.astype(jnp.int32)) - 1
        list_idx = vol.last_free_block - rank
        ok = need & (list_idx >= 0)
        new_block = vol.alloc_list[jnp.clip(list_idx, 0, hp.n_blocks - 1)]
        ids_c = jnp.arange(E, dtype=jnp.int32)
        idx = jnp.where(ok, ids_c, E)
    entry_ptr = vol.entry_ptr.at[idx].set(new_block, mode="drop")
    n_taken = jnp.sum(ok).astype(jnp.int32)
    out = vol._replace(entry_ptr=entry_ptr, last_free_block=vol.last_free_block - n_taken)
    if vol.entry_grid is not None:
        from infinitam_tpu.engine.hash_volume import grid_cell

        cell, inb = grid_cell(vol.entry_pos[jnp.clip(idx, 0, E - 1)], settings.block_grid)
        G3 = vol.entry_grid.shape[0]
        cidx = jnp.where(ok & inb, cell, G3)
        out = out._replace(
            entry_grid=vol.entry_grid.at[cidx].set(
                jnp.clip(idx, 0, E - 1) << 1, mode="drop"
            ),
            block_grid=vol.block_grid.at[cidx].set(new_block, mode="drop"),
        )
    return out
