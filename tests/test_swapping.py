"""Host↔HBM swapping tests: 3-state protocol, eviction, re-load, and a
capacity-constrained end-to-end run (reference: ITMSwappingEngine +
ITMGlobalCache)."""

import jax.numpy as jnp
import numpy as np

from infinitam_tpu.calib import default_calib
from infinitam_tpu.config import (
    SceneParams,
    Settings,
    SwappingMode,
    TrackingParams,
    VoxelBlockHashParams,
)
from infinitam_tpu.engine import hash_volume as hv
from infinitam_tpu.engine import swapping as sw
from infinitam_tpu.engine.main_engine import MainEngine
from infinitam_tpu.io import synth
from infinitam_tpu.utils import se3

IMG = (60, 80)


def swap_settings(n_blocks=0x1800) -> Settings:
    return Settings(
        scene=SceneParams(voxel_size=0.025, mu=0.1, view_frustum_min=0.3, view_frustum_max=3.0),
        hashing=VoxelBlockHashParams(
            n_buckets=0x4000,
            n_excess=0x400,
            n_blocks=n_blocks,
            n_transfer_blocks=0x200,
            max_visible_blocks=0x1000,
        ),
        tracking=TrackingParams(n_levels=3, min_valid_points=50),
        swapping_mode=SwappingMode.ENABLED,
    )


def test_evict_and_reload_roundtrip():
    """Evict an invisible block to the host store, then swap it back in and
    check the voxel data survives the round trip."""
    S = swap_settings()
    hp_ = S.hashing
    vol = hv.create_hash(hp_)
    cache = sw.GlobalCache.create(S)
    swap_states = sw.create_swap_states(S)

    # allocate one block and write voxel data
    vt = jnp.zeros((hp_.n_entries,), dtype=jnp.int32)
    cand = jnp.array([[1, 2, 3]], dtype=jnp.int32)
    plan = hv.plan_allocations(vol, vt, cand, jnp.ones(1, bool), hp_)
    vol, vt = hv.execute_allocations(vol, plan, hp_)
    pr = hv.probe(vol, cand[0], hp_)
    entry_idx = int(pr.entry_idx)
    blk = int(pr.entry_ptr)
    vol = vol._replace(
        vox=vol.vox.at[blk].set(hv.pack_vox(hv.sdf_to_q(-0.25), 7)),
    )
    swap_states = swap_states.at[entry_idx].set(2)  # device newest
    free_before = int(vol.last_free_block)

    # evict: entry invisible (visible_type all zero)
    rs = hv.RenderStateVH(
        visible_type=jnp.zeros((hp_.n_entries,), jnp.int32),
        visible_ids=jnp.full((hp_.max_visible_blocks,), -1, jnp.int32),
        n_visible=jnp.array(0, jnp.int32),
    )
    vol, swap_states = sw.swap_out(vol, swap_states, rs, cache, S)

    assert int(vol.entry_ptr[entry_idx]) == -1  # swapped out
    assert int(swap_states[entry_idx]) == 0
    assert int(vol.last_free_block) == free_before + 1  # block returned
    assert cache.has_stored[entry_idx]
    np.testing.assert_allclose(cache.stored_sdf[entry_idx] / 32767.0, -0.25, atol=1e-4)
    assert (cache.stored_w[entry_idx] == 7).all()

    # now the entry becomes visible again: realloc + swap in
    vt2 = jnp.zeros((hp_.n_entries,), jnp.int32).at[entry_idx].set(hv.VT_VISIBLE_SWAPPED)
    vol = sw.reallocate_swapped_out(vol, vt2, S)
    assert int(vol.entry_ptr[entry_idx]) >= 0
    swap_states = sw.mark_visible_for_swap(swap_states, vt2)
    assert int(swap_states[entry_idx]) == 1
    vol, swap_states = sw.swap_in(vol, swap_states, cache, S)
    assert int(swap_states[entry_idx]) == 2
    new_blk = int(vol.entry_ptr[entry_idx])
    np.testing.assert_allclose(np.asarray(hv.vox_sdf(vol.vox[new_blk])), -0.25, atol=1e-4)
    assert (np.asarray(hv.vox_w(vol.vox[new_blk])) == 7).all()


def test_e2e_with_swapping_tracks():
    """Full engine with swapping enabled tracks the synthetic trajectory and
    actually exercises the host tier when looking away and back."""
    S = swap_settings()
    calib = default_calib(IMG[1], IMG[0])
    engine = MainEngine(S, calib, IMG)

    src = synth.SyntheticSource(calib, n_frames=6, img_size=IMG)
    errs = []
    for _ in range(src.n_frames):
        depth, _rgb, gt = src.get_images()
        engine.process_frame(metric_depth=depth)
        err = se3.se3_log(engine.tracking_state.pose @ se3.invert(jnp.asarray(gt)))
        errs.append(float(jnp.linalg.norm(err[:3])))
    assert errs[-1] < 0.03, errs

    # force a big view change: look far away so current blocks become
    # invisible and get evicted
    away = np.asarray(se3.se3_exp(jnp.array([0.0, 0.0, 0.0, 0.0, np.pi, 0.0])))
    far_depth = synth.render_depth(jnp.asarray(away), engine.proj, IMG)
    engine.set_pose(away)
    engine.tracking_state = engine.tracking_state._replace(age=jnp.array(-1, jnp.int32))
    engine.process_frame(metric_depth=far_depth)
    # the pipelined exchange lands evictions in the host store up to two
    # frames later; flush_swap() drains it (the checkpoint/shutdown path)
    engine.flush_swap()
    assert engine.global_cache.has_stored.sum() > 0, "nothing was evicted"


def test_combine_voxel_depth_golden():
    """Golden test of the swap-in merge against the reference formula
    (DeviceAgnostic/ITMSwappingEngine.h:7-30 combineVoxelDepthInformation):
    oldW==0 keeps dst; else newF=(oldW*oldF+newW*newF)/(oldW+newW), w capped."""
    S = swap_settings()
    hp_ = S.hashing
    max_w = S.scene.max_w
    vol = hv.create_hash(hp_)
    swap_states = sw.create_swap_states(S)

    # allocate one block; give the device voxels (dst) known values
    vt = jnp.zeros((hp_.n_entries,), dtype=jnp.int32)
    cand = jnp.array([[4, 5, 6]], dtype=jnp.int32)
    plan = hv.plan_allocations(vol, vt, cand, jnp.ones(1, bool), hp_)
    vol, vt = hv.execute_allocations(vol, plan, hp_)
    pr = hv.probe(vol, cand[0], hp_)
    entry_idx = int(pr.entry_idx)
    blk = int(pr.entry_ptr)

    S3 = hp_.block_volume
    rng = np.random.RandomState(0)
    dst_sdf = rng.uniform(-1, 1, S3).astype(np.float32)
    dst_w = rng.randint(0, 90, S3).astype(np.int32)
    src_sdf = rng.uniform(-1, 1, S3).astype(np.float32)
    src_w = rng.randint(0, 90, S3).astype(np.int32)
    src_w[:37] = 0  # host voxels without data must leave dst untouched
    # snap inputs to the int16 grid so the golden comparison is exact
    dst_sdf = np.round(dst_sdf * 32767) / 32767
    src_sdf = np.round(src_sdf * 32767) / 32767
    vol = vol._replace(
        vox=vol.vox.at[blk].set(
            hv.pack_vox(hv.sdf_to_q(jnp.asarray(dst_sdf)), jnp.asarray(dst_w))
        ),
    )

    cap = hp_.n_transfer_blocks
    ids = jnp.full((cap,), -1, jnp.int32).at[0].set(entry_idx)
    buf_sdf = (
        jnp.full((cap, S3), 32767, jnp.int32)
        .at[0]
        .set(hv.sdf_to_q(jnp.asarray(src_sdf)))
        .astype(jnp.int16)
    )
    buf_w = jnp.zeros((cap, S3), jnp.uint8).at[0].set(jnp.asarray(src_w).astype(jnp.uint8))
    has = jnp.zeros((cap,), bool).at[0].set(True)
    vol2, swap_states = sw.merge_swapped_in(vol, swap_states, ids, buf_sdf, buf_w, has, S)

    # reference formula, computed scalar-for-scalar
    want_sdf = dst_sdf.copy()
    want_w = dst_w.copy()
    for i in range(S3):
        oldW, newW = int(src_w[i]), int(dst_w[i])
        if oldW == 0:
            continue
        newF = (oldW * src_sdf[i] + newW * dst_sdf[i]) / (oldW + newW)
        want_sdf[i] = newF
        want_w[i] = min(oldW + newW, max_w)
    np.testing.assert_allclose(np.asarray(hv.vox_sdf(vol2.vox[blk])), want_sdf, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(hv.vox_w(vol2.vox[blk])), want_w)
    assert int(swap_states[entry_idx]) == 2


def test_swap_color_roundtrip():
    """Color planes survive eviction to the host store and merge back
    (reference ITMGlobalCache stores whole TVoxels incl. clr/w_color;
    combineVoxelColorInformation, ITMSwappingEngine.h:26-43)."""
    S = swap_settings()
    S = S.replace(use_color=True)
    hp_ = S.hashing
    vol = hv.create_hash(hp_, with_color=True)
    cache = sw.GlobalCache.create(S)
    swap_states = sw.create_swap_states(S)
    assert cache.stored_clr is not None

    vt = jnp.zeros((hp_.n_entries,), dtype=jnp.int32)
    cand = jnp.array([[7, 8, 9]], dtype=jnp.int32)
    plan = hv.plan_allocations(vol, vt, cand, jnp.ones(1, bool), hp_)
    vol, vt = hv.execute_allocations(vol, plan, hp_)
    pr = hv.probe(vol, cand[0], hp_)
    entry_idx = int(pr.entry_idx)
    blk = int(pr.entry_ptr)
    vol = vol._replace(
        vox=vol.vox.at[blk].set(hv.pack_vox(hv.sdf_to_q(-0.5), 9)),
        vox_rgb=vol.vox_rgb.at[blk].set(
            hv.pack_rgb(hv.clr_to_q(jnp.array([0.25, 0.5, 0.75])), 5)
        ),
    )
    swap_states = swap_states.at[entry_idx].set(2)

    rs = hv.RenderStateVH(
        visible_type=jnp.zeros((hp_.n_entries,), jnp.int32),
        visible_ids=jnp.full((hp_.max_visible_blocks,), -1, jnp.int32),
        n_visible=jnp.array(0, jnp.int32),
    )
    vol, swap_states = sw.swap_out(vol, swap_states, rs, cache, S)
    np.testing.assert_allclose(cache.stored_clr[entry_idx] / 255.0, np.tile([0.25, 0.5, 0.75], (hp_.block_volume, 1)), atol=1e-2)
    assert (cache.stored_wc[entry_idx] == 5).all()
    # evicted block cleared, color too
    assert float(jnp.max(jnp.abs(vol.vox_rgb[int(pr.entry_ptr)]))) == 0.0

    vt2 = jnp.zeros((hp_.n_entries,), jnp.int32).at[entry_idx].set(hv.VT_VISIBLE_SWAPPED)
    vol = sw.reallocate_swapped_out(vol, vt2, S)
    swap_states = sw.mark_visible_for_swap(swap_states, vt2)
    vol, swap_states = sw.swap_in(vol, swap_states, cache, S)
    new_blk = int(vol.entry_ptr[entry_idx])
    np.testing.assert_allclose(
        np.asarray(hv.clr_from_q(hv.rgb_clr_q(vol.vox_rgb[new_blk]))),
        np.tile([0.25, 0.5, 0.75], (hp_.block_volume, 1)),
        atol=1e-2,
    )
    assert (np.asarray(hv.rgb_wc(vol.vox_rgb[new_blk])) == 5).all()
    np.testing.assert_allclose(np.asarray(hv.vox_sdf(vol.vox[new_blk])), -0.5, atol=1e-4)
