"""Pallas integrate kernel vs the XLA gather→update→scatter oracle
(interpret mode on CPU; mirrors the reference's CPU/CUDA dual-backend
strategy, SURVEY.md §4). On a 64×64 image the kernel's depth window covers
the whole padded image, so the two paths must agree EXACTLY (bit-identical
packed voxels)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from infinitam_tpu.calib import default_calib
from infinitam_tpu.config import (
    BlockGridParams,
    SceneParams,
    Settings,
    TrackingParams,
    VoxelBlockHashParams,
)
from infinitam_tpu.engine import hash_pipeline as hp
from infinitam_tpu.engine.view_builder import View
from infinitam_tpu.io import synth

IMG = (64, 64)


def make_settings() -> Settings:
    return Settings(
        scene=SceneParams(voxel_size=0.025, mu=0.1, view_frustum_min=0.3, view_frustum_max=3.0),
        hashing=VoxelBlockHashParams(
            n_buckets=0x4000,
            n_excess=0x400,
            n_blocks=0x1800,
            max_visible_blocks=0x1000,
        ),
        block_grid=BlockGridParams(dims=(32, 32, 32), origin=(-16, -16, 0)),
        tracking=TrackingParams(n_levels=3, min_valid_points=50),
        max_fused_blocks=1024,
        max_render_blocks=512,
    )


def fused_scene(settings):
    calib = default_calib(IMG[1], IMG[0])
    proj = jnp.asarray(calib.intrinsics_d.vector)
    src = synth.SyntheticSource(calib, n_frames=2, img_size=IMG)
    depth, _rgb, _gt = src.get_images()
    vol, rs, state = hp.create_engine_state(settings, IMG)
    for _ in range(2):
        vol, rs, state, _diag = hp.process_frame_hash(
            vol, rs, state, View(depth=depth), proj, settings
        )
    return depth, proj, vol, rs, state


def test_pallas_integrate_matches_oracle():
    settings = make_settings()
    depth, proj, vol, rs, state = fused_scene(settings)
    view = View(depth=depth)
    pose = state.pose

    oracle = hp.integrate_into_scene(vol, rs, view, pose, proj, settings)
    kern = hp.integrate_into_scene_pallas(
        vol, rs, view, pose, proj, settings, interpret=True
    )

    vo = np.asarray(oracle.vox)
    vk = np.asarray(kern.vox)
    # identical packed voxels everywhere (update math, masks, and rounding
    # must match the oracle bit for bit)
    mismatch = (vo != vk).sum()
    assert mismatch == 0, f"{mismatch} packed voxels differ"
    # and the update actually did something (not a vacuous pass)
    assert (vo != np.asarray(vol.vox)).sum() > 1000


def test_pallas_integrate_respects_enable_gate():
    settings = make_settings()
    depth, proj, vol, rs, state = fused_scene(settings)
    view = View(depth=depth)
    kern = hp.integrate_into_scene_pallas(
        vol, rs, view, state.pose, proj, settings,
        enable=jnp.array(False), interpret=True,
    )
    assert (np.asarray(kern.vox) != np.asarray(vol.vox)).sum() == 0


def test_pallas_integrate_stop_at_max_w():
    settings = make_settings()
    settings = dataclasses.replace(
        settings, scene=dataclasses.replace(settings.scene, max_w=2, stop_integrating_at_max_w=True)
    )
    depth, proj, vol, rs, state = fused_scene(settings)
    view = View(depth=depth)
    pose = state.pose
    oracle = hp.integrate_into_scene(vol, rs, view, pose, proj, settings)
    kern = hp.integrate_into_scene_pallas(
        vol, rs, view, pose, proj, settings, interpret=True
    )
    assert (np.asarray(oracle.vox) != np.asarray(kern.vox)).sum() == 0


def test_pallas_color_integrate_matches_oracle():
    """Color fusion in the Pallas kernel vs the XLA gather/scatter oracle:
    depth plane bit-exact, color within bilinear bf16-weight quantization
    (≤1 uint8 LSB per channel)."""
    settings = make_settings().replace(use_color=True)
    calib = default_calib(IMG[1], IMG[0])
    proj = jnp.asarray(calib.intrinsics_d.vector)
    src = synth.SyntheticSource(calib, n_frames=2, img_size=IMG, with_rgb=True)
    depth, rgb, _gt = src.get_images()
    vol, rs, state = hp.create_engine_state(settings, IMG)
    for _ in range(2):
        vol, rs, state, _diag = hp.process_frame_hash(
            vol, rs, state, View(depth=depth, rgb=rgb), proj, settings,
            proj_rgb=proj, rgb_to_depth=jnp.eye(4),
        )
    view = View(depth=depth, rgb=rgb)
    pose = state.pose

    ref = hp.integrate_into_scene(
        vol, rs, view, pose, proj, settings, proj_rgb=proj,
        rgb_to_depth=jnp.eye(4),
    )
    out = hp.integrate_into_scene_pallas(
        vol, rs, view, pose, proj, settings, interpret=True,
        proj_rgb=proj, rgb_to_depth=jnp.eye(4),
    )
    np.testing.assert_array_equal(np.asarray(out.vox), np.asarray(ref.vox))
    pk = np.asarray(out.vox_rgb).view(np.uint32)
    pr = np.asarray(ref.vox_rgb).view(np.uint32)
    # unpack channels, compare with 1-LSB tolerance; wc exact
    for shift in (24, 16, 8):
        ck = (pk >> shift) & 0xFF
        cr = (pr >> shift) & 0xFF
        d = np.abs(ck.astype(np.int32) - cr.astype(np.int32))
        assert d.max() <= 1, f"channel@{shift} max diff {d.max()}"
    np.testing.assert_array_equal(pk & 0xFF, pr & 0xFF)
