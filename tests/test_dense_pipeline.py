"""End-to-end correctness tests on the dense voxel-array pipeline, using the
synthetic analytic-SDF oracle (the analogue of the reference's Teddy replay,
SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from infinitam_tpu.calib import default_calib
from infinitam_tpu.config import (
    PlainVoxelArrayParams,
    SceneParams,
    Settings,
    TrackingParams,
)
from infinitam_tpu.engine import dense_pipeline as dp
from infinitam_tpu.engine import volume as vol_mod
from infinitam_tpu.engine.trackers import track_depth
from infinitam_tpu.engine.view_builder import View
from infinitam_tpu.io import synth
from infinitam_tpu.ops import raycast as rc
from infinitam_tpu.utils import se3

IMG = (60, 80)  # (H, W)


def small_settings() -> Settings:
    return Settings(
        scene=SceneParams(voxel_size=0.025, mu=0.1, view_frustum_min=0.3, view_frustum_max=3.0),
        plain=PlainVoxelArrayParams(size=(128, 128, 100), offset=(-64, -64, 0)),
        tracking=TrackingParams(n_levels=3, min_valid_points=50),
    )


def small_calib():
    c = default_calib(IMG[1], IMG[0])
    return c


@pytest.fixture(scope="module")
def fused_volume():
    """Volume with the first synthetic frame fused at identity pose."""
    import jax

    settings = small_settings()
    calib = small_calib()
    proj = jnp.asarray(calib.intrinsics_d.vector)
    depth = synth.render_depth(jnp.eye(4), proj, IMG)
    vol = vol_mod.create_dense(settings.plain)
    view = View(depth=depth)
    integrate = jax.jit(dp.integrate_frame_dense, static_argnames=("settings",))
    vol = integrate(vol, view, jnp.eye(4), proj, settings)
    return settings, proj, depth, vol


def test_integration_writes_surface(fused_volume):
    settings, proj, depth, vol = fused_volume
    # some voxels must have been updated
    assert int(jnp.sum(vol.w_depth > 0)) > 1000
    # SDF near the sphere center (0,0.1,1.5) surface should be ~0
    sp = settings.scene
    surf_world = jnp.array([0.0, 0.1, 1.5 - 0.35])  # nearest sphere point to camera
    voxel = surf_world / sp.voxel_size
    pts = jnp.round(voxel).astype(jnp.int32)
    sdf, found = vol_mod.dense_read_sdf(vol, settings.plain, pts)
    assert bool(found)
    assert abs(float(sdf)) < 0.2  # within 0.2·mu of the surface


import jax  # noqa: E402

_RAYCAST = jax.jit(dp.raycast_dense, static_argnames=("img_size", "settings"))
_TRACK = jax.jit(track_depth, static_argnames=("params",))


def _jit_raycast(vol, pose, proj, settings):
    return _RAYCAST(vol, pose, proj, IMG, settings)


def test_raycast_reproduces_depth(fused_volume):
    settings, proj, depth, vol = fused_volume
    res = _jit_raycast(vol, jnp.eye(4), proj, settings)
    pts = res.points
    found = np.asarray(pts[..., 3]) > 0
    gt_valid = np.asarray(depth) > 0
    # most pixels with ground-truth depth should be found
    assert found[gt_valid].mean() > 0.85
    z_ray = np.asarray(pts[..., 2]) * settings.scene.voxel_size
    err = np.abs(z_ray - np.asarray(depth))[found & gt_valid]
    # median within a voxel
    assert np.median(err) < settings.scene.voxel_size


def test_icp_maps_normals(fused_volume):
    settings, proj, depth, vol = fused_volume
    res = _jit_raycast(vol, jnp.eye(4), proj, settings)
    points_map, normals_map = rc.make_icp_maps(res, settings.scene.voxel_size, jnp.eye(4))
    valid = np.asarray(points_map[..., 3]) > 0
    assert valid.mean() > 0.3
    n = np.asarray(normals_map[..., :3])[valid]
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-3)


def test_tracker_recovers_pose(fused_volume):
    settings, proj, depth, vol = fused_volume
    res = _jit_raycast(vol, jnp.eye(4), proj, settings)
    points_map, normals_map = rc.make_icp_maps(res, settings.scene.voxel_size, jnp.eye(4))

    # ground-truth perturbed pose: few mm + ~0.5 degrees
    twist = jnp.array([0.01, -0.008, 0.012, 0.008, -0.01, 0.006])
    gt_pose = se3.se3_exp(twist)
    depth_new = synth.render_depth(gt_pose, proj, IMG)

    tr = _TRACK(
        jnp.eye(4),  # start at identity
        depth_new,
        proj,
        points_map,
        normals_map,
        jnp.eye(4),
        settings.tracking,
    )
    # pose error vs ground truth
    err_twist = se3.se3_log(tr.pose @ se3.invert(gt_pose))
    t_err = float(jnp.linalg.norm(err_twist[:3]))
    r_err = float(jnp.linalg.norm(err_twist[3:]))
    assert int(tr.num_valid) > 100
    assert t_err < 0.005, f"translation error {t_err}"
    assert r_err < 0.005, f"rotation error {r_err}"


def test_e2e_sequence_tracks_trajectory():
    settings = small_settings()
    calib = small_calib()
    proj = jnp.asarray(calib.intrinsics_d.vector)
    src = synth.SyntheticSource(calib, n_frames=8, img_size=IMG)
    vol, state = dp.create_engine_state(settings, IMG)

    errs = []
    while src.has_more_images():
        depth, _rgb, gt_pose = src.get_images()
        view = View(depth=depth)
        vol, state, diag = dp.process_frame_dense(vol, state, view, proj, settings)
        err_twist = se3.se3_log(state.pose @ se3.invert(gt_pose))
        errs.append(float(jnp.linalg.norm(err_twist[:3])))

    # translational drift stays within ~1 voxel over the short sequence
    assert errs[-1] < 0.03, f"trajectory errors: {errs}"
    assert max(errs) < 0.04, f"trajectory errors: {errs}"
