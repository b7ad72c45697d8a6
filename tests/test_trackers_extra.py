"""WICP, Ren (SDF), IMU/composite, and external tracker tests."""

import jax.numpy as jnp
import numpy as np

from infinitam_tpu.calib import default_calib
from infinitam_tpu.config import (
    SceneParams,
    Settings,
    TrackerType,
    TrackingParams,
    VoxelBlockHashParams,
)
from infinitam_tpu.engine import hash_pipeline as hp
from infinitam_tpu.engine import hash_volume as hv
from infinitam_tpu.engine.trackers import apply_imu_rotation, track_ren
from infinitam_tpu.engine.view_builder import View
from infinitam_tpu.io import synth
from infinitam_tpu.utils import se3

IMG = (60, 80)


def settings_for(tt: TrackerType, **kw) -> Settings:
    return Settings(
        scene=SceneParams(voxel_size=0.025, mu=0.1, view_frustum_min=0.3, view_frustum_max=3.0),
        alloc_subsample=2,  # stride 4 is budgeted for 640×480, not 60×80
        hashing=VoxelBlockHashParams(
            n_buckets=0x4000, n_excess=0x400, n_blocks=0x1800, max_visible_blocks=0x1000
        ),
        tracking=TrackingParams(n_levels=3, min_valid_points=50),
        tracker_type=tt,
        **kw,
    )


CALIB = default_calib(IMG[1], IMG[0])
PROJ = jnp.asarray(CALIB.intrinsics_d.vector)


def _run_sequence(settings, n=6, model_sensor_noise=False):
    src = synth.SyntheticSource(CALIB, n_frames=n, img_size=IMG)
    vol, rs, st = hp.create_engine_state(settings, IMG)
    errs = []
    for _ in range(n):
        d, _r, gt = src.get_images()
        view = View(depth=d)
        if model_sensor_noise:
            from infinitam_tpu.ops.view_ops import compute_normals_and_weights

            normals, sigma = compute_normals_and_weights(d, CALIB.intrinsics_d)
            view = View(depth=d, depth_normals=normals, depth_uncertainty=sigma)
        vol, rs, st, _ = hp.process_frame_hash(vol, rs, st, view, PROJ, settings)
        errs.append(float(jnp.linalg.norm(se3.se3_log(st.pose @ se3.invert(gt))[:3])))
    return errs, (vol, rs, st)


def test_wicp_tracks():
    errs, _ = _run_sequence(
        settings_for(TrackerType.WICP, model_sensor_noise=True), model_sensor_noise=True
    )
    assert errs[-1] < 0.03, errs


def test_ren_tracker_refines():
    errs, _ = _run_sequence(settings_for(TrackerType.REN))
    assert errs[-1] < 0.03, errs


def test_ren_tracker_standalone_recovers_small_offset():
    settings = settings_for(TrackerType.ICP)
    depth = synth.render_depth(jnp.eye(4), PROJ, IMG)
    vol, rs, st = hp.create_engine_state(settings, IMG)
    vol, rs, st, _ = hp.process_frame_hash(vol, rs, st, View(depth=depth), PROJ, settings)

    grid = hv.build_block_grid(vol, settings.block_grid, settings.hashing)
    read = hv.make_grid_reader(vol, grid, settings.block_grid, settings.hashing)

    twist = jnp.array([0.004, -0.003, 0.004, 0.002, -0.003, 0.002])
    gt = se3.se3_exp(twist)
    depth2 = synth.render_depth(gt, PROJ, IMG)
    tr = track_ren(jnp.eye(4), depth2, PROJ, read, settings.scene.voxel_size, settings.tracking)
    err0 = float(jnp.linalg.norm(se3.se3_log(jnp.eye(4) @ se3.invert(gt))[:3]))
    err1 = float(jnp.linalg.norm(se3.se3_log(tr.pose @ se3.invert(gt))[:3]))
    # the SDF tracker must reduce the initial pose error substantially
    assert err1 < 0.6 * err0, (err0, err1)


def test_external_tracker_injects_pose():
    settings = settings_for(TrackerType.EXTERNAL)
    src = synth.SyntheticSource(CALIB, n_frames=4, img_size=IMG)
    vol, rs, st = hp.create_engine_state(settings, IMG)
    for _ in range(4):
        d, _r, gt = src.get_images()
        vol, rs, st, _ = hp.process_frame_hash(
            vol, rs, st, View(depth=d), PROJ, settings, external_pose=jnp.asarray(gt)
        )
    np.testing.assert_allclose(np.asarray(st.pose), np.asarray(src.gt_poses[3]), atol=1e-6)


def test_imu_rotation_prior_helps():
    """With the IMU pre-rotation applied, a large rotational jump stays
    trackable (reference: ITMIMUTracker composite)."""
    settings = settings_for(TrackerType.ICP)
    depth0 = synth.render_depth(jnp.eye(4), PROJ, IMG)
    vol, rs, st = hp.create_engine_state(settings, IMG)
    vol, rs, st, _ = hp.process_frame_hash(vol, rs, st, View(depth=depth0), PROJ, settings)

    # big rotation (~8 degrees) — beyond the ICP basin at these test levels
    twist = jnp.array([0.0, 0.0, 0.0, 0.10, -0.08, 0.05])
    gt = se3.se3_exp(twist)
    depth1 = synth.render_depth(gt, PROJ, IMG)

    # apply the (noisy) IMU rotation prior first
    delta_rot = se3.so3_exp(twist[3:] * 0.95)  # 5% gyro error
    st_imu = st._replace(pose=apply_imu_rotation(st.pose, delta_rot))
    vol2, rs2, st2, _ = hp.process_frame_hash(vol, rs, st_imu, View(depth=depth1), PROJ, settings)
    err_with = float(jnp.linalg.norm(se3.se3_log(st2.pose @ se3.invert(gt))))
    assert err_with < 0.02, err_with
