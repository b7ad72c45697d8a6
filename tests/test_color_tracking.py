"""Color fusion + photometric tracker tests (reference: ITMColorTracker,
computeUpdatedVoxelColorInfo)."""

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
from infinitam_tpu.engine.view_builder import View
from infinitam_tpu.io import synth
from infinitam_tpu.utils import se3

IMG = (60, 80)
SETTINGS = Settings(
    scene=SceneParams(voxel_size=0.025, mu=0.1, view_frustum_min=0.3, view_frustum_max=3.0),
    hashing=VoxelBlockHashParams(
        n_buckets=0x4000, n_excess=0x400, n_blocks=0x1800, max_visible_blocks=0x1000
    ),
    tracking=TrackingParams(n_levels=3, min_valid_points=50, color_n_levels=3),
    tracker_type=TrackerType.COLOR,
    use_color=True,
)
CALIB = default_calib(IMG[1], IMG[0])
PROJ = jnp.asarray(CALIB.intrinsics_d.vector)


def test_color_fusion_stores_scene_color():
    depth, rgb = synth.render_rgbd(jnp.eye(4), PROJ, IMG)
    vol, rs, st = hp.create_engine_state(SETTINGS, IMG)
    vol, rs, st, _ = hp.process_frame_hash(
        vol, rs, st, View(depth=depth, rgb=rgb), PROJ, SETTINGS, proj_rgb=PROJ
    )
    assert vol.vox_rgb is not None
    from infinitam_tpu.engine import hash_volume as hv

    wc = np.asarray(hv.rgb_wc(vol.vox_rgb))
    assert (wc > 0).sum() > 1000
    # fused colours where weighted should be non-trivial
    clr = np.asarray(hv.rgb_clr_q(vol.vox_rgb))
    touched = clr[wc > 0]
    assert touched.std() > 0.05


def test_color_point_cloud_colours_match_observation():
    depth, rgb = synth.render_rgbd(jnp.eye(4), PROJ, IMG)
    vol, rs, st = hp.create_engine_state(SETTINGS, IMG)
    vol, rs, st, _ = hp.process_frame_hash(
        vol, rs, st, View(depth=depth, rgb=rgb), PROJ, SETTINGS, proj_rgb=PROJ
    )
    # prepared maps: locations + colours; project colours back — they should
    # approximate the observed image where valid
    locs = np.asarray(st.points_map)
    cols = np.asarray(st.normals_map)
    valid = locs[..., 3] > 0
    assert valid.mean() > 0.3
    err = np.abs(cols[..., :3] - np.asarray(rgb))[valid]
    assert np.median(err) < 0.15


def test_color_tracker_recovers_small_motion():
    depth0, rgb0 = synth.render_rgbd(jnp.eye(4), PROJ, IMG)
    vol, rs, st = hp.create_engine_state(SETTINGS, IMG)
    # fuse a few identity frames to get well-averaged colours
    for _ in range(2):
        vol, rs, st, _ = hp.process_frame_hash(
            vol, rs, st, View(depth=depth0, rgb=rgb0), PROJ, SETTINGS, proj_rgb=PROJ
        )

    twist = jnp.array([0.004, -0.003, 0.005, 0.003, -0.004, 0.002])
    gt_pose = se3.se3_exp(twist)
    depth1, rgb1 = synth.render_rgbd(gt_pose, PROJ, IMG)
    vol, rs, st, _ = hp.process_frame_hash(
        vol, rs, st, View(depth=depth1, rgb=rgb1), PROJ, SETTINGS, proj_rgb=PROJ
    )
    err = se3.se3_log(st.pose @ se3.invert(gt_pose))
    t_err = float(jnp.linalg.norm(err[:3]))
    r_err = float(jnp.linalg.norm(err[3:]))
    # photometric tracking on the synthetic texture: expect sub-centimetre
    assert t_err < 0.008, f"translation error {t_err}"
    assert r_err < 0.01, f"rotation error {r_err}"
