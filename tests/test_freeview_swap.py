"""Freeview visible-list rebuild + unified swap orchestration tests.

Reference semantics: ITMMainEngine::GetImage freeview path runs
FindVisibleBlocks → render on a dedicated render state for the REQUESTED
pose (ITMMainEngine.cpp:176-182); ITMDenseMapper::ProcessFrame runs the same
orchestration whatever the tracker, swapping or not (ITMDenseMapper.cpp:51-65).
"""

import jax.numpy as jnp
import numpy as np

from infinitam_tpu.calib import default_calib
from infinitam_tpu.config import (
    SceneParams,
    Settings,
    SwappingMode,
    TrackerType,
    TrackingParams,
    VoxelBlockHashParams,
)
from infinitam_tpu.engine.main_engine import MainEngine
from infinitam_tpu.io import synth
from infinitam_tpu.utils import se3

IMG = (48, 64)


def small_settings(**kw) -> Settings:
    return Settings(
        scene=SceneParams(voxel_size=0.025, mu=0.1, view_frustum_min=0.3, view_frustum_max=3.0),
        hashing=VoxelBlockHashParams(
            n_buckets=0x4000,
            n_excess=0x400,
            n_blocks=0x1800,
            n_transfer_blocks=0x200,
            max_visible_blocks=0x1000,
        ),
        tracking=TrackingParams(n_levels=3, min_valid_points=50),
        alloc_subsample=2,
        **kw,
    )


def _fused_engine(settings) -> MainEngine:
    calib = default_calib(IMG[1], IMG[0])
    eng = MainEngine(settings, calib, IMG)
    src = synth.SyntheticSource(calib, n_frames=3, img_size=IMG)
    for _ in range(3):
        depth, rgb, _gt = src.get_images()
        eng.process_frame(metric_depth=depth, rgb=rgb)
    return eng

def test_freeview_renders_back_side():
    """A camera 180° opposite the live one must still see the model: the
    freeview render rebuilds its own visible list instead of reusing the
    live camera's (which covers only the live frustum)."""
    eng = _fused_engine(small_settings())

    # live-view render sees the scene
    live = eng.get_image("raycast")
    assert (np.asarray(live) > 0).mean() > 0.3

    # place a camera BEHIND the scene looking back at it: the synthetic
    # scene sits around z≈1-2 m; orbit the camera to z≈3.2 m facing -z
    R = np.array([[-1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, -1.0]])
    C = np.array([0.0, 0.0, 3.2])  # camera centre in world
    M = np.eye(4)
    M[:3, :3] = R
    M[:3, 3] = -R @ C  # world→camera
    back = eng.get_image("raycast", pose=M)
    frac = (np.asarray(back) > 0).mean()
    assert frac > 0.10, f"back-side freeview coverage {frac:.3f}"


def test_freeview_offscene_is_empty():
    """A freeview camera aimed away from all geometry renders nothing."""
    eng = _fused_engine(small_settings())
    R = np.eye(3)
    C = np.array([0.0, 0.0, -10.0])  # far behind the origin, looking at empty +z...
    M = np.eye(4)
    M[:3, :3] = R
    M[:3, 3] = -R @ C
    # looking from far away the scene is outside the 3 m frustum
    img = eng.get_image("raycast", pose=M)
    assert (np.asarray(img) > 0).mean() < 0.05


def test_swap_with_color_tracker_tracks():
    """Swapping + COLOR tracker: the unified orchestration must run the
    photometric tracker and keep tracking within tolerance (previously the
    swap path supported only ICP/WICP/EXTERNAL)."""
    settings = small_settings(
        swapping_mode=SwappingMode.ENABLED,
        tracker_type=TrackerType.COLOR,
        use_color=True,
    )
    calib = default_calib(IMG[1], IMG[0])
    eng = MainEngine(settings, calib, IMG)
    src = synth.SyntheticSource(calib, n_frames=4, img_size=IMG, with_rgb=True)
    gt_last = None
    for _ in range(4):
        depth, rgb, gt = src.get_images()
        eng.process_frame(metric_depth=depth, rgb=rgb)
        gt_last = gt
    err = se3.se3_log(eng.tracking_state.pose @ se3.invert(jnp.asarray(gt_last)))
    t_err = float(jnp.linalg.norm(err[:3]))
    assert t_err < 0.05, f"swap+color translation error {t_err:.4f} m"


def test_swap_divergence_gate_active():
    """The divergence gate must exist on the swap path too: a garbage depth
    frame (tracking failure) keeps the last good pose."""
    settings = small_settings(swapping_mode=SwappingMode.ENABLED)
    calib = default_calib(IMG[1], IMG[0])
    eng = MainEngine(settings, calib, IMG)
    src = synth.SyntheticSource(calib, n_frames=3, img_size=IMG)
    for _ in range(3):
        depth, rgb, _gt = src.get_images()
        eng.process_frame(metric_depth=depth)
    pose_before = np.asarray(eng.tracking_state.pose)
    # sensor dropout: all-invalid depth → zero correspondences → the f=1e5
    # sentinel crosses the divergence threshold and the gate must hold the
    # last good pose (and skip fusion) on the SWAP path too
    junk = np.full(IMG, -1.0, dtype=np.float32)
    d = eng.process_frame(metric_depth=junk)
    assert d["num_valid"] == 0
    pose_after = np.asarray(eng.tracking_state.pose)
    assert np.abs(pose_after - pose_before).max() < 1e-6, (
        "diverged frame must keep the last good pose"
    )
