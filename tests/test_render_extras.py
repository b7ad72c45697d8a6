"""Colormap + IMU calibrator tests (reference: ITMVisualisationEngine.cpp
static colormaps; ITMIMUCalibrator.h / ITMIMUTracker.cpp)."""

import numpy as np

from infinitam_tpu.engine import imu as imu_mod
from infinitam_tpu.ops import colormaps as cm


def test_depth_colormap_range_and_invalid():
    import jax.numpy as jnp

    d = jnp.array([[0.0, 1.0], [2.0, 3.0]], dtype=jnp.float32)
    img = np.asarray(cm.depth_to_uchar4(d))
    assert img.shape == (2, 2, 4)
    assert (img[0, 0] == 0).all()  # invalid pixel black
    # valid pixels: alpha 255; nearest depth (t=0) → green peak (base(0)=1),
    # farthest (t=1) → red dominant (base(0.5)=0.5, g=b=0)
    assert img[0, 1, 3] == 255
    assert img[0, 1, 1] == 255 and img[0, 1, 1] > img[0, 1, 0]
    assert img[1, 1, 0] > img[1, 1, 2] and img[1, 1, 1] == 0


def test_depth_colormap_constant_image_black():
    import jax.numpy as jnp

    d = jnp.full((4, 4), 2.0, dtype=jnp.float32)
    img = np.asarray(cm.depth_to_uchar4(d))
    assert (img == 0).all()  # lims[0]==lims[1] → reference returns all-zero


def test_normal_colormap():
    import jax.numpy as jnp

    n = jnp.zeros((2, 2, 3), dtype=jnp.float32).at[0, 0].set(jnp.array([0.0, 0.0, 1.0]))
    valid = jnp.array([[True, False], [False, False]])
    img = np.asarray(cm.normal_to_uchar4(n, valid))
    assert (img[0, 1] == 0).all()
    # n=(0,0,1): r=g=0.3+0.35=0.65 → 165; b=0.3+0.7=1.0 → 255
    assert abs(int(img[0, 0, 0]) - 165) <= 1
    assert img[0, 0, 2] == 255


def test_weight_colormap_confidence_ordering():
    import jax.numpy as jnp

    w = jnp.array([[1.0, 4.0], [0.0, 2.0]], dtype=jnp.float32)
    img = np.asarray(cm.weight_to_uchar4(w))
    assert (img[1, 0] == 0).all()
    # min weight → s=1.0 → pure green; larger w → more red
    assert img[0, 0, 1] == 255 and img[0, 0, 0] == 0
    assert img[0, 1, 0] > 0


def _rot(axis, angle):
    axis = np.asarray(axis, dtype=np.float64)
    return imu_mod._rot_exp(axis / np.linalg.norm(axis) * angle)


def test_imu_calibrator_first_frame_identity():
    cal = imu_mod.IMUCalibratoriPad()
    cal.register_measurement(_rot([0, 0, 1], 0.3))
    d = cal.differential_rotation()
    assert np.allclose(d, np.eye(3))  # no differential until two frames


def test_imu_calibrator_axis_convention():
    # two measurements differing by rotation about z: iPad convention negates
    # the z rotation twice (registration negation + differential negation),
    # composing to the raw differential about -z... verify it is a valid
    # rotation with the expected magnitude and the composite applies it.
    cal = imu_mod.IMUCalibratoriPad()
    cal.register_measurement(np.eye(3))
    cal.differential_rotation()
    cal.register_measurement(_rot([0, 0, 1], 0.2))
    d = cal.differential_rotation()
    ang = np.arccos(np.clip((np.trace(d) - 1) / 2, -1, 1))
    assert abs(ang - 0.2) < 1e-6
    assert np.allclose(d @ d.T, np.eye(3), atol=1e-9)

    pose = np.eye(4)
    pose[:3, 3] = [0.1, 0.2, 0.3]
    out = imu_mod.apply_imu_prior(pose, d)
    assert np.allclose(out[:3, :3], d)
    assert np.allclose(out[:3, 3], pose[:3, 3])  # translation untouched


def test_get_image_colormap_types():
    """MainEngine.get_image 'depth' and 'weight' types (reference:
    ITMMainEngine.cpp:140-151 ORIGINAL_DEPTH + ITMVisualisationEngine.cpp
    DepthToUchar4/WeightToUchar4 colormaps)."""
    import numpy as np

    from infinitam_tpu.calib import default_calib
    from infinitam_tpu.engine.main_engine import MainEngine
    from infinitam_tpu.io import synth

    from tests.test_hash_pipeline import hash_settings

    S = hash_settings()
    img = (48, 64)
    calib = default_calib(img[1], img[0])
    eng = MainEngine(S, calib, img)
    src = synth.SyntheticSource(calib, n_frames=2, img_size=img)
    for _ in range(2):
        d, _r, _g = src.get_images()
        eng.process_frame(metric_depth=d)

    im_d = eng.get_image("depth")
    im_w = eng.get_image("weight")
    im_in = eng.get_image("depth", view=d)
    for im in (im_d, im_w, im_in):
        assert im.shape == (img[0], img[1], 4) and im.dtype == np.uint8
    assert im_d.max() > 0 and im_w.max() > 0 and im_in.max() > 0
    # weight image uses red/green channels only (reference WeightToUchar4)
    assert im_w[..., 2].max() == 0
