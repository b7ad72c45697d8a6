"""Tests for forward render (approximate raycast), dataset sources, CLI, and
renderer outputs."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from infinitam_tpu.calib import default_calib, write_rgbd_calib
from infinitam_tpu.config import (
    SceneParams,
    Settings,
    TrackingParams,
    VoxelBlockHashParams,
)
from infinitam_tpu.engine import hash_pipeline as hp
from infinitam_tpu.engine import hash_volume as hv
from infinitam_tpu.engine.view_builder import View
from infinitam_tpu.io import synth
from infinitam_tpu.io.sources import ImageFileReader, IMUSource, TUMSource
from infinitam_tpu.ops import raycast as rc
from infinitam_tpu.utils import se3
from infinitam_tpu.utils.image_io import write_pgm, write_ppm

IMG = (60, 80)
SETTINGS = Settings(
    scene=SceneParams(voxel_size=0.025, mu=0.1, view_frustum_min=0.3, view_frustum_max=3.0),
    hashing=VoxelBlockHashParams(
        n_buckets=0x4000, n_excess=0x400, n_blocks=0x1800, max_visible_blocks=0x1000
    ),
    tracking=TrackingParams(n_levels=3, min_valid_points=50),
)
CALIB = default_calib(IMG[1], IMG[0])
PROJ = jnp.asarray(CALIB.intrinsics_d.vector)


def _fused():
    depth = synth.render_depth(jnp.eye(4), PROJ, IMG)
    vol, rs, st = hp.create_engine_state(SETTINGS, IMG)
    vol, rs, st, _ = hp.process_frame_hash(vol, rs, st, View(depth=depth), PROJ, SETTINGS)
    return depth, vol, rs, st


def test_forward_render_fills_most_pixels():
    depth, vol, rs, st = _fused()
    sp = SETTINGS.scene
    new_pose = se3.se3_exp(jnp.array([0.01, 0.005, -0.008, 0.004, -0.006, 0.003]))
    zmin, zmax, _ntb = hp.expected_depth_ranges(vol, rs, new_pose, PROJ, IMG, SETTINGS)
    grid = hv.build_block_grid(vol, SETTINGS.block_grid, SETTINGS.hashing)
    read = hv.make_grid_reader(vol, grid, SETTINGS.block_grid, SETTINGS.hashing)
    fwd = rc.forward_render(
        read, st.points_map, new_pose, PROJ, IMG, 1.0 / sp.voxel_size, sp.mu, zmin, zmax
    )
    full = rc.generic_raycast(
        read, se3.invert(new_pose), PROJ, IMG, 1.0 / sp.voxel_size, sp.mu, zmin, zmax
    )
    f_fwd = np.asarray(fwd.points[..., 3]) > 0
    f_full = np.asarray(full.points[..., 3]) > 0
    # forward render must cover most of what the full raycast finds
    assert f_fwd[f_full].mean() > 0.8
    # and where both found, positions agree within ~a voxel
    both = f_fwd & f_full
    d = np.linalg.norm(
        np.asarray(fwd.points[..., :3]) - np.asarray(full.points[..., :3]), axis=-1
    )[both]
    assert np.median(d) < 1.5


def test_approximate_raycast_pipeline_tracks():
    settings = SETTINGS.replace(use_approximate_raycast=True)
    src = synth.SyntheticSource(CALIB, n_frames=8, img_size=IMG)
    vol, rs, st = hp.create_engine_state(settings, IMG)
    errs = []
    ages = []
    for _ in range(src.n_frames):
        d, _r, gt = src.get_images()
        vol, rs, st, _ = hp.process_frame_hash(vol, rs, st, View(depth=d), PROJ, settings)
        errs.append(float(jnp.linalg.norm(se3.se3_log(st.pose @ se3.invert(gt))[:3])))
        ages.append(int(st.age))
    assert errs[-1] < 0.04, errs
    assert max(ages) > 0, f"approximate path never engaged: {ages}"


def test_image_file_reader_roundtrip(tmp_path):
    # write a tiny sequence in the reference's mask format
    calib_path = os.path.join(tmp_path, "calib.txt")
    with open(calib_path, "w") as f:
        f.write(write_rgbd_calib(CALIB))
    for i in range(3):
        depth = (np.full((24, 32), 1000 + i, dtype=np.uint16))
        rgb = np.full((24, 32, 3), 10 * i, dtype=np.uint8)
        write_pgm(os.path.join(tmp_path, f"{i:04d}.pgm"), depth)
        write_ppm(os.path.join(tmp_path, f"{i:04d}.ppm"), rgb)

    src = ImageFileReader(
        calib_path,
        os.path.join(tmp_path, "%04i.ppm"),
        os.path.join(tmp_path, "%04i.pgm"),
    )
    n = 0
    while src.has_more_images():
        depth, rgb = src.get_images()
        assert depth.shape == (24, 32) and depth[0, 0] == 1000 + n
        assert rgb.shape == (24, 32, 3) and rgb[0, 0, 0] == 10 * n
        n += 1
    assert n == 3


def test_imu_source(tmp_path):
    R = np.eye(3, dtype=np.float32)
    np.savetxt(os.path.join(tmp_path, "imu_0000.txt"), R)
    src = IMUSource(os.path.join(tmp_path, "imu_%04i.txt"))
    assert src.has_more_measurements()
    np.testing.assert_allclose(src.get_measurement(), R)
    assert not src.has_more_measurements()


def test_cli_synthetic_run(tmp_path):
    mesh_path = os.path.join(tmp_path, "scene.stl")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "infinitam_tpu.apps.cli",
            "--synthetic",
            "--frames",
            "3",
            "--width",
            "80",
            "--height",
            "60",
            "--voxel-size",
            "0.025",
            "--mu",
            "0.1",
            "--cpu",
            "--out-mesh",
            mesh_path,
        ],
        capture_output=True,
        text=True,
        timeout=500,
        env=env,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "processed 3 frames" in out.stdout
    assert os.path.exists(mesh_path) and os.path.getsize(mesh_path) > 84


def test_png_roundtrip_stdlib(tmp_path):
    """write_png (incl. the zlib fallback path) round-trips via read_image."""
    import numpy as np
    from infinitam_tpu.utils import image_io as iio

    rgb = np.arange(48 * 3, dtype=np.uint8).reshape(4, 12, 3)
    p = str(tmp_path / "t.png")
    iio.write_png(p, rgb)
    back = iio.read_image(p)
    np.testing.assert_array_equal(back[..., :3], rgb)
    # uint16 grey (TUM-style depth)
    d = (np.arange(48, dtype=np.uint16) * 931).reshape(4, 12)
    p2 = str(tmp_path / "d.png")
    iio.write_png(p2, d)
    np.testing.assert_array_equal(np.asarray(iio.read_image(p2)), d)


def test_record_replay_roundtrip(tmp_path):
    """RecordingSource writes a stream ReplaySource reproduces (reference:
    UIEngine 's'-key input recording, UIEngine.cpp:498-508)."""
    import numpy as np
    from infinitam_tpu.calib import default_calib
    from infinitam_tpu.io import sources as srcs
    from infinitam_tpu.io import synth

    calib = default_calib(64, 48)
    inner = synth.SyntheticSource(calib, n_frames=3, img_size=(48, 64))
    rec = srcs.RecordingSource(inner, str(tmp_path / "rec"))
    originals = [rec.get_images() for _ in range(3)]

    rep = srcs.ReplaySource(str(tmp_path / "rec"), calib)
    for depth0, _rgb0, _gt in originals:
        assert rep.has_more_images()
        depth1, _rgb1 = rep.get_images()
        d0 = np.asarray(depth0)
        d1 = np.asarray(depth1)
        valid = d0 > 0  # invalid depth (-1) records as 0 — same semantics
        np.testing.assert_array_equal(d1 > 0, valid)
        # recorded at mm quantization (truncation <= 1 mm)
        np.testing.assert_allclose(d1[valid], d0[valid], atol=1.1e-3)
    assert not rep.has_more_images()


def test_source_fallback_chain_reaches_synthetic(tmp_path, capsys):
    """make_source (reference InfiniTAM.cpp:21-87 chain) falls through
    missing files and absent cameras to the synthetic source."""
    from infinitam_tpu.io import sources as srcs

    src, is_synth = srcs.make_source(
        calib_path=None, depth_mask=str(tmp_path / "none_%04i.pgm"),
        img_size=(48, 64), n_frames=2,
    )
    assert is_synth
    d, _r, _g = src.get_images()
    assert d.shape == (48, 64)
