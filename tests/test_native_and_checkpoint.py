"""Native C++ IO library + checkpoint/resume tests."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from infinitam_tpu.calib import default_calib
from infinitam_tpu.config import (
    SceneParams,
    Settings,
    TrackingParams,
    VoxelBlockHashParams,
)
from infinitam_tpu.engine.main_engine import MainEngine
from infinitam_tpu.io import synth
from infinitam_tpu.utils import checkpoint as ckpt
from infinitam_tpu.utils import native
from infinitam_tpu.utils.image_io import read_pgm, write_pgm
from infinitam_tpu.utils.se3 import se3_log, invert

IMG = (60, 80)
SETTINGS = Settings(
    scene=SceneParams(voxel_size=0.025, mu=0.1, view_frustum_min=0.3, view_frustum_max=3.0),
    hashing=VoxelBlockHashParams(
        n_buckets=0x4000, n_excess=0x400, n_blocks=0x1800, max_visible_blocks=0x1000
    ),
    tracking=TrackingParams(n_levels=3, min_valid_points=50),
)


def test_native_library_builds():
    lib = native.get_lib()
    assert lib is not None, "native library failed to build"


def test_native_pgm_matches_python(tmp_path):
    if native.get_lib() is None:
        pytest.skip("no native lib")
    img = (np.random.default_rng(0).integers(0, 50000, (24, 32))).astype(np.uint16)
    p = os.path.join(tmp_path, "t.pgm")
    write_pgm(p, img)
    got = native.read_pgm_native(p, 24, 32)
    np.testing.assert_array_equal(got, img)
    np.testing.assert_array_equal(read_pgm(p), img)


def test_native_stl(tmp_path):
    if native.get_lib() is None:
        pytest.skip("no native lib")
    tris = np.array(
        [[[0, 0, 0], [1, 0, 0], [0, 1, 0]], [[0, 0, 1], [1, 0, 1], [0, 1, 1]]],
        dtype=np.float32,
    )
    p = os.path.join(tmp_path, "t.stl")
    assert native.write_stl_native(p, tris)
    raw = open(p, "rb").read()
    import struct

    assert struct.unpack("<I", raw[80:84])[0] == 2
    assert len(raw) == 84 + 2 * 50


def test_native_prefetcher(tmp_path):
    if native.get_lib() is None:
        pytest.skip("no native lib")
    paths = []
    for i in range(5):
        img = np.full((16, 20), 100 + i, dtype=np.uint16)
        p = os.path.join(tmp_path, f"{i:04d}.pgm")
        write_pgm(p, img)
        paths.append(p)
    pf = native.NativePrefetcher(paths, None, 16, 20, n_threads=2)
    for i in range(5):
        got = pf.get(i)
        assert got is not None
        depth, _ = got
        assert depth[0, 0] == 100 + i
    pf.close()


def test_checkpoint_resume_identical_continuation(tmp_path):
    calib = default_calib(IMG[1], IMG[0])
    src = synth.SyntheticSource(calib, n_frames=6, img_size=IMG)
    frames = [src.get_images() for _ in range(6)]

    eng = MainEngine(SETTINGS, calib, IMG)
    for d, _r, _g in frames[:3]:
        eng.process_frame(metric_depth=d)
    path = os.path.join(tmp_path, "snap.npz")
    ckpt.save_engine(path, eng)

    # continue original
    for d, _r, _g in frames[3:]:
        eng.process_frame(metric_depth=d)

    # resume into a fresh engine and continue identically
    eng2 = MainEngine(SETTINGS, calib, IMG)
    ckpt.load_engine(path, eng2)
    assert eng2.frame_no == 3
    for d, _r, _g in frames[3:]:
        eng2.process_frame(metric_depth=d)

    delta = se3_log(jnp.asarray(eng.tracking_state.pose) @ invert(jnp.asarray(eng2.tracking_state.pose)))
    assert float(jnp.linalg.norm(delta)) < 1e-5
    np.testing.assert_allclose(
        np.asarray(eng.vol.vox), np.asarray(eng2.vol.vox), atol=1e-6
    )
