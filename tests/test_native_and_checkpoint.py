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


def test_checkpoint_rejects_sentinel_violation(tmp_path):
    """A snapshot whose hash points at the reserved sentinel VBA row must
    fail loudly on load (it would re-enable the Pallas integrate
    lost-update hazard)."""
    calib = default_calib(IMG[1], IMG[0])
    eng = MainEngine(SETTINGS, calib, IMG)
    src = synth.SyntheticSource(calib, n_frames=2, img_size=IMG)
    for _ in range(2):
        d, _r, _g = src.get_images()
        eng.process_frame(metric_depth=d)
    # corrupt: alias one allocated entry onto the sentinel row
    sent = SETTINGS.hashing.n_blocks - 1
    ptr = np.asarray(eng.vol.entry_ptr).copy()
    alloc = np.nonzero(ptr >= 0)[0]
    ptr[alloc[0]] = sent
    eng.vol = eng.vol._replace(entry_ptr=jnp.asarray(ptr))
    path = os.path.join(tmp_path, "bad.npz")
    ckpt.save_engine(path, eng)
    eng2 = MainEngine(SETTINGS, calib, IMG)
    with pytest.raises(ValueError, match="sentinel"):
        ckpt.load_engine(path, eng2)


def test_checkpoint_migrates_missing_cache_leaves(tmp_path):
    """Snapshots from a build WITHOUT the accelerator caches / epoch planes
    must load: missing leaves keep defaults, caches rebuild from the hash
    (load-time migration instead of a KeyError)."""
    calib = default_calib(IMG[1], IMG[0])
    eng = MainEngine(SETTINGS, calib, IMG)
    src = synth.SyntheticSource(calib, n_frames=4, img_size=IMG)
    frames = [src.get_images() for _ in range(4)]
    for d, _r, _g in frames[:2]:
        eng.process_frame(metric_depth=d)

    # simulate an old-format snapshot: drop the cache/epoch leaves
    path = os.path.join(tmp_path, "old.npz")
    ckpt.save_engine(path, eng)
    z = dict(np.load(path))
    import json

    meta = json.loads(bytes(z["__meta__"]).decode())
    keep = [
        (i, n) for i, n in enumerate(meta["__names__"])
        if not any(t in n for t in ("entry_grid", "block_grid", "cell_claim",
                                    "entry_epoch", "epoch"))
    ]
    arrays = {f"leaf_{j}": z[f"leaf_{i}"] for j, (i, _n) in enumerate(keep)}
    meta["__names__"] = [n for _i, n in keep]
    arrays["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)

    eng2 = MainEngine(SETTINGS, calib, IMG)
    ckpt.load_engine(path, eng2)
    # caches were rebuilt: continuing must track normally
    for d, _r, _g in frames[2:]:
        diag = eng2.process_frame(metric_depth=d)
    assert diag["num_valid"] > 500
    # rebuilt caches equal the from-scratch rebuild
    from infinitam_tpu.engine import hash_volume as hv

    ref = hv.refresh_caches(eng2.vol, SETTINGS.block_grid)
    np.testing.assert_array_equal(
        np.asarray(eng2.vol.entry_grid), np.asarray(ref.entry_grid)
    )
