"""Per-phase TPU timing of the hash-pipeline frame step (dev tool)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/itpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from infinitam_tpu.calib import default_calib  # noqa: E402
from infinitam_tpu.config import (  # noqa: E402
    SceneParams,
    Settings,
    TrackingParams,
    VoxelBlockHashParams,
)
from infinitam_tpu.engine import hash_pipeline as hp  # noqa: E402
from infinitam_tpu.engine.view_builder import View  # noqa: E402
from infinitam_tpu.io import synth  # noqa: E402


def timeit(name, fn, *args, n=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:35s} {dt:9.2f} ms")
    return out


def main():
    img = (480, 640)
    settings = Settings(
        scene=SceneParams(voxel_size=0.01, mu=0.04, view_frustum_min=0.35, view_frustum_max=3.0),
        hashing=VoxelBlockHashParams(),
        tracking=TrackingParams(),
    )
    calib = default_calib(img[1], img[0])
    proj = jnp.asarray(calib.intrinsics_d.vector)
    src = synth.SyntheticSource(calib, n_frames=4, img_size=img)
    depth, _rgb, _gt = src.get_images()
    vol, rs, state = hp.create_engine_state(settings, img)

    # run two full frames first so the volume has content
    for _ in range(2):
        vol, rs, state, diag = hp.process_frame_hash(
            vol, rs, state, View(depth=depth), proj, settings
        )
    jax.block_until_ready(state.pose)

    pose = state.pose

    alloc = jax.jit(lambda v, r: hp.allocate_scene_from_depth(v, r, depth, pose, proj, settings))
    vol2, rs2, _ovf = timeit("allocate_scene_from_depth", alloc, vol, rs)

    integ = jax.jit(
        lambda v, r: hp.integrate_into_scene(v, r, View(depth=depth), pose, proj, settings)
    )
    timeit("integrate_into_scene", integ, vol2, rs2)

    edr = jax.jit(
        lambda v, r: hp.expected_depth_ranges(v, r, pose, proj, img, settings)
    )
    try:
        rngs = timeit("expected_depth_ranges", edr, vol2, rs2)
    except TypeError:
        rngs = None
        print("expected_depth_ranges: signature mismatch, skipping")

    rcast = jax.jit(lambda v, r: hp.raycast_hash(v, r, pose, proj, img, settings))
    timeit("raycast_hash", rcast, vol2, rs2)

    from infinitam_tpu.engine.trackers import track_depth

    trk = jax.jit(
        lambda p, d, pm, nm, sp: track_depth(
            p, d, proj, pm, nm, sp, settings.tracking
        ).pose
    )
    timeit(
        "track_depth",
        trk,
        state.pose,
        depth,
        state.points_map,
        state.normals_map,
        state.pose_point_cloud,
    )

    full = jax.jit(
        lambda v, r, s: hp.process_frame_hash(v, r, s, View(depth=depth), proj, settings)
    )
    timeit("FULL process_frame_hash", full, vol, rs, state, n=3)


if __name__ == "__main__":
    main()
