"""Real-TPU compile + timing probe for the Pallas raycast phase (dev tool)."""

import time

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


def timeit(name, fn, *args, n=10, **kw):
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

    for _ in range(2):
        vol, rs, state, diag = hp.process_frame_hash(
            vol, rs, state, View(depth=depth), proj, settings
        )
    jax.block_until_ready(state.pose)
    pose = state.pose

    ray_pl = jax.jit(lambda v, r: hp.raycast_hash_pallas(v, r, pose, proj, img, settings)[0])
    res = timeit("raycast_hash_pallas", ray_pl, vol, rs)
    found = jnp.mean((res.points[..., 3] > 0).astype(jnp.float32))
    print("found frac:", float(found))


if __name__ == "__main__":
    main()
