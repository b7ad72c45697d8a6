"""Raycast kernel fixed-cost isolation via debug_skip (dev tool).

Times raycast_tiles directly (single KP=24 launch over all tiles, t_march=1
so the march is ~free) with components knocked out, to attribute the fixed
per-tile cost: DMA (start overhead + bandwidth), the serial unpack loop,
and the trilinear refinement.
"""

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
from infinitam_tpu.engine import hash_pipeline as hp  # noqa: E402
from infinitam_tpu.engine.view_builder import View  # noqa: E402
from infinitam_tpu.io import synth  # noqa: E402
from infinitam_tpu.ops.pallas import raycast_kernel as rk  # noqa: E402
from infinitam_tpu.utils import se3  # noqa: E402

R = 20


def timeloop(name, body):
    fn = jax.jit(lambda c: jax.lax.fori_loop(0, R, lambda i, c: body(c), c))
    out = fn(jnp.float32(0.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(jnp.float32(0.0))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / R * 1000
    print(f"{name:44s} {dt:9.2f} ms")
    return dt


def main():
    import bench as B

    img = (480, 640)
    settings = B.reference_settings()
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
    pose0 = state.pose

    sp = settings.scene
    hpar = settings.hashing
    gp = settings.block_grid
    NP = settings.raycast_page_blocks
    ids = rs.visible_ids[:NP]
    ids_c = jnp.clip(ids, 0, hpar.n_entries - 1)
    ptr = vol.entry_ptr[ids_c]
    bpos = (
        vol.entry_pos[:, 0][ids_c],
        vol.entry_pos[:, 1][ids_c],
        vol.entry_pos[:, 2][ids_c],
    )
    valid = (ids >= 0) & (ptr >= 0)
    KP = 24
    page_rows, page_key, _ovf = rk.build_page_lists(
        bpos, jnp.where(valid, ptr, -1), valid, pose0, proj, img,
        sp.voxel_size, block_size=hpar.block_size, kp=KP,
        grid_dims=gp.dims, grid_origin=gp.origin,
        z_far=sp.view_frustum_max * 2.0,
    )
    H, W = img

    def mk(t_march, skip):
        def body(acc):
            cam = rk.make_cam_scalars(
                se3.invert(pose0 + acc * 1e-32), proj,
                sp.view_frustum_min, sp.view_frustum_max, sp.voxel_size,
            )
            out = rk.raycast_tiles(
                page_rows, page_key, cam, vol.vox,
                t_march=t_march, step_scale=sp.mu / sp.voxel_size,
                grid_dims=gp.dims, grid_origin=gp.origin,
                tiles_w=W // rk.TILE, block_size=hpar.block_size,
                debug_skip=skip,
            )
            return out[0, 0, 0] * 1e-20 + acc * 1e-20
        return body

    timeloop("KP=24 t=64 full", mk(64, ()))
    timeloop("KP=24 t=1  full", mk(1, ()))
    timeloop("KP=24 t=1  -tri", mk(1, ("tri",)))
    timeloop("KP=24 t=1  -tri -unpack", mk(1, ("tri", "unpack")))
    timeloop("KP=24 t=1  -tri -unpack -dma", mk(1, ("tri", "unpack", "dma")))
    timeloop("KP=24 t=64 -tri", mk(64, ("tri",)))
    timeloop("KP=24 t=64 -dma(unpack stays)", mk(64, ("dma",)))


if __name__ == "__main__":
    main()
