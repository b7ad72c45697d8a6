"""Round-3 probe: per-sub-step cost of allocate_scene_from_depth on-chip."""

import time

import jax

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/itpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from infinitam_tpu.calib import default_calib  # noqa: E402
from infinitam_tpu.config import SceneParams, Settings, TrackingParams, VoxelBlockHashParams  # noqa: E402
from infinitam_tpu.engine import hash_pipeline as hp  # noqa: E402
from infinitam_tpu.engine import hash_volume as hv  # noqa: E402
from infinitam_tpu.engine.view_builder import View  # noqa: E402
from infinitam_tpu.io import synth  # noqa: E402
from infinitam_tpu.ops import hashing  # noqa: E402
from infinitam_tpu.utils import se3  # noqa: E402


def timeit(name, fn, *args, n=10, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:42s} {dt:9.2f} ms")
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
    sp, hpp = settings.scene, settings.hashing
    gp = settings.block_grid
    E = hpp.n_entries

    s = settings.alloc_subsample
    depth_a = depth[::s, ::s]
    proj_a = proj / s

    dda = jax.jit(lambda d, p: hashing.blocks_on_ray_segment(
        d, proj_a, se3.invert(p), sp.mu, sp.voxel_size, hpp.block_size,
        hp.MAX_BAND_STEPS, sp.view_frustum_min, sp.view_frustum_max))
    blocks, bvalid = timeit("blocks_on_ray_segment (DDA)", dda, depth_a, pose)

    cand = blocks.reshape(-1, 3)
    cand_valid = bvalid.reshape(-1)

    def tap_and_mark(vt, cand, cand_valid):
        cell, inb = hv.grid_cell(cand, gp)
        G3 = vol.entry_grid.shape[0]
        code = vol.entry_grid[jnp.clip(cell, 0, G3 - 1)]
        known = cand_valid & inb & (code >= 0)
        eidx = code >> 1
        vis_val = jnp.where((code & 1) == 1, hv.VT_VISIBLE_SWAPPED, hv.VT_VISIBLE)
        vt = vt.at[jnp.where(known, eidx, E)].set(jnp.where(known, vis_val, 0), mode="drop")
        return vt

    vt0 = jnp.zeros((E,), jnp.int32)
    timeit("entry-grid tap + visible mark", jax.jit(tap_and_mark), vt0, cand, cand_valid)

    def want_plane(cand, cand_valid):
        cell, inb = hv.grid_cell(cand, gp)
        G3 = vol.entry_grid.shape[0]
        code = vol.entry_grid[jnp.clip(cell, 0, G3 - 1)]
        want_at = jnp.where(cand_valid & inb & (code < 0), cell, G3)
        want = jnp.zeros((G3 + 1,), jnp.bool_).at[want_at].set(True, mode="drop")
        ncell = jnp.nonzero(want[:G3], size=settings.max_alloc_blocks, fill_value=-1)[0]
        return ncell

    timeit("want-plane scatter + nonzero(G3)", jax.jit(want_plane), cand, cand_valid)

    spv = jax.jit(lambda r: hv.set_previous_visible(r))
    vt_prev = timeit("set_previous_visible", spv, rs)

    bvl = jax.jit(lambda v, t: hv.build_visible_list(
        v, t, pose, proj, img, sp.voxel_size, hpp, prev_ids=rs.visible_ids))
    timeit("build_visible_list (compact)", bvl, vol, vt_prev)

    alloc = jax.jit(lambda v, r, p: hp.allocate_scene_from_depth(
        v, r, depth, p, proj, settings))
    timeit("allocate_scene_from_depth FULL", alloc, vol, rs, pose)


if __name__ == "__main__":
    main()
