"""Per-phase TPU timing, immune to the axon per-dispatch overhead: each
phase runs R times inside ONE jitted lax.fori_loop (carry-chained so nothing
is DCE'd), so the reported ms is pure device time (dev tool).

Usage: python tools/profile_phases2.py [5mm]
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

R = 20


def timeloop(name, body, init):
    """body: carry -> carry. Times R iterations inside one jit."""
    fn = jax.jit(lambda c: jax.lax.fori_loop(0, R, lambda i, c: body(c), c))
    out = fn(init)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(init)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / R * 1000
    print(f"{name:34s} {dt:9.2f} ms")
    return dt


def main():
    import bench as B

    img = (480, 640)
    settings = (
        B.reference_settings() if "5mm" in sys.argv else B.teddy_1cm_settings()
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
    print(f"config: voxel {settings.scene.voxel_size*1000:.0f} mm, "
          f"n_visible={int(rs.n_visible)}")

    timeloop(
        "allocate_scene_from_depth",
        lambda c: hp.allocate_scene_from_depth(c[0], c[1], depth, pose, proj, settings)[:2],
        (vol, rs),
    )
    timeloop(
        "integrate_into_scene",
        lambda v: hp.integrate_into_scene(v, rs, View(depth=depth), pose, proj, settings),
        vol,
    )

    def rc_body(c):
        v, acc = c
        res = hp.raycast_hash(v, rs, pose, proj, img, settings)
        return v, acc + res.points[0, 0, 0] * 1e-20

    timeloop("raycast_hash (pagelist+kernel)", rc_body, (vol, jnp.float32(0.0)))

    from infinitam_tpu.engine.trackers import track_depth

    def trk_body(c):
        p, acc = c
        tr = track_depth(
            p, depth, proj, state.points_map, state.normals_map,
            state.pose_point_cloud, settings.tracking,
        )
        return p, acc + tr.pose[0, 0] * 1e-20

    timeloop("track_depth", trk_body, (pose, jnp.float32(0.0)))

    # --- glue attribution (VERDICT r4 item 4) ------------------------------
    from infinitam_tpu.ops.pallas import raycast_kernel as rk
    from infinitam_tpu.utils import se3

    sp = settings.scene
    hpar = settings.hashing
    gp = settings.block_grid
    NP = settings.raycast_page_blocks
    ids = rs.visible_ids[:NP]
    ids_c = jnp.clip(ids, 0, hpar.n_entries - 1)
    ptr = vol.entry_ptr[ids_c]
    bpos = vol.entry_pos[ids_c]
    valid = (ids >= 0) & (ptr >= 0)

    def bpl_body(c):
        acc, = c
        pr, pk, ov = rk.build_page_lists(
            bpos, jnp.where(valid, ptr, -1), valid, pose, proj, img,
            sp.voxel_size, block_size=hpar.block_size,
            kp=settings.raycast_pages_per_tile,
            grid_dims=gp.dims, grid_origin=gp.origin,
            z_far=sp.view_frustum_max * 2.0,
        )
        return (acc + pr[0, 0] + ov,)

    timeloop("  raycast: build_page_lists", bpl_body, (jnp.int32(0),))

    def icpmaps_body(c):
        acc, = c
        res = hp.raycast_hash(vol, rs, pose, proj, img, settings)
        from infinitam_tpu.ops import raycast as rcops
        pm, nm = rcops.make_icp_maps(res, sp.voxel_size, se3.invert(pose))
        return (acc + pm[0, 0, 0] * 1e-20,)

    timeloop("  raycast+make_icp_maps", icpmaps_body, (jnp.float32(0.0),))

    def frame_body(c):
        v, r, s = c
        v, r, s, _ = hp.process_frame_hash(v, r, s, View(depth=depth), proj, settings)
        return v, r, s

    timeloop("FULL process_frame_hash", frame_body, (vol, rs, state))


if __name__ == "__main__":
    main()
