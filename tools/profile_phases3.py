"""Per-phase TPU timing v3: immune to BOTH the axon per-dispatch overhead
AND loop-invariant code motion. Each phase runs R times inside ONE jitted
lax.fori_loop, and the phase's pose input is perturbed by the loop-carried
accumulator (pose + acc*1e-32), so XLA cannot hoist the phase body out of
the loop (the v2 harness's raycast/track numbers were hoisted → read ~0).

Usage: python tools/profile_phases3.py [5mm]
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
from infinitam_tpu.utils import se3  # noqa: E402

R = 20


def timeloop(name, body):
    """body: (pose, acc) -> acc. Times R iterations inside one jit; pose is
    re-derived from acc each iteration so the body cannot be hoisted."""
    def step(i, c):
        acc = c
        return body(acc)

    fn = jax.jit(lambda c: jax.lax.fori_loop(0, R, step, c))
    out = fn(jnp.float32(0.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(jnp.float32(0.0))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / R * 1000
    print(f"{name:36s} {dt:9.2f} ms")
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
    pose0 = state.pose
    print(f"config: voxel {settings.scene.voxel_size*1000:.0f} mm, "
          f"n_visible={int(rs.n_visible)}")

    def perturbed(acc):
        return pose0 + acc * 1e-32

    timeloop(
        "allocate_scene_from_depth",
        lambda acc: hp.allocate_scene_from_depth(
            vol, rs, depth, perturbed(acc), proj, settings
        )[1].n_visible.astype(jnp.float32) * 1e-20 + acc * 1e-20,
    )
    timeloop(
        "integrate_into_scene",
        lambda acc: hp.integrate_into_scene(
            vol, rs, View(depth=depth), perturbed(acc), proj, settings
        ).vox[0, 0].astype(jnp.float32) * 1e-20 + acc * 1e-20,
    )

    from infinitam_tpu.ops.pallas import raycast_kernel as rk

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

    def bpl_body(acc):
        pr, pk, ov = rk.build_page_lists(
            bpos, jnp.where(valid, ptr, -1), valid, perturbed(acc), proj, img,
            sp.voxel_size, block_size=hpar.block_size,
            kp=settings.raycast_pages_per_tile,
            grid_dims=gp.dims, grid_origin=gp.origin,
            z_far=sp.view_frustum_max * 2.0,
        )
        return jnp.float32(pr[0, 0]) * 1e-20 + jnp.float32(ov) * 1e-20 + acc * 1e-20

    timeloop("  raycast: build_page_lists", bpl_body)

    def rc_full_body(acc):
        res, _ovf = hp.raycast_hash_pallas(
            vol, rs, perturbed(acc), proj, img, settings
        ) if jax.default_backend() == "tpu" else (
            hp.raycast_hash(vol, rs, perturbed(acc), proj, img, settings), 0
        )
        return res.points[0, 0, 0] * 1e-20 + acc * 1e-20

    timeloop("raycast total (pagelists+kernel)", rc_full_body)

    def icp_maps_body(acc):
        res = hp.raycast_hash(vol, rs, perturbed(acc), proj, img, settings)
        from infinitam_tpu.ops import raycast as rcops

        pm, nm = rcops.make_icp_maps(res, sp.voxel_size, se3.invert(perturbed(acc)))
        return pm[0, 0, 0] * 1e-20 + acc * 1e-20

    timeloop("raycast + make_icp_maps", icp_maps_body)

    from infinitam_tpu.engine.trackers import track_depth

    def trk_body(acc):
        tr = track_depth(
            perturbed(acc), depth, proj, state.points_map, state.normals_map,
            state.pose_point_cloud, settings.tracking,
        )
        return tr.pose[0, 0] * 1e-20 + acc * 1e-20

    timeloop("track_depth", trk_body)

    def frame_body(acc):
        v2, r2, s2, _ = hp.process_frame_hash(
            vol, rs, state._replace(pose=perturbed(acc)), View(depth=depth),
            proj, settings,
        )
        return s2.pose[0, 0] * 1e-20 + acc * 1e-20

    timeloop("FULL process_frame_hash", frame_body)


if __name__ == "__main__":
    main()
