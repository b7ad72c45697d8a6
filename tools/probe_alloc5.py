"""Round-5 dev probe: where does allocate_scene_from_depth's time go at the
5 mm operating point? Times each internal piece in a carry-chained fori_loop
(same methodology as profile_phases2)."""

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
from infinitam_tpu.engine import hash_volume as hv  # noqa: E402
from infinitam_tpu.engine.view_builder import View  # noqa: E402
from infinitam_tpu.io import synth  # noqa: E402
from infinitam_tpu.ops import hashing  # noqa: E402
from infinitam_tpu.utils import se3  # noqa: E402

R = 20


def timeloop(name, body, init):
    fn = jax.jit(lambda c: jax.lax.fori_loop(0, R, lambda i, c: body(c), c))
    out = fn(init)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(init)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / R * 1000
    print(f"{name:40s} {dt:9.3f} ms")
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
    pose = state.pose
    sp = settings.scene
    hpar = settings.hashing
    gp = settings.block_grid
    gx, gy, gz = gp.dims
    G3 = gx * gy * gz
    E = hpar.n_entries
    Vcap = hpar.max_visible_blocks
    s = settings.alloc_subsample
    depth_a = depth[::s, ::s]
    proj_a = proj / s
    print(f"G3={G3} Vcap={Vcap} n_visible={int(rs.n_visible)} "
          f"cand={(img[0]//s)*(img[1]//s)*hp.MAX_BAND_STEPS}")

    def dda(c):
        acc, = c
        cbx, cby, cbz, cval = hashing.blocks_on_ray_segment_planes(
            depth_a, proj_a, se3.invert(pose), sp.mu, sp.voxel_size,
            hpar.block_size, hp.MAX_BAND_STEPS, sp.view_frustum_min,
            sp.view_frustum_max,
        )
        return (acc + jnp.sum(cbx) * 0 + jnp.sum(cval),)

    timeloop("DDA candidates", dda, (jnp.int32(0),))

    cbx, cby, cbz, cval = hashing.blocks_on_ray_segment_planes(
        depth_a, proj_a, se3.invert(pose), sp.mu, sp.voxel_size,
        hpar.block_size, hp.MAX_BAND_STEPS, sp.view_frustum_min,
        sp.view_frustum_max,
    )
    cbx = cbx.reshape(-1); cby = cby.reshape(-1); cbz = cbz.reshape(-1)
    cval = cval.reshape(-1)
    ox, oy, oz = gp.origin
    gxc = cbx - ox; gyc = cby - oy; gzc = cbz - oz
    in_grid = ((gxc >= 0) & (gxc < gx) & (gyc >= 0) & (gyc < gy)
               & (gzc >= 0) & (gzc < gz))
    cell = (gxc * gy + gyc) * gz + gzc
    C = cell.shape[0]

    def scatter_epoch(c):
        ce, ep = c
        ep = ep + 1
        ce = ce.at[jnp.where(cval & in_grid, cell, G3)].set(ep, mode="drop")
        return ce, ep

    timeloop("epoch scatter [G3]", scatter_epoch,
             (rs.cell_epoch, rs.epoch))

    def scatter_claim(c):
        cc, acc = c
        iota = jnp.arange(C, dtype=jnp.int32)
        cc = cc.at[jnp.where(cval & in_grid, cell, G3)].set(iota, mode="drop")
        win = cval & in_grid & (cc[jnp.clip(cell, 0, G3 - 1)] == iota)
        return cc, acc + jnp.sum(win)

    timeloop("claim scatter + winner gather [G3/C]", scatter_claim,
             (jnp.zeros((G3 + 1,), jnp.int32), jnp.int32(0)))

    def known_scan(c):
        acc, = c
        touched = rs.cell_epoch == rs.epoch
        known = touched & (vol.entry_grid >= 0)
        kcell = jnp.nonzero(known, size=Vcap, fill_value=-1)[0]
        return (acc + kcell[0],)

    timeloop("touched+known compare + nonzero [G3]", known_scan, (jnp.int32(0),))

    def want_scan(c):
        acc, = c
        touched = rs.cell_epoch == rs.epoch
        want = touched & (vol.entry_grid < 0)
        return (acc + jnp.sum(want),)

    timeloop("want compare + sum [G3]", want_scan, (jnp.int32(0),))

    def nz_c(c):
        acc, = c
        win = cval & in_grid
        sel = jnp.nonzero(win, size=Vcap, fill_value=-1)[0]
        return (acc + sel[0],)

    timeloop(f"nonzero over candidates [C={C}]", nz_c, (jnp.int32(0),))

    def cumsum_compact_c(c):
        acc, = c
        win = cval & in_grid
        pos = jnp.cumsum(win.astype(jnp.int32)) - 1
        out = jnp.full((Vcap,), -1, jnp.int32).at[
            jnp.where(win & (pos < Vcap), pos, Vcap)
        ].set(cell, mode="drop")
        return (acc + out[0],)

    timeloop(f"cumsum-compact over candidates [C={C}]", cumsum_compact_c,
             (jnp.int32(0),))

    def prev_recheck(c):
        acc, = c
        pid = rs.visible_ids
        pidc = jnp.clip(pid, 0, E - 1)
        ppos = vol.entry_pos[pidc]
        pvis = hv.check_block_visibility(
            ppos, pose, proj, img, sp.voxel_size, hpar.block_size)
        return (acc + jnp.sum(pvis),)

    timeloop("prev-visible recheck [Vcap]", prev_recheck, (jnp.int32(0),))

    def final_concat(c):
        acc, = c
        a = jnp.concatenate([jnp.arange(Vcap), jnp.arange(Vcap),
                             jnp.arange(hp.OOG_CAP)]).astype(jnp.int32)
        m = a < E
        pos = jnp.nonzero(m, size=Vcap, fill_value=-1)[0]
        return (acc + pos[0],)

    timeloop("final concat + nonzero [2Vcap+OOG]", final_concat, (jnp.int32(0),))


if __name__ == "__main__":
    main()
