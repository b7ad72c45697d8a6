"""Per-tile page-count statistics for the raycast page lists (dev tool):
informs raycast_pages_per_tile (KP) — tap cost scales linearly with KP, and
far pages beyond KP drop (near-first order). Usage: page_stats.py [5mm]"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/itpu_jax_cache")

import jax.numpy as jnp
import numpy as np

from infinitam_tpu.calib import default_calib
from infinitam_tpu.engine import hash_pipeline as hp
from infinitam_tpu.engine.view_builder import View
from infinitam_tpu.io import synth
from infinitam_tpu.ops.pallas import raycast_kernel as rk


def main():
    import bench as B

    img = (480, 640)
    settings = B.reference_settings() if "5mm" in sys.argv else B.teddy_1cm_settings()
    calib = default_calib(img[1], img[0])
    proj = jnp.asarray(calib.intrinsics_d.vector)
    src = synth.SyntheticSource(calib, n_frames=8, img_size=img)
    vol, rs, state = hp.create_engine_state(settings, img)
    for i in range(8):
        depth, _rgb, _gt = src.get_images()
        vol, rs, state, diag = hp.process_frame_hash(
            vol, rs, state, View(depth=depth), proj, settings
        )
    sp, hh, gp = settings.scene, settings.hashing, settings.block_grid
    NP = settings.raycast_page_blocks
    ids = rs.visible_ids[:NP]
    ids_c = jnp.clip(ids, 0, hh.n_entries - 1)
    ptr = vol.entry_ptr[ids_c]
    bpos = vol.entry_pos[ids_c]
    valid = (ids >= 0) & (ptr >= 0)
    pr, pk, nov = rk.build_page_lists(
        bpos, jnp.where(valid, ptr, -1), valid, state.pose, proj, img,
        sp.voxel_size, block_size=hh.block_size,
        kp=settings.raycast_pages_per_tile,
        grid_dims=gp.dims, grid_origin=gp.origin,
        z_far=sp.view_frustum_max * 2.0,
    )
    counts = (np.asarray(pk) >= 0).sum(1)
    print(f"n_visible={int(rs.n_visible)} kp={settings.raycast_pages_per_tile} "
          f"overflow={int(nov)}")
    print(f"pages/tile: mean={counts.mean():.1f} p50={np.percentile(counts,50):.0f} "
          f"p90={np.percentile(counts,90):.0f} p99={np.percentile(counts,99):.0f} "
          f"max={counts.max()}")


if __name__ == "__main__":
    main()
