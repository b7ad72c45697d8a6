"""How much page-DMA would 8-row-group dedup save? (dev analysis tool)

The raycast kernel fetches the aligned 8-row VBA group (16 KB) around each
page's row and uses one 2 KB row. If several pages of a tile share a group
(spatially adjacent blocks allocate nearby rows), fetching unique groups
once would cut the traffic. Prints pages/tile vs unique-groups/tile at the
5 mm bench state.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/itpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from infinitam_tpu.calib import default_calib  # noqa: E402
from infinitam_tpu.engine import hash_pipeline as hp  # noqa: E402
from infinitam_tpu.engine.view_builder import View  # noqa: E402
from infinitam_tpu.io import synth  # noqa: E402
from infinitam_tpu.ops.pallas import raycast_kernel as rk  # noqa: E402
from infinitam_tpu.utils import se3  # noqa: E402


def main():
    import bench as B

    img = (480, 640)
    settings = B.reference_settings()
    calib = default_calib(img[1], img[0])
    proj = jnp.asarray(calib.intrinsics_d.vector)
    src = synth.SyntheticSource(calib, n_frames=10, img_size=img)
    vol, rs, state = hp.create_engine_state(settings, img)
    for _ in range(8):
        depth, _rgb, _gt = src.get_images()
        vol, rs, state, diag = hp.process_frame_hash(
            vol, rs, state, View(depth=depth), proj, settings
        )
    jax.block_until_ready(state.pose)

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
    page_rows, page_key, _ovf = rk.build_page_lists(
        bpos, jnp.where(valid, ptr, -1), valid, state.pose, proj, img,
        sp.voxel_size, block_size=hpar.block_size,
        kp=settings.raycast_pages_per_tile,
        grid_dims=gp.dims, grid_origin=gp.origin,
        z_far=sp.view_frustum_max * 2.0,
    )
    pr = np.asarray(page_rows)  # [NT, KP]
    n_pages = (pr >= 0).sum(axis=1)
    groups = np.where(pr >= 0, pr >> 3, -1)
    n_groups = np.array([len(np.unique(g[g >= 0])) for g in groups])
    live = n_pages > 0
    print(f"tiles live {live.sum()}/{len(pr)}")
    print(f"pages/tile   mean {n_pages[live].mean():.1f} p80 "
          f"{np.percentile(n_pages[live], 80):.0f} max {n_pages.max()}")
    print(f"groups/tile  mean {n_groups[live].mean():.1f} p80 "
          f"{np.percentile(n_groups[live], 80):.0f} max {n_groups.max()}")
    print(f"total pages {n_pages.sum()}  total groups {n_groups.sum()}  "
          f"dedup x{n_pages.sum()/max(n_groups.sum(),1):.2f}")
    tot_mb = n_pages.sum() * 16 / 1024
    ded_mb = n_groups.sum() * 16 / 1024
    print(f"DMA/frame: now {tot_mb:.0f} MB -> dedup {ded_mb:.0f} MB")


if __name__ == "__main__":
    main()
