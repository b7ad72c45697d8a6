"""Raycast cost decomposition at the 5 mm operating point (dev tool).

Times raycast_hash_pallas variants inside a carry-perturbed fori_loop
(LICM-proof, dispatch-overhead-free): full, t_march-swept, single-tier,
and page-list-only, to attribute kernel time to march steps vs fixed
per-tile costs (DMA, slab setup, trilinear refinement).
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
    base = B.reference_settings()
    calib = default_calib(img[1], img[0])
    proj = jnp.asarray(calib.intrinsics_d.vector)
    src = synth.SyntheticSource(calib, n_frames=4, img_size=img)
    depth, _rgb, _gt = src.get_images()
    vol, rs, state = hp.create_engine_state(base, img)
    for _ in range(2):
        vol, rs, state, diag = hp.process_frame_hash(
            vol, rs, state, View(depth=depth), proj, base
        )
    jax.block_until_ready(state.pose)
    pose0 = state.pose
    print(f"n_visible={int(rs.n_visible)}")

    def mk(settings):
        def body(acc):
            res, _ovf = hp.raycast_hash_pallas(
                vol, rs, pose0 + acc * 1e-32, proj, img, settings
            )
            return res.points[0, 0, 0] * 1e-20 + acc * 1e-20
        return body

    timeloop("full (tiered 24/64, t_march=64)", mk(base))
    timeloop("t_march=32", mk(base.replace(raycast_t_march=32)))
    timeloop("t_march=8", mk(base.replace(raycast_t_march=8)))
    timeloop("t_march=1", mk(base.replace(raycast_t_march=1)))
    timeloop("single tier KP=64", mk(base.replace(raycast_pages_small=0)))
    timeloop("single tier KP=64 t_march=1",
             mk(base.replace(raycast_pages_small=0, raycast_t_march=1)))
    timeloop("tiered 16/64", mk(base.replace(raycast_pages_small=16)))
    timeloop("tiered 32/64", mk(base.replace(raycast_pages_small=32)))


if __name__ == "__main__":
    main()
