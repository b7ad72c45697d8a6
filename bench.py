"""Benchmark: fused+tracked 640×480 frames/s/chip on a Teddy-like replay.

Runs the flagship voxel-block-hash pipeline at the reference's default
operating point (640×480 depth, 5-level ICP pyramid; reference:
ITMLibSettings.cpp:10) over a synthetic Teddy-like sequence (the reference
repo ships only Teddy's calibration, not its frames — SURVEY.md §6), on the
real TPU. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N/100}
vs_baseline is against BASELINE.json's ≥100 fps/chip target.
"""

import json
import sys
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
from infinitam_tpu.utils import se3  # noqa: E402


def main():
    img = (480, 640)
    # Teddy-scale operating point on the synthetic scene: the scene spans
    # ~3 m; voxel 1 cm / mu 4 cm keeps the same mu/voxel ratio (4) as the
    # reference default (5 mm / 2 cm) at a volume the synthetic scene fills.
    settings = Settings(
        scene=SceneParams(voxel_size=0.01, mu=0.04, view_frustum_min=0.35, view_frustum_max=3.0),
        hashing=VoxelBlockHashParams(),  # full reference capacities
        tracking=TrackingParams(),  # 5-level pyramid, reference iteration counts
    )
    calib = default_calib(img[1], img[0])
    proj = jnp.asarray(calib.intrinsics_d.vector)

    n_frames = 30
    src = synth.SyntheticSource(calib, n_frames=n_frames, img_size=img)
    frames = [src.get_images() for _ in range(n_frames)]

    vol, rs, state = hp.create_engine_state(settings, img)

    # warmup: compile + first two frames
    for depth, _rgb, _gt in frames[:2]:
        vol, rs, state, diag = hp.process_frame_hash(
            vol, rs, state, View(depth=depth), proj, settings
        )
    jax.block_until_ready(state.pose)

    est_poses = [state.pose]  # device arrays; converted only after the clock stops
    t0 = time.perf_counter()
    for depth, _rgb, _gt in frames[2:]:
        vol, rs, state, diag = hp.process_frame_hash(
            vol, rs, state, View(depth=depth), proj, settings
        )
        est_poses.append(state.pose)
    jax.block_until_ready(state.pose)
    dt = time.perf_counter() - t0
    fps = (n_frames - 2) / dt

    # Accuracy gate: full-trajectory ATE-RMSE vs ground truth at the 1 cm bar
    # (BASELINE.md: "ATE within 1 cm of reference trajectory"; the synthetic
    # sequence's exact ground truth stands in for the reference trajectory —
    # the reference repo ships no Teddy frames to replay).
    import numpy as np

    errs = []
    for est, (_d, _r, gt) in zip(est_poses, frames[1:]):
        c_est = np.asarray(se3.invert(est))[:3, 3]
        c_gt = np.asarray(se3.invert(jnp.asarray(gt)))[:3, 3]
        errs.append(np.sum((c_est - c_gt) ** 2))
    ate_rmse = float(np.sqrt(np.mean(errs)))

    # silent-cap hygiene (SURVEY §5): report the graceful-degradation counters
    # of the LAST frame on stderr (stdout stays the single JSON line)
    print(
        "diag(last frame): "
        + " ".join(
            f"{k}={int(getattr(diag, k))}"
            for k in (
                "n_visible",
                "n_alloc_overflow",
                "n_render_overflow",
                "n_pool_overflow",
                "n_too_big_blocks",
                "n_window_clipped",
            )
        ),
        file=sys.stderr,
    )

    diverged = not (ate_rmse < 0.01)
    print(
        json.dumps(
            {
                "metric": "fused+tracked 640x480 frames/s/chip"
                + (" (ATE>1cm: FAILED)" if diverged else ""),
                "value": 0.0 if diverged else round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": 0.0 if diverged else round(fps / 100.0, 3),
                "ate_rmse_m": round(ate_rmse, 5),
            }
        )
    )


if __name__ == "__main__":
    main()
