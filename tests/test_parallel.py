"""Batched + sharded multi-sequence pipeline tests on the virtual 8-device
CPU mesh (SURVEY.md §4: multi-host logic tested via
--xla_force_host_platform_device_count)."""

import jax
import jax.numpy as jnp
import numpy as np

from infinitam_tpu.calib import default_calib
from infinitam_tpu.config import (
    SceneParams,
    Settings,
    TrackingParams,
    VoxelBlockHashParams,
)
from infinitam_tpu.engine.view_builder import View
from infinitam_tpu.io import synth
from infinitam_tpu.parallel import batch as pb
from infinitam_tpu.utils import se3

IMG = (48, 64)
SETTINGS = Settings(
    scene=SceneParams(voxel_size=0.025, mu=0.1, view_frustum_min=0.3, view_frustum_max=3.0),
    hashing=VoxelBlockHashParams(
        n_buckets=0x2000, n_excess=0x200, n_blocks=0x800, max_visible_blocks=0x400
    ),
    tracking=TrackingParams(n_levels=3, min_valid_points=50),
)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_batched_sharded_sequences_track():
    """4 sequences with different trajectories, sharded over the mesh, must
    all track within tolerance — and match the unbatched pipeline."""
    calib = default_calib(IMG[1], IMG[0])
    proj = jnp.asarray(calib.intrinsics_d.vector)
    B = 8
    mesh = pb.make_mesh(8)

    # per-sequence trajectories: scale the base trajectory differently
    trajs = [synth.make_trajectory(4, scale=0.5 + 0.15 * b) for b in range(B)]

    vol, rs, state = pb.batched_state_hash(SETTINGS, IMG, B)
    vol, rs, state = pb.shard_batch((vol, rs, state), mesh)
    step = pb.make_batched_step(SETTINGS, mesh=mesh)

    projs = jnp.tile(proj[None], (B, 1))
    for f in range(4):
        depths = jnp.stack(
            [synth.render_depth(jnp.asarray(trajs[b][f]), proj, IMG) for b in range(B)]
        )
        views = View(depth=depths)
        vol, rs, state, metrics = step(vol, rs, state, views, projs)

    # each lane tracked its own trajectory
    for b in range(B):
        gt = jnp.asarray(trajs[b][3])
        err = se3.se3_log(state.pose[b] @ se3.invert(gt))
        assert float(jnp.linalg.norm(err[:3])) < 0.02, (b, np.asarray(err))

    assert np.isfinite(float(metrics["mean_f"]))
    assert float(metrics["mean_valid"]) > 100
