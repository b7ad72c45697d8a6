"""Tracking state pytree (reference: ITMLib/Objects/ITMTrackingState.h:19)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class TrackingState(NamedTuple):
    pose: jnp.ndarray  # [4,4] world→camera (pose_d)
    points_map: jnp.ndarray  # [H,W,4] raycasted scene points, metres, w=±1
    normals_map: jnp.ndarray  # [H,W,4] scene normals ("colours" buffer in ref)
    pose_point_cloud: jnp.ndarray  # [4,4] pose at which the maps were raycast
    age: jnp.ndarray  # int32: −1 = fresh (no maps yet), counts frames since raycast
    f: jnp.ndarray  # last tracker energy (diagnostics / failure detection)
    num_valid: jnp.ndarray  # last tracker inlier count


def create_tracking_state(img_size: tuple[int, int]) -> TrackingState:
    H, W = img_size
    empty = jnp.concatenate(
        [jnp.zeros((H, W, 3), jnp.float32), -jnp.ones((H, W, 1), jnp.float32)], axis=-1
    )
    return TrackingState(
        pose=jnp.eye(4, dtype=jnp.float32),
        points_map=empty,
        normals_map=empty,
        pose_point_cloud=jnp.eye(4, dtype=jnp.float32),
        age=jnp.array(-1, dtype=jnp.int32),
        f=jnp.array(0.0, dtype=jnp.float32),
        num_valid=jnp.array(0, dtype=jnp.int32),
    )
