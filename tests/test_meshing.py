"""Marching-cubes meshing tests: extract a fused sphere, validate geometry,
and round-trip OBJ/STL export (reference: ITMMeshingEngine + ITMMesh)."""

import os

import jax.numpy as jnp
import numpy as np

from infinitam_tpu.calib import default_calib
from infinitam_tpu.config import (
    SceneParams,
    Settings,
    TrackingParams,
    VoxelBlockHashParams,
)
from infinitam_tpu.engine import hash_pipeline as hp
from infinitam_tpu.engine import meshing_engine as me
from infinitam_tpu.engine.view_builder import View
from infinitam_tpu.io import synth

IMG = (60, 80)
SETTINGS = Settings(
    scene=SceneParams(voxel_size=0.025, mu=0.1, view_frustum_min=0.3, view_frustum_max=3.0),
    hashing=VoxelBlockHashParams(
        n_buckets=0x4000, n_excess=0x400, n_blocks=0x1800, max_visible_blocks=0x1000
    ),
    tracking=TrackingParams(n_levels=3, min_valid_points=50),
)


def _fused_vol():
    calib = default_calib(IMG[1], IMG[0])
    proj = jnp.asarray(calib.intrinsics_d.vector)
    depth = synth.render_depth(jnp.eye(4), proj, IMG)
    vol, rs, state = hp.create_engine_state(SETTINGS, IMG)
    vol, rs, state, _ = hp.process_frame_hash(vol, rs, state, View(depth=depth), proj, SETTINGS)
    return vol


def test_mesh_extraction_geometry(tmp_path):
    vol = _fused_vol()
    mesh = me.mesh_scene_hash(vol, SETTINGS)
    assert mesh.n_triangles > 500

    tris = mesh.triangles
    # triangles must be non-degenerate and inside the observed scene bounds
    areas = 0.5 * np.linalg.norm(
        np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]), axis=-1
    )
    assert (areas > 0).mean() > 0.95
    assert tris[..., 2].min() > 0.5 and tris[..., 2].max() < 2.6

    # vertices near the main sphere should lie close to its surface
    center = np.array([0.0, 0.1, 1.5])
    d = np.linalg.norm(tris.reshape(-1, 3) - center, axis=-1)
    near = d < 0.45
    assert near.sum() > 100
    sphere_err = np.abs(d[near] - 0.35)
    assert np.median(sphere_err) < 0.02  # within ~a voxel of the true sphere

    # export round-trips
    obj_path = os.path.join(tmp_path, "scene.obj")
    stl_path = os.path.join(tmp_path, "scene.stl")
    mesh.write_obj(obj_path)
    mesh.write_stl(stl_path)
    with open(obj_path) as f:
        lines = f.read().strip().split("\n")
    assert sum(1 for l in lines if l.startswith("v ")) == mesh.n_triangles * 3
    stl = open(stl_path, "rb").read()
    import struct

    assert struct.unpack("<I", stl[80:84])[0] == mesh.n_triangles
    assert len(stl) == 84 + mesh.n_triangles * 50
