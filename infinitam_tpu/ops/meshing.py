"""Marching-cubes surface extraction from the TSDF.

Reference parity: DeviceAgnostic/ITMMeshingEngine.h:154-233
(findPointNeighbors corner order, buildVertList edge interpolation, the
any-corner-missing / sdf==1 gate) and ITMMeshingEngine_CUDA.cu:17-113 (per
visible block × 8³ voxel grid, atomic triangle append → here: fixed-capacity
buffers + nonzero compaction).

The hot loop is vectorized per chunk of blocks; meshing is a cold path
(user-triggered UpdateMesh in the reference) so clarity wins over kernels.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from infinitam_tpu.ops import mc_tables as mt
from infinitam_tpu.ops.voxel_access import ReadFn


def _corner_reads(read: ReadFn, gvox: jnp.ndarray):
    """SDF + found at the 8 cube corners of each voxel. gvox: [..., 3] int32.
    Returns (sdf [..., 8], ok [...])."""
    sdfs = []
    ok = None
    for c in range(8):
        off = jnp.asarray(mt.corner_offsets[c])
        v, f = read(gvox + off)
        good = f & (v != 1.0)  # reference: !isFound || sdf == 1 → skip
        sdfs.append(v)
        ok = good if ok is None else (ok & good)
    return jnp.stack(sdfs, axis=-1), ok


def triangulate_voxels(read: ReadFn, gvox: jnp.ndarray):
    """Marching cubes over a set of voxels (any shape [..., 3] int32 global
    voxel coords). Returns (tri_verts [..., 5, 3, 3] float32 in VOXEL units,
    tri_valid [..., 5] bool)."""
    sdf, ok = _corner_reads(read, gvox)

    cube_index = jnp.zeros(gvox.shape[:-1], dtype=jnp.int32)
    for c in range(8):
        cube_index = cube_index | jnp.where(sdf[..., c] < 0, 1 << c, 0)
    cube_index = jnp.where(ok, cube_index, 0)

    corners = gvox[..., None, :].astype(jnp.float32) + jnp.asarray(
        mt.corner_offsets, dtype=jnp.float32
    )  # [..., 8, 3]

    # interpolated vertex on each of the 12 edges (reference: sdfInterp)
    ec = jnp.asarray(mt.edge_corners)
    p1 = corners[..., ec[:, 0], :]  # [..., 12, 3]
    p2 = corners[..., ec[:, 1], :]
    v1 = sdf[..., ec[:, 0]]
    v2 = sdf[..., ec[:, 1]]
    denom = v2 - v1
    t = jnp.where(jnp.abs(denom) < 1e-5, 0.0, (0.0 - v1) / jnp.where(jnp.abs(denom) < 1e-5, 1.0, denom))
    t = jnp.where(jnp.abs(v1) < 1e-5, 0.0, jnp.where(jnp.abs(v2) < 1e-5, 1.0, t))
    edge_verts = p1 + t[..., None] * (p2 - p1)  # [..., 12, 3]

    tri = jnp.asarray(mt.tri_table)[cube_index][..., :15]  # [..., 15]
    tri_idx = tri.reshape(tri.shape[:-1] + (5, 3))  # [..., 5, 3]
    valid = (tri_idx[..., 0] >= 0) & ok[..., None]
    safe = jnp.clip(tri_idx, 0, 11).reshape(tri.shape[:-1] + (15,))
    gathered = jnp.take_along_axis(edge_verts, safe[..., None], axis=-2)  # [..., 15, 3]
    tri_verts = gathered.reshape(tri.shape[:-1] + (5, 3, 3))
    return tri_verts, valid


def extract_mesh_chunk(
    read: ReadFn,
    block_pos: jnp.ndarray,  # [C, 3] int32 block coords
    block_valid: jnp.ndarray,  # [C] bool
    block_size: int,
    voxel_size: float,
    cap: int,
):
    """Triangulate a chunk of blocks → (verts [cap, 3, 3] metres, count)."""
    C = block_pos.shape[0]
    S = block_size
    S3 = S**3
    lin = jnp.arange(S3, dtype=jnp.int32)
    local = jnp.stack([lin % S, (lin // S) % S, lin // (S * S)], axis=-1)
    gvox = block_pos[:, None, :] * S + local[None, :, :]  # [C, S³, 3]

    tri_verts, tri_valid = triangulate_voxels(read, gvox)  # [C,S³,5,3,3], [C,S³,5]
    tri_valid = tri_valid & block_valid[:, None, None]

    flat_valid = tri_valid.reshape(-1)
    flat_verts = tri_verts.reshape(-1, 3, 3) * voxel_size
    idx = jnp.nonzero(flat_valid, size=cap, fill_value=-1)[0]
    out = jnp.where((idx >= 0)[:, None, None], flat_verts[jnp.clip(idx, 0, None)], 0.0)
    n = jnp.sum(flat_valid).astype(jnp.int32)
    return out, jnp.minimum(n, cap)
