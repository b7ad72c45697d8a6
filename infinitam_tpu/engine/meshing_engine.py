"""Meshing engine: TSDF → triangle mesh + OBJ/STL export.

Reference parity: ITMLib/Engine/ITMMeshingEngine.h + _CUDA.cu (MeshScene over
allocated blocks) and ITMLib/Objects/ITMMesh.h:34-113 (WriteOBJ / WriteSTL
binary format). Extraction runs in jitted chunks of blocks; export is host
code.
"""

from __future__ import annotations

import dataclasses
import struct
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from infinitam_tpu.config import Settings
from infinitam_tpu.engine import hash_volume as hv
from infinitam_tpu.engine import volume as vol_mod
from infinitam_tpu.ops import meshing as mops


@dataclasses.dataclass
class Mesh:
    """Triangle soup (reference: ITMMesh — Triangle{p0,p1,p2})."""

    triangles: np.ndarray  # [T, 3, 3] float32, metres

    @property
    def n_triangles(self) -> int:
        return len(self.triangles)

    def write_obj(self, path: str) -> None:
        """reference: ITMMesh::WriteOBJ — flat v/f lists."""
        with open(path, "w") as f:
            for tri in self.triangles:
                for v in tri:
                    f.write(f"v {v[0]} {v[1]} {v[2]}\n")
            for i in range(len(self.triangles)):
                b = 3 * i
                f.write(f"f {b + 1} {b + 2} {b + 3}\n")

    def write_stl(self, path: str) -> None:
        """reference: ITMMesh::WriteSTL — binary STL (80-byte header, u32
        count, per-triangle normal + 3 vertices + u16 attr)."""
        tris = self.triangles
        with open(path, "wb") as f:
            f.write(b"\0" * 80)
            f.write(struct.pack("<I", len(tris)))
            for tri in tris:
                n = np.cross(tri[1] - tri[0], tri[2] - tri[0])
                norm = np.linalg.norm(n)
                n = n / norm if norm > 0 else n
                f.write(struct.pack("<3f", *n.astype(np.float32)))
                for v in tri:
                    f.write(struct.pack("<3f", *v.astype(np.float32)))
                f.write(struct.pack("<H", 0))


_CHUNK = 128  # blocks per jitted extraction call
_CAP_PER_BLOCK = 64  # triangle capacity per block in a chunk (ref caps 32)


def mesh_scene_hash(vol: hv.HashVolume, settings: Settings) -> Mesh:
    """MeshScene for the voxel-block-hash volume: chunk over allocated
    entries (reference: findAllocateBlocks + meshScene_device)."""
    hp = settings.hashing

    entry_ptr = np.asarray(vol.entry_ptr)
    entry_pos = np.asarray(vol.entry_pos)
    alloc_idx = np.nonzero(entry_ptr >= 0)[0]

    extract = _make_chunk_extractor_hash(settings)

    tris_out = []
    for start in range(0, len(alloc_idx), _CHUNK):
        sel = alloc_idx[start : start + _CHUNK]
        bpos = np.zeros((_CHUNK, 3), dtype=np.int32)
        valid = np.zeros((_CHUNK,), dtype=bool)
        bpos[: len(sel)] = entry_pos[sel]
        valid[: len(sel)] = True
        verts, n = extract(vol, jnp.asarray(bpos), jnp.asarray(valid))
        n = int(n)
        if n > 0:
            tris_out.append(np.asarray(verts[:n]))
    if not tris_out:
        return Mesh(triangles=np.zeros((0, 3, 3), dtype=np.float32))
    return Mesh(triangles=np.concatenate(tris_out, axis=0))


def _make_chunk_extractor_hash(settings: Settings):
    hp = settings.hashing

    @jax.jit
    def extract(vol, bpos, valid):
        read = hv.make_hash_reader(vol, hp)
        return mops.extract_mesh_chunk(
            read, bpos, valid, hp.block_size, settings.scene.voxel_size, _CHUNK * _CAP_PER_BLOCK
        )

    return extract


def mesh_scene_dense(vol: vol_mod.DenseVolume, settings: Settings) -> Mesh:
    """MeshScene for the dense array: treat it as a virtual block grid."""
    pp = settings.plain
    X, Y, Z = pp.size
    S = 8
    bx, by, bz = X // S, Y // S, Z // S
    # block coords in GLOBAL voxel-block units (offset folded in)
    ox, oy, oz = (o // S for o in pp.offset)
    blocks = np.stack(
        np.meshgrid(
            np.arange(bx) + ox, np.arange(by) + oy, np.arange(bz) + oz, indexing="ij"
        ),
        axis=-1,
    ).reshape(-1, 3).astype(np.int32)
    # only blocks with any weight
    w = np.asarray(vol.w_depth).reshape(bz, S, by, S, bx, S)  # z-major grid
    # cheap screen: recompute per-block occupancy by downsampling
    occupied = np.asarray(vol.w_depth > 0).reshape(Z // S, S, Y // S, S, X // S, S).any(axis=(1, 3, 5))
    occ_map = {}
    for zi in range(Z // S):
        for yi in range(Y // S):
            for xi in range(X // S):
                occ_map[(xi + ox, yi + oy, zi + oz)] = occupied[zi, yi, xi]
    blocks = np.array([b for b in blocks if occ_map.get(tuple(b), False)], dtype=np.int32)
    if len(blocks) == 0:
        return Mesh(triangles=np.zeros((0, 3, 3), dtype=np.float32))

    @jax.jit
    def extract(vol, bpos, valid):
        read = vol_mod.make_dense_reader(vol, pp)
        return mops.extract_mesh_chunk(
            read, bpos, valid, S, settings.scene.voxel_size, _CHUNK * _CAP_PER_BLOCK
        )

    tris_out = []
    for start in range(0, len(blocks), _CHUNK):
        sel = blocks[start : start + _CHUNK]
        bpos = np.zeros((_CHUNK, 3), dtype=np.int32)
        valid = np.zeros((_CHUNK,), dtype=bool)
        bpos[: len(sel)] = sel
        valid[: len(sel)] = True
        verts, n = extract(vol, jnp.asarray(bpos), jnp.asarray(valid))
        n = int(n)
        if n > 0:
            tris_out.append(np.asarray(verts[:n]))
    if not tris_out:
        return Mesh(triangles=np.zeros((0, 3, 3), dtype=np.float32))
    return Mesh(triangles=np.concatenate(tris_out, axis=0))
