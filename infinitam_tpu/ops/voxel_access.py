"""Generic SDF access combinators: trilinear interpolation and SDF normals.

These are representation-agnostic — they take a `read(int_pts)->(sdf, found)`
closure (dense array or voxel-block hash) and build the interpolated reads on
top, mirroring the reference's template layer
(reference: DeviceAgnostic/ITMRepresentationAccess.h:144-356 —
readFromSDF_float_interpolated, readFromSDF_color4u_interpolated,
computeSingleNormalFromSDF).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp

ReadFn = Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]


def read_sdf_uninterpolated(read: ReadFn, pts: jnp.ndarray):
    """Nearest-voxel SDF at float voxel coords (reference:
    readFromSDF_float_uninterpolated — ROUND = floor(x+0.5))."""
    ipts = jnp.floor(pts + 0.5).astype(jnp.int32)
    return read(ipts)


def read_sdf_interpolated(read: ReadFn, pts: jnp.ndarray):
    """Trilinear SDF at float voxel coords over the 8 surrounding voxels
    (reference: readFromSDF_float_interpolated). Returns (sdf, found) where
    found mirrors the reference's behaviour of reporting the *last* lookup —
    here: all 8 found (stricter, used only for diagnostics)."""
    base = jnp.floor(pts)
    coeff = pts - base
    ibase = base.astype(jnp.int32)
    cx, cy, cz = coeff[..., 0], coeff[..., 1], coeff[..., 2]

    def rv(dx, dy, dz):
        off = jnp.array([dx, dy, dz], dtype=jnp.int32)
        v, f = read(ibase + off)
        return v, f

    v000, f000 = rv(0, 0, 0)
    v100, f100 = rv(1, 0, 0)
    v010, f010 = rv(0, 1, 0)
    v110, f110 = rv(1, 1, 0)
    v001, f001 = rv(0, 0, 1)
    v101, f101 = rv(1, 0, 1)
    v011, f011 = rv(0, 1, 1)
    v111, f111 = rv(1, 1, 1)

    r00 = (1 - cx) * v000 + cx * v100
    r10 = (1 - cx) * v010 + cx * v110
    r01 = (1 - cx) * v001 + cx * v101
    r11 = (1 - cx) * v011 + cx * v111
    r0 = (1 - cy) * r00 + cy * r10
    r1 = (1 - cy) * r01 + cy * r11
    sdf = (1 - cz) * r0 + cz * r1
    found = f000 & f100 & f010 & f110 & f001 & f101 & f011 & f111
    return sdf, found


def read_color_interpolated(read_color: Callable[[jnp.ndarray], jnp.ndarray], pts: jnp.ndarray):
    """Trilinear RGB at float voxel coords (reference:
    readFromSDF_color4u_interpolated). read_color: int_pts → [...,3]."""
    base = jnp.floor(pts)
    coeff = (pts - base)[..., None]
    ibase = base.astype(jnp.int32)

    out = jnp.zeros(pts.shape[:-1] + (3,), dtype=jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                off = jnp.array([dx, dy, dz], dtype=jnp.int32)
                w = (
                    (coeff[..., 0, :] if dx else 1 - coeff[..., 0, :])
                    * (coeff[..., 1, :] if dy else 1 - coeff[..., 1, :])
                    * (coeff[..., 2, :] if dz else 1 - coeff[..., 2, :])
                )
                out = out + w * read_color(ibase + off)
    return out


def compute_normal_from_sdf(read: ReadFn, pts: jnp.ndarray) -> jnp.ndarray:
    """SDF surface normal by central differences of the trilinear field:
    n_i ∝ sdf(p + e_i) − sdf(p − e_i).

    Mathematically identical to the reference's interleaved formulation
    (computeSingleNormalFromSDF, ITMRepresentationAccess.h:228-356), which
    reuses corner reads; XLA's CSE recovers most of that sharing. Returns an
    UNNORMALIZED gradient (the callers normalize).
    """
    grads = []
    for axis in range(3):
        e = jnp.zeros((3,), dtype=pts.dtype).at[axis].set(1.0)
        vp, _ = read_sdf_interpolated(read, pts + e)
        vm, _ = read_sdf_interpolated(read, pts - e)
        grads.append(vp - vm)
    return jnp.stack(grads, axis=-1)
