"""Pallas TPU depth-ICP residual kernel: windowed bilinear map taps on the MXU.

Reference hot loop: depthTrackerOneLevel_g_rt_device (16×16 thread blocks,
ITMDepthTracker_CUDA.cu:150-262) → computePerPointGH_Depth_Ab
(DeviceAgnostic/ITMDepthTracker.h:8-105): per view pixel, unproject, transform
by the current pose estimate, project into the raycasted scene maps, bilinear-
with-holes sample point+normal, gate, emit (b, A).

On TPU the per-pixel map samples are random gathers — measured 20.5 ms per
GN iteration at 640×480 (tools/probe_icp.py), 76 ms for the whole 5-level
tracker. This kernel re-derives the pass for the hardware:

- the view image marches in 16×16-pixel TILES (one grid step per tile), the
  full-resolution scene maps stay VMEM-RESIDENT for the whole kernel;
- per tile, a (2·WU, WV) WINDOW of each map plane is sliced around the tile's
  projected footprint (origin from a scalar-prefetched per-tile meta, computed
  XLA-side from the current pose each iteration — window sizes are static per
  pyramid level, sized so the footprint plus tracking displacement fits);
- a bilinear map tap is WEIGHTED ONE-HOT MATMUL algebra instead of a gather:
    ohv[v, r] = (1−fv)·[v==v0] + fv·[v==v0+1]        (VPU, bf16)
    q   = window @ ohv                                (MXU)
    val = Σ_rows w2[row, r] · q[row, r]               (VPU)
  where w2 carries the u-direction hat weights. Each map plane is split into
  HI + LO bfloat16 planes (interleaved by row) so the f32 map values are
  reconstructed to ~2⁻¹⁷ relative error at full bf16 MXU rate; the v/u
  weights round to bf16/f32 (error ≤ 2⁻⁹ × the corner value spread — tens of
  µm for typical maps, validated end-to-end by the ATE bench gate);
- the hole gate taps the validity plane (±1) with the same weights: a sample
  is valid iff the interpolated validity exceeds 1−1e-3, i.e. every corner
  with non-negligible weight is valid (the reference's all-four-corners gate,
  up to corners with weight < 5e-4);
- per-pixel residual b, Jacobian row A = [n×p | n] and the valid flag are
  emitted as tiled planes; the (masked) 6×6 normal-equation reduction stays
  in XLA (one [N,6]ᵀ[N,6] matmul on the MXU, ops/icp.py reduce_gh).

Pixels whose projection leaves the window (displacement beyond the per-level
budget — e.g. a wild initial pose) are invalidated for that iteration only,
which mirrors how the reference's distance gate discards outliers.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
NRAY = TILE * TILE
N_PLANES = 8  # px py pz pw nx ny nz pad

# per-level window sizes (WU sublane-pairs of map columns, WV lanes of map
# rows). Coverage after alignment slop: u ≈ WU−17, v ≈ WV−145; a level-l tile
# spans ~16·2^l map pixels plus tracking displacement.
_WINDOWS = {
    0: (64, 256),
    1: (80, 256),
    2: (112, 256),
    3: (176, 384),
    4: (304, 512),
}


def _plane_dims(map_size: Tuple[int, int]) -> Tuple[int, int]:
    H, W = map_size
    Wp = (W + 7) // 8 * 8
    Hp = (H + 127) // 128 * 128
    return Wp, Hp


def window_size(level: int, map_size: Tuple[int, int]) -> Tuple[int, int]:
    Wp, Hp = _plane_dims(map_size)
    wu, wv = _WINDOWS[min(level, max(_WINDOWS))]
    return min(wu, Wp), min(wv, Hp)


def prep_maps(points_map: jnp.ndarray, normals_map: jnp.ndarray) -> jnp.ndarray:
    """[H, W, 4] ×2 maps → resident plane stack [16·Wp, Hp] bf16.

    Row layout: plane-major, HI/LO interleaved by row:
      row(plane, u, h) = plane·2·Wp + 2·u + h   (h: 0=hi, 1=lo)
    Lanes are map rows v; padding reads as 0 (pw pad = −1 → invalid).
    """
    H, W = points_map.shape[:2]
    Wp, Hp = _plane_dims((H, W))
    planes = [
        points_map[..., 0], points_map[..., 1], points_map[..., 2],
        points_map[..., 3],
        normals_map[..., 0], normals_map[..., 1], normals_map[..., 2],
        # all-ones plane: its tap is the EXACT bilinear weight sum s (the
        # bf16-rounded v-weights do not sum to exactly 1) — used to normalize
        # value taps and as the exact reference for the hole gate
        jnp.ones((H, W), jnp.float32),
    ]
    out = []
    for k, p in enumerate(planes):
        pad_val = -1.0 if k == 3 else 0.0
        t = jnp.pad(p.T, ((0, Wp - W), (0, Hp - H)), constant_values=pad_val)
        hi = t.astype(jnp.bfloat16)
        lo = (t - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out.append(jnp.stack([hi, lo], axis=1).reshape(2 * Wp, Hp))
    return jnp.concatenate(out, axis=0)


def _icp_kernel(
    dims_ref,  # scalar-prefetch SMEM [2] int32 — ((Wp−WU)/8, (Hp−WV)/128)
    depth_ref,  # VMEM (1, 1, 256) f32 — view depth tile
    planes_ref,  # VMEM (16·Wp, Hp) bf16 — resident hi/lo map planes
    cam_ref,  # SMEM (40,) f32 — Rinv t Rs ts vproj sproj distThresh W H
    out_ref,  # VMEM (1, 8, 256) f32 — b, A0..5, valid
    *,
    wu: int,
    wv: int,
    wp: int,
    tw: int,
):
    WU, WV = wu, wv
    i = pl.program_id(0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, NRAY), 1)
    px_ = lane & (TILE - 1)
    py_ = lane >> 4
    x = ((i % tw) * TILE + px_).astype(jnp.float32)
    y = ((i // tw) * TILE + py_).astype(jnp.float32)

    d = depth_ref[0, 0:1, :]
    valid = d > 1e-8
    dsafe = jnp.where(valid, d, 1.0)

    vfx = cam_ref[24]
    vfy = cam_ref[25]
    vcx = cam_ref[26]
    vcy = cam_ref[27]
    pc_x = dsafe * (x - vcx) / vfx
    pc_y = dsafe * (y - vcy) / vfy
    pc_z = dsafe

    # world point p = Rinv·p_cam + tinv
    p_x = cam_ref[0] * pc_x + cam_ref[1] * pc_y + cam_ref[2] * pc_z + cam_ref[9]
    p_y = cam_ref[3] * pc_x + cam_ref[4] * pc_y + cam_ref[5] * pc_z + cam_ref[10]
    p_z = cam_ref[6] * pc_x + cam_ref[7] * pc_y + cam_ref[8] * pc_z + cam_ref[11]

    # scene-camera point + projection
    s_x = cam_ref[12] * p_x + cam_ref[13] * p_y + cam_ref[14] * p_z + cam_ref[21]
    s_y = cam_ref[15] * p_x + cam_ref[16] * p_y + cam_ref[17] * p_z + cam_ref[22]
    s_z = cam_ref[18] * p_x + cam_ref[19] * p_y + cam_ref[20] * p_z + cam_ref[23]
    valid &= s_z > 0.0
    zs = jnp.where(valid, s_z, 1.0)
    u = cam_ref[28] * s_x / zs + cam_ref[30]
    v = cam_ref[29] * s_y / zs + cam_ref[31]
    W_full = cam_ref[33]
    H_full = cam_ref[34]
    valid &= (u >= 0.0) & (u <= W_full - 2.0) & (v >= 0.0) & (v <= H_full - 2.0)

    uc = jnp.clip(u, 0.0, W_full - 2.0)
    vc = jnp.clip(v, 0.0, H_full - 2.0)
    uf = jnp.floor(uc)
    vf = jnp.floor(vc)
    fu = uc - uf
    fv = vc - vf

    # window origin from THIS TILE's own projections (the per-tile min over
    # valid lanes), computed in-kernel — the XLA-side variant re-projected
    # the whole image every GN iteration. The shift-multiply makes the slice
    # offsets PROVABLY 8-/128-aligned (Mosaic rejects bare traced offsets).
    big = jnp.float32(1e9)
    umin = jnp.min(jnp.where(valid, uc, big))
    vmin = jnp.min(jnp.where(valid, vc, big))
    umin = jnp.where(umin > big * 0.5, 0.0, umin)
    vmin = jnp.where(vmin > big * 0.5, 0.0, vmin)
    u0d8 = jnp.clip((umin.astype(jnp.int32) - 8) >> 3, 0, dims_ref[0])
    v0d128 = jnp.clip((vmin.astype(jnp.int32) - 16) >> 7, 0, dims_ref[1])
    u0 = pl.multiple_of(u0d8 * 8, 8)
    v0 = pl.multiple_of(v0d128 * 128, 128)

    cu = uf.astype(jnp.int32) - u0  # window column (map u)
    rv = vf.astype(jnp.int32) - v0  # window lane (map v)
    # projection outside the static window → invalid this iteration
    valid &= (cu >= 0) & (cu <= WU - 2) & (rv >= 0) & (rv <= WV - 2)
    cu = jnp.clip(cu, 0, WU - 2)
    rv = jnp.clip(rv, 0, WV - 2)

    # v-direction weighted two-hot [WV, 256] (bf16; weights exact per lane)
    iv = jax.lax.broadcasted_iota(jnp.int32, (WV, NRAY), 0)
    fv_b = jnp.broadcast_to(fv, (WV, NRAY))
    ohv = jnp.where(
        iv == rv, 1.0 - fv_b, jnp.where(iv == rv + 1, fv_b, 0.0)
    ).astype(jnp.bfloat16)

    # u-direction hat weights over interleaved hi/lo rows [2·WU, 256] (f32)
    iu = jax.lax.broadcasted_iota(jnp.int32, (2 * WU, NRAY), 0) >> 1
    fu_b = jnp.broadcast_to(fu, (2 * WU, NRAY))
    w2 = jnp.where(iu == cu, 1.0 - fu_b, jnp.where(iu == cu + 1, fu_b, 0.0))

    def tap(plane: int) -> jnp.ndarray:
        win = planes_ref[pl.ds(plane * 2 * wp + 2 * u0, 2 * WU), pl.ds(v0, WV)]
        q = jax.lax.dot_general(
            win, ohv, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )  # [2·WU, 256]
        return jnp.sum(w2 * q, axis=0, keepdims=True)

    # weight-sum normalizer: the u-side weights (f32) sum to exactly 1 but
    # the v-side two-hot is bf16-rounded, so raw taps carry a common-mode
    # scale s = tap(ones) ≈ 1 ± 2⁻⁹. Dividing by s cancels it exactly,
    # leaving only the spread-proportional interpolation-weight error.
    s_w = tap(7)
    inv_s = 1.0 / jnp.maximum(s_w, 0.25)
    t_px = tap(0) * inv_s
    t_py = tap(1) * inv_s
    t_pz = tap(2) * inv_s
    t_pw = tap(3)
    t_nx = tap(4) * inv_s
    t_ny = tap(5) * inv_s
    t_nz = tap(6) * inv_s

    # hole gate: s − tap(pw) = 2·(summed hole weights) EXACTLY (identical
    # weights, exact bf16 products, f32 accumulation) — all corners with
    # weight > 1e-3 must be valid (the reference's all-four-corners gate)
    valid &= (s_w - t_pw) < 2e-3
    valid &= s_w > 0.25  # window/map pad guard

    d_x = t_px - p_x
    d_y = t_py - p_y
    d_z = t_pz - p_z
    dist = d_x * d_x + d_y * d_y + d_z * d_z
    valid &= dist <= cam_ref[32]

    b = t_nx * d_x + t_ny * d_y + t_nz * d_z
    # A[0:3] = n×p (rotation), A[3:6] = n (translation)
    a0 = t_ny * p_z - t_nz * p_y
    a1 = t_nz * p_x - t_nx * p_z
    a2 = t_nx * p_y - t_ny * p_x

    out_ref[0, 0:1, :] = b
    out_ref[0, 1:2, :] = a0
    out_ref[0, 2:3, :] = a1
    out_ref[0, 3:4, :] = a2
    out_ref[0, 4:5, :] = t_nx
    out_ref[0, 5:6, :] = t_ny
    out_ref[0, 6:7, :] = t_nz
    out_ref[0, 7:8, :] = jnp.where(valid, 1.0, 0.0)


def tileize(img: jnp.ndarray, pad_value: float = 0.0) -> jnp.ndarray:
    """[H, W] → [NT, 256] row-major 16×16 tiles (pads to tile multiples)."""
    H, W = img.shape
    Hq = (H + TILE - 1) // TILE * TILE
    Wq = (W + TILE - 1) // TILE * TILE
    img = jnp.pad(img, ((0, Hq - H), (0, Wq - W)), constant_values=pad_value)
    th, tw = Hq // TILE, Wq // TILE
    return (
        img.reshape(th, TILE, tw, TILE).transpose(0, 2, 1, 3).reshape(th * tw, NRAY)
    )


def residuals_tiles(
    depth: jnp.ndarray,  # [h, w] level-l depth
    vproj: jnp.ndarray,  # level-l view intrinsics
    planes: jnp.ndarray,  # prep_maps output [16·Wp, Hp] bf16
    sproj: jnp.ndarray,  # full-res scene intrinsics
    inv_pose: jnp.ndarray,  # [4,4] camera→world current estimate
    scene_pose: jnp.ndarray,  # [4,4] world→camera of the maps
    dist_thresh,
    map_size: Tuple[int, int],
    level: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One residual pass → (b [N], A [N, 6], valid [N]) in TILED pixel order
    (N = padded pixel count; padding pixels are invalid)."""
    h, w = depth.shape
    Wp, Hp = _plane_dims(map_size)
    wu, wv = window_size(level, map_size)
    tw = (w + TILE - 1) // TILE
    th = (h + TILE - 1) // TILE
    nt = th * tw

    dims = jnp.array([(Wp - wu) // 8, (Hp - wv) // 128], jnp.int32)
    tiles = tileize(depth).reshape(nt, 1, NRAY)
    cam = jnp.concatenate(
        [
            inv_pose[:3, :3].reshape(-1),
            inv_pose[:3, 3],
            scene_pose[:3, :3].reshape(-1),
            scene_pose[:3, 3],
            vproj[:4],
            sproj[:4],
            jnp.asarray(dist_thresh, jnp.float32)[None],
            jnp.array([float(map_size[1]), float(map_size[0])], jnp.float32),
            jnp.zeros((5,), jnp.float32),
        ]
    ).astype(jnp.float32)

    kernel = functools.partial(_icp_kernel, wu=wu, wv=wv, wp=Wp, tw=tw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 1, NRAY), lambda i, m: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * Wp, Hp), lambda i, m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, NRAY), lambda i, m: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nt, 8, NRAY), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(dims, tiles, planes, cam)

    b = out[:, 0, :].reshape(-1)
    A = out[:, 1:7, :].transpose(0, 2, 1).reshape(-1, 6)
    valid = out[:, 7, :].reshape(-1) > 0.5
    return b, A, valid
