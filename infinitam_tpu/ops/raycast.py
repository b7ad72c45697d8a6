"""Raycasting: sphere-traced TSDF surface extraction + ICP map synthesis.

TPU-native design: instead of one divergent while-loop per CUDA thread
(reference: DeviceAgnostic/ITMVisualisationEngine.h:92-158 castRay), the whole
image marches in lock-step inside a single `lax.while_loop` whose state is the
full [H, W] ray front; finished rays are masked out. Random-access voxel
gathers remain, but every step is a dense vectorized program XLA can schedule.
A Pallas kernel variant lives in ops/pallas/raycast_pallas.py.

Map synthesis (points/normals/shading) reference:
DeviceAgnostic/ITMVisualisationEngine.h:160-409 (computeNormalAndAngle image-
space variant, processPixelICP, drawPixelGrey/Normal/Colour).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from infinitam_tpu.ops.voxel_access import (
    ReadFn,
    read_color_interpolated,
    read_sdf_interpolated,
    read_sdf_uninterpolated,
)


class RaycastResult(NamedTuple):
    # [H, W, 4]: xyz = hit position in *voxel units* (world grid frame),
    # w = 1.0 found / 0.0 miss (reference: raycastResult image semantics).
    points: jnp.ndarray


def generic_raycast(
    read: ReadFn,
    inv_M: jnp.ndarray,  # [4,4] camera→world
    proj: jnp.ndarray,  # (fx, fy, cx, cy)
    img_size: Tuple[int, int],  # (H, W)
    one_over_voxel_size: float,
    mu: float,
    zmin: jnp.ndarray,  # [H, W] per-pixel near range (metres)
    zmax: jnp.ndarray,  # [H, W] far range (metres)
    block_size: int = 8,
    max_steps: int | None = None,
) -> RaycastResult:
    """Lock-step sphere tracing of the TSDF along all pixel rays.

    Semantics follow the reference castRay: march from zmin to zmax in voxel
    units; step sdf·(mu/voxelSize) clamped to ≥1 voxel inside allocated
    space, a whole block width (8) through unallocated space; switch to
    trilinear reads inside the −0.5..0.1 band; stop on sign change and refine
    with two secant steps.
    """
    H, W = img_size
    fx, fy, cx, cy = proj[0], proj[1], proj[2], proj[3]
    step_scale = mu * one_over_voxel_size

    xs = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, axis=0)
    ys = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, axis=1)
    # camera-frame ray through each pixel at unit depth
    dir_cam = jnp.stack(
        [(xs - cx) / fx, (ys - cy) / fy, jnp.ones_like(xs)], axis=-1
    )

    def to_world_voxels(z):
        pc = dir_cam * z[..., None]
        pw = jnp.einsum("ij,hwj->hwi", inv_M[:3, :3], pc) + inv_M[:3, 3]
        return pw * one_over_voxel_size

    pt_start = to_world_voxels(zmin)
    pt_end = to_world_voxels(zmax)
    ray_len_start = jnp.linalg.norm(dir_cam * zmin[..., None], axis=-1) * one_over_voxel_size
    ray_len_end = jnp.linalg.norm(dir_cam * zmax[..., None], axis=-1) * one_over_voxel_size

    ray_dir = pt_end - pt_start
    ray_dir = ray_dir / jnp.maximum(jnp.linalg.norm(ray_dir, axis=-1, keepdims=True), 1e-12)

    del max_steps  # the march terminates naturally: total ≥ ray_len_end

    class _S(NamedTuple):
        pt: jnp.ndarray  # [H,W,3] current position, voxel units
        total: jnp.ndarray  # [H,W] marched length
        sdf: jnp.ndarray  # [H,W] last sdf
        active: jnp.ndarray  # [H,W] still marching

    def cond(s: _S):
        return jnp.any(s.active)

    def body(s: _S):
        # March on UNINTERPOLATED reads only (1 probe/step). The reference
        # also trilinearly re-reads inside the −0.5..0.1 band every step
        # (castRay:135-138) — 9 probes/step; on TPU both predicated branches
        # execute, so we drop the in-loop interpolation and recover the
        # accuracy in the post-loop trilinear secant refinement instead.
        sdf, found = read_sdf_uninterpolated(read, s.pt)

        hit = found & (sdf <= 0.0)
        # Through unallocated space, step to the EXIT of the current block
        # (DDA) instead of the reference's blind 8-voxel jump
        # (ITMVisualisationEngine.h:131 `stepLength = SDF_BLOCK_SIZE`), which
        # can clear the whole ±mu shell and lose the ray — a known InfiniTAM
        # hole artifact. The DDA clamp never skips an allocated block and
        # costs the same number of steps.
        blk = jnp.floor(s.pt / block_size)
        nxt_bound = (blk + (ray_dir > 0)) * block_size
        safe_dir = jnp.where(jnp.abs(ray_dir) < 1e-9, 1e-9, ray_dir)
        t_axis = (nxt_bound - s.pt) / safe_dir
        t_exit = jnp.min(jnp.where(jnp.abs(ray_dir) < 1e-9, 1e9, t_axis), axis=-1)
        empty_step = jnp.clip(t_exit + 0.01, 0.5, float(block_size))
        step = jnp.where(found, jnp.maximum(sdf * step_scale, 1.0), empty_step)

        advance = s.active & ~hit
        new_pt = jnp.where(advance[..., None], s.pt + step[..., None] * ray_dir, s.pt)
        new_total = jnp.where(advance, s.total + step, s.total)
        new_active = advance & (new_total < ray_len_end)
        new_sdf = jnp.where(s.active, sdf, s.sdf)
        return _S(pt=new_pt, total=new_total, sdf=new_sdf, active=new_active)

    init = _S(
        pt=pt_start,
        total=ray_len_start,
        sdf=jnp.ones((H, W), dtype=jnp.float32),
        active=jnp.ones((H, W), dtype=bool),
    )
    final = jax.lax.while_loop(cond, body, init)

    found_surface = final.sdf <= 0.0
    # secant refinement with trilinear reads (reference: castRay tail; one
    # extra interpolated step compensates for the uninterpolated march)
    pt = final.pt + (final.sdf * step_scale)[..., None] * ray_dir
    sdf_refined, _ = read_sdf_interpolated(read, pt)
    pt = pt + (sdf_refined * step_scale)[..., None] * ray_dir
    sdf_refined2, _ = read_sdf_interpolated(read, pt)
    pt = pt + (sdf_refined2 * step_scale)[..., None] * ray_dir

    points = jnp.concatenate(
        [
            jnp.where(found_surface[..., None], pt, final.pt),
            jnp.where(found_surface, 1.0, 0.0)[..., None],
        ],
        axis=-1,
    )
    return RaycastResult(points=points)


def compute_normals_image_space(
    points_ray: jnp.ndarray,  # [H,W,4] raycast result, voxel units
    voxel_size: float,
    light_source: jnp.ndarray,  # [3]
    use_smoothing: bool = True,
):
    """Normals from neighbouring raycast points, with the reference's ±2px
    smoothing and ±1px fallback on large jumps (reference:
    computeNormalAndAngle<useSmoothing>, ITMVisualisationEngine.h:191-255).

    Returns (normals [H,W,3], angle [H,W], valid [H,W]).
    """
    H, W = points_ray.shape[:2]
    found = points_ray[..., 3] > 0

    def shifted(dy, dx):
        return jnp.roll(points_ray, shift=(-dy, -dx), axis=(0, 1))

    def diffs(d):
        xp = shifted(0, d)
        xm = shifted(0, -d)
        yp = shifted(d, 0)
        ym = shifted(-d, 0)
        ok = (xp[..., 3] > 0) & (xm[..., 3] > 0) & (yp[..., 3] > 0) & (ym[..., 3] > 0)
        return xp[..., :3] - xm[..., :3], yp[..., :3] - ym[..., :3], ok

    if use_smoothing:
        dx2, dy2, ok2 = diffs(2)
        len_diff = jnp.maximum(
            jnp.sum(dx2 * dx2, axis=-1), jnp.sum(dy2 * dy2, axis=-1)
        )
        jump = len_diff * voxel_size * voxel_size > 0.15 * 0.15
        dx1, dy1, ok1 = diffs(1)
        use1 = ~ok2 | jump
        diff_x = jnp.where(use1[..., None], dx1, dx2)
        diff_y = jnp.where(use1[..., None], dy1, dy2)
        ok = jnp.where(use1, ok1, ok2)
        border = 3
    else:
        diff_x, diff_y, ok = diffs(1)
        border = 2

    n = -jnp.cross(diff_x, diff_y)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-12)
    angle = jnp.einsum("hwi,i->hw", n, light_source)

    xs = jnp.arange(W)[None, :]
    ys = jnp.arange(H)[:, None]
    in_border = (xs > border - 1) & (xs < W - border) & (ys > border - 1) & (ys < H - border)
    valid = found & ok & (angle > 0) & in_border & (norm[..., 0] > 0)
    return n, angle, valid


def make_icp_maps(
    raycast: RaycastResult,
    voxel_size: float,
    inv_M: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build the tracker's target maps from a raycast (reference:
    renderICP_device / processPixelICP): points in metres (w=1 valid) and
    world-frame unit normals (w=1 valid); invalid pixels get w=-1.
    """
    light_source = -inv_M[:3, 2] / jnp.linalg.norm(inv_M[:3, 2])
    normals, _angle, valid = compute_normals_image_space(
        raycast.points, voxel_size, light_source, use_smoothing=True
    )
    pts_m = raycast.points[..., :3] * voxel_size
    w = jnp.where(valid, 1.0, -1.0)[..., None]
    points_map = jnp.concatenate([jnp.where(valid[..., None], pts_m, 0.0), w], axis=-1)
    normals_map = jnp.concatenate([jnp.where(valid[..., None], normals, 0.0), w], axis=-1)
    return points_map, normals_map


def render_grey(raycast: RaycastResult, voxel_size: float, inv_M: jnp.ndarray) -> jnp.ndarray:
    """Grey-shaded rendering (reference: drawPixelGrey: 0.8·angle+0.2)."""
    light_source = -inv_M[:3, 2] / jnp.linalg.norm(inv_M[:3, 2])
    _n, angle, valid = compute_normals_image_space(
        raycast.points, voxel_size, light_source, use_smoothing=False
    )
    shade = jnp.where(valid, 0.8 * angle + 0.2, 0.0)
    return (jnp.clip(shade, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def render_normals(raycast: RaycastResult, voxel_size: float, inv_M: jnp.ndarray) -> jnp.ndarray:
    """False-colour normals (reference: drawPixelNormal)."""
    light_source = -inv_M[:3, 2] / jnp.linalg.norm(inv_M[:3, 2])
    n, _angle, valid = compute_normals_image_space(
        raycast.points, voxel_size, light_source, use_smoothing=False
    )
    img = (0.3 + (-n + 1.0) * 0.35) * 255.0
    img = jnp.where(valid[..., None], img, 0.0)
    return jnp.clip(img, 0, 255).astype(jnp.uint8)


def render_color(raycast: RaycastResult, read_color) -> jnp.ndarray:
    """Volume-colour rendering (reference: drawPixelColour)."""
    rgb = read_color_interpolated(read_color, raycast.points[..., :3])
    valid = raycast.points[..., 3] > 0
    img = jnp.where(valid[..., None], rgb * 255.0, 0.0)
    return jnp.clip(img, 0, 255).astype(jnp.uint8)


def forward_project(
    points_map_m: jnp.ndarray,  # [H,W,4] metres, w>0 valid (prev raycast * voxelSize)
    M: jnp.ndarray,  # world→camera of the NEW pose
    proj: jnp.ndarray,
    img_size: Tuple[int, int],
    one_over_voxel_size: float,
) -> jnp.ndarray:
    """Scatter the previous raycast into the new view (reference:
    forwardProjectPixel + forwardProject_device). Returns [H,W,4] voxel-unit
    points with w=1 where projected, 0 where missing."""
    H, W = img_size
    fx, fy, cx, cy = proj[0], proj[1], proj[2], proj[3]
    valid = points_map_m[..., 3] > 0
    pc = jnp.einsum("ij,hwj->hwi", M[:3, :3], points_map_m[..., :3]) + M[:3, 3]
    z = jnp.where(pc[..., 2] <= 0, 1.0, pc[..., 2])
    u = fx * pc[..., 0] / z + cx
    v = fy * pc[..., 1] / z + cy
    ok = valid & (pc[..., 2] > 0) & (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    ui = jnp.clip((u + 0.5).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip((v + 0.5).astype(jnp.int32), 0, H - 1)

    out = jnp.zeros((H, W, 4), dtype=jnp.float32)
    pts_voxel = points_map_m[..., :3] * one_over_voxel_size
    payload = jnp.concatenate([pts_voxel, jnp.ones_like(z)[..., None]], axis=-1)
    flat_idx = jnp.where(ok, vi * W + ui, H * W)  # out-of-range drops
    out = out.reshape(-1, 4).at[flat_idx.reshape(-1)].set(
        payload.reshape(-1, 4), mode="drop"
    )
    return out.reshape(H, W, 4)
