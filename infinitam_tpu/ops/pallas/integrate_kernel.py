"""Pallas TPU fused TSDF integration: one grid step per visible block.

Reference hot loop: integrateIntoScene_device <<<noVisibleEntries, 8³>>>
(ITMSceneReconstructionEngine_CUDA.cu:206-230 → computeUpdatedVoxelDepthInfo,
DeviceAgnostic/ITMSceneReconstructionEngine.h:10-70). The CUDA kernel reads
one voxel per thread and taps the depth image at the voxel's projection —
per-element random gathers that cost 10-65 ns each on TPU (PERF_NOTES.md),
so the design is re-derived:

- the grid runs ONE STEP PER VISIBLE BLOCK (work ∝ visibility, the analogue
  of the reference's noVisibleEntries launch); the block's packed voxel row
  arrives by dynamic-index_map DMA (scalar-prefetched VBA pointers) and the
  updated row is written back IN PLACE (aliased output, same index_map);
- the depth tap is ONE-HOT MATMUL algebra on the MXU instead of a gather:
  the transposed depth image is VMEM-resident, each block slices an aligned
  (WU, WV) window around its projected footprint, and
    tap[i] = Σ_uu (win @ onehot_v)[uu, i] · onehot_u[uu, i]
  selects depth[v_i, u_i] exactly. The window is split hi/lo into two
  bfloat16 planes so the matmuls run at full MXU rate while reconstructing
  f32 depth exactly (one-hots are exact in bf16);
- invalid / swapped-out entries route to a reserved sentinel VBA row
  (hash_volume.create_hash never allocates it) with the update masked off,
  making their write-back a benign no-op.

Divergences from the reference (both rare, both masked-safe): voxels whose
projection falls outside the block's window (footprints wider than WU−7 /
WV−127 pixels — only blocks closer than ~0.5 m at the image periphery) skip
their update this frame, and color integration stays on the XLA path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# max window of the transposed depth image sliced per block: WU sublanes
# (image columns, 8-aligned start), WV lanes (image rows, 128-aligned start);
# shrunk to the padded image when the image is smaller.
# Coverage = (WU−7, WV−127) px after alignment slop; a block's projected
# footprint is ≤ block_size·voxel_size·√3·f/z px, so 256×384 covers blocks
# down to z ≈ 0.29 m at f=525 / 8 cm blocks — below the 0.35 m frustum min
# of every shipped config. Blocks closer than that lose the voxels that
# project outside the window for the frame (counted per frame in
# FrameDiagnostics.n_window_clipped via block_windows' clipped flag).
WU_MAX = 256
WV_MAX = 384
# small-tier window (integrate_into_scene_pallas partitions blocks by
# projected footprint): covers footprints ≤ (WU_S−8, WV_S−128) px = (56, 128)
# — every block beyond z ≈ √3·f·block_m/56 (≈1.3 m at 8 cm blocks / f=525,
# ≈0.65 m at 4 cm blocks), i.e. the large majority of a frustum's blocks.
# Tap cost scales with window AREA: the small tier runs 6× cheaper.
WU_SMALL = 64
WV_SMALL = 256
# narrow-tier u-window (integrate_into_scene_pallas's third tier): covers
# footprints ≤ 24 px — ~p95 of the 5 mm bench's block footprints
WU_NARROW = 32


def _win_dims(img_size):
    H, W = img_size
    Wp = (W + 7) // 8 * 8
    Hp = (H + 127) // 128 * 128
    return min(WU_MAX, Wp), min(WV_MAX, Hp)

S = 8  # voxel block side (the kernel is specialized to 8³ = 512 blocks)
S3 = 512


def _integrate_kernel(
    ptr_ref,  # scalar-prefetch SMEM [V] int32 — VBA row (sentinel-resolved)
    bpos_ref,  # scalar-prefetch SMEM [3V] int32 — flat (x,y,z) block coords
    #   (flat 1-D: a [V,3] operand lane-pads in SMEM to [V,128]·4B — 4 MB at
    #   V=8192, over the 1 MB SMEM budget; flat costs the true 96 KB)
    meta_ref,  # scalar-prefetch SMEM [3V] int32 — flat (u0/8, v0/128, valid)
    *refs,  # vox, depth_planes, cam [, meta_rgb, vox_rgb, rgb_planes],
    #   out [, out_rgb] — see _integrate_impl
    wu: int,
    wv: int,
    wp: int,
    with_color: bool = False,
    wpr: int = 0,
):
    if with_color:
        (metargb_ref, vox_ref, depth_p_ref, cam_ref, voxrgb_ref, rgb_p_ref,
         out_ref, outrgb_ref) = refs
    else:
        vox_ref, depth_p_ref, cam_ref, out_ref = refs
        metargb_ref = voxrgb_ref = rgb_p_ref = outrgb_ref = None
    WU, WV = wu, wv
    i = pl.program_id(0)

    lin = jax.lax.broadcasted_iota(jnp.int32, (1, S3), 1)
    lx = lin & (S - 1)
    ly = (lin >> 3) & (S - 1)
    lz = lin >> 6

    bx = bpos_ref[3 * i]
    by = bpos_ref[3 * i + 1]
    bz = bpos_ref[3 * i + 2]
    voxel = cam_ref[16]
    mu = cam_ref[17]
    max_w = cam_ref[18]
    stop_at_max_w = cam_ref[19]
    enable = cam_ref[20]
    img_h = cam_ref[21]
    img_w = cam_ref[22]

    px = (bx * S + lx).astype(jnp.float32) * voxel
    py = (by * S + ly).astype(jnp.float32) * voxel
    pz = (bz * S + lz).astype(jnp.float32) * voxel

    cx_ = cam_ref[0] * px + cam_ref[1] * py + cam_ref[2] * pz + cam_ref[9]
    cy_ = cam_ref[3] * px + cam_ref[4] * py + cam_ref[5] * pz + cam_ref[10]
    cz_ = cam_ref[6] * px + cam_ref[7] * py + cam_ref[8] * pz + cam_ref[11]

    ok = cz_ > 0.0
    zs = jnp.where(ok, cz_, 1.0)
    u = cam_ref[12] * cx_ / zs + cam_ref[14]
    v = cam_ref[13] * cy_ / zs + cam_ref[15]
    # reference bounds: 1 <= u <= W-2 (computeUpdatedVoxelDepthInfo)
    ok &= (u >= 1.0) & (u <= img_w - 2.0) & (v >= 1.0) & (v <= img_h - 2.0)

    ui = jnp.floor(u + 0.5).astype(jnp.int32)
    vi = jnp.floor(v + 0.5).astype(jnp.int32)

    u0 = meta_ref[3 * i] * 8
    v0 = meta_ref[3 * i + 1] * 128
    cu = ui - u0  # window sublane coord
    rv = vi - v0  # window lane coord
    ok &= (cu >= 0) & (cu < WU) & (rv >= 0) & (rv < WV)

    # ---- depth tap via one-hot matmuls --------------------------------------
    # The depth image is split into THREE bf16 planes (8+8+8 = 24 mantissa
    # bits) XLA-side: each residual subtraction is exact in f32, each one-hot
    # dot selects a single element (no accumulation), so hi+mid+lo
    # reconstructs the f32 depth EXACTLY at bf16 MXU speed — the kernel is
    # bit-identical to the XLA oracle (tests/test_pallas_integrate.py).
    win_hi = depth_p_ref[pl.ds(u0, WU), pl.ds(v0, WV)]
    win_mid = depth_p_ref[pl.ds(wp + u0, WU), pl.ds(v0, WV)]
    win_lo = depth_p_ref[pl.ds(2 * wp + u0, WU), pl.ds(v0, WV)]
    ohv = (
        jax.lax.broadcasted_iota(jnp.int32, (WV, S3), 0) == rv
    ).astype(jnp.bfloat16)  # [WV, 512]
    # explicit DEFAULT precision: a global jax_default_matmul_precision =
    # "highest" otherwise stamps contract_precision<fp32> on these bf16 dots,
    # which Mosaic rejects ("Bad lhs type") — the one-hot selection is exact
    # at any precision, so DEFAULT is always correct here
    dn = (((1,), (0,)), ((), ()))
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=dn,
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )
    q = dot(win_hi, ohv) + dot(win_mid, ohv) + dot(win_lo, ohv)
    # [WU, 512]: q[uu, i] = depth[v_i, u0 + uu]
    ohu = jax.lax.broadcasted_iota(jnp.int32, (WU, S3), 0) == cu  # [WU, 512]
    dtap = jnp.sum(jnp.where(ohu, q, 0.0), axis=0, keepdims=True)  # [1, 512]

    ok &= dtap > 0.0
    eta = dtap - cz_
    do = ok & (eta >= -mu)
    do &= ptr_ref[i] >= 0
    do &= meta_ref[3 * i + 2] > 0
    do &= enable > 0.0

    packed = vox_ref[0, :, :]
    old_q = packed >> 16  # sign-extended int16 sdf
    old_sdf = old_q.astype(jnp.float32) * (1.0 / 32767.0)
    old_w = (packed >> 8) & 0xFF
    old_wf = old_w.astype(jnp.float32)

    new_f = jnp.minimum(1.0, eta / mu)
    merged = (old_wf * old_sdf + new_f) / (old_wf + 1.0)
    new_w = jnp.minimum(old_w + 1, max_w.astype(jnp.int32))
    do &= (stop_at_max_w <= 0.0) | (old_wf < max_w)

    sdf_q = jnp.round(jnp.clip(merged, -1.0, 1.0) * 32767.0).astype(jnp.int32)
    new_packed = ((sdf_q & 0xFFFF) << 16) | ((new_w & 0xFF) << 8)
    out_ref[0, :, :] = jnp.where(do, new_packed, packed)

    if not with_color:
        return

    # ---- color running average (reference: computeUpdatedVoxelColorInfo +
    # the |eta/mu| <= 0.25 near-surface gate of ComputeUpdatedVoxelInfo<true>)
    gate_c = do & ~((eta > mu) | (jnp.abs(eta / mu) > 0.25))

    # project into the rgb camera (M_rgb, rgb intrinsics from cam[32:48])
    r_x = cam_ref[32] * px + cam_ref[33] * py + cam_ref[34] * pz + cam_ref[41]
    r_y = cam_ref[35] * px + cam_ref[36] * py + cam_ref[37] * pz + cam_ref[42]
    r_z = cam_ref[38] * px + cam_ref[39] * py + cam_ref[40] * pz + cam_ref[43]
    zr = jnp.where(r_z == 0.0, 1e-6, r_z)
    ur = cam_ref[44] * r_x / zr + cam_ref[46]
    vr = cam_ref[45] * r_y / zr + cam_ref[47]
    gate_c &= (ur >= 1.0) & (ur <= img_w - 2.0) & (vr >= 1.0) & (vr <= img_h - 2.0)

    urc = jnp.clip(ur, 0.0, img_w - 2.0)
    vrc = jnp.clip(vr, 0.0, img_h - 2.0)
    uf = jnp.floor(urc)
    vf = jnp.floor(vrc)
    fu_ = urc - uf
    fv_ = vrc - vf
    u0r = metargb_ref[3 * i] * 8
    v0r = metargb_ref[3 * i + 1] * 128
    cur = uf.astype(jnp.int32) - u0r
    rvr = vf.astype(jnp.int32) - v0r
    gate_c &= (cur >= 0) & (cur <= WU - 2) & (rvr >= 0) & (rvr <= WV - 2)
    gate_c &= metargb_ref[3 * i + 2] > 0
    cur = jnp.clip(cur, 0, WU - 2)
    rvr = jnp.clip(rvr, 0, WV - 2)

    # bilinear rgb tap: v-direction weighted two-hot (bf16; the rgb planes
    # hold 0..255 integer values — exact in bf16), u-direction hat weights
    iv = jax.lax.broadcasted_iota(jnp.int32, (WV, S3), 0)
    fv_b = jnp.broadcast_to(fv_, (WV, S3))
    ohv_c = jnp.where(
        iv == rvr, 1.0 - fv_b, jnp.where(iv == rvr + 1, fv_b, 0.0)
    ).astype(jnp.bfloat16)
    iu = jax.lax.broadcasted_iota(jnp.int32, (WU, S3), 0)
    fu_b = jnp.broadcast_to(fu_, (WU, S3))
    w2u = jnp.where(iu == cur, 1.0 - fu_b, jnp.where(iu == cur + 1, fu_b, 0.0))

    def rgb_tap(ch):
        win = rgb_p_ref[pl.ds(ch * wpr + u0r, WU), pl.ds(v0r, WV)]
        q = dot(win, ohv_c)
        return jnp.sum(w2u * q, axis=0, keepdims=True)  # [1, 512] in 0..255

    meas_r = rgb_tap(0)
    meas_g = rgb_tap(1)
    meas_b = rgb_tap(2)

    packed_c = voxrgb_ref[0, :, :]
    old_r = ((packed_c >> 24) & 0xFF).astype(jnp.float32)
    old_g = ((packed_c >> 16) & 0xFF).astype(jnp.float32)
    old_b = ((packed_c >> 8) & 0xFF).astype(jnp.float32)
    old_wc = packed_c & 0xFF
    wcf = old_wc.astype(jnp.float32)
    inv_w = 1.0 / (wcf + 1.0)
    new_r = (old_r * wcf + meas_r) * inv_w
    new_g = (old_g * wcf + meas_g) * inv_w
    new_b = (old_b * wcf + meas_b) * inv_w
    new_wc = jnp.minimum(old_wc + 1, max_w.astype(jnp.int32))
    rq = jnp.round(jnp.clip(new_r, 0.0, 255.0)).astype(jnp.int32)
    gq = jnp.round(jnp.clip(new_g, 0.0, 255.0)).astype(jnp.int32)
    bq = jnp.round(jnp.clip(new_b, 0.0, 255.0)).astype(jnp.int32)
    new_packed_c = (rq << 24) | (gq << 16) | (bq << 8) | (new_wc & 0xFF)
    outrgb_ref[0, :, :] = jnp.where(gate_c, new_packed_c, packed_c)


def integrate_blocks(
    vox: jnp.ndarray,  # [B, 512] int32 packed voxel array (donated)
    ptrs: jnp.ndarray,  # [V] int32 VBA rows, sentinel for invalid steps
    bpos: jnp.ndarray,  # [V, 3] int32 block coords
    meta: jnp.ndarray,  # [V, 3] int32 (u0/8, v0/128, valid)
    depth_planes: jnp.ndarray,  # [3·Wp, Hp] bf16 hi/mid/lo transposed depth
    cam: jnp.ndarray,  # (32,) or (48,) f32 camera/update params (see kernel)
    n_valid: jnp.ndarray | None = None,  # dynamic grid bound (None → static V)
    window: Tuple[int, int] | None = None,  # (wu, wv) override (tiering)
    vox_rgb: jnp.ndarray | None = None,  # [B, 512] packed color plane
    meta_rgb: jnp.ndarray | None = None,  # [V, 3] rgb-camera window origins
    rgb_planes: jnp.ndarray | None = None,  # [3·Wpr, Hpr] bf16 r/g/b (0..255)
    interpret: bool = False,
):
    """Run the per-visible-block fused TSDF update; returns the updated vox
    plane (same buffer, in-place semantics via input_output_aliases) — or
    (vox, vox_rgb) when the color operands are given."""
    V = ptrs.shape[0]
    B, s3 = vox.shape
    with_color = vox_rgb is not None
    # TPU lowering wants the 2nd-minor block dim to equal the array's, so the
    # VBA plane is viewed as [B, 1, S3] with (1, 1, S3) row blocks
    vox3 = vox.reshape(B, 1, s3)
    Wp = depth_planes.shape[0] // 3
    Hp = depth_planes.shape[1]
    if window is None:
        wu, wv = min(WU_MAX, Wp), min(WV_MAX, Hp)
    else:
        wu, wv = min(window[0], Wp), min(window[1], Hp)
    wpr = rgb_planes.shape[0] // 3 if with_color else 0
    kernel = functools.partial(
        _integrate_kernel, wu=wu, wv=wv, wp=Wp, with_color=with_color, wpr=wpr
    )
    # dynamic grid: steps ∝ actual visible count (the reference launches
    # <<<noVisibleEntries, 8³>>>); the traced bound goes in the grid tuple
    # itself — steps ≥ n_valid never run, so their operands are never read
    grid = (V,) if n_valid is None else (jnp.minimum(n_valid, V),)
    vox_spec = pl.BlockSpec(
        (1, 1, s3), lambda i, p, b, m, *_: (p[i], 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        vox_spec,
        pl.BlockSpec((3 * Wp, Hp), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    out_specs = vox_spec
    out_shape = jax.ShapeDtypeStruct((B, 1, s3), jnp.int32)
    n_prefetch = 3
    aliases = {3: 0}
    args = [ptrs, bpos.reshape(-1), meta.reshape(-1), vox3, depth_planes, cam]
    if with_color:
        n_prefetch = 4
        Hpr = rgb_planes.shape[1]
        in_specs = in_specs + [
            vox_spec,
            pl.BlockSpec((3 * wpr, Hpr), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ]
        out_specs = (out_specs, vox_spec)
        out_shape = (out_shape, jax.ShapeDtypeStruct((B, 1, s3), jnp.int32))
        aliases = {4: 0, 7: 1}
        args = [
            ptrs, bpos.reshape(-1), meta.reshape(-1), meta_rgb.reshape(-1),
            vox3, depth_planes, cam, vox_rgb.reshape(B, 1, s3), rgb_planes,
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
    )
    call = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )
    out = call(*args)
    if with_color:
        return out[0].reshape(B, s3), out[1].reshape(B, s3)
    return out.reshape(B, s3)


def block_proj_bounds(
    bpos: jnp.ndarray,  # [V, 3] int32
    pose: jnp.ndarray,
    proj: jnp.ndarray,
    voxel_size: float,
    block_size: int = 8,
):
    """Projected pixel bounds of each block's 8 corners →
    (umin, umax, vmin, vmax), flat [V] f32 vectors (corners behind the
    camera flood to ±1e9). Flat-vector math: [V, 8]/[V, 3] layouts pad
    their minor dim to 128 lanes and run ~40× under peak."""
    fx, fy, cx, cy = proj[0], proj[1], proj[2], proj[3]
    factor = block_size * voxel_size
    bx = bpos[:, 0].astype(jnp.float32) * factor
    by = bpos[:, 1].astype(jnp.float32) * factor
    bz = bpos[:, 2].astype(jnp.float32) * factor
    R = pose[:3, :3]
    t = pose[:3, 3]
    px0 = R[0, 0] * bx + R[0, 1] * by + R[0, 2] * bz + t[0]
    py0 = R[1, 0] * bx + R[1, 1] * by + R[1, 2] * bz + t[1]
    pz0 = R[2, 0] * bx + R[2, 1] * by + R[2, 2] * bz + t[2]
    umin = jnp.full_like(px0, 1e9)
    umax = jnp.full_like(px0, -1e9)
    vmin = jnp.full_like(px0, 1e9)
    vmax = jnp.full_like(px0, -1e9)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                co = R @ (jnp.array([dx, dy, dz], jnp.float32) * factor)
                z = pz0 + co[2]
                ok = z > 1e-6
                zs = jnp.where(ok, z, 1.0)
                u = jnp.where(ok, fx * (px0 + co[0]) / zs + cx, 1e9)
                v = jnp.where(ok, fy * (py0 + co[1]) / zs + cy, 1e9)
                umin = jnp.minimum(umin, u)
                umax = jnp.maximum(umax, jnp.where(ok, u, -1e9))
                vmin = jnp.minimum(vmin, v)
                vmax = jnp.maximum(vmax, jnp.where(ok, v, -1e9))
    return umin, umax, vmin, vmax


def meta_from_bounds(
    umin: jnp.ndarray,
    vmin: jnp.ndarray,
    valid: jnp.ndarray,
    img_size: Tuple[int, int],
    window: Tuple[int, int],
) -> jnp.ndarray:
    """Aligned window origins for a given window size → meta [V, 3] int32
    (u0/8, v0/128, valid)."""
    H, W = img_size
    Wp = (W + 7) // 8 * 8
    Hp = (H + 127) // 128 * 128
    WU, WV = min(window[0], Wp), min(window[1], Hp)
    u0d8 = jnp.clip(jnp.floor(umin / 8.0).astype(jnp.int32), 0, (Wp - WU) // 8)
    v0d128 = jnp.clip(jnp.floor(vmin / 128.0).astype(jnp.int32), 0, (Hp - WV) // 128)
    return jnp.stack([u0d8, v0d128, valid.astype(jnp.int32)], axis=1)


def block_windows(
    bpos: jnp.ndarray,  # [V, 3] int32
    valid: jnp.ndarray,  # [V] bool
    pose: jnp.ndarray,
    proj: jnp.ndarray,
    img_size: Tuple[int, int],
    voxel_size: float,
    block_size: int = 8,
) -> jnp.ndarray:
    """Aligned depth-window origins per block → (meta [V, 3] int32
    (u0/8, v0/128, valid), clipped [V] bool). Windows anchor at the min
    projected corner so a footprint ≤ (WU−7, WV−127) px is fully covered;
    `clipped` flags on-screen blocks whose footprint exceeds that coverage
    (they fuse partially this frame — the silent-cap counter of SURVEY §5)."""
    H, W = img_size
    WU, WV = _win_dims(img_size)
    umin, umax, vmin, vmax = block_proj_bounds(
        bpos, pose, proj, voxel_size, block_size
    )
    meta = meta_from_bounds(umin, vmin, valid, img_size, (WU, WV))
    on_screen = (umax >= 0) & (umin < W) & (vmax >= 0) & (vmin < H)
    clipped = valid & on_screen & (
        ((umax - jnp.maximum(umin, 0.0)) > (WU - 8))
        | ((vmax - jnp.maximum(vmin, 0.0)) > (WV - 128))
    )
    return meta, clipped


def make_cam_vector(
    pose: jnp.ndarray,
    proj: jnp.ndarray,
    voxel_size: float,
    mu: float,
    max_w: int,
    stop_at_max_w: bool,
    enable: jnp.ndarray | bool,
    img_size: Tuple[int, int],
    M_rgb: jnp.ndarray | None = None,
    proj_rgb: jnp.ndarray | None = None,
) -> jnp.ndarray:
    H, W = img_size
    en = jnp.asarray(enable, jnp.float32).reshape(())
    parts = [
        pose[:3, :3].reshape(-1).astype(jnp.float32),
        pose[:3, 3].astype(jnp.float32),
        jnp.asarray(proj[:4], jnp.float32),
        jnp.array(
            [voxel_size, mu, float(max_w), 1.0 if stop_at_max_w else 0.0],
            jnp.float32,
        ),
        en[None],
        jnp.array([float(H), float(W)], jnp.float32),
        jnp.zeros((9,), jnp.float32),
    ]
    if M_rgb is not None:
        # slots 32..47: rgb-camera extrinsic R(9) t(3) + intrinsics (4)
        parts += [
            M_rgb[:3, :3].reshape(-1).astype(jnp.float32),
            M_rgb[:3, 3].astype(jnp.float32),
            jnp.asarray(proj_rgb[:4], jnp.float32),
        ]
    return jnp.concatenate(parts)


def prep_rgb_planes(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB image (float 0..1) → stacked transposed bf16 channel planes
    [3·Wp, Hp] in 0..255 units (8-bit color values are exact in bf16)."""
    H, W = rgb.shape[:2]
    Wp = (W + 7) // 8 * 8
    Hp = (H + 127) // 128 * 128
    chans = []
    for c in range(3):
        t = jnp.pad(rgb[..., c].T * 255.0, ((0, Wp - W), (0, Hp - H)))
        chans.append(t.astype(jnp.bfloat16))
    return jnp.concatenate(chans, axis=0)


def prep_depth_t(depth: jnp.ndarray) -> jnp.ndarray:
    """Transpose + pad the depth image to the kernel's aligned layout
    [Wp (8·k), Hp (128·k)]; padding reads as 0 (= invalid depth)."""
    H, W = depth.shape
    Wp = (W + 7) // 8 * 8
    Hp = (H + 127) // 128 * 128
    dt = depth.T
    return jnp.pad(dt, ((0, Wp - W), (0, Hp - H)))


def prep_depth_planes(depth: jnp.ndarray) -> jnp.ndarray:
    """Transposed padded depth split into stacked hi/mid/lo bf16 planes
    [3·Wp, Hp] — 24 mantissa bits reconstruct the f32 depth exactly via
    three one-hot dots in the kernel."""
    dt = prep_depth_t(depth)
    hi = dt.astype(jnp.bfloat16)
    r1 = dt - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, mid, lo], axis=0)
