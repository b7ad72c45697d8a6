"""View building ops: raw depth conversion, bilateral filtering, normals+noise.

Reference parity: DeviceAgnostic/ITMViewBuilder.h:7-114
(convertDisparityToDepth, convertDepthAffineToFloat, filterDepth,
computeNormalAndWeight). Vectorized over the full image; the 5x5 bilateral
filter is expressed with static shifts so XLA fuses it into one elementwise
program.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# reference: MEAN_SIGMA_L in ITMViewBuilder.h:30
_MEAN_SIGMA_L = 1.2232


def disparity_to_depth(disparity: jnp.ndarray, a: float, b: float, fx_depth: float) -> jnp.ndarray:
    """Kinect disparity→metric depth: 8·b·fx/(a − d); invalid → -1.

    Reference: convertDisparityToDepth (ITMViewBuilder.h:7-20)."""
    disp = a - disparity.astype(jnp.float32)
    depth = jnp.where(disp == 0.0, 0.0, 8.0 * b * fx_depth / jnp.where(disp == 0.0, 1.0, disp))
    return jnp.where(depth > 0.0, depth, -1.0)


def depth_affine_to_float(raw: jnp.ndarray, a: float, b: float) -> jnp.ndarray:
    """Affine raw→metric depth: a·raw + b; raw<=0 or >32000 invalid → -1.

    Reference: convertDepthAffineToFloat (ITMViewBuilder.h:22-28)."""
    raw = raw.astype(jnp.float32)
    invalid = (raw <= 0) | (raw > 32000)
    return jnp.where(invalid, -1.0, raw * a + b)


def bilateral_filter_depth(depth: jnp.ndarray) -> jnp.ndarray:
    """One pass of the reference's depth-adaptive 5x5 bilateral filter
    (reference: filterDepth, ITMViewBuilder.h:31-53; applied 5x by the view
    builder). Border pixels (2px) are passed through unfiltered — the
    reference kernels skip x<2 etc., leaving the scratch copy in place."""
    z = depth
    valid = z >= 0.0
    sigma_z = 1.0 / (
        0.0012
        + 0.0019 * (z - 0.4) ** 2
        + 0.0001 / jnp.sqrt(jnp.maximum(z, 1e-6)) * 0.25
    )
    num = jnp.zeros_like(z)
    den = jnp.zeros_like(z)
    H, W = z.shape
    padded = jnp.pad(z, 2, constant_values=-1.0)
    for i in range(-2, 3):
        for j in range(-2, 3):
            tmpz = padded[2 + i : 2 + i + H, 2 + j : 2 + j + W]
            ok = tmpz >= 0.0
            dz2 = (tmpz - z) ** 2
            w = jnp.exp(
                -0.5
                * (
                    (abs(i) + abs(j)) * _MEAN_SIGMA_L * _MEAN_SIGMA_L
                    + dz2 * sigma_z * sigma_z
                )
            )
            w = jnp.where(ok, w, 0.0)
            num = num + w * jnp.where(ok, tmpz, 0.0)
            den = den + w
    filtered = jnp.where(den > 0, num / jnp.maximum(den, 1e-20), -1.0)
    out = jnp.where(valid, filtered, -1.0)
    border = jnp.zeros_like(valid).at[2:-2, 2:-2].set(True)
    return jnp.where(border, out, z)


def compute_normals_and_weights(depth: jnp.ndarray, intrinsics) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel surface normal (camera frame) + depth-noise sigma for WICP.

    Reference: computeNormalAndWeight (ITMViewBuilder.h:55-114). Returns
    (normals [H,W,4] with w=±1 validity, sigma_z [H,W] with -1 invalid).
    """
    H, W = depth.shape
    fx, fy, cx, cy = intrinsics.fx, intrinsics.fy, intrinsics.cx, intrinsics.cy
    # The reference passes intrinparam = (1/fx, 1/fy, cx, cy) — "projParams
    # inverted" — and multiplies, so unproject uses x*z/fx etc.
    inv_fx, inv_fy = 1.0 / fx, 1.0 / fy

    p = jnp.pad(depth, 1, constant_values=-1.0)
    z = depth
    zxp = p[1 : 1 + H, 2 : 2 + W]  # depth at (x+1, y)
    zxm = p[1 : 1 + H, 0:W]  # (x-1, y)
    zyp = p[2 : 2 + H, 1 : 1 + W]  # (x, y+1)
    zym = p[0:H, 1 : 1 + W]  # (x, y-1)

    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]

    def unproject(zv, x_pix, y_pix):
        return jnp.stack(
            [zv * (x_pix - cx) * inv_fx, zv * (y_pix - cy) * inv_fy, zv], axis=-1
        )

    xp1 = unproject(zxp, xs + 1.0, ys + 0 * xs)
    xm1 = unproject(zxm, xs - 1.0, ys + 0 * xs)
    yp1 = unproject(zyp, xs + 0 * ys, ys + 1.0)
    ym1 = unproject(zym, xs + 0 * ys, ys - 1.0)

    diff_x = xp1 - xm1
    diff_y = yp1 - ym1
    n = jnp.cross(diff_x, diff_y)
    norm = jnp.linalg.norm(n, axis=-1)
    valid = (z >= 0) & (zxp > 0) & (zxm > 0) & (zyp > 0) & (zym > 0) & (norm > 0)
    n = n / jnp.maximum(norm, 1e-20)[..., None]

    theta = jnp.arccos(jnp.clip(n[..., 2], -1.0, 1.0))
    denom = math.pi * 0.5 - theta
    theta_diff = theta / jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
    sigma = (
        0.0012
        + 0.0019 * (z - 0.4) ** 2
        + 0.0001 / jnp.sqrt(jnp.maximum(z, 1e-6)) * theta_diff**2
    )

    normals = jnp.concatenate(
        [n, jnp.where(valid, 1.0, -1.0)[..., None]], axis=-1
    )
    normals = jnp.where(valid[..., None], normals, jnp.array([0.0, 0.0, 0.0, -1.0]))
    sigma = jnp.where(valid, sigma, -1.0)
    return normals, sigma
