"""Point-to-plane ICP: per-pixel residuals/Jacobians + Gauss-Newton machinery.

Reference parity:
- residual/Jacobian: DeviceAgnostic/ITMDepthTracker.h:8-105
  (computePerPointGH_Depth_Ab / computePerPointGH_Depth) and the weighted
  variant DeviceAgnostic/ITMWeightedICPTracker.h.
- reduction + f: ITMDepthTracker_CPU.cpp:14-79 (ComputeGandH —
  f = N>100 ? √(Σb²)/N : 1e5; hessian/nabla summed over valid pixels).
- solve/update: ITMDepthTracker.cpp:85-143 (ComputeDelta Cholesky 6×6/3×3,
  ApplyDelta small-angle Tinc, Levenberg λ accept/reject in TrackCamera).

TPU-native design: the per-pixel (b, A) terms form a [N, 6] Jacobian; the
normal equations are one [6, N]@[N, 6] matmul on the MXU (`einsum ni,nj`),
with NO host round-trips — the entire level loop, λ adaptation and the 6×6
solve run inside one jitted program (kills the per-iteration D2H sync of
ITMDepthTracker_CUDA.cu:99).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from infinitam_tpu.ops.pixel import bilinear_with_holes_vec
from infinitam_tpu.utils import se3

MODE_ROTATION = "rotation"
MODE_TRANSLATION = "translation"
MODE_BOTH = "both"


class GHResult(NamedTuple):
    f: jnp.ndarray  # scalar: √(Σb²)/N, or 1e5 when N ≤ min_valid
    nabla: jnp.ndarray  # [6]
    hessian: jnp.ndarray  # [6, 6]
    num_valid: jnp.ndarray  # scalar int


def compute_residuals(
    depth: jnp.ndarray,  # [H, W] metric depth at the current pyramid level
    view_proj: jnp.ndarray,  # (fx, fy, cx, cy) at this level
    points_map: jnp.ndarray,  # [Hs, Ws, 4] scene points (metres, w=±1)
    normals_map: jnp.ndarray,  # [Hs, Ws, 4] scene normals
    scene_proj: jnp.ndarray,  # (fx, fy, cx, cy) at this level
    approx_inv_pose: jnp.ndarray,  # [4,4] camera→world, current estimate
    scene_pose: jnp.ndarray,  # [4,4] world→camera of the raycast maps
    dist_thresh: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """All-pixel residuals b [H,W], Jacobian rows A [H,W,6], valid mask, and
    the world-frame point p (for the weighted variant).

    A layout matches the reference step layout: A[0:3] = n×p (rotation),
    A[3:6] = n (translation).
    """
    H, W = depth.shape
    Hs, Ws = points_map.shape[:2]
    vfx, vfy, vcx, vcy = view_proj[0], view_proj[1], view_proj[2], view_proj[3]
    sfx, sfy, scx, scy = scene_proj[0], scene_proj[1], scene_proj[2], scene_proj[3]

    valid = depth > 1e-8

    xs = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, axis=0)
    ys = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, axis=1)
    d = jnp.where(valid, depth, 1.0)
    p_cam = jnp.stack(
        [d * (xs - vcx) / vfx, d * (ys - vcy) / vfy, d], axis=-1
    )
    p = jnp.einsum("ij,hwj->hwi", approx_inv_pose[:3, :3], p_cam) + approx_inv_pose[:3, 3]

    p_scene = jnp.einsum("ij,hwj->hwi", scene_pose[:3, :3], p) + scene_pose[:3, 3]
    z = p_scene[..., 2]
    valid &= z > 0
    zs = jnp.where(valid, z, 1.0)
    u = sfx * p_scene[..., 0] / zs + scx
    v = sfy * p_scene[..., 1] / zs + scy
    valid &= (u >= 0) & (u <= Ws - 2) & (v >= 0) & (v <= Hs - 2)

    uc = jnp.clip(u, 0.0, Ws - 2.0)
    vc = jnp.clip(v, 0.0, Hs - 2.0)
    target_pt, pt_ok = bilinear_with_holes_vec(points_map, uc, vc)
    valid &= pt_ok

    diff = target_pt[..., :3] - p
    dist = jnp.sum(diff * diff, axis=-1)
    valid &= dist <= dist_thresh

    target_n, _n_ok = bilinear_with_holes_vec(normals_map, uc, vc)
    n = target_n[..., :3]

    b = jnp.sum(n * diff, axis=-1)
    a_rot = jnp.cross(n, p)  # n×p, matches reference A[0..2]
    A = jnp.concatenate([a_rot, n], axis=-1)
    return b, A, valid, p


def reduce_gh(
    b: jnp.ndarray,
    A: jnp.ndarray,
    valid: jnp.ndarray,
    min_valid: int = 100,
    weights: Optional[jnp.ndarray] = None,
) -> GHResult:
    """Normal-equation reduction: one masked matmul over the pixel axis.

    weights: optional per-pixel scale w applied to the Jacobian rows
    (reference DeviceAgnostic/ITMWeightedICPTracker.h scales the
    correspondence normal: H += (wA)(wA)ᵀ, ∇ += b·(wA), f += (wb)²).
    """
    w = valid.astype(b.dtype)
    if weights is not None:
        w = w * weights
    Af = A.reshape(-1, 6) * w.reshape(-1, 1)
    bf = b.reshape(-1) * w.reshape(-1)
    b_valid = b.reshape(-1) * valid.astype(b.dtype).reshape(-1)
    # Σ (wA)(wA)ᵀ as a [6,N]@[N,6] matmul (MXU) — mask folded into Af.
    hessian = jnp.einsum("ni,nj->ij", Af, Af, preferred_element_type=jnp.float32)
    nabla = jnp.einsum("n,ni->i", b_valid, Af, preferred_element_type=jnp.float32)
    sum_f = jnp.sum(bf * bf)
    n_valid = jnp.sum(valid)
    f = jnp.where(n_valid > min_valid, jnp.sqrt(jnp.abs(sum_f)) / jnp.maximum(n_valid, 1), 1e5)
    return GHResult(f=f, nabla=nabla, hessian=hessian, num_valid=n_valid)


def solve_delta(
    nabla: jnp.ndarray, hessian: jnp.ndarray, lam: jnp.ndarray, mode: str
) -> jnp.ndarray:
    """Levenberg-damped solve → step[6] in the reference's ApplyDelta layout
    (step[0:3] rotation, step[3:6] translation).

    Reference: TrackCamera damping `A[i+i*6] *= 1+λ` + ComputeDelta Cholesky.
    """
    if mode == MODE_BOTH:
        Amat = hessian * (1.0 + lam * jnp.eye(6, dtype=hessian.dtype))
        step = _solve_psd(Amat, nabla)
        return step
    if mode == MODE_ROTATION:
        sub = hessian[:3, :3]
        g = nabla[:3]
    else:  # translation
        sub = hessian[3:, 3:]
        g = nabla[3:]
    Amat = sub * (1.0 + lam * jnp.eye(3, dtype=hessian.dtype))
    s = _solve_psd(Amat, g)
    if mode == MODE_ROTATION:
        return jnp.concatenate([s, jnp.zeros(3, dtype=s.dtype)])
    return jnp.concatenate([jnp.zeros(3, dtype=s.dtype), s])


def _solve_psd(Amat: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Cholesky solve with a singularity guard (zero step on failure)."""
    eps = 1e-20 * jnp.eye(Amat.shape[0], dtype=Amat.dtype)
    L = jnp.linalg.cholesky(Amat + eps)
    ok = jnp.all(jnp.isfinite(L))
    Lsafe = jnp.where(ok, L, jnp.eye(Amat.shape[0], dtype=Amat.dtype))
    y = jax.scipy.linalg.solve_triangular(Lsafe, g, lower=True)
    s = jax.scipy.linalg.solve_triangular(Lsafe.T, y, lower=False)
    return jnp.where(ok & jnp.all(jnp.isfinite(s)), s, jnp.zeros_like(g))


def apply_delta(approx_inv_pose: jnp.ndarray, step: jnp.ndarray) -> jnp.ndarray:
    """Left-multiply the small-angle increment onto the camera→world pose
    (reference: ApplyDelta — Tinc rotation part is I − [ω]× in row-major
    terms, translation step[3:6])."""
    w, t = step[:3], step[3:]
    eye = jnp.eye(3, dtype=approx_inv_pose.dtype)
    Tinc = se3.pack_rt(eye - se3.skew(w), t)
    return Tinc @ approx_inv_pose


def has_converged(step: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """|step|/6 < threshold (reference: HasConverged)."""
    return jnp.sqrt(jnp.sum(step * step)) / 6.0 < threshold
