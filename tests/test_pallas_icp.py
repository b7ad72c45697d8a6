"""Oracle equivalence of the Pallas ICP residual kernel (interpret mode).

The kernel (ops/pallas/icp_kernel.py) must reproduce ops/icp.compute_residuals
— same residuals, Jacobians and valid set — up to its documented bf16-split
tap precision (~2e-5 relative) for pixels inside the per-level window budget.
Reference semantics: DeviceAgnostic/ITMDepthTracker.h:8-105.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from infinitam_tpu.ops import icp
from infinitam_tpu.ops.pallas import icp_kernel as ik
from infinitam_tpu.utils import se3


def make_scene(H=64, W=64, seed=0):
    """Smooth synthetic maps + depth with some holes."""
    rng = np.random.default_rng(seed)
    proj = jnp.array([80.0, 80.0, W / 2 - 0.5, H / 2 - 0.5], jnp.float32)
    xs = np.arange(W, dtype=np.float32)[None, :]
    ys = np.arange(H, dtype=np.float32)[:, None]
    z = 1.5 + 0.2 * np.sin(xs / 17.0) * np.cos(ys / 13.0)
    px = z * (xs - float(proj[2])) / float(proj[0])
    py = z * (ys - float(proj[3])) / float(proj[1])
    pts = np.stack([px, py, z, np.ones_like(z)], -1)
    holes = rng.uniform(size=(H, W)) < 0.07
    pts[..., 3] = np.where(holes, -1.0, 1.0)
    n = np.zeros((H, W, 4), np.float32)
    n[..., 2] = -1.0
    n[..., 0] = 0.1 * np.sin(ys / 11.0)
    nrm = np.linalg.norm(n[..., :3], axis=-1, keepdims=True)
    n[..., :3] /= nrm
    n[..., 3] = pts[..., 3]
    depth = z + rng.normal(0, 0.002, size=z.shape).astype(np.float32)
    depth[rng.uniform(size=depth.shape) < 0.05] = -1.0
    return (
        jnp.asarray(depth, jnp.float32),
        proj,
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(n, jnp.float32),
    )


def untile_to_rowmajor(flat, h, w):
    """Invert icp_kernel.tileize order → [h, w] (cropping tile padding)."""
    th = (h + 15) // 16
    tw = (w + 15) // 16
    a = np.asarray(flat).reshape(th, tw, 16, 16).transpose(0, 2, 1, 3)
    return a.reshape(th * 16, tw * 16)[:h, :w]


@pytest.mark.parametrize("level", [0, 1])
def test_residuals_match_oracle(level):
    depth, proj, pts, nrm = make_scene()
    H, W = depth.shape
    h, w = H >> level, W >> level
    d_lvl = depth[::2, ::2] if level == 1 else depth
    vproj = proj * (0.5**level)

    # small pose offset typical of inter-frame motion
    step = jnp.array([0.004, -0.006, 0.003, 0.004, -0.002, 0.006], jnp.float32)
    inv_pose = se3.se3_exp(step)
    scene_pose = jnp.eye(4, dtype=jnp.float32)

    b_o, A_o, valid_o, _ = icp.compute_residuals(
        d_lvl, vproj, pts, nrm, proj, inv_pose, scene_pose, 0.04
    )

    planes = ik.prep_maps(pts, nrm)
    b_k, A_k, valid_k = ik.residuals_tiles(
        d_lvl, vproj, planes, proj, inv_pose, scene_pose, 0.04,
        (H, W), level, interpret=True,
    )
    b_k2 = untile_to_rowmajor(b_k, h, w)
    valid_k2 = untile_to_rowmajor(valid_k.astype(np.float32), h, w) > 0.5
    A_k2 = np.stack(
        [untile_to_rowmajor(A_k[:, j], h, w) for j in range(6)], axis=-1
    )

    valid_o = np.asarray(valid_o)
    # valid sets agree except borderline pixels whose dist/hole gates sit at
    # the tap-precision boundary
    agree = valid_o == valid_k2
    assert agree.mean() > 0.995, f"valid-set agreement {agree.mean():.4f}"
    both = valid_o & valid_k2
    assert both.sum() > 100
    db = np.abs(np.asarray(b_o) - b_k2)[both]
    dA = np.abs(np.asarray(A_o) - A_k2)[both].max(axis=-1)
    assert db.max() < 5e-4, f"b mismatch {db.max():.2e}"
    assert dA.max() < 5e-3, f"A mismatch {dA.max():.2e}"


def test_reduction_matches_oracle():
    """GH reduction over kernel outputs ≈ oracle reduction."""
    depth, proj, pts, nrm = make_scene(seed=3)
    H, W = depth.shape
    inv_pose = se3.se3_exp(jnp.array([0.002, 0.001, -0.003, 0.002, 0.004, -0.001], jnp.float32))
    scene_pose = jnp.eye(4, dtype=jnp.float32)

    b_o, A_o, valid_o, _ = icp.compute_residuals(
        depth, proj, pts, nrm, proj, inv_pose, scene_pose, 0.04
    )
    gh_o = icp.reduce_gh(b_o, A_o, valid_o, 100)

    planes = ik.prep_maps(pts, nrm)
    b_k, A_k, valid_k = ik.residuals_tiles(
        depth, proj, planes, proj, inv_pose, scene_pose, 0.04, (H, W), 0,
        interpret=True,
    )
    gh_k = icp.reduce_gh(b_k, A_k, valid_k, 100)

    assert abs(int(gh_o.num_valid) - int(gh_k.num_valid)) <= max(
        3, 0.005 * int(gh_o.num_valid)
    )
    np.testing.assert_allclose(gh_k.f, gh_o.f, rtol=2e-2)
    np.testing.assert_allclose(gh_k.nabla, gh_o.nabla, rtol=5e-2, atol=5e-3)
    np.testing.assert_allclose(gh_k.hessian, gh_o.hessian, rtol=5e-2, atol=5e-2)


def test_window_follows_displaced_pose():
    """The in-kernel window origin (per-tile min of the tile's OWN projected
    pixels) must track a displaced pose: residuals stay valid when the
    projection shifts by tens of pixels."""
    depth, proj, pts, nrm = make_scene(seed=5)
    H, W = depth.shape
    planes = ik.prep_maps(pts, nrm)
    # a pose that shifts the projection substantially
    pose = np.eye(4, dtype=np.float32)
    pose[0, 3] = 0.25  # 0.25 m lateral → ~13 px at f=80, z=1.5
    inv_pose = se3.invert(jnp.asarray(pose))
    b, A, valid = ik.residuals_tiles(
        depth, proj, planes, proj, inv_pose, jnp.eye(4), 0.1 * 0.1,
        (H, W), 0, interpret=True,
    )
    b0, A0, valid0, _ = icp.compute_residuals(
        depth, proj, pts, nrm, proj, inv_pose, jnp.eye(4), 0.1 * 0.1
    )
    vk = untile_to_rowmajor(valid, H, W)
    vo = np.asarray(valid0).reshape(H, W)
    # the kernel may lose rows beyond its window budget, but must keep the
    # overwhelming majority of the oracle's valid set
    keep = (vk & vo).sum() / max(vo.sum(), 1)
    assert keep > 0.95, f"kernel kept only {keep:.3f} of oracle-valid pixels"
