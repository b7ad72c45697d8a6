"""SE(3) golden-value and round-trip tests (reference: ITMPose.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from infinitam_tpu.utils import se3


def test_exp_identity():
    M = se3.se3_exp(jnp.zeros(6))
    np.testing.assert_allclose(M, np.eye(4), atol=1e-6)


def test_exp_pure_translation():
    M = se3.se3_exp(jnp.array([0.1, -0.2, 0.3, 0, 0, 0]))
    np.testing.assert_allclose(M[:3, 3], [0.1, -0.2, 0.3], atol=1e-6)
    np.testing.assert_allclose(M[:3, :3], np.eye(3), atol=1e-6)


def test_exp_rotation_90deg_z():
    # ω = (0, 0, π/2): rotation by 90° about z
    M = se3.se3_exp(jnp.array([0, 0, 0, 0, 0, np.pi / 2]))
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(M[:3, :3], expected, atol=1e-3)  # f32 π/2


def test_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        twist = rng.uniform(-1, 1, size=6).astype(np.float32)
        M = se3.se3_exp(jnp.asarray(twist))
        back = se3.se3_log(M)
        np.testing.assert_allclose(back, twist, atol=2e-5)


def test_log_small_angle():
    twist = np.array([0.01, 0.02, -0.01, 1e-5, -2e-5, 1e-5], dtype=np.float32)
    M = se3.se3_exp(jnp.asarray(twist))
    np.testing.assert_allclose(se3.se3_log(M), twist, atol=1e-6)


def test_invert():
    M = se3.se3_exp(jnp.array([0.3, 0.1, -0.2, 0.4, -0.1, 0.2]))
    np.testing.assert_allclose(se3.invert(M) @ M, np.eye(4), atol=1e-5)


def test_coerce_restores_orthonormality():
    M = se3.se3_exp(jnp.array([0.1, 0.0, 0.0, 0.3, 0.2, -0.1]))
    M_perturbed = M.at[:3, :3].add(0.01 * jnp.ones((3, 3)))
    C = se3.coerce(M_perturbed)
    R = np.asarray(C[:3, :3])
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-4)
    np.testing.assert_allclose(C[:3, 3], M_perturbed[:3, 3], atol=1e-7)


def test_apply_matches_matmul():
    M = se3.se3_exp(jnp.array([0.3, 0.1, -0.2, 0.4, -0.1, 0.2]))
    p = jnp.array([0.5, -0.7, 1.2])
    expected = (M @ jnp.append(p, 1.0))[:3]
    np.testing.assert_allclose(se3.apply(M, p), expected, atol=1e-6)


def test_batched_exp():
    twists = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, size=(5, 6)), dtype=jnp.float32)
    Ms = se3.se3_exp(twists)
    assert Ms.shape == (5, 4, 4)
    for i in range(5):
        np.testing.assert_allclose(Ms[i], se3.se3_exp(twists[i]), atol=1e-6)
