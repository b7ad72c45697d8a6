"""Golden-value tests for pixel/pyramid/view ops against the reference math
(reference: ITMPixelUtils.h, ITMLowLevelEngine.h, ITMViewBuilder.h)."""

import jax.numpy as jnp
import numpy as np

from infinitam_tpu.calib import default_calib, read_rgbd_calib
from infinitam_tpu.ops import pixel, pyramid, view_ops


def test_bilinear_exact_corners():
    img = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    assert float(pixel.bilinear(img, jnp.array(1.0), jnp.array(2.0))) == 9.0
    # midpoint of (0,0),(1,0),(0,1),(1,1) = mean(0,1,4,5) = 2.5
    assert float(pixel.bilinear(img, jnp.array(0.5), jnp.array(0.5))) == 2.5


def test_bilinear_with_holes_scalar():
    img = jnp.array([[1.0, -1.0], [2.0, 3.0]])
    # sample away from the hole: integer coordinate (0,0) ignores other corners
    v, ok = pixel.bilinear_with_holes_scalar(img, jnp.array(0.0), jnp.array(0.0))
    assert bool(ok) and float(v) == 1.0
    # sample touching the hole is invalid
    v, ok = pixel.bilinear_with_holes_scalar(img, jnp.array(0.5), jnp.array(0.0))
    assert not bool(ok) and float(v) == -1.0


def test_bilinear_with_holes_vec():
    img = jnp.zeros((2, 2, 4)).at[..., 3].set(1.0).at[0, 0, 0].set(4.0)
    v, ok = pixel.bilinear_with_holes_vec(img, jnp.array(0.5), jnp.array(0.5))
    assert bool(ok)
    np.testing.assert_allclose(float(v[0]), 1.0)  # 4 * 0.25
    img_hole = img.at[1, 1, 3].set(-1.0)
    _, ok = pixel.bilinear_with_holes_vec(img_hole, jnp.array(0.5), jnp.array(0.5))
    assert not bool(ok)


def test_subsample_with_holes():
    img = jnp.array(
        [[1.0, -1.0, 2.0, 2.0], [3.0, -1.0, 2.0, 2.0], [-1.0, -1.0, 5.0, 7.0], [-1.0, -1.0, 9.0, 3.0]]
    )
    out = pyramid.subsample_with_holes(img)
    assert out.shape == (2, 2)
    np.testing.assert_allclose(out[0, 0], 2.0)  # mean(1,3)
    np.testing.assert_allclose(out[0, 1], 2.0)
    np.testing.assert_allclose(out[1, 0], 0.0)  # all holes → 0 (ref semantics)
    np.testing.assert_allclose(out[1, 1], 6.0)  # mean(5,7,9,3)


def test_subsample_box():
    img = jnp.arange(16, dtype=jnp.float32).reshape(4, 4)
    out = pyramid.subsample_box(img)
    np.testing.assert_allclose(out[0, 0], np.mean([0, 1, 4, 5]))


def test_gradient_x_constant_ramp():
    # image = x → gradient_x = 1 everywhere in the interior
    img = jnp.tile(jnp.arange(8, dtype=jnp.float32)[None, :, None], (8, 1, 1))
    g = pyramid.gradient_x(img)
    np.testing.assert_allclose(g[2:-2, 2:-2, 0], 1.0, atol=1e-6)
    g_y = pyramid.gradient_y(img)
    np.testing.assert_allclose(g_y[2:-2, 2:-2, 0], 0.0, atol=1e-6)


def test_disparity_to_depth_kinect():
    # depth = 8·b·fx/(a − d): a=1135.09, b=0.0819141, fx=573.71 (Teddy calib)
    a, b, fx = 1135.09, 0.0819141, 573.71
    disp = jnp.array([[500.0]], dtype=jnp.float32)
    d = view_ops.disparity_to_depth(disp, a, b, fx)
    expected = 8.0 * b * fx / (a - 500.0)
    np.testing.assert_allclose(d[0, 0], expected, rtol=1e-6)


def test_depth_affine():
    raw = jnp.array([[1000, 0, 40000]], dtype=jnp.int32)
    d = view_ops.depth_affine_to_float(raw, 1.0 / 1000.0, 0.0)
    np.testing.assert_allclose(d[0], [1.0, -1.0, -1.0])


def test_bilateral_filter_preserves_constant():
    img = jnp.full((12, 12), 1.5)
    out = view_ops.bilateral_filter_depth(img)
    np.testing.assert_allclose(out, 1.5, atol=1e-5)


def test_normals_flat_wall():
    calib = default_calib(32, 24)
    depth = jnp.full((24, 32), 2.0)
    normals, sigma = view_ops.compute_normals_and_weights(depth, calib.intrinsics_d)
    inner = normals[2:-2, 2:-2]
    # wall perpendicular to the optical axis → normal ±z
    np.testing.assert_allclose(np.abs(np.asarray(inner[..., 2])), 1.0, atol=1e-4)
    assert np.all(np.asarray(inner[..., 3]) == 1.0)
    assert np.all(np.asarray(sigma[2:-2, 2:-2]) > 0)


def test_calib_parser_teddy_format():
    text = """640 480
504.261 503.905
352.457 272.202

640 480
573.71 574.394
346.471 249.031

0.999749 0.00518867 0.0217975 0.0243073
-0.0051649 0.999986 -0.0011465 -0.000166518
-0.0218031 0.00103363 0.999762 0.0151706

1135.09 0.0819141
"""
    calib = read_rgbd_calib(text)
    assert calib.intrinsics_rgb.fx == 504.261
    assert calib.intrinsics_d.fy == 574.394
    assert calib.disparity.type == "kinect"
    assert calib.disparity.a == 1135.09
    M = calib.rgb_to_depth
    np.testing.assert_allclose(M[0, 3], 0.0243073, rtol=1e-6)
    np.testing.assert_allclose(M[3], [0, 0, 0, 1])


def test_printf_mask():
    from infinitam_tpu.utils.image_io import expand_printf_mask

    assert expand_printf_mask("Frames/%04i.ppm", 7) == "Frames/0007.ppm"
    assert expand_printf_mask("img_%i.pgm", 12) == "img_12.pgm"
