"""Bilinear image sampling, plain and hole-aware, vectorized over sample grids.

Reference parity: DeviceAgnostic/ITMPixelUtils.h:11-93 (interpolateBilinear,
interpolateBilinear_withHoles, interpolateBilinear_withHoles_single). Instead
of per-pixel scalar functions these operate on whole coordinate arrays, which
XLA lowers to batched gathers.

Conventions: images are [H, W] (scalar) or [H, W, C]; sample coordinates are
(x, y) float arrays of any matching shape. Validity: scalar images use
value < 0 as hole; vec4 images use channel 3 ("w") < 0 as hole.
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather2d(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """img[iy, ix] with clamped indices. img: [H, W, ...]."""
    H, W = img.shape[0], img.shape[1]
    ix = jnp.clip(ix, 0, W - 1)
    iy = jnp.clip(iy, 0, H - 1)
    return img[iy, ix]


def bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Plain bilinear interpolation. Returns shape x.shape (+ channels)."""
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    ix, iy = x0.astype(jnp.int32), y0.astype(jnp.int32)
    a = _gather2d(img, ix, iy)
    b = _gather2d(img, ix + 1, iy)
    c = _gather2d(img, ix, iy + 1)
    d = _gather2d(img, ix + 1, iy + 1)
    if img.ndim > 2:
        dx = dx[..., None]
        dy = dy[..., None]
    return (
        a * (1 - dx) * (1 - dy) + b * dx * (1 - dy) + c * (1 - dx) * dy + d * dx * dy
    )


def bilinear_with_holes_vec(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Hole-aware bilinear for [H, W, 4] maps whose w-channel flags validity.

    Returns (value [..., 4], valid bool). Any invalid corner invalidates the
    sample (reference: interpolateBilinear_withHoles, all-four gate).
    """
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0)[..., None]
    dy = (y - y0)[..., None]
    ix, iy = x0.astype(jnp.int32), y0.astype(jnp.int32)
    a = _gather2d(img, ix, iy)
    b = _gather2d(img, ix + 1, iy)
    c = _gather2d(img, ix, iy + 1)
    d = _gather2d(img, ix + 1, iy + 1)
    valid = (a[..., 3] >= 0) & (b[..., 3] >= 0) & (c[..., 3] >= 0) & (d[..., 3] >= 0)
    val = a * (1 - dx) * (1 - dy) + b * dx * (1 - dy) + c * (1 - dx) * dy + d * dx * dy
    return val, valid


def bilinear_with_holes_scalar(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Hole-aware bilinear for scalar maps (negative = hole).

    Matches interpolateBilinear_withHoles_single: corners that do not
    contribute (zero weight) do not invalidate the sample.
    """
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    ix, iy = x0.astype(jnp.int32), y0.astype(jnp.int32)
    a = _gather2d(img, ix, iy)
    b = jnp.where(dx != 0, _gather2d(img, ix + 1, iy), 0.0)
    c = jnp.where(dy != 0, _gather2d(img, ix, iy + 1), 0.0)
    d = jnp.where((dx != 0) & (dy != 0), _gather2d(img, ix + 1, iy + 1), 0.0)
    valid = (a >= 0) & (b >= 0) & (c >= 0) & (d >= 0)
    val = a * (1 - dx) * (1 - dy) + b * dx * (1 - dy) + c * (1 - dx) * dy + d * dx * dy
    return jnp.where(valid, val, -1.0), valid


def in_bounds(x: jnp.ndarray, y: jnp.ndarray, width: int, height: int, margin: int = 0):
    """Pixel-coordinate bounds check with an optional safety margin."""
    return (
        (x >= margin) & (x < width - 1 - margin) & (y >= margin) & (y < height - 1 - margin)
    )
