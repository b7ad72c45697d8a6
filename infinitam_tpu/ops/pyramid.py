"""Image-pyramid operations: 2x subsampling (plain and hole-aware) + gradients.

Reference parity: DeviceAgnostic/ITMLowLevelEngine.h:7-123 (filterSubsample,
filterSubsampleWithHoles float/float4, gradientX/gradientY). Whole-image
vectorized: a subsample is a [H/2, W/2, 2, 2] reshape + masked mean — fully
fused by XLA, no gathers.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp


def subsample_box(img: jnp.ndarray) -> jnp.ndarray:
    """Plain 2x box-filter subsample (rgb images). [H,W,...] → [H/2,W/2,...]."""
    H, W = img.shape[0], img.shape[1]
    tail = img.shape[2:]
    v = img[: H - H % 2, : W - W % 2].reshape(H // 2, 2, W // 2, 2, *tail)
    return v.mean(axis=(1, 3))


def subsample_with_holes(img: jnp.ndarray) -> jnp.ndarray:
    """Hole-aware 2x subsample of a scalar map (values <= 0 are holes).

    Averages only valid pixels of each 2x2 cell; all-invalid cells output 0
    (reference: filterSubsampleWithHoles float overload — note the reference
    outputs 0.0, not -1, for empty cells).
    """
    H, W = img.shape
    v = img[: H - H % 2, : W - W % 2].reshape(H // 2, 2, W // 2, 2)
    good = v > 0.0
    cnt = good.sum(axis=(1, 3))
    s = jnp.where(good, v, 0.0).sum(axis=(1, 3))
    return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), 0.0)


def subsample_with_holes_vec(img: jnp.ndarray) -> jnp.ndarray:
    """Hole-aware 2x subsample of a [H,W,4] map (w-channel < 0 = hole).

    All-invalid cells get w = -1 (reference: filterSubsampleWithHoles Vector4f).
    """
    H, W = img.shape[0], img.shape[1]
    v = img[: H - H % 2, : W - W % 2].reshape(H // 2, 2, W // 2, 2, 4)
    good = v[..., 3] >= 0
    cnt = good.sum(axis=(1, 3))
    s = jnp.where(good[..., None], v, 0.0).sum(axis=(1, 3))
    out = jnp.where((cnt > 0)[..., None], s / jnp.maximum(cnt, 1)[..., None], 0.0)
    return out.at[..., 3].set(jnp.where(cnt > 0, out[..., 3], -1.0))


def gradient_x(img: jnp.ndarray) -> jnp.ndarray:
    """Sobel-style horizontal gradient of an rgb image.

    Reference: gradientX — ([-1 0 1] ⊗ [1 2 1]ᵀ)/8 on each channel, border 0.
    img: [H, W, C] float → same shape.
    """
    p = jnp.pad(img, ((1, 1), (1, 1)) + ((0, 0),) * (img.ndim - 2))
    d1 = p[:-2, 2:] - p[:-2, :-2]
    d2 = p[1:-1, 2:] - p[1:-1, :-2]
    d3 = p[2:, 2:] - p[2:, :-2]
    g = (d1 + 2 * d2 + d3) / 8.0
    # zero the one-pixel border like the reference (kernels skip x<1 etc.)
    return _zero_border(g)


def gradient_y(img: jnp.ndarray) -> jnp.ndarray:
    """Sobel-style vertical gradient (reference: gradientY)."""
    p = jnp.pad(img, ((1, 1), (1, 1)) + ((0, 0),) * (img.ndim - 2))
    d1 = p[2:, :-2] - p[:-2, :-2]
    d2 = p[2:, 1:-1] - p[:-2, 1:-1]
    d3 = p[2:, 2:] - p[:-2, 2:]
    g = (d1 + 2 * d2 + d3) / 8.0
    return _zero_border(g)


def _zero_border(img: jnp.ndarray) -> jnp.ndarray:
    mask = jnp.zeros(img.shape[:2], dtype=bool).at[1:-1, 1:-1].set(True)
    if img.ndim > 2:
        mask = mask[..., None]
    return jnp.where(mask, img, 0.0)


def build_depth_pyramid(depth: jnp.ndarray, n_levels: int) -> List[jnp.ndarray]:
    """Fine→coarse hole-aware depth pyramid (level 0 = input).

    Reference: ITMDepthTracker::PrepareForEvaluation — FilterSubsampleWithHoles
    per level."""
    levels = [depth]
    for _ in range(n_levels - 1):
        levels.append(subsample_with_holes(levels[-1]))
    return levels


def build_rgb_pyramid(rgb: jnp.ndarray, n_levels: int) -> List[jnp.ndarray]:
    levels = [rgb]
    for _ in range(n_levels - 1):
        levels.append(subsample_box(levels[-1]))
    return levels
