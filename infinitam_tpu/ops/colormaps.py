"""Display colormaps for depth / normal / weight images.

Reference parity: the static CPU helpers on the visualisation-engine
interface — DepthToUchar4 (jet-style rainbow over the valid depth range),
NormalToUchar4, WeightToUchar4 (ITMLib/Engine/ITMVisualisationEngine.cpp:19-107)
— re-expressed as vectorized jittable JAX ops (min/max reductions instead of
the reference's serial scans)."""

from __future__ import annotations

import jax.numpy as jnp


def _base(val: jnp.ndarray) -> jnp.ndarray:
    """Jet-colormap base ramp (reference `base`, ITMVisualisationEngine.cpp:11-17):
    0 below -0.75, ramp up to 1 by -0.25, flat 1 to 0.25, ramp down to 0 by 0.75."""
    up = (val + 0.75) / 0.5
    down = 1.0 - (val - 0.25) / 0.5
    return jnp.clip(jnp.minimum(up, down), 0.0, 1.0)


def depth_to_uchar4(depth: jnp.ndarray) -> jnp.ndarray:
    """Rainbow depth visualization (reference DepthToUchar4,
    ITMVisualisationEngine.cpp:19-58): normalize valid (>0) depths to [0,1]
    over their min/max, map through the jet base at offsets (-.5, 0, +.5);
    invalid pixels black. Returns [H,W,4] uint8."""
    d = depth.astype(jnp.float32)
    valid = d > 0.0
    big = jnp.float32(1e5)
    lo = jnp.min(jnp.where(valid, d, big))
    hi = jnp.max(jnp.where(valid, d, -big))
    span = hi - lo
    scale = jnp.where(span != 0.0, 1.0 / jnp.where(span != 0.0, span, 1.0), 1.0 / hi)
    t = (d - lo) * scale
    r = _base(t - 0.5)
    g = _base(t)
    b = _base(t + 0.5)
    rgba = jnp.stack([r, g, b, jnp.ones_like(t)], axis=-1)
    rgba = jnp.where(valid[..., None] & (span != 0.0), rgba, 0.0)
    return (rgba * 255.0).astype(jnp.uint8)


def normal_to_uchar4(normals: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Normal-map visualization (reference NormalToUchar4,
    ITMVisualisationEngine.cpp:60-81): 0.3 + (n+1)*0.35 per channel.
    normals [H,W,3], valid [H,W] bool. Returns [H,W,4] uint8."""
    shade = 0.3 + (normals.astype(jnp.float32) + 1.0) * 0.35
    rgba = jnp.concatenate([shade, jnp.zeros_like(shade[..., :1])], axis=-1)
    rgba = jnp.where(valid[..., None], rgba, 0.0)
    return (jnp.clip(rgba, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def weight_to_uchar4(weights: jnp.ndarray) -> jnp.ndarray:
    """Confidence visualization (reference WeightToUchar4,
    ITMVisualisationEngine.cpp:84-107): s = min_valid/w * 0.8 + 0.2;
    red = 1-s, green = s, blue = 0. Returns [H,W,4] uint8."""
    w = weights.astype(jnp.float32)
    valid = w > 0.0
    mn = jnp.min(jnp.where(valid, w, jnp.float32(1000.0)))
    s = mn / jnp.where(valid, w, 1.0) * 0.8 + 0.2
    zero = jnp.zeros_like(s)
    rgba = jnp.stack([1.0 - s, s, zero, zero], axis=-1)
    rgba = jnp.where(valid[..., None], rgba, 0.0)
    return (jnp.clip(rgba, 0.0, 1.0) * 255.0).astype(jnp.uint8)
