"""View building: raw sensor frames → metric-depth View pytree.

Reference parity: ITMLib/Engine/ITMViewBuilder.h + DeviceSpecific
ITMViewBuilder_{CPU,CUDA} (UpdateView — depth conversion, optional 5×
bilateral filtering, optional normals+uncertainty for weighted ICP) and
ITMLib/Objects/ITMView.h:16.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from infinitam_tpu.calib import DISPARITY_KINECT, RGBDCalib
from infinitam_tpu.config import Settings
from infinitam_tpu.ops import view_ops


class View(NamedTuple):
    """Per-frame input (reference: ITMView)."""

    depth: jnp.ndarray  # [H, W] metric depth, −1 invalid
    rgb: Optional[jnp.ndarray] = None  # [H, W, 3] float 0..1
    depth_normals: Optional[jnp.ndarray] = None  # [H, W, 4] (WICP)
    depth_uncertainty: Optional[jnp.ndarray] = None  # [H, W] σ_z (WICP)


def build_view(
    raw_depth: jnp.ndarray,  # [H, W] raw sensor values (disparity or mm)
    calib: RGBDCalib,
    settings: Settings,
    rgb: Optional[jnp.ndarray] = None,  # [H, W, 3] uint8 or float
) -> View:
    """UpdateView: convert + filter one frame. Jittable with calib/settings
    static (floats baked in)."""
    d = calib.disparity
    if d.type == DISPARITY_KINECT:
        depth = view_ops.disparity_to_depth(raw_depth, d.a, d.b, calib.intrinsics_d.fx)
    else:
        depth = view_ops.depth_affine_to_float(raw_depth, d.a, d.b)

    if settings.use_bilateral_filter:
        # reference applies 5 passes ping-pong (ITMViewBuilder_CPU.cpp:66-81)
        for _ in range(5):
            depth = view_ops.bilateral_filter_depth(depth)

    normals = None
    sigma = None
    if settings.model_sensor_noise:
        normals, sigma = view_ops.compute_normals_and_weights(depth, calib.intrinsics_d)

    if rgb is not None and rgb.dtype != jnp.float32:
        rgb = rgb.astype(jnp.float32) / 255.0

    return View(depth=depth, rgb=rgb, depth_normals=normals, depth_uncertainty=sigma)


def build_view_from_metric_depth(
    depth: jnp.ndarray, settings: Settings, calib: RGBDCalib, rgb: Optional[jnp.ndarray] = None
) -> View:
    """For sources that already produce metric depth (synthetic, TUM float)."""
    depth = jnp.where(depth > 0, depth, -1.0)
    if settings.use_bilateral_filter:
        for _ in range(5):
            depth = view_ops.bilateral_filter_depth(depth)
    normals = None
    sigma = None
    if settings.model_sensor_noise:
        normals, sigma = view_ops.compute_normals_and_weights(depth, calib.intrinsics_d)
    if rgb is not None and rgb.dtype != jnp.float32:
        rgb = rgb.astype(jnp.float32) / 255.0
    return View(depth=depth, rgb=rgb, depth_normals=normals, depth_uncertainty=sigma)
