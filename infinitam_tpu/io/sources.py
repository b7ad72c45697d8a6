"""Frame sources: dataset readers with the reference's pull interface.

Reference parity: InfiniTAM/Engine/ImageSourceEngine.{h,cpp} —
ImageSourceEngine (calib + hasMoreImages/getImages), ImageFileReader
(printf-mask ppm/pgm sequences with a one-frame cache), RawFileReader,
CalibSource; Engine/IMUSourceEngine.cpp (per-frame 3×3 rotation text files).
Plus a TUM-RGBD association-file reader (the reference's users feed TUM
sequences through the same mask mechanism).

Live camera sources (OpenNI/UVC/RealSense/Kinect2, reference
Engine/OpenNIEngine.cpp etc.) have no hardware in this environment and are
represented by the `LiveSourceStub` gate.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from infinitam_tpu.calib import RGBDCalib, default_calib, read_rgbd_calib
from infinitam_tpu.utils.image_io import expand_printf_mask, read_image


class ImageSourceEngine:
    """Abstract pull-style source (reference: ImageSourceEngine.h:9-21)."""

    calib: RGBDCalib

    def has_more_images(self) -> bool:
        raise NotImplementedError

    def get_images(self) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
        """Returns (raw_depth uint16 [H,W], rgb uint8 [H,W,3] or None)."""
        raise NotImplementedError


class CalibSource(ImageSourceEngine):
    """Calibration only, no frames (reference: CalibSource — used when a live
    source provides images but calib comes from file)."""

    def __init__(self, calib_path: str):
        self.calib = read_rgbd_calib(calib_path)

    def has_more_images(self) -> bool:
        return False

    def get_images(self):
        raise RuntimeError("CalibSource provides no images")


class ImageFileReader(ImageSourceEngine):
    """printf-mask sequence reader (reference: ImageFileReader — masks like
    `Frames/%04i.ppm` / `%04i.pgm`, caching one frame ahead)."""

    def __init__(self, calib_path: str, rgb_mask: str, depth_mask: str, start_index: int = 0):
        self.calib = read_rgbd_calib(calib_path)
        self.rgb_mask = rgb_mask
        self.depth_mask = depth_mask
        self.index = start_index
        self._cached: Optional[Tuple[np.ndarray, Optional[np.ndarray]]] = None
        self._cache_index = -1

    def _paths(self, i: int):
        return (
            expand_printf_mask(self.rgb_mask, i) if self.rgb_mask else None,
            expand_printf_mask(self.depth_mask, i),
        )

    def _load(self, i: int):
        rgb_path, depth_path = self._paths(i)
        if not os.path.exists(depth_path):
            return None
        depth = read_image(depth_path)
        rgb = None
        if rgb_path and os.path.exists(rgb_path):
            rgb = read_image(rgb_path)
        return depth, rgb

    def has_more_images(self) -> bool:
        if self._cache_index != self.index:
            self._cached = self._load(self.index)
            self._cache_index = self.index
        return self._cached is not None

    def get_images(self):
        if not self.has_more_images():
            raise StopIteration
        depth, rgb = self._cached
        self.index += 1
        return depth, rgb


class RawFileReader(ImageSourceEngine):
    """Raw binary frame reader (reference: RawFileReader — fixed-size
    uint16 depth + rgb frames appended per index)."""

    def __init__(self, calib_path: str, rgb_mask: str, depth_mask: str, image_size: Tuple[int, int]):
        self.calib = read_rgbd_calib(calib_path)
        self.rgb_mask = rgb_mask
        self.depth_mask = depth_mask
        self.image_size = image_size  # (H, W)
        self.index = 0

    def has_more_images(self) -> bool:
        return os.path.exists(expand_printf_mask(self.depth_mask, self.index))

    def get_images(self):
        H, W = self.image_size
        dpath = expand_printf_mask(self.depth_mask, self.index)
        depth = np.fromfile(dpath, dtype=np.uint16, count=H * W).reshape(H, W)
        rgb = None
        if self.rgb_mask:
            rpath = expand_printf_mask(self.rgb_mask, self.index)
            if os.path.exists(rpath):
                rgb = np.fromfile(rpath, dtype=np.uint8, count=H * W * 3).reshape(H, W, 3)
        self.index += 1
        return depth, rgb


class TUMSource(ImageSourceEngine):
    """TUM-RGBD sequence via an associations file (`timestamp rgb_path
    timestamp depth_path` per line). Depth PNGs are 16-bit with 1/5000 m
    scale; calib defaults to the TUM fr intrinsics unless given."""

    TUM_DEPTH_SCALE = 1.0 / 5000.0

    def __init__(self, root: str, associations: str = "associations.txt", calib: Optional[RGBDCalib] = None):
        self.root = root
        self.pairs = []
        with open(os.path.join(root, associations)) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split()
                if len(parts) >= 4:
                    self.pairs.append((parts[1], parts[3]))
        if calib is None:
            from infinitam_tpu.calib import DisparityCalib, Intrinsics

            intr = Intrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, width=640, height=480)
            calib = default_calib(640, 480)
            calib = RGBDCalib(
                intrinsics_rgb=intr,
                intrinsics_d=intr,
                trafo_rgb_to_depth=calib.trafo_rgb_to_depth,
                disparity=DisparityCalib(a=self.TUM_DEPTH_SCALE, b=0.0, type="affine"),
            )
        self.calib = calib
        self.index = 0

    def has_more_images(self) -> bool:
        return self.index < len(self.pairs)

    def get_images(self):
        rgb_rel, depth_rel = self.pairs[self.index]
        self.index += 1
        depth = read_image(os.path.join(self.root, depth_rel))
        rgb = read_image(os.path.join(self.root, rgb_rel))
        return depth, rgb


class IMUSource:
    """Per-frame 3×3 rotation matrices from text files (reference:
    IMUSourceEngine.cpp:11-69 — nine floats per file, printf mask)."""

    def __init__(self, mask: str):
        self.mask = mask
        self.index = 0

    def has_more_measurements(self) -> bool:
        return os.path.exists(expand_printf_mask(self.mask, self.index))

    def get_measurement(self) -> np.ndarray:
        path = expand_printf_mask(self.mask, self.index)
        self.index += 1
        vals = np.loadtxt(path).reshape(3, 3).astype(np.float32)
        return vals


class PoseSource:
    """External pose feed (reference: PoseSourceEngine / RosPoseSourceEngine
    without ROS — poses pushed by the caller, pulled per frame)."""

    def __init__(self):
        self._pose: Optional[np.ndarray] = None

    def push(self, pose_4x4: np.ndarray) -> None:
        self._pose = np.asarray(pose_4x4, dtype=np.float32)

    def latest(self) -> Optional[np.ndarray]:
        return self._pose


class LiveSourceStub(ImageSourceEngine):
    """Placeholder for live camera backends (OpenNI2 / libuvc / RealSense /
    Kinect2 — reference Engine/{OpenNIEngine,LibUVCEngine,RealSenseEngine,
    Kinect2Engine}.cpp). No camera hardware exists in this deployment; the
    class preserves the fallback-chain API of InfiniTAM.cpp:21-87."""

    def __init__(self, *_a, **_k):
        raise RuntimeError(
            "live camera sources are unavailable in this build; use "
            "ImageFileReader/TUMSource/SyntheticSource"
        )
