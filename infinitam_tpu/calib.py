"""RGB-D calibration structures and text-file parser.

Reference parity: ITMLib/Utils/ITMCalibIO.{h,cpp} (readRGBDCalib:90) and the
calibration objects ITMIntrinsics/ITMExtrinsics/ITMDisparityCalib
(ITMLib/Objects/ITMIntrinsics.h:17, ITMExtrinsics.h:17, ITMDisparityCalib.h:18).

The calib file format (e.g. reference Files/Teddy/calib.txt):
    rgb:   W H / fx fy / cx cy
    depth: W H / fx fy / cx cy
    extrinsics rgb→depth: 3 rows of 4 (row-major of the column-major ref matrix)
    disparity: ["kinect"|"affine"] a b
"""

from __future__ import annotations

import dataclasses
import io
from typing import Tuple

import numpy as np


DISPARITY_KINECT = "kinect"
DISPARITY_AFFINE = "affine"


@dataclasses.dataclass(frozen=True)
class Intrinsics:
    """Pinhole intrinsics (fx, fy, cx, cy) + image size."""

    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int

    @property
    def vector(self) -> np.ndarray:
        return np.array([self.fx, self.fy, self.cx, self.cy], dtype=np.float32)

    def scaled(self, factor: float) -> "Intrinsics":
        """Intrinsics for an image resized by `factor` (pyramid levels halve:
        reference ITMDepthTracker.cpp:52-58 halves fx,fy,cx,cy per level)."""
        return Intrinsics(
            fx=self.fx * factor,
            fy=self.fy * factor,
            cx=self.cx * factor,
            cy=self.cy * factor,
            width=int(round(self.width * factor)),
            height=int(round(self.height * factor)),
        )


@dataclasses.dataclass(frozen=True)
class DisparityCalib:
    """Disparity→depth transform (reference: ITMDisparityCalib.h:18).

    kinect: depth = 8·b·fx_depth / (a − disparity)
    affine: depth = a·raw + b
    """

    a: float = 1.0 / 1000.0
    b: float = 0.0
    type: str = DISPARITY_AFFINE


@dataclasses.dataclass(frozen=True)
class RGBDCalib:
    intrinsics_rgb: Intrinsics
    intrinsics_d: Intrinsics
    # 4x4 row-major, transforms points from the RGB camera frame to the depth
    # camera frame (reference: trafo_rgb_to_depth).
    trafo_rgb_to_depth: Tuple[Tuple[float, ...], ...]
    disparity: DisparityCalib

    @property
    def rgb_to_depth(self) -> np.ndarray:
        return np.array(self.trafo_rgb_to_depth, dtype=np.float32)

    @property
    def depth_to_rgb(self) -> np.ndarray:
        M = self.rgb_to_depth
        R, t = M[:3, :3], M[:3, 3]
        inv = np.eye(4, dtype=np.float32)
        inv[:3, :3] = R.T
        inv[:3, 3] = -R.T @ t
        return inv


def _read_intrinsics(tokens) -> Intrinsics:
    w, h = float(next(tokens)), float(next(tokens))
    fx, fy = float(next(tokens)), float(next(tokens))
    cx, cy = float(next(tokens)), float(next(tokens))
    return Intrinsics(fx=fx, fy=fy, cx=cx, cy=cy, width=int(w), height=int(h))


def read_rgbd_calib(path_or_text: str) -> RGBDCalib:
    """Parse the reference calib text format from a path or literal text."""
    if "\n" in path_or_text or " " in path_or_text.strip().split("\n")[0] and not _is_path(path_or_text):
        text = path_or_text
    else:
        with open(path_or_text, "r") as f:
            text = f.read()
    tokens = iter(text.split())

    intr_rgb = _read_intrinsics(tokens)
    intr_d = _read_intrinsics(tokens)

    # Extrinsics: the reference reads 3 text rows into columns m{0..3}{row}
    # of a column-major matrix, so each text row IS a row of the matrix.
    M = np.eye(4, dtype=np.float64)
    for r in range(3):
        for c in range(4):
            M[r, c] = float(next(tokens))

    word = next(tokens)
    dtype_ = DISPARITY_KINECT
    if word == "kinect":
        a = float(next(tokens))
    elif word == "affine":
        dtype_ = DISPARITY_AFFINE
        a = float(next(tokens))
    else:
        a = float(word)
    b = float(next(tokens))
    if a == 0.0 and b == 0.0:
        dtype_, a, b = DISPARITY_AFFINE, 1.0 / 1000.0, 0.0

    return RGBDCalib(
        intrinsics_rgb=intr_rgb,
        intrinsics_d=intr_d,
        trafo_rgb_to_depth=tuple(tuple(float(x) for x in row) for row in M),
        disparity=DisparityCalib(a=a, b=b, type=dtype_),
    )


def _is_path(s: str) -> bool:
    import os

    return os.path.exists(s)


def default_calib(width: int = 640, height: int = 480) -> RGBDCalib:
    """A sane default pinhole calib (Kinect-like FoV at any resolution; used
    by synthetic sources and tests). Focal length scales with resolution so
    the field of view stays ~62°."""
    f = 525.0 * width / 640.0
    intr = Intrinsics(
        fx=f, fy=f, cx=width / 2 - 0.5, cy=height / 2 - 0.5, width=width, height=height
    )
    return RGBDCalib(
        intrinsics_rgb=intr,
        intrinsics_d=intr,
        trafo_rgb_to_depth=tuple(tuple(float(x) for x in row) for row in np.eye(4)),
        disparity=DisparityCalib(),
    )


def write_rgbd_calib(calib: RGBDCalib) -> str:
    """Serialize back to the reference text format."""
    out = io.StringIO()
    for intr in (calib.intrinsics_rgb, calib.intrinsics_d):
        out.write(f"{intr.width} {intr.height}\n")
        out.write(f"{intr.fx} {intr.fy}\n")
        out.write(f"{intr.cx} {intr.cy}\n\n")
    M = calib.rgb_to_depth
    for r in range(3):
        out.write(" ".join(str(float(x)) for x in M[r]) + "\n")
    out.write("\n")
    d = calib.disparity
    out.write(f"{d.type} {d.a} {d.b}\n")
    return out.getvalue()
