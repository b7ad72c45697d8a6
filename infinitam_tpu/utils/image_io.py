"""Image file I/O: PPM/PGM (ascii + binary) and optional PNG.

Reference parity: InfiniTAM/Utils/FileUtils.cpp:251-424 (ReadImageFromFile /
SaveImageToFile for uchar4 rgb, short depth, float images). The reference's
dataset format is printf-masked `%04i.ppm` (rgb) / `%04i.pgm` (16-bit depth).
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np


def _read_pnm_header(f) -> tuple[bytes, int, int, int]:
    """Parse P2/P3/P5/P6 header, returning (magic, width, height, maxval)."""
    magic = f.read(2)
    if magic not in (b"P2", b"P3", b"P5", b"P6"):
        raise ValueError(f"not a supported PNM file (magic={magic!r})")
    vals = []
    while len(vals) < 3:
        line = f.readline()
        if not line:
            raise ValueError("truncated PNM header")
        line = line.split(b"#", 1)[0]
        vals.extend(int(tok) for tok in line.split())
    w, h, maxval = vals[:3]
    return magic, w, h, maxval


def read_pgm(path: str) -> np.ndarray:
    """Read a PGM (grey/depth) image. 16-bit big-endian per PNM spec → uint16,
    8-bit → uint8. Returns array of shape [H, W]."""
    with open(path, "rb") as f:
        magic, w, h, maxval = _read_pnm_header(f)
        if magic == b"P2":  # ascii
            data = np.array(f.read().split(), dtype=np.int64)
            arr = data.reshape(h, w)
            return arr.astype(np.uint16 if maxval > 255 else np.uint8)
        dtype = ">u2" if maxval > 255 else np.uint8
        raw = np.frombuffer(f.read(w * h * (2 if maxval > 255 else 1)), dtype=dtype)
        return raw.reshape(h, w).astype(np.uint16 if maxval > 255 else np.uint8)


def read_ppm(path: str) -> np.ndarray:
    """Read a PPM (rgb) image → uint8 array [H, W, 3]."""
    with open(path, "rb") as f:
        magic, w, h, maxval = _read_pnm_header(f)
        if magic == b"P3":  # ascii
            data = np.array(f.read().split(), dtype=np.int64)
            return data.reshape(h, w, 3).astype(np.uint8)
        raw = np.frombuffer(f.read(w * h * 3), dtype=np.uint8)
        return raw.reshape(h, w, 3)


def write_pgm(path: str, img: np.ndarray) -> None:
    """Write uint8 or uint16 [H, W] as binary PGM (16-bit big-endian)."""
    img = np.asarray(img)
    h, w = img.shape
    if img.dtype == np.uint16 or img.max(initial=0) > 255:
        img = img.astype(np.uint16)
        header = f"P5\n{w} {h}\n65535\n".encode()
        payload = img.astype(">u2").tobytes()
    else:
        img = img.astype(np.uint8)
        header = f"P5\n{w} {h}\n255\n".encode()
        payload = img.tobytes()
    with open(path, "wb") as f:
        f.write(header)
        f.write(payload)


def write_ppm(path: str, img: np.ndarray) -> None:
    """Write uint8 [H, W, 3] (or [H, W, 4], alpha dropped) as binary PPM."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[2] == 4:
        img = img[..., :3]
    h, w, _ = img.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(img.astype(np.uint8).tobytes())


def read_image(path: str) -> np.ndarray:
    """Dispatch on extension; PNG requires PIL (optional)."""
    lower = path.lower()
    if lower.endswith(".pgm"):
        return read_pgm(path)
    if lower.endswith(".ppm"):
        return read_ppm(path)
    if lower.endswith(".png"):
        try:
            from PIL import Image  # optional dependency
        except ImportError as e:  # pragma: no cover
            raise ImportError("PNG support requires PIL") from e
        return np.asarray(Image.open(path))
    raise ValueError(f"unsupported image extension: {path}")


def write_image(path: str, img: np.ndarray) -> None:
    lower = path.lower()
    if lower.endswith(".pgm"):
        write_pgm(path, img)
    elif lower.endswith(".ppm"):
        write_ppm(path, img)
    elif lower.endswith(".png"):
        try:
            from PIL import Image
        except ImportError as e:  # pragma: no cover
            raise ImportError("PNG support requires PIL") from e
        Image.fromarray(np.asarray(img)).save(path)
    else:
        raise ValueError(f"unsupported image extension: {path}")


def expand_printf_mask(mask: str, index: int) -> str:
    """Expand a C printf-style mask like `%04i.ppm` (reference:
    ImageSourceEngine.cpp ImageMaskPathGenerator)."""
    return re.sub(
        r"%0?(\d*)[di]",
        lambda m: str(index).zfill(int(m.group(1) or "0")),
        mask,
    )
