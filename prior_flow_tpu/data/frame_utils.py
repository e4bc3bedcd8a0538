"""Flow-file and image I/O.

Same binary formats as the reference (core/utils/frame_utils.py:12-137):
Middlebury ``.flo``, ``.pfm``, KITTI 16-bit-png flow, plus a
``read_gen`` extension dispatcher. Implemented directly from the public
format specs with numpy; cv2/PIL are used only for image codecs.
"""

from __future__ import annotations

import re
from os.path import splitext

import numpy as np

try:
    import cv2
    cv2.setNumThreads(0)
    cv2.ocl.setUseOpenCL(False)
except ImportError:  # pragma: no cover
    cv2 = None

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

FLO_MAGIC = 202021.25


def read_flo(path: str) -> np.ndarray:
    """Read a Middlebury .flo file -> (H, W, 2) float32."""
    with open(path, "rb") as f:
        magic = np.frombuffer(f.read(4), np.float32)[0]
        if magic != np.float32(FLO_MAGIC):
            raise ValueError(f"{path}: bad .flo magic {magic!r}")
        w = int(np.frombuffer(f.read(4), np.int32)[0])
        h = int(np.frombuffer(f.read(4), np.int32)[0])
        data = np.frombuffer(f.read(8 * w * h), np.float32)
    return data.reshape(h, w, 2).copy()


def write_flo(path: str, flow: np.ndarray) -> None:
    """Write (H, W, 2) flow as a Middlebury .flo file."""
    flow = np.asarray(flow)
    if flow.ndim != 3 or flow.shape[2] != 2:
        raise ValueError(f"flow must be (H, W, 2), got {flow.shape}")
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        np.float32(FLO_MAGIC).tofile(f)
        np.int32(w).tofile(f)
        np.int32(h).tofile(f)
        flow.astype(np.float32).tofile(f)


def read_pfm(path: str) -> np.ndarray:
    """Read a .pfm file -> (H, W) or (H, W, 3) float array (top-down)."""
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError(f"{path}: not a PFM file")
        dims = re.match(rb"^(\d+)\s(\d+)\s*$", f.readline())
        if not dims:
            raise ValueError(f"{path}: malformed PFM header")
        w, h = map(int, dims.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (h, w, 3) if color else (h, w)
    return np.flipud(data.reshape(shape)).copy()


def read_flow_kitti(path: str):
    """Read KITTI uint16-png flow -> ((H, W, 2) float32, (H, W) valid)."""
    if cv2 is None:
        raise RuntimeError("cv2 required for KITTI png flow")
    raw = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR)
    raw = raw[:, :, ::-1].astype(np.float32)  # BGR -> RGB = (u, v, valid)
    flow, valid = raw[:, :, :2], raw[:, :, 2]
    flow = (flow - 2 ** 15) / 64.0
    return flow, valid


def write_flow_kitti(path: str, flow: np.ndarray) -> None:
    """Write (H, W, 2) flow as a KITTI uint16 png (valid = all ones)."""
    if cv2 is None:
        raise RuntimeError("cv2 required for KITTI png flow")
    uv = 64.0 * np.asarray(flow) + 2 ** 15
    valid = np.ones(uv.shape[:2] + (1,), uv.dtype)
    out = np.concatenate([uv, valid], axis=-1).astype(np.uint16)
    cv2.imwrite(path, out[..., ::-1])


def read_disp_kitti(path: str):
    """Read a KITTI disparity png as a pseudo-flow ((H, W, 2), valid)."""
    if cv2 is None:
        raise RuntimeError("cv2 required for KITTI png disparity")
    disp = cv2.imread(path, cv2.IMREAD_ANYDEPTH) / 256.0
    valid = disp > 0.0
    flow = np.stack([-disp, np.zeros_like(disp)], -1)
    return flow, valid


def read_image(path: str) -> np.ndarray:
    """Read an image file -> (H, W, C) uint8 RGB (or (H, W) grayscale)."""
    if Image is not None:
        return np.array(Image.open(path))
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img.ndim == 3:
        img = img[:, :, ::-1]
    return img


def read_gen(path: str):
    """Extension-dispatch reader (reference frame_utils.py:123-137)."""
    ext = splitext(path)[-1].lower()
    if ext in (".png", ".jpeg", ".ppm", ".jpg"):
        return read_image(path)
    if ext in (".bin", ".raw", ".npy"):
        return np.load(path)
    if ext == ".flo":
        return read_flo(path).astype(np.float32)
    if ext == ".pfm":
        flow = read_pfm(path).astype(np.float32)
        return flow if flow.ndim == 2 else flow[:, :, :-1]
    return []
