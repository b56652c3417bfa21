"""Flow / image file IO (reference core/utils/frame_utils.py:12-137).

Host-side numpy: Middlebury .flo, PFM, KITTI 16-bit PNG flow codec, and the
extension-dispatched generic reader.  cv2 is optional (PNG codec falls back to
PIL-based u16 handling if cv2 is unavailable).
"""

from __future__ import annotations

import os
import re
from os.path import splitext

import numpy as np
from PIL import Image

try:
    import cv2
    cv2.setNumThreads(0)
    cv2.ocl.setUseOpenCL(False)
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

FLO_MAGIC = 202021.25


def read_flo(path: str) -> np.ndarray:
    """Middlebury .flo reader: magic f32, w i32, h i32, then h*w*2 f32 (u, v)."""
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)
        if magic.size == 0 or magic[0] != np.float32(FLO_MAGIC):
            raise ValueError(f"invalid .flo magic in {path}")
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=2 * w * h)
    return data.reshape(h, w, 2)


def write_flo(path: str, flow: np.ndarray) -> None:
    assert flow.ndim == 3 and flow.shape[2] == 2
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        np.array([FLO_MAGIC], np.float32).tofile(f)
        np.array(w, np.int32).tofile(f)
        np.array(h, np.int32).tofile(f)
        flow.astype(np.float32).tofile(f)


def read_pfm(path: str) -> np.ndarray:
    """PFM reader (bottom-up scanline order, sign-of-scale endianness)."""
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError("not a PFM file")
        dim = re.match(rb"^(\d+)\s(\d+)\s$", f.readline())
        if not dim:
            raise ValueError("malformed PFM header")
        width, height = map(int, dim.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    return np.flipud(data.reshape(shape))


def read_flow_kitti(path: str):
    """KITTI 16-bit PNG codec: (u, v) stored as uv*64 + 2^15, valid in ch 2."""
    if _HAS_CV2:
        raw = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR)
        raw = raw[:, :, ::-1].astype(np.float32)  # BGR -> RGB
    else:
        raw = np.array(Image.open(path)).astype(np.float32)
    flow, valid = raw[:, :, :2], raw[:, :, 2]
    flow = (flow - 2 ** 15) / 64.0
    return flow, valid


def write_flow_kitti(path: str, flow: np.ndarray) -> None:
    uv = (64.0 * flow + 2 ** 15)
    valid = np.ones([uv.shape[0], uv.shape[1], 1])
    out = np.concatenate([uv, valid], axis=-1).astype(np.uint16)
    if _HAS_CV2:
        cv2.imwrite(path, out[..., ::-1])
    else:  # pragma: no cover
        Image.fromarray(out, mode="RGB").save(path)


def read_disp_kitti(path: str):
    if _HAS_CV2:
        disp = cv2.imread(path, cv2.IMREAD_ANYDEPTH) / 256.0
    else:  # pragma: no cover
        disp = np.array(Image.open(path)).astype(np.float32) / 256.0
    valid = disp > 0.0
    flow = np.stack([-disp, np.zeros_like(disp)], -1)
    return flow, valid


def read_gen(file_name: str, pil: bool = False):
    """Extension-dispatched generic reader (frame_utils.py:123-137).

    Image formats go through the native decode core (native/imgio) when it
    is built — same pixels as PIL, no Python object layer, GIL released
    during decode so loader threads scale."""
    ext = splitext(file_name)[-1]
    if ext in (".png", ".jpeg", ".ppm", ".jpg"):
        if not pil:
            from craft_tpu.data import imgio
            if imgio.available():
                return imgio.load(file_name)
        return Image.open(file_name)
    if ext in (".bin", ".raw"):
        return np.load(file_name)
    if ext == ".flo":
        return read_flo(file_name).astype(np.float32)
    if ext == ".pfm":
        flow = read_pfm(file_name).astype(np.float32)
        return flow if flow.ndim == 2 else flow[:, :, :-1]
    return []
