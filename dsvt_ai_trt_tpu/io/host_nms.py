"""Host-side rotated NMS with a native C++ fast path.

The default pipeline runs NMS on device (ops/nms.py); this module provides
the host alternative matching the reference's deployment shape
(helper.h:257-283 runs NMS on the CPU after the engine).  Uses
native/libdsvt_host.so via ctypes when available (built lazily), otherwise a
NumPy fallback.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger("dsvt_tpu.host_nms")

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_native() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    so = os.path.join(_NATIVE_DIR, "libdsvt_host.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as exc:  # no toolchain: fall back to numpy
            log.info("native build unavailable (%s); using numpy NMS", exc)
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.dsvt_nms.restype = ctypes.c_int
        lib.dsvt_nms.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int)]
        lib.dsvt_load_bin.restype = ctypes.c_int
        lib.dsvt_load_bin.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.dsvt_wts_to_blob.restype = ctypes.c_int
        lib.dsvt_wts_to_blob.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                         ctypes.c_char_p]
        _lib = lib
    except OSError as exc:
        log.info("native library load failed (%s); using numpy NMS", exc)
    return _lib


def _corners(boxes: np.ndarray) -> np.ndarray:
    cx, cy = boxes[:, 0], boxes[:, 1]
    hx, hy = boxes[:, 4] / 2, boxes[:, 3] / 2
    ang = boxes[:, 6]
    ox = np.stack([-hx, hx, hx, -hx], 1)
    oy = np.stack([-hy, -hy, hy, hy], 1)
    c, s = np.cos(ang)[:, None], np.sin(ang)[:, None]
    return np.stack([ox * c - oy * s + cx[:, None],
                     ox * s + oy * c + cy[:, None]], -1)


def _clip_area(pa: np.ndarray, pb: np.ndarray) -> float:
    """Sutherland–Hodgman intersection area of two convex quads."""
    poly = list(pa)
    for e in range(4):
        a, b = pb[e], pb[(e + 1) % 4]
        ex, ey = b[0] - a[0], b[1] - a[1]
        out = []
        n = len(poly)
        if n < 3:
            return 0.0
        for i in range(n):
            cur, nxt = poly[i], poly[(i + 1) % n]
            dc = ex * (cur[1] - a[1]) - ey * (cur[0] - a[0])
            dn = ex * (nxt[1] - a[1]) - ey * (nxt[0] - a[0])
            if dc >= 0:
                out.append(cur)
            if (dc >= 0) != (dn >= 0):
                t = dc / (dc - dn)
                out.append((cur[0] + t * (nxt[0] - cur[0]),
                            cur[1] + t * (nxt[1] - cur[1])))
        poly = out
    if len(poly) < 3:
        return 0.0
    area = 0.0
    for i in range(len(poly)):
        j = (i + 1) % len(poly)
        area += poly[i][0] * poly[j][1] - poly[j][0] * poly[i][1]
    return abs(area) / 2


def nms_host(boxes: np.ndarray, count: int,
             iou_threshold: float) -> Tuple[np.ndarray, int]:
    """Greedy NMS on score-sorted boxes [K, 9]; returns compacted (boxes, n)."""
    boxes = np.ascontiguousarray(boxes, np.float32)
    lib = _load_native()
    if lib is not None and count > 0:
        keep = np.zeros((count,), np.int32)
        kept = lib.dsvt_nms(
            boxes[:count].ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            count, ctypes.c_float(iou_threshold),
            keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        sel = np.nonzero(keep)[0]
        out = np.zeros_like(boxes)
        out[:kept] = boxes[sel]
        return out, int(kept)

    suppressed = np.zeros(count, bool)
    corners = _corners(boxes[:count])
    areas = boxes[:count, 3] * boxes[:count, 4]
    sel = []
    for i in range(count):
        if suppressed[i]:
            continue
        sel.append(i)
        for j in range(i + 1, count):
            if suppressed[j]:
                continue
            ov = _clip_area(corners[i], corners[j])
            iou = ov / max(areas[i] + areas[j] - ov, 1e-8)
            if iou >= iou_threshold:
                suppressed[j] = True
    out = np.zeros_like(boxes)
    out[:len(sel)] = boxes[sel]
    return out, len(sel)


def load_bin_native(path: str, max_points: int):
    lib = _load_native()
    if lib is None:
        from .pointcloud import load_bin
        return load_bin(path, max_points)
    buf = np.zeros((max_points, 4), np.float32)
    n = lib.dsvt_load_bin(path.encode(),
                          buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          max_points)
    if n < 0:
        raise IOError(f"failed to load {path}")
    return buf, np.int32(n)


def wts_to_blob_native(wts_path: str, blob_path: str, index_path: str) -> int:
    lib = _load_native()
    if lib is None:
        return -1
    return lib.dsvt_wts_to_blob(wts_path.encode(), blob_path.encode(),
                                index_path.encode())
