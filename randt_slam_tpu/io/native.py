"""ctypes bindings for the native host-side runtime
(``randt_slam_tpu/native/``, shipped as package data so installed wheels keep
the native fast path).

Compiles ``librandt_native.so`` on first use (g++, no external deps) and
exposes:
  * :func:`pack_polar_image` — point-cloud -> polar-image conversion, the
    data-loader hot path for replaying real point-cloud exports,
  * :func:`bresenham_raytrace` — integer ray walk with the reference's
    counting-grid semantics, derived from the closed-form minor-axis
    progression the device kernel uses (golden oracle for the device
    raytracer, host-side OGM export).

Falls back to numpy implementations if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librandt_native.so")
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load():
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "librandt_native.so"],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.pack_polar_image.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_float, ctypes.c_float, ctypes.c_int64,
                ctypes.c_float, ctypes.c_float, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.bresenham_raytrace.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
                ctypes.c_float,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
            ]
            lib.fuse_counting_grids.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_float, ctypes.c_float,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
            ]
            _lib = lib
        except Exception:
            _lib_failed = True
        return _lib


def have_native() -> bool:
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def pack_polar_image(points_xyi, azimuth0, azimuth_step, n_azimuths,
                     r0, bin_width, n_bins):
    """(n, 3) float32 [x, y, intensity] -> (A, R) float32 polar image."""
    pts = np.ascontiguousarray(points_xyi, np.float32)
    lib = _load()
    if lib is not None:
        out = np.zeros((n_azimuths, n_bins), np.float32)
        lib.pack_polar_image(
            _fptr(pts), pts.shape[0],
            ctypes.c_float(azimuth0), ctypes.c_float(azimuth_step), n_azimuths,
            ctypes.c_float(r0), ctypes.c_float(bin_width), n_bins,
            _fptr(out),
        )
        return out
    # numpy fallback
    out = np.zeros((n_azimuths, n_bins), np.float32)
    r = np.hypot(pts[:, 0], pts[:, 1])
    a = np.arctan2(pts[:, 1], pts[:, 0])
    ai = np.rint((a - azimuth0) / azimuth_step).astype(np.int64) % n_azimuths
    ri = np.floor((r - r0) / bin_width).astype(np.int64)
    ok = (ri >= 0) & (ri < n_bins)
    np.maximum.at(out, (ai[ok], ri[ok]), pts[ok, 2])
    return out


def bresenham_raytrace(counts, poses, angles, ranges, valid, res):
    """Reference-exact Bresenham counting-grid update (in place semantics on a
    copy).  counts: (H, W) int32; poses: (n, 3); returns updated counts."""
    out = np.ascontiguousarray(counts, np.int32).copy()
    poses = np.ascontiguousarray(poses, np.float32)
    angles = np.ascontiguousarray(angles, np.float32)
    ranges = np.ascontiguousarray(ranges, np.float32)
    valid = np.ascontiguousarray(valid, np.uint8)
    lib = _load()
    if lib is not None:
        lib.bresenham_raytrace(
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.shape[0], out.shape[1], ctypes.c_float(res),
            _fptr(poses), _fptr(angles), _fptr(ranges),
            valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(angles),
        )
        return out
    # numpy fallback: closed-form minor-axis progression, vectorized per ray
    # (same derivation as the native helper and the device kernel)
    H, W = out.shape
    for k in range(len(angles)):
        if not valid[k]:
            continue
        ox, oy, th0 = poses[k]
        th = th0 + angles[k]
        r = ranges[k]
        ex, ey = ox + np.cos(th) * r, oy + np.sin(th) * r
        dx = int((ex - ox) / res)
        dy = int((ey - oy) / res)
        x0 = int(ox / res + W // 2)
        y0 = int(oy / res + H // 2)
        x_major = abs(dx) >= abs(dy)
        abs_da, abs_db = max(abs(dx), abs(dy)), min(abs(dx), abs(dy))
        sa = int(np.sign(dx)) if x_major else int(np.sign(dy))
        sb = int(np.sign(dy)) if x_major else int(np.sign(dx))
        da = max(abs_da, 1)
        dist = float(np.hypot(dx, dy))
        scale = 1.0 if dist == 0.0 else min(1.0, (2.0 * r / res) / dist)
        n = min(int(scale * abs_da), abs_da)
        i = np.arange(n)
        b = (abs_da // 2 + i * abs_db) // da
        b_end = (abs_da // 2 + n * abs_db) // da
        if x_major:
            ix, iy = x0 + i * sa, y0 + b * sb
            exi, eyi = x0 + n * sa, y0 + b_end * sb
        else:
            ix, iy = x0 + b * sb, y0 + i * sa
            exi, eyi = x0 + b_end * sb, y0 + n * sa
        ok = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H) & ~(
            (ix == exi) & (iy == eyi))
        np.add.at(out, (iy[ok], ix[ok]), -1)
        if 0 <= exi < W and 0 <= eyi < H:
            out[eyi, exi] += 2
    return out


def fuse_counting_grids(submap_counts, origins_rel, sub_res, glob_res,
                        gh, gw):
    """Host-side MasterMap fusion (``ndt_master_map.cpp:20-79``): forward-
    splat each submap counting grid into the global grid with the 4-sample
    max-magnitude rule.  Returns (gh, gw) float32 summed increments.

    Falls back to the device implementation's semantics in numpy when the
    native library is unavailable.
    """
    sc = np.ascontiguousarray(submap_counts, np.int32)
    org = np.ascontiguousarray(origins_rel, np.float32)
    n_sub, sh, sw = sc.shape
    lib = _load()
    if lib is not None:
        out = np.zeros(gh * gw, np.float32)
        pos = np.empty(gh * gw, np.float32)
        neg = np.empty(gh * gw, np.float32)
        lib.fuse_counting_grids(
            sc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n_sub, sh, sw, _fptr(org),
            ctypes.c_float(sub_res), ctypes.c_float(glob_res), gh, gw,
            _fptr(pos), _fptr(neg), _fptr(out),
        )
        return out.reshape(gh, gw)
    # numpy fallback (vectorized forward splat)
    out = np.zeros(gh * gw, np.float32)
    ys, xs = np.meshgrid(np.arange(sh), np.arange(sw), indexing="ij")
    local = np.stack([xs * sub_res, ys * sub_res], -1).reshape(-1, 2)
    offs = np.asarray([[-0.25, -0.25], [-0.25, 0.25],
                       [0.25, -0.25], [0.25, 0.25]]) * glob_res
    for s in range(n_sub):
        c0, s0 = np.cos(org[s, 2]), np.sin(org[s, 2])
        R = np.asarray([[c0, -s0], [s0, c0]], np.float32)
        v = sc[s].reshape(-1).astype(np.float32)
        pos = np.zeros(gh * gw + 1, np.float32)
        neg = np.zeros(gh * gw + 1, np.float32)
        for k in range(4):
            p = (local + offs[k]) @ R.T + org[s, :2]
            gx = np.floor(p[:, 0] / glob_res).astype(np.int64)
            gy = np.floor(p[:, 1] / glob_res).astype(np.int64)
            ok = (gx >= 0) & (gx < gw) & (gy >= 0) & (gy < gh) & (v != 0)
            flat = np.where(ok, gy * gw + gx, gh * gw)
            np.maximum.at(pos, flat, np.where(ok & (v > 0), v, 0.0))
            np.maximum.at(neg, flat, np.where(ok & (v < 0), -v, 0.0))
        out += np.where(pos >= neg, pos, -neg)[: gh * gw]
    return out.reshape(gh, gw)
