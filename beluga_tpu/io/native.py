"""ctypes bindings for the native host-side IO kernels (native/beluga_io.cc).

The shared library is built on demand with the system compiler
(``build_native()``); every entry point has a numpy fallback so the package
works without a toolchain.  ``scan_to_points`` is the per-scan host hot
path (the beluga_ros::LaserScan adapter equivalent); the PGM path feeds
``maps.occupancy.load_pgm_yaml``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "beluga_io.cc"
_SO = _REPO_ROOT / "native" / "_beluga_io.so"

_lib = None
_build_attempted = False


def build_native(force: bool = False) -> bool:
    """Compile the shared library. Returns True on success."""
    global _build_attempted
    _build_attempted = True
    if _SO.exists() and not force and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return True
    for cc in ("g++", "c++", "clang++"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-std=c++17", str(_SRC), "-o", str(_SO)],
                check=True,
                capture_output=True,
            )
            return True
        except (subprocess.CalledProcessError, FileNotFoundError):
            continue
    return False


def _load():
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not _SO.exists() and not _build_attempted:
        build_native()
    if not _SO.exists():
        return None
    lib = ctypes.CDLL(str(_SO))
    lib.scan_to_points.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.take_evenly_indices.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)
    ]
    lib.parse_pgm_p5.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.parse_pgm_p5.restype = ctypes.c_int64
    lib.pgm_to_trinary.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int8),
    ]
    lib.decode_laserscan_cdr.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.decode_laserscan_cdr.restype = ctypes.c_int64
    lib.decode_odometry_cdr.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.decode_odometry_cdr.restype = ctypes.c_int64
    lib.decode_header_stamp_cdr.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.decode_header_stamp_cdr.restype = ctypes.c_int64
    lib.decode_pointcloud2_cdr.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.decode_pointcloud2_cdr.restype = ctypes.c_int64
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def scan_to_points(
    ranges, angle_min, angle_increment, min_range, max_range,
    sensor_pose=(0.0, 0.0, 0.0),
):
    """LaserScan → (points f32[N, 2] in base frame, mask u8→bool[N]).

    Mirrors laser_scan.hpp:59-93 + the sensor-origin transform
    (beluga_ros/src/amcl.cpp:57-62).
    """
    ranges = np.ascontiguousarray(ranges, np.float32)
    n = len(ranges)
    sx, sy, syaw = (float(v) for v in sensor_pose)
    lib = _load()
    if lib is not None:
        out = np.empty((n, 2), np.float32)
        mask = np.empty(n, np.uint8)
        lib.scan_to_points(
            ranges.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            float(angle_min), float(angle_increment), float(min_range),
            float(max_range), sx, sy, syaw,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out, mask.astype(bool)
    # numpy fallback
    angles = angle_min + np.arange(n, dtype=np.float32) * angle_increment
    ok = np.isfinite(ranges) & (ranges >= min_range) & (ranges <= max_range)
    px = np.where(ok, ranges * np.cos(angles), 0.0)
    py = np.where(ok, ranges * np.sin(angles), 0.0)
    c, s = np.cos(syaw), np.sin(syaw)
    out = np.stack([c * px - s * py + sx, s * px + c * py + sy], -1).astype(np.float32)
    out[~ok] = 0.0
    return out, ok


def take_evenly_indices(n: int, k: int) -> np.ndarray:
    """Indices of an evenly-spaced k-subsample of n slots.

    Reference semantics (take_evenly.hpp, pinned by test_take_evenly.cpp):
    ``ceil((n-1) j / (k-1))`` — e.g. 3 of 6 → {0, 3, 5}, 6 of 10 →
    {0, 2, 4, 6, 8, 9}.  When ``k >= n`` all indices are returned.
    """
    if k <= 0 or n <= 0:
        return np.zeros(0, np.int64)
    if k >= n:
        return np.arange(n, dtype=np.int64)
    if k == 1 or n == 1:
        return np.zeros(k, np.int64)
    lib = _load()
    if lib is not None:
        out = np.empty(k, np.int64)
        lib.take_evenly_indices(n, k, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return out
    num = (n - 1) * np.arange(k, dtype=np.int64)
    return -(-num // (k - 1))


def decode_pgm_trinary(
    data: bytes, occupied_thresh=0.65, free_thresh=0.196, negate=False
):
    """P5 PGM bytes → ROS trinary ``int8[H, W]`` (row 0 = bottom) or None
    if the native decoder is unavailable / the file is not binary P5."""
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    w = ctypes.c_int64()
    h = ctypes.c_int64()
    mv = ctypes.c_int64()
    off = lib.parse_pgm_p5(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(mv),
    )
    if off < 0:
        return None
    out = np.empty((h.value, w.value), np.int8)
    pixels = buf[off:]
    lib.pgm_to_trinary(
        pixels.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w.value, h.value, mv.value,
        float(occupied_thresh), float(free_thresh), int(bool(negate)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
    )
    return out


# ---------------------------------------------------------------------------
# rosbag2 CDR message decoding (native with pure-python fallback)
# ---------------------------------------------------------------------------


class _CdrReader:
    """Minimal XCDR1 little-endian reader (alignment relative to byte 4)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 4

    def align(self, n: int):
        rem = (self.pos - 4) % n
        if rem:
            self.pos += n - rem

    def read(self, fmt: str, size: int):
        import struct

        self.align(size)
        try:
            v = struct.unpack_from("<" + fmt, self.data, self.pos)[0]
        except struct.error as e:
            raise ValueError(f"malformed CDR message: {e}") from None
        self.pos += size
        return v

    def skip_string(self):
        n = self.read("I", 4)
        self.pos += n

    def skip_header(self):
        self.read("i", 4)
        self.read("I", 4)
        self.skip_string()


def decode_laserscan_cdr(data: bytes):
    """sensor_msgs/LaserScan CDR blob → (params dict, ranges f32[N]).

    params: angle_min, angle_max, angle_increment, scan_time, range_min,
    range_max.  Little-endian XCDR1 (the rosbag2/DDS default) only.
    """
    buf = np.frombuffer(data, np.uint8)
    lib = _load()
    if lib is not None:
        params = np.empty(6, np.float32)
        cap = max((len(data) - 40) // 4, 16)
        ranges = np.empty(cap, np.float32)
        n = lib.decode_laserscan_cdr(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
            params.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ranges.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap,
        )
        if n < 0:
            raise ValueError("malformed LaserScan CDR message")
        if n > cap:  # cannot happen (cap bounds the blob size), but be safe
            ranges = np.empty(n, np.float32)
            n = lib.decode_laserscan_cdr(
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
                params.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ranges.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            )
        keys = ("angle_min", "angle_max", "angle_increment", "scan_time",
                "range_min", "range_max")
        return dict(zip(keys, (float(v) for v in params))), ranges[:n].copy()
    # fallback
    if len(data) < 4 or data[1] != 0x01:
        raise ValueError("malformed LaserScan CDR message")
    r = _CdrReader(data)
    r.skip_header()
    vals = [r.read("f", 4) for _ in range(7)]
    n = r.read("I", 4)
    ranges = np.frombuffer(data, np.float32, count=n, offset=r.pos)
    params = dict(
        angle_min=vals[0], angle_max=vals[1], angle_increment=vals[2],
        scan_time=vals[4], range_min=vals[5], range_max=vals[6],
    )
    return params, ranges.copy()


def decode_odometry_cdr(data: bytes) -> np.ndarray:
    """nav_msgs/Odometry CDR blob → pose (x, y, z, qx, qy, qz, qw) f64[7]."""
    buf = np.frombuffer(data, np.uint8)
    lib = _load()
    if lib is not None:
        out = np.empty(7, np.float64)
        rc = lib.decode_odometry_cdr(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if rc < 0:
            raise ValueError("malformed Odometry CDR message")
        return out
    if len(data) < 4 or data[1] != 0x01:
        raise ValueError("malformed Odometry CDR message")
    r = _CdrReader(data)
    r.skip_header()
    r.skip_string()  # child_frame_id
    return np.asarray([r.read("d", 8) for _ in range(7)], np.float64)


def decode_pointcloud2_cdr(data: bytes) -> np.ndarray:
    """sensor_msgs/PointCloud2 CDR blob → xyz points ``f32[N, 3]``.

    Handles both reference layouts: dense xyz-contiguous float/double
    (beluga_ros point_cloud.hpp:59) and sparse strided fields
    (sparse_point_cloud.hpp:53).  The x/y/z fields must lead the layout in
    that order with one shared floating-point datatype — the reference
    adapters' construction-time contract.  NaN points are preserved
    (callers mask them).  Little-endian XCDR1 only.
    """
    buf = np.frombuffer(data, np.uint8)
    lib = _load()
    if lib is not None:
        info = np.empty(4, np.int64)
        cap = max((len(data) - 40) // 12, 16)
        out = np.empty((cap, 3), np.float32)
        n = lib.decode_pointcloud2_cdr(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap,
            info.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if n < 0:
            raise ValueError("malformed PointCloud2 CDR message")
        if n > cap:
            out = np.empty((n, 3), np.float32)
            n = lib.decode_pointcloud2_cdr(
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
                info.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            )
        return out[:n].copy()
    # pure-python fallback
    if len(data) < 4 or data[1] != 0x01:
        raise ValueError("malformed PointCloud2 CDR message")
    r = _CdrReader(data)
    r.skip_header()
    height = r.read("I", 4)
    width = r.read("I", 4)
    n_fields = r.read("I", 4)
    if n_fields < 3 or n_fields > 256:
        raise ValueError("malformed PointCloud2 CDR message")
    offs, dtypes = [], []
    for i in range(n_fields):
        r.align(4)
        slen = r.read("I", 4)
        name = data[r.pos : r.pos + max(slen - 1, 0)].decode(errors="replace")
        r.pos += slen
        f_off = r.read("I", 4)
        f_dtype = r.read("B", 1)
        r.read("I", 4)  # count
        if i < 3:
            if name != "xyz"[i]:
                raise ValueError("point cloud layout is not xyz-led")
            offs.append(f_off)
            dtypes.append(f_dtype)
    if len(set(dtypes)) != 1 or dtypes[0] not in (7, 8):
        raise ValueError("xyz fields must share one floating-point datatype")
    scalar = np.float32 if dtypes[0] == 7 else np.float64
    if r.read("B", 1):  # is_bigendian: little-endian-only contract
        raise ValueError("big-endian PointCloud2 payloads are unsupported")
    point_step = r.read("I", 4)
    row_step = r.read("I", 4)
    data_len = r.read("I", 4)
    if r.pos + data_len > len(data):
        raise ValueError("malformed PointCloud2 CDR message")
    payload = np.frombuffer(data, np.uint8, count=data_len, offset=r.pos)
    if point_step == 0:
        raise ValueError("malformed PointCloud2 CDR message")
    if row_step == 0:
        row_step = width * point_step
    # bounds validation BEFORE the as_strided views (which do no bounds
    # checking of their own) — same checks as the native decoder
    itemsize = np.dtype(scalar).itemsize
    if any(off + itemsize > point_step for off in offs):
        raise ValueError("xyz field offset beyond point_step")
    if height and (
        (height - 1) * row_step + width * point_step > data_len
    ):
        raise ValueError("PointCloud2 data shorter than its layout")
    out = np.empty((height * width, 3), np.float32)
    for k, off in enumerate(offs):
        # strided view: rows x cols of the k-th scalar field
        col = np.lib.stride_tricks.as_strided(
            payload[off:].view(np.uint8),
            shape=(height, width, np.dtype(scalar).itemsize),
            strides=(row_step, point_step, 1),
        )
        out[:, k] = (
            col.reshape(height * width, -1).copy().view(scalar).ravel()
        )
    return out


def decode_header_stamp_cdr(data: bytes):
    """(sec, nanosec) of any Header-led message."""
    buf = np.frombuffer(data, np.uint8)
    lib = _load()
    if lib is not None:
        sec = ctypes.c_int64()
        nsec = ctypes.c_int64()
        rc = lib.decode_header_stamp_cdr(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
            ctypes.byref(sec), ctypes.byref(nsec),
        )
        if rc < 0:
            raise ValueError("malformed CDR message")
        return sec.value, nsec.value
    if len(data) < 4 or data[1] != 0x01:
        raise ValueError("malformed CDR message")
    r = _CdrReader(data)
    return r.read("i", 4), r.read("I", 4)
