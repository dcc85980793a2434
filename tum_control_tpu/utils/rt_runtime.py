"""ctypes binding + Python driver for the native real-time runtime.

`RealtimeRunner` runs a single-scenario control loop at a fixed period
against the jitted RTI step, with the C++ executor providing the deadline
clock, deadline-miss watchdog, lock-free telemetry ring and native latency
percentiles — the deployment-facing analog of the reference's wall-clock
bookkeeping (main.py:57-66, SURVEY.md §5.1).

Build the library once with `make -C runtime` (auto-attempted on import).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import time

import numpy as np

_RUNTIME_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "runtime"
)
_LIB_PATH = os.path.join(_RUNTIME_DIR, "librt_runtime.so")


class _Stats(ctypes.Structure):
    _fields_ = [
        ("cycles", ctypes.c_uint64),
        ("deadline_misses", ctypes.c_uint64),
        ("dropped_records", ctypes.c_uint64),
        ("solve_ms_p50", ctypes.c_double),
        ("solve_ms_p99", ctypes.c_double),
        ("solve_ms_max", ctypes.c_double),
        ("solve_ms_mean", ctypes.c_double),
    ]


def _load_lib():
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _RUNTIME_DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.rt_create.restype = ctypes.c_void_p
    lib.rt_create.argtypes = [ctypes.c_uint64, ctypes.c_uint64]
    lib.rt_destroy.argtypes = [ctypes.c_void_p]
    lib.rt_begin_cycle.restype = ctypes.c_uint64
    lib.rt_begin_cycle.argtypes = [ctypes.c_void_p]
    lib.rt_record.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int32,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
    ]
    lib.rt_stats.argtypes = [ctypes.c_void_p, ctypes.POINTER(_Stats)]
    lib.rt_export.restype = ctypes.c_uint64
    lib.rt_export.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.rt_record_size.restype = ctypes.c_uint64
    return lib


_TELEMETRY_DTYPE = np.dtype(
    [
        ("cycle", "<u8"), ("t_start_ns", "<u8"), ("solve_ns", "<u8"),
        ("status", "<i4"), ("cost", "<f4"), ("lat_dev", "<f4"),
        ("vel_dev", "<f4"), ("u0", "<f4"), ("u1", "<f4"),
    ],
    align=True,
)


def read_telemetry(path: str) -> np.ndarray:
    """Load a binary telemetry export as a structured numpy array."""
    return np.fromfile(path, dtype=_TELEMETRY_DTYPE)


class RealtimeExecutor:
    """Thin handle over the native executor."""

    def __init__(self, period_s: float, ring_capacity: int = 1 << 16):
        self._lib = _load_lib()
        self._h = self._lib.rt_create(int(period_s * 1e9), ring_capacity)

    def begin_cycle(self) -> int:
        return self._lib.rt_begin_cycle(self._h)

    def record(self, t_start_ns, solve_ns, status, cost, lat_dev, vel_dev, u0, u1):
        self._lib.rt_record(
            self._h, int(t_start_ns), int(solve_ns), int(status),
            float(cost), float(lat_dev), float(vel_dev), float(u0), float(u1),
        )

    def stats(self) -> dict:
        s = _Stats()
        self._lib.rt_stats(self._h, ctypes.byref(s))
        return {f: getattr(s, f) for f, _ in s._fields_}

    def export(self, path: str) -> int:
        return int(self._lib.rt_export(self._h, path.encode()))

    def close(self):
        if self._h:
            self._lib.rt_destroy(self._h)
            self._h = None
