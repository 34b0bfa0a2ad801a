"""Profiling / system monitoring.

TPU-native replacement for the reference's nvidia-smi/df polling
(monitor_system, reference models/pangu_sample.py:21-72): a jax.profiler
trace context, device memory stats, and a host/disk snapshot.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import time
from typing import Dict, Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device+host profile viewable in TensorBoard/Perfetto."""
    with jax.profiler.trace(log_dir):
        yield


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device live-memory counters where the backend exposes them."""
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                k: v for k, v in stats.items()
                if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit",
                         "largest_alloc_size")
            }
    return out


def system_snapshot() -> Dict[str, object]:
    """Host-side disk/load snapshot (role of df -h polling)."""
    du = shutil.disk_usage("/")
    snap: Dict[str, object] = {
        "time": time.strftime("%Y-%m-%d %H:%M:%S"),
        "disk_total_gb": round(du.total / 2**30, 1),
        "disk_used_gb": round(du.used / 2**30, 1),
        "loadavg": os.getloadavg(),
        "devices": device_memory_stats(),
    }
    return snap


def monitor_system(interval: float = 5.0, duration: float = 60.0, logger=None):
    """Poll and print/log system snapshots (reference models/pangu_sample.py:47-72)."""
    end = time.time() + duration
    while time.time() < end:
        snap = system_snapshot()
        msg = (
            f"[{snap['time']}] disk {snap['disk_used_gb']}/{snap['disk_total_gb']}GB "
            f"load {snap['loadavg']} devices {snap['devices']}"
        )
        (logger.info if logger else print)(msg)
        time.sleep(interval)
