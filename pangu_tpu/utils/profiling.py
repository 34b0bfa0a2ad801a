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


def trace_device_busy_ms(log_dir: str, steps: int = 1):
    """Total DEVICE-lane op time (ms per step) in the newest trace-viewer
    dump under ``log_dir``: the sum of 'X' events in the leaf "XLA Ops"
    threads of TPU/device processes (container lanes — Steps, queues, the
    jit umbrella — double-count everything beneath them and are excluded;
    same lane selection as scripts/profile_train.py). Returns None when no
    trace or no device lanes exist (e.g. CPU rehearsals) — callers treat
    the field as optional."""
    import glob
    import gzip
    import json

    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return None
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        events = json.load(f).get("traceEvents", [])
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
        elif e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    device_pids = {p for p, n in pnames.items()
                   if "TPU" in n or "/device" in n.lower()}
    op_lanes = {k for k, n in tnames.items()
                if k[0] in device_pids and "XLA Ops" in n}
    if not op_lanes:
        return None
    total_us = sum(e.get("dur", 0) for e in events
                   if e.get("ph") == "X"
                   and (e.get("pid"), e.get("tid")) in op_lanes)
    return total_us / 1e3 / max(1, steps)


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
