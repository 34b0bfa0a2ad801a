"""utils/ subsystem smoke tests: logging (reference era5_data/utils.py:18-38),
param summary (era5_data/utils.py:142-176), and profiling / system monitoring
(models/pangu_sample.py:21-72)."""

import glob
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from pangu_tpu.utils.logger import get_logger
from pangu_tpu.utils.profiling import (
    device_memory_stats,
    monitor_system,
    system_snapshot,
    trace,
)
from pangu_tpu.utils.summary import param_count, summarize_params


def test_logger_writes_file_and_is_idempotent(tmp_path):
    path = tmp_path / "sub" / "run.log"  # parent dir is created
    logger = get_logger("test-utils-logger", str(path))
    logger.info("hello from the test")
    for h in logger.handlers:
        h.flush()
    assert "hello from the test" in path.read_text()
    # second get_logger must not stack duplicate handlers
    again = get_logger("test-utils-logger", str(path))
    assert again is logger
    assert len(again.handlers) == 2  # file + stream


def test_param_summary():
    params = {"params": {"dense": {"kernel": np.zeros((4, 8)),
                                   "bias": np.zeros((8,))},
                         "norm": {"scale": np.zeros((8,))}}}
    assert param_count(params) == 4 * 8 + 8 + 8
    text = summarize_params(params)
    assert "total parameters: 48" in text
    assert "dense" in text and "(4, 8)" in text


def test_profiler_trace_captures(tmp_path):
    with trace(str(tmp_path)):
        jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64))).block_until_ready()
    # jax writes plugins/profile/<ts>/*.xplane.pb under the log dir
    captured = glob.glob(str(tmp_path / "**" / "*.xplane.pb"), recursive=True)
    assert captured, "profiler produced no trace artifacts"


def test_trace_device_busy_split(tmp_path):
    """The bench's device-busy parser reads the "XLA Modules" lane (real
    execution spans) separately from the "XLA Ops" lane, which
    double-counts anything under a loop outline (measured 2x on v5e —
    docs/PERFORMANCE.md round-5 notes). Synthesized trace: one device pid
    with both lanes plus a host pid that must be ignored."""
    import gzip
    import json

    from pangu_tpu.utils.profiling import (
        trace_device_busy_ms,
        trace_device_busy_split,
    )

    events = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 1, "tid": 10, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 1, "tid": 11, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 2, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 2, "tid": 20, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        # modules lane: one 700 ms execution span
        {"ph": "X", "pid": 1, "tid": 10, "name": "jit_call", "dur": 700000},
        # ops lane: while outline (700) + inner ops (600 + 100 copy) = 2x
        {"ph": "X", "pid": 1, "tid": 11, "name": "while", "dur": 700000},
        {"ph": "X", "pid": 1, "tid": 11, "name": "fusion.1", "dur": 600000},
        {"ph": "X", "pid": 1, "tid": 11, "name": "copy.2", "dur": 100000},
        # host lane must not count
        {"ph": "X", "pid": 2, "tid": 20, "name": "fusion.9", "dur": 999000},
    ]
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    split = trace_device_busy_split(str(tmp_path))
    assert split == {"modules_ms": 700.0, "ops_ms": 1400.0, "copy_ms": 100.0}
    # the scalar helper prefers the modules lane
    assert trace_device_busy_ms(str(tmp_path)) == 700.0
    assert trace_device_busy_ms(str(tmp_path), steps=2) == 350.0
    # no trace at all -> None (CPU rehearsals skip the field)
    assert trace_device_busy_split(str(tmp_path / "empty")) is None


def test_system_snapshot_and_monitor(caplog):
    snap = system_snapshot()
    assert snap["disk_total_gb"] > 0
    assert len(snap["loadavg"]) == 3
    assert isinstance(device_memory_stats(), dict)
    logger = logging.getLogger("test-utils-monitor")
    with caplog.at_level(logging.INFO, logger="test-utils-monitor"):
        monitor_system(interval=0.01, duration=0.02, logger=logger)
    assert any("disk" in r.message for r in caplog.records)
