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


def test_system_snapshot_and_monitor(caplog):
    snap = system_snapshot()
    assert snap["disk_total_gb"] > 0
    assert len(snap["loadavg"]) == 3
    assert isinstance(device_memory_stats(), dict)
    logger = logging.getLogger("test-utils-monitor")
    with caplog.at_level(logging.INFO, logger="test-utils-monitor"):
        monitor_system(interval=0.01, duration=0.02, logger=logger)
    assert any("disk" in r.message for r in caplog.records)
