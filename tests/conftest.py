"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-native answer to "multi-node without a cluster" (SURVEY §4):
XLA's host platform fakes 8 devices in one process, so every sharding /
collective path is exercised by plain pytest.
"""

import os
import sys

# Must be set before jax is imported anywhere. Force (not setdefault): the
# environment pre-sets JAX_PLATFORMS to the TPU plugin, and tests must run
# on the virtual CPU mesh. Set PANGU_TPU_TESTS=1 to keep the real TPU
# (enables tests/test_tpu_kernels.py; everything multi-device skips).
_ON_TPU = os.environ.get("PANGU_TPU_TESTS") == "1"

import jax  # noqa: E402

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    # The environment's TPU plugin re-inserts itself into jax_platforms at
    # import (ignoring JAX_PLATFORMS), so pin the config explicitly.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the suite is compile-dominated (tiny-geometry
# model steps over an 8-device mesh, ~1 CPU core), and most test runs compile
# the same programs as the last one. Cache survives across pytest processes.
from jax.experimental.compilation_cache import compilation_cache as _cc  # noqa: E402

_cc.set_cache_dir(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def has_reference() -> bool:
    if not os.path.isdir(REFERENCE_DIR):
        return False
    try:
        import torch  # noqa: F401

        return True
    except ImportError:
        return False


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo or torch unavailable"
)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------------------
# fast/slow lanes (VERDICT r03 #9). The default run (`pytest`) excludes only
# the opt-in `slow` tier (full-geometry golden tests, multi-process jigs —
# see pyproject.toml addopts). `pytest -m fast` is the <4 min inner loop:
# modules listed here are auto-marked `fast` (measured cheap on the 1-core
# CPU host: no full-model train-step compiles over the 8-device mesh).
# A file-level pytestmark still wins — the hook only ADDS the marker.
# ---------------------------------------------------------------------------
_FAST_MODULES = {
    "test_bench_logic",
    "test_compile_cache",
    "test_config",
    "test_data",
    "test_eval",
    "test_flops",
    "test_geometry",
    "test_golden_guard",
    "test_interop_cli",
    "test_metrics",
    "test_native_loader",
    "test_onnx_import",
    "test_rollout",
    "test_utils",
}


def pytest_collection_modifyitems(items):
    for item in items:
        # never promote an explicitly slow test into the fast lane
        # (`-m fast` overrides the default `-m 'not slow'` addopts, so a
        # fast+slow test WOULD be collected there)
        if ("slow" not in item.keywords
                and item.module.__name__.rsplit(".", 1)[-1] in _FAST_MODULES):
            item.add_marker(pytest.mark.fast)
