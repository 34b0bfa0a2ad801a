"""Two-process jax.distributed execution of the multi-host trainer paths.

Spawns 2 REAL OS processes (2 local CPU devices each -> a 4-device global
mesh) joined through a localhost coordinator, and runs tests/mp_worker.py
in each: distributed_init -> _as_global_batch from per-host shards -> one
lockstep SPMD train step -> collective orbax save from every process ->
restore + shard equality. This executes for real what the single-process
suite can only reason about (VERDICT r03: `_as_global_batch`, the
every-process-saves rule, pod `distributed_init`).

Marked slow: two concurrent tiny-model compiles on the 1-core CI box.
Reference equivalent capability: era5_data/utils_dist.py:15-62 (torchrun).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_ROOT, "tests", "mp_worker.py")
_NPROCS = 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_save_resume(tmp_path):
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # the conftest compile cache is process-keyed-safe (content-addressed);
    # share it so repeat runs skip the compile
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(_ROOT, ".jax_cache"))
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(port), str(_NPROCS), str(i),
             str(tmp_path / "ckpt")],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=_ROOT,
        )
        for i in range(_NPROCS)
    ]
    results = []
    for i, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"worker {i} timed out (coordinator deadlock?)")
        assert p.returncode == 0, (
            f"worker {i} rc={p.returncode}\nstdout:{out[-2000:]}\n"
            f"stderr:{err[-2000:]}")
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        results.append(json.loads(line))

    for i, r in enumerate(results):
        assert r["pid"] == i
        assert r["process_count"] == _NPROCS
        assert r["device_count"] == 2 * _NPROCS
        assert r["restore_ok"] is True
    # the train loss is a global collective value — identical on all hosts
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], abs=0.0)
