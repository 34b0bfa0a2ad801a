"""bench.py host-side logic — timing robustness and fallback behavior.

These exercise the pure-host pieces of the benchmark harness (no device):
the paired-difference estimator, its sick-tunnel fallback, and the budget
early-stop. The device path is validated by running bench.py itself
(docs/PERFORMANCE.md records the reference runs).
"""

from __future__ import annotations

import itertools

import pytest

import bench


@pytest.fixture(autouse=True)
def big_budget(monkeypatch):
    # _robust_step_time consults the process-wide bench budget for its
    # early-stop; give tests room unless they set their own
    monkeypatch.setenv("PANGU_BENCH_BUDGET", "100000")


def test_healthy_timings_recover_exact_step_time():
    t = lambda k: 0.17 * k + 2.0  # 2 s tunnel round trip per dispatch
    value, extra = bench._robust_step_time(
        t, 5, 25, reps=5, min_reps=2, reserve=0)
    assert value == pytest.approx(0.17)
    assert extra == {}


def test_sick_tunnel_falls_back_to_upper_bound():
    # round trips uncorrelated with k, short calls sometimes slower than
    # long ones: the median difference goes negative
    vals = itertools.cycle([31.0, 24.0, 40.0, 28.0, 33.0, 26.0])
    t = lambda k: next(vals)
    value, extra = bench._robust_step_time(
        t, 5, 25, reps=3, min_reps=2, reserve=0)
    assert extra.get("timing_degraded") is True
    # the reported value is min over t(k_long)/k_long
    assert value == pytest.approx(24.0 / 25)
    assert "paired_diff_step_time_s" in extra


def test_progress_box_fills_as_pairs_complete():
    t = lambda k: 0.5 * k + 1.0
    progress = {}
    bench._robust_step_time(
        t, 2, 8, reps=3, min_reps=2, reserve=0, progress=progress)
    assert len(progress["floors"]) == 3
    assert len(progress["diffs"]) == 3
    assert progress["diffs"][0] == pytest.approx(0.5)


def test_nonpositive_reps_still_produce_a_value():
    t = lambda k: 0.3 * k + 1.0
    value, _ = bench._robust_step_time(
        t, 5, 25, reps=0, min_reps=1, reserve=0)
    assert value == pytest.approx(0.3)


def test_train_export_roundtrip(tmp_path, monkeypatch):
    """The bench's jax.export fast path must round-trip, not silently fall
    back to inline lowering (the fallback costs ~120 s of the driver's
    bench budget at flagship geometry)."""
    import jax
    import jax.numpy as jnp

    from pangu_tpu.aux import synthetic_aux_constants
    from pangu_tpu.config import pangu_tiny
    from pangu_tpu.model import PanguModel

    cfg = pangu_tiny()
    aux = synthetic_aux_constants(cfg.model, cfg.train)
    model = PanguModel(cfg.model)
    upper, surface = bench._device_inputs(cfg.model)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), upper, surface, aux)

    blob = tmp_path / "train_export_test.bin"
    monkeypatch.setattr(bench, "_train_export_blob_path",
                        lambda _cfg, _batch=1: str(blob))

    # cold: traces, exports, and returns a program lowered through the
    # serialize->deserialize round-trip (via="export-new", NOT the inline
    # fallback). Each box gets its own params copy: the program donates its
    # state, whose buffers alias the params tree passed in.
    box = bench._prelower_train(cfg, bench._make_train_objects(
        cfg, model, aux, jax.tree.map(jnp.copy, params), upper, surface))
    assert box.get("via") == "export-new", (
        box.get("error") or f"unexpected path {box.get('via')}")
    assert blob.exists() and blob.stat().st_size > 0
    state, total = box["lowered"].compile()(box["state"], box["batch"], aux,
                                            jnp.asarray(2, jnp.int32))
    assert jnp.isfinite(total)

    # warm: restores the blob (no re-trace) and the program still runs
    box2 = bench._prelower_train(cfg, bench._make_train_objects(
        cfg, model, aux, jax.tree.map(jnp.copy, params), upper, surface))
    assert box2.get("via") == "export-restore", (
        box2.get("error") or f"unexpected path {box2.get('via')}")
    _, total2 = box2["lowered"].compile()(box2["state"], box2["batch"], aux,
                                          jnp.asarray(1, jnp.int32))
    assert jnp.isfinite(total2)


def test_base_rng_matches_prngkey_zero():
    """bench builds its loop base key as host zeros (two tunnel D2H hangs
    forced device-traffic-free construction — see _make_train_objects); it
    must stay bit-identical to jax.random.PRNGKey(0) so the traced HLO —
    and every primed executable-cache key — never drifts."""
    import jax
    import numpy as np

    np.testing.assert_array_equal(np.asarray(jax.random.PRNGKey(0)),
                                  np.zeros((2,), np.uint32))


def test_budget_early_stop(monkeypatch):
    monkeypatch.setenv("PANGU_BENCH_BUDGET", "0")  # budget already spent
    calls = []

    def t(k):
        calls.append(k)
        return 0.2 * k + 1.0

    value, _ = bench._robust_step_time(
        t, 5, 25, reps=10, min_reps=2, reserve=60)
    # stops at min_reps pairs (2 pairs = 4 calls), not 10
    assert len(calls) == 4
    assert value == pytest.approx(0.2)


def _run_bench_tiny(cache_dir, extra_env=None, timeout=500):
    import json
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PANGU_BENCH_TINY="1", PANGU_BENCH_PLATFORM="cpu",
               PANGU_BENCH_BUDGET="420", PANGU_BENCH_FWD_RESERVE="120",
               PANGU_BENCH_FWD_REPS="2", PANGU_BENCH_TRAIN_REPS="2",
               PANGU_COMPILE_CACHE=str(cache_dir), **(extra_env or {}))
    res = subprocess.run([sys.executable, os.path.join(root, "bench.py")],
                         capture_output=True, text=True, timeout=timeout,
                         cwd=root, env=env)
    assert res.returncode == 0, res.stderr[-2000:]
    lines = [json.loads(l) for l in res.stdout.splitlines()
             if l.startswith("{")]
    return lines, res


@pytest.mark.slow
def test_bench_main_protocol_tiny(tmp_path):
    """The WHOLE bench flow (both-cold -> train phase first, insurance
    line, merged final line) as the driver runs it — tiny geometry on CPU
    with a hermetic compile cache, so both programs are COLD and train
    keeps priority (prime-run semantics). Guards the driver artifact:
    rounds 2 and 3 each lost a metric to an untested path in this file.
    Asserts the output protocol, not the numbers."""
    lines, res = _run_bench_tiny(tmp_path / "cache")
    assert len(lines) == 2, res.stdout
    insurance, final = lines
    # insurance line: train metric, flushed before the forward phase
    assert insurance["metric"] == "train_step_time_s"
    assert insurance["train_step_time_s"] is not None
    assert insurance["train_step_time_s"] > 0
    assert insurance["phase_order"] == "train-first"
    assert insurance["train_probe"] == "cold"  # hermetic cache
    # final merged line: the driver parses THIS one (last JSON line)
    assert final["metric"] == "fwd_step_time_s"
    assert final["value"] == final["fwd_step_time_s"] > 0
    assert final["vs_baseline"] > 0
    assert final["train_step_time_s"] == insurance["train_step_time_s"]
    assert "device_kind" in final
    # self-diagnosis fields (round-4 verdict #1a): the artifact records
    # cache traffic and host load
    assert final["cache_misses"] >= 2  # train + rollout, both cold
    assert "loadavg_1m" in final

    # ---- second run, WARM cache: both probes hit, train-first, and the
    # stderr narration carries jax's persistent-cache hit lines ----
    lines2, res2 = _run_bench_tiny(tmp_path / "cache")
    final2 = lines2[-1]
    assert final2["train_step_time_s"] > 0
    assert final2["fwd_step_time_s"] > 0
    assert final2["train_probe"] == "warm"
    assert final2["cache_hits"] >= 2
    assert "compilation cache hit" in res2.stderr.lower()

    # ---- third run: train program re-keyed (batch 2) while the rollout
    # stays warm -> the ADAPTIVE order must flip to fwd-first, flush the
    # warm forward number as insurance, then cold-compile train with the
    # remaining budget (fast on CPU) — the round-4 failure mode, fixed ----
    lines3, res3 = _run_bench_tiny(tmp_path / "cache",
                                   {"PANGU_BENCH_TRAIN_BATCH": "2"})
    assert len(lines3) == 3, res3.stdout
    fwd_ins, train_ins, final3 = lines3
    assert fwd_ins["metric"] == "fwd_step_time_s"
    assert fwd_ins["fwd_step_time_s"] > 0  # captured BEFORE the cold train
    assert train_ins["metric"] == "train_step_time_s"
    assert final3["phase_order"] == "fwd-first"
    assert final3["train_probe"] == "cold"
    assert final3["rollout_probe"] == "warm"
    assert final3["train_batch"] == 2
    assert final3["train_step_time_s"] > 0  # the cold attempt completed
    assert final3["fwd_step_time_s"] == fwd_ins["fwd_step_time_s"]
