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
