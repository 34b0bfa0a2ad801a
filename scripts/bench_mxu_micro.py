"""MXU microbenchmark: head_dim-32 score-dot layouts.

The attention score dots contract over head_dim=32 — 25% of the MXU's 128
lanes — and slice q/k 32 lanes at a time out of the (T, 3C) qkv block.
Question for the int8/packing lever (ROADMAP #1): does a (144,32)x(32,144)
dot cost ~the same as a 128-deep one (i.e. the contraction is padded), and
would block-diagonal packing of 4 heads into one 128-deep dot pay for its
packing cost?

Variants (per window, H=6 heads, T=144, d=32 — the outer-stage shape):
  loop      — per-head lane-sliced dots (the shipped kernel's schedule)
  blockdiag — 4-head block-diagonal K' (128-deep dot + in-kernel packing)

Prints one JSON line with microseconds per window per variant.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, D, H = 144, 32, 6
C = H * D
REPS = 64  # windows per program


def _loop_kernel(qkv_ref, out_ref):
    acc = jnp.zeros((T, T), jnp.float32)
    for r in range(REPS):
        for h in range(H):
            q = qkv_ref[r, :, h * D:(h + 1) * D]
            k = qkv_ref[r, :, C + h * D:C + (h + 1) * D]
            acc += jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
    out_ref[:] += acc


def _blockdiag_kernel(qkv_ref, out_ref):
    # pack 4 heads: Q' (T, 128) is a plain 128-lane slice; K' (128, 4T)
    # block-diagonal built with 4 VMEM updates. Two packs cover 6 heads
    # (second pack reuses heads 2-5 — same FLOP count as 6 useful heads
    # at 4/6 density; the measurement cares about MXU time, not math).
    acc = jnp.zeros((T, T), jnp.float32)
    for r in range(REPS):
        for base in (0, 2):
            q4 = qkv_ref[r, :, base * D:(base + 4) * D]          # (T, 128)
            zero = jnp.zeros((D, T), jnp.bfloat16)
            cols = []
            for i in range(4):
                k = qkv_ref[r, :, C + (base + i) * D:C + (base + i + 1) * D]
                cols.append(jnp.concatenate(
                    [k.T if j == i else zero for j in range(4)], axis=0))
            kp = jnp.concatenate(cols, axis=1)                    # (128, 4T)
            s = jax.lax.dot_general(
                q4, kp,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)               # (T, 4T)
            acc += sum(s[:, i * T:(i + 1) * T] for i in range(4))
    out_ref[:] += acc


def _qblockdiag_kernel(qkv_ref, out_ref):
    # Q' (4T, 128) block-diagonal, K4 = 4 heads' k lanes verbatim (T, 128):
    # Q' @ K4^T = row-stacked per-head scores (4T, T) — EXACTLY the
    # stacked-head layout the shipped kernel's softmax consumes, so this
    # packing would drop into the real kernel without any relayout.
    acc = jnp.zeros((T, T), jnp.float32)
    for r in range(REPS):
        for base in (0, 2):
            zero = jnp.zeros((T, D), jnp.bfloat16)
            rows = []
            for i in range(4):
                q = qkv_ref[r, :, (base + i) * D:(base + i + 1) * D]
                rows.append(jnp.concatenate(
                    [q if j == i else zero for j in range(4)], axis=1))
            qp = jnp.concatenate(rows, axis=0)                   # (4T, 128)
            k4 = qkv_ref[r, :, C + base * D:C + (base + 4) * D]  # (T, 128)
            s = jax.lax.dot_general(
                qp, k4,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)               # (4T, T)
            acc += sum(s[i * T:(i + 1) * T] for i in range(4))
    out_ref[:] += acc


def _loop_int8_kernel(qkv_ref, out_ref):
    # int8 q/k score dots (quantization cost excluded — this bounds the
    # BEST case): if the d=32 contraction is depth-padded to 128 either
    # way, int8's 2x MXU peak cannot show up and the lever is dead.
    acc = jnp.zeros((T, T), jnp.float32)
    for r in range(REPS):
        for h in range(H):
            q = qkv_ref[r, :, h * D:(h + 1) * D]
            k = qkv_ref[r, :, C + h * D:C + (h + 1) * D]
            acc += jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
    out_ref[:] += acc


def timeit(kernel, qkv) -> float:
    """us/window, tunnel-robust: each program repeats the whole REPS-window
    sweep G times via a sequential grid (accumulating into out so nothing is
    dead-code-eliminated); two grid lengths are timed and the paired
    difference cancels dispatch/tunnel latency (same methodology as
    bench.py's train bench)."""

    def gridded(qkv_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        kernel(qkv_ref, out_ref)

    def build(g):
        # scalar-sum return: float() forces a real device->host fetch —
        # block_until_ready can return without blocking through the tunnel
        f = jax.jit(lambda x: jnp.sum(pl.pallas_call(
            gridded,
            grid=(g,),
            in_specs=[pl.BlockSpec(qkv.shape, lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((T, T), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, T), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x)))
        float(f(qkv))  # compile + warm
        return f

    # large grids so the measured difference is device compute, not noise:
    # one sweep is only ~0.5 GFLOP (64 windows x 6 small dots)
    g_short, g_long = 512, 4608
    f_short, f_long = build(g_short), build(g_long)

    def once(f):
        t0 = time.perf_counter()
        float(f(qkv))
        return time.perf_counter() - t0

    diffs = sorted(once(f_long) - once(f_short) for _ in range(7))
    per_sweep = diffs[len(diffs) // 2] / (g_long - g_short)
    return per_sweep / REPS * 1e6  # us/window


def main() -> None:
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((REPS, T, 3 * C)), jnp.bfloat16)
    qkv8 = jnp.asarray(
        rng.integers(-127, 127, (REPS, T, 3 * C)), jnp.int8)
    out = {
        "loop_us_per_window": round(timeit(_loop_kernel, qkv), 2),
        "blockdiag_us_per_window": round(timeit(_blockdiag_kernel, qkv), 2),
        "qblockdiag_us_per_window": round(timeit(_qblockdiag_kernel, qkv), 2),
        "loop_int8_us_per_window": round(timeit(_loop_int8_kernel, qkv8), 2),
        "device_kind": jax.devices()[0].device_kind,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
