"""Benchmark: wall-clock per 24h forecast step on the flagship model.

Runs the full-geometry (721x1440x13) forward — the unit of work of both
training inference and autoregressive rollout — on the available accelerator,
bf16 compute path. The reference publishes no speed numbers; the driver's
north-star target is < 1 s per 24h step (BASELINE.md), which we use as the
baseline for ``vs_baseline`` (ratio > 1 means faster than target).

Prints exactly one JSON line:
  {"metric": "fwd_step_time_s", "value": ..., "unit": "s", "vs_baseline": ...}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_S = 1.0


def main() -> None:
    import jax

    from pangu_tpu.aux import synthetic_aux_constants
    from pangu_tpu.config import pangu_pretrain
    from pangu_tpu.model import PanguModel

    cfg = pangu_pretrain(
        horizon=24,
        compute_dtype="bfloat16",
        matmul_precision="default",
    )
    m = cfg.model
    aux = synthetic_aux_constants(m, cfg.train)
    model = PanguModel(m)

    rng = np.random.default_rng(0)
    upper = rng.standard_normal(
        (1, m.upper_vars, m.levels, m.lat, m.lon)
    ).astype(np.float32)
    surface = rng.standard_normal((1, m.surface_vars, m.lat, m.lon)).astype(np.float32)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), upper, surface, aux)

    @jax.jit
    def forward(params, upper, surface):
        return model.apply(params, upper, surface, aux, True)

    # warmup / compile
    out = forward(params, upper, surface)
    jax.block_until_ready(out)

    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        out = forward(params, upper, surface)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)

    value = float(np.median(times))
    print(json.dumps({
        "metric": "fwd_step_time_s",
        "value": round(value, 5),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / value, 4),
    }))


if __name__ == "__main__":
    main()
