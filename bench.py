"""Benchmark: wall-clock per 24h forecast step on the flagship model.

Times a K-step autoregressive rollout (forward + de/re-normalization feedback,
the unit of work of production inference; reference
inference/inference_multiOutput.py:171-197) compiled as ONE jitted
``lax.scan``, and reports per-step time. Running all steps device-side in a
single dispatch amortizes host<->device round-trip latency — required for
honest numbers through high-latency device tunnels.

The reference publishes no speed numbers; the driver's north-star target is
< 1 s per 24h step (BASELINE.md), used as the baseline for ``vs_baseline``
(ratio > 1 means faster than target).

Prints exactly one JSON line:
  {"metric": "fwd_step_time_s", "value": ..., "unit": "s", "vs_baseline": ...}
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_S = 1.0
ROLLOUT_STEPS = 10


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pangu_tpu.aux import norm_back_data, synthetic_aux_constants
    from pangu_tpu.config import pangu_pretrain
    from pangu_tpu.model import PanguModel

    cfg = pangu_pretrain(
        horizon=24,
        compute_dtype="bfloat16",
        matmul_precision="default",
        use_pallas_attention=jax.default_backend() == "tpu",
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

    from functools import partial

    @partial(jax.jit, static_argnames=("steps",))
    def rollout(params, upper, surface, steps=ROLLOUT_STEPS):
        def step(carry, _):
            u, s = carry
            ou, os_ = model.apply(params, u, s, aux, True)
            ou, os_ = norm_back_data(ou, os_, aux)
            return (ou, os_), ()

        (u, s), _ = jax.lax.scan(step, (upper, surface), length=steps)
        # scalar summary so timing includes no bulk device->host transfer
        return jnp.sum(u[:, 0, 0, ::360, ::360]) + jnp.sum(s[:, 0, ::360, ::360])

    # warmup / compile
    float(rollout(params, upper, surface))

    # Difference of two rollout lengths cancels the host<->device round-trip
    # cost (seconds, and noisy, through tunneled devices), leaving per-step
    # device time. A wide K gap and min-of-several reps bound the noise to a
    # few ms/step.
    def timed(k, reps=4):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(rollout(params, upper, surface, k))
            best = min(best, time.perf_counter() - t0)
        return best

    k_short, k_long = 5, 45
    float(rollout(params, upper, surface, k_short))  # compile
    float(rollout(params, upper, surface, k_long))
    value = (timed(k_long) - timed(k_short)) / (k_long - k_short)
    print(json.dumps({
        "metric": "fwd_step_time_s",
        "value": round(value, 5),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / value, 4),
    }))


if __name__ == "__main__":
    main()
