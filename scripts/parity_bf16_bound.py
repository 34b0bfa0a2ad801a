"""Full-geometry numerical-error bound of the bf16 speed path vs the f32
parity path (VERDICT r03 #2).

Everything benchmarked (compute_dtype=bfloat16 + one-hot patchify + Pallas
kernels on TPU, matmul_precision=default — the exact bench.py configuration)
differs from everything parity-tested against the torch reference
(float32 + reshape patchify + XLA + HIGHEST precision,
tests/test_full_model_parity.py: max|diff| 6.4e-6 at full geometry). This
script closes the gap: SAME f32 params, SAME inputs, both configurations at
the full published geometry (721x1440x13), deviation measured in the
model's native NORMALIZED output space (unit-scale by construction, so the
absolute numbers read directly as fractions of a standard deviation).

Prints one JSON line: max / mean|d| / RMS(d) per output plus per-variable
RMS, and the relative RMS against the f32 output's RMS. The measured bound
is recorded in docs/PARITY.md; tests/test_full_model_parity.py asserts it
(with slack) whenever the full-geometry lane runs.

Usage: python scripts/parity_bf16_bound.py [--tiny]
(--tiny: the pangu_tiny geometry for a fast wiring check on CPU.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402


def run(tiny: bool = False) -> dict:
    from pangu_tpu.aux import synthetic_aux_constants
    from pangu_tpu.config import pangu_pretrain, pangu_tiny
    from pangu_tpu.model import PanguModel

    make = pangu_tiny if tiny else (lambda **kw: pangu_pretrain(24, **kw))
    # the parity-tested configuration (tests/test_full_model_parity.py)
    cfg32 = make(compute_dtype="float32", matmul_precision="highest")
    # the benchmarked configuration (bench.py)
    cfg16 = make(
        compute_dtype="bfloat16",
        matmul_precision="default",
        use_pallas_attention=jax.default_backend() == "tpu",
    )
    m = cfg32.model
    aux = jax.device_put(synthetic_aux_constants(m, cfg32.train))

    rng = np.random.default_rng(7)
    upper = rng.standard_normal(
        (1, m.upper_vars, m.levels, m.lat, m.lon)).astype(np.float32)
    surface = rng.standard_normal(
        (1, m.surface_vars, m.lat, m.lon)).astype(np.float32)

    model32 = PanguModel(cfg32.model)
    model16 = PanguModel(cfg16.model)
    t0 = time.monotonic()
    params = jax.jit(model32.init)(jax.random.PRNGKey(0), upper, surface, aux)
    print(f"[bound +{time.monotonic() - t0:.0f}s] params ready",
          file=sys.stderr, flush=True)

    def fwd(model):
        u, s = jax.jit(
            lambda p, u, s, a: model.apply(p, u, s, a, True)
        )(params, upper, surface, aux)
        return np.asarray(u, np.float64), np.asarray(s, np.float64)

    u32, s32 = fwd(model32)
    print(f"[bound +{time.monotonic() - t0:.0f}s] f32 path done",
          file=sys.stderr, flush=True)
    u16, s16 = fwd(model16)
    print(f"[bound +{time.monotonic() - t0:.0f}s] bf16 path done",
          file=sys.stderr, flush=True)

    def stats(ref, got, var_axis=1):
        d = got - ref
        per_var = [
            round(float(np.sqrt(np.mean(np.take(d, i, var_axis) ** 2))), 6)
            for i in range(d.shape[var_axis])
        ]
        return {
            "max_abs": round(float(np.abs(d).max()), 6),
            "mean_abs": round(float(np.abs(d).mean()), 6),
            "rms": round(float(np.sqrt(np.mean(d ** 2))), 6),
            "rel_rms": round(float(np.sqrt(np.mean(d ** 2))
                                   / np.sqrt(np.mean(ref ** 2))), 6),
            "per_var_rms": per_var,
        }

    return {
        "geometry": "tiny" if tiny else "full-721x1440x13",
        "backend": jax.default_backend(),
        "device_kind": jax.devices()[0].device_kind,
        "pallas": bool(cfg16.model.use_pallas_attention),
        "upper": stats(u32, u16),
        "surface": stats(s32, s16),
    }


def main() -> None:
    if jax.default_backend() == "tpu":
        import bench

        bench._enable_compile_cache()
    out = run(tiny="--tiny" in sys.argv)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
