"""AOT-compiled serving artifacts (role of the reference's onnxruntime
inference engine, requirements.txt onnxruntime-gpu + all inference/*.py
ort.InferenceSession usage).

The reference serves forecasts through ONNX graphs executed by ORT's C++
runtime. The TPU-native equivalent is ``jax.export``: the jitted forecast
step (forward + de-normalization, weights and aux constants baked in as
constants) is serialized to a portable StableHLO artifact that any process
can deserialize and run — no model code, flax, or param pytrees needed at
serving time.

    # build once
    export_forecast_step(model, params, aux, "pangu24.bin")

    # serve anywhere
    step = load_forecast_step("pangu24.bin")
    upper_t1, surface_t1 = step(upper_t0, surface_t0)
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import numpy as np

from pangu_tpu.aux import AuxConstants, norm_back_data
from pangu_tpu.model import PanguModel


def make_serving_fn(model: PanguModel, params, aux: AuxConstants) -> Callable:
    """Closure: (upper, surface) -> (upper', surface') physical units, with
    params/aux baked in as compile-time constants."""

    def step(upper, surface):
        ou, os_ = model.apply(params, upper, surface, aux, True)
        return norm_back_data(ou, os_, aux)

    return step


def export_forecast_step(
    model: PanguModel,
    params,
    aux: AuxConstants,
    path: str,
    batch: int = 1,
    platforms: Optional[Sequence[str]] = None,
) -> None:
    """Serialize the jitted forecast step to a StableHLO artifact."""
    m = model.cfg
    upper = jax.ShapeDtypeStruct(
        (batch, m.upper_vars, m.levels, m.lat, m.lon), np.float32
    )
    surface = jax.ShapeDtypeStruct((batch, m.surface_vars, m.lat, m.lon), np.float32)
    fn = jax.jit(make_serving_fn(model, params, aux))
    # Pallas kernels lower to the tpu_custom_call StableHLO op, which
    # jax.export treats as non-portable and rejects by default. Allow it:
    # a TPU serving artifact is tied to a compatible libtpu exactly the way
    # the reference's ONNX graphs are tied to compatible ORT kernels.
    exported = jax.export.export(
        fn,
        platforms=platforms,
        disabled_checks=[
            jax.export.DisabledSafetyCheck.custom_call("tpu_custom_call")
        ],
    )(upper, surface)
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_forecast_step(path: str) -> Callable:
    """Deserialize an exported forecast step; returns a jitted callable
    (upper, surface) -> (upper', surface')."""
    with open(path, "rb") as f:
        exported = jax.export.deserialize(f.read())
    return jax.jit(exported.call)
