"""Probe whether the bench's big executables are WARM in the persistent
executable cache — without ever risking a cold compile.

Round 4's artifact (BENCH_r04.json) died blocked inside a "warm" train call
for >240 s and could not say whether the persistent cache missed or the chip
stalled. This probe answers that question in seconds:

* restores the train program from its jax.export blob (host-only — no trace,
  no device state),
* lowers it from ShapeDtypeStructs built out of the blob's own in_avals,
* attempts ``.compile()`` under ``cold_abort_compile``: a persistent-cache
  HIT deserializes + loads normally ("warm"); a MISS raises before XLA
  compilation starts ("cold", with the exact cache key that missed).

With ``--rollout`` it also probes the forecast-rollout program (pays the
~60 s host trace+lower; still no device compile).

Usage: python scripts/warm_probe.py [--rollout]
Prints one JSON line; exit code 0 either way (the answer is the output).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def register_export_types(cfg) -> None:
    """Register every pytree-node serialization the train export blob needs,
    from tiny representative instances (bytes of device memory, host-cheap).
    Must mirror what bench._register_export_serializations saw at export
    time: TrainState(params, optax chain state, step), Batch, AuxConstants."""
    import jax.numpy as jnp

    import bench
    from pangu_tpu.train.step import Batch, TrainState, make_optimizer

    opt = make_optimizer(cfg)
    tiny = {"w": jnp.zeros((1,), jnp.float32)}
    state = TrainState(tiny, opt.init(tiny), jnp.zeros((), jnp.int32))
    z = jnp.zeros((1,), jnp.float32)
    bench._register_export_serializations((state, Batch(z, z, z, z)))


def _capture_key_components(out: dict) -> None:
    """Record the per-component hashes jax folds into the executable cache
    key for the NEXT key computation — on a miss, diffing these against a
    previous run's identifies exactly which component drifted (same
    instrumentation as scripts/cache_key_probe.py, but for the real
    program)."""
    import hashlib

    from jax._src import cache_key as ck

    orig_get = ck.get

    def instrumented_get(module, devices, compile_options, backend,
                         *args, **kwargs):
        comps = {}
        for name, fn in (
            ("computation", lambda h: ck._hash_computation(
                h, module, ck.IgnoreCallbacks.NO)),
            ("backend", lambda h: ck._hash_platform(h, backend)),
            ("xla_flags", lambda h: ck._hash_xla_flags(
                h, ck.get_flag_prefixes())),
            ("compile_options", lambda h: ck._hash_serialized_compile_options(
                h, compile_options)),
            ("accelerator", lambda h: ck._hash_accelerator_config(
                h, devices)),
        ):
            h = hashlib.sha256()
            try:
                fn(h)
                comps[name] = h.hexdigest()[:16]
            except Exception as e:  # noqa: BLE001 — diagnostic best-effort
                comps[name] = f"error:{type(e).__name__}"
        out.setdefault("key_components", []).append(comps)
        return orig_get(module, devices, compile_options, backend,
                        *args, **kwargs)

    ck.get = instrumented_get


def probe_train(cfg, out: dict, blob_override: str | None = None) -> None:
    import jax

    import bench
    from pangu_tpu.utils.compile_cache import ColdCompileAbort, cold_abort_compile

    blob_path = blob_override or bench._train_export_blob_path(cfg)
    out["train_blob"] = os.path.basename(blob_path)
    out["train_blob_exists"] = os.path.exists(blob_path)
    if not out["train_blob_exists"]:
        out["train"] = "no-blob"
        return
    from jax import export as jexport

    register_export_types(cfg)
    with open(blob_path, "rb") as fh:
        restored = jexport.deserialize(fh.read())
    args, kwargs = jax.tree.unflatten(
        restored.in_tree,
        [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in restored.in_avals])
    t0 = time.monotonic()
    lowered = jax.jit(restored.call, donate_argnums=(0,)).lower(*args, **kwargs)
    out["train_lower_s"] = round(time.monotonic() - t0, 1)
    t0 = time.monotonic()
    try:
        with cold_abort_compile():
            lowered.compile()
        out["train"] = "warm"
    except ColdCompileAbort as e:
        out["train"] = "cold"
        out["train_missed_key"] = e.cache_key
    out["train_probe_s"] = round(time.monotonic() - t0, 1)


def probe_rollout(cfg, out: dict) -> None:
    import jax

    import bench
    from pangu_tpu.aux import synthetic_aux_constants
    from pangu_tpu.model import PanguModel
    from pangu_tpu.utils.compile_cache import ColdCompileAbort, cold_abort_compile

    import numpy as np

    m = cfg.model
    model = PanguModel(m)
    aux_np = synthetic_aux_constants(m, cfg.train)
    aux_s = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype), aux_np)
    upper_s = jax.ShapeDtypeStruct(
        (1, m.upper_vars, m.levels, m.lat, m.lon), np.float32)
    surface_s = jax.ShapeDtypeStruct((1, m.surface_vars, m.lat, m.lon), np.float32)
    key_s = jax.ShapeDtypeStruct((2,), np.uint32)
    t0 = time.monotonic()
    params_s = jax.eval_shape(model.init, key_s, upper_s, surface_s, aux_s)
    roll = bench._make_rollout(model)
    lowered = roll.lower(params_s, upper_s, surface_s, aux_s,
                         jax.ShapeDtypeStruct((), np.int32))
    out["rollout_lower_s"] = round(time.monotonic() - t0, 1)
    t0 = time.monotonic()
    try:
        with cold_abort_compile():
            lowered.compile()
        out["rollout"] = "warm"
    except ColdCompileAbort as e:
        out["rollout"] = "cold"
        out["rollout_missed_key"] = e.cache_key
    out["rollout_probe_s"] = round(time.monotonic() - t0, 1)


def main() -> None:
    import jax

    import bench
    from pangu_tpu.utils.compile_cache import log_cache_events

    plat = os.environ.get("PANGU_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    bench._enable_compile_cache()
    log_cache_events()

    from pangu_tpu.config import pangu_pretrain, pangu_tiny

    kw = dict(
        compute_dtype="bfloat16",
        matmul_precision="default",
        use_pallas_attention=jax.default_backend() == "tpu",
    )
    cfg = (pangu_tiny(**kw) if os.environ.get("PANGU_BENCH_TINY")
           else pangu_pretrain(horizon=24, **kw))

    out: dict = {"backend": jax.default_backend(),
                 "device_kind": jax.devices()[0].device_kind}
    _capture_key_components(out)
    blob = None
    if "--blob" in sys.argv:
        blob = sys.argv[sys.argv.index("--blob") + 1]
    probe_train(cfg, out, blob_override=blob)
    if "--rollout" in sys.argv:
        probe_rollout(cfg, out)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
