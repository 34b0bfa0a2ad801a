"""On-device A/B of train-step variants at full geometry.

Reuses bench.py's scan-amortized train-step timing for a list of config
variants (same process, same chip — the only comparison that means anything
through the shared-tunnel chip roulette; docs/PERFORMANCE.md). Each variant
is a separate full-geometry compile: expect ~minutes per UNCACHED variant
through the tunneled compile service.

Usage: python scripts/bench_train_ab.py [variant ...]
Variants: base (bf16+remat, the bench.py default), noremat, xla_mlp,
save_attn / save_attn_mlp (remat with attention / +MLP outputs saved),
xla_epilogue (attention-side fused_residual_postnorm routed through XLA),
unfused_tail (MLP-side fused_mlp_postnorm routed through raw fused_mlp +
XLA epilogue), xla_tails (both postnorm fusions off — the pre-fusion
round-3 state), fused_block (opt the rejected block-train megakernel back
in), unfused_block (megakernel explicitly off — now identical to base),
bf16_grads (mixed-precision grad tree: differentiate w.r.t. a bf16 param
copy, f32 masters and Adam moments unchanged).
Default: base xla_mlp.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



VARIANTS = ("base", "noremat", "save_attn", "save_attn_mlp", "bf16_grads",
            "fused_block", "unfused_block", "xla_mlp", "unfused_tail",
            "xla_epilogue", "xla_tails")


def run_variant(name: str) -> float:
    # a typo'd name would silently measure the base config and report it
    # under the wrong label — reject before spending device minutes
    if name not in VARIANTS:
        raise ValueError(f"unknown variant {name!r}; choose from {VARIANTS}")
    import jax

    import bench
    from pangu_tpu.aux import synthetic_aux_constants
    from pangu_tpu.config import pangu_pretrain
    from pangu_tpu.model import PanguModel

    kw = dict(
        horizon=24,
        compute_dtype="bfloat16",
        matmul_precision="default",
        use_pallas_attention=jax.default_backend() == "tpu",
    )
    if name == "noremat":
        kw["remat"] = False
    if name == "save_attn":
        kw["remat_save_attention"] = True
    if name == "save_attn_mlp":
        kw["remat_save_attention"] = True
        kw["remat_save_mlp"] = True
    if name == "bf16_grads":
        # mixed-precision grad tree: differentiate w.r.t. a bf16 param copy,
        # f32 masters/moments unchanged (config.py grads_dtype)
        kw["grads_dtype"] = "bfloat16"
    cfg = pangu_pretrain(**kw)

    from pangu_tpu.ops import fused_block_train as fbt
    from pangu_tpu.ops import fused_epilogue as fe
    from pangu_tpu.ops import fused_mlp as fm

    # save/restore EVERY patched flag as a unit, and keep the whole
    # setup+measure inside the try: a failure anywhere after patching
    # (device_put, init, compile) must not leak a variant's fusion state
    # into the next variant's measurement
    origs = (fbt._TRAIN_FUSION, fm._use_pallas_mlp, fm._POSTNORM_FUSION,
             fe._use_pallas)
    try:
        if name == "fused_block":
            # opt the rejected block-train megakernel back in (default off
            # since the A/B loss recorded in docs/PERFORMANCE.md)
            fbt._TRAIN_FUSION = True
        if name in ("unfused_block", "xla_mlp", "unfused_tail",
                    "xla_epilogue", "xla_tails"):
            # every pre-megakernel variant needs the block-train fusion off,
            # or the switches below would never be reached
            fbt._TRAIN_FUSION = False
        if name == "xla_mlp":
            # disable the raw fused-MLP custom_vjp: route Mlp through the
            # XLA einsum chain (the pre-round-3 training path)
            fm._use_pallas_mlp = lambda x, rows, c: 0
        if name in ("unfused_tail", "xla_tails"):
            # raw fused_mlp + unfused XLA LN/droppath/residual epilogue (the
            # pre-postnorm-fusion round-3 path)
            fm._POSTNORM_FUSION = False
        if name in ("xla_epilogue", "xla_tails"):
            # attention-side residual epilogue through the XLA chain instead
            # of the fused_residual_postnorm Pallas kernels
            fe._use_pallas = lambda x: False
        m = cfg.model
        # device-resident aux/inputs: numpy args to a jitted step are
        # re-uploaded (~350 MB) on EVERY timed call — avoidable noise in the
        # paired A/B differences (same fix as bench.py main())
        aux = jax.device_put(synthetic_aux_constants(m, cfg.train))
        model = PanguModel(m)
        upper, surface = bench._device_inputs(m)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), upper, surface,
                                     aux)
        value, _extra = bench.bench_train_step(cfg, model, aux, params,
                                               upper, surface)
    finally:
        (fbt._TRAIN_FUSION, fm._use_pallas_mlp, fm._POSTNORM_FUSION,
         fe._use_pallas) = origs
    return value


def main() -> None:
    import bench

    bench._enable_compile_cache()
    variants = sys.argv[1:] or ["base", "xla_mlp"]
    out = {}
    for name in variants:
        try:
            out[name] = round(run_variant(name), 5)
        except Exception as e:  # keep earlier numbers if one variant dies
            out[name] = f"error: {e}"[:200]
        print(json.dumps({name: out[name]}), flush=True)
    import jax

    print(json.dumps({"train_ab": out,
                      "device_kind": jax.devices()[0].device_kind}),
          flush=True)


if __name__ == "__main__":
    main()
