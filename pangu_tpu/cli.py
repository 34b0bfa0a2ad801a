"""Shared CLI plumbing for the scripts/ entry points.

One flag system over the dataclass config (replacing the reference's
argparse + cfg-singleton + module-constant mix): every script takes
``--config file.yaml`` and repeated ``--set key=value`` dotted overrides.
"""

from __future__ import annotations

import argparse
import os

from pangu_tpu.config import (
    PanguConfig,
    apply_overrides,
    load_config,
    pangu_pretrain,
    pangu_tiny,
)


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config", type=str, default=None,
                   help="YAML/JSON config file (default: pretrained preset)")
    p.add_argument("--preset", type=str, default="pretrain",
                   choices=["pretrain", "tiny"],
                   help="base preset when --config is not given")
    p.add_argument("--horizon", type=int, default=24, choices=[1, 3, 6, 24])
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VALUE", help="dotted config override")
    p.add_argument("--out", type=str, default=None, help="output directory")
    p.add_argument("--weights", type=str, default=None,
                   help="checkpoint: orbax dir, reference .pth, or params .npz")
    p.add_argument("--aux-dir", type=str, default=None,
                   help="directory with normalization/mask .npy files "
                        "(synthetic constants when absent)")
    return p


def build_config(args) -> PanguConfig:
    # opt-in persistent compile cache for every CLI entry point: resumed
    # finetunes / repeated rollouts skip the minutes-long full-geometry
    # compile (see pangu_tpu.utils.compile_cache)
    if os.environ.get("PANGU_COMPILE_CACHE"):
        from pangu_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()
    if args.config:
        cfg = load_config(args.config)
    elif args.preset == "tiny":
        cfg = pangu_tiny()
    else:
        cfg = pangu_pretrain(horizon=args.horizon)
    if args.horizon and not args.config:
        cfg = cfg.replace(horizon=args.horizon)
    cfg = apply_overrides(cfg, args.overrides)
    if args.out:
        cfg = cfg.replace(out_dir=args.out)
    return cfg


def load_model_and_params(cfg: PanguConfig, args, aux):
    """Build the model and load params from --weights (any supported format),
    or init randomly."""
    import jax
    import numpy as np

    from pangu_tpu.model import PanguModel

    model = PanguModel(cfg.model)
    m = cfg.model
    if args.weights:
        path = args.weights
        if path.endswith(".pth"):
            from pangu_tpu.interop.torch_import import (
                load_torch_checkpoint,
                params_from_state_dict,
            )

            params = params_from_state_dict(cfg.model, load_torch_checkpoint(path))
        elif path.endswith(".npz"):
            from pangu_tpu.interop.npz_io import load_params_npz

            params = load_params_npz(path)
        else:  # orbax directory
            import orbax.checkpoint as ocp

            upper = np.zeros((1, m.upper_vars, m.levels, m.lat, m.lon), np.float32)
            surface = np.zeros((1, m.surface_vars, m.lat, m.lon), np.float32)
            template = jax.eval_shape(
                lambda: model.init(jax.random.PRNGKey(0), upper, surface, aux)
            )
            with ocp.StandardCheckpointer() as ckptr:
                params = ckptr.restore(os.path.abspath(path), {"params": template})[
                    "params"
                ]
    else:
        upper = np.zeros((1, m.upper_vars, m.levels, m.lat, m.lon), np.float32)
        surface = np.zeros((1, m.surface_vars, m.lat, m.lon), np.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(cfg.train.seed),
                                     upper, surface, aux)
    # commit to device once: .pth/.npz loads return host numpy trees, and a
    # numpy argument to a jitted function is re-transferred on EVERY call
    # (~1.1 GB per step for the pretrained params)
    return model, jax.device_put(params)
