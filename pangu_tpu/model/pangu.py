"""The Pangu-Weather backbone (reference models/pangu_model.py:18-104).

U-shaped Earth-Specific Transformer:
  embed -> layer0 (C, full grid) -> skip -> down -> layer1 -> layer2 (2C,
  half grid) -> up -> layer3 (C, full grid) -> concat skip -> recovery.

The forward is a pure function of (params, upper, surface, aux); constants
ride in the input pytree rather than being buried in module state, so a
single jitted step serves train/eval/rollout and sharding annotations can be
applied to every input.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from jax.sharding import PartitionSpec as P

from pangu_tpu.aux import AuxConstants
from pangu_tpu.config import ModelConfig
from pangu_tpu.geometry import compute_geometry
from pangu_tpu.model.blocks import DownSample, EarthSpecificLayer, UpSample
from pangu_tpu.model.embeddings import PatchEmbedding, PatchRecovery
from pangu_tpu.parallel.mesh import TOKEN_SPEC, maybe_shard

#: token-grid sharding: batch on 'data', lat/lon of the (B, Z, H, W, C) grid
#: on the spatial mesh axes (sequence parallelism — SURVEY §5.7). The *real*
#: lat sharding happens inside EarthSpecificLayer on the window-padded grid
#: (odd unpadded extents never divide a mesh axis); the stage-boundary
#: constraints here keep batch/lon layouts pinned between stages.
_TOKEN_SPEC = TOKEN_SPEC


def drop_path_rates(cfg: ModelConfig) -> Tuple[Tuple[float, ...], ...]:
    """Linear stochastic-depth ramp over all blocks
    (reference models/pangu_model.py:29)."""
    total = sum(cfg.depths)
    ramp = np.linspace(0.0, cfg.drop_path_max, total)
    out = []
    off = 0
    for d in cfg.depths:
        out.append(tuple(float(r) for r in ramp[off : off + d]))
        off += d
    return tuple(out)


def backbone_modules(cfg: ModelConfig, deterministic: bool):
    """Construct every backbone submodule with its canonical name.

    Shared by :class:`PanguModel` and the pipeline stages
    (``pangu_tpu.parallel.pipeline``) so the two can never drift: one param
    tree, partitioned by top-level module name, serves both execution forms.
    Returned instances are unbound — call them inside an ``@nn.compact``
    body.
    """
    g = compute_geometry(cfg)
    cdt = jnp.dtype(cfg.compute_dtype)
    pdt = jnp.dtype(cfg.param_dtype)
    prec = {"default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST}[cfg.matmul_precision]
    dpr = drop_path_rates(cfg)
    remat = cfg.remat and not deterministic

    saves = (("attn_out",) if cfg.remat_save_attention else ()) + \
        (("mlp_out",) if cfg.remat_save_mlp else ())
    remat_policy = (
        jax.checkpoint_policies.save_only_these_names(*saves)
        if saves else None
    )

    def layer(i, stage):
        return EarthSpecificLayer(
            stage=stage,
            depth=cfg.depths[i],
            dim=cfg.dims[i],
            heads=cfg.heads[i],
            drop_path_rates=dpr[i],
            mlp_ratio=cfg.mlp_ratio,
            dropout_rate=cfg.dropout_rate,
            remat=remat,
            remat_policy=remat_policy,
            compute_dtype=cdt,
            param_dtype=pdt,
            use_pallas=cfg.use_pallas_attention,
            precision=prec,
            name=f"layer{i}",
        )

    return g, {
        "patch_embed": PatchEmbedding(cfg, g, compute_dtype=cdt,
                                      param_dtype=pdt, precision=prec,
                                      name="patch_embed"),
        "layer0": layer(0, g.outer),
        "downsample": DownSample(cfg.dims[0], g.h_down_pad, compute_dtype=cdt,
                                 param_dtype=pdt, precision=prec,
                                 name="downsample"),
        "layer1": layer(1, g.inner),
        "layer2": layer(2, g.inner),
        "upsample": UpSample(cfg.dims[2], cfg.dims[3], g.h, compute_dtype=cdt,
                             param_dtype=pdt, precision=prec, name="upsample"),
        "layer3": layer(3, g.outer),
        "patch_recovery": PatchRecovery(cfg, g, compute_dtype=cdt,
                                        param_dtype=pdt, precision=prec,
                                        name="patch_recovery"),
    }


class PanguModel(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        upper: jnp.ndarray,  # (B, Vu, L, lat, lon), physical units
        surface: jnp.ndarray,  # (B, Vs, lat, lon), physical units
        aux: AuxConstants,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        g, mods = backbone_modules(self.cfg, deterministic)

        upper = maybe_shard(upper, P("data", None, None, "lat", "lon"))
        surface = maybe_shard(surface, P("data", None, "lat", "lon"))

        x = mods["patch_embed"](upper, surface, aux)
        x = maybe_shard(x, _TOKEN_SPEC)

        x = mods["layer0"](x, deterministic)
        skip = x
        x = mods["downsample"](x, deterministic)
        x = maybe_shard(x, _TOKEN_SPEC)
        x = mods["layer1"](x, deterministic)
        x = mods["layer2"](x, deterministic)
        x = mods["upsample"](x, deterministic)
        x = maybe_shard(x, _TOKEN_SPEC)
        x = mods["layer3"](x, deterministic)

        # Channel-concat skip connection (reference models/pangu_model.py:98).
        x = jnp.concatenate([skip, x], axis=-1)

        return mods["patch_recovery"](x)
