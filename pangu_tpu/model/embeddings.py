"""Patch embedding and recovery.

The reference implements these as unfold/permute chains feeding 1x1 Conv1d
layers (models/layers.py:18-120,570-621). On TPU the natural form is a
reshape to (B, Z', H', W', patch_features) followed by a Dense — a single
large MXU matmul per field with no layout gymnastics. Channel orderings of
the flattened patch features replicate the reference's permutes exactly so
the pretrained Conv1d kernels import as plain (in, out) matrices:

  * surface embed features:  (var, lat-offset, lon-offset)        -> 7*4*4=112
  * upper embed features:    (var, z-offset, lat-offset, lon-off) -> 6*2*4*4=192
  * upper recovery channels: (var, z-offset, lat-offset, lon-off) -> 5*2*4*4=160
  * surface recovery:        (var, lat-offset, lon-offset)        -> 4*4*4=64

Normalization happens inside the embed (reference models/layers.py:56-99) with
the single canonical statistics orientation (see pangu_tpu.aux docstring).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pangu_tpu.aux import AuxConstants
from pangu_tpu.config import ModelConfig
from pangu_tpu.geometry import Geometry

_TRUNC = nn.initializers.truncated_normal(stddev=0.02)


class PatchEmbedding(nn.Module):
    """Normalize, concatenate constant fields, pad, patchify, project
    (reference PatchEmbedding_pretrain, models/layers.py:18-120).

    Output: (B, Z, H, W, C) token grid with the surface plane at z=0.
    """

    cfg: ModelConfig
    geom: Geometry
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST

    @nn.compact
    def __call__(
        self, upper: jnp.ndarray, surface: jnp.ndarray, aux: AuxConstants
    ) -> jnp.ndarray:
        cfg, g = self.cfg, self.geom
        pz, ph, pw = cfg.patch
        b = surface.shape[0]

        # ---- surface: (B, Vs, lat, lon) ----
        # normalize in fp32, then drop to compute dtype before the layout
        # chain so pads/reshapes/transposes move half the bytes on TPU
        surface = (surface - aux.surface_mean) / aux.surface_std
        surface = surface.astype(self.compute_dtype)
        surface = jnp.pad(surface, ((0, 0), (0, 0), (0, g.lat_pad), (0, 0)))
        masks = jnp.broadcast_to(
            aux.surface_mask[None], (b,) + aux.surface_mask.shape
        ).astype(surface.dtype)
        surface = jnp.concatenate([surface, masks], axis=1)  # (B, 7, latp, lon)
        cs = surface.shape[1]
        # patchify -> (B, H, W, var*ph*pw)
        surface = surface.reshape(b, cs, g.h, ph, g.w, pw)
        surface = surface.transpose(0, 2, 4, 1, 3, 5).reshape(b, g.h, g.w, cs * ph * pw)
        surface_tok = nn.Dense(
            cfg.dims[0], dtype=self.compute_dtype, param_dtype=self.param_dtype, precision=self.precision,
            kernel_init=_TRUNC, name="proj_surface",
        )(surface)

        # ---- upper: (B, Vu, L, lat, lon) ----
        upper = (upper - aux.upper_mean) / aux.upper_std
        upper = upper.astype(self.compute_dtype)
        const_h = jnp.broadcast_to(
            aux.const_h[None], (b,) + aux.const_h.shape
        ).astype(upper.dtype)
        upper = jnp.concatenate([upper, const_h], axis=1)  # (B, 6, L, lat, lon)
        upper = jnp.pad(
            upper, ((0, 0), (0, 0), (0, g.level_pad), (0, g.lat_pad), (0, 0))
        )
        cu = upper.shape[1]
        upper = upper.reshape(b, cu, g.z_upper, pz, g.h, ph, g.w, pw)
        # -> (B, Zu, H, W, var, dz, dy, dx)
        upper = upper.transpose(0, 2, 4, 6, 1, 3, 5, 7)
        upper = upper.reshape(b, g.z_upper, g.h, g.w, cu * pz * ph * pw)
        upper_tok = nn.Dense(
            cfg.dims[0], dtype=self.compute_dtype, param_dtype=self.param_dtype, precision=self.precision,
            kernel_init=_TRUNC, name="proj_upper",
        )(upper)

        # surface plane first (reference models/layers.py:116)
        return jnp.concatenate([surface_tok[:, None], upper_tok], axis=1)


class PatchRecovery(nn.Module):
    """Project tokens back to fields and crop the pads
    (reference PatchRecovery_pretrain, models/layers.py:570-621).

    Input: (B, Z, H, W, 2C). Outputs stay in normalized space — callers apply
    ``norm_back_data`` (the reference comments out in-model denorm,
    models/layers.py:602,617).
    """

    cfg: ModelConfig
    geom: Geometry
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg, g = self.cfg, self.geom
        pz, ph, pw = cfg.patch
        b = x.shape[0]
        vu, vs = cfg.upper_vars, cfg.surface_vars

        # ---- upper: planes z >= 1 ----
        up = nn.Dense(
            cfg.recovery_upper_channels, dtype=self.compute_dtype,
            param_dtype=self.param_dtype, precision=self.precision,
            kernel_init=_TRUNC, name="head_upper",
        )(x[:, 1:])
        up = up.reshape(b, g.z_upper, g.h, g.w, vu, pz, ph, pw)
        # -> (B, var, Zu, dz, H, dy, W, dx)
        up = up.transpose(0, 4, 1, 5, 2, 6, 3, 7)
        up = up.reshape(b, vu, g.z_upper * pz, g.h * ph, g.w * pw)
        up = up[:, :, : cfg.levels, : cfg.lat, :]

        # ---- surface: plane z == 0 ----
        sf = nn.Dense(
            cfg.recovery_surface_channels, dtype=self.compute_dtype,
            param_dtype=self.param_dtype, precision=self.precision,
            kernel_init=_TRUNC, name="head_surface",
        )(x[:, 0])
        sf = sf.reshape(b, g.h, g.w, vs, ph, pw)
        sf = sf.transpose(0, 3, 1, 4, 2, 5)  # (B, var, H, dy, W, dx)
        sf = sf.reshape(b, vs, g.h * ph, g.w * pw)
        sf = sf[:, :, : cfg.lat, :]

        return up.astype(jnp.float32), sf.astype(jnp.float32)
