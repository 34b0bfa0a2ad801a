"""Patch embedding and recovery.

The reference implements these as unfold/permute chains feeding 1x1 Conv1d
layers (models/layers.py:18-120,570-621). Here they are a single projection
matmul per field with one of two equivalent layout strategies:

  * **reshape path** (fp32 / parity / off-TPU): reshape to
    (B, Z', H', W', patch_features) then Dense. Bit-matches the reference.
  * **one-hot path** (bf16 speed path): the patch gather/scatter along the
    1440-wide longitude lane dimension is expressed as matmuls against
    constant one-hot selection matrices, so the lanes never get split —
    splitting them forces full-tensor tiled relayouts that profile at
    ~47 ms/step at full geometry (the two hottest non-matmul ops in the
    model). The one-hot form runs the same math on the MXU in ~1/4 the time
    and matches the reshape path to bf16 ulp.

Channel orderings of the flattened patch features replicate the reference's
permutes exactly so the pretrained Conv1d kernels import as plain (in, out)
matrices:

  * surface embed features:  (var, lat-offset, lon-offset)        -> 7*4*4=112
  * upper embed features:    (var, z-offset, lat-offset, lon-off) -> 6*2*4*4=192
  * upper recovery channels: (var, z-offset, lat-offset, lon-off) -> 5*2*4*4=160
  * surface recovery:        (var, lat-offset, lon-offset)        -> 4*4*4=64

Normalization happens inside the embed (reference models/layers.py:56-99) with
the single canonical statistics orientation (see pangu_tpu.aux docstring).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pangu_tpu.aux import AuxConstants
from pangu_tpu.config import ModelConfig
from pangu_tpu.geometry import Geometry

_TRUNC = nn.initializers.truncated_normal(stddev=0.02)


def _lon_onehot(lon: int, pw: int, dtype) -> jnp.ndarray:
    """(LON, pw, W): S[l, l%pw, l//pw] = 1 — lane gather as a matmul.

    Built IN-GRAPH from iotas: as a numpy constant this is a multi-MB
    inlined literal per use site, and the full-geometry program must stay
    under the remote-compile request size limit (docs/PERFORMANCE.md)."""
    shape = (lon, pw, lon // pw)
    l = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    d = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    w = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    return (l == w * pw + d).astype(dtype)


def _lat_onehot(latp: int, ph: int, dtype) -> jnp.ndarray:
    """(LATp, H, ph): R[r, r//ph, r%ph] = 1 (in-graph, see _lon_onehot)."""
    shape = (latp, latp // ph, ph)
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    h = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    y = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    return (r == h * ph + y).astype(dtype)


def _use_onehot(dtype) -> bool:
    # the one-hot matmuls only pay off where relayouts are expensive and
    # bf16 keeps them cheap; the fp32/parity path keeps the exact reshape form
    return dtype == jnp.bfloat16


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
        cdt = self.compute_dtype
        c = cfg.dims[0]

        from pangu_tpu.model.attention import DenseParams

        wk_s, b_s = DenseParams(cfg.embed_surface_channels, c,
                                param_dtype=self.param_dtype,
                                name="proj_surface")()
        wk_u, b_u = DenseParams(cfg.embed_upper_channels, c,
                                param_dtype=self.param_dtype,
                                name="proj_upper")()

        # ---- surface: (B, Vs, lat, lon) ----
        # normalize in fp32, then drop to compute dtype before the layout
        # chain so pads/reshapes move half the bytes on TPU
        surface = (surface - aux.surface_mean) / aux.surface_std
        surface = surface.astype(cdt)
        surface = jnp.pad(surface, ((0, 0), (0, 0), (0, g.lat_pad), (0, 0)))
        masks = jnp.broadcast_to(
            aux.surface_mask[None], (b,) + aux.surface_mask.shape
        ).astype(surface.dtype)
        surface = jnp.concatenate([surface, masks], axis=1)  # (B, 7, latp, lon)
        cs = surface.shape[1]

        # ---- upper: (B, Vu, L, lat, lon) ----
        upper = (upper - aux.upper_mean) / aux.upper_std
        upper = upper.astype(cdt)
        const_h = jnp.broadcast_to(
            aux.const_h[None], (b,) + aux.const_h.shape
        ).astype(upper.dtype)
        upper = jnp.concatenate([upper, const_h], axis=1)  # (B, 6, L, lat, lon)
        upper = jnp.pad(
            upper, ((0, 0), (0, 0), (0, g.level_pad), (0, g.lat_pad), (0, 0))
        )
        cu = upper.shape[1]

        if _use_onehot(cdt):
            S = _lon_onehot(cfg.lon, pw, cdt)
            R = _lat_onehot(cfg.lat + g.lat_pad, ph, cdt)

            sfc1 = jnp.einsum("bvrl,ldw->bvrdw", surface, S)
            sfc2 = jnp.einsum("bvrdw,rhy->bvhydw", sfc1, R)
            wk_s4 = wk_s.astype(cdt).reshape(cs, ph, pw, c)
            surface_tok = (
                jnp.einsum("bvhydw,vydc->bhwc", sfc2, wk_s4,
                           preferred_element_type=jnp.float32)
                + b_s.astype(jnp.float32)
            ).astype(cdt)

            up1 = jnp.einsum("bvzrl,ldw->bvzrdw", upper, S)
            up2 = jnp.einsum("bvzrdw,rhy->bvzhydw", up1, R)
            up2 = up2.reshape(b, cu, g.z_upper, pz, g.h, ph, pw, g.w)
            wk_u6 = wk_u.astype(cdt).reshape(cu, pz, ph, pw, c)
            upper_tok = (
                jnp.einsum("bvuphydw,vpydc->buhwc", up2, wk_u6,
                           preferred_element_type=jnp.float32)
                + b_u.astype(jnp.float32)
            ).astype(cdt)
        else:
            surface = surface.reshape(b, cs, g.h, ph, g.w, pw)
            surface = surface.transpose(0, 2, 4, 1, 3, 5).reshape(
                b, g.h, g.w, cs * ph * pw
            )
            surface_tok = (
                jnp.einsum("...f,fc->...c", surface, wk_s.astype(cdt),
                           precision=self.precision,
                           preferred_element_type=jnp.float32)
                + b_s.astype(jnp.float32)
            ).astype(cdt)

            upper = upper.reshape(b, cu, g.z_upper, pz, g.h, ph, g.w, pw)
            upper = upper.transpose(0, 2, 4, 6, 1, 3, 5, 7)
            upper = upper.reshape(b, g.z_upper, g.h, g.w, cu * pz * ph * pw)
            upper_tok = (
                jnp.einsum("...f,fc->...c", upper, wk_u.astype(cdt),
                           precision=self.precision,
                           preferred_element_type=jnp.float32)
                + b_u.astype(jnp.float32)
            ).astype(cdt)

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
        cdt = self.compute_dtype
        cin = x.shape[-1]

        from pangu_tpu.model.attention import DenseParams

        wk_u, b_u = DenseParams(cin, cfg.recovery_upper_channels,
                                param_dtype=self.param_dtype,
                                name="head_upper")()
        wk_s, b_s = DenseParams(cin, cfg.recovery_surface_channels,
                                param_dtype=self.param_dtype,
                                name="head_surface")()

        if _use_onehot(cdt):
            S = _lon_onehot(cfg.lon, pw, cdt)
            R = _lat_onehot(cfg.lat + g.lat_pad, ph, cdt)

            # upper: project with output dims (v, dz, dy, dx) kept separate,
            # longitude staying in lanes, then scatter lat/lon via one-hots
            wk_u6 = wk_u.astype(cdt).reshape(cin, vu, pz, ph, pw)
            b_u6 = b_u.astype(jnp.float32).reshape(vu, pz, ph, pw)
            p = jnp.einsum("buhwc,cvpyd->buvphydw", x[:, 1:].astype(cdt), wk_u6,
                           preferred_element_type=jnp.float32)
            p = (p + b_u6[None, None, :, :, None, :, :, None]).astype(cdt)
            p = jnp.einsum("buvphydw,rhy->buvprdw", p, R)
            p = jnp.einsum("buvprdw,ldw->buvprl", p, S)
            up = p.transpose(0, 2, 1, 3, 4, 5).reshape(
                b, vu, g.z_upper * pz, g.h * ph, cfg.lon
            )
            up = up[:, :, : cfg.levels, : cfg.lat, :]

            wk_s4 = wk_s.astype(cdt).reshape(cin, vs, ph, pw)
            b_s4 = b_s.astype(jnp.float32).reshape(vs, ph, pw)
            q = jnp.einsum("bhwc,cvyd->bvhydw", x[:, 0].astype(cdt), wk_s4,
                           preferred_element_type=jnp.float32)
            q = (q + b_s4[None, :, None, :, :, None]).astype(cdt)
            q = jnp.einsum("bvhydw,rhy->bvrdw", q, R)
            q = jnp.einsum("bvrdw,ldw->bvrl", q, S)
            sf = q[:, :, : cfg.lat, :]
        else:
            up = (
                jnp.einsum("...c,cf->...f", x[:, 1:].astype(cdt),
                           wk_u.astype(cdt), precision=self.precision,
                           preferred_element_type=jnp.float32)
                + b_u.astype(jnp.float32)
            ).astype(cdt)
            up = up.reshape(b, g.z_upper, g.h, g.w, vu, pz, ph, pw)
            # -> (B, var, Zu, dz, H, dy, W, dx)
            up = up.transpose(0, 4, 1, 5, 2, 6, 3, 7)
            up = up.reshape(b, vu, g.z_upper * pz, g.h * ph, g.w * pw)
            up = up[:, :, : cfg.levels, : cfg.lat, :]

            sf = (
                jnp.einsum("...c,cf->...f", x[:, 0].astype(cdt),
                           wk_s.astype(cdt), precision=self.precision,
                           preferred_element_type=jnp.float32)
                + b_s.astype(jnp.float32)
            ).astype(cdt)
            sf = sf.reshape(b, g.h, g.w, vs, ph, pw)
            sf = sf.transpose(0, 3, 1, 4, 2, 5)  # (B, var, H, dy, W, dx)
            sf = sf.reshape(b, vs, g.h * ph, g.w * pw)
            sf = sf[:, :, : cfg.lat, :]

        return up.astype(jnp.float32), sf.astype(jnp.float32)
