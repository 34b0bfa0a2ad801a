"""Transformer blocks and resolution changers for the Earth-Specific backbone.

Semantics match the reference blocks (models/layers.py:123-299,487-567) —
including the post-norm residual order ``x = shortcut + drop_path(norm(attn))``
(models/layers.py:296-297) and all asymmetric lat pad/crop rules — but operate
on the (B, Z, H, W, C) grid with geometry from ``pangu_tpu.geometry``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pangu_tpu.geometry import StageGeometry
from pangu_tpu.model.attention import (
    EarthAttention3D,
    shift_attention_mask,
    window_partition,
    window_reverse,
)

_TRUNC = nn.initializers.truncated_normal(stddev=0.02)


class Mlp(nn.Module):
    """Linear(4x) -> GELU(exact) -> Linear (reference models/layers.py:302-317;
    torch nn.GELU is the erf form, hence approximate=False)."""

    dim: int
    ratio: int = 4
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.dim * self.ratio, dtype=self.compute_dtype,
                     param_dtype=self.param_dtype, precision=self.precision,
                     kernel_init=_TRUNC, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.compute_dtype,
                     param_dtype=self.param_dtype, precision=self.precision,
                     kernel_init=_TRUNC, name="fc2")(x)
        return x


class DropPath(nn.Module):
    """Per-sample stochastic depth (role of timm DropPath in
    reference models/layers.py:171-172)."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape=shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class EarthSpecificBlock(nn.Module):
    """One (optionally shifted) 3D window-attention block
    (reference models/layers.py:158-299)."""

    stage: StageGeometry
    dim: int
    heads: int
    drop_path_rate: float
    shifted: bool
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        st = self.stage
        wz, wh, ww = st.window
        b, z, h, w, c = x.shape
        assert (z, h, w) == (st.z, st.h, st.w), (x.shape, st)

        shortcut = x
        # Trailing-only lat pad to the window grid (reference pads (0, 5) at
        # 181->186 and 91->96, models/layers.py:178,228-229).
        x = jnp.pad(x, ((0, 0), (0, 0), (0, st.h_pad - h), (0, 0), (0, 0)))

        mask = None
        if self.shifted:
            x = jnp.roll(x, shift=(-(wz // 2), -(wh // 2), -(ww // 2)), axis=(1, 2, 3))
            mask = jnp.asarray(shift_attention_mask(st))

        xw = window_partition(x, st.window)
        xw = EarthAttention3D(
            dim=self.dim,
            heads=self.heads,
            n_type_windows=st.n_type_windows,
            tokens_per_window=st.tokens_per_window,
            compute_dtype=self.compute_dtype,
            param_dtype=self.param_dtype,
            use_pallas=self.use_pallas,
            precision=self.precision,
            name="attn",
        )(xw, mask)
        x = window_reverse(xw, st.window, st.z, st.h_pad, st.w)

        if self.shifted:
            x = jnp.roll(x, shift=(wz // 2, wh // 2, ww // 2), axis=(1, 2, 3))
        x = x[:, :, :h]  # crop the lat pad (reference models/layers.py:287-288)

        # Post-norm residuals (reference models/layers.py:296-297).
        drop = DropPath(self.drop_path_rate, name="drop_path")
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.compute_dtype,
                             param_dtype=self.param_dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.compute_dtype,
                             param_dtype=self.param_dtype, name="norm2")
        mlp = Mlp(self.dim, compute_dtype=self.compute_dtype,
                  param_dtype=self.param_dtype, precision=self.precision,
                  name="mlp")

        x = shortcut + drop(norm1(x), deterministic)
        x = x + drop(norm2(mlp(x)), deterministic)
        return x


class EarthSpecificLayer(nn.Module):
    """A stack of blocks alternating unshifted/shifted windows
    (reference models/layers.py:123-155). Blocks are rematerialized when
    ``remat`` (role of torch.utils.checkpoint, models/layers.py:143-149)."""

    stage: StageGeometry
    depth: int
    dim: int
    heads: int
    drop_path_rates: Tuple[float, ...]
    remat: bool = False
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        block_cls = EarthSpecificBlock
        if self.remat:
            block_cls = nn.remat(EarthSpecificBlock, static_argnums=(2,))
        for i in range(self.depth):
            x = block_cls(
                stage=self.stage,
                dim=self.dim,
                heads=self.heads,
                drop_path_rate=self.drop_path_rates[i],
                shifted=bool(i % 2),
                compute_dtype=self.compute_dtype,
                param_dtype=self.param_dtype,
                use_pallas=self.use_pallas,
                precision=self.precision,
                name=f"block{i}",
            )(x, deterministic)
        return x


class DownSample(nn.Module):
    """2x2 lat/lon space-to-depth + LayerNorm + Linear(4C->2C, no bias)
    (reference models/layers.py:487-524). Feature order after the merge is
    (lat-offset, lon-offset, C) to stay import-compatible."""

    dim: int
    h_pad: int  # trailing lat pad to make H even (181 -> 182)
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, z, h, w, c = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, self.h_pad), (0, 0), (0, 0)))
        hp = h + self.h_pad
        x = x.reshape(b, z, hp // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6)  # (B, Z, H2, W2, dy, dx, C)
        x = x.reshape(b, z, hp // 2, w // 2, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.compute_dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        x = nn.Dense(2 * self.dim, use_bias=False, dtype=self.compute_dtype,
                     param_dtype=self.param_dtype, precision=self.precision,
                     kernel_init=_TRUNC, name="reduction")(x)
        return x


class UpSample(nn.Module):
    """Linear(C_in->4*C_out, no bias) + 2x2 depth-to-space + crop + LayerNorm
    + mixing Linear (reference models/layers.py:527-567)."""

    in_dim: int
    out_dim: int
    h_out: int  # crop target (182 -> 181)
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, z, h2, w2, _ = x.shape
        x = nn.Dense(4 * self.out_dim, use_bias=False, dtype=self.compute_dtype,
                     param_dtype=self.param_dtype, precision=self.precision,
                     kernel_init=_TRUNC, name="expand")(x)
        x = x.reshape(b, z, h2, w2, 2, 2, self.out_dim)  # (..., dy, dx, C)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6)  # (B, Z, H2, dy, W2, dx, C)
        x = x.reshape(b, z, 2 * h2, 2 * w2, self.out_dim)
        x = x[:, :, : self.h_out]
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.compute_dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        x = nn.Dense(self.out_dim, use_bias=False, dtype=self.compute_dtype,
                     param_dtype=self.param_dtype, precision=self.precision,
                     kernel_init=_TRUNC, name="mix")(x)
        return x
