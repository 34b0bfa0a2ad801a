"""3D windowed attention with Earth-Specific bias.

Re-designed for TPU from the reference's EarthAttention3D + window plumbing
(reference models/layers.py:218-299,320-484):

  * Activations keep the (B, Z, H, W, C) grid; window partition is a
    reshape/transpose pair that XLA fuses — no flattened (B, L, C) round trips.
  * The shifted-window mask is a *static* numpy constant derived from the
    stage geometry (the reference rebuilds it with torch ops every forward,
    models/layers.py:187-216).
  * Attention logits/softmax run in fp32 regardless of compute dtype; the
    matmuls feed the MXU in the compute dtype.
  * An optional fused Pallas kernel (pangu_tpu.ops) replaces the XLA path on
    TPU, never materializing the (heads, 144, 144) score tensor in HBM.

Window layout: a stage grid (Z, Hp, W) with window (wz, wh, ww) partitions
into ``n_lon = W/ww`` longitude windows and ``n_type = (Z/wz)*(Hp/wh)``
window *types*; each type has its own full (T, T) bias per head, T = wz*wh*ww
(reference models/layers.py:357-363 — the pretrained ONNX stores this dense
bias, not the paper's index-constructed one).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pangu_tpu.geometry import StageGeometry


def window_partition(x: jnp.ndarray, window: Tuple[int, int, int]) -> jnp.ndarray:
    """(B, Z, Hp, W, C) -> (B, n_lon, n_type, T, C).

    Token order inside a window is (z, h, w)-major, and the type axis
    enumerates (z-window, h-window) pairs — both matching the reference's
    permute/reshape chain (models/layers.py:253-262) so biases are
    import-compatible.
    """
    wz, wh, ww = window
    b, z, h, w, c = x.shape
    x = x.reshape(b, z // wz, wz, h // wh, wh, w // ww, ww, c)
    # -> (B, Wn, Zn, Hn, wz, wh, ww, C)
    x = x.transpose(0, 5, 1, 3, 2, 4, 6, 7)
    return x.reshape(b, w // ww, (z // wz) * (h // wh), wz * wh * ww, c)


def window_reverse(
    x: jnp.ndarray, window: Tuple[int, int, int], z: int, h: int, w: int
) -> jnp.ndarray:
    """Inverse of :func:`window_partition`: -> (B, Z, Hp, W, C)."""
    wz, wh, ww = window
    b = x.shape[0]
    c = x.shape[-1]
    x = x.reshape(b, w // ww, z // wz, h // wh, wz, wh, ww, c)
    x = x.transpose(0, 2, 4, 3, 5, 1, 6, 7)
    return x.reshape(b, z, h, w, c)


@functools.lru_cache(maxsize=None)
def shift_attention_mask(stage: StageGeometry) -> np.ndarray:
    """Static additive mask (n_type, T, T) for the shifted-window pass.

    Reproduces the reference's region labelling exactly
    (models/layers.py:187-216), including its non-Swin-standard middle
    latitude slice ``[wh, Hp-wh/2)`` (the standard scheme uses
    ``[Hp-wh, Hp-wh/2)``) — the pretrained weights were validated against
    this behavior. Longitude needs no mask: the roll is circular and
    physically correct on a sphere.
    """
    wz, wh, ww = stage.window
    z, hp = stage.z, stage.h_pad

    label = np.zeros((z, hp), np.int32)
    cnt = 0
    z_slices = (slice(0, -wz), slice(-wz, -wz // 2), slice(-wz // 2, None))
    h_slices = (slice(0, -wh), slice(wh, -wh // 2), slice(-wh // 2, None))
    for zs in z_slices:
        for hs in h_slices:
            label[zs, hs] = cnt
            cnt += 1

    # (Zn, wz, Hn, wh) -> type-major token labels (n_type, wz, wh)
    lab = label.reshape(z // wz, wz, hp // wh, wh)
    lab = lab.transpose(0, 2, 1, 3).reshape(stage.n_type_windows, wz, wh)
    # broadcast over the ww tokens (mask has no longitude dependence)
    lab = np.broadcast_to(lab[..., None], (stage.n_type_windows, wz, wh, ww))
    lab = lab.reshape(stage.n_type_windows, stage.tokens_per_window)

    diff = lab[:, :, None] - lab[:, None, :]
    return np.where(diff != 0, np.float32(-100.0), np.float32(0.0))


class EarthAttention3D(nn.Module):
    """Multi-head window attention with per-window-type dense bias."""

    dim: int
    heads: int
    n_type_windows: int
    tokens_per_window: int
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    # fp32 inputs need HIGHEST or XLA lowers matmuls to bf16 passes on TPU
    # (and on CPU); irrelevant when compute_dtype is bfloat16.
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        """x: (B, n_lon, n_type, T, C); mask: (n_type, T, T) or None."""
        b, n_lon, n_type, t, c = x.shape
        head_dim = self.dim // self.heads
        scale = head_dim**-0.5

        qkv = nn.Dense(
            3 * self.dim,
            dtype=self.compute_dtype,
            param_dtype=self.param_dtype,
            precision=self.precision,
            kernel_init=nn.initializers.truncated_normal(stddev=0.02),
            name="qkv",
        )(x)
        qkv = qkv.reshape(b, n_lon, n_type, t, 3, self.heads, head_dim)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]

        bias = self.param(
            "earth_bias",
            nn.initializers.truncated_normal(stddev=0.02),
            (self.n_type_windows, self.heads, self.tokens_per_window, self.tokens_per_window),
            self.param_dtype,
        )

        if self.use_pallas:
            from pangu_tpu.ops.window_attention import window_attention

            out = window_attention(q, k, v, bias, mask, scale)
        else:
            # (B, nW, nT, T, h, d) x (B, nW, nT, T, h, d) -> (B, nW, nT, h, T, T)
            attn = jnp.einsum(
                "bwnqhd,bwnkhd->bwnhqk", q * scale, k,
                precision=self.precision, preferred_element_type=jnp.float32,
            )
            attn = attn + bias[None, None].astype(jnp.float32)
            if mask is not None:
                attn = attn + mask[None, None, :, None].astype(jnp.float32)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.compute_dtype)
            out = jnp.einsum(
                "bwnhqk,bwnkhd->bwnqhd", attn, v,
                precision=self.precision, preferred_element_type=jnp.float32,
            ).astype(self.compute_dtype)

        out = out.reshape(b, n_lon, n_type, t, self.dim)
        out = nn.Dense(
            self.dim,
            dtype=self.compute_dtype,
            param_dtype=self.param_dtype,
            precision=self.precision,
            kernel_init=nn.initializers.truncated_normal(stddev=0.02),
            name="proj",
        )(out)
        return out
