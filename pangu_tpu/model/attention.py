"""3D windowed attention with Earth-Specific bias.

Re-designed for TPU from the reference's EarthAttention3D + window plumbing
(reference models/layers.py:218-299,320-484):

  * The module consumes the *padded token grid* (B, Z, Hp, W, C) directly.
    On TPU the fused Pallas kernel (pangu_tpu.ops.fused_block_attention)
    reads window tiles straight from the grid — the reference's
    partition/reverse permute chains never materialize, and scores never
    touch HBM. Off-TPU, an equivalent XLA einsum path runs.
  * The shifted-window mask is a *static* numpy constant derived from the
    stage geometry (the reference rebuilds it with torch ops every forward,
    models/layers.py:187-216).
  * Attention logits/softmax run in fp32 regardless of compute dtype.

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
from pangu_tpu.ops.windows import window_partition, window_reverse  # noqa: F401 (re-export)

_TRUNC = nn.initializers.truncated_normal(stddev=0.02)


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


def shift_attention_mask_traced(stage: StageGeometry) -> jnp.ndarray:
    """Same mask as :func:`shift_attention_mask`, built IN-GRAPH from iotas.

    As a numpy constant the mask is a 5-10 MB literal inlined once per
    shifted block (XLA does not dedupe them), which alone pushed the
    full-geometry train program past the remote-compile request size limit
    (HTTP 413). The iota form adds a few cheap integer ops instead.
    Equivalence is asserted against the numpy oracle in tests/test_model.py.
    """
    wz, wh, ww = stage.window
    z, hp = stage.z, stage.h_pad
    hn = hp // wh
    nt, t = stage.n_type_windows, stage.tokens_per_window

    ti = jax.lax.broadcasted_iota(jnp.int32, (nt, t), 0)  # window type
    tj = jax.lax.broadcasted_iota(jnp.int32, (nt, t), 1)  # token in window
    dz = tj // (wh * ww)
    dh = (tj // ww) % wh
    zz = (ti // hn) * wz + dz  # absolute z of the token
    hh = (ti % hn) * wh + dh   # absolute (padded) lat of the token

    # region labels replicate the reference's sequential slice-assignment
    # order (models/layers.py:187-216): last-written slice wins, giving
    # z zones [0, Z-wz) / [Z-wz, Z-wz/2) / [Z-wz/2, Z) and the non-Swin
    # lat zones [0, wh) / [wh, Hp-wh/2) / [Hp-wh/2, Hp).
    zzone = (zz >= z - wz).astype(jnp.int32) + (zz >= z - wz // 2)
    hzone = (hh >= wh).astype(jnp.int32) + (hh >= hp - wh // 2)
    lab = 3 * zzone + hzone

    diff = lab[:, :, None] != lab[:, None, :]
    return jnp.where(diff, jnp.float32(-100.0), jnp.float32(0.0))


class DenseParams(nn.Module):
    """Declares Dense-layout params without binding them to an application
    site, so the fused kernel and the XLA path share one param tree."""

    in_features: int
    features: int
    use_bias: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", _TRUNC, (self.in_features, self.features), self.param_dtype
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       self.param_dtype)
            if self.use_bias
            else None
        )
        return kernel, bias


def lora_tap(mod: nn.Module, name: str, x: jnp.ndarray,
             deterministic: bool) -> Optional[jnp.ndarray]:
    """Unmerged LoRA adapter contribution for the Dense site ``name``.

    Mirrors peft's per-linear formulation (reference
    finetune/lora_tune.py:174-180): ``y += scaling * dropout(x) @ A @ B``
    where the adapter branch sees the SAME per-token input as the wrapped
    linear and inverted dropout is applied to that branch only during
    training. Adapters arrive as an optional ``"lora"`` flax variable
    collection (built by train.lora.lora_collection); absent in normal runs,
    in which case this returns None and the site is untouched. The rank-r
    matmuls run in f32 — they are tiny next to the main dot.
    """
    if not mod.has_variable("lora", name):
        return None
    ab = mod.get_variable("lora", name)
    xd = x.astype(jnp.float32)
    if not deterministic:
        keep = 1.0 - ab["rate"]
        mask = jax.random.bernoulli(mod.make_rng("lora"), keep, x.shape)
        xd = jnp.where(mask, xd / keep, 0.0)
    return jnp.einsum("...r,rf->...f",
                      jnp.einsum("...c,cr->...r", xd, ab["a"]),
                      ab["b_scaled"])


class EarthAttention3D(nn.Module):
    """Multi-head window attention with per-window-type dense bias.

    Input/output: the padded token grid (B, Z, Hp, W, C).
    """

    dim: int
    heads: int
    n_type_windows: int
    tokens_per_window: int
    window: Tuple[int, int, int] = (2, 6, 12)
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    # attention-probability + output-projection dropout (reference
    # models/layers.py:333,469,482; rate 0 in all published configs)
    dropout_rate: float = 0.0
    # fp32 inputs need HIGHEST or XLA lowers matmuls to bf16 passes on TPU
    # (and on CPU); irrelevant when compute_dtype is bfloat16.
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray],
        epilogue: Optional[tuple] = None,
        collect_only: bool = False,
        deterministic: bool = True,
    ):
        """epilogue: optional (ln_scale, ln_bias) — fuse the block's
        ``x + LayerNorm(attn(x))`` post-norm residual into the kernel.
        collect_only: declare and return the raw params (for a caller-side
        fused kernel) without computing."""
        head_dim = self.dim // self.heads
        scale = head_dim**-0.5
        cdt = self.compute_dtype

        wqkv, bqkv = DenseParams(self.dim, 3 * self.dim,
                                 param_dtype=self.param_dtype, name="qkv")()
        wproj, bproj = DenseParams(self.dim, self.dim,
                                   param_dtype=self.param_dtype, name="proj")()
        bias = self.param(
            "earth_bias", _TRUNC,
            (self.n_type_windows, self.heads, self.tokens_per_window,
             self.tokens_per_window),
            self.param_dtype,
        )
        if collect_only:
            # the last element tells caller-side fused kernels whether
            # unmerged LoRA adapters ride this module (they modify q/k/v
            # inside the dot, which a collected-weights kernel cannot model)
            lora = (self.has_variable("lora", "qkv")
                    or self.has_variable("lora", "proj"))
            return wqkv, bqkv, wproj, bproj, bias, lora
        b, z, hp, w, c = x.shape

        # An ACTIVE dropout (rate > 0, training) needs per-probability rng
        # the fused kernel does not model — route to the XLA path then.
        # Unmerged LoRA adapters (train.lora, a "lora" variable collection)
        # likewise modify q/k/v inside the kernel, so they take the XLA path.
        drop_active = self.dropout_rate > 0.0 and not deterministic
        lora_active = (self.has_variable("lora", "qkv")
                       or self.has_variable("lora", "proj"))
        if (self.use_pallas and jax.default_backend() == "tpu"
                and not drop_active and not lora_active):
            from pangu_tpu.ops.fused_block_attention import fused_block_attention

            ln_s = ln_b = None
            if epilogue is not None:
                ln_s = epilogue[0].astype(jnp.float32)
                ln_b = epilogue[1].astype(jnp.float32)
            return fused_block_attention(
                x.astype(cdt),
                wqkv.astype(cdt), bqkv.astype(cdt),
                wproj.astype(cdt), bproj.astype(cdt),
                bias.astype(jnp.float32),
                None if mask is None else mask.astype(jnp.float32),
                ln_s, ln_b,
                self.window, self.heads, scale,
            )
        assert epilogue is None, "fused epilogue requires the Pallas TPU path"

        # ---- XLA path ----
        xw = window_partition(x.astype(cdt), self.window)  # (B, nW, nT, T, C)
        t = xw.shape[3]
        qkv = (
            jnp.einsum("...c,cf->...f", xw, wqkv.astype(cdt),
                       precision=self.precision,
                       preferred_element_type=jnp.float32)
            + bqkv.astype(jnp.float32)
        ).astype(cdt)
        d = lora_tap(self, "qkv", xw, deterministic)
        if d is not None:
            qkv = qkv + d.astype(cdt)
        qkv = qkv.reshape(qkv.shape[:4] + (3, self.heads, head_dim))
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]

        attn = jnp.einsum(
            "bwnqhd,bwnkhd->bwnhqk", q * scale, k,
            precision=self.precision, preferred_element_type=jnp.float32,
        )
        attn = attn + bias[None, None].astype(jnp.float32)
        if mask is not None:
            attn = attn + mask[None, None, :, None].astype(jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(cdt)
        # reference models/layers.py:469 — dropout on attention probabilities
        attn = nn.Dropout(self.dropout_rate, name="attn_drop")(
            attn, deterministic=deterministic)
        out = jnp.einsum(
            "bwnhqk,bwnkhd->bwnqhd", attn, v,
            precision=self.precision, preferred_element_type=jnp.float32,
        ).astype(cdt)

        pin = out.reshape(out.shape[:3] + (t, self.dim))
        out = (
            jnp.einsum("...c,cf->...f", pin, wproj.astype(cdt),
                       precision=self.precision,
                       preferred_element_type=jnp.float32)
            + bproj.astype(jnp.float32)
        ).astype(cdt)
        d = lora_tap(self, "proj", pin, deterministic)
        if d is not None:
            out = out + d.astype(cdt)
        # reference models/layers.py:482 — dropout on the projected output
        out = nn.Dropout(self.dropout_rate, name="proj_drop")(
            out, deterministic=deterministic)
        return window_reverse(out, self.window, z, hp, w)
