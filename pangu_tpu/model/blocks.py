"""Transformer blocks and resolution changers for the Earth-Specific backbone.

Semantics match the reference blocks (models/layers.py:123-299,487-567) —
including the post-norm residual order ``x = shortcut + drop_path(norm(attn))``
(models/layers.py:296-297) and all asymmetric lat pad/crop rules — but operate
on the (B, Z, H, W, C) grid with geometry from ``pangu_tpu.geometry``.

On TPU the whole block runs as ONE fused Pallas megakernel each way:
inference uses ops/fused_block_attention.py::fused_earth_block; bf16
training uses ops/fused_block_train.py::fused_earth_block_train, whose
flash-style custom backward recomputes the block per window-slab in VMEM —
stochastic depth rides in-kernel as a per-sample branch scale. When the
megakernels cannot model the run (active dropout, unmerged LoRA, non-TPU,
f32) the block falls back to the unfused composition: the attention kernel,
the attention-side residual epilogue
(ops/fused_epilogue.py::fused_residual_postnorm) and the whole MLP tail
(ops/fused_mlp.py::fused_mlp_postnorm), or the equivalent XLA formulation
off-TPU.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pangu_tpu.geometry import StageGeometry
from pangu_tpu.model.attention import (
    DenseParams,
    EarthAttention3D,
    lora_tap,
    shift_attention_mask_traced,
)
from pangu_tpu.parallel.mesh import TOKEN_SPEC, maybe_shard

_TRUNC = nn.initializers.truncated_normal(stddev=0.02)
_LN_EPS = 1e-5


class LayerNormParams(nn.Module):
    """Declares LayerNorm scale/bias without binding the application site,
    so fused kernels and the XLA path share one param tree."""

    dim: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,),
                          self.param_dtype)
        return scale, bias


def apply_layer_norm(x: jnp.ndarray, scale, bias) -> jnp.ndarray:
    """fp32-statistics LayerNorm (torch semantics, eps 1e-5)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(var + _LN_EPS)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


class Mlp(nn.Module):
    """Linear(4x) -> GELU(exact) -> Linear (reference models/layers.py:302-317;
    torch nn.GELU is the erf form, hence approximate=False).

    ``__call__(x)`` returns the raw MLP output (XLA path); with ``fused=True``
    it runs the full ``x + LN(mlp(x))`` block tail as one Pallas kernel."""

    dim: int
    ratio: int = 4
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    # post-GELU and post-fc2 dropout (reference models/layers.py:309,314,316;
    # rate 0 in all published configs)
    dropout_rate: float = 0.0
    use_pallas: bool = False
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST

    @nn.compact
    def __call__(self, x: jnp.ndarray, ln: Optional[Tuple] = None,
                 fused: bool = False, collect_only: bool = False,
                 deterministic: bool = True,
                 postnorm_scale: Optional[jnp.ndarray] = None):
        cdt = self.compute_dtype
        w1, b1 = DenseParams(self.dim, self.dim * self.ratio,
                             param_dtype=self.param_dtype, name="fc1")()
        w2, b2 = DenseParams(self.dim * self.ratio, self.dim,
                             param_dtype=self.param_dtype, name="fc2")()
        if collect_only:
            # hand the raw weights to a caller-side fused kernel (the block
            # megakernel) without changing the param tree layout; the last
            # element flags unmerged LoRA adapters the kernel cannot model
            lora = (self.has_variable("lora", "fc1")
                    or self.has_variable("lora", "fc2"))
            return w1, b1, w2, b2, lora
        drop_active = self.dropout_rate > 0.0 and not deterministic
        # Unmerged LoRA adapters modify the hidden before GELU — the fused
        # kernels cannot model that, so their presence routes to the XLA path
        # (same switch as active dropout).
        lora_active = (self.has_variable("lora", "fc1")
                       or self.has_variable("lora", "fc2"))
        if fused and not drop_active and not lora_active:
            from pangu_tpu.ops.fused_mlp import fused_mlp_block

            return fused_mlp_block(
                x.astype(cdt), w1.astype(cdt), b1.astype(cdt),
                w2.astype(cdt), b2.astype(cdt),
                ln[0].astype(jnp.float32), ln[1].astype(jnp.float32),
            )
        assert not fused, \
            "fused MLP tail has no dropout / unmerged-LoRA path; route " \
            "such runs through the unfused formulation"
        if postnorm_scale is not None and self.use_pallas \
                and not drop_active and not lora_active \
                and jax.default_backend() == "tpu" \
                and jnp.dtype(cdt) == jnp.bfloat16:
            # TRAINING block tail — x + s*LN(mlp(x)) as ONE flash-style
            # custom_vjp Pallas program each way (the stochastic-depth scale
            # rides in-kernel); removes the LN/droppath/residual HBM round
            # trips of the unfused epilogue (docs/PERFORMANCE.md round 3)
            from pangu_tpu.ops import fused_mlp as fm

            if fm._POSTNORM_FUSION:
                return fm.fused_mlp_postnorm(
                    x.astype(cdt), w1.astype(cdt), b1.astype(cdt),
                    w2.astype(cdt), b2.astype(cdt),
                    ln[0].astype(jnp.float32), ln[1].astype(jnp.float32),
                    postnorm_scale)
        if self.use_pallas and not drop_active and not lora_active \
                and jax.default_backend() == "tpu" \
                and jnp.dtype(cdt) == jnp.bfloat16:
            # flash-style custom_vjp: hidden recomputed in VMEM, never in HBM
            # (the MLP backward dominated the train step's XLA bucket)
            from pangu_tpu.ops.fused_mlp import fused_mlp

            y = fused_mlp(x.astype(cdt), w1.astype(cdt), b1.astype(cdt),
                          w2.astype(cdt), b2.astype(cdt))
            return self._finish(x, y, ln, postnorm_scale, deterministic)
        h = (jnp.einsum("...c,cf->...f", x.astype(cdt), w1.astype(cdt),
                        precision=self.precision,
                        preferred_element_type=jnp.float32)
             + b1.astype(jnp.float32)).astype(cdt)
        d = lora_tap(self, "fc1", x.astype(cdt), deterministic)
        if d is not None:
            h = h + d.astype(cdt)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout_rate, name="drop1")(
            h, deterministic=deterministic)
        y = (jnp.einsum("...f,fc->...c", h, w2.astype(cdt),
                        precision=self.precision,
                        preferred_element_type=jnp.float32)
             + b2.astype(jnp.float32)).astype(cdt)
        d = lora_tap(self, "fc2", h, deterministic)
        if d is not None:
            y = y + d.astype(cdt)
        y = nn.Dropout(self.dropout_rate, name="drop2")(
            y, deterministic=deterministic)
        return self._finish(x, y, ln, postnorm_scale, deterministic)

    @nn.nowrap
    def _finish(self, x, y, ln, postnorm_scale, deterministic):
        """Raw output, or the unfused block tail when the caller asked for
        tail mode (postnorm_scale given) but the Pallas path doesn't apply."""
        if postnorm_scale is None:
            return y
        if not deterministic:
            # names the MLP output for the save_only_these_names remat policy
            # (cfg.remat_save_mlp); training-only so inference programs stay
            # byte-identical for the persistent compile cache
            from jax.ad_checkpoint import checkpoint_name

            y = checkpoint_name(y, "mlp_out")
        branch = postnorm_scale * apply_layer_norm(y, *ln).astype(jnp.float32)
        return (x.astype(jnp.float32) + branch).astype(x.dtype)


class EarthSpecificBlock(nn.Module):
    """One (optionally shifted) 3D window-attention block
    (reference models/layers.py:158-299).

    Operates on the *window-padded* grid (B, Z, Hp, W, C): the enclosing
    EarthSpecificLayer pads latitude once for the whole stack and crops at
    the end (the reference pads/crops per block, models/layers.py:178,287).
    Pad rows are re-zeroed at block entry, which is exactly equivalent to
    the reference's crop-then-re-pad-with-zeros between blocks — and keeps
    the lat extent mesh-divisible (186/96/18/12) so spatial sharding of the
    residual stream survives the whole stage."""

    stage: StageGeometry
    dim: int
    heads: int
    drop_path_rate: float
    shifted: bool
    mlp_ratio: int = 4
    dropout_rate: float = 0.0
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        st = self.stage
        wz, wh, ww = st.window
        b, z, hp, w, c = x.shape
        assert (z, hp, w) == (st.z, st.h_pad, st.w), (x.shape, st)

        ln1 = LayerNormParams(self.dim, self.param_dtype, name="norm1")()
        ln2 = LayerNormParams(self.dim, self.param_dtype, name="norm2")()
        mlp = Mlp(self.dim, ratio=self.mlp_ratio,
                  compute_dtype=self.compute_dtype,
                  param_dtype=self.param_dtype,
                  dropout_rate=self.dropout_rate,
                  use_pallas=self.use_pallas, precision=self.precision,
                  name="mlp")

        # Fused LN/residual epilogues are inference-only (stochastic depth
        # needs the unfused form); the attention kernel itself runs in
        # training too — its custom_vjp is a flash-style Pallas backward
        # that recomputes scores per window (ops/fused_block_attention.py).
        fused = (
            self.use_pallas
            and deterministic
            and jax.default_backend() == "tpu"
        )

        # Keep the padded residual stream spatially sharded block-to-block.
        x = maybe_shard(x, TOKEN_SPEC, tag=f"block:{self.name}")
        if st.h_pad != st.h:
            # Re-zero the pad rows (== the reference's crop + re-pad between
            # blocks): they feed the last lat window's attention, so stale
            # values from the previous block's residual must not leak in.
            row = jax.lax.broadcasted_iota(jnp.int32, (1, 1, st.h_pad, 1, 1), 2)
            x = jnp.where(row < st.h, x, jnp.zeros((), x.dtype))
        shortcut = x

        mask = None
        if self.shifted:
            x = jnp.roll(x, shift=(-(wz // 2), -(wh // 2), -(ww // 2)), axis=(1, 2, 3))
            mask = shift_attention_mask_traced(st)

        attn = EarthAttention3D(
            dim=self.dim,
            heads=self.heads,
            n_type_windows=st.n_type_windows,
            tokens_per_window=st.tokens_per_window,
            window=st.window,
            compute_dtype=self.compute_dtype,
            param_dtype=self.param_dtype,
            use_pallas=self.use_pallas,
            dropout_rate=self.dropout_rate,
            precision=self.precision,
            name="attn",
        )

        # Training-path whole-block fusion: same megakernel shape but with a
        # flash BACKWARD (ops/fused_block_train.py) — the attention kernel,
        # both post-norm residual epilogues and the MLP run as ONE Pallas
        # program each way, with the stochastic-depth scales applied
        # in-kernel. Saves only the block inputs, so nn.remat around the
        # block has nothing left to recompute.
        train_fused = (
            self.use_pallas
            and not deterministic
            and jax.default_backend() == "tpu"
            and jnp.dtype(self.compute_dtype) == jnp.bfloat16
            and self.dropout_rate == 0.0
        )

        def dp_scale():
            if self.drop_path_rate <= 0.0:
                return jnp.ones((b, 1, 1, 1, 1), jnp.float32)
            keep = 1.0 - self.drop_path_rate
            m = jax.random.bernoulli(self.make_rng("droppath"), keep,
                                     (b, 1, 1, 1, 1))
            return jnp.where(m, jnp.float32(1.0 / keep), jnp.float32(0.0))

        if fused or train_fused:
            # Whole-block megakernel: attention + both post-norm residuals +
            # MLP in ONE Pallas program (rolls commute with the per-token
            # epilogues — incl. the per-SAMPLE droppath scales; pad rows
            # carry garbage that the next block re-zeroes and the layer
            # finally crops). Unmerged LoRA adapters modify q/k/v and the
            # MLP hidden inside the dots, which a collected-weights kernel
            # cannot model — their presence falls through to the unfused
            # formulation below.
            wqkv, bqkv, wproj, bproj, bias_tbl, attn_lora = attn(
                None, None, collect_only=True)
            w1, b1, w2, b2, mlp_lora = mlp(None, collect_only=True)
            cdt = self.compute_dtype
            if not (attn_lora or mlp_lora):
                common = (
                    x.astype(cdt),
                    wqkv.astype(cdt), bqkv.astype(cdt),
                    wproj.astype(cdt), bproj.astype(cdt),
                    bias_tbl.astype(jnp.float32),
                    None if mask is None else mask.astype(jnp.float32),
                    ln1[0].astype(jnp.float32), ln1[1].astype(jnp.float32),
                    w1.astype(cdt), b1.astype(cdt),
                    w2.astype(cdt), b2.astype(cdt),
                    ln2[0].astype(jnp.float32), ln2[1].astype(jnp.float32),
                )
                statics = (st.window, self.heads,
                           (self.dim // self.heads) ** -0.5)
                if train_fused:
                    from pangu_tpu.ops import fused_block_train as fbt

                    if fbt._TRAIN_FUSION:
                        sc1 = dp_scale().reshape(b, 1)
                        sc2 = dp_scale().reshape(b, 1)
                        x = fbt.fused_earth_block_train(
                            *common, sc1, sc2, *statics)
                        if self.shifted:
                            x = jnp.roll(x, shift=(wz // 2, wh // 2, ww // 2),
                                         axis=(1, 2, 3))
                        return x
                else:
                    from pangu_tpu.ops.fused_block_attention import (
                        fused_earth_block,
                    )

                    x = fused_earth_block(*common, *statics)
                    if self.shifted:
                        x = jnp.roll(x, shift=(wz // 2, wh // 2, ww // 2),
                                     axis=(1, 2, 3))
                    return x

        x = attn(x, mask, deterministic=deterministic)
        if not deterministic:
            # names the attention output for the save_only_these_names remat
            # policy (cfg.remat_save_attention). Training-only: the name
            # primitive changes the jaxpr, and inference programs must stay
            # byte-identical for the persistent compile cache.
            from jax.ad_checkpoint import checkpoint_name

            x = checkpoint_name(x, "attn_out")

        if self.shifted:
            x = jnp.roll(x, shift=(wz // 2, wh // 2, ww // 2), axis=(1, 2, 3))

        # Post-norm residuals (reference models/layers.py:296-297).
        if deterministic:
            # (DropPath is an identity here; reference applies it at rate 0)
            x = shortcut + apply_layer_norm(x, *ln1)
            y = mlp(x, deterministic=True)
            return x + apply_layer_norm(y, *ln2)

        # Training epilogues (unfused fallback — XLA/CPU, active dropout or
        # unmerged LoRA): each post-norm residual runs as ONE op. The
        # per-sample droppath draw becomes a per-row branch scale (mask/keep,
        # ones when inactive): same distribution as DropPath, fresh
        # randomness per residual like timm's per-call DropPath in the
        # reference (models/layers.py:296-297).
        sc1 = dp_scale()
        if self.use_pallas:
            from pangu_tpu.ops.fused_epilogue import fused_residual_postnorm

            x = fused_residual_postnorm(shortcut, x, ln1[0], ln1[1], sc1)
        else:
            branch = sc1 * apply_layer_norm(x, *ln1).astype(jnp.float32)
            x = (shortcut.astype(jnp.float32) + branch).astype(x.dtype)
        # MLP + norm2 + stochastic depth + residual (Mlp._finish keeps the
        # "mlp_out" remat name on the non-Pallas fallback).
        bs = jnp.broadcast_to(dp_scale(), (b, z, hp, w, 1))
        return mlp(x, ln=ln2, deterministic=False, postnorm_scale=bs)


class EarthSpecificLayer(nn.Module):
    """A stack of blocks alternating unshifted/shifted windows
    (reference models/layers.py:123-155). Blocks are rematerialized when
    ``remat`` (role of torch.utils.checkpoint, models/layers.py:143-149)."""

    stage: StageGeometry
    depth: int
    dim: int
    heads: int
    drop_path_rates: Tuple[float, ...]
    mlp_ratio: int = 4
    dropout_rate: float = 0.0
    remat: bool = False
    #: optional jax.checkpoint policy (e.g. save_only_these_names("attn_out"))
    remat_policy: Optional[Any] = None
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        st = self.stage
        b, z, h, w, c = x.shape
        assert (z, h, w) == (st.z, st.h, st.w), (x.shape, st)
        # Window-pad latitude ONCE for the whole stack (the reference re-pads
        # per block, models/layers.py:178,228). The padded extent (186/96 at
        # flagship, 18/12 at tiny) is divisible by 2 and 3, so the 'lat' mesh
        # axis genuinely shards every block in the stage.
        x = jnp.pad(x, ((0, 0), (0, 0), (0, st.h_pad - st.h), (0, 0), (0, 0)))

        block_cls = EarthSpecificBlock
        if self.remat:
            block_cls = nn.remat(EarthSpecificBlock, static_argnums=(2,),
                                 policy=self.remat_policy)
        for i in range(self.depth):
            x = block_cls(
                stage=self.stage,
                dim=self.dim,
                heads=self.heads,
                drop_path_rate=self.drop_path_rates[i],
                shifted=bool(i % 2),
                mlp_ratio=self.mlp_ratio,
                dropout_rate=self.dropout_rate,
                compute_dtype=self.compute_dtype,
                param_dtype=self.param_dtype,
                use_pallas=self.use_pallas,
                precision=self.precision,
                name=f"block{i}",
            )(x, deterministic)
        # Crop the lat pad (reference models/layers.py:287-288).
        return x[:, :, : st.h]


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
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, z, h, w, c = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, self.h_pad), (0, 0), (0, 0)))
        hp = h + self.h_pad
        x = x.reshape(b, z, hp // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6)  # (B, Z, H2, W2, dy, dx, C)
        x = x.reshape(b, z, hp // 2, w // 2, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.compute_dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        y = nn.Dense(2 * self.dim, use_bias=False, dtype=self.compute_dtype,
                     param_dtype=self.param_dtype, precision=self.precision,
                     kernel_init=_TRUNC, name="reduction")(x)
        d = lora_tap(self, "reduction", x, deterministic)
        return y if d is None else y + d.astype(y.dtype)


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
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, z, h2, w2, _ = x.shape
        y = nn.Dense(4 * self.out_dim, use_bias=False, dtype=self.compute_dtype,
                     param_dtype=self.param_dtype, precision=self.precision,
                     kernel_init=_TRUNC, name="expand")(x)
        d = lora_tap(self, "expand", x, deterministic)
        x = y if d is None else y + d.astype(y.dtype)
        x = x.reshape(b, z, h2, w2, 2, 2, self.out_dim)  # (..., dy, dx, C)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6)  # (B, Z, H2, dy, W2, dx, C)
        x = x.reshape(b, z, 2 * h2, 2 * w2, self.out_dim)
        x = x[:, :, : self.h_out]
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.compute_dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        y = nn.Dense(self.out_dim, use_bias=False, dtype=self.compute_dtype,
                     param_dtype=self.param_dtype, precision=self.precision,
                     kernel_init=_TRUNC, name="mix")(x)
        d = lora_tap(self, "mix", x, deterministic)
        return y if d is None else y + d.astype(y.dtype)
