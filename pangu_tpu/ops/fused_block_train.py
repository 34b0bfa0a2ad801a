"""TRAINING megakernel: one Earth-Specific block, fused forward AND backward.

The round-3 device profile (docs/PERFORMANCE.md) showed the unfused training
block — attention kernel + residual-postnorm epilogue + MLP-postnorm kernel —
spending ~42 ms/step in the epilogue programs alone (16 fwd + 16 bwd + 16
remat-recompute launches) plus the attn-out / x1 activation round trips
between kernels (a full-grid tensor is 205 MB at the outer stage). This op
computes the ENTIRE block (reference models/layers.py:218-299)

    x1  = x + s1 * LayerNorm1(attention(x))
    out = x1 + s2 * LayerNorm2(MLP(x1))

as ONE Pallas program each way. The backward is flash-style: it saves only
the block inputs, recomputes qkv/scores/softmax/proj/LN/MLP-hidden per
(z-window, h-window) slab in VMEM, and accumulates every weight/bias
gradient in VMEM-resident output blocks across the sequential grid — the
same scheme as ops/fused_block_attention._make_bwd_kernel and
ops/fused_mlp._make_postnorm_bwd_kernel, which it supersedes on this path.

``s1``/``s2`` are per-sample stochastic-depth branch scales (mask/keep,
ones when droppath is inactive), shape (B, 1) f32: per-SAMPLE constants
commute with the caller's shift rolls, so the kernel runs on the rolled
grid exactly like the inference megakernel (fused_earth_block).

Numerics mirror the unfused chain bit-for-bit on the recompute path: the
attention output and x1 round to bf16 between stages (the unfused kernels
write them to HBM as bf16), LayerNorm statistics and residual adds are f32.

Rolls/pads: operates on the window-padded (B, Z, Hp, W, C) grid; the caller
(model/blocks.py) re-zeroes pad rows at block entry and applies/undoes the
shift roll, as for the inference megakernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pangu_tpu.ops.fused_block_attention import _xla_reference
from pangu_tpu.ops.fused_mlp import (
    _gelu_exact_f32,
    _gelu_grad_f32,
    _layer_norm_f32,
)

_LN_EPS = 1e-5

# A/B switch (scripts/bench_train_ab.py): True routes training through this
# whole-block megakernel; False uses the unfused attention-kernel + epilogue
# + MLP-postnorm composition. Default OFF: the on-device A/B (same process,
# same v5e chip, scan-amortized full-geometry train step) measured the
# megakernel at 1.854 s/step vs 0.723 s/step for the unfused chain — the
# single giant fwd+bwd program defeats Mosaic's cross-kernel pipelining and
# re-runs the attention forward inside the backward (no stacked-head
# schedule there either). Kept as an opt-in for future re-tuning; see
# docs/PERFORMANCE.md "Training block megakernel: REJECTED".
_TRAIN_FUSION = False


def _xla_block_train(x, wqkv, bqkv, wproj, bproj, bias, mask,
                     ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b, s1, s2,
                     window, heads, scale, precision=None):
    """Reference composition (off-TPU path + backward fallback). Matches the
    unfused training chain's dtype rounding (bf16 writes between stages)."""
    b = x.shape[0]
    s1b = s1.reshape((b,) + (1,) * (x.ndim - 1)).astype(jnp.float32)
    s2b = s2.reshape((b,) + (1,) * (x.ndim - 1)).astype(jnp.float32)
    a = _xla_reference(x, wqkv, bqkv, wproj, bproj, bias, mask,
                       window, heads, scale, precision=precision)
    y1 = _layer_norm_f32(a.astype(jnp.float32), ln1_s.astype(jnp.float32),
                         ln1_b.astype(jnp.float32))
    x1 = (x.astype(jnp.float32) + s1b * y1).astype(x.dtype)
    h = (jnp.einsum("...c,cf->...f", x1, w1, precision=precision,
                    preferred_element_type=jnp.float32)
         + b1.astype(jnp.float32)).astype(x.dtype)
    h = jax.nn.gelu(h, approximate=False)
    y2 = (jnp.einsum("...f,fc->...c", h, w2, precision=precision,
                     preferred_element_type=jnp.float32)
          + b2.astype(jnp.float32))
    y2 = _layer_norm_f32(y2, ln2_s.astype(jnp.float32),
                         ln2_b.astype(jnp.float32))
    return (x1.astype(jnp.float32) + s2b * y2).astype(x.dtype)


def _make_fwd_kernel(window: Tuple[int, int, int], w: int, c: int,
                     heads: int, scale: float, with_mask: bool):
    wz, wh, ww = window
    wn = w // ww
    t = wz * wh * ww
    d = c // heads

    def kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref,
               *rest):
        rest = list(rest)
        mask_ref = rest.pop(0) if with_mask else None
        (ln1s_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         ln2s_ref, ln2b_ref, s1_ref, s2_ref, out_ref, acc_ref) = rest
        s1 = s1_ref[0, 0]
        s2 = s2_ref[0, 0]

        for wi in range(wn):
            xw = x_ref[0, :, :, wi * ww:(wi + 1) * ww, :].reshape(t, c)
            qkv = (jax.lax.dot_general(
                xw, wqkv_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bqkv_ref[:].astype(jnp.float32)).astype(xw.dtype)

            # stacked-head schedule (docs/PERFORMANCE.md round 2)
            scores_l = []
            for h in range(heads):
                qh = qkv[:, h * d:(h + 1) * d]
                kh = qkv[:, c + h * d:c + (h + 1) * d]
                s = jax.lax.dot_general(
                    qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale + bias_ref[0, h]
                if with_mask:
                    s = s + mask_ref[0]
                scores_l.append(s)
            S = jnp.concatenate(scores_l, axis=0)
            m = jnp.max(S, axis=-1, keepdims=True)
            p = jnp.exp(S - m)
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(qkv.dtype)
            for h in range(heads):
                vh = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d]
                acc_ref[:, h * d:(h + 1) * d] = jnp.dot(
                    p[h * t:(h + 1) * t], vh,
                    preferred_element_type=jnp.float32).astype(acc_ref.dtype)

            a = (jax.lax.dot_general(
                acc_ref[:], wproj_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bproj_ref[:].astype(jnp.float32)).astype(xw.dtype)

            # epilogue 1: x1 = x + s1 * LN1(a)   (a rounds to bf16 first,
            # matching the unfused kernels' HBM write)
            y1 = _layer_norm_f32(a.astype(jnp.float32),
                                 ln1s_ref[:].astype(jnp.float32),
                                 ln1b_ref[:].astype(jnp.float32))
            x1 = (xw.astype(jnp.float32) + s1 * y1).astype(xw.dtype)

            # MLP tail: out = x1 + s2 * LN2(GELU(x1@W1+b1)@W2+b2)
            h2 = jax.lax.dot_general(
                x1, w1_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b1_ref[:].astype(jnp.float32)
            h2 = _gelu_exact_f32(h2).astype(xw.dtype)
            y2 = jax.lax.dot_general(
                h2, w2_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b2_ref[:].astype(jnp.float32)
            y2 = _layer_norm_f32(y2, ln2s_ref[:].astype(jnp.float32),
                                 ln2b_ref[:].astype(jnp.float32))
            out = x1.astype(jnp.float32) + s2 * y2
            out_ref[0, :, :, wi * ww:(wi + 1) * ww, :] = (
                out.astype(out_ref.dtype).reshape(wz, wh, ww, c)
            )

    return kernel


def _make_bwd_kernel(window: Tuple[int, int, int], w: int, c: int,
                     heads: int, scale: float, with_mask: bool):
    wz, wh, ww = window
    wn = w // ww
    t = wz * wh * ww
    d = c // heads

    def kernel(x_ref, g_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
               bias_ref, *rest):
        rest = list(rest)
        mask_ref = rest.pop(0) if with_mask else None
        (ln1s_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         ln2s_ref, ln2b_ref, s1_ref, s2_ref,
         dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref, dbias_ref,
         dln1s_ref, dln1b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
         dln2s_ref, dln2b_ref, ds1_ref, ds2_ref,
         acc_ref, dqkv_ref) = rest

        zi, hi, bb = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        first = (zi == 0) & (hi == 0) & (bb == 0)

        @pl.when(first)
        def _():
            for ref in (dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
                        dln1s_ref, dln1b_ref, dw1_ref, db1_ref,
                        dw2_ref, db2_ref, dln2s_ref, dln2b_ref):
                ref[:] = jnp.zeros_like(ref)

        @pl.when(bb == 0)
        def _():
            dbias_ref[:] = jnp.zeros_like(dbias_ref)

        def dot(a, b, ta=False, tb=False):
            dims = (((0,) if ta else (1,), (1,) if tb else (0,)), ((), ()))
            return jax.lax.dot_general(
                a, b, dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )

        s1 = s1_ref[0, 0]
        s2 = s2_ref[0, 0]
        gamma1 = ln1s_ref[:].astype(jnp.float32)
        gamma2 = ln2s_ref[:].astype(jnp.float32)
        # ds1/ds2 accumulate in registers and are written ONCE per program:
        # their blocks are indexed by bb, the innermost grid axis, so a
        # read-modify-write block would be left and revisited non-contiguously
        # (unlike every other accumulator here, which is either constant-
        # mapped or changes only with the outer axes).
        ds1_val = jnp.float32(0.0)
        ds2_val = jnp.float32(0.0)

        for wi in range(wn):
            xw = x_ref[0, :, :, wi * ww:(wi + 1) * ww, :].reshape(t, c)
            gw = (g_ref[0, :, :, wi * ww:(wi + 1) * ww, :]
                  .reshape(t, c).astype(jnp.float32))

            # ---- recompute the forward (bit-identical to the fwd kernel) --
            qkv = (dot(xw, wqkv_ref[:])
                   + bqkv_ref[:].astype(jnp.float32)).astype(xw.dtype)
            scores_l = []
            for h in range(heads):
                qh = qkv[:, h * d:(h + 1) * d]
                kh = qkv[:, c + h * d:c + (h + 1) * d]
                s = dot(qh, kh, tb=True) * scale + bias_ref[0, h]
                if with_mask:
                    s = s + mask_ref[0]
                scores_l.append(s)
            S = jnp.concatenate(scores_l, axis=0)
            m = jnp.max(S, axis=-1, keepdims=True)
            p = jnp.exp(S - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)  # fp32 (heads*t, t)
            pw = p.astype(xw.dtype)
            for h in range(heads):
                vh = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d]
                acc_ref[:, h * d:(h + 1) * d] = dot(
                    pw[h * t:(h + 1) * t], vh).astype(acc_ref.dtype)
            a = (dot(acc_ref[:], wproj_ref[:])
                 + bproj_ref[:].astype(jnp.float32)).astype(xw.dtype)

            af = a.astype(jnp.float32)
            mu1 = jnp.mean(af, axis=-1, keepdims=True)
            var1 = jnp.mean(af * af, axis=-1, keepdims=True) - mu1 * mu1
            r1 = jax.lax.rsqrt(var1 + _LN_EPS)
            yhat1 = (af - mu1) * r1
            ln1_out = yhat1 * gamma1 + ln1b_ref[:].astype(jnp.float32)
            x1 = (xw.astype(jnp.float32) + s1 * ln1_out).astype(xw.dtype)

            h2 = dot(x1, w1_ref[:]) + b1_ref[:].astype(jnp.float32)
            act = _gelu_exact_f32(h2).astype(xw.dtype)
            y2 = dot(act, w2_ref[:]) + b2_ref[:].astype(jnp.float32)
            mu2 = jnp.mean(y2, axis=-1, keepdims=True)
            var2 = jnp.mean(y2 * y2, axis=-1, keepdims=True) - mu2 * mu2
            r2 = jax.lax.rsqrt(var2 + _LN_EPS)
            yhat2 = (y2 - mu2) * r2

            # ---- backward: MLP postnorm tail ----
            ln2_out = yhat2 * gamma2 + ln2b_ref[:].astype(jnp.float32)
            ds2_val += jnp.sum(gw * ln2_out)
            gb2 = gw * s2
            dln2s_ref[:] += jnp.sum(gb2 * yhat2, axis=0, keepdims=True)
            dln2b_ref[:] += jnp.sum(gb2, axis=0, keepdims=True)
            dyhat2 = gb2 * gamma2
            dy2 = r2 * (dyhat2
                        - jnp.mean(dyhat2, axis=-1, keepdims=True)
                        - yhat2 * jnp.mean(dyhat2 * yhat2, axis=-1,
                                           keepdims=True))
            dy2w = dy2.astype(xw.dtype)
            db2_ref[:] += jnp.sum(dy2, axis=0, keepdims=True)
            dw2_ref[:] += dot(act, dy2w, ta=True)
            dh2 = dot(dy2w, w2_ref[:], tb=True) * _gelu_grad_f32(h2)
            dh2w = dh2.astype(xw.dtype)
            db1_ref[:] += jnp.sum(dh2, axis=0, keepdims=True)
            dw1_ref[:] += dot(x1, dh2w, ta=True)
            dx1 = gw + dot(dh2w, w1_ref[:], tb=True)  # f32 (t, c)

            # ---- backward: attention-side epilogue ----
            ds1_val += jnp.sum(dx1 * ln1_out)
            gb1 = dx1 * s1
            dln1s_ref[:] += jnp.sum(gb1 * yhat1, axis=0, keepdims=True)
            dln1b_ref[:] += jnp.sum(gb1, axis=0, keepdims=True)
            dyhat1 = gb1 * gamma1
            da = r1 * (dyhat1
                       - jnp.mean(dyhat1, axis=-1, keepdims=True)
                       - yhat1 * jnp.mean(dyhat1 * yhat1, axis=-1,
                                          keepdims=True))

            # ---- backward: attention (flash; g := da) ----
            daw = da.astype(xw.dtype)
            dbproj_ref[:] += jnp.sum(da, axis=0, keepdims=True)
            dacc = dot(daw, wproj_ref[:], tb=True)  # (t, c) f32
            dwproj_ref[:] += dot(acc_ref[:], daw, ta=True)

            dp_l = []
            for h in range(heads):
                vh = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d]
                ph = pw[h * t:(h + 1) * t]
                do = dacc[:, h * d:(h + 1) * d].astype(xw.dtype)
                dp_l.append(dot(do, vh, tb=True))
                dqkv_ref[:, 2 * c + h * d:2 * c + (h + 1) * d] = (
                    dot(ph, do, ta=True)
                )
            DP = jnp.concatenate(dp_l, axis=0)
            DS = p * (DP - jnp.sum(DP * p, axis=-1, keepdims=True))
            DSw = DS.astype(xw.dtype)
            for h in range(heads):
                qh = qkv[:, h * d:(h + 1) * d]
                kh = qkv[:, c + h * d:c + (h + 1) * d]
                dbias_ref[0, h] += DS[h * t:(h + 1) * t]
                dsw = DSw[h * t:(h + 1) * t]
                dqkv_ref[:, h * d:(h + 1) * d] = dot(dsw, kh) * scale
                dqkv_ref[:, c + h * d:c + (h + 1) * d] = (
                    dot(dsw, qh, ta=True) * scale
                )

            dqkv = dqkv_ref[:]
            dbqkv_ref[:] += jnp.sum(dqkv, axis=0, keepdims=True)
            dqkvw = dqkv.astype(xw.dtype)
            dwqkv_ref[:] += dot(xw, dqkvw, ta=True)
            # shortcut path: x1 = x + ...  contributes dx1 directly
            dx_ref[0, :, :, wi * ww:(wi + 1) * ww, :] = (
                (dot(dqkvw, wqkv_ref[:], tb=True) + dx1)
                .astype(dx_ref.dtype).reshape(wz, wh, ww, c)
            )

        # Mosaic requires VMEM output blocks tiled (8, 128); broadcast the
        # scalar across one tile, the reducer reads element [..., 0, 0].
        ds1_ref[0, 0, 0] = jnp.full((8, 128), ds1_val, jnp.float32)
        ds2_ref[0, 0, 0] = jnp.full((8, 128), ds2_val, jnp.float32)

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(17, 18, 19))
def fused_earth_block_train(x, wqkv, bqkv, wproj, bproj, bias, mask,
                            ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
                            s1, s2,
                            window: Tuple[int, int, int], heads: int,
                            scale: float):
    """One Earth-Specific block with stochastic depth, trainable:
    ``x -> x + s1*LN1(attn(x)) -> (+ s2*LN2(MLP(...)))``.

    x: (B, Z, Hp, W, C) on the (possibly rolled) window-padded grid;
    s1/s2: (B, 1) f32 per-sample branch scales. Pallas flash fwd+bwd on TPU
    bf16; the XLA composition elsewhere. Saves only its inputs — no remat
    policy needed around it (reference torch checkpoint role,
    models/layers.py:143-149)."""
    return _block_forward(x, wqkv, bqkv, wproj, bproj, bias, mask,
                          ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
                          s1, s2, window, heads, scale)


def _use_pallas(x) -> bool:
    return jax.default_backend() == "tpu" and x.dtype != jnp.float32


def _block_forward(x, wqkv, bqkv, wproj, bproj, bias, mask,
                   ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
                   s1, s2, window, heads, scale):
    if not _use_pallas(x):
        prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None)
        return _xla_block_train(x, wqkv, bqkv, wproj, bproj, bias, mask,
                                ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
                                s1, s2, window, heads, scale, precision=prec)

    b, z, hp, w, c = x.shape
    wz, wh, ww = window
    zn, hn = z // wz, hp // wh
    t = wz * wh * ww
    hidden = w1.shape[1]
    grid = (b, zn, hn)

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda bb, zi, hi: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    slab = pl.BlockSpec((1, wz, wh, w, c),
                        lambda bb, zi, hi: (bb, zi, hi, 0, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [slab, const_spec(wqkv), const_spec(bqkv), const_spec(wproj),
                const_spec(bproj),
                pl.BlockSpec((1, heads, t, t),
                             lambda bb, zi, hi: (zi * hn + hi, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [x, wqkv, bqkv, wproj, bproj, bias]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, t, t),
                                     lambda bb, zi, hi: (zi * hn + hi, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    for arr in (ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b):
        in_specs.append(const_spec(arr))
        args.append(arr)
    sspec = pl.BlockSpec((1, 1), lambda bb, zi, hi: (bb, 0),
                         memory_space=pltpu.SMEM)
    in_specs += [sspec, sspec]
    args += [s1.astype(jnp.float32), s2.astype(jnp.float32)]

    kernel = _make_fwd_kernel(window, w, c, heads, scale, mask is not None)

    n_windows = b * zn * hn * (w // ww)
    flops = n_windows * (
        2 * t * c * 3 * c
        + heads * 2 * 2 * t * t * (c // heads)
        + 2 * t * c * c
        + 2 * 2 * t * c * hidden
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=slab,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((t, c), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * x.size * x.dtype.itemsize + bias.size * 4,
            transcendentals=n_windows * (heads * t * t + t * hidden),
        ),
    )(*args)


def _backward_pallas(x, wqkv, bqkv, wproj, bproj, bias, mask,
                     ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
                     s1, s2, g, window, heads, scale):
    b, z, hp, w, c = x.shape
    wz, wh, ww = window
    zn, hn = z // wz, hp // wh
    t = wz * wh * ww
    hidden = w1.shape[1]
    grid = (zn, hn, b)

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda zi, hi, bb: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    slab = pl.BlockSpec((1, wz, wh, w, c),
                        lambda zi, hi, bb: (bb, zi, hi, 0, 0),
                        memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, heads, t, t),
                             lambda zi, hi, bb: (zi * hn + hi, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [slab, slab, const_spec(wqkv), const_spec(bqkv),
                const_spec(wproj), const_spec(bproj), bias_spec]
    args = [x, g, wqkv, bqkv, wproj, bproj, bias]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, t, t),
                                     lambda zi, hi, bb: (zi * hn + hi, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    for arr in (ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b):
        in_specs.append(const_spec(arr))
        args.append(arr)
    sspec = pl.BlockSpec((1, 1), lambda zi, hi, bb: (bb, 0),
                         memory_space=pltpu.SMEM)
    in_specs += [sspec, sspec]
    args += [s1.astype(jnp.float32), s2.astype(jnp.float32)]

    kernel = _make_bwd_kernel(window, w, c, heads, scale, mask is not None)

    ds_spec = pl.BlockSpec((1, 1, 1, 8, 128),
                           lambda zi, hi, bb: (zi, hi, bb, 0, 0),
                           memory_space=pltpu.VMEM)

    def acc_spec(shp):
        return pl.BlockSpec(shp, lambda zi, hi, bb: (0,) * len(shp),
                            memory_space=pltpu.VMEM)

    f32 = jnp.float32
    out_shapes = (
        jax.ShapeDtypeStruct(x.shape, x.dtype),            # dx
        jax.ShapeDtypeStruct((c, 3 * c), f32),             # dwqkv
        jax.ShapeDtypeStruct((1, 3 * c), f32),             # dbqkv
        jax.ShapeDtypeStruct((c, c), f32),                 # dwproj
        jax.ShapeDtypeStruct((1, c), f32),                 # dbproj
        jax.ShapeDtypeStruct(bias.shape, f32),             # dbias
        jax.ShapeDtypeStruct((1, c), f32),                 # dln1_s
        jax.ShapeDtypeStruct((1, c), f32),                 # dln1_b
        jax.ShapeDtypeStruct((c, hidden), f32),            # dw1
        jax.ShapeDtypeStruct((1, hidden), f32),            # db1
        jax.ShapeDtypeStruct((hidden, c), f32),            # dw2
        jax.ShapeDtypeStruct((1, c), f32),                 # db2
        jax.ShapeDtypeStruct((1, c), f32),                 # dln2_s
        jax.ShapeDtypeStruct((1, c), f32),                 # dln2_b
        jax.ShapeDtypeStruct((zn, hn, b, 8, 128), f32),    # ds1 partials
        jax.ShapeDtypeStruct((zn, hn, b, 8, 128), f32),    # ds2 partials
    )
    out_specs = (
        slab,
        acc_spec((c, 3 * c)), acc_spec((1, 3 * c)),
        acc_spec((c, c)), acc_spec((1, c)),
        bias_spec,
        acc_spec((1, c)), acc_spec((1, c)),
        acc_spec((c, hidden)), acc_spec((1, hidden)),
        acc_spec((hidden, c)), acc_spec((1, c)),
        acc_spec((1, c)), acc_spec((1, c)),
        ds_spec, ds_spec,
    )
    n_windows = b * zn * hn * (w // ww)
    flops = 3 * n_windows * (
        2 * t * c * 3 * c
        + heads * 2 * 2 * t * t * (c // heads)
        + 2 * t * c * c
        + 2 * 2 * t * c * hidden
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((t, c), x.dtype),          # per-window attention acc
            pltpu.VMEM((t, 3 * c), f32),          # per-window dqkv
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * x.size * x.dtype.itemsize + 2 * bias.size * 4,
            transcendentals=2 * n_windows * (heads * t * t + t * hidden),
        ),
    )(*args)
    (dx, dwqkv, dbqkv, dwproj, dbproj, dbias, dln1s, dln1b, dw1, db1,
     dw2, db2, dln2s, dln2b, ds1, ds2) = outs
    return (dx,
            dwqkv.astype(wqkv.dtype), dbqkv[0].astype(bqkv.dtype),
            dwproj.astype(wproj.dtype), dbproj[0].astype(bproj.dtype),
            dbias.astype(bias.dtype),
            dln1s.reshape(ln1_s.shape).astype(ln1_s.dtype),
            dln1b.reshape(ln1_b.shape).astype(ln1_b.dtype),
            dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(b2.dtype),
            dln2s.reshape(ln2_s.shape).astype(ln2_s.dtype),
            dln2b.reshape(ln2_b.shape).astype(ln2_b.dtype),
            jnp.sum(ds1[..., 0, 0], axis=(0, 1)).reshape(s1.shape)
            .astype(s1.dtype),
            jnp.sum(ds2[..., 0, 0], axis=(0, 1)).reshape(s2.shape)
            .astype(s2.dtype))


def _fwd(x, wqkv, bqkv, wproj, bproj, bias, mask, ln1_s, ln1_b,
         w1, b1, w2, b2, ln2_s, ln2_b, s1, s2, window, heads, scale):
    out = _block_forward(x, wqkv, bqkv, wproj, bproj, bias, mask,
                         ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
                         s1, s2, window, heads, scale)
    return out, (x, wqkv, bqkv, wproj, bproj, bias, mask,
                 ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b, s1, s2)


def _bwd(window, heads, scale, res, g):
    (x, wqkv, bqkv, wproj, bproj, bias, mask,
     ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b, s1, s2) = res
    if _use_pallas(x):
        grads = _backward_pallas(x, wqkv, bqkv, wproj, bproj, bias, mask,
                                 ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
                                 s1, s2, g, window, heads, scale)
        (dx, dwqkv, dbqkv, dwproj, dbproj, dbias, dln1s, dln1b,
         dw1, db1, dw2, db2, dln2s, dln2b, ds1, ds2) = grads
        return (dx, dwqkv, dbqkv, dwproj, dbproj, dbias, None,
                dln1s, dln1b, dw1, db1, dw2, db2, dln2s, dln2b, ds1, ds2)
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None)
    _, vjp = jax.vjp(
        lambda x, wqkv, bqkv, wproj, bproj, bias, l1s, l1b, w1, b1, w2, b2,
        l2s, l2b, s1, s2: _xla_block_train(
            x, wqkv, bqkv, wproj, bproj, bias, mask, l1s, l1b,
            w1, b1, w2, b2, l2s, l2b, s1, s2, window, heads, scale,
            precision=prec),
        x, wqkv, bqkv, wproj, bproj, bias, ln1_s, ln1_b, w1, b1, w2, b2,
        ln2_s, ln2_b, s1, s2,
    )
    (dx, dwqkv, dbqkv, dwproj, dbproj, dbias, dln1s, dln1b,
     dw1, db1, dw2, db2, dln2s, dln2b, ds1, ds2) = vjp(g)
    return (dx, dwqkv, dbqkv, dwproj, dbproj, dbias, None,
            dln1s, dln1b, dw1, db1, dw2, db2, dln2s, dln2b, ds1, ds2)


fused_earth_block_train.defvjp(_fwd, _bwd)
