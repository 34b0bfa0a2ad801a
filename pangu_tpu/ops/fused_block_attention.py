"""Fully-fused windowed attention over the token grid — Pallas TPU kernel.

Reads (wz, wh, W, C) slabs straight out of the (B, Z, Hp, W, C) activation
grid via BlockSpec index maps — the window partition/reverse transposes of
the XLA path (two full-activation 8D transposes per block, reference
models/layers.py:253-276) never happen. One grid program handles one
(z-window, h-window) row — i.e. one window *type* — for all ``W/ww``
longitude windows:

    slab -> qkv = slab@Wqkv + b          (one fat (wz*wh*W, C) MXU matmul)
    per lon-window, per head: (T,T) scores + earth bias [+ shift mask]
      -> fp32 softmax -> @v               (T = wz*wh*ww = 144 tokens)
    concat -> out = acc@Wproj + b         (one fat matmul)
    -> written back as the same slab.

Scores never touch HBM; the per-type bias is fetched exactly once per
program; weights use constant index maps and stay resident.

FLOP layout note: head_dim is 32, so score matmuls use a 32-deep contraction
(25% MXU lane utilization) — but attention is ~20% of model FLOPs; the fat
qkv/proj matmuls here and the XLA-side MLP dominate and run full-width.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pangu_tpu.ops.windows import window_partition, window_reverse


_LN_EPS = 1e-5


def _make_kernel(window: Tuple[int, int, int], w: int, c: int, heads: int,
                 scale: float, with_mask: bool, with_epilogue: bool,
                 precise: bool, with_mlp: bool = False):
    wz, wh, ww = window
    wn = w // ww
    t = wz * wh * ww
    d = c // heads
    prec = jax.lax.Precision.HIGHEST if precise else jax.lax.Precision.DEFAULT

    def kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref,
               *rest):
        rest = list(rest)
        mask_ref = rest.pop(0) if with_mask else None
        if with_epilogue:
            ln_s_ref = rest.pop(0)
            ln_b_ref = rest.pop(0)
        if with_mlp:
            w1_ref, b1_ref, w2_ref, b2_ref, ln2_s_ref, ln2_b_ref = rest[:6]
            rest = rest[6:]
        out_ref, acc_ref = rest

        for wi in range(wn):
            xw = x_ref[0, :, :, wi * ww:(wi + 1) * ww, :].reshape(t, c)
            qkv = (jax.lax.dot_general(
                xw, wqkv_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            ) + bqkv_ref[:].astype(jnp.float32)).astype(xw.dtype)

            # Stacked-head schedule: all score dots back-to-back, ONE
            # (heads*T, T) softmax, then all pv dots — interleaving MXU dots
            # with per-head softmaxes stalls both units (measured
            # ~1 ms/kernel slower; docs/PERFORMANCE.md).
            scores_l = []
            for h in range(heads):
                qh = qkv[:, h * d:(h + 1) * d]
                kh = qkv[:, c + h * d:c + (h + 1) * d]
                s = jax.lax.dot_general(
                    qh, kh,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                ) * scale
                s = s + bias_ref[0, h]
                if with_mask:
                    s = s + mask_ref[0]  # noqa: mask present iff with_mask
                scores_l.append(s)
            S = jnp.concatenate(scores_l, axis=0)  # (heads*T, T) fp32
            m = jnp.max(S, axis=-1, keepdims=True)
            p = jnp.exp(S - m)
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(qkv.dtype)
            for h in range(heads):
                vh = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d]
                acc_ref[:, h * d:(h + 1) * d] = jnp.dot(
                    p[h * t:(h + 1) * t], vh,
                    preferred_element_type=jnp.float32, precision=prec,
                ).astype(acc_ref.dtype)

            y = jax.lax.dot_general(
                acc_ref[:], wproj_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            ) + bproj_ref[:].astype(jnp.float32)
            if with_epilogue:
                # post-norm residual (reference models/layers.py:296):
                # out = shortcut + LayerNorm(attn_out); the shortcut is the
                # same (possibly rolled/padded) window fed to attention —
                # valid because rolls commute with per-token ops and pad
                # rows are cropped by the caller.
                mu = jnp.mean(y, axis=-1, keepdims=True)
                var = jnp.mean(y * y, axis=-1, keepdims=True) - mu * mu
                y = (y - mu) * jax.lax.rsqrt(var + _LN_EPS)
                y = y * ln_s_ref[:].astype(jnp.float32) + ln_b_ref[:].astype(jnp.float32)
                y = y + xw.astype(jnp.float32)
            if with_mlp:
                # block tail (reference models/layers.py:297):
                # out = y + LayerNorm(GELU(y@W1+b1)@W2+b2) — the hidden
                # (t, 4C) activation lives only in VMEM.
                from pangu_tpu.ops.fused_mlp import _gelu_exact_f32

                yb = y.astype(xw.dtype)
                h = jax.lax.dot_general(
                    yb, w1_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                ) + b1_ref[:].astype(jnp.float32)
                h = _gelu_exact_f32(h).astype(xw.dtype)
                zz = jax.lax.dot_general(
                    h, w2_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                ) + b2_ref[:].astype(jnp.float32)
                mu = jnp.mean(zz, axis=-1, keepdims=True)
                var = jnp.mean(zz * zz, axis=-1, keepdims=True) - mu * mu
                zz = (zz - mu) * jax.lax.rsqrt(var + _LN_EPS)
                zz = (zz * ln2_s_ref[:].astype(jnp.float32)
                      + ln2_b_ref[:].astype(jnp.float32))
                y = y + zz
            out_ref[0, :, :, wi * ww:(wi + 1) * ww, :] = (
                y.astype(out_ref.dtype).reshape(wz, wh, ww, c)
            )

    return kernel


def _xla_reference(x, wqkv, bqkv, wproj, bproj, bias, mask, window,
                   heads: int, scale: float, precision=None,
                   ln_scale=None, ln_bias=None):
    """Same math via the XLA window path (off-TPU fallback + backward)."""
    b, z, hp, w, c = x.shape
    xw = window_partition(x, window)  # (B, nW, nT, T, C)
    t = xw.shape[3]
    qkv = (
        jnp.einsum("...c,cf->...f", xw, wqkv, precision=precision,
                   preferred_element_type=jnp.float32)
        + bqkv.astype(jnp.float32)
    ).astype(x.dtype)
    qkv = qkv.reshape(qkv.shape[:4] + (3, heads, c // heads))
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    attn = jnp.einsum("bwnqhd,bwnkhd->bwnhqk", q * scale, k,
                      precision=precision, preferred_element_type=jnp.float32)
    attn = attn + bias[None, None].astype(jnp.float32)
    if mask is not None:
        attn = attn + mask[None, None, :, None].astype(jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum("bwnhqk,bwnkhd->bwnqhd", attn, v, precision=precision,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.reshape(out.shape[:3] + (t, c))
    out = (
        jnp.einsum("...c,cf->...f", out, wproj, precision=precision,
                   preferred_element_type=jnp.float32)
        + bproj.astype(jnp.float32)
    )
    if ln_scale is not None:
        mu = jnp.mean(out, axis=-1, keepdims=True)
        var = jnp.mean(out * out, axis=-1, keepdims=True) - mu * mu
        out = (out - mu) * jax.lax.rsqrt(var + _LN_EPS)
        out = out * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
        out = out + xw.astype(jnp.float32)
    out = out.astype(x.dtype)
    return window_reverse(out, window, z, hp, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def fused_block_attention(x, wqkv, bqkv, wproj, bproj, bias, mask,
                          ln_scale, ln_bias,
                          window: Tuple[int, int, int], heads: int,
                          scale: float):
    """x: (B, Z, Hp, W, C) -> (B, Z, Hp, W, C). Params in Dense layout
    (wqkv (C, 3C), wproj (C, C)); bias (nT, heads, T, T); mask (nT, T, T)|None.

    With ``ln_scale``/``ln_bias`` the kernel applies the block's post-norm
    residual epilogue ``x + LayerNorm(attn(x))`` in VMEM."""
    return _forward(x, wqkv, bqkv, wproj, bproj, bias, mask, ln_scale, ln_bias,
                    window, heads, scale)


def _forward(x, wqkv, bqkv, wproj, bproj, bias, mask, ln_scale, ln_bias,
             window, heads, scale):
    # fp32 activations double every VMEM buffer past the 16MB budget; fp32 is
    # the parity path, so it takes the (HIGHEST-precision) XLA formula.
    if jax.default_backend() != "tpu" or x.dtype == jnp.float32:
        prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None)
        return _xla_reference(x, wqkv, bqkv, wproj, bproj, bias, mask,
                              window, heads, scale, precision=prec,
                              ln_scale=ln_scale, ln_bias=ln_bias)

    b, z, hp, w, c = x.shape
    wz, wh, ww = window
    zn, hn = z // wz, hp // wh
    t = wz * wh * ww
    precise = False  # bf16-only kernel; fp32 routed to XLA above

    grid = (b, zn, hn)

    def const_spec(arr):
        return pl.BlockSpec(
            arr.shape, lambda bb, zi, hi: (0,) * arr.ndim,
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        pl.BlockSpec((1, wz, wh, w, c),
                     lambda bb, zi, hi: (bb, zi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        const_spec(wqkv),
        const_spec(bqkv),
        const_spec(wproj),
        const_spec(bproj),
        pl.BlockSpec((1, heads, t, t),
                     lambda bb, zi, hi: (zi * hn + hi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, wqkv, bqkv, wproj, bproj, bias]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((1, t, t),
                         lambda bb, zi, hi: (zi * hn + hi, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(mask)
    with_epilogue = ln_scale is not None
    if with_epilogue:
        in_specs.append(const_spec(ln_scale))
        in_specs.append(const_spec(ln_bias))
        args.append(ln_scale)
        args.append(ln_bias)

    kernel = _make_kernel(window, w, c, heads, scale, mask is not None,
                          with_epilogue, precise)

    n_windows = b * zn * hn * (w // ww)
    flops = n_windows * (
        2 * t * c * 3 * c
        + heads * 2 * 2 * t * t * (c // heads)
        + 2 * t * c * c
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, wz, wh, w, c),
                               lambda bb, zi, hi: (bb, zi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((t, c), x.dtype),  # per-window attention output
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * x.size * x.dtype.itemsize + bias.size * 4,
            transcendentals=n_windows * heads * t * t,
        ),
    )(*args)
    return out


def _make_bwd_kernel(window: Tuple[int, int, int], w: int, c: int, heads: int,
                     scale: float, with_mask: bool):
    """Flash-style backward: scores are recomputed per window (never stored),
    weight/bias gradients accumulate in VMEM-resident output blocks across
    the sequential TPU grid.

    Fat weight-grad schedule (round-3 A/B, docs/PERFORMANCE.md): per-window
    dqkv/acc are staged into program-wide bf16 slabs and the weight grads
    computed as ONE deep (rows x C)^T @ (rows x 3C) dot per program after the
    window loop — measured 22.7 vs 23.9 ms/call for 30 shallow depth-144
    read-modify-write accumulations (lon-window packing of the row-wise dots
    was also tried and lost 25-28%: the VMEM lane-concats cost more than the
    M-tile utilization they buy). Per-head dq/dk/dv stay loop-carried values
    (no strided 32-lane scratch stores); bias/bqkv/bproj grads accumulate in
    loop-carried f32 and touch their output refs once per program.
    """
    wz, wh, ww = window
    wn = w // ww
    t = wz * wh * ww
    d = c // heads

    def kernel(x_ref, g_ref, wqkv_ref, bqkv_ref, wproj_ref, bias_ref,
               *rest):
        rest = list(rest)
        mask_ref = rest.pop(0) if with_mask else None
        (dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
         dbias_ref, dqkv_slab_ref, acc_slab_ref) = rest

        zi, hi, bb = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        first = (zi == 0) & (hi == 0) & (bb == 0)

        @pl.when(first)
        def _():
            dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
            dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
            dwproj_ref[:] = jnp.zeros_like(dwproj_ref)
            dbproj_ref[:] = jnp.zeros_like(dbproj_ref)

        @pl.when(bb == 0)
        def _():
            dbias_ref[:] = jnp.zeros_like(dbias_ref)

        def dot(a, b, ta=False, tb=False):
            dims = (((0,) if ta else (1,), (1,) if tb else (0,)), ((), ()))
            return jax.lax.dot_general(
                a, b, dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )

        a_dbqkv = jnp.zeros((1, 3 * c), jnp.float32)
        a_dbproj = jnp.zeros((1, c), jnp.float32)
        a_dbias = jnp.zeros((heads * t, t), jnp.float32)

        for wi in range(wn):
            xw = x_ref[0, :, :, wi * ww:(wi + 1) * ww, :].reshape(t, c)
            gw = (g_ref[0, :, :, wi * ww:(wi + 1) * ww, :]
                  .reshape(t, c).astype(jnp.float32))

            # ---- recompute forward up to p (per head below) ----
            qkv = (dot(xw, wqkv_ref[:])
                   + bqkv_ref[:].astype(jnp.float32)).astype(xw.dtype)

            a_dbproj += jnp.sum(gw, axis=0, keepdims=True)
            dacc = dot(gw.astype(xw.dtype), wproj_ref[:], tb=True)  # (t, c)

            # Stacked-head schedule (same reasoning as the forward kernel):
            # batch all MXU score dots, then ONE softmax / ONE ds formula
            # over the (heads*T, T) stack, then batch the remaining dots.
            scores_l = []
            for h in range(heads):
                qh = qkv[:, h * d:(h + 1) * d]
                kh = qkv[:, c + h * d:c + (h + 1) * d]
                s = dot(qh, kh, tb=True) * scale + bias_ref[0, h]
                if with_mask:
                    s = s + mask_ref[0]
                scores_l.append(s)
            S = jnp.concatenate(scores_l, axis=0)            # (heads*t, t)
            m = jnp.max(S, axis=-1, keepdims=True)
            p = jnp.exp(S - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)       # fp32
            pw = p.astype(xw.dtype)

            dp_l, dv_l, acc_l = [], [], []
            for h in range(heads):
                vh = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d]
                ph = pw[h * t:(h + 1) * t]
                acc_l.append(dot(ph, vh))                         # (t, d)
                do = dacc[:, h * d:(h + 1) * d].astype(xw.dtype)  # (t, d)
                dp_l.append(dot(do, vh, tb=True))                 # (t, t)
                dv_l.append(dot(ph, do, ta=True))                 # dv
            DP = jnp.concatenate(dp_l, axis=0)               # (heads*t, t)
            DS = p * (DP - jnp.sum(DP * p, axis=-1, keepdims=True))
            a_dbias += DS
            DSw = DS.astype(xw.dtype)
            dq_l, dk_l = [], []
            for h in range(heads):
                qh = qkv[:, h * d:(h + 1) * d]
                kh = qkv[:, c + h * d:c + (h + 1) * d]
                dsw = DSw[h * t:(h + 1) * t]
                dq_l.append(dot(dsw, kh) * scale)
                dk_l.append(dot(dsw, qh, ta=True) * scale)

            dqkv = jnp.concatenate(dq_l + dk_l + dv_l, axis=1)  # (t, 3c) f32
            acc = jnp.concatenate(acc_l, axis=1)                # (t, c) f32
            a_dbqkv += jnp.sum(dqkv, axis=0, keepdims=True)
            dqkvw = dqkv.astype(xw.dtype)
            dqkv_slab_ref[:, :, wi * ww:(wi + 1) * ww, :] = (
                dqkvw.reshape(wz, wh, ww, 3 * c))
            acc_slab_ref[:, :, wi * ww:(wi + 1) * ww, :] = (
                acc.astype(xw.dtype).reshape(wz, wh, ww, c))
            dx_ref[0, :, :, wi * ww:(wi + 1) * ww, :] = (
                dot(dqkvw, wqkv_ref[:], tb=True)
                .astype(dx_ref.dtype).reshape(wz, wh, ww, c)
            )

        # ONE deep weight-grad dot each per program: rows = wz*wh*w
        rows = wz * wh * w
        xs = x_ref[0].reshape(rows, c)
        dwqkv_ref[:] += dot(xs, dqkv_slab_ref[:].reshape(rows, 3 * c),
                            ta=True)
        gs = g_ref[0].reshape(rows, c)
        dwproj_ref[:] += dot(acc_slab_ref[:].reshape(rows, c), gs, ta=True)
        dbias_ref[0] += a_dbias.reshape(heads, t, t)
        dbqkv_ref[:] += a_dbqkv
        dbproj_ref[:] += a_dbproj

    return kernel


def _backward_pallas(x, wqkv, bqkv, wproj, bias, mask, g,
                     window, heads, scale):
    """Pallas flash backward (no-epilogue path). Returns
    (dx, dwqkv, dbqkv, dwproj, dbproj, dbias)."""
    b, z, hp, w, c = x.shape
    wz, wh, ww = window
    zn, hn = z // wz, hp // wh
    t = wz * wh * ww

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
                const_spec(wproj), bias_spec]
    args = [x, g, wqkv, bqkv, wproj, bias]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, t, t),
                                     lambda zi, hi, bb: (zi * hn + hi, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)

    kernel = _make_bwd_kernel(window, w, c, heads, scale, mask is not None)

    n_windows = b * zn * hn * (w // ww)
    flops = 2 * n_windows * (
        2 * t * c * 3 * c
        + heads * 2 * 2 * t * t * (c // heads)
        + 2 * t * c * c
    )
    out_shapes = (
        jax.ShapeDtypeStruct(x.shape, x.dtype),              # dx
        jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),        # dwqkv
        jax.ShapeDtypeStruct((1, 3 * c), jnp.float32),        # dbqkv
        jax.ShapeDtypeStruct((c, c), jnp.float32),            # dwproj
        jax.ShapeDtypeStruct((1, c), jnp.float32),            # dbproj
        jax.ShapeDtypeStruct(bias.shape, jnp.float32),        # dbias
    )
    out_specs = (
        slab,
        pl.BlockSpec((c, 3 * c), lambda zi, hi, bb: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * c), lambda zi, hi, bb: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c, c), lambda zi, hi, bb: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda zi, hi, bb: (0, 0),
                     memory_space=pltpu.VMEM),
        bias_spec,
    )
    dx, dwqkv, dbqkv, dwproj, dbproj, dbias = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            # program-wide staging slabs for the fat weight-grad dots
            pltpu.VMEM((wz, wh, w, 3 * c), x.dtype),  # dqkv slab
            pltpu.VMEM((wz, wh, w, c), x.dtype),      # attention-acc slab
        ],
        # slabs + grads + bias rows exceed the conservative 16MB scoped
        # default by ~1.5MB at the outer stage; v5e/v5p VMEM is far larger
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * x.size * x.dtype.itemsize + 2 * bias.size * 4,
            transcendentals=n_windows * heads * t * t,
        ),
    )(*args)
    return (dx, dwqkv.astype(wqkv.dtype), dbqkv[0].astype(bqkv.dtype),
            dwproj.astype(wproj.dtype), dbproj[0].astype(wproj.dtype),
            dbias.astype(bias.dtype))


def _fwd(x, wqkv, bqkv, wproj, bproj, bias, mask, ln_scale, ln_bias,
         window, heads, scale):
    out = _forward(x, wqkv, bqkv, wproj, bproj, bias, mask, ln_scale, ln_bias,
                   window, heads, scale)
    return out, (x, wqkv, bqkv, wproj, bproj, bias, mask, ln_scale, ln_bias)


def _bwd(window, heads, scale, res, g):
    x, wqkv, bqkv, wproj, bproj, bias, mask, ln_scale, ln_bias = res
    if ln_scale is None:
        if jax.default_backend() == "tpu" and x.dtype != jnp.float32:
            dx, dwqkv, dbqkv, dwproj, dbproj, dbias = _backward_pallas(
                x, wqkv, bqkv, wproj, bias, mask, g, window, heads, scale
            )
            return dx, dwqkv, dbqkv, dwproj, dbproj, dbias, None, None, None
        _, vjp = jax.vjp(
            lambda x, wqkv, bqkv, wproj, bproj, bias: _xla_reference(
                x, wqkv, bqkv, wproj, bproj, bias, mask, window, heads, scale
            ),
            x, wqkv, bqkv, wproj, bproj, bias,
        )
        dx, dwqkv, dbqkv, dwproj, dbproj, dbias = vjp(g)
        return dx, dwqkv, dbqkv, dwproj, dbproj, dbias, None, None, None
    _, vjp = jax.vjp(
        lambda x, wqkv, bqkv, wproj, bproj, bias, s, t: _xla_reference(
            x, wqkv, bqkv, wproj, bproj, bias, mask, window, heads, scale,
            ln_scale=s, ln_bias=t,
        ),
        x, wqkv, bqkv, wproj, bproj, bias, ln_scale, ln_bias,
    )
    dx, dwqkv, dbqkv, dwproj, dbproj, dbias, ds, dt = vjp(g)
    return dx, dwqkv, dbqkv, dwproj, dbproj, dbias, None, ds, dt


fused_block_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Block megakernel: the ENTIRE Earth-Specific block in one Pallas program —
# attention + post-norm residual + MLP + post-norm residual. Removes the two
# extra HBM round trips (attn-out write/read, mlp-in write/read) of the
# two-kernel split; the (t, 4C) MLP hidden never leaves VMEM.
# ---------------------------------------------------------------------------


def _xla_block_reference(x, wqkv, bqkv, wproj, bproj, bias, mask,
                         ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
                         window, heads, scale, precision=None):
    from pangu_tpu.ops.fused_mlp import _xla_reference as mlp_reference

    y = _xla_reference(x, wqkv, bqkv, wproj, bproj, bias, mask,
                       window, heads, scale, precision=precision,
                       ln_scale=ln1_s, ln_bias=ln1_b)
    shape = y.shape
    return mlp_reference(y.reshape(-1, shape[-1]), w1, b1, w2, b2,
                         ln2_s, ln2_b, precision=precision).reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17))
def fused_earth_block(x, wqkv, bqkv, wproj, bproj, bias, mask,
                      ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
                      window: Tuple[int, int, int], heads: int, scale: float):
    """One Earth-Specific block, fully fused (reference
    models/layers.py:218-299): x -> x + LN1(attn(x)) -> + LN2(MLP(...)).

    x: (B, Z, Hp, W, C) on the (possibly rolled) window-padded grid; rolls
    commute with the per-token epilogues, so the caller un-rolls the output.

    INFERENCE-ONLY CONTRACT: stochastic depth needs the unfused form, and the
    only backward this op could offer is a full duplicated XLA re-forward —
    a silent ~2x cost for any training caller. Differentiating through it
    therefore raises; training paths must use the unfused
    ``fused_block_attention`` + ``fused_mlp`` pair (which have real flash
    backwards). ``EarthSpecificLayer`` enforces this by gating the megakernel
    to ``deterministic`` calls (model/blocks.py).
    """
    return _block_forward(x, wqkv, bqkv, wproj, bproj, bias, mask,
                          ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
                          window, heads, scale)


def _block_forward(x, wqkv, bqkv, wproj, bproj, bias, mask,
                   ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
                   window, heads, scale):
    if jax.default_backend() != "tpu" or x.dtype == jnp.float32:
        prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None)
        return _xla_block_reference(x, wqkv, bqkv, wproj, bproj, bias, mask,
                                    ln1_s, ln1_b, w1, b1, w2, b2, ln2_s,
                                    ln2_b, window, heads, scale,
                                    precision=prec)

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

    kernel = _make_kernel(window, w, c, heads, scale, mask is not None,
                          with_epilogue=True, precise=False, with_mlp=True)

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
        scratch_shapes=[
            pltpu.VMEM((t, c), x.dtype),  # per-window attention output
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * x.size * x.dtype.itemsize + bias.size * 4,
            transcendentals=n_windows * (heads * t * t + t * hidden),
        ),
    )(*args)


def _block_fwd(x, wqkv, bqkv, wproj, bproj, bias, mask,
               ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
               window, heads, scale):
    out = _block_forward(x, wqkv, bqkv, wproj, bproj, bias, mask,
                         ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
                         window, heads, scale)
    return out, (x, wqkv, bqkv, wproj, bproj, bias, mask,
                 ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b)


def _block_bwd(window, heads, scale, res, g):
    raise RuntimeError(
        "fused_earth_block is inference-only: its backward would re-run the "
        "entire block via XLA vjp (a hidden duplicated forward). Use the "
        "unfused fused_block_attention + fused_mlp pair for training — "
        "EarthSpecificLayer already routes non-deterministic calls there."
    )


fused_earth_block.defvjp(_block_fwd, _block_bwd)
