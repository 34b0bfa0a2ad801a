"""On-device A/B of attention flash-backward kernel schedules.

The round-3 profile shows the outer-stage attention backward at 3.8x its
forward (22.7 vs 5.9 ms/block) where the FLOP ratio predicts ~2.9x, and
both kernels sit well under the padding-adjusted roofline. Candidate
causes are all in the backward's cross-window accumulation structure:

  shipped     — ops/fused_block_attention.py::_backward_pallas verbatim:
                per-window read-modify-write of the f32 weight-grad and
                bias-grad output refs (serializes windows against each
                other) + per-head strided (144, 32) stores into an f32
                dqkv scratch.
  local_accum — same dots, but dwqkv/dbqkv/dwproj/dbproj/dbias accumulate
                in loop-carried values; each output ref is touched ONCE
                per program.
  fat_wgrad   — per-window dqkv and acc staged into slab-layout bf16
                scratch; after the window loop the weight grads are ONE
                deep (rows x C)^T @ (rows x 3C) dot per program instead of
                30 shallow accumulations (dbias still deferred-local).
  value_all   — local_accum plus NO per-head scratch stores at all:
                per-head dq/dk/dv and acc are kept as values and
                lane-concatenated into (t, 3c)/(t, c), so the narrow
                32-lane strided writes disappear entirely.
  value_fat   — value_all + the fat_wgrad staging combined (no packing):
                no per-head scratch stores AND the weight grads as one
                deep dot per program — the two individually-measured wins.
  pair/tri    — value_all processing 2/3 lon-windows per iteration: the
                row-wise dots (qkv recompute, dacc, dwqkv, dx, dwproj) run
                at M = 288/432 instead of 144 (M-tile util 56% -> 75%/84%
                on the 128-row MXU) and the per-window fixed cost halves/
                thirds; the (t, t) score path stays per-window. (nw=4 is
                impossible: wn = 30 lon-windows per program.)
  pair_fat/tri_fat — pair/tri with the weight grads additionally staged
                into program-wide slabs and computed as ONE depth-4320 dot
                (the fat_wgrad schedule, the round's first measured win).

Timing: K-step lax.scan chains of the full outer-stage backward with the
input perturbed by the previous dx (defeats CSE/hoisting of the pure
pallas_call); paired long/short-grid difference with scalar fetch, median
of reps — the same tunnel-robust methodology as bench.py / bench_mxu_micro.
All large operands are jit ARGUMENTS, never closed-over constants (inlined
literals blow the remote-compile request cap; see bench.py).

Usage: python scripts/bench_attn_bwd_ab.py [variant ...]
       python scripts/bench_attn_bwd_ab.py --smoke   # CPU interpret parity
Prints one JSON line per variant (ms per backward call) plus a summary.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

# outer-stage geometry (geometry.compute_geometry on the pretrained config)
B, Z, HP, W, C = 1, 8, 186, 360, 192
WINDOW = (2, 6, 12)
HEADS = 6

VARIANTS = ("shipped", "local_accum", "fat_wgrad", "value_all", "value_fat",
            "pair", "tri", "pair_fat", "tri_fat")
_NW = {"pair": 2, "tri": 3, "pair_fat": 2, "tri_fat": 3}


from ab_common import dot as _dot, interpret_pallas, scan_timeit  # noqa: E402


def _scale() -> float:
    return (C // HEADS) ** -0.5


def _recompute_heads(xw, wqkv_ref, bqkv_ref, bias_ref, dacc, t, c, d, heads,
                     scale):
    """Shared recompute: qkv, stacked scores/softmax, per-head dv/acc, DS.

    Returns (qkv, DS, dv_l, acc_l) with dv_l[h]/acc_l[h] (t, d) f32 values.
    """
    qkv = (_dot(xw, wqkv_ref[:])
           + bqkv_ref[:].astype(jnp.float32)).astype(xw.dtype)
    scores_l = []
    for h in range(heads):
        qh = qkv[:, h * d:(h + 1) * d]
        kh = qkv[:, c + h * d:c + (h + 1) * d]
        scores_l.append(_dot(qh, kh, tb=True) * scale + bias_ref[0, h])
    S = jnp.concatenate(scores_l, axis=0)
    m = jnp.max(S, axis=-1, keepdims=True)
    p = jnp.exp(S - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    pw = p.astype(xw.dtype)
    dp_l, dv_l, acc_l = [], [], []
    for h in range(heads):
        vh = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d]
        ph = pw[h * t:(h + 1) * t]
        acc_l.append(_dot(ph, vh))
        do = dacc[:, h * d:(h + 1) * d].astype(xw.dtype)
        dp_l.append(_dot(do, vh, tb=True))
        dv_l.append(_dot(ph, do, ta=True))
    DP = jnp.concatenate(dp_l, axis=0)
    DS = p * (DP - jnp.sum(DP * p, axis=-1, keepdims=True))
    return qkv, DS, dv_l, acc_l


def _make_variant_kernel(variant: str):
    wz, wh, ww = WINDOW
    wn = W // ww
    t = wz * wh * ww
    c = C
    d = c // HEADS
    heads = HEADS
    scale = _scale()
    nw = _NW.get(variant, 1)
    local = variant != "shipped"
    fat = variant in ("fat_wgrad", "value_fat", "pair_fat", "tri_fat")
    values = variant in ("value_all", "value_fat") or nw > 1

    def kernel(x_ref, g_ref, wqkv_ref, bqkv_ref, wproj_ref, bias_ref,
               dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
               dbias_ref, *scratch):
        acc_ref = dqkv_ref = None
        if not values:
            acc_ref, dqkv_ref = scratch[:2]
        if fat:
            dqkv_slab_ref, acc_slab_ref = scratch[-2:]
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

        a_dwqkv = jnp.zeros((c, 3 * c), jnp.float32) if local else None
        a_dbqkv = jnp.zeros((1, 3 * c), jnp.float32) if local else None
        a_dwproj = jnp.zeros((c, c), jnp.float32) if local else None
        a_dbproj = jnp.zeros((1, c), jnp.float32) if local else None
        a_dbias = (jnp.zeros((heads * t, t), jnp.float32) if local else None)

        for wi in range(wn):
            xw = x_ref[0, :, :, wi * ww:(wi + 1) * ww, :].reshape(t, c)
            gw = (g_ref[0, :, :, wi * ww:(wi + 1) * ww, :]
                  .reshape(t, c).astype(jnp.float32))
            if local:
                a_dbproj += jnp.sum(gw, axis=0, keepdims=True)
            else:
                dbproj_ref[:] += jnp.sum(gw, axis=0, keepdims=True)
            dacc = _dot(gw.astype(xw.dtype), wproj_ref[:], tb=True)
            qkv, DS, dv_l, acc_l = _recompute_heads(
                xw, wqkv_ref, bqkv_ref, bias_ref, dacc, t, c, d, heads,
                scale)
            DSw = DS.astype(xw.dtype)
            if local:
                a_dbias += DS
            else:
                for h in range(heads):
                    dbias_ref[0, h] += DS[h * t:(h + 1) * t]
            dq_l, dk_l = [], []
            for h in range(heads):
                qh = qkv[:, h * d:(h + 1) * d]
                kh = qkv[:, c + h * d:c + (h + 1) * d]
                dsw = DSw[h * t:(h + 1) * t]
                dq_l.append(_dot(dsw, kh) * scale)
                dk_l.append(_dot(dsw, qh, ta=True) * scale)
            if values:
                dqkv = jnp.concatenate(dq_l + dk_l + dv_l, axis=1)
                acc = jnp.concatenate(acc_l, axis=1).astype(xw.dtype)
            else:
                for h in range(heads):
                    acc_ref[:, h * d:(h + 1) * d] = (
                        acc_l[h].astype(acc_ref.dtype))
                    dqkv_ref[:, h * d:(h + 1) * d] = dq_l[h]
                    dqkv_ref[:, c + h * d:c + (h + 1) * d] = dk_l[h]
                    dqkv_ref[:, 2 * c + h * d:2 * c + (h + 1) * d] = dv_l[h]
                dqkv = dqkv_ref[:]
                acc = acc_ref[:]
            dqkvw = dqkv.astype(xw.dtype)
            if fat:
                dqkv_slab_ref[:, :, wi * ww:(wi + 1) * ww, :] = (
                    dqkvw.reshape(wz, wh, ww, 3 * c))
                acc_slab_ref[:, :, wi * ww:(wi + 1) * ww, :] = (
                    acc.reshape(wz, wh, ww, c))
                a_dbqkv += jnp.sum(dqkv, axis=0, keepdims=True)
            elif local:
                a_dwproj += _dot(acc, gw.astype(xw.dtype), ta=True)
                a_dbqkv += jnp.sum(dqkv, axis=0, keepdims=True)
                a_dwqkv += _dot(xw, dqkvw, ta=True)
            else:
                dwproj_ref[:] += _dot(acc, gw.astype(xw.dtype), ta=True)
                dbqkv_ref[:] += jnp.sum(dqkv, axis=0, keepdims=True)
                dwqkv_ref[:] += _dot(xw, dqkvw, ta=True)
            dx_ref[0, :, :, wi * ww:(wi + 1) * ww, :] = (
                _dot(dqkvw, wqkv_ref[:], tb=True)
                .astype(dx_ref.dtype).reshape(wz, wh, ww, c))

        if fat:
            # ONE deep dot per program: rows = wz*wh*W
            xs = x_ref[0].reshape(wz * wh * W, c)
            dq = dqkv_slab_ref[:].reshape(wz * wh * W, 3 * c)
            dwqkv_ref[:] += _dot(xs, dq, ta=True)
            ac = acc_slab_ref[:].reshape(wz * wh * W, c)
            gs = g_ref[0].reshape(wz * wh * W, c)
            dwproj_ref[:] += _dot(ac, gs, ta=True)
        if local:
            dbias_ref[0] += a_dbias.reshape(heads, t, t)
            dbqkv_ref[:] += a_dbqkv
            dbproj_ref[:] += a_dbproj
            if not fat:
                dwqkv_ref[:] += a_dwqkv
                dwproj_ref[:] += a_dwproj

    if nw > 1:
        return _make_multi_kernel(variant, nw, fat)
    return kernel


def _make_multi_kernel(variant: str, nw: int, fat: bool):
    """pair/tri(_fat): nw lon-windows per iteration. Row-wise dots run at
    M = nw*t; the (t, t) score path stays per-window on slices of the fat
    qkv/dacc. Always values-based with local accumulators."""
    wz, wh, ww = WINDOW
    wn = W // ww
    t = wz * wh * ww
    c = C
    d = c // HEADS
    heads = HEADS
    scale = _scale()
    wwn = ww * nw
    tn = t * nw

    def kernel(x_ref, g_ref, wqkv_ref, bqkv_ref, wproj_ref, bias_ref,
               dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
               dbias_ref, *scratch):
        if fat:
            dqkv_slab_ref, acc_slab_ref = scratch
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

        a_dwqkv = jnp.zeros((c, 3 * c), jnp.float32)
        a_dbqkv = jnp.zeros((1, 3 * c), jnp.float32)
        a_dwproj = jnp.zeros((c, c), jnp.float32)
        a_dbproj = jnp.zeros((1, c), jnp.float32)
        a_dbias = jnp.zeros((heads * t, t), jnp.float32)

        for wi in range(wn // nw):
            lon0 = wi * wwn
            xw = x_ref[0, :, :, lon0:lon0 + wwn, :].reshape(tn, c)
            gw = (g_ref[0, :, :, lon0:lon0 + wwn, :]
                  .reshape(tn, c).astype(jnp.float32))
            a_dbproj += jnp.sum(gw, axis=0, keepdims=True)
            gww = gw.astype(xw.dtype)
            # fat row-wise dots: M = nw*t
            dacc_f = _dot(gww, wproj_ref[:], tb=True)            # (tn, c)
            qkv_f = (_dot(xw, wqkv_ref[:])
                     + bqkv_ref[:].astype(jnp.float32)).astype(xw.dtype)
            # lon index = j*ww + k within the slice, so (wwn) -> (nw, ww)
            # splits windows j-major
            qkv_r = qkv_f.reshape(wz, wh, nw, ww, 3 * c)
            dacc_r = dacc_f.reshape(wz, wh, nw, ww, c)
            dqkv_js, acc_js = [], []
            for j in range(nw):
                qkv_j = qkv_r[:, :, j].reshape(t, 3 * c)
                dacc_j = dacc_r[:, :, j].reshape(t, c)
                scores_l = []
                for h in range(heads):
                    qh = qkv_j[:, h * d:(h + 1) * d]
                    kh = qkv_j[:, c + h * d:c + (h + 1) * d]
                    scores_l.append(_dot(qh, kh, tb=True) * scale
                                    + bias_ref[0, h])
                S = jnp.concatenate(scores_l, axis=0)
                m = jnp.max(S, axis=-1, keepdims=True)
                p = jnp.exp(S - m)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                pw = p.astype(xw.dtype)
                dp_l, dv_l, acc_l = [], [], []
                for h in range(heads):
                    vh = qkv_j[:, 2 * c + h * d:2 * c + (h + 1) * d]
                    ph = pw[h * t:(h + 1) * t]
                    acc_l.append(_dot(ph, vh).astype(xw.dtype))
                    do = dacc_j[:, h * d:(h + 1) * d].astype(xw.dtype)
                    dp_l.append(_dot(do, vh, tb=True))
                    dv_l.append(_dot(ph, do, ta=True))
                DP = jnp.concatenate(dp_l, axis=0)
                DS = p * (DP - jnp.sum(DP * p, axis=-1, keepdims=True))
                a_dbias += DS
                DSw = DS.astype(xw.dtype)
                dq_l, dk_l = [], []
                for h in range(heads):
                    qh = qkv_j[:, h * d:(h + 1) * d]
                    kh = qkv_j[:, c + h * d:c + (h + 1) * d]
                    dsw = DSw[h * t:(h + 1) * t]
                    dq_l.append(_dot(dsw, kh) * scale)
                    dk_l.append(_dot(dsw, qh, ta=True) * scale)
                dqkv_j = jnp.concatenate(dq_l + dk_l + dv_l, axis=1)
                dqkv_js.append(dqkv_j.reshape(wz, wh, 1, ww, 3 * c))
                acc_js.append(jnp.concatenate(acc_l, axis=1)
                              .reshape(wz, wh, 1, ww, c))
            dqkv_f = jnp.concatenate(dqkv_js, axis=2).reshape(tn, 3 * c)
            acc_f = jnp.concatenate(acc_js, axis=2).reshape(tn, c)
            dqkvw = dqkv_f.astype(xw.dtype)
            if fat:
                dqkv_slab_ref[:, :, lon0:lon0 + wwn, :] = (
                    dqkvw.reshape(wz, wh, wwn, 3 * c))
                acc_slab_ref[:, :, lon0:lon0 + wwn, :] = (
                    acc_f.reshape(wz, wh, wwn, c))
                a_dbqkv += jnp.sum(dqkv_f, axis=0, keepdims=True)
            else:
                a_dwproj += _dot(acc_f, gww, ta=True)
                a_dbqkv += jnp.sum(dqkv_f, axis=0, keepdims=True)
                a_dwqkv += _dot(xw, dqkvw, ta=True)
            dx_ref[0, :, :, lon0:lon0 + wwn, :] = (
                _dot(dqkvw, wqkv_ref[:], tb=True)
                .astype(dx_ref.dtype).reshape(wz, wh, wwn, c))

        if fat:
            xs = x_ref[0].reshape(wz * wh * W, c)
            dq = dqkv_slab_ref[:].reshape(wz * wh * W, 3 * c)
            dwqkv_ref[:] += _dot(xs, dq, ta=True)
            ac = acc_slab_ref[:].reshape(wz * wh * W, c)
            gs = g_ref[0].reshape(wz * wh * W, c)
            dwproj_ref[:] += _dot(ac, gs, ta=True)
        else:
            dwqkv_ref[:] += a_dwqkv
            dwproj_ref[:] += a_dwproj
        dbias_ref[0] += a_dbias.reshape(heads, t, t)
        dbqkv_ref[:] += a_dbqkv
        dbproj_ref[:] += a_dbproj

    return kernel


def _variant_call(variant: str):
    """Build a backward-shaped pallas_call for the outer stage, mask-free."""
    wz, wh, ww = WINDOW
    zn, hn = Z // wz, HP // wh
    t = wz * wh * ww
    c = C
    grid = (zn, hn, B)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda zi, hi, bb: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    slab = pl.BlockSpec((1, wz, wh, W, c),
                        lambda zi, hi, bb: (bb, zi, hi, 0, 0),
                        memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, HEADS, t, t),
                             lambda zi, hi, bb: (zi * hn + hi, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [slab, slab, const_spec((c, 3 * c)), const_spec((1, 3 * c)),
                const_spec((c, c)), bias_spec]
    out_shapes = (
        jax.ShapeDtypeStruct((B, Z, HP, W, c), jnp.bfloat16),
        jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),
        jax.ShapeDtypeStruct((1, 3 * c), jnp.float32),
        jax.ShapeDtypeStruct((c, c), jnp.float32),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((zn * hn, HEADS, t, t), jnp.float32),
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
    scratch = []
    if variant in ("local_accum", "fat_wgrad"):
        scratch += [
            pltpu.VMEM((t, c), jnp.bfloat16),
            pltpu.VMEM((t, 3 * c), jnp.float32),
        ]
    if variant in ("fat_wgrad", "value_fat", "pair_fat", "tri_fat"):
        scratch += [
            pltpu.VMEM((wz, wh, W, 3 * c), jnp.bfloat16),
            pltpu.VMEM((wz, wh, W, c), jnp.bfloat16),
        ]
    kernel = _make_variant_kernel(variant)

    def call(x, g, wqkv, bqkv, wproj, bias):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, g, wqkv, bqkv, wproj, bias)

    return call


def _shipped_call():
    from pangu_tpu.ops.fused_block_attention import _backward_pallas

    def call(x, g, wqkv, bqkv, wproj, bias):
        return _backward_pallas(x, g=g, wqkv=wqkv, bqkv=bqkv, wproj=wproj,
                                bias=bias, mask=None, window=WINDOW,
                                heads=HEADS, scale=_scale())

    return call


def check_parity(variant: str, args) -> float:
    """max(|dx diff|, rel |dwqkv diff|) of the variant vs the shipped kernel."""
    ship = _shipped_call()
    var = _variant_call(variant)
    ref = jax.jit(ship)(*args)
    got = jax.jit(var)(*args)
    # shipped returns (dx, dwqkv-as-param-dtype, ...); variants return raw
    dxr = np.asarray(ref[0], np.float32)
    dxv = np.asarray(got[0], np.float32)
    dwr = np.asarray(ref[1], np.float32)
    dwv = np.asarray(got[1], np.float32)
    scale = max(np.abs(dwr).max(), 1e-6)
    return float(max(np.abs(dxr - dxv).max(),
                     np.abs(dwr - dwv).max() / scale))


def timeit(call, args, k_short=3, k_long=13, reps=5) -> float:
    """ms per backward call via the shared scan-chain methodology
    (x_{i+1} = x + eps*dx_i defeats CSE)."""

    def body(xc, rest):
        outs = call(xc, *rest)
        dx = outs[0]
        x2 = (xc + jnp.bfloat16(1e-6) * dx).astype(xc.dtype)
        return x2, jnp.sum(outs[1])

    return scan_timeit(call, args, body, k_short, k_long, reps)


def _make_args(rng):
    wz, wh, ww = WINDOW
    t = wz * wh * ww
    zn, hn = Z // wz, HP // wh
    return (
        jnp.asarray(rng.standard_normal((B, Z, HP, W, C)) * 0.1,
                    jnp.bfloat16),
        jnp.asarray(rng.standard_normal((B, Z, HP, W, C)) * 0.1,
                    jnp.bfloat16),
        jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.05, jnp.bfloat16),
        jnp.asarray(rng.standard_normal((1, 3 * C)) * 0.05, jnp.bfloat16),
        jnp.asarray(rng.standard_normal((C, C)) * 0.05, jnp.bfloat16),
        jnp.asarray(rng.standard_normal((zn * hn, HEADS, t, t)) * 0.01,
                    jnp.float32),
    )


def smoke() -> None:
    """CPU interpret-mode parity of every variant at a shrunken geometry
    (t stays 144 — fixed by the reference window — but one lat/lon slab),
    so schedule bugs are caught before any on-device minutes are spent."""
    global B, Z, HP, W, C, HEADS
    # W = 72 so wn = 6 divides by the pair (2) and tri (3) packings
    B, Z, HP, W, C, HEADS = 1, 2, 6, 72, 32, 2

    failures = 0
    with interpret_pallas():
        rng = np.random.default_rng(0)
        args = _make_args(rng)
        for v in VARIANTS[1:]:
            pd = check_parity(v, args)
            ok = pd <= 0.05
            failures += not ok
            print(json.dumps({f"{v}_smoke_parity_maxdiff": round(pd, 6),
                              "ok": ok}), flush=True)
    sys.exit(1 if failures else 0)


def main() -> None:
    if "--smoke" in sys.argv:
        smoke()
        return
    import bench

    bench._enable_compile_cache()
    # --skip-parity: the full-geometry parity jit is a separate multi-minute
    # remote compile per variant; interpret-mode parity (--smoke) already
    # covers the schedules, so timing sweeps can skip it and the winner gets
    # one on-device parity run before integration.
    skip_parity = "--skip-parity" in sys.argv
    variants = [a for a in sys.argv[1:] if not a.startswith("--")] or list(
        VARIANTS)
    rng = np.random.default_rng(0)
    args = _make_args(rng)
    out = {}
    for v in variants:
        try:
            if v != "shipped" and not skip_parity:
                pd = check_parity(v, args)
                print(json.dumps({f"{v}_parity_maxdiff": round(pd, 6)}),
                      flush=True)
                if pd > 0.05:
                    out[v] = f"parity FAIL ({pd:.4f})"
                    print(json.dumps({v: out[v]}), flush=True)
                    continue
            call = _shipped_call() if v == "shipped" else _variant_call(v)
            out[v] = round(timeit(call, args), 3)
        except Exception as e:
            out[v] = f"error: {e}"[:200]
        print(json.dumps({v: out[v]}), flush=True)
    print(json.dumps({"attn_bwd_ab_ms": out,
                      "device_kind": jax.devices()[0].device_kind}),
          flush=True)


if __name__ == "__main__":
    main()
