"""On-device A/B of attention FORWARD kernel score-dot schedules.

VERDICT r03 #3: the score dots contract over head_dim=32 (25% of the MXU's
128 lanes) and the per-head python loop issues 2*heads small (144, 144)
dots per lon-window. Round 3 already measured and rejected head-packing
(block-diagonal operand assembly costs more than the depth padding saves)
and backward lon-window packing via VMEM concat (25-28% loss from
relayouts). Two schedules remain untried:

  shipped   — ops/fused_block_attention.py::_make_kernel verbatim (no
              epilogue): per-lon-window loop, per-head score dots,
              stacked-head softmax, per-head pv dots.
  batched   — per lon-window, ONE batched dot_general over heads:
              q/k/v reshaped (t, heads, d) -> transposed (heads, t, d)
              (a relayout), scores (heads, t, t) in one MXU op group,
              3D softmax, one batched pv, transpose back. Tests whether
              Mosaic's batched matmul amortizes per-dot overhead enough
              to beat the assembly relayouts.
  dbl/quad  — 2/4 lon-windows per iteration WITHOUT any relayout: the
              contiguous (wz, wh, nw*ww, C) slice IS the fat window (its
              token order interleaves the nw windows ww-block-wise), so
              qkv/proj run at M = nw*t for free. Scores become ONE
              (nw*t, nw*t) dot per head with a HOST-precomputed
              interleaved bias that holds -1e9 on cross-window pairs:
              softmax then zeroes them exactly, and the pv dot
              (nw*t, nw*t) @ (nw*t, d) stays correct because zero
              attention weights kill the cross-window value rows.
              Cost: nw x the score FLOPs (cross-window quadrants are
              computed and thrown away) + nw x softmax transcendentals.
              Win: qkv/proj/pv M-tile utilization (144 rows = 56% of
              the 128-row MXU -> 288 = 72%+), per-window fixed cost /nw,
              and FEWER, FATTER score dots (2 x (288,32,288) tile-rows
              vs 4 x (144,32,144)). This is the VERDICT's
              "(2T x d)(d x 2T) block-diagonal mask trick" — the mask
              lives in the bias table, not in operand assembly.

Timing: K-step lax.scan chains of the full outer-stage forward with the
input perturbed by the previous output (defeats CSE), paired long/short
difference, median of reps — same methodology as bench_attn_bwd_ab.py.

Usage: python scripts/bench_attn_fwd_ab.py [variant ...] [--skip-parity]
       python scripts/bench_attn_fwd_ab.py --smoke   # CPU interpret parity
Prints one JSON line per variant (ms per forward call) plus a summary.
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

VARIANTS = ("shipped", "batched", "dbl", "quad")
_NW = {"dbl": 2, "quad": 4}
_NEG = -1e9


from ab_common import dot as _dot, interpret_pallas, scan_timeit  # noqa: E402


def _scale() -> float:
    return (C // HEADS) ** -0.5


def interleave_bias(bias: np.ndarray, nw: int, ww: int) -> np.ndarray:
    """(nT, heads, t, t) earth bias -> (nT, heads, nw*t, nw*t) bias for the
    interleaved nw-window token order of a contiguous (wz, wh, nw*ww, C)
    slice, with cross-window pairs set to -1e9 (exactly zero attention
    after softmax)."""
    n_types, heads, t, _ = bias.shape
    tn = nw * t
    idx = np.arange(tn)
    zh = idx // (nw * ww)
    r = idx % (nw * ww)
    win = r // ww
    tok = zh * ww + (r % ww)
    out = bias[:, :, tok[:, None], tok[None, :]].astype(np.float32)
    same = win[:, None] == win[None, :]
    return np.where(same[None, None], out, np.float32(_NEG))


def _make_kernel(variant: str):
    wz, wh, ww = WINDOW
    wn = W // ww
    t = wz * wh * ww
    c = C
    d = c // HEADS
    heads = HEADS
    scale = _scale()
    nw = _NW.get(variant, 1)
    if wn % nw:
        # 30 lon-windows at full geometry: nw=4 would cover only 28 and
        # leave the last 2 windows' output uninitialized — an invalid
        # kernel AND an invalid (undercounted) timing
        raise ValueError(f"{variant}: {wn} lon-windows not divisible "
                         f"by the {nw}-window packing")
    wwn = ww * nw
    tn = t * nw

    def kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref,
               out_ref, acc_ref):
        for wi in range(wn // nw):
            lon0 = wi * wwn
            xw = x_ref[0, :, :, lon0:lon0 + wwn, :].reshape(tn, c)
            qkv = (_dot(xw, wqkv_ref[:])
                   + bqkv_ref[:].astype(jnp.float32)).astype(xw.dtype)

            if variant == "batched":
                q = qkv[:, :c].reshape(t, heads, d).transpose(1, 0, 2)
                k = qkv[:, c:2 * c].reshape(t, heads, d).transpose(1, 0, 2)
                v = qkv[:, 2 * c:].reshape(t, heads, d).transpose(1, 0, 2)
                s = jax.lax.dot_general(
                    q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32) * scale
                s = s + bias_ref[0]                      # (heads, t, t)
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(qkv.dtype)
                o = jax.lax.dot_general(
                    p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # (heads, t, d)
                acc_ref[:t] = (o.transpose(1, 0, 2).reshape(t, c)
                               .astype(acc_ref.dtype))
            else:
                # shipped / dbl / quad: per-head dots at M = tn, stacked
                # softmax; for nw > 1 bias_ref is the interleaved table
                # with -1e9 cross-window pairs
                scores_l = []
                for h in range(heads):
                    qh = qkv[:, h * d:(h + 1) * d]
                    kh = qkv[:, c + h * d:c + (h + 1) * d]
                    scores_l.append(_dot(qh, kh, tb=True) * scale
                                    + bias_ref[0, h])
                S = jnp.concatenate(scores_l, axis=0)    # (heads*tn, tn)
                m = jnp.max(S, axis=-1, keepdims=True)
                p = jnp.exp(S - m)
                p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(qkv.dtype)
                for h in range(heads):
                    vh = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d]
                    acc_ref[:tn, h * d:(h + 1) * d] = jnp.dot(
                        p[h * tn:(h + 1) * tn], vh,
                        preferred_element_type=jnp.float32,
                    ).astype(acc_ref.dtype)

            y = (_dot(acc_ref[:tn], wproj_ref[:])
                 + bproj_ref[:].astype(jnp.float32))
            out_ref[0, :, :, lon0:lon0 + wwn, :] = (
                y.astype(out_ref.dtype).reshape(wz, wh, wwn, c))

    return kernel, tn


def _variant_call(variant: str):
    wz, wh, ww = WINDOW
    zn, hn = Z // wz, HP // wh
    t = wz * wh * ww
    c = C
    nw = _NW.get(variant, 1)
    tb = t * nw
    grid = (B, zn, hn)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda bb, zi, hi: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    slab = pl.BlockSpec((1, wz, wh, W, c),
                        lambda bb, zi, hi: (bb, zi, hi, 0, 0),
                        memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, HEADS, tb, tb),
                             lambda bb, zi, hi: (zi * hn + hi, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [slab, const_spec((c, 3 * c)), const_spec((1, 3 * c)),
                const_spec((c, c)), const_spec((1, c)), bias_spec]
    kernel, tn = _make_kernel(variant)

    def call(x, wqkv, bqkv, wproj, bproj, bias):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=slab,
            out_shape=jax.ShapeDtypeStruct((B, Z, HP, W, c), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((tn, c), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, wqkv, bqkv, wproj, bproj, bias)

    return call


def check_parity(variant: str, args, args_v, ref_cache: dict = None) -> float:
    """max|diff| of the variant vs the shipped kernel. ``ref_cache`` (one
    dict per sweep) keeps the shipped output so the full-geometry reference
    forward is traced+run ONCE, not once per variant — each re-run is a
    fresh jit through the slow tunnel."""
    if ref_cache is None:
        ref_cache = {}
    if "ref" not in ref_cache:
        ship = _variant_call("shipped")
        ref_cache["ref"] = np.asarray(jax.jit(ship)(*args), np.float32)
    var = _variant_call(variant)
    got = np.asarray(jax.jit(var)(*args_v), np.float32)
    return float(np.abs(ref_cache["ref"] - got).max())


def timeit(call, args, k_short=3, k_long=13, reps=5) -> float:
    """ms per forward call via the shared scan-chain methodology
    (x_{i+1} = x + eps*out_i defeats CSE)."""

    def body(xc, rest):
        out = call(xc, *rest)
        x2 = (xc + jnp.bfloat16(1e-3) * out).astype(xc.dtype)
        return x2, jnp.sum(out[0, 0, 0, 0, :8])

    return scan_timeit(call, args, body, k_short, k_long, reps)


def _make_args(rng):
    wz, wh, ww = WINDOW
    t = wz * wh * ww
    zn, hn = Z // wz, HP // wh
    bias = (rng.standard_normal((zn * hn, HEADS, t, t)) * 0.01
            ).astype(np.float32)
    base = (
        jnp.asarray(rng.standard_normal((B, Z, HP, W, C)) * 0.1,
                    jnp.bfloat16),
        jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.05, jnp.bfloat16),
        jnp.asarray(rng.standard_normal((1, 3 * C)) * 0.05, jnp.bfloat16),
        jnp.asarray(rng.standard_normal((C, C)) * 0.05, jnp.bfloat16),
        jnp.asarray(rng.standard_normal((1, C)) * 0.05, jnp.bfloat16),
    )
    biases = {1: jnp.asarray(bias)}
    for nw in sorted(set(_NW.values())):
        biases[nw] = jnp.asarray(interleave_bias(bias, nw, ww))
    return base, biases


def _args_for(variant, base, biases):
    return base + (biases[_NW.get(variant, 1)],)


def smoke() -> None:
    """CPU interpret-mode parity of every variant at a shrunken geometry
    (t stays 144 — fixed by the reference window — but one lat/lon slab)."""
    global B, Z, HP, W, C, HEADS
    # W = 96 so wn = 8 divides by both dbl (2) and quad (4)
    B, Z, HP, W, C, HEADS = 1, 2, 6, 96, 32, 2

    failures = 0
    with interpret_pallas():
        rng = np.random.default_rng(0)
        base, biases = _make_args(rng)
        args = _args_for("shipped", base, biases)
        ref_cache = {}
        for v in VARIANTS[1:]:
            pd = check_parity(v, args, _args_for(v, base, biases), ref_cache)
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
    skip_parity = "--skip-parity" in sys.argv
    variants = [a for a in sys.argv[1:] if not a.startswith("--")] or list(
        VARIANTS)
    rng = np.random.default_rng(0)
    base, biases = _make_args(rng)
    ship_args = _args_for("shipped", base, biases)
    out = {}
    ref_cache = {}
    for v in variants:
        args = _args_for(v, base, biases)
        try:
            if v != "shipped" and not skip_parity:
                pd = check_parity(v, ship_args, args, ref_cache)
                print(json.dumps({f"{v}_parity_maxdiff": round(pd, 6)}),
                      flush=True)
                if pd > 0.05:
                    out[v] = f"parity FAIL ({pd:.4f})"
                    print(json.dumps({v: out[v]}), flush=True)
                    continue
            out[v] = round(timeit(_variant_call(v), args), 3)
        except Exception as e:
            out[v] = f"error: {e}"[:200]
        print(json.dumps({v: out[v]}), flush=True)
    print(json.dumps({"attn_fwd_ab_ms": out,
                      "device_kind": jax.devices()[0].device_kind}),
          flush=True)


if __name__ == "__main__":
    main()
