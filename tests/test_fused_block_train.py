"""fused_earth_block_train (training block megakernel) — XLA-path checks.

On CPU the op routes to its XLA composition; these tests pin that path
against the UNFUSED training composition model/blocks.py falls back to
(fused_block_attention + fused_residual_postnorm + fused_mlp_postnorm),
both values and gradients — which validates the custom_vjp plumbing (16
primal args, None mask cotangent, scale grads). The Pallas fwd/bwd kernels
themselves are validated on device in tests/test_tpu_kernels.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pangu_tpu.ops.fused_block_attention import fused_block_attention
from pangu_tpu.ops.fused_block_train import fused_earth_block_train
from pangu_tpu.ops.fused_epilogue import fused_residual_postnorm
from pangu_tpu.ops.fused_mlp import fused_mlp_postnorm

# These tests pin the CPU/XLA composition path at fp32-tight tolerances.
# Under PANGU_TPU_TESTS=1 both sides route to bf16 Pallas kernels, whose
# parity is validated in tests/test_tpu_kernels.py at kernel-calibrated
# tolerances (relative-to-max 2e-2/3e-2) — the 2e-4 bounds here are a CPU
# contract, not a TPU one.
pytestmark = pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="XLA-composition-path contract; TPU kernel parity lives in "
           "test_tpu_kernels.py",
)

WINDOW = (2, 6, 12)
T = 144


def _inputs(rng, z=4, hp=12, w=24, c=16, heads=2, masked=True, b=2):
    nt = (z // 2) * (hp // 6)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    x = mk(b, z, hp, w, c)
    args = dict(
        x=x,
        wqkv=mk(c, 3 * c), bqkv=mk(3 * c),
        wproj=mk(c, c), bproj=mk(c),
        bias=mk(nt, heads, T, T),
        mask=(jnp.asarray(
            np.where(rng.uniform(size=(nt, T, T)) > 0.8, -100.0, 0.0),
            jnp.float32) if masked else None),
        ln1_s=1.0 + mk(c), ln1_b=mk(c),
        w1=mk(c, 4 * c), b1=mk(4 * c),
        w2=mk(4 * c, c), b2=mk(c),
        ln2_s=1.0 + mk(c), ln2_b=mk(c),
        s1=jnp.asarray(rng.uniform(0.5, 1.5, (b, 1)), jnp.float32),
        s2=jnp.asarray(rng.uniform(0.5, 1.5, (b, 1)), jnp.float32),
    )
    return args, (WINDOW, heads, (c // heads) ** -0.5)


def _unfused(a, statics):
    """The composition model/blocks.py uses when the megakernel steps aside."""
    window, heads, scale = statics
    x = a["x"]
    b = x.shape[0]
    attn = fused_block_attention(
        x, a["wqkv"], a["bqkv"], a["wproj"], a["bproj"], a["bias"],
        a["mask"], None, None, window, heads, scale)
    s1 = a["s1"].reshape((b,) + (1,) * (x.ndim - 1))
    x1 = fused_residual_postnorm(x, attn, a["ln1_s"], a["ln1_b"], s1)
    s2 = jnp.broadcast_to(a["s2"].reshape((b,) + (1,) * (x.ndim - 1)),
                          x.shape[:-1] + (1,))
    return fused_mlp_postnorm(x1, a["w1"], a["b1"], a["w2"], a["b2"],
                              a["ln2_s"], a["ln2_b"], s2)


def _fused(a, statics):
    return fused_earth_block_train(
        a["x"], a["wqkv"], a["bqkv"], a["wproj"], a["bproj"], a["bias"],
        a["mask"], a["ln1_s"], a["ln1_b"], a["w1"], a["b1"], a["w2"],
        a["b2"], a["ln2_s"], a["ln2_b"], a["s1"], a["s2"], *statics)


@pytest.mark.parametrize("masked", [False, True])
def test_forward_matches_unfused_composition(rng, masked):
    a, statics = _inputs(rng, masked=masked)
    got = np.asarray(_fused(a, statics))
    ref = np.asarray(_unfused(a, statics))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_gradients_match_unfused_composition(rng):
    a, statics = _inputs(rng)
    diff_keys = [k for k in a if k != "mask"]

    def loss(fn):
        def f(diff):
            full = dict(diff, mask=a["mask"])
            out = fn(full, statics)
            return jnp.sum(out * out)

        return f

    diff = {k: a[k] for k in diff_keys}
    g_fused = jax.grad(loss(_fused))(diff)
    g_unfused = jax.grad(loss(_unfused))(diff)
    for k in diff_keys:
        np.testing.assert_allclose(
            np.asarray(g_fused[k]), np.asarray(g_unfused[k]),
            rtol=2e-4, atol=2e-4, err_msg=k)


def test_droppath_zero_branch_kills_gradients(rng):
    """s1 = s2 = 0 (dropped branches) must zero every branch-weight grad and
    reduce dx to the identity path."""
    a, statics = _inputs(rng, masked=False, b=1)
    a["s1"] = jnp.zeros((1, 1), jnp.float32)
    a["s2"] = jnp.zeros((1, 1), jnp.float32)

    def f(x, w1):
        full = dict(a, x=x, w1=w1)
        return jnp.sum(_fused(full, statics))

    dx, dw1 = jax.grad(f, argnums=(0, 1))(a["x"], a["w1"])
    np.testing.assert_allclose(np.asarray(dx), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dw1), 0.0, atol=1e-7)
