"""On-device validation of the fused Pallas kernels against their XLA
reference formulas. Requires a real TPU:

    PANGU_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -q

(The default test run pins the CPU backend, where the kernels fall back to
XLA and these comparisons would be vacuous.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="needs a TPU backend (run with PANGU_TPU_TESTS=1)",
)


@pytest.mark.parametrize("z,hp,w,c,heads", [
    (8, 186, 48, 192, 6),
    (8, 96, 24, 384, 12),
])
@pytest.mark.parametrize("masked", [False, True])
def test_fused_block_attention_matches_xla(rng, z, hp, w, c, heads, masked):
    from pangu_tpu.ops.fused_block_attention import (
        _xla_reference,
        fused_block_attention,
    )

    window = (2, 6, 12)
    nt = (z // 2) * (hp // 6)
    x = jnp.asarray(rng.standard_normal((1, z, hp, w, c)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.05, jnp.bfloat16)
    bqkv = jnp.asarray(rng.standard_normal((3 * c,)) * 0.01, jnp.bfloat16)
    wproj = jnp.asarray(rng.standard_normal((c, c)) * 0.05, jnp.bfloat16)
    bproj = jnp.asarray(rng.standard_normal((c,)) * 0.01, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((nt, heads, 144, 144)) * 0.02,
                       jnp.float32)
    mask = None
    ln_s = ln_b = None
    if masked:
        mask = jnp.asarray(
            np.where(rng.uniform(size=(nt, 144, 144)) > 0.8, -100.0, 0.0),
            jnp.float32,
        )
        ln_s = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c), jnp.float32)
        ln_b = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)

    scale = (c // heads) ** -0.5
    got = jax.jit(
        lambda *a: fused_block_attention(*a, window, heads, scale)
    )(x, wqkv, bqkv, wproj, bproj, bias, mask, ln_s, ln_b)
    ref = jax.jit(
        lambda *a: _xla_reference(*a[:7], window, heads, scale,
                                  ln_scale=a[7], ln_bias=a[8])
    )(x, wqkv, bqkv, wproj, bproj, bias, mask, ln_s, ln_b)
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    denom = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / denom < 2e-2  # bf16 reorder tolerance


@pytest.mark.parametrize("z,hp,w,c,heads", [
    (8, 186, 48, 192, 6),
    (8, 96, 24, 384, 12),
])
@pytest.mark.parametrize("masked", [False, True])
def test_flash_backward_matches_xla(rng, z, hp, w, c, heads, masked):
    """The Pallas flash backward (scores recomputed per window) must agree
    with the XLA-formula gradients for every input (VERDICT r1 #3)."""
    from pangu_tpu.ops.fused_block_attention import (
        _xla_reference,
        fused_block_attention,
    )

    window = (2, 6, 12)
    nt = (z // 2) * (hp // 6)
    x = jnp.asarray(rng.standard_normal((1, z, hp, w, c)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.05, jnp.bfloat16)
    bqkv = jnp.asarray(rng.standard_normal((3 * c,)) * 0.01, jnp.bfloat16)
    wproj = jnp.asarray(rng.standard_normal((c, c)) * 0.05, jnp.bfloat16)
    bproj = jnp.asarray(rng.standard_normal((c,)) * 0.01, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((nt, heads, 144, 144)) * 0.02,
                       jnp.float32)
    mask = None
    if masked:
        mask = jnp.asarray(
            np.where(rng.uniform(size=(nt, 144, 144)) > 0.8, -100.0, 0.0),
            jnp.float32,
        )
    scale = (c // heads) ** -0.5

    def loss_pallas(x, wqkv, bqkv, wproj, bproj, bias):
        o = fused_block_attention(x, wqkv, bqkv, wproj, bproj, bias, mask,
                                  None, None, window, heads, scale)
        return jnp.sum(jnp.cos(o.astype(jnp.float32)))

    def loss_xla(x, wqkv, bqkv, wproj, bproj, bias):
        o = _xla_reference(x, wqkv, bqkv, wproj, bproj, bias, mask,
                           window, heads, scale)
        return jnp.sum(jnp.cos(o.astype(jnp.float32)))

    args = (x, wqkv, bqkv, wproj, bproj, bias)
    gp = jax.jit(jax.grad(loss_pallas, argnums=tuple(range(6))))(*args)
    gx = jax.jit(jax.grad(loss_xla, argnums=tuple(range(6))))(*args)
    for name, a, b in zip(("dx", "dwqkv", "dbqkv", "dwproj", "dbproj",
                           "dbias"), gp, gx):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = np.abs(b).max() + 1e-9
        assert np.abs(a - b).max() / denom < 2e-2, name


@pytest.mark.parametrize("z,hp,w,c,heads", [
    (8, 186, 48, 192, 6),
    (8, 96, 24, 384, 12),
])
@pytest.mark.parametrize("masked", [False, True])
def test_block_megakernel_matches_xla(rng, z, hp, w, c, heads, masked):
    """The whole-block megakernel (attention + both post-norm residuals +
    MLP in one Pallas program) must match the XLA block formula."""
    from pangu_tpu.ops.fused_block_attention import (
        _xla_block_reference,
        fused_earth_block,
    )

    window = (2, 6, 12)
    nt = (z // 2) * (hp // 6)
    x = jnp.asarray(rng.standard_normal((1, z, hp, w, c)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.05, jnp.bfloat16)
    bqkv = jnp.asarray(rng.standard_normal((3 * c,)) * 0.01, jnp.bfloat16)
    wproj = jnp.asarray(rng.standard_normal((c, c)) * 0.05, jnp.bfloat16)
    bproj = jnp.asarray(rng.standard_normal((c,)) * 0.01, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((nt, heads, 144, 144)) * 0.02,
                       jnp.float32)
    ln1 = (jnp.asarray(1.0 + 0.1 * rng.standard_normal(c), jnp.float32),
           jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32))
    ln2 = (jnp.asarray(1.0 + 0.1 * rng.standard_normal(c), jnp.float32),
           jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32))
    w1 = jnp.asarray(rng.standard_normal((c, 4 * c)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal((4 * c,)) * 0.01, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((4 * c, c)) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal((c,)) * 0.01, jnp.bfloat16)
    mask = None
    if masked:
        mask = jnp.asarray(
            np.where(rng.uniform(size=(nt, 144, 144)) > 0.8, -100.0, 0.0),
            jnp.float32,
        )
    scale = (c // heads) ** -0.5

    got = jax.jit(lambda *a: fused_earth_block(
        *a, window, heads, scale))(x, wqkv, bqkv, wproj, bproj, bias, mask,
                                   ln1[0], ln1[1], w1, b1, w2, b2,
                                   ln2[0], ln2[1])
    ref = jax.jit(lambda *a: _xla_block_reference(
        *a, window, heads, scale))(x, wqkv, bqkv, wproj, bproj, bias, mask,
                                   ln1[0], ln1[1], w1, b1, w2, b2,
                                   ln2[0], ln2[1])
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    denom = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / denom < 2e-2


def test_fused_mlp_matches_xla(rng):
    from pangu_tpu.ops.fused_mlp import _xla_reference, fused_mlp_block

    rows, c = 1440 * 4, 192
    x = jnp.asarray(rng.standard_normal((rows, c)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((c, 4 * c)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal((4 * c,)) * 0.01, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((4 * c, c)) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal((c,)) * 0.01, jnp.bfloat16)
    s = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c), jnp.float32)
    t = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)

    got = np.asarray(jax.jit(fused_mlp_block)(x, w1, b1, w2, b2, s, t), np.float32)
    ref = np.asarray(_xla_reference(x, w1, b1, w2, b2, s, t), np.float32)
    denom = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / denom < 2e-2


def test_onehot_patchify_matches_reshape(rng):
    import pangu_tpu.model.embeddings as emb_mod
    from pangu_tpu.aux import synthetic_aux_constants
    from pangu_tpu.config import ModelConfig, TrainConfig
    from pangu_tpu.geometry import compute_geometry
    from pangu_tpu.model.embeddings import PatchEmbedding

    cfg = ModelConfig()
    g = compute_geometry(cfg)
    aux = synthetic_aux_constants(cfg, TrainConfig())
    upper = rng.standard_normal((1, 5, 13, 721, 1440)).astype(np.float32)
    surface = rng.standard_normal((1, 4, 721, 1440)).astype(np.float32)
    emb = PatchEmbedding(cfg, g, compute_dtype=jnp.bfloat16)
    params = emb.init(jax.random.PRNGKey(0), upper, surface, aux)
    out1 = jax.jit(lambda u, s: emb.apply(params, u, s, aux))(upper, surface)
    orig = emb_mod._use_onehot
    try:
        emb_mod._use_onehot = lambda d: False
        out2 = jax.jit(lambda u, s: emb.apply(params, u, s, aux))(upper, surface)
    finally:
        emb_mod._use_onehot = orig
    d = np.abs(np.asarray(out1, np.float32) - np.asarray(out2, np.float32)).max()
    assert d < 1e-2


@pytest.mark.parametrize("rows,c", [(1440 * 4, 192), (720 * 4, 384)])
def test_fused_residual_postnorm_grads_match_xla(rng, rows, c):
    """The attention-side training epilogue — shortcut + s*LN(a) as one
    Pallas program each way — must agree with the XLA chain, values and
    every gradient (round-3 lever)."""
    from pangu_tpu.ops.fused_epilogue import _res_xla, fused_residual_postnorm

    sh = jnp.asarray(rng.standard_normal((rows, c)), jnp.bfloat16)
    a = jnp.asarray(rng.standard_normal((rows, c)), jnp.bfloat16)
    ls = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c), jnp.float32)
    lb = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
    sc = jnp.asarray(
        np.where(rng.uniform(size=(rows, 1)) > 0.3, 1.0 / 0.7, 0.0),
        jnp.float32,
    )

    args = (sh, a, ls, lb, sc)
    got = np.asarray(jax.jit(fused_residual_postnorm)(*args), np.float32)
    ref = np.asarray(_res_xla(sh, a, ls, lb, sc), np.float32)
    denom = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / denom < 2e-2

    def loss_pallas(*a_):
        return jnp.sum(jnp.cos(
            fused_residual_postnorm(*a_, sc).astype(jnp.float32)))

    def loss_xla(*a_):
        return jnp.sum(jnp.cos(_res_xla(*a_, sc).astype(jnp.float32)))

    gp = jax.jit(jax.grad(loss_pallas, argnums=tuple(range(4))))(*args[:4])
    gx = jax.jit(jax.grad(loss_xla, argnums=tuple(range(4))))(*args[:4])
    for name, a_, b_ in zip(("dsh", "da", "dls", "dlb"), gp, gx):
        a_ = np.asarray(a_, np.float32)
        b_ = np.asarray(b_, np.float32)
        denom = np.abs(b_).max() + 1e-9
        # 3e-2: both sides are bf16 chains (neither is ground truth) and the
        # cos test loss amplifies value-rounding into the cotangent; worst
        # case observed across session-rng draws is ~3.5 bf16 ulps of the
        # max magnitude (0.027).
        assert np.abs(a_ - b_).max() / denom < 3e-2, name


@pytest.mark.parametrize("rows,c", [(1440 * 4, 192), (720 * 4, 384)])
def test_fused_mlp_postnorm_grads_match_xla(rng, rows, c):
    """The whole training block tail — x + s*LN(mlp(x)) with a per-row
    stochastic-depth scale — as one Pallas program each way must agree with
    the XLA composition, values and every gradient (round-3 lever)."""
    from pangu_tpu.ops.fused_mlp import _postnorm_xla, fused_mlp_postnorm

    x = jnp.asarray(rng.standard_normal((rows, c)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((c, 4 * c)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal((4 * c,)) * 0.01, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((4 * c, c)) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal((c,)) * 0.01, jnp.bfloat16)
    ls = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c), jnp.float32)
    lb = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
    # droppath-like mix of kept (1/keep) and dropped (0) rows
    sc = jnp.asarray(
        np.where(rng.uniform(size=(rows, 1)) > 0.3, 1.0 / 0.7, 0.0),
        jnp.float32,
    )

    args = (x, w1, b1, w2, b2, ls, lb, sc)
    got = np.asarray(jax.jit(fused_mlp_postnorm)(*args), np.float32)
    ref = np.asarray(_postnorm_xla(*args), np.float32)
    denom = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / denom < 2e-2

    def loss_pallas(*a):
        return jnp.sum(jnp.cos(fused_mlp_postnorm(*a, sc).astype(jnp.float32)))

    def loss_xla(*a):
        return jnp.sum(jnp.cos(_postnorm_xla(*a, sc).astype(jnp.float32)))

    gp = jax.jit(jax.grad(loss_pallas, argnums=tuple(range(7))))(*args[:7])
    gx = jax.jit(jax.grad(loss_xla, argnums=tuple(range(7))))(*args[:7])
    for name, a, b in zip(("dx", "dw1", "db1", "dw2", "db2", "dls", "dlb"),
                          gp, gx):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = np.abs(b).max() + 1e-9
        assert np.abs(a - b).max() / denom < 2e-2, name


@pytest.mark.parametrize("rows,c", [(1440 * 4, 192), (720 * 4, 384)])
def test_fused_mlp_raw_grads_match_xla(rng, rows, c):
    """The raw-MLP flash backward (hidden recomputed in VMEM) must agree
    with the XLA einsum-chain gradients (round-3 train-step lever)."""
    from pangu_tpu.ops.fused_mlp import _raw_xla, fused_mlp

    x = jnp.asarray(rng.standard_normal((rows, c)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((c, 4 * c)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal((4 * c,)) * 0.01, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((4 * c, c)) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal((c,)) * 0.01, jnp.bfloat16)

    got = np.asarray(jax.jit(fused_mlp)(x, w1, b1, w2, b2), np.float32)
    ref = np.asarray(_raw_xla(x, w1, b1, w2, b2), np.float32)
    denom = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / denom < 2e-2

    def loss_pallas(*a):
        return jnp.sum(jnp.cos(fused_mlp(*a).astype(jnp.float32)))

    def loss_xla(*a):
        return jnp.sum(jnp.cos(_raw_xla(*a).astype(jnp.float32)))

    args = (x, w1, b1, w2, b2)
    gp = jax.jit(jax.grad(loss_pallas, argnums=tuple(range(5))))(*args)
    gx = jax.jit(jax.grad(loss_xla, argnums=tuple(range(5))))(*args)
    for name, a, b in zip(("dx", "dw1", "db1", "dw2", "db2"), gp, gx):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = np.abs(b).max() + 1e-9
        assert np.abs(a - b).max() / denom < 2e-2, name


def _block_train_inputs(rng, z, hp, w, c, heads, masked, b=1):
    nt = (z // 2) * (hp // 6)
    mk = lambda s, scl: jnp.asarray(rng.standard_normal(s) * scl,
                                    jnp.bfloat16)
    args = dict(
        x=mk((b, z, hp, w, c), 0.5),
        wqkv=mk((c, 3 * c), 0.05), bqkv=mk((3 * c,), 0.01),
        wproj=mk((c, c), 0.05), bproj=mk((c,), 0.01),
        bias=jnp.asarray(rng.standard_normal((nt, heads, 144, 144)) * 0.02,
                         jnp.float32),
        mask=(jnp.asarray(
            np.where(rng.uniform(size=(nt, 144, 144)) > 0.8, -100.0, 0.0),
            jnp.float32) if masked else None),
        ln1_s=jnp.asarray(1.0 + 0.1 * rng.standard_normal(c), jnp.float32),
        ln1_b=jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32),
        w1=mk((c, 4 * c), 0.05), b1=mk((4 * c,), 0.01),
        w2=mk((4 * c, c), 0.05), b2=mk((c,), 0.01),
        ln2_s=jnp.asarray(1.0 + 0.1 * rng.standard_normal(c), jnp.float32),
        ln2_b=jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32),
        s1=jnp.asarray(rng.uniform(0.5, 1.5, (b, 1)), jnp.float32),
        s2=jnp.asarray(rng.uniform(0.5, 1.5, (b, 1)), jnp.float32),
    )
    order = ("x", "wqkv", "bqkv", "wproj", "bproj", "bias", "mask",
             "ln1_s", "ln1_b", "w1", "b1", "w2", "b2", "ln2_s", "ln2_b",
             "s1", "s2")
    return args, order, ((2, 6, 12), heads, (c // heads) ** -0.5)


@pytest.mark.parametrize("z,hp,w,c,heads", [
    (8, 186, 48, 192, 6),
    (8, 96, 24, 384, 12),
])
@pytest.mark.parametrize("masked", [False, True])
def test_block_train_forward_matches_xla(rng, z, hp, w, c, heads, masked):
    """The TRAINING block megakernel forward (with in-kernel stochastic-depth
    scales) must match the XLA block-train formula."""
    from pangu_tpu.ops.fused_block_train import (
        _xla_block_train,
        fused_earth_block_train,
    )

    a, order, statics = _block_train_inputs(rng, z, hp, w, c, heads, masked)
    args = [a[k] for k in order]
    got = jax.jit(lambda *v: fused_earth_block_train(*v, *statics))(*args)
    ref = jax.jit(lambda *v: _xla_block_train(*v, *statics))(*args)
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    denom = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / denom < 2e-2


@pytest.mark.parametrize("z,hp,w,c,heads", [
    (8, 186, 48, 192, 6),
    (8, 96, 24, 384, 12),
])
@pytest.mark.parametrize("masked", [False, True])
def test_block_train_backward_matches_xla(rng, z, hp, w, c, heads, masked):
    """The flash block backward (whole block recomputed per window-slab in
    VMEM) must agree with the XLA-formula gradients for EVERY input,
    including the LayerNorm params and the droppath branch scales."""
    from pangu_tpu.ops.fused_block_train import (
        _xla_block_train,
        fused_earth_block_train,
    )

    a, order, statics = _block_train_inputs(rng, z, hp, w, c, heads, masked)
    diff = [k for k in order if k != "mask"]

    def mk_loss(fn):
        def loss(*dargs):
            full = dict(zip(diff, dargs), mask=a["mask"])
            o = fn(*[full[k] for k in order], *statics)
            return jnp.sum(jnp.cos(o.astype(jnp.float32)))

        return loss

    args = [a[k] for k in diff]
    gp = jax.jit(jax.grad(mk_loss(fused_earth_block_train),
                          argnums=tuple(range(len(diff)))))(*args)
    gx = jax.jit(jax.grad(mk_loss(_xla_block_train),
                          argnums=tuple(range(len(diff)))))(*args)
    for name, p, r in zip(diff, gp, gx):
        p = np.asarray(p, np.float32)
        r = np.asarray(r, np.float32)
        denom = np.abs(r).max() + 1e-9
        assert np.abs(p - r).max() / denom < 3e-2, name
