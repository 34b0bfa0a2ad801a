"""Numerical parity of every layer against the reference PyTorch modules.

Each test instantiates the reference module with random weights, maps the
weights into the corresponding pangu_tpu module via the same transforms the
checkpoint importer uses, runs both on identical inputs, and compares.

The reference hardcodes full-longitude views in PatchEmbedding/UpSample/
PatchRecovery (models/layers.py:89-90,114,546,596), so those run at
lon=1440; attention/blocks/downsample accept any longitude and run reduced
(W=24 / W=12) to stay fast on CPU.
"""

import numpy as np
import pytest

from tests.conftest import requires_reference

pytestmark = requires_reference

ATOL = 3e-5


@pytest.fixture(scope="module")
def ref():
    from tests.ref_loader import load_reference_layers

    return load_reference_layers()


@pytest.fixture(scope="module")
def torch():
    import torch

    torch.manual_seed(0)
    return torch


def _narrow_cfg():
    """Full lat, narrow lon: matches the reference's hardcoded 124-type
    window tables (Z=8, Hpad=186/96) at 1/15 of the longitude cost."""
    from pangu_tpu.config import ModelConfig

    return ModelConfig(lon=96)  # w=24, w2=12 (both divisible by 12)


def test_shift_mask_parity(ref, torch):
    from pangu_tpu.config import ModelConfig
    from pangu_tpu.geometry import compute_geometry
    from pangu_tpu.model.attention import shift_attention_mask

    g = compute_geometry(_narrow_cfg())
    blk = ref.EarthSpecificBlock(dim=192, drop_path_ratio=0.0, heads=6, device="cpu")
    x = torch.zeros(1, 8, 186, g.w, 1)
    ref_mask = blk.gen_mask(x).numpy()  # (nLon, nT, 144, 144)
    mine = shift_attention_mask(g.outer)
    assert ref_mask.shape == (g.outer.n_lon_windows, 124, 144, 144)
    for lon_w in range(ref_mask.shape[0]):
        np.testing.assert_array_equal(mine, ref_mask[lon_w])


def _copy_attention(torch_attn, dim, heads, n_type, window):
    from pangu_tpu.model.attention import EarthAttention3D

    mine = EarthAttention3D(
        dim=dim, heads=heads, n_type_windows=n_type, tokens_per_window=144,
        window=window,
    )
    sd = {k: v.detach().numpy() for k, v in torch_attn.state_dict().items()}
    params = {
        "params": {
            "qkv": {"kernel": sd["linear1.weight"].T, "bias": sd["linear1.bias"]},
            "proj": {"kernel": sd["linear2.weight"].T, "bias": sd["linear2.bias"]},
            "earth_bias": sd["earth_specific_bias"][0],
        }
    }
    return mine, params


@pytest.mark.parametrize("which,dim,heads", [("outer", 192, 6), ("inner", 384, 12)])
def test_attention_parity(ref, torch, rng, which, dim, heads):
    from pangu_tpu.geometry import compute_geometry
    from pangu_tpu.model.attention import shift_attention_mask
    from pangu_tpu.ops.windows import window_partition

    g = compute_geometry(_narrow_cfg())
    stage = g.outer if which == "outer" else g.inner
    t_attn = ref.EarthAttention3D(dim, heads, 0.0, (2, 6, 12), device="cpu").eval()
    mine, params = _copy_attention(
        t_attn, dim, heads, stage.n_type_windows, stage.window
    )

    # my module consumes the padded grid; the reference consumes windows
    x_grid = rng.standard_normal(
        (1, stage.z, stage.h_pad, stage.w, dim)
    ).astype(np.float32)
    xw = np.asarray(window_partition(x_grid, stage.window))  # (1,nW,nT,T,C)
    x_ref = xw[0]

    with torch.no_grad():
        ref_out = t_attn(torch.from_numpy(x_ref), None).numpy()
    got_grid = mine.apply(params, x_grid, None)
    got = np.asarray(window_partition(got_grid, stage.window))[0]
    np.testing.assert_allclose(got, ref_out, atol=ATOL)

    # shifted path with mask
    mask = shift_attention_mask(stage)
    t_mask = torch.from_numpy(
        np.broadcast_to(
            mask[None], (stage.n_lon_windows,) + mask.shape
        ).copy()
    )
    with torch.no_grad():
        ref_out = t_attn(torch.from_numpy(x_ref), t_mask).numpy()
    got_grid = mine.apply(params, x_grid, mask)
    got = np.asarray(window_partition(got_grid, stage.window))[0]
    np.testing.assert_allclose(got, ref_out, atol=ATOL)


def _block_params_from_torch(blk):
    sd = {k: v.detach().numpy() for k, v in blk.state_dict().items()}
    return {
        "params": {
            "norm1": {"scale": sd["norm1.weight"], "bias": sd["norm1.bias"]},
            "norm2": {"scale": sd["norm2.weight"], "bias": sd["norm2.bias"]},
            "mlp": {
                "fc1": {"kernel": sd["linear.linear1.weight"].T,
                        "bias": sd["linear.linear1.bias"]},
                "fc2": {"kernel": sd["linear.linear2.weight"].T,
                        "bias": sd["linear.linear2.bias"]},
            },
            "attn": {
                "qkv": {"kernel": sd["attention.linear1.weight"].T,
                        "bias": sd["attention.linear1.bias"]},
                "proj": {"kernel": sd["attention.linear2.weight"].T,
                         "bias": sd["attention.linear2.bias"]},
                "earth_bias": sd["attention.earth_specific_bias"][0],
            },
        }
    }


@pytest.mark.parametrize("which,dim,heads,shifted", [
    ("outer", 192, 6, False),
    ("outer", 192, 6, True),
    ("inner", 384, 12, False),
    ("inner", 384, 12, True),
])
def test_block_parity(ref, torch, rng, which, dim, heads, shifted):
    from pangu_tpu.geometry import compute_geometry
    from pangu_tpu.model.blocks import EarthSpecificBlock

    g = compute_geometry(_narrow_cfg())
    stage = g.outer if which == "outer" else g.inner

    blk = ref.EarthSpecificBlock(dim=dim, drop_path_ratio=0.0, heads=heads,
                                 device="cpu").eval()
    params = _block_params_from_torch(blk)
    mine = EarthSpecificBlock(stage=stage, dim=dim, heads=heads,
                              drop_path_rate=0.0, shifted=shifted)

    x = rng.standard_normal((1, stage.z, stage.h, stage.w, dim)).astype(np.float32)
    x_flat = x.reshape(1, -1, dim)
    with torch.no_grad():
        ref_out = blk(
            torch.from_numpy(x_flat), stage.z, stage.h, stage.w, shifted
        ).numpy()
    # the block consumes/produces the window-padded grid (layer pads/crops)
    xp = np.pad(x, ((0, 0), (0, 0), (0, stage.h_pad - stage.h), (0, 0), (0, 0)))
    got = np.asarray(mine.apply(params, xp))[:, :, : stage.h].reshape(1, -1, dim)
    np.testing.assert_allclose(got, ref_out, atol=ATOL)


def test_downsample_parity(ref, torch, rng):
    from pangu_tpu.geometry import compute_geometry
    from pangu_tpu.model.blocks import DownSample

    g = compute_geometry(_narrow_cfg())
    t_ds = ref.DownSample(192).eval()
    sd = {k: v.detach().numpy() for k, v in t_ds.state_dict().items()}
    params = {"params": {
        "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
        "reduction": {"kernel": sd["linear.weight"].T},
    }}
    mine = DownSample(192, g.h_down_pad)

    x = rng.standard_normal((1, g.z, g.h, g.w, 192)).astype(np.float32)
    with torch.no_grad():
        ref_out = t_ds(torch.from_numpy(x.reshape(1, -1, 192)), g.z, g.h, g.w).numpy()
    got = np.asarray(mine.apply(params, x)).reshape(1, -1, 384)
    np.testing.assert_allclose(got, ref_out, atol=ATOL)


@pytest.mark.slow
def test_upsample_parity(ref, torch, rng):
    """Full geometry — the reference hardcodes view(B, 8, 91, 180, ...)."""
    from pangu_tpu.config import ModelConfig
    from pangu_tpu.geometry import compute_geometry
    from pangu_tpu.model.blocks import UpSample

    g = compute_geometry(ModelConfig())
    t_us = ref.UpSample(384, 192).eval()
    sd = {k: v.detach().numpy() for k, v in t_us.state_dict().items()}
    params = {"params": {
        "expand": {"kernel": sd["linear1.weight"].T},
        "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
        "mix": {"kernel": sd["linear2.weight"].T},
    }}
    mine = UpSample(384, 192, g.h)

    x = rng.standard_normal((1, g.z, g.h2, g.w2, 384)).astype(np.float32)
    with torch.no_grad():
        ref_out = t_us(torch.from_numpy(x.reshape(1, -1, 384))).numpy()
    got = np.asarray(mine.apply(params, x)).reshape(1, -1, 192)
    np.testing.assert_allclose(got, ref_out, atol=ATOL)


@pytest.mark.slow
def test_patch_embed_parity(ref, torch, rng):
    """Full geometry — the reference hardcodes view(..., 181, 360)."""
    import jax.numpy as jnp

    from pangu_tpu.aux import AuxConstants, synthetic_aux_constants
    from pangu_tpu.config import ModelConfig, TrainConfig
    from pangu_tpu.geometry import compute_geometry
    from pangu_tpu.model.embeddings import PatchEmbedding

    cfg = ModelConfig()
    g = compute_geometry(cfg)

    t_embed = ref.PatchEmbedding_pretrain((2, 4, 4), 192).eval()
    sd = {k: v.detach().numpy() for k, v in t_embed.state_dict().items()}
    params = {"params": {
        "proj_upper": {"kernel": sd["conv.weight"][:, :, 0].T,
                       "bias": sd["conv.bias"]},
        "proj_surface": {"kernel": sd["conv_surface.weight"][:, :, 0].T,
                         "bias": sd["conv_surface.bias"]},
    }}

    # reference-orientation statistics
    s_mean = rng.standard_normal(4).astype(np.float32)
    s_std = (1.0 + rng.uniform(0.5, 1.5, 4)).astype(np.float32)
    u_mean = rng.standard_normal((13, 1, 1, 5)).astype(np.float32)
    u_std = (1.0 + rng.uniform(0.5, 1.5, (13, 1, 1, 5))).astype(np.float32)
    masks = rng.standard_normal((1, 3, 724, 1440)).astype(np.float32)
    const_h = rng.standard_normal((1, 1, 1, 13, 721, 1440)).astype(np.float32)

    aux = synthetic_aux_constants(cfg, TrainConfig())
    aux.surface_mean = s_mean.reshape(1, 4, 1, 1)
    aux.surface_std = s_std.reshape(1, 4, 1, 1)
    # canonical = level-flipped, (1, V, L, 1, 1) (see pangu_tpu.aux docstring)
    aux.upper_mean = np.transpose(u_mean[::-1], (1, 3, 0, 2))[..., None]
    aux.upper_std = np.transpose(u_std[::-1], (1, 3, 0, 2))[..., None]
    aux.surface_mask = masks[0]
    aux.const_h = const_h.reshape(1, 13, 721, 1440)

    upper = rng.standard_normal((1, 5, 13, 721, 1440)).astype(np.float32)
    surface = rng.standard_normal((1, 4, 721, 1440)).astype(np.float32)

    stats = tuple(torch.from_numpy(a) for a in (s_mean, s_std, u_mean, u_std))
    with torch.no_grad():
        ref_out = t_embed(
            torch.from_numpy(upper), torch.from_numpy(surface), stats,
            torch.from_numpy(masks), torch.from_numpy(const_h),
        ).numpy()

    mine = PatchEmbedding(cfg, g)
    got = np.asarray(mine.apply(params, upper, surface, aux))
    got = got.reshape(1, -1, 192)
    np.testing.assert_allclose(got, ref_out, atol=ATOL)


@pytest.mark.slow
def test_patch_recovery_parity(ref, torch, rng):
    """Full geometry — the reference hardcodes the 14/724/1440 reshape."""
    from pangu_tpu.config import ModelConfig
    from pangu_tpu.geometry import compute_geometry
    from pangu_tpu.model.embeddings import PatchRecovery

    cfg = ModelConfig()
    g = compute_geometry(cfg)
    t_rec = ref.PatchRecovery_pretrain(384).eval()
    sd = {k: v.detach().numpy() for k, v in t_rec.state_dict().items()}
    params = {"params": {
        "head_upper": {"kernel": sd["conv.weight"][:, :, 0].T,
                       "bias": sd["conv.bias"]},
        "head_surface": {"kernel": sd["conv_surface.weight"][:, :, 0].T,
                         "bias": sd["conv_surface.bias"]},
    }}
    mine = PatchRecovery(cfg, g)

    x = rng.standard_normal((1, g.z, g.h, g.w, 384)).astype(np.float32)
    with torch.no_grad():
        ref_u, ref_s = t_rec(
            torch.from_numpy(x.reshape(1, -1, 384)), g.z, g.h, g.w
        )
    got_u, got_s = mine.apply(params, x)
    np.testing.assert_allclose(np.asarray(got_u), ref_u.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(got_s), ref_s.numpy(), atol=ATOL)
