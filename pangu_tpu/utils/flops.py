"""Analytic matmul-FLOP counts and MFU for the Pangu backbone.

Counts multiply-accumulate FLOPs (2 per MAC) of every ``dot_general`` the
forward pass executes, derived statically from :class:`ModelConfig` via
:func:`compute_geometry` — no tracing, no compilation. The count mirrors the
actual execution geometry:

* every transformer block (qkv / scores / pv / proj / MLP) runs on the
  *window-padded* token grid ``z * h_pad * w`` (EarthSpecificLayer pads
  latitude once per stage, blocks.py:183-212), so padded tokens are counted
  as model FLOPs — the reference pads identically
  (reference models/layers.py:178-185), it is part of the architecture;
* attention scores/pv are per-window ``(T, d) x (d, T)`` dots summed over
  heads: ``2 * n_windows * T^2 * C`` each;
* elementwise work (LayerNorm, softmax, GELU, bias, normalization) is NOT
  counted — the standard matmul-only MFU convention.

Exactness is tested by summing the dot_general FLOPs of the traced jaxpr
(tests/test_flops.py): on the f32/XLA path the analytic total matches the
trace to the FLOP.

The train-step count uses the standard fwd+bwd = 3x convention (each matmul
has two backward matmuls of the same shape). Rematerialization recompute is
NOT counted as model FLOPs, so achieved train MFU slightly understates
hardware utilization under remat — stated in docs/PERFORMANCE.md.
"""

from __future__ import annotations

from typing import Dict, Optional

from pangu_tpu.config import ModelConfig
from pangu_tpu.geometry import compute_geometry


def forward_matmul_flops(cfg: ModelConfig, batch: int = 1) -> Dict[str, float]:
    """Matmul FLOPs of one forward pass, by component plus ``total``."""
    g = compute_geometry(cfg)
    c0 = cfg.dims[0]

    out: Dict[str, float] = {}

    # Patch embedding: per-token projections of the patchified fields.
    surf_tokens = g.h * g.w
    upper_tokens = g.z_upper * g.h * g.w
    out["patch_embed"] = 2.0 * batch * (
        surf_tokens * cfg.embed_surface_channels * c0
        + upper_tokens * cfg.embed_upper_channels * c0
    )

    # Transformer stages (blocks run on the window-padded grid).
    stages = (g.outer, g.inner, g.inner, g.outer)
    attn = mlp = 0.0
    for st, depth, dim in zip(stages, cfg.depths, cfg.dims):
        tokens = st.z * st.h_pad * st.w
        n_win = st.n_type_windows * st.n_lon_windows
        t = st.tokens_per_window
        qkv = 2.0 * tokens * dim * 3 * dim
        scores = 2.0 * n_win * t * t * dim  # summed over heads (heads*d = C)
        pv = scores
        proj = 2.0 * tokens * dim * dim
        attn += batch * depth * (qkv + scores + pv + proj)
        mlp += batch * depth * 2.0 * (2.0 * tokens * dim * cfg.mlp_ratio * dim)
    out["attention"] = attn
    out["mlp"] = mlp

    # Down/up sampling between the outer and inner grids.
    half_tokens = g.z * g.h2 * g.w2
    out["downsample"] = 2.0 * batch * half_tokens * (4 * cfg.dims[0]) * cfg.dims[1]
    out["upsample"] = 2.0 * batch * (
        half_tokens * cfg.dims[2] * (4 * cfg.dims[3])
        + g.z * g.h * g.w * cfg.dims[3] * cfg.dims[3]  # mixing linear
    )

    # Patch recovery heads on the skip-concatenated (2C) stream.
    cin = cfg.dims[0] + cfg.dims[3]
    out["patch_recovery"] = 2.0 * batch * (
        upper_tokens * cin * cfg.recovery_upper_channels
        + surf_tokens * cin * cfg.recovery_surface_channels
    )

    out["total"] = sum(out.values())
    return out


def train_matmul_flops(cfg: ModelConfig, batch: int = 1) -> float:
    """Fwd+bwd+update matmul FLOPs per train step: the standard 3x-forward
    convention (two same-shape backward matmuls per forward matmul; the Adam
    update is elementwise and uncounted). Remat recompute is excluded."""
    return 3.0 * forward_matmul_flops(cfg, batch)["total"]


#: Peak dense bf16 matmul throughput per JAX device, FLOP/s. Sources: Google
#: Cloud TPU system-architecture docs (per-chip bf16 peak); v2/v3 entries are
#: per-core because JAX exposes one device per core there.
PEAK_BF16_FLOPS: Dict[str, float] = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,  # v5p
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,  # Trillium / v6e
    "TPU v6e": 918e12,
    "TPU v3": 61.5e12,  # per core (123 TFLOP/s per 2-core chip)
    "TPU v2": 22.5e12,  # per core
}


def peak_flops(device_kind: str) -> Optional[float]:
    """Peak bf16 FLOP/s for a ``jax.Device.device_kind``, None if unknown."""
    if device_kind in PEAK_BF16_FLOPS:
        return PEAK_BF16_FLOPS[device_kind]
    for key, val in PEAK_BF16_FLOPS.items():
        if device_kind.startswith(key):
            return val
    return None


def mfu(model_flops: float, step_time_s: float,
        device_kind: str, n_devices: int = 1) -> Optional[float]:
    """Model FLOPs utilization in [0, 1]; None when the peak is unknown."""
    peak = peak_flops(device_kind)
    if peak is None or step_time_s <= 0:
        return None
    return model_flops / (step_time_s * peak * n_devices)
