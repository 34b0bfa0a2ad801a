"""Auxiliary constants: normalization statistics, constant masks, loss weights.

Canonical orientations (simpler than the reference's dual-orientation dance in
era5_data/utils_data.py:395-442 — see note below):

  * ``upper_mean/std``:   (1, V, L, 1, 1) in *data level order* (the order of
    the ``(B, 5, 13, 721, 1440)`` tensors fed to the model).
  * ``surface_mean/std``: (1, V, 1, 1).
  * ``surface_mask``:     (3, lat+lat_pad, lon) — land/soil/topography-like
    constant fields already padded to the patch grid, matching the ONNX
    extraction ``constantMask{h}.npy`` (reference models/onnx2torch.py:60-89).
  * ``const_h``:          (1, levels, lat, lon) — the constant upper channel
    (ONNX ``Constant_17_output_0``; reference era5_data/utils_data.py:498-502).

Note on orientation parity: the reference's in-model normalization flips the
level axis, normalizes with raw-orientation stats, and flips back
(models/layers.py:95-99). That is mathematically identical to normalizing with
level-flipped stats — which is exactly its "output orientation"
(utils_data.py:408-418). So one canonical array serves both roles here; the
ONNX importer performs the flip once at conversion time.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import numpy as np

from pangu_tpu.config import ModelConfig, TrainConfig
from pangu_tpu.geometry import compute_geometry


@dataclass
class AuxConstants:
    """Pytree of constants consumed by the model and the loss/eval engines.

    Plays the role of the reference's ``loadAllConstants`` dict
    (era5_data/utils_data.py:515-528)."""

    surface_mean: np.ndarray  # (1, Vs, 1, 1)
    surface_std: np.ndarray  # (1, Vs, 1, 1)
    upper_mean: np.ndarray  # (1, Vu, L, 1, 1)
    upper_std: np.ndarray  # (1, Vu, L, 1, 1)
    surface_mask: np.ndarray  # (Cs_const, lat_padded, lon)
    const_h: np.ndarray  # (Cu_const, L, lat, lon)
    upper_weights: np.ndarray  # (1, Vu, 1, 1, 1)
    surface_weights: np.ndarray  # (1, Vs, 1, 1)
    upper_loss_weight: float = 1.0
    surface_loss_weight: float = 0.25
    custom_mask: Optional[np.ndarray] = None  # (lat, lon) region mask or None

    def astype(self, dtype) -> "AuxConstants":
        kw = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            kw[f.name] = v.astype(dtype) if isinstance(v, np.ndarray) else v
        return AuxConstants(**kw)


# Registered as a pytree so AuxConstants rides through jit/pjit as inputs.
_AUX_FIELDS = tuple(f.name for f in dataclasses.fields(AuxConstants))


def _aux_flatten(a: "AuxConstants"):
    return tuple(getattr(a, n) for n in _AUX_FIELDS), None


def _aux_unflatten(_, children):
    return AuxConstants(**dict(zip(_AUX_FIELDS, children)))


jax.tree_util.register_pytree_node(AuxConstants, _aux_flatten, _aux_unflatten)


def variable_weights(train: TrainConfig) -> Tuple[np.ndarray, np.ndarray, float, float]:
    """Broadcast-shaped per-variable loss weights
    (reference era5_data/utils_data.py:505-512)."""
    uw = np.asarray(train.upper_weights, np.float32).reshape(1, -1, 1, 1, 1)
    sw = np.asarray(train.surface_weights, np.float32).reshape(1, -1, 1, 1)
    return uw, sw, float(train.upper_loss_weight), float(train.surface_loss_weight)


def load_aux_constants(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    aux_dir: Optional[str] = None,
    horizon: int = 24,
) -> AuxConstants:
    """Load real constants from ``aux_dir`` if present, else synthesize.

    Real layout matches what our ONNX importer writes (interop/onnx_import.py),
    which mirrors the files the reference extracts from the official ONNX
    graphs (models/onnx2torch.py:60-89): surface_mean/std.npy, upper_mean/
    upper_std.npy, constantMask{h}.npy, Constant_17_output_0.npy and the
    optional custom_mask.npy.
    """
    if aux_dir and os.path.isdir(aux_dir):
        return _load_from_dir(model_cfg, train_cfg, aux_dir, horizon)
    return synthetic_aux_constants(model_cfg, train_cfg)


def _load_from_dir(
    model_cfg: ModelConfig, train_cfg: TrainConfig, aux_dir: str, horizon: int
) -> AuxConstants:
    g = compute_geometry(model_cfg)

    def rd(name):
        return np.load(os.path.join(aux_dir, name)).astype(np.float32)

    surface_mean = rd("surface_mean.npy").reshape(1, model_cfg.surface_vars, 1, 1)
    surface_std = rd("surface_std.npy").reshape(1, model_cfg.surface_vars, 1, 1)

    # Raw upper stats are stored (L, 1, 1, V) in ONNX/"input" orientation with
    # levels top-to-bottom; flip to data level order and move V forward
    # (reference era5_data/utils_data.py:408-418).
    um = rd("upper_mean.npy")
    us = rd("upper_std.npy")
    um = np.transpose(um[::-1], (1, 3, 0, 2))[..., None]  # (1, V, L, 1, 1)
    us = np.transpose(us[::-1], (1, 3, 0, 2))[..., None]

    surface_mask = rd(f"constantMask{horizon}.npy")
    surface_mask = surface_mask.reshape(
        model_cfg.surface_const_channels, *surface_mask.shape[-2:]
    )
    const_h = rd("Constant_17_output_0.npy")
    const_h = const_h.reshape(
        model_cfg.upper_const_channels, model_cfg.levels, model_cfg.lat, model_cfg.lon
    )

    custom_path = os.path.join(aux_dir, "custom_mask.npy")
    custom = np.load(custom_path).astype(np.float32) if os.path.exists(custom_path) else None

    uw, sw, ulw, slw = variable_weights(train_cfg)
    return AuxConstants(
        surface_mean=surface_mean,
        surface_std=surface_std,
        upper_mean=um.astype(np.float32),
        upper_std=us.astype(np.float32),
        surface_mask=surface_mask,
        const_h=const_h,
        upper_weights=uw,
        surface_weights=sw,
        upper_loss_weight=ulw,
        surface_loss_weight=slw,
        custom_mask=custom,
    )


def synthetic_aux_constants(
    model_cfg: ModelConfig, train_cfg: TrainConfig, seed: int = 0
) -> AuxConstants:
    """Deterministic stand-in constants so every pipeline runs without data."""
    g = compute_geometry(model_cfg)
    rng = np.random.default_rng(seed)
    vs, vu, L = model_cfg.surface_vars, model_cfg.upper_vars, model_cfg.levels

    uw, sw, ulw, slw = variable_weights(train_cfg)
    return AuxConstants(
        surface_mean=rng.normal(size=(1, vs, 1, 1)).astype(np.float32),
        surface_std=(1.0 + rng.uniform(0.5, 1.5, size=(1, vs, 1, 1))).astype(np.float32),
        upper_mean=rng.normal(size=(1, vu, L, 1, 1)).astype(np.float32),
        upper_std=(1.0 + rng.uniform(0.5, 1.5, size=(1, vu, L, 1, 1))).astype(np.float32),
        surface_mask=rng.normal(
            size=(model_cfg.surface_const_channels, model_cfg.lat + g.lat_pad, model_cfg.lon)
        ).astype(np.float32),
        const_h=rng.normal(
            size=(model_cfg.upper_const_channels, L, model_cfg.lat, model_cfg.lon)
        ).astype(np.float32),
        upper_weights=uw,
        surface_weights=sw,
        upper_loss_weight=ulw,
        surface_loss_weight=slw,
        custom_mask=None,
    )


# ---------------------------------------------------------------------------
# Normalization (reference era5_data/utils_data.py:531-546)
# ---------------------------------------------------------------------------

def norm_data(upper, surface, aux: AuxConstants):
    """Standardize raw-physical-unit fields."""
    return (
        (upper - aux.upper_mean) / aux.upper_std,
        (surface - aux.surface_mean) / aux.surface_std,
    )


def build_region_mask(
    lat_range: Tuple[float, float],
    lon_range: Tuple[float, float],
    lat: int = 721,
    lon: int = 1440,
) -> np.ndarray:
    """Rasterize a lat/lon box onto the 0.25-degree grid (role of
    custom_mask.ipynb — the reference's example box is Xinjiang,
    lat 34..49N / lon 73..96E). Grid convention: row 0 = 90N descending,
    column 0 = 0E eastward."""
    lat_lo, lat_hi = sorted(lat_range)
    lon_lo, lon_hi = sorted(lon_range)
    lats = 90.0 - 180.0 * np.arange(lat) / (lat - 1)
    lons = 360.0 * np.arange(lon) / lon
    in_lat = (lats >= lat_lo) & (lats <= lat_hi)
    in_lon = (lons >= lon_lo) & (lons <= lon_hi)
    return (in_lat[:, None] & in_lon[None, :]).astype(np.float32)


def norm_back_data(upper, surface, aux: AuxConstants):
    """De-standardize model-space fields back to physical units."""
    return (
        upper * aux.upper_std + aux.upper_mean,
        surface * aux.surface_std + aux.surface_mean,
    )
