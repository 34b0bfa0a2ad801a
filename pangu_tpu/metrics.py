"""Latitude-weighted verification metrics, jitted.

Semantics follow the reference's torch.jit scoring functions
(reference era5_data/score.py:98-201): latitude weights
``w_j = num_lat * cos(pi/180 * lat_j) / sum_j cos(...)`` with
``lat_j = 90 - j * 180/(num_lat-1)`` — including the reference's use of
3.1416 (not math.pi) so numbers are bit-comparable.

All functions take channel-leading arrays ``(..., C, H, W)`` or ``(C, H, W)``
and reduce over the trailing (H, W) dims, returning per-channel scores.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# The reference uses the literal 3.1416 in its torch scoring path
# (era5_data/score.py:105,131) — keep it for parity of published numbers.
_REF_PI = 3.1416


def latitude_weights(num_lat: int, dtype=jnp.float32) -> jnp.ndarray:
    """Per-row weights, shape (num_lat,). reference era5_data/score.py:99-105."""
    j = jnp.arange(num_lat, dtype=dtype)
    lat_deg = 90.0 - j * 180.0 / float(num_lat - 1)
    cos = jnp.cos(_REF_PI / 180.0 * lat_deg)
    return num_lat * cos / jnp.sum(cos)


def _weight_for(pred: jnp.ndarray) -> jnp.ndarray:
    num_lat = pred.shape[-2]
    w = latitude_weights(num_lat, pred.dtype)
    return w.reshape((1,) * (pred.ndim - 2) + (num_lat, 1))


@jax.jit
def weighted_rmse_channels(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Latitude-weighted RMSE per channel (reference era5_data/score.py:126-164)."""
    w = _weight_for(pred)
    return jnp.sqrt(jnp.mean(w * (pred - target) ** 2, axis=(-1, -2)))


@jax.jit
def weighted_rmse_channels_masked(
    pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Region-masked variant; mask is (H, W) with 1 = scored point
    (reference era5_data/score.py:141-159)."""
    w = _weight_for(pred)
    m = mask.reshape((1,) * (pred.ndim - 2) + mask.shape)
    valid = jnp.sum(w * m, axis=(-1, -2))
    err = jnp.sum(w * m * (pred - target) ** 2, axis=(-1, -2))
    return jnp.sqrt(err / valid)


@jax.jit
def weighted_acc_channels(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Latitude-weighted anomaly correlation per channel; callers subtract the
    climatological mean first (reference era5_data/score.py:186-201,
    models/pangu_sample.py:550-570)."""
    w = _weight_for(pred)
    num = jnp.sum(w * pred * target, axis=(-1, -2))
    den = jnp.sqrt(
        jnp.sum(w * pred * pred, axis=(-1, -2))
        * jnp.sum(w * target * target, axis=(-1, -2))
    )
    return num / den


@jax.jit
def weighted_acc_masked_channels(
    pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """reference era5_data/score.py:173-183."""
    w = _weight_for(pred)
    m = mask.reshape((1,) * (pred.ndim - 2) + mask.shape)
    num = jnp.sum(m * w * pred * target, axis=(-1, -2))
    den = jnp.sqrt(
        jnp.sum(m * w * pred * pred, axis=(-1, -2))
        * jnp.sum(m * w * target * target, axis=(-1, -2))
    )
    return num / den


@jax.jit
def unweighted_acc_channels(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """reference era5_data/score.py:210-214."""
    num = jnp.sum(pred * target, axis=(-1, -2))
    den = jnp.sqrt(
        jnp.sum(pred * pred, axis=(-1, -2)) * jnp.sum(target * target, axis=(-1, -2))
    )
    return num / den


@partial(jax.jit, static_argnames=("qs", "qlim", "qcut"))
def top_quantiles_error(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    qs: int = 100,
    qlim: int = 3,
    qcut: float = 0.1,
) -> jnp.ndarray:
    """Tail-quantile bias over (N, C, H, W) (reference era5_data/score.py:223-232)."""
    n, c, h, w = pred.shape
    qtile = 1.0 - jnp.logspace(-qlim, -qcut, num=qs)
    p_tar = jnp.quantile(target.reshape(n, c, h * w), qtile, axis=-1)
    p_pred = jnp.quantile(pred.reshape(n, c, h * w), qtile, axis=-1)
    return jnp.mean(p_pred - p_tar, axis=0)


def wind_speed(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """sqrt(u^2 + v^2) (reference models/pangu_sample.py:74-94)."""
    return jnp.sqrt(u * u + v * v)
