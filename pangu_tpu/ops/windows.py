"""Window partition/reverse layout transforms (XLA path).

Token order inside a window is (z, h, w)-major and the type axis enumerates
(z-window, h-window) pairs, matching the reference's permute/reshape chain
(reference models/layers.py:253-262) so biases are import-compatible. The
fused Pallas path (ops/fused_block_attention.py) never materializes this
layout — these are used off-TPU and by parity tests.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def window_partition(x: jnp.ndarray, window: Tuple[int, int, int]) -> jnp.ndarray:
    """(B, Z, Hp, W, C) -> (B, n_lon, n_type, T, C)."""
    wz, wh, ww = window
    b, z, h, w, c = x.shape
    x = x.reshape(b, z // wz, wz, h // wh, wh, w // ww, ww, c)
    x = x.transpose(0, 5, 1, 3, 2, 4, 6, 7)  # -> (B, Wn, Zn, Hn, wz, wh, ww, C)
    return x.reshape(b, w // ww, (z // wz) * (h // wh), wz * wh * ww, c)


def window_reverse(
    x: jnp.ndarray, window: Tuple[int, int, int], z: int, h: int, w: int
) -> jnp.ndarray:
    """Inverse of :func:`window_partition`: -> (B, Z, Hp, W, C)."""
    wz, wh, ww = window
    b = x.shape[0]
    c = x.shape[-1]
    x = x.reshape(b, w // ww, z // wz, h // wh, wz, wh, ww, c)
    x = x.transpose(0, 2, 4, 3, 5, 1, 6, 7)
    return x.reshape(b, z, h, w, c)
