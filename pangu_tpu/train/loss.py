"""Training loss family (reference models/pangu_sample.py:96-233).

All variants are weighted L1 on *normalized* fields (the model emits
normalized outputs; targets are normalized before the loss, reference
models/pangu_sample.py:167-169):

  * standard: per-variable weights, then upper*1.0 + surface*0.25
    (reference era5_data/config.py:52-55, models/pangu_sample.py:205-219)
  * wind-speed-only: L1 on sqrt(u^2+v^2) surface + upper
    (reference models/pangu_sample.py:194-203)
  * region-masked: sum over masked points / num valid points
    (reference models/pangu_sample.py:198-213)
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from pangu_tpu.aux import AuxConstants
from pangu_tpu.metrics import wind_speed


def weighted_l1_loss(
    out_upper: jnp.ndarray,
    out_surface: jnp.ndarray,
    tgt_upper: jnp.ndarray,
    tgt_surface: jnp.ndarray,
    aux: AuxConstants,
    only_wind_speed: bool = False,
    mask: Optional[jnp.ndarray] = None,  # (lat, lon), 1 = scored point
) -> jnp.ndarray:
    if only_wind_speed:
        # surface u10/v10 are channels 1/2; upper u/v are variables 3/4
        # (reference models/pangu_sample.py:74-94).
        os_ws = wind_speed(out_surface[:, 1], out_surface[:, 2])
        ts_ws = wind_speed(tgt_surface[:, 1], tgt_surface[:, 2])
        ou_ws = wind_speed(out_upper[:, 3], out_upper[:, 4])
        tu_ws = wind_speed(tgt_upper[:, 3], tgt_upper[:, 4])
        l_s = jnp.abs(os_ws - ts_ws)
        l_u = jnp.abs(ou_ws - tu_ws)
        if mask is not None:
            # normalize by batch as well as valid points: the reference
            # formula (models/pangu_sample.py:198-213) runs at batch 1
            # where sum/valid is exact; summing over B without dividing
            # would scale loss AND gradients linearly with batch size,
            # unlike the unmasked mean path
            valid = jnp.sum(mask) * l_s.shape[0]
            return (
                jnp.sum(l_s * mask[None]) / valid
                + jnp.sum(l_u * mask[None, None]) / valid
            )
        return jnp.mean(l_s) + jnp.mean(l_u)

    l_s = jnp.abs(out_surface - tgt_surface) * aux.surface_weights
    l_u = jnp.abs(out_upper - tgt_upper) * aux.upper_weights
    if mask is not None:
        # batch-normalized (see the wind-speed branch note); identical to
        # the reference at its batch size of 1
        valid = jnp.sum(mask) * l_s.shape[0]
        w_s = jnp.sum(l_s * mask[None, None]) / valid
        w_u = jnp.sum(l_u * mask[None, None, None]) / valid
    else:
        w_s = jnp.mean(l_s)
        w_u = jnp.mean(l_u)
    return w_u * aux.upper_loss_weight + w_s * aux.surface_loss_weight
