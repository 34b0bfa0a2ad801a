"""Evaluation engine (reference test(), models/pangu_sample.py:391-581).

Per test sample: forward -> weighted loss on normalized fields ->
de-normalize -> latitude-weighted RMSE for z/q/t/u/v (13 levels each),
upper wind speed, surface (4 vars), surface wind speed -> anomaly ACC
against the climatological mean for the same families -> CSV score tables.

The whole scoring pipe is one jitted function; the host loop only collects
numpy results keyed by target time.
"""

from __future__ import annotations

import logging
import os
import functools
from functools import partial
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pangu_tpu.aux import AuxConstants, norm_back_data, norm_data
from pangu_tpu.config import PanguConfig
from pangu_tpu.eval.csv_io import save_error_scores
from pangu_tpu.metrics import (
    weighted_acc_channels,
    weighted_acc_masked_channels,
    weighted_rmse_channels,
    weighted_rmse_channels_masked,
    wind_speed,
)
from pangu_tpu.model import PanguModel
from pangu_tpu.train.loss import weighted_l1_loss
from pangu_tpu.train.step import Batch


def make_field_scorer(cfg: PanguConfig) -> Callable:
    """(out_upper, out_surface, tgt_upper, tgt_surface, aux) -> score dict.

    Physical-unit single-sample (no batch dim) scoring shared by evaluate()
    and the rollout engines (reference models/pangu_sample.py:531-570)."""

    use_mask = cfg.train.use_custom_mask

    def score_fields(ou, os_, tu, ts, aux: AuxConstants) -> Dict[str, jnp.ndarray]:
        ws_o = wind_speed(ou[3], ou[4])
        ws_t = wind_speed(tu[3], tu[4])
        ws_os = wind_speed(os_[1], os_[2])
        ws_ts = wind_speed(ts[1], ts[2])

        if use_mask and aux.custom_mask is not None:
            rmse = partial(weighted_rmse_channels_masked, mask=aux.custom_mask)
            # ACC must honor the same region (reference
            # era5_data/score.py:46-61 weighted_acc_masked) — a masked RMSE
            # next to a GLOBAL ACC silently mixes region and global scores
            acc = partial(weighted_acc_masked_channels, mask=aux.custom_mask)
        else:
            rmse = weighted_rmse_channels
            acc = weighted_acc_channels

        out: Dict[str, jnp.ndarray] = {}
        for i, var in enumerate("zqtuv"):
            out[f"rmse_upper_{var}"] = rmse(ou[i], tu[i])
        out["rmse_upper_wind_speed"] = rmse(ws_o, ws_t)
        out["rmse_surface"] = rmse(os_, ts)
        out["rmse_surface_wind_speed"] = rmse(ws_os[None], ws_ts[None])

        # anomalies vs climatological mean (reference models/pangu_sample.py:550-570)
        um = aux.upper_mean[0]
        sm = aux.surface_mean[0]
        ou_a, tu_a = ou - um, tu - um
        os_a, ts_a = os_ - sm, ts - sm
        for i, var in enumerate("zqtuv"):
            out[f"acc_upper_{var}"] = acc(ou_a[i], tu_a[i])
        out["acc_surface"] = acc(os_a, ts_a)
        return out

    return score_fields


RMSE_FAMILIES = [
    "upper_z", "upper_q", "upper_t", "upper_u", "upper_v",
    "upper_wind_speed", "surface", "surface_wind_speed",
]
ACC_FAMILIES = ["upper_z", "upper_q", "upper_t", "upper_u", "upper_v", "surface"]


def score_columns(cfg: PanguConfig):
    from pangu_tpu.config import ERA5_SURFACE_VARIABLES, ERA5_UPPER_LEVELS

    levels = [str(l) for l in range(cfg.model.levels)]
    svars = [str(v) for v in range(cfg.model.surface_vars)]
    if cfg.model.levels == len(ERA5_UPPER_LEVELS):
        levels = list(ERA5_UPPER_LEVELS)
    if cfg.model.surface_vars == len(ERA5_SURFACE_VARIABLES):
        svars = list(ERA5_SURFACE_VARIABLES)
    return levels, svars


def write_score_tables(csv_path: str, rmse_scores, acc_scores, cfg: PanguConfig):
    levels, svars = score_columns(cfg)
    save_error_scores(csv_path, rmse_scores, "rmse",
                      upper_levels=levels, surface_vars=svars)
    save_error_scores(csv_path, acc_scores, "acc",
                      upper_levels=levels, surface_vars=svars)


def make_score_step(
    model: PanguModel, cfg: PanguConfig, return_fields: bool = False
) -> Callable:
    """(params, batch, aux) -> score dict; every array has a leading batch
    axis (one score row per sample), ``loss`` is the batch-mean scalar.

    ``return_fields`` additionally returns the de-normalized predicted fields
    (for visualization) at the cost of the device->host transfer."""

    use_mask = cfg.train.use_custom_mask
    score_fields = make_field_scorer(cfg)

    def score(params, batch: Batch, aux: AuxConstants) -> Dict[str, jnp.ndarray]:
        out_u, out_s = model.apply(params, batch.upper, batch.surface, aux, True)
        tgt_u_n, tgt_s_n = norm_data(batch.target_upper, batch.target_surface, aux)
        loss = weighted_l1_loss(
            out_u, out_s, tgt_u_n, tgt_s_n, aux,
            only_wind_speed=cfg.train.only_wind_speed_loss,
            mask=aux.custom_mask if use_mask else None,
        )
        # physical units for scoring (reference models/pangu_sample.py:479-480)
        out_u, out_s = norm_back_data(out_u, out_s, aux)

        # score EVERY batch sample (leading axis = batch): the reference only
        # ever runs this at batch 1 (era5_data/config.py:74), but a larger
        # eval batch must not silently drop samples 1..B-1 — the rollout
        # engine got this rule first (rollout/engines.py single_output_eval)
        out = {"loss": loss}
        out.update(jax.vmap(score_fields, in_axes=(0, 0, 0, 0, None))(
            out_u, out_s, batch.target_upper, batch.target_surface, aux))
        if return_fields:
            out["output_upper"] = out_u
            out["output_surface"] = out_s
        return out

    return score


def evaluate(
    model: PanguModel,
    params,
    loader: Iterable,
    aux: AuxConstants,
    cfg: PanguConfig,
    res_path: str,
    visualize: bool = False,
    score_step: Optional[Callable] = None,
    logger=None,
) -> float:
    """Run the full scoring pass; write rmse_*/acc_* CSVs; return mean loss."""
    step = jax.jit(
        score_step or make_score_step(model, cfg, return_fields=visualize)
    )
    # commit once: numpy params/aux passed to a jitted step are re-uploaded
    # on every call (~1 GB + ~66 MB per batch through a device tunnel)
    params = jax.device_put(params)
    aux = jax.device_put(aux)

    families_rmse = RMSE_FAMILIES
    families_acc = ACC_FAMILIES
    rmse_scores: Dict[str, Dict[str, np.ndarray]] = {f: {} for f in families_rmse}
    acc_scores: Dict[str, Dict[str, np.ndarray]] = {f: {} for f in families_acc}

    total_loss, n = 0.0, 0
    for batch, periods in loader:
        out = jax.device_get(step(params, batch, aux))
        total_loss += float(out["loss"])
        n += 1
        # one score row PER SAMPLE, keyed by that sample's target time
        for i, (_, target_time) in enumerate(periods):
            for f in families_rmse:
                rmse_scores[f][target_time] = out[f"rmse_{f}"][i]
            for f in families_acc:
                acc_scores[f][target_time] = out[f"acc_{f}"][i]

        if visualize:
            from pangu_tpu.eval import visualize as viz

            png_path = os.path.join(res_path, "png")
            from pangu_tpu.config import (
                ERA5_SURFACE_VARIABLES,
                ERA5_UPPER_VARIABLES,
            )

            names_u = (
                list(ERA5_UPPER_VARIABLES)
                if cfg.model.upper_vars == len(ERA5_UPPER_VARIABLES)
                else [str(i) for i in range(cfg.model.upper_vars)]
            )
            names_s = (
                list(ERA5_SURFACE_VARIABLES)
                if cfg.model.surface_vars == len(ERA5_SURFACE_VARIABLES)
                else [str(i) for i in range(cfg.model.surface_vars)]
            )
            viz.plot_upper(
                out["output_upper"][0], np.asarray(batch.target_upper[0]),
                np.asarray(batch.upper[0]), names_u[-1], cfg.model.levels // 2,
                periods[0][1], png_path, var_names=names_u,
            )
            viz.plot_surface(
                out["output_surface"][0], np.asarray(batch.target_surface[0]),
                np.asarray(batch.surface[0]), names_s[1], periods[0][1],
                png_path, var_names=names_s,
            )

    csv_path = os.path.join(res_path, "csv")
    write_score_tables(csv_path, rmse_scores, acc_scores, cfg)

    if n == 0:
        # a too-narrow test window (shorter than one horizon, so no sample
        # has a verifying target) silently read as a perfect 0.0 test loss
        msg = ("evaluate(): the test range produced ZERO scoreable samples "
               "(every sample needs a target one horizon ahead inside the "
               "range) — widen data.test_start/test_end")
        if logger:
            logger.warning(msg)
        else:
            logging.getLogger("pangu_tpu.eval").warning(msg)
        return float("nan")

    mean_loss = total_loss / n
    if logger:
        logger.info("test_loss: %.6f", mean_loss)
    return mean_loss


@functools.lru_cache(maxsize=8)
def jitted_field_scorer(cfg: PanguConfig) -> Callable:
    """One jitted scorer per config — rollout engines over the same config
    share the compiled program instead of re-jitting per engine call.
    Bounded: each entry pins a compiled executable for its cache lifetime."""
    import jax

    return jax.jit(make_field_scorer(cfg))
