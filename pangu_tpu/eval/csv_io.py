"""Score CSV sinks, format-compatible with the reference
(save_errorScores, era5_data/utils.py:179-216): one CSV per variable family,
rows indexed by target time, columns = pressure levels / surface variables.
"""

from __future__ import annotations

import os
from typing import Dict, Mapping, Sequence

import numpy as np
import pandas as pd

from pangu_tpu.config import ERA5_SURFACE_VARIABLES, ERA5_UPPER_LEVELS


def save_error_scores(
    csv_path: str,
    scores: Mapping[str, Dict[str, np.ndarray]],
    error: str,
    upper_levels: Sequence[str] = ERA5_UPPER_LEVELS,
    surface_vars: Sequence[str] = ERA5_SURFACE_VARIABLES,
) -> None:
    """scores maps family name -> {target_time: per-channel array}.

    Families: upper_z/q/t/u/v, upper_wind_speed (level columns),
    surface (surface-variable columns), surface_wind_speed.
    """
    os.makedirs(csv_path, exist_ok=True)
    for family, d in scores.items():
        if d is None:
            continue
        if family == "surface":
            cols: Sequence[str] = surface_vars
        elif family == "surface_wind_speed":
            cols = ["wind_speed"]
        else:
            cols = upper_levels
        df = pd.DataFrame.from_dict(
            {k: np.atleast_1d(np.asarray(v)).ravel() for k, v in d.items()},
            orient="index",
            columns=list(cols),
        )
        df.to_csv(os.path.join(csv_path, f"{error}_{family}.csv"))


def load_error_scores(csv_path: str, error: str, family: str) -> pd.DataFrame:
    return pd.read_csv(
        os.path.join(csv_path, f"{error}_{family}.csv"), index_col=0
    )
