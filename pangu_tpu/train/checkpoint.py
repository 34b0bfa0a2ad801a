"""Orbax checkpointing (role of the reference's torch.save dicts
{model, optimizer, lr_scheduler, epoch}, models/pangu_sample.py:253-275, and
of the resume path finetune/finetune_fully.py:193-218).

Layout: <dir>/train_<epoch>/ orbax trees + <dir>/best/ for the best model.
Sharded params restore onto whatever mesh the restore target carries —
multi-host restart comes for free with orbax.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np
import orbax.checkpoint as ocp

from pangu_tpu.train.step import TrainState


def _path(d: str) -> str:
    return os.path.abspath(os.path.expanduser(d))


def save_train_state(ckpt_dir: str, epoch: int, state: TrainState) -> str:
    path = os.path.join(_path(ckpt_dir), f"train_{epoch}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {"params": state.params, "opt_state": state.opt_state,
                          "step": np.asarray(state.step), "epoch": np.asarray(epoch)},
                   force=True)
    return path


def restore_train_state(
    ckpt_dir: str, epoch: int, template: TrainState
) -> tuple[TrainState, int]:
    path = os.path.join(_path(ckpt_dir), f"train_{epoch}")
    target = {"params": template.params, "opt_state": template.opt_state,
              "step": np.asarray(template.step), "epoch": np.asarray(0)}
    with ocp.StandardCheckpointer() as ckptr:
        got = ckptr.restore(path, target)
    state = TrainState(got["params"], got["opt_state"], got["step"])
    return state, int(got["epoch"])


def save_params(ckpt_dir: str, params: Any, name: str = "best") -> str:
    path = os.path.join(_path(ckpt_dir), name)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {"params": params}, force=True)
    return path


def restore_params(ckpt_dir: str, template: Any, name: str = "best") -> Any:
    path = os.path.join(_path(ckpt_dir), name)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, {"params": template})["params"]


def latest_epoch(ckpt_dir: str) -> Optional[int]:
    d = _path(ckpt_dir)
    if not os.path.isdir(d):
        return None
    epochs = [
        int(n.split("_", 1)[1])
        for n in os.listdir(d)
        if n.startswith("train_") and n.split("_", 1)[1].isdigit()
    ]
    return max(epochs) if epochs else None
