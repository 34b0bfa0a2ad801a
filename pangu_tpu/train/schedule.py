"""LR schedules. The reference uses epoch-stepped MultiStepLR(milestones=[25,
50], gamma=0.5) (reference finetune/finetune_fully.py:206-207)."""

from __future__ import annotations

from typing import Sequence

import optax


def multistep_lr(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float,
    steps_per_epoch: int,
) -> optax.Schedule:
    """Piecewise-constant decay at epoch milestones, expressed in steps.

    A repeated milestone multiplies by gamma once PER occurrence
    (``gamma ** count``), matching torch MultiStepLR's Counter semantics."""
    from collections import Counter

    counts = Counter(int(m) for m in milestones)
    boundaries = {
        m * max(1, steps_per_epoch): gamma ** c for m, c in counts.items()
    }
    return optax.piecewise_constant_schedule(base_lr, boundaries)
