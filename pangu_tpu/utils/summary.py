"""Model/param introspection (role of torch_summarize,
reference era5_data/utils.py:142-176)."""

from __future__ import annotations

from typing import Any, List

import jax
import numpy as np


def param_count(params: Any) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def summarize_params(params: Any, max_depth: int = 3) -> str:
    """Tree summary with per-subtree parameter counts."""
    lines: List[str] = []
    total = param_count(params)
    lines.append(f"total parameters: {total:,}")

    def walk(tree, path, depth):
        if depth > max_depth or not isinstance(tree, dict):
            return
        for k, v in tree.items():
            n = param_count(v)
            shape = "" if isinstance(v, dict) else f" {tuple(v.shape)}"
            lines.append("  " * depth + f"{k}: {n:,}{shape}")
            walk(v, path + (k,), depth + 1)

    walk(params, (), 0)
    return "\n".join(lines)
