"""LoRA parameter-efficient finetuning (reference finetune/lora_tune.py).

The reference wraps every ``nn.Linear`` with peft LoRA (r=16, alpha=16,
dropout=0.1) and fully trains the output convolutions
(finetune/lora_tune.py:169-180). The JAX-native formulation is functional
param surgery:

  * every 2-D ``kernel`` leaf outside the full-train subtrees gets a low-rank
    delta ``W_eff = W + (alpha/r) * A @ B`` with A ~ N(0, 1/r), B = 0;
  * the ``full_train`` subtrees (patch embed/recovery heads — the reference's
    ``modules_to_save``) are trained directly;
  * the trainable pytree is {"lora": {path: {a, b}}, "full": subtrees};
    ``merge_params`` produces effective weights for forward/eval, so the
    serving path is identical to the full-finetune one.

Two training formulations:

  * **merged** (default): ``W_eff = W + (alpha/r) * A @ B`` — one param
    surgery per step, every downstream path (incl. the fused TPU kernels)
    unchanged. Equals the unmerged form exactly when lora-dropout is 0.
  * **unmerged** (``make_lora_train_step(..., unmerged=True)``): peft's
    per-linear formulation with per-token adapter dropout
    (reference finetune/lora_tune.py:174-180) — adapters ride a ``"lora"``
    flax variable collection (``lora_collection``) and each Dense site adds
    ``scaling * dropout(x) @ A @ B`` (model.attention.lora_tap). Sites the
    fused kernels would hide route to the XLA path automatically. Eval /
    serving always merge: with dropout off the two forms are identical, so
    the deployed artifact stays a plain param tree either way.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

Path = Tuple[str, ...]


@dataclass(frozen=True)
class LoraConfig:
    rank: int = 16  # reference finetune/lora_tune.py:175
    alpha: float = 16.0
    dropout: float = 0.1  # carried for config parity; see module docstring
    # subtrees trained fully (reference modules_to_save: the output convs)
    full_train_prefixes: Tuple[str, ...] = ("patch_recovery", "patch_embed")

    @property
    def scaling(self) -> float:
        return self.alpha / self.rank


def _iter_kernels(tree: Any, prefix: Path = ()) -> List[Tuple[Path, Any]]:
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.extend(_iter_kernels(v, prefix + (k,)))
    elif prefix and prefix[-1] == "kernel" and getattr(tree, "ndim", 0) == 2:
        out.append((prefix, tree))
    return out


def _in_full_train(path: Path, cfg: LoraConfig) -> bool:
    return any(p in path for p in cfg.full_train_prefixes)


def lora_target_paths(base_params: Any, cfg: LoraConfig) -> List[Path]:
    """All 2-D kernels outside the full-train subtrees — the analogue of the
    reference's 'all nn.Linear module names' target list
    (finetune/lora_tune.py:169-173)."""
    tree = base_params["params"] if "params" in base_params else base_params
    return [
        ("params",) + p
        for p, _ in _iter_kernels(tree)
        if not _in_full_train(p, cfg)
    ]


def _get(tree: Any, path: Path) -> Any:
    for k in path:
        tree = tree[k]
    return tree


def _set(tree: Dict, path: Path, value: Any) -> Dict:
    if len(path) == 1:
        return {**tree, path[0]: value}
    return {**tree, path[0]: _set(tree[path[0]], path[1:], value)}


def init_lora_params(base_params: Any, cfg: LoraConfig, rng: jax.Array) -> Dict:
    """Trainable pytree: {"lora": {joined_path: {"a","b"}}, "full": {...}}."""
    lora: Dict[str, Dict[str, jnp.ndarray]] = {}
    for path in lora_target_paths(base_params, cfg):
        w = _get(base_params, path)
        rng, sub = jax.random.split(rng)
        a = jax.random.normal(sub, (w.shape[0], cfg.rank), w.dtype) / np.sqrt(cfg.rank)
        b = jnp.zeros((cfg.rank, w.shape[1]), w.dtype)
        lora["/".join(path)] = {"a": a, "b": b}

    full: Dict = {}
    tree = base_params["params"]
    for name, sub in tree.items():
        if _in_full_train((name,), cfg):
            # COPY, don't alias: the Trainer's train step donates its state,
            # and donating an alias would delete the caller's base_params
            # buffers (breaking changed_param_report and any later use).
            full[name] = jax.tree.map(jnp.copy, sub)
    return {"lora": lora, "full": full}


def merge_params(base_params: Any, trainable: Dict, cfg: LoraConfig) -> Any:
    """Effective params: base + scaled low-rank deltas + full-train overrides."""
    params = base_params
    for joined, ab in trainable["lora"].items():
        path = tuple(joined.split("/"))
        w = _get(params, path)
        delta = (ab["a"] @ ab["b"]) * cfg.scaling
        params = _set(params, path, w + delta.astype(w.dtype))
    for name, sub in trainable["full"].items():
        params = _set(params, ("params", name), sub)
    return params


def apply_full_overrides(base_params: Any, trainable: Dict) -> Any:
    """Only the full-train subtree surgery (no adapter merge) — the base
    params used by the unmerged forward, where adapters ride the ``lora``
    collection instead."""
    params = base_params
    for name, sub in trainable["full"].items():
        params = _set(params, ("params", name), sub)
    return params


def lora_collection(trainable: Dict, cfg: LoraConfig) -> Dict:
    """The ``"lora"`` flax variable collection for the unmerged forward:
    mirrors the module tree, one ``{a, b_scaled, rate}`` leaf dict per
    adapted Dense site (consumed by model.attention.lora_tap). ``b`` is
    pre-scaled by alpha/r so the tap is a plain two-dot chain."""
    col: Dict = {}
    for joined, ab in trainable["lora"].items():
        path = tuple(joined.split("/"))  # ("params", *mods, site, "kernel")
        node = col
        for key in path[1:-2]:
            node = node.setdefault(key, {})
        node[path[-2]] = {
            "a": ab["a"],
            "b_scaled": ab["b"] * cfg.scaling,
            "rate": jnp.float32(cfg.dropout),
        }
    return col


def count_trainable(trainable: Dict) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(trainable))


def make_lora_train_step(
    model, cfg, optimizer: optax.GradientTransformation,
    base_params: Any, lora_cfg: LoraConfig, unmerged: bool = False,
) -> Callable:
    """Like train.step.make_train_step but optimizing only the LoRA tree.

    step(lora_state, batch, aux, rng) -> (lora_state, loss); lora_state is
    (trainable, opt_state, step). ``unmerged`` switches to peft's per-token
    adapter-dropout formulation (module docstring)."""
    from pangu_tpu.train.step import TrainState, loss_fn

    def step(state: TrainState, batch, aux, rng):
        r_path, r_drop, r_lora = jax.random.split(rng, 3)
        rngs = {"droppath": r_path, "dropout": r_drop, "lora": r_lora}

        def lora_loss(trainable):
            if unmerged:
                params = apply_full_overrides(base_params, trainable)
                params = {**params,
                          "lora": lora_collection(trainable, lora_cfg)}
            else:
                params = merge_params(base_params, trainable, lora_cfg)
            return loss_fn(model, params, batch, aux, cfg, rngs,
                           deterministic=False)

        loss, grads = jax.value_and_grad(lora_loss)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        trainable = optax.apply_updates(state.params, updates)
        return TrainState(trainable, opt_state, state.step + 1), loss

    return step


def make_lora_eval_step(
    model, cfg, base_params: Any, lora_cfg: LoraConfig
) -> Callable:
    """Validation-loss step over the LoRA tree: eval(trainable, batch, aux)
    -> loss with merged effective params (so the Trainer's val / early-stop /
    best-model machinery applies unchanged to LoRA runs)."""
    from pangu_tpu.train.step import loss_fn

    def step(trainable, batch, aux):
        params = merge_params(base_params, trainable, lora_cfg)
        return loss_fn(model, params, batch, aux, cfg, deterministic=True)

    return step


def changed_param_report(base_params: Any, merged: Any, atol: float = 0.0) -> List[str]:
    """Names of params that differ after finetuning — the reference prints
    this diff vs a deepcopy of the base model (finetune/lora_tune.py:182-248)."""
    changed = []

    def walk(a, b, path):
        if isinstance(a, dict):
            for k in a:
                walk(a[k], b[k], path + (k,))
        else:
            if not np.allclose(np.asarray(a), np.asarray(b), atol=atol):
                changed.append("/".join(path))

    walk(base_params, merged, ())
    return changed
