#!/usr/bin/env python
"""LoRA finetuning entry point (reference finetune/lora_tune.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pangu_tpu.aux import load_aux_constants
from pangu_tpu.cli import base_parser, build_config, load_model_and_params
from pangu_tpu.data import make_loader
from pangu_tpu.eval import evaluate
from pangu_tpu.interop.npz_io import load_params_npz, save_params_npz
from pangu_tpu.parallel import distributed_init, is_main
from pangu_tpu.train.lora import (
    LoraConfig,
    changed_param_report,
    count_trainable,
    init_lora_params,
    make_lora_train_step,
    merge_params,
)
from pangu_tpu.train.step import TrainState, make_optimizer
from pangu_tpu.utils.logger import get_logger
from pangu_tpu.utils.summary import param_count


def main() -> None:
    p = base_parser("LoRA-finetune the Pangu-Weather model on TPU")
    p.add_argument("--rank", type=int, default=16)
    p.add_argument("--alpha", type=float, default=16.0)
    p.add_argument("--only-test", action="store_true")
    p.add_argument("--lora-weights", type=str, default=None,
                   help="previously saved lora_{n}.npz trainable tree")
    args = p.parse_args()

    distributed_init()
    cfg = build_config(args)
    out_dir = os.path.join(cfg.out_dir, "lora", str(cfg.horizon))
    os.makedirs(out_dir, exist_ok=True)
    logger = get_logger("lora", os.path.join(out_dir, "lora.log"))

    aux = load_aux_constants(cfg.model, cfg.train, args.aux_dir, cfg.horizon)
    model, base_params = load_model_and_params(cfg, args, aux)
    lcfg = LoraConfig(rank=args.rank, alpha=args.alpha)

    trainable = (
        load_params_npz(args.lora_weights)
        if args.lora_weights
        else init_lora_params(base_params, lcfg, jax.random.PRNGKey(cfg.train.seed))
    )
    logger.info(
        "trainable params: %s of %s (%.2f%%)",
        f"{count_trainable(trainable):,}", f"{param_count(base_params):,}",
        100.0 * count_trainable(trainable) / param_count(base_params),
    )

    if not args.only_test:
        optimizer = make_optimizer(cfg)
        step = jax.jit(make_lora_train_step(model, cfg, optimizer,
                                            base_params, lcfg))
        state = TrainState(trainable, optimizer.init(trainable),
                           jnp.zeros((), jnp.int32))
        loader = make_loader(cfg.data, cfg.model, "train", cfg.horizon,
                             max(1, cfg.train.batch_size // jax.process_count()),
                             num_shards=jax.process_count(),
                             shard=jax.process_index())
        rng = jax.random.PRNGKey(cfg.train.seed)
        for epoch in range(1, cfg.train.epochs + 1):
            total, nb = 0.0, 0
            for batch, _ in loader:
                rng, r = jax.random.split(rng)
                state, loss = step(state, batch, aux, r)
                total += float(loss)
                nb += 1
            logger.info("Epoch %d: loss=%.6f", epoch, total / max(1, nb))
            if is_main() and epoch % cfg.train.save_interval == 0:
                save_params_npz(os.path.join(out_dir, f"lora_{epoch}.npz"),
                                state.params)
        trainable = state.params

    merged = merge_params(base_params, trainable, lcfg)
    if is_main():
        changed = changed_param_report(base_params, merged)
        logger.info("changed params after LoRA: %d (e.g. %s)",
                    len(changed), changed[:5])
        test_loader = make_loader(cfg.data, cfg.model, "test", cfg.horizon,
                                  cfg.eval.batch_size)
        evaluate(model, merged, test_loader, aux, cfg, out_dir, logger=logger)


if __name__ == "__main__":
    main()
