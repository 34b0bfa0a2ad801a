#!/usr/bin/env python
"""LoRA finetuning entry point (reference finetune/lora_tune.py).

Routes the LoRA tree through the SAME Trainer as full finetuning —
validation, early stopping, best-model tracking and checkpoint-resume all
apply (the reference routes LoRA through its shared train() engine,
finetune/lora_tune.py:250 -> models/pangu_sample.py:278-381).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pangu_tpu.aux import load_aux_constants
from pangu_tpu.cli import base_parser, build_config, load_model_and_params
from pangu_tpu.data import make_loader
from pangu_tpu.eval import evaluate
from pangu_tpu.interop.npz_io import load_params_npz, save_params_npz
from pangu_tpu.parallel import activate_mesh, distributed_init, is_main, resolve_mesh
from pangu_tpu.train.lora import (
    LoraConfig,
    changed_param_report,
    count_trainable,
    init_lora_params,
    make_lora_eval_step,
    make_lora_train_step,
    merge_params,
)
from pangu_tpu.train.step import TrainState
from pangu_tpu.train.trainer import Trainer
from pangu_tpu.utils.logger import get_logger
from pangu_tpu.utils.summary import param_count


def main() -> None:
    p = base_parser("LoRA-finetune the Pangu-Weather model on TPU")
    p.add_argument("--rank", type=int, default=16)
    p.add_argument("--alpha", type=float, default=16.0)
    p.add_argument("--only-test", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest train_{n} LoRA checkpoint")
    p.add_argument("--lora-weights", type=str, default=None,
                   help="previously saved LoRA trainable tree (.npz)")
    p.add_argument("--dropout", type=float, default=0.1,
                   help="lora-dropout rate (reference lora_tune.py:176)")
    p.add_argument("--unmerged", action="store_true",
                   help="train with peft's unmerged per-token adapter-"
                        "dropout forward instead of the merged surgery "
                        "(identical when --dropout 0; train.lora docstring)")
    args = p.parse_args()

    distributed_init()
    cfg = build_config(args)
    out_dir = os.path.join(cfg.out_dir, "lora", str(cfg.horizon))
    os.makedirs(out_dir, exist_ok=True)
    logger = get_logger("lora", os.path.join(out_dir, "lora.log"))

    aux = load_aux_constants(cfg.model, cfg.train, args.aux_dir, cfg.horizon)
    model, base_params = load_model_and_params(cfg, args, aux)
    lcfg = LoraConfig(rank=args.rank, alpha=args.alpha,
                      dropout=args.dropout)

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

    writer = None
    if is_main():
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(os.path.join(out_dir, "writer"))
        except ImportError:
            pass

    if not args.only_test:
        per_host_batch = max(1, cfg.train.batch_size // jax.process_count())
        train_loader = make_loader(cfg.data, cfg.model, "train", cfg.horizon,
                                   per_host_batch,
                                   num_shards=jax.process_count(),
                                   shard=jax.process_index())
        # per-process val shard (same as finetune.py): lockstep multi-host
        # validation needs equal launch counts on every host
        val_loader = make_loader(cfg.data, cfg.model, "val", cfg.horizon, 1,
                                 num_shards=jax.process_count(),
                                 shard=jax.process_index())

        # mesh for data parallelism: replicated adapters + data-sharded
        # global batches make GSPMD emit the gradient all-reduce — without
        # it each host would silently train an independent adapter
        mesh = resolve_mesh(cfg.parallel)
        with activate_mesh(mesh):
            trainer = Trainer(
                cfg, model, aux, out_dir, writer=writer, logger=logger,
                steps_per_epoch=len(train_loader),
                train_step_fn=lambda opt: make_lora_train_step(
                    model, cfg, opt, base_params, lcfg,
                    unmerged=args.unmerged),
                eval_step_fn=make_lora_eval_step(model, cfg, base_params,
                                                 lcfg),
            )

            state = TrainState(trainable, trainer.optimizer.init(trainable),
                               jnp.zeros((), jnp.int32))
            start_epoch = 1
            if args.resume:
                state, start_epoch = trainer.resume(template=state)
                logger.info("resumed at epoch %d", start_epoch)

            best_trainable, state = trainer.fit(train_loader, val_loader,
                                                start_epoch=start_epoch,
                                                state=state)
        trainable = best_trainable
        if is_main():
            save_params_npz(os.path.join(out_dir, "lora_best.npz"), trainable)

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
