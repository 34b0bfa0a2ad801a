#!/usr/bin/env python
"""Full finetuning entry point (reference finetune/finetune_fully.py).

Single host:   python scripts/finetune.py --set data.root=/data --weights w.npz
TPU pod slice: run the same command on every host; jax.distributed
               initializes from the TPU environment automatically.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from pangu_tpu.aux import load_aux_constants
from pangu_tpu.cli import base_parser, build_config, load_model_and_params
from pangu_tpu.data import make_loader
from pangu_tpu.eval import evaluate
from pangu_tpu.parallel import activate_mesh, distributed_init, is_main, resolve_mesh
from pangu_tpu.parallel.sharding import shard_params, zero_shard_opt_state
from pangu_tpu.train.step import TrainState
from pangu_tpu.train.trainer import Trainer, init_train_state
from pangu_tpu.utils.logger import get_logger
from pangu_tpu.utils.summary import param_count


def main() -> None:
    p = base_parser("Fully finetune the Pangu-Weather model on TPU")
    p.add_argument("--only-test", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest train_{n} checkpoint")
    p.add_argument("--visualize", action="store_true")
    args = p.parse_args()

    distributed_init()
    cfg = build_config(args)
    out_dir = os.path.join(cfg.out_dir, "finetune_fully", str(cfg.horizon))
    os.makedirs(out_dir, exist_ok=True)
    logger = get_logger("finetune", os.path.join(out_dir, "finetune.log"))

    aux = load_aux_constants(cfg.model, cfg.train, args.aux_dir, cfg.horizon)
    model, params = load_model_and_params(cfg, args, aux)
    logger.info("model parameters: %s", f"{param_count(params):,}")

    # resolve_mesh auto-expands a default config to all attached devices and
    # warns when an explicit config leaves devices idle
    mesh = resolve_mesh(cfg.parallel)
    n_hosts = jax.process_count()
    per_host_batch = max(1, cfg.train.batch_size // max(1, n_hosts))

    train_loader = make_loader(cfg.data, cfg.model, "train", cfg.horizon,
                               per_host_batch,
                               accumulation=cfg.train.accumulation_steps,
                               num_shards=n_hosts, shard=jax.process_index())
    # per-process shard (wrap-padded to equal counts): the trainer assembles
    # each batch into one global array for lockstep multi-host validation
    val_loader = make_loader(cfg.data, cfg.model, "val", cfg.horizon, 1,
                             num_shards=n_hosts, shard=jax.process_index())
    test_loader = make_loader(cfg.data, cfg.model, "test", cfg.horizon,
                              cfg.eval.batch_size)

    writer = None
    if is_main():
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(os.path.join(out_dir, "writer"))
        except ImportError:
            pass

    with activate_mesh(mesh):
        # --visualize covers both reference surfaces: val-time triptychs
        # during fit (pangu_sample.py:332-358) and test-time PNGs after
        trainer = Trainer(cfg, model, aux, out_dir, writer=writer, logger=logger,
                          steps_per_epoch=len(train_loader),
                          visualize=args.visualize)
        state = init_train_state(model, cfg, aux, trainer.optimizer, params=params)
        start_epoch = 1
        if args.resume:
            state, start_epoch = trainer.resume()
            logger.info("resumed at epoch %d", start_epoch)
        if mesh is not None:
            state = TrainState(
                shard_params(state.params, mesh),
                zero_shard_opt_state(state.opt_state, mesh,
                                     cfg.parallel.zero_opt_state),
                state.step,
            )

        best_params = state.params
        if not args.only_test:
            best_params, state = trainer.fit(train_loader, val_loader,
                                             start_epoch=start_epoch, state=state)

        if is_main():
            logger.info("Begin testing...")
            evaluate(model, best_params, test_loader, aux, cfg, out_dir,
                     visualize=args.visualize, logger=logger)


if __name__ == "__main__":
    main()
