#!/usr/bin/env python
"""Standalone evaluation (reference inference/test_main.py, test_lora.py):
load weights, score the test range, write rmse_*/acc_* CSVs."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pangu_tpu.aux import load_aux_constants
from pangu_tpu.cli import base_parser, build_config, load_model_and_params
from pangu_tpu.data import make_loader
from pangu_tpu.eval import evaluate
from pangu_tpu.utils.logger import get_logger


def main() -> None:
    p = base_parser("Evaluate a Pangu-Weather checkpoint")
    p.add_argument("--visualize", action="store_true")
    p.add_argument("--lora-weights", type=str, default=None,
                   help="merge a LoRA trainable tree before evaluating")
    args = p.parse_args()

    cfg = build_config(args)
    out_dir = os.path.join(cfg.out_dir, "test", str(cfg.horizon))
    os.makedirs(out_dir, exist_ok=True)
    logger = get_logger("test", os.path.join(out_dir, "test.log"))

    aux = load_aux_constants(cfg.model, cfg.train, args.aux_dir, cfg.horizon)
    model, params = load_model_and_params(cfg, args, aux)

    if args.lora_weights:
        from pangu_tpu.interop.npz_io import load_params_npz
        from pangu_tpu.train.lora import LoraConfig, merge_params

        params = merge_params(params, load_params_npz(args.lora_weights),
                              LoraConfig())

    loader = make_loader(cfg.data, cfg.model, "test", cfg.horizon,
                         cfg.eval.batch_size)
    loss = evaluate(model, params, loader, aux, cfg, out_dir,
                    visualize=args.visualize, logger=logger)
    logger.info("done; csv scores under %s", os.path.join(out_dir, "csv"))


if __name__ == "__main__":
    main()
