#!/usr/bin/env python
"""Export a serving artifact (role of the reference's ONNX model files:
its inference engine executes pretrained .onnx graphs through onnxruntime,
inference/inference_*.py ort.InferenceSession usage).

The TPU-native artifact is a jax.export StableHLO blob of the full forecast
step (forward + de-normalization) with weights and aux constants baked in —
servable by any process via ``pangu_tpu.serving.load_forecast_step`` with no
model code or checkpoint plumbing:

    python scripts/export_model.py --weights ckpt.npz --aux-dir aux/ \
        --out-file pangu24.bin
    # cross-platform artifact (runs on CPU hosts AND TPU servers):
    python scripts/export_model.py --weights ckpt.npz \
        --platforms cpu,tpu --out-file pangu24.bin
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pangu_tpu.aux import load_aux_constants
from pangu_tpu.cli import base_parser, build_config, load_model_and_params
from pangu_tpu.utils.logger import get_logger


def main() -> None:
    p = base_parser("Export an AOT serving artifact (jax.export StableHLO)")
    p.add_argument("--out-file", type=str, default="pangu_forecast.bin",
                   help="output artifact path")
    p.add_argument("--batch", type=int, default=1,
                   help="batch dimension baked into the artifact")
    p.add_argument("--platforms", type=str, default=None,
                   help="comma-separated lowering platforms (e.g. cpu,tpu); "
                        "default: the current backend only")
    p.add_argument("--skip-check", action="store_true",
                   help="skip the load-back smoke check of the artifact")
    args = p.parse_args()

    cfg = build_config(args)
    logger = get_logger("export_model")

    from pangu_tpu.serving import export_forecast_step, load_forecast_step

    aux = load_aux_constants(cfg.model, cfg.train, args.aux_dir, cfg.horizon)
    model, params = load_model_and_params(cfg, args, aux)
    platforms = ([s.strip() for s in args.platforms.split(",") if s.strip()]
                 if args.platforms else None)

    logger.info("exporting forecast step (horizon %dh, batch %d) -> %s",
                cfg.horizon, args.batch, args.out_file)
    export_forecast_step(model, params, aux, args.out_file,
                         batch=args.batch, platforms=platforms)
    size = os.path.getsize(args.out_file)
    logger.info("wrote %s (%.1f MB)", args.out_file, size / 1e6)

    if not args.skip_check:
        import numpy as np

        m = cfg.model
        step = load_forecast_step(args.out_file)
        u = np.zeros((args.batch, m.upper_vars, m.levels, m.lat, m.lon),
                     np.float32)
        s = np.zeros((args.batch, m.surface_vars, m.lat, m.lon), np.float32)
        ou, os_ = step(u, s)
        assert np.isfinite(np.asarray(ou)).all() \
            and np.isfinite(np.asarray(os_)).all(), \
            "artifact produced non-finite outputs on the zero field"
        logger.info("load-back check passed: %s %s", ou.shape, os_.shape)


if __name__ == "__main__":
    main()
