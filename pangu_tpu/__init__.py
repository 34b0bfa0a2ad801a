"""pangu_tpu — a TPU-native (JAX/XLA/pjit/Pallas) framework for Pangu-Weather.

A ground-up re-design of the capabilities of the reference PyTorch framework
(comdaze/pangu-pytorch-demo): the 3D Earth-Specific Transformer for global
weather forecasting on the 0.25-degree ERA5 grid, with training (full / LoRA),
evaluation (latitude-weighted RMSE/ACC), autoregressive + hierarchical rollout
inference, and SPMD scaling over TPU device meshes.

Design principles (TPU-first, not a port):
  * Functional model with explicit param pytrees (flax.linen), jitted
    train/eval/rollout step functions.
  * Activations stay in (B, Z, H, W, C) layout so lat/lon sharding via
    `jax.sharding.NamedSharding` is a pure annotation; XLA inserts the
    collectives (the reference's NCCL/DDP/ZeRO roles are played by the
    compiler over ICI).
  * Static shapes everywhere; padding/window geometry is computed once in
    `geometry.py` from a dataclass config, replacing the reference's
    hard-coded [8,186]/[8,96] constants (reference models/layers.py:180-185).
  * Hot windowed-attention path has a fused Pallas kernel (ops/).
"""

__version__ = "0.1.0"

from pangu_tpu.config import (  # noqa: F401
    DataConfig,
    EvalConfig,
    ModelConfig,
    PanguConfig,
    TrainConfig,
    pangu_pretrain,
    pangu_tiny,
)
