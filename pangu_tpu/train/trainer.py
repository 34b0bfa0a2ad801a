"""Training engine (reference train(), models/pangu_sample.py:96-388).

Epoch loop with: jitted accumulate-and-update step, per-epoch MultiStep LR
(inside the optax schedule), periodic checkpointing, rank-0 validation with
scalar logging, best-model tracking and early stopping.

The loader contract is any iterable of (Batch, periods) with __len__ —
satisfied by pangu_tpu.data loaders and by plain lists in tests.
"""

from __future__ import annotations

import time
from typing import Any, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pangu_tpu.aux import AuxConstants
from pangu_tpu.config import PanguConfig
from pangu_tpu.model import PanguModel
from pangu_tpu.train import checkpoint as ckpt
from pangu_tpu.train.step import (
    Batch,
    TrainState,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from pangu_tpu.utils.logger import get_logger


def sharded_val_stats(
    eval_step, params, val_loader, aux, count: int,
    last_batch_box: Optional[dict] = None,
) -> Tuple[float, int]:
    """(loss_sum, n_batches) over the validation set, multi-host safe.

    The reference runs the full val loop on rank 0 only
    (models/pangu_sample.py:278-327); here the work is split across hosts
    WITHOUT desynchronizing the SPMD program: when the trainer's params are
    sharded over a multi-host mesh, every ``eval_step`` launch is a
    collective, so all hosts must make the SAME number of launches with
    globally consistent inputs. Each host's ``val_loader`` therefore holds
    its per-process shard (equal counts — BatchLoader wrap-pads), and each
    batch is assembled into ONE global array batch-sharded over the mesh's
    ``data`` axis; one lockstep launch per global batch scores
    ``count`` hosts' samples at once.

    Single process: plain local loop (one launch per batch, no assembly).
    ``last_batch_box``, when given, receives the final batch under key
    "batch" (the reference visualizes the last val batch,
    models/pangu_sample.py:332-358).
    """
    from pangu_tpu.parallel.mesh import active_mesh

    mesh = active_mesh()
    loss_sum, n = 0.0, 0
    for batch, _periods in val_loader:
        if count > 1:
            batch = _as_global_batch(batch, mesh)
        loss_sum += float(eval_step(params, batch, aux))
        n += 1
        if last_batch_box is not None:
            last_batch_box["batch"] = batch
    return loss_sum, n


def _as_global_batch(batch, mesh):
    """Assemble per-host batch shards into ONE global jax.Array batch
    sharded over the mesh's ``data`` axis. Multi-host SPMD requires this
    for EVERY collective launch (train and val): a host-local numpy arg
    is treated as identical across hosts, which per-host loader shards
    are not. No-op single-process or without a mesh. With gradient
    accumulation the data axis is axis 1 (behind the microbatch axis)."""
    if jax.process_count() <= 1 or mesh is None:
        return batch
    from jax.sharding import NamedSharding, PartitionSpec as P

    acc = batch.upper.ndim == 6  # (acc, batch, vars, levels, lat, lon)
    spec = P(None, "data") if acc else P("data")
    return type(batch)(*(
        jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(a))
        for a in batch
    ))


def _global_val_loss(loss_sum: float, n: int) -> float:
    """Validation loss from the lockstep stats. Each launch already reduces
    over the global batch, so every host holds the same sums — no gather."""
    return loss_sum / max(1, n)


def init_train_state(
    model: PanguModel,
    cfg: PanguConfig,
    aux: AuxConstants,
    optimizer,
    rng: Optional[jax.Array] = None,
    params: Optional[Any] = None,
) -> TrainState:
    if params is None:
        m = cfg.model
        upper = jnp.zeros((1, m.upper_vars, m.levels, m.lat, m.lon), jnp.float32)
        surface = jnp.zeros((1, m.surface_vars, m.lat, m.lon), jnp.float32)
        # jit the init: op-by-op dispatch of the full-geometry forward is
        # minutes through a tunneled device, one compiled call is seconds
        if rng is None:  # `rng or ...` would probe array truthiness
            rng = jax.random.PRNGKey(cfg.train.seed)
        params = jax.jit(model.init)(rng, upper, surface, aux)
    opt_state = optimizer.init(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32))


class Trainer:
    """One engine for full finetuning AND parameter-efficient (LoRA) tuning:
    pass ``train_step_fn``/``eval_step_fn`` built over a different trainable
    tree (e.g. train.lora.make_lora_train_step) and every feature — val /
    early-stop / best-model / checkpoint-resume — applies to it, the way the
    reference routes LoRA through the same train() engine
    (finetune/lora_tune.py:250 -> models/pangu_sample.py:278-381)."""

    def __init__(
        self,
        cfg: PanguConfig,
        model: PanguModel,
        aux: AuxConstants,
        out_dir: str,
        writer: Optional[Any] = None,
        logger=None,
        steps_per_epoch: int = 1,
        jit: bool = True,
        profile_dir: Optional[str] = None,
        train_step_fn=None,
        eval_step_fn=None,
        optimizer=None,
        visualize: bool = False,
    ):
        """``train_step_fn`` is a builder ``optimizer -> step`` (so a custom
        trainable tree shares the Trainer's schedule-bearing optimizer);
        ``eval_step_fn`` is the eval step itself. ``visualize`` renders the
        reference's val-time triptych PNGs (pangu_sample.py:332-358) of the
        last validation batch into ``{out_dir}/png_training`` after every
        validation pass — full-param training, single process only (a LoRA
        tree is not a forward-able param tree; a multi-host global batch is
        not rank-0 addressable)."""
        #: when set, epoch 1 is captured with jax.profiler into this dir
        self.profile_dir = profile_dir
        self.visualize = visualize
        self.cfg = cfg
        self.model = model
        # commit the constants to device once; numpy aux would be re-copied
        # host->device on every jitted step (~67MB at full geometry)
        from pangu_tpu.parallel.mesh import active_mesh

        mesh = active_mesh()
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self.aux = jax.device_put(aux, NamedSharding(mesh, PartitionSpec()))
        else:
            self.aux = jax.device_put(aux)
        self.mesh = mesh
        self.out_dir = out_dir
        self.writer = writer
        self.logger = logger or get_logger("pangu_tpu.train")
        self.optimizer = optimizer or make_optimizer(cfg, steps_per_epoch)
        train_step = (train_step_fn(self.optimizer) if train_step_fn
                      else make_train_step(model, cfg, self.optimizer))
        eval_step = eval_step_fn or make_eval_step(model, cfg)
        self.train_step = jax.jit(train_step, donate_argnums=(0,)) if jit else train_step
        self.eval_step = jax.jit(eval_step) if jit else eval_step

    # ------------------------------------------------------------------
    def fit(
        self,
        train_loader: Iterable,
        val_loader: Optional[Iterable] = None,
        start_epoch: int = 1,
        state: Optional[TrainState] = None,
    ) -> Tuple[Any, TrainState]:
        """Returns (best_params, final_state)."""
        cfg = self.cfg
        base_rng = jax.random.PRNGKey(cfg.train.seed)
        if state is None:
            state = init_train_state(self.model, cfg, self.aux, self.optimizer)

        is_main = jax.process_index() == 0
        best_loss = float("inf")
        # The best params live on DISK (the collective `best` checkpoint),
        # not as a device-resident copy: a full best-params clone pinned
        # ~1.1 GB of HBM at flagship f32 on top of params+moments (round-3
        # verdict #7). They are restored once, after the loop, with the
        # final params as the sharding template.
        have_best = False
        stale_epochs = 0

        bad_steps = 0
        profiling = False
        for epoch in range(start_epoch, cfg.train.epochs + 1):
            # Pin the shuffle schedule to the trainer's epoch number so a
            # RESUMED run continues the sample-order sequence instead of
            # replaying epoch 1's order (a fresh BatchLoader starts at its
            # internal epoch 0 regardless of start_epoch).
            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(epoch)
            # The droppath/dropout stream is likewise a function of
            # (seed, epoch, step-within-epoch), NOT of how many epochs this
            # process has executed: a run resumed at epoch N draws the same
            # masks an uninterrupted run would have drawn at epoch N,
            # instead of replaying epoch 1's stream against epoch-N data.
            rng = jax.random.fold_in(base_rng, epoch)
            if self.profile_dir and epoch == start_epoch:
                jax.profiler.start_trace(self.profile_dir)
                profiling = True
            t0 = time.time()
            epoch_loss, n_batches = 0.0, 0

            def consume(device_loss, step_no):
                # failure brake: a non-finite loss poisons the params
                # irrecoverably — fail fast with a pointer to the last
                # good checkpoint instead of training garbage.
                nonlocal epoch_loss, bad_steps
                lf = float(device_loss)
                if not np.isfinite(lf):
                    bad_steps += 1
                    self.logger.warning(
                        "non-finite loss at epoch %d step %d", epoch, step_no
                    )
                    if bad_steps >= 3:
                        raise FloatingPointError(
                            f"training diverged (non-finite loss x{bad_steps}); "
                            f"resume from the last checkpoint under "
                            f"{self.out_dir}/models"
                        )
                else:
                    bad_steps = 0
                epoch_loss += lf

            # the host-blocking float() of step i runs only AFTER step i+1
            # is dispatched, so the device never idles waiting on the brake
            # check (one per-step round trip saved; the brake fires at most
            # one step late)
            pending = None
            for batch, _periods in train_loader:
                rng, step_rng = jax.random.split(rng)
                # multi-host: per-host loader shards -> one global array
                # (host-local numpy would be treated as replicated; no-op
                # single-process)
                batch = _as_global_batch(batch, self.mesh)
                state, loss = self.train_step(state, batch, self.aux, step_rng)
                if pending is not None:
                    consume(pending, n_batches - 1)
                pending = loss
                n_batches += 1
            if pending is not None:
                consume(pending, n_batches - 1)
            epoch_loss /= max(1, n_batches)
            self.logger.info(
                "Epoch %d: loss=%.6f, time=%.3f", epoch, epoch_loss, time.time() - t0
            )
            if profiling:
                jax.profiler.stop_trace()
                profiling = False
                self.logger.info("profile written to %s", self.profile_dir)

            if epoch % cfg.train.save_interval == 0:
                # EVERY process calls the save: orbax's save is a
                # cross-process collective (each host writes its
                # addressable shards — with ZeRO the Adam moments are
                # sharded over hosts and rank 0 alone could not even
                # serialize them; a rank-0-only call deadlocks the rest
                # of the pod in the next step's collectives)
                ckpt.save_train_state(f"{self.out_dir}/models", epoch, state)

            if val_loader is not None and epoch % cfg.train.val_interval == 0:
                viz_box = ({} if self.visualize and jax.process_count() == 1
                           else None)
                loss_sum, n_val = sharded_val_stats(
                    self.eval_step, state.params, val_loader, self.aux,
                    jax.process_count(), last_batch_box=viz_box,
                )
                val_loss = _global_val_loss(loss_sum, n_val)
                if is_main:
                    self.logger.info("Validate at Epoch %d : %.6f", epoch, val_loss)
                if viz_box is not None and viz_box.get("batch") is not None:
                    self._visualize_val(state.params, viz_box["batch"], epoch)
                if self.writer is not None and is_main:
                    self.writer.add_scalars(
                        "Loss", {"train": epoch_loss, "val": val_loss}, epoch
                    )
                if val_loss < best_loss:
                    best_loss = val_loss
                    # collective save — all processes participate (above);
                    # doubles as the in-memory best copy (restored below)
                    ckpt.save_params(f"{self.out_dir}/models", state.params,
                                     "best")
                    have_best = True
                    self.logger.info("current best model is saved at %d epoch.", epoch)
                    stale_epochs = 0
                else:
                    stale_epochs += 1
                    if stale_epochs >= cfg.train.early_stop:
                        self.logger.info(
                            "No improvement in validation loss for %d epochs, "
                            "terminating training.", stale_epochs,
                        )
                        break

        if not have_best:
            return state.params, state
        # restore onto the final params' shardings (collective, multi-host
        # safe — every process reads its addressable shards)
        best_params = ckpt.restore_params(f"{self.out_dir}/models",
                                          state.params, "best")
        return best_params, state

    # ------------------------------------------------------------------
    def _visualize_val(self, params, batch: Batch, epoch: int) -> None:
        """Reference val-time triptychs (models/pangu_sample.py:332-358):
        de-normalized prediction vs ground truth vs input for upper 'u' at
        level 12 and surface 'msl', PNGs under {out_dir}/png_training keyed
        by epoch. Geometry-robust: variable/level indices clip to the
        config; failures (e.g. a non-forward-able LoRA tree) degrade to a
        warning — a plot must never kill a training run."""
        import os

        try:
            from pangu_tpu.config import (
                ERA5_SURFACE_VARIABLES,
                ERA5_UPPER_VARIABLES,
            )
            from pangu_tpu.eval.visualize import plot_surface, plot_upper
            from pangu_tpu.rollout.autoregressive import make_forecast_step

            u_in = np.asarray(batch.upper)
            s_in = np.asarray(batch.surface)
            t_u = np.asarray(batch.target_upper)
            t_s = np.asarray(batch.target_surface)
            if u_in.ndim == 6:  # leading grad-accumulation microbatch axis
                u_in, s_in, t_u, t_s = u_in[0], s_in[0], t_u[0], t_s[0]
            step = make_forecast_step(self.model, donate=False)
            out_u, out_s = step(params, u_in, s_in, self.aux)
            out_u, out_s = np.asarray(out_u), np.asarray(out_s)

            m = self.cfg.model
            up_names = [ERA5_UPPER_VARIABLES[i]
                        if i < len(ERA5_UPPER_VARIABLES) else f"u{i}"
                        for i in range(m.upper_vars)]
            sf_names = [ERA5_SURFACE_VARIABLES[i]
                        if i < len(ERA5_SURFACE_VARIABLES) else f"s{i}"
                        for i in range(m.surface_vars)]
            png = os.path.join(self.out_dir, "png_training")
            plot_upper(out_u[0], t_u[0], u_in[0],
                       var="u" if "u" in up_names else up_names[0],
                       level=min(12, m.levels - 1), step=epoch, path=png,
                       var_names=up_names)
            plot_surface(out_s[0], t_s[0], s_in[0],
                         var="msl" if "msl" in sf_names else sf_names[0],
                         step=epoch, path=png, var_names=sf_names)
        except Exception as e:  # noqa: BLE001 — viz is best-effort
            self.logger.warning(
                "val-time visualization failed at epoch %d: %s: %s",
                epoch, type(e).__name__, e,
            )

    # ------------------------------------------------------------------
    def resume(
        self, epoch: Optional[int] = None,
        template: Optional[TrainState] = None,
    ) -> Tuple[TrainState, int]:
        """Restore a train_{epoch} checkpoint (latest if epoch is None).

        ``template`` supplies the state tree shape when the trainable tree is
        not the full model (e.g. a LoRA tree)."""
        d = f"{self.out_dir}/models"
        epoch = epoch if epoch is not None else ckpt.latest_epoch(d)
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {d}")
        if template is None:
            template = init_train_state(self.model, self.cfg, self.aux,
                                        self.optimizer)
        state, saved_epoch = ckpt.restore_train_state(d, epoch, template)
        return state, saved_epoch + 1
