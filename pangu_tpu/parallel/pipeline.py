"""GPipe-style pipeline parallelism over a ``pipe`` mesh axis.

TPU-native re-design of the reference's DeepSpeed pipeline prototype
(``PanguModelPipe``, reference models/pangu_model_deepspeed.py:18-125): the
same four stages split at the U-Net joints —

  stage 0: patch_embed + layer0
  stage 1: downsample + layer1
  stage 2: layer2
  stage 3: upsample + layer3 + skip-concat + patch_recovery

— but scheduled as ONE SPMD program instead of a multi-process 1F1B engine:
every device runs the same ``shard_map``-ed scan; at tick ``t`` device ``d``
applies its stage (``lax.switch`` on ``lax.axis_index('pipe')``) to the
activation that arrived from device ``d-1``, then ``lax.ppermute`` rotates
activations one hop along the ring. Microbatch ``m`` enters at device 0 on
tick ``m`` and exits at device ``S-1`` on tick ``m+S-1`` — the classic GPipe
fill/drain schedule, with the bubble fraction ``(S-1)/(M+S-1)``.

Honest sharding: each stage's parameters live only on that stage's devices —
the per-stage param trees are raveled to flat vectors, padded to a common
length, stacked to ``(S, Pmax)`` and sharded ``P('pipe')``. Gradients come
back in the same layout, so the optimizer update runs stage-local with no
parameter gathering at all (stronger than the reference's ZeRO-2 + PP combo).

The skip connection (stage 0's output feeds stage 3,
reference models/pangu_model.py:98) travels WITH its microbatch through
stages 1 and 2 as a pass-through payload slot — no extra cross-stage wiring.

Composes with data parallelism (mesh ``('data','pipe',...)``: microbatches
are batch-sharded over ``data``; the pipeline rotates within each data
replica). Spatial (lat/lon) sharding inside a pipeline stage is not supported
in this release — pick PP x DP or DP x SP (docs/PARITY.md discusses why SP is
the default recommendation on TPU).

Backward is plain ``jax.grad`` through the scan: ``ppermute`` transposes to
the reverse rotation, so the gradient drains back through the ring in
reverse schedule order — XLA derives the 1F1B-equivalent comm pattern that
DeepSpeed hand-implements.

Stochastic depth works in pipeline mode: a base rng is folded with the tick
index and the stage id inside the scan, so every (stage, microbatch) pair
draws an independent droppath stream (the reference's pipeline prototype is
droppath-free smoke; this closes that divergence). Per-block
rematerialization stays on for training.

Transport dtype: inter-stage activations travel in ``transport_dtype``
(default bfloat16 when the model computes in bf16 — halves ring-transfer
bytes). Raw PHYSICAL inputs never ride the ring in reduced precision:
stage 0 reads its microbatch directly from the (replicated) f32 input
arrays, bypassing the transport buffer, because bf16-rounding pre-
normalization magnitudes (Z ~ 5e4) would cost ~3% of a std-dev.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.flatten_util import ravel_pytree
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pangu_tpu.aux import AuxConstants, norm_data
from pangu_tpu.config import ModelConfig, PanguConfig
from pangu_tpu.geometry import compute_geometry
from pangu_tpu.model.pangu import backbone_modules

try:  # jax >= 0.6 exposes shard_map at the top level (kwarg: check_vma)
    from jax import shard_map as _raw_shard_map
except ImportError:  # pragma: no cover - older jax (kwarg: check_rep)
    from jax.experimental.shard_map import shard_map as _raw_shard_map


def _shard_map(f=None, **kw):
    """shard_map with the replication-check kwarg name of the running jax
    (check_vma on >= 0.6, check_rep before)."""
    import inspect

    if "check_vma" in kw and \
            "check_vma" not in inspect.signature(_raw_shard_map).parameters:
        kw["check_rep"] = kw.pop("check_vma")  # pragma: no cover
    return _raw_shard_map(f, **kw) if f is not None else _raw_shard_map(**kw)


#: the full backbone as an ordered op chain; a pipeline stage is any
#: contiguous slice of it. Op names double as the top-level param-tree keys.
OPS: Tuple[str, ...] = ("patch_embed", "layer0", "downsample", "layer1",
                        "layer2", "upsample", "layer3", "patch_recovery")

#: the reference's 4-way split at the U-Net joints (same partition as
#: reference models/pangu_model_deepspeed.py:24-66).
DEFAULT_STAGES: Tuple[Tuple[str, ...], ...] = (
    ("patch_embed", "layer0"),
    ("downsample", "layer1"),
    ("layer2",),
    ("upsample", "layer3", "patch_recovery"),
)

NUM_STAGES = len(DEFAULT_STAGES)  # the default split's size

# kept under its historical name for importers of the 4-way split
STAGE_MODULES = DEFAULT_STAGES


def default_stages(n: int) -> Tuple[Tuple[str, ...], ...]:
    """A contiguous n-way partition of :data:`OPS`.

    n=4 is the reference's U-Net-joint split; n=2 cuts at the single
    mid-network joint (balanced by depth: layer1/layer2 hold the deep
    blocks); other n in [1, 8] fall back to near-equal contiguous chunks.
    """
    if n == 4:
        return DEFAULT_STAGES
    if n == 2:
        return (("patch_embed", "layer0", "downsample", "layer1"),
                ("layer2", "upsample", "layer3", "patch_recovery"))
    if not 1 <= n <= len(OPS):
        raise ValueError(f"pipeline stages must be in [1, {len(OPS)}], got {n}")
    chunks = np.array_split(np.arange(len(OPS)), n)
    return tuple(tuple(OPS[i] for i in c) for c in chunks)


def _validate_stages(stages: Sequence[Sequence[str]]) -> Tuple[Tuple[str, ...], ...]:
    stages = tuple(tuple(s) for s in stages)
    flat = tuple(op for st in stages for op in st)
    if flat != OPS:
        raise ValueError(
            f"stages must be an ordered contiguous partition of {OPS}, "
            f"got {stages}")
    if any(len(s) == 0 for s in stages):
        raise ValueError("empty pipeline stage")
    return stages


class PanguStage(nn.Module):
    """A contiguous slice of the backbone op chain as a standalone module.

    Submodules come from :func:`backbone_modules` with the exact names used
    by ``PanguModel``, so a full model's param tree partitions cleanly into
    stage trees (:func:`split_stage_params`) and back.

    ``__call__`` maps a boundary payload tuple to a boundary payload tuple.
    The skip connection (reference models/pangu_model.py:98) is CAPTURED by
    the ``downsample`` op (its input) and CONSUMED by ``patch_recovery``
    (concat), so payloads between those boundaries are ``(x, skip)`` and the
    skip rides the ring with its microbatch regardless of where the stage
    cuts fall.
    """

    cfg: ModelConfig
    ops: Tuple[str, ...]
    remat: bool = False

    @nn.compact
    def __call__(self, payload: Tuple[jnp.ndarray, ...], aux: AuxConstants,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, ...]:
        _, mods = backbone_modules(self.cfg, deterministic=not self.remat)
        det = deterministic
        for op in self.ops:
            if op == "patch_embed":
                upper, surface = payload
                payload = (mods["patch_embed"](upper, surface, aux),)
            elif op == "downsample":
                (x,) = payload
                payload = (mods["downsample"](x, det), x)  # capture skip
            elif op == "patch_recovery":
                x, skip = payload
                y = jnp.concatenate([skip, x], axis=-1)
                payload = tuple(mods["patch_recovery"](y))
            elif op == "layer0":
                (x,) = payload
                payload = (mods[op](x, det),)
            else:  # layer1 / layer2 / upsample / layer3: pass skip through
                x, skip = payload
                payload = (mods[op](x, det), skip)
        return payload


def split_stage_params(params: Any,
                       stages: Sequence[Sequence[str]] = DEFAULT_STAGES
                       ) -> List[Any]:
    """Partition a full PanguModel param tree into per-stage trees."""
    inner = params["params"]
    return [{"params": {k: inner[k] for k in names}} for names in stages]


def merge_stage_params(stage_params: Sequence[Any]) -> Any:
    """Inverse of :func:`split_stage_params`."""
    out = {}
    for tree in stage_params:
        out.update(tree["params"])
    return {"params": out}


def _boundary_shapes(cfg: ModelConfig, b: int, bi: int
                     ) -> List[Tuple[int, ...]]:
    """Payload array shapes at op-chain boundary ``bi`` (0 = model input,
    ``len(OPS)`` = model output) for per-device microbatch size ``b``."""
    g = compute_geometry(cfg)
    io_shapes = [(b, cfg.upper_vars, cfg.levels, cfg.lat, cfg.lon),
                 (b, cfg.surface_vars, cfg.lat, cfg.lon)]
    outer = (b, g.z, g.h, g.w, cfg.dims[0])
    inner = (b, g.z, g.h2, g.w2, cfg.dims[1])
    outer3 = (b, g.z, g.h, g.w, cfg.dims[3])
    if bi == 0 or bi == len(OPS):
        return io_shapes
    if bi in (1, 2):          # after patch_embed / layer0
        return [outer]
    if bi in (3, 4, 5):       # after downsample / layer1 / layer2
        return [inner, outer]
    return [outer3, outer]    # after upsample / layer3 (bi 6, 7)


def _payload_shapes(cfg: ModelConfig, b: int,
                    stages: Sequence[Sequence[str]]
                    ) -> List[List[Tuple[int, ...]]]:
    """Payload shapes at each stage input boundary, plus the final output
    boundary, for the given stage partition."""
    bnds = [0]
    for st in stages:
        bnds.append(bnds[-1] + len(st))
    return [_boundary_shapes(cfg, b, bi) for bi in bnds]


def _pack(arrays: Sequence[jnp.ndarray], size: int, dtype) -> jnp.ndarray:
    flat = jnp.concatenate([a.astype(dtype).reshape(-1) for a in arrays])
    return jnp.pad(flat, (0, size - flat.shape[0]))


def _unpack(buf: jnp.ndarray, shapes: Sequence[Tuple[int, ...]]
            ) -> List[jnp.ndarray]:
    out, off = [], 0
    for s in shapes:
        n = int(np.prod(s))
        out.append(jax.lax.dynamic_slice_in_dim(buf, off, n).reshape(s))
        off += n
    return out


class PanguPipeline:
    """Builds jitted pipelined forward / train-step functions.

    Parameters are held as the stacked flat ``(S, Pmax)`` array (see module
    docstring). Use :meth:`stack_params` / :meth:`unstack_params` to convert
    to and from ordinary PanguModel param trees (checkpoints and weight
    importers speak the tree form).
    """

    def __init__(self, cfg: PanguConfig, mesh: Mesh, params_template: Any,
                 transport_dtype: Optional[Any] = None,
                 stages: Optional[Sequence[Sequence[str]]] = None):
        pipe = mesh.shape.get("pipe", 1)
        self.stages = (_validate_stages(stages) if stages is not None
                       else default_stages(pipe))
        self.num_stages = len(self.stages)
        if pipe != self.num_stages:
            raise ValueError(
                f"pipeline needs a 'pipe' mesh axis of size "
                f"{self.num_stages} (one device group per stage), "
                f"got {dict(mesh.shape)}"
            )
        if mesh.shape.get("lat", 1) != 1 or mesh.shape.get("lon", 1) != 1:
            raise ValueError("pipeline mode does not compose with spatial "
                             "(lat/lon) sharding; use PP x DP "
                             "(docs/PARITY.md discusses why)")
        self.cfg = cfg
        self.mesh = mesh
        # inter-stage ring transfers ride in the model's compute dtype by
        # default (half the bytes for bf16 models); see module docstring for
        # why raw inputs bypass this buffer
        self.transport_dtype = jnp.dtype(
            transport_dtype if transport_dtype is not None
            else cfg.model.compute_dtype)
        stage_trees = split_stage_params(params_template, self.stages)
        self._unravels: List[Callable] = []
        self._sizes: List[int] = []
        for tree in stage_trees:
            flat, unravel = ravel_pytree(tree)
            self._sizes.append(flat.shape[0])
            self._unravels.append(unravel)
        self.pmax = max(self._sizes)

    # -- param layout -------------------------------------------------------

    def stack_params(self, params: Any) -> jax.Array:
        """Full param tree -> (S, Pmax) flat stack sharded P('pipe')."""
        rows = []
        for tree in split_stage_params(params, self.stages):
            flat, _ = ravel_pytree(tree)
            rows.append(np.pad(np.asarray(flat, np.float32),
                               (0, self.pmax - flat.shape[0])))
        stacked = np.stack(rows)
        return jax.device_put(
            stacked, NamedSharding(self.mesh, P("pipe", None)))

    def unstack_params(self, stacked: jax.Array) -> Any:
        """(S, Pmax) flat stack -> full param tree (host-side)."""
        rows = np.asarray(stacked)
        trees = [self._unravels[i](jnp.asarray(rows[i, : self._sizes[i]]))
                 for i in range(self.num_stages)]
        return merge_stage_params(trees)

    # -- core schedule ------------------------------------------------------

    def _apply(self, stacked: jax.Array, upper: jnp.ndarray,
               surface: jnp.ndarray, aux: AuxConstants, num_microbatches: int,
               remat: bool, rng: Optional[jax.Array] = None,
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Pipelined forward. upper (B, Vu, L, lat, lon) / surface
        (B, Vs, lat, lon); B must be divisible by num_microbatches x the
        data-axis size. Returns model outputs in normalized space, (B, ...).

        With ``rng`` set, stochastic depth (and dropout) run live: the key
        is folded with (tick, stage) inside the schedule so every
        (stage, microbatch) application draws an independent stream."""
        cfg, mcfg = self.cfg, self.cfg.model
        mesh, S, M = self.mesh, self.num_stages, num_microbatches
        dp = mesh.shape.get("data", 1)
        B = upper.shape[0]
        if B % (M * dp):
            raise ValueError(f"batch {B} not divisible by microbatches {M} "
                             f"x data axis {dp}")
        bl = B // (M * dp)  # per-device microbatch size

        shapes = _payload_shapes(mcfg, bl, self.stages)
        sizes = [sum(int(np.prod(s)) for s in shp) for shp in shapes]
        buf_size = max(sizes)
        out_size = sizes[-1]
        bdt = self.transport_dtype
        deterministic = rng is None
        if deterministic:
            rng = jax.random.PRNGKey(0)  # untouched placeholder
        unravels, psizes = self._unravels, self._sizes

        def stage_branch(i: int):
            def branch(local_flat, buf, aux, mu, ms, m, key):
                p = unravels[i](local_flat[: psizes[i]])
                if i == 0:
                    # microbatch enters HERE, straight from the replicated
                    # f32 inputs — never rounded to the transport dtype
                    payload = (
                        jax.lax.dynamic_index_in_dim(mu, m, 0, False),
                        jax.lax.dynamic_index_in_dim(ms, m, 0, False),
                    )
                else:
                    payload = tuple(_unpack(buf, shapes[i]))
                stage = PanguStage(mcfg, self.stages[i], remat=remat)
                if deterministic:
                    out = stage.apply(p, payload, aux)
                else:
                    kp, kd = jax.random.split(key)
                    out = stage.apply(p, payload, aux, False,
                                      rngs={"droppath": kp, "dropout": kd})
                # second slot: the MODEL OUTPUTS in f32. Only the last
                # stage produces them (statically known per branch), so the
                # final normalized fields never round through the bf16
                # transport dtype — the same protection raw inputs get on
                # the way in. The ring itself stays in the transport dtype.
                if i == S - 1:
                    out32 = _pack(out, out_size, jnp.float32)
                else:
                    out32 = jnp.zeros((out_size,), jnp.float32)
                return _pack(out, buf_size, bdt), out32
            return branch

        branches = [stage_branch(i) for i in range(S)]

        io_spec_u = P(None, "data", None, None, None, None)
        io_spec_s = P(None, "data", None, None, None)

        @partial(
            _shard_map,
            mesh=mesh,
            in_specs=(P("pipe", None), io_spec_u, io_spec_s, P(), P()),
            out_specs=(io_spec_u, io_spec_s),
            check_vma=False,
        )
        def run(flat_block, micro_u, micro_s, aux, rng):
            sid = jax.lax.axis_index("pipe")
            # fold the data-axis index too: rng arrives replicated (P()),
            # and without this every data-parallel replica would draw
            # IDENTICAL droppath/dropout masks — correlated regularization
            # noise the non-pipeline path doesn't have
            did = jax.lax.axis_index("data")
            local_flat = flat_block[0]

            def tick(carry, t):
                buf, outs = carry
                m = jnp.minimum(t, M - 1)
                key = jax.random.fold_in(
                    jax.random.fold_in(jax.random.fold_in(rng, t), sid), did)
                out, out32 = jax.lax.switch(sid, branches, local_flat, buf,
                                            aux, micro_u, micro_s, m, key)
                j = t - (S - 1)
                upd = jax.lax.dynamic_update_slice(
                    outs, out32[None], (jnp.maximum(j, 0), 0))
                outs = jnp.where((sid == S - 1) & (j >= 0), upd, outs)
                buf = jax.lax.ppermute(
                    out, "pipe", [(i, (i + 1) % S) for i in range(S)])
                return (buf, outs), None

            buf0 = jnp.zeros((buf_size,), bdt)
            outs0 = jnp.zeros((M, out_size), jnp.float32)
            (_, outs), _ = jax.lax.scan(tick, (buf0, outs0),
                                        jnp.arange(M + S - 1))
            # only the last stage holds real outputs; psum replicates them
            # across the pipe ring (a no-op-sized collective: S-1 zeros).
            outs = jax.lax.psum(
                jnp.where(sid == S - 1, outs, jnp.zeros((), jnp.float32)),
                "pipe")
            nu = int(np.prod(shapes[-1][0]))
            u = outs[:, :nu].reshape((M,) + shapes[-1][0])
            s = outs[:, nu:].reshape((M,) + shapes[-1][1])
            return u, s

        micro_u = upper.reshape((M, B // M) + upper.shape[1:])
        micro_s = surface.reshape((M, B // M) + surface.shape[1:])
        u, s = run(stacked, micro_u, micro_s, aux, rng)
        return (u.reshape((B,) + u.shape[2:]).astype(jnp.float32),
                s.reshape((B,) + s.shape[2:]).astype(jnp.float32))

    # -- public entry points ------------------------------------------------

    def make_forward(self, num_microbatches: int) -> Callable:
        """jitted (stacked_params, upper, surface, aux) -> normalized-space
        (out_upper, out_surface)."""

        @jax.jit
        def fwd(stacked, upper, surface, aux):
            return self._apply(stacked, upper, surface, aux,
                               num_microbatches, remat=False)

        return fwd

    def make_train_step(self, optimizer, num_microbatches: int) -> Callable:
        """jitted (state, batch, aux, rng=None) -> (state, loss) with the
        same loss semantics as train/step.py (weighted L1 on normalized
        targets). ``state.params`` is the stacked flat (S, Pmax) array;
        optimizer state shards along with it. Pass ``rng`` to enable
        stochastic depth / dropout (omitted -> deterministic forward, the
        pre-round-3 behavior)."""
        from pangu_tpu.train.loss import weighted_l1_loss
        from pangu_tpu.train.step import TrainState

        cfg = self.cfg

        def loss_fn(stacked, batch, aux, rng):
            out_u, out_s = self._apply(stacked, batch.upper, batch.surface,
                                       aux, num_microbatches, remat=True,
                                       rng=rng)
            tgt_u, tgt_s = norm_data(batch.target_upper, batch.target_surface,
                                     aux)
            mask = aux.custom_mask if cfg.train.use_custom_mask else None
            return weighted_l1_loss(
                out_u, out_s, tgt_u, tgt_s, aux,
                only_wind_speed=cfg.train.only_wind_speed_loss, mask=mask)

        pipe_sharding = NamedSharding(self.mesh, P("pipe", None))
        num_stages = self.num_stages

        def pin(tree):
            # pin param-stack-shaped leaves to P('pipe') so the output state
            # matches the input sharding (donation reuses buffers; no
            # retrace on the second call)
            return jax.tree.map(
                lambda l: jax.lax.with_sharding_constraint(l, pipe_sharding)
                if getattr(l, "ndim", 0) == 2 and l.shape[0] == num_stages
                else l,
                tree,
            )

        @partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
        def _step(state: TrainState, batch, aux, has_rng, rng):
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, batch, aux, rng if has_rng else None)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = jax.tree.map(jnp.add, state.params, updates)
            return TrainState(pin(params), pin(opt_state),
                              state.step + 1), loss

        def step(state, batch, aux, rng=None):
            return _step(state, batch, aux, rng is not None,
                         rng if rng is not None else jax.random.PRNGKey(0))

        return step

    def init_train_state(self, params: Any, optimizer):
        from pangu_tpu.train.step import TrainState

        stacked = self.stack_params(params)

        def spec_for(leaf):
            # Adam moments mirror the (S, Pmax) param stack and shard with
            # it; bookkeeping scalars (step counts) replicate.
            if (getattr(leaf, "ndim", 0) == 2
                    and leaf.shape[0] == self.num_stages):
                return NamedSharding(self.mesh, P("pipe", None))
            return NamedSharding(self.mesh, P())

        opt_state = jax.jit(
            optimizer.init,
            out_shardings=jax.tree.map(
                spec_for, jax.eval_shape(optimizer.init, stacked)),
        )(stacked)
        return TrainState(stacked, opt_state, jnp.zeros((), jnp.int32))
