"""Train state, optimizer/schedule factory, and the jitted+sharded train step.

Optimizer semantics match the reference (lib/utils/utils.py:256-272): Adam with LR
only (no weight decay), or SGD(momentum, wd, nesterov); LR follows torch MultiStepLR
(step-wise decay by LR_FACTOR at LR_STEP epochs — tools/train.py:212-215).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from ..core.loss import make_loss
from ..core.metrics import pck_accuracy
from ..parallel.mesh import data_sharding, replicated_sharding


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def make_lr_schedule(cfg, steps_per_epoch: int):
    """torch MultiStepLR: lr * LR_FACTOR**(#milestones passed), stepped per epoch."""
    base = float(cfg.TRAIN.LR)
    factor = float(cfg.TRAIN.LR_FACTOR)
    boundaries = {int(e) * steps_per_epoch: factor for e in cfg.TRAIN.LR_STEP}
    return optax.piecewise_constant_schedule(base, boundaries)


def _fused_flat(tx: optax.GradientTransformation) -> optax.GradientTransformation:
    """Run a GradientTransformation in flattened-parameter space.

    HRNet-family models carry ~1000 leaves (hundreds of 48-384-element BN
    scale/bias vectors), which made the per-leaf optax epilogue look like
    ~1000 tiny fusions worth collapsing — but the interleaved on-chip A/B
    (tools/bench_fused_opt.py) measured the flat form 6.5 ms/step SLOWER at
    b128 (466.6 vs 460.2 ms median): XLA already fuses the per-leaf update
    well, and ravel_pytree's concatenate/slice round-trip adds ~2 extra
    params-sized HBM passes.  Kept as an opt-in knob (TPU.FUSED_OPTIMIZER,
    default off) with a math-parity test; the math is unchanged
    (adam/sgd/weight-decay are elementwise, and the schedule count lives in
    the inner state either way).  Updates come back unravelled so
    ``optax.apply_updates`` and checkpoint templates see the normal tree;
    only the opt_state layout changes (flat m/v), which orbax round-trips
    like any other pytree.
    """
    from jax.flatten_util import ravel_pytree

    def init(params):
        flat, _ = ravel_pytree(params)
        return tx.init(flat)

    def update(grads, state, params=None):
        flat_g, unravel = ravel_pytree(grads)
        flat_p = ravel_pytree(params)[0] if params is not None else None
        flat_u, state = tx.update(flat_g, state, flat_p)
        return unravel(flat_u), state

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg, steps_per_epoch: int):
    # gradient accumulation (no reference counterpart): k micro-batches average
    # into one optimizer step, so large effective batches fit small meshes.
    # The LR milestones count OPTIMIZER steps, so the per-epoch step count the
    # schedule sees shrinks by k (the loader still yields micro-batches).
    k = max(int(getattr(cfg.TRAIN, "GRAD_ACCUM_STEPS", 1)), 1)
    sched = make_lr_schedule(cfg, max(steps_per_epoch // k, 1))
    if cfg.TRAIN.OPTIMIZER == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(float(cfg.TRAIN.WD)),
            optax.sgd(sched, momentum=float(cfg.TRAIN.MOMENTUM),
                      nesterov=bool(cfg.TRAIN.NESTEROV)),
        )
    elif cfg.TRAIN.OPTIMIZER == "adam":
        tx = optax.adam(sched)  # reference passes lr only (utils.py:267-270)
    else:
        raise ValueError(f"unknown optimizer {cfg.TRAIN.OPTIMIZER}")
    if k > 1:
        # averages grads over k update calls; params change only on the k-th
        tx = optax.MultiSteps(tx, every_k_schedule=k)
    if bool(getattr(cfg.TPU, "FUSED_OPTIMIZER", False)):
        # fusion wraps OUTSIDE MultiSteps so the grad accumulator is the flat
        # vector too (one big add instead of ~1000 leaf adds per micro-step)
        tx = _fused_flat(tx)
    return tx, sched


def create_train_state(cfg, model, rng, sample_input, steps_per_epoch: int = 1,
                       variables: dict | None = None) -> TrainState:
    if variables is None:
        variables = model.init(rng, sample_input, train=False)
    tx, _ = make_optimizer(cfg, steps_per_epoch)
    params = variables["params"]
    if isinstance(params, FrozenDict):
        params = params.unfreeze()
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        tx=tx,
    )


def make_train_step(cfg, model, mesh=None):
    """Build the jitted train step.

    batch: dict with 'input' (B,H,W,C), 'target' (B,h,w,J), 'target_weight' (B,J).
    Returns (new_state, metrics dict).  With a mesh, inputs are batch-sharded and
    state replicated; XLA inserts the gradient psums over ICI.
    """
    loss_fn = make_loss(cfg)

    def forward(params, batch_stats, x, dropout_rng):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           x, train=True, mutable=["batch_stats"],
                           rngs={"dropout": dropout_rng})

    mode = str(getattr(cfg.TPU, "REMAT_MODE", "modules"))
    if bool(getattr(cfg.TPU, "REMAT", False)) and (
            mode == "forward" or not getattr(model, "remat", "")):
        # 'forward' = explicit legacy whole-forward checkpoint.  It also
        # serves as the fallback when the model did NOT implement in-model
        # remat units (e.g. transpose/resnet carry no `remat` attr) so
        # TPU.REMAT=True is never a silent no-op.  NOTE: for HRNet a whole-
        # forward checkpoint cannot reduce the fwd+bwd peak (the backward
        # replay re-stores every needed intermediate) — the in-model
        # REMAT_MODE='modules' units are what fit b192+ (models/hrnet.py).
        forward = jax.checkpoint(forward)

    def step_fn(state: TrainState, batch, dropout_rng):
        # derive the per-step key INSIDE the jit: a host-side split would be an
        # eager device dispatch every step (expensive through the device relay)
        dropout_rng = jax.random.fold_in(dropout_rng, state.step)

        def compute_loss(params):
            out, mutated = forward(params, state.batch_stats, batch["input"],
                                   dropout_rng)
            loss = loss_fn(out, batch["target"], batch["target_weight"])
            return loss, (out, mutated["batch_stats"])

        (loss, (out, new_bs)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_bs)
        # PCK on (B,J,h,w) layout
        acc, cnt, _ = pck_accuracy(out.transpose(0, 3, 1, 2),
                                   batch["target"].transpose(0, 3, 1, 2))
        metrics = {"loss": loss, "acc": acc, "cnt": cnt}
        if bool(cfg.DEBUG.DEBUG):
            # heatmaps flow back only when debug dumps are on (function.py:169-172)
            metrics["out"] = out
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0)

    repl = replicated_sharding(mesh)
    data = data_sharding(mesh)
    # debug heatmaps stay data-sharded: a replicated out_sharding would force a
    # per-step all-gather even on the non-dump steps (the host only fetches
    # metrics["out"] every PRINT_FREQ iters of every 50th epoch)
    metrics_sh = {"loss": repl, "acc": repl, "cnt": repl}
    if bool(cfg.DEBUG.DEBUG):
        metrics_sh["out"] = data
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, metrics_sh),
        donate_argnums=0,
    )


def make_train_step_double(cfg, model, mesh=None):
    """λ-weighted double-target train step — the legacy cutmix/mixup loops'
    loss semantics (lib/core/train.py:179-343, MIPNet heritage, not reachable from
    the reference's CLI): loss = crit(out, target_f, w_f·λ_f) + crit(out, target_b,
    w_b·λ_b) where (f, b) are the foreground/background person targets.

    batch keys: input, target_f, target_b, target_weight_f, target_weight_b,
    lambda_f, lambda_b (B,).
    """
    loss_fn = make_loss(cfg)

    def step_fn(state: TrainState, batch, dropout_rng):
        def compute_loss(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["input"], train=True, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng})
            w_f = batch["target_weight_f"] * batch["lambda_f"][:, None]
            w_b = batch["target_weight_b"] * batch["lambda_b"][:, None]
            loss = (loss_fn(out, batch["target_f"], w_f)
                    + loss_fn(out, batch["target_b"], w_b))
            return loss, (out, mutated["batch_stats"])

        (loss, (out, new_bs)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_bs)
        # reference quirk: both accuracies are computed but acc.update uses the
        # LAST one — the background target's (train.py:224-228)
        acc, cnt, _ = pck_accuracy(out.transpose(0, 3, 1, 2),
                                   batch["target_b"].transpose(0, 3, 1, 2))
        return new_state, {"loss": loss, "acc": acc, "cnt": cnt}

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0)
    repl = replicated_sharding(mesh)
    data = data_sharding(mesh)
    return jax.jit(step_fn, in_shardings=(repl, data, repl),
                   out_shardings=(repl, repl), donate_argnums=0)


def make_train_step_mixed(cfg, model, mesh=None):
    """cutmix/mixup train step: on-device batch mixing + λ-weighted double loss.

    Takes a PLAIN batch (input, target, target_weight); the mixed double-target
    batch is constructed inside the jit (train/mixing.py) so splice/blend, the λ
    draw, and both losses are one fused program — the reference instead pre-mixes
    in CPU dataloader workers and ships 7-tuples (lib/core/train.py:179-343).
    """
    from .mixing import make_mix_fn

    mix_fn = make_mix_fn(cfg)
    if mix_fn is None:
        raise ValueError("TRAIN.MIX must be 'cutmix' or 'mixup' for the mixed step")
    loss_fn = make_loss(cfg)

    def step_fn(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        mix_rng, dropout_rng = jax.random.split(rng)
        mixed = mix_fn(mix_rng, batch)

        def compute_loss(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                mixed["input"], train=True, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng})
            w_f = mixed["target_weight_f"] * mixed["lambda_f"][:, None]
            w_b = mixed["target_weight_b"] * mixed["lambda_b"][:, None]
            loss = (loss_fn(out, mixed["target_f"], w_f)
                    + loss_fn(out, mixed["target_b"], w_b))
            return loss, (out, mutated["batch_stats"])

        (loss, (out, new_bs)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_bs)
        acc, cnt, _ = pck_accuracy(out.transpose(0, 3, 1, 2),
                                   mixed["target_b"].transpose(0, 3, 1, 2))
        return new_state, {"loss": loss, "acc": acc, "cnt": cnt}

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0)
    repl = replicated_sharding(mesh)
    data = data_sharding(mesh)
    return jax.jit(step_fn, in_shardings=(repl, data, repl),
                   out_shardings=(repl, repl), donate_argnums=0)


def make_eval_step(cfg, model, mesh=None):
    """Forward-only step returning NHWC heatmaps."""

    def step_fn(variables, inputs):
        return model.apply(variables, inputs, train=False)

    if mesh is None:
        return jax.jit(step_fn)
    repl = replicated_sharding(mesh)
    data = data_sharding(mesh)
    return jax.jit(step_fn, in_shardings=(repl, data), out_shardings=data)
