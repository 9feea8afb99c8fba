"""Train-step time attribution (VERDICT r3 item 5: push past 34% MFU or prove
the ceiling).

Decomposes the b128 preNet-W48 train step into nested program costs, each as
its own jit reduced to ONE scalar host fetch (per-leaf fetches through the
axon relay would dwarf the step):

  fwd-eval    : eval-mode forward (BN running stats), the serving baseline
  fwd-train   : train-mode forward incl. BN batch-stat mutation + loss
  fwd+bwd     : value_and_grad, no optimizer
  full step   : grad + adam + BN update (make_train_step, donated state)
  plain-W48   : the same decomposition without the preNet stems (isolates the
                parity-mandated low-channel stems' backward cost)

bwd/fwd ratio >> 2 points at input-gradient convs / BN backward; the deltas
name the bottleneck.  Each variant runs in its own scope and frees its device
arrays before the next (both variants live at once OOM'd the 16 GB chip).
Usage: python tools/bench_train_attrib.py [BATCH]
"""

import gc
import sys
import time
import types

import numpy as np

import _init_paths  # noqa: F401

from buctd_tpu.utils.compcache import enable as _enable_compcache

_enable_compcache()

STEPS = 5
CFG = "/root/repo/experiments/coco/buctd/prenet_w48_384x288.yaml"


def _scalarize(fn):
    """Wrap fn in a jit that reduces every floating output to ONE scalar, so
    the timing fence is a single host fetch — per-leaf fetches through the
    axon relay (50-400 ms/dispatch eager) would dwarf the step being
    measured."""
    def wrapped(*args):
        out = fn(*args)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree.leaves(out)
                   if hasattr(x, "dtype")
                   and jnp.issubdtype(x.dtype, jnp.floating))
    return jax.jit(wrapped)


def _timeit(sfn, *args):
    float(sfn(*args))                      # compile + warm
    t0 = time.perf_counter()
    for _ in range(STEPS):
        float(sfn(*args))                  # one scalar fetch per step
    return (time.perf_counter() - t0) / STEPS


def _run_variant(variant, opts, B):
    from buctd_tpu.config import default_config, update_config
    from buctd_tpu.core.loss import make_loss
    from buctd_tpu.models import get_model
    from buctd_tpu.ops import generate_target
    from buctd_tpu.train.state import create_train_state, make_train_step

    cfg = default_config()
    update_config(cfg, types.SimpleNamespace(
        cfg=CFG, opts=opts, modelDir="", logDir="", dataDir=""))
    C = 6 if cfg.MODEL.CONDITIONAL_TOPDOWN else 3
    model = get_model(cfg, is_train=True, dtype=jnp.bfloat16)
    J = int(cfg.MODEL.NUM_JOINTS)
    loss_fn = make_loss(cfg)

    rng = np.random.RandomState(0)
    joints = rng.rand(B, J, 2).astype(np.float32) * [280, 370] + 4
    tgt, _ = generate_target(jnp.array(joints), jnp.ones((B, J)),
                             (288, 384), (72, 96), 3)
    batch = {
        "input": jnp.array(rng.rand(B, 384, 288, C).astype(np.float32)),
        "target": jnp.array(np.asarray(tgt).transpose(0, 2, 3, 1)),
        "target_weight": jnp.ones((B, J), jnp.float32),
    }
    shapes = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 384, 288, C)), train=False))
    variables = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    def _fwd_train(p, bs, batch):
        out, upd = model.apply({"params": p, "batch_stats": bs},
                               batch["input"], train=True,
                               mutable=["batch_stats"])
        return (loss_fn(out, batch["target"], batch["target_weight"]),
                upd["batch_stats"])

    t_fe = _timeit(_scalarize(lambda v, x: model.apply(v, x, train=False)),
                   variables, batch["input"])
    t_ft = _timeit(_scalarize(_fwd_train), params, batch_stats, batch)
    t_gr = _timeit(_scalarize(jax.value_and_grad(_fwd_train, has_aux=True)),
                   params, batch_stats, batch)

    # the full step donates state; time through the state chain (metrics
    # carry ONE scalar loss fetch per step, same fence cost as above)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 384, 288, C)),
                               steps_per_epoch=1000, variables=variables)
    step = make_train_step(cfg, model)
    d_rng = jax.random.PRNGKey(1)
    state, _ = step(state, batch, d_rng)    # compile + consume state
    state, m = step(state, batch, d_rng)
    float(m["loss"])                        # warm fence
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, batch, d_rng)
        float(metrics["loss"])
    t_st = (time.perf_counter() - t0) / STEPS

    print(f"{variant} b{B}:", flush=True)
    print(f"  fwd eval-mode : {t_fe * 1e3:8.2f} ms", flush=True)
    print(f"  fwd train+BN  : {t_ft * 1e3:8.2f} ms", flush=True)
    print(f"  fwd+bwd       : {t_gr * 1e3:8.2f} ms  "
          f"(bwd = {(t_gr - t_ft) * 1e3:.2f} ms, "
          f"bwd/fwd = {(t_gr - t_ft) / t_ft:.2f}x)", flush=True)
    print(f"  full step     : {t_st * 1e3:8.2f} ms  "
          f"(opt+BN apply = {(t_st - t_gr) * 1e3:.2f} ms)  "
          f"{B / t_st:7.1f} crops/s", flush=True)


def main():
    global jax, jnp
    import jax
    import jax.numpy as jnp

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    for variant, opts in [("preNet-W48", []),
                          ("plain-W48", ["MODEL.EXTRA.USE_PRE_NET", "False",
                                         "MODEL.CONDITIONAL_TOPDOWN", "False"])]:
        _run_variant(variant, opts, B)      # own scope: device arrays of one
        gc.collect()                        # variant free before the next


if __name__ == "__main__":
    main()
