"""Train-step bench on the live chip: fwd+bwd+adam ms/step, crops/s, and MFU.

Usage: python tools/bench_train.py [--cfg YAML] [BATCHES...] (default: 32 64 128)
Set BUCTD_REMAT=1 to rematerialize activations in the backward pass
(TPU.REMAT) — lifts the b128 HBM cap at the cost of recompute.
"""

import argparse
import os
import time
import types

import numpy as np

import _init_paths  # noqa: F401

from buctd_tpu.utils.compcache import enable as _enable_compcache

_enable_compcache()

STEPS = 5


def main():
    import jax
    import jax.numpy as jnp

    from buctd_tpu.config import default_config, update_config
    from buctd_tpu.models import get_model
    from buctd_tpu.ops import generate_target
    from buctd_tpu.train.state import create_train_state, make_train_step

    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="/root/repo/experiments/coco/buctd/"
                                     "prenet_w48_384x288.yaml")
    ap.add_argument("batches", nargs="*", type=int, default=[32, 64, 128])
    a = ap.parse_args()

    remat = os.environ.get("BUCTD_REMAT") == "1"
    cfg = default_config()
    update_config(cfg, types.SimpleNamespace(
        cfg=a.cfg,
        opts=(["TPU.REMAT", "True"] if remat else []),
        modelDir="", logDir="", dataDir=""))
    model = get_model(cfg, is_train=True, dtype=jnp.bfloat16)
    name = os.path.basename(a.cfg).replace("_384x288.yaml", "")
    tag = " +remat" if remat else ""
    J = int(cfg.MODEL.NUM_JOINTS)

    rng = np.random.RandomState(0)
    for B in a.batches:
        try:
            joints = rng.rand(B, J, 2).astype(np.float32) * [280, 370] + 4
            tgt, _ = generate_target(jnp.array(joints), jnp.ones((B, J)),
                                     (288, 384), (72, 96), 3)
            batch = {
                "input": jnp.array(rng.rand(B, 384, 288, 6).astype(np.float32)),
                "target": jnp.array(np.asarray(tgt).transpose(0, 2, 3, 1)),
                "target_weight": jnp.ones((B, J), jnp.float32),
            }
            shapes = jax.eval_shape(lambda: model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 384, 288, 6)), train=False))
            variables = jax.jit(lambda: jax.tree.map(
                lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()
            state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                       jnp.zeros((1, 384, 288, 6)),
                                       steps_per_epoch=1000, variables=variables)
            step = make_train_step(cfg, model)  # donates state
            d_rng = jax.random.PRNGKey(1)

            def run(n, state):
                acc = None
                for _ in range(n):
                    state, metrics = step(state, batch, d_rng)
                    acc = metrics["loss"] if acc is None else acc + metrics["loss"]
                return float(acc), state

            _, state = run(1, state)
            _, state = run(2, state)
            t0 = time.perf_counter()
            _, state = run(STEPS, state)
            dt = (time.perf_counter() - t0) / STEPS
            from buctd_tpu.utils.summary import mfu_string
            print(f"train step {name}{tag} b{B:3d}: {dt * 1e3:8.2f} ms  "
                  f"{B / dt:7.1f} crops/s"
                  f"{mfu_string(step, (state, batch, d_rng), dt)}", flush=True)
        except Exception as e:
            print(f"b{B}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
