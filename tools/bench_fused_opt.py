"""Interleaved A/B: TPU.FUSED_OPTIMIZER (flat-space adam) vs per-leaf optax.

The round-4 train attribution (PERF.md) put the optimizer + BN-apply epilogue
at 37.6 ms (7.5%) of the b128 preNet-W48 step, most of it per-leaf fusion
overhead across HRNet's ~1000 leaves.  state.py::_fused_flat runs the update
on one ravelled vector instead; this bench decides the default the only valid
way on the axon relay (CLAUDE.md): same process, alternating rounds.

Usage: python tools/bench_fused_opt.py [--cfg YAML] [--batch 128] [--rounds 6]
"""

import argparse
import time
import types

import numpy as np

import _init_paths  # noqa: F401

from buctd_tpu.utils.compcache import enable as _enable_compcache

_enable_compcache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="/root/repo/experiments/coco/buctd/"
                                     "prenet_w48_384x288.yaml")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--steps", type=int, default=3)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from buctd_tpu.config import default_config, update_config
    from buctd_tpu.models import get_model
    from buctd_tpu.ops import generate_target
    from buctd_tpu.train.state import create_train_state, make_train_step

    B = a.batch
    rng = np.random.RandomState(0)

    def build(fused):
        cfg = default_config()
        update_config(cfg, types.SimpleNamespace(
            cfg=a.cfg, opts=["TPU.FUSED_OPTIMIZER", str(fused)],
            modelDir="", logDir="", dataDir=""))
        model = get_model(cfg, is_train=True, dtype=jnp.bfloat16)
        shapes = jax.eval_shape(lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 384, 384 * 3 // 4, 6)),
            train=False))
        variables = jax.jit(lambda: jax.tree.map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()
        state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 384, 288, 6)),
                                   steps_per_epoch=1000, variables=variables)
        return cfg, model, state

    cfg, model, _ = build(True)
    J = int(cfg.MODEL.NUM_JOINTS)
    joints = rng.rand(B, J, 2).astype(np.float32) * [280, 370] + 4
    tgt, _ = generate_target(jnp.array(joints), jnp.ones((B, J)),
                             (288, 384), (72, 96), 3)
    batch = {
        "input": jnp.array(rng.rand(B, 384, 288, 6).astype(np.float32)),
        "target": jnp.array(np.asarray(tgt).transpose(0, 2, 3, 1)),
        "target_weight": jnp.ones((B, J), jnp.float32),
    }
    d_rng = jax.random.PRNGKey(1)

    arms = {}
    for fused in (True, False):
        cfg, model, state = build(fused)
        step = make_train_step(cfg, model)  # donates state
        # warm up / compile, then keep the state rolling between rounds
        for _ in range(2):
            state, metrics = step(state, batch, d_rng)
        float(metrics["loss"])
        arms[fused] = {"step": step, "state": state, "times": []}
        print(f"fused={fused}: compiled + warm", flush=True)

    for r in range(a.rounds):
        for fused in (True, False):
            arm = arms[fused]
            state = arm["state"]
            t0 = time.perf_counter()
            acc = None
            for _ in range(a.steps):
                state, metrics = arm["step"](state, batch, d_rng)
                acc = metrics["loss"] if acc is None else acc + metrics["loss"]
            float(acc)  # host fetch fences the round (relay block_until_ready lies)
            arm["times"].append((time.perf_counter() - t0) / a.steps)
            arm["state"] = state
        print(f"round {r}: fused {arms[True]['times'][-1] * 1e3:7.2f} ms  "
              f"per-leaf {arms[False]['times'][-1] * 1e3:7.2f} ms", flush=True)

    for fused in (True, False):
        ts = np.array(arms[fused]["times"]) * 1e3
        label = "fused " if fused else "per-leaf"
        print(f"{label}: median {np.median(ts):7.2f} ms  min {ts.min():7.2f}  "
              f"({B / np.median(ts) * 1e3:6.1f} crops/s)", flush=True)
    print(f"delta (per-leaf -> fused): "
          f"{np.median(arms[False]['times']) * 1e3 - np.median(arms[True]['times']) * 1e3:+.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
