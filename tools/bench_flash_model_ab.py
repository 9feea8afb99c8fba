"""Interleaved FULL-MODEL A/B of flash-attention configs.

Cross-session numbers on the axon relay drift by up to ~9% over hours (the
same kernel config measured 54.6 and 59.4 ms five hours apart), so config
decisions must come from SAME-PROCESS, INTERLEAVED measurements: this traces
one jitted forward per config (the flash env knobs are read at trace time),
then times them in alternating rounds A,B,A,B,... so any drift hits both
equally.

Usage: python tools/bench_flash_model_ab.py [--cfg YAML] [--batch 128]
"""

import argparse
import os
import time
import types

import numpy as np

import _init_paths  # noqa: F401

from buctd_tpu.utils.compcache import enable as _enable_compcache

_enable_compcache()

CONFIGS = [
    # label -> env dict traced under (defaults: grid kernel, 1024^2, f32 sm)
    ("grid 1024^2 f32-sm (dflt)", {}),
    ("grid 1152^2 bf16-sm (r3)", {"BUCTD_FLASH_TILE": "1152",
                                  "BUCTD_FLASH_BF16_SOFTMAX": "1"}),
]
KNOBS = ("BUCTD_FLASH_TILE", "BUCTD_FLASH_BF16_SOFTMAX", "BUCTD_FLASH_KVRES")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="/root/repo/experiments/coco/buctd/"
                                     "coam_w48_384x288.yaml")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--steps", type=int, default=3)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench_forward import zeros_variables

    from buctd_tpu.config import default_config, update_config
    from buctd_tpu.data.pipeline import num_input_channels
    from buctd_tpu.models import get_model

    cfg = default_config()
    update_config(cfg, types.SimpleNamespace(
        cfg=a.cfg, opts=[], modelDir="", logDir="", dataDir=""))
    model = get_model(cfg, dtype=jnp.bfloat16)
    img_w, img_h = cfg.MODEL.IMAGE_SIZE
    C = num_input_channels(cfg)
    variables = zeros_variables(model, (1, img_h, img_w, C))
    x = jnp.array(np.random.RandomState(0)
                  .rand(a.batch, img_h, img_w, C).astype(np.float32))

    fns = []
    for label, env in CONFIGS:
        for k in KNOBS:
            os.environ.pop(k, None)
        os.environ.update(env)
        # a fresh jit per config: the env knobs bind at trace time
        fn = jax.jit(lambda v, x: model.apply(v, x, train=False).astype(
            jnp.float32).sum())
        float(fn(variables, x))             # compile + warm
        fns.append((label, fn))
    for k in KNOBS:
        os.environ.pop(k, None)

    times = {label: [] for label, _ in fns}
    for _ in range(a.rounds):
        for label, fn in fns:
            t0 = time.perf_counter()
            for _ in range(a.steps):
                float(fn(variables, x))
            times[label].append((time.perf_counter() - t0) / a.steps)
    name = os.path.basename(a.cfg).split("_384x288")[0]
    for label, ts in times.items():
        ms = np.array(ts) * 1e3
        print(f"{name} b{a.batch} {label:28s}: median {np.median(ms):8.2f} ms "
              f"(min {ms.min():.2f}, max {ms.max():.2f}, n={len(ms)}) "
              f"-> {a.batch / (np.median(ms) / 1e3):7.1f} crops/s", flush=True)


if __name__ == "__main__":
    main()
