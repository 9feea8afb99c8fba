"""Generic serving-forward bench: throughput + MFU vs batch for any config.

Usage: python tools/bench_forward.py [--cfg YAML] [--label NAME] [BATCHES...]
(tools/bench_coam.py and tools/bench_transpose.py are presets over this.)

Timing fences through a host fetch (block_until_ready returns early on the
axon relay — CLAUDE.md); MFU adds analytic pallas-flash FLOPs to XLA
cost_analysis (buctd_tpu/utils/summary.py).
"""

import argparse
import time
import types

import numpy as np

import _init_paths  # noqa: F401

from buctd_tpu.utils.compcache import enable as _enable_compcache

_enable_compcache()

STEPS = 5


def zeros_variables(model, sample_shape):
    """Constant-filled variables as ONE jitted program (eager per-leaf fills
    would be 1000+ relay dispatches)."""
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros(sample_shape), train=False))
    return jax.jit(lambda: jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()


def run_forward_bench(cfg_path, label, batches):
    import jax
    import jax.numpy as jnp

    from buctd_tpu.config import default_config, update_config
    from buctd_tpu.data.pipeline import num_input_channels
    from buctd_tpu.models import get_model
    from buctd_tpu.utils.summary import mfu_string

    cfg = default_config()
    update_config(cfg, types.SimpleNamespace(
        cfg=cfg_path, opts=[], modelDir="", logDir="", dataDir=""))
    model = get_model(cfg, dtype=jnp.bfloat16)
    img_w, img_h = cfg.MODEL.IMAGE_SIZE
    C = num_input_channels(cfg)

    variables = zeros_variables(model, (1, img_h, img_w, C))
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    for B in batches:
        x = jnp.array(np.random.RandomState(0)
                      .rand(B, img_h, img_w, C).astype(np.float32))
        try:
            def run(steps):
                acc = None
                for _ in range(steps):
                    s = fwd(variables, x).astype(jnp.float32).sum()
                    acc = s if acc is None else acc + s
                return float(acc)

            run(1)
            run(2)
            t0 = time.perf_counter()
            run(STEPS)
            dt = (time.perf_counter() - t0) / STEPS
            print(f"{label} b{B:3d}: {dt * 1e3:8.2f} ms/step  "
                  f"{B / dt:8.1f} crops/s{mfu_string(fwd, (variables, x), dt)}",
                  flush=True)
        except Exception as e:
            print(f"{label} b{B:3d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:150]}", flush=True)


def main(default_cfg=None, default_label=None, default_batches=(16, 64, 128)):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=default_cfg or
                    "/root/repo/experiments/coco/buctd/prenet_w48_384x288.yaml")
    ap.add_argument("--label", default=default_label)
    ap.add_argument("batches", nargs="*", type=int,
                    default=list(default_batches))
    a = ap.parse_args()
    import os
    label = a.label or os.path.basename(a.cfg).split("_384x288")[0]
    run_forward_bench(a.cfg, label, a.batches)


if __name__ == "__main__":
    main()
