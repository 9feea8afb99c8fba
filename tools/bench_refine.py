"""3x-iterative-refinement serving bench (CoAM-W48, on-device lax.scan).

Measures ms/image for varying pose counts P — crowded OCHuman frames carry
dozens of instances, and the query-chunked attention (models/attention.py)
lifts the old P<=16 practical cap.

Usage: python tools/bench_refine.py [P...]   (default: 16 32 64)
"""

import sys
import time
import types

import numpy as np

import _init_paths  # noqa: F401

from buctd_tpu.utils.compcache import enable as _enable_compcache

_enable_compcache()

STEPS = 5
IMG_H, IMG_W = 960, 720


def main():
    import jax
    import jax.numpy as jnp

    from buctd_tpu.config import default_config, update_config
    from buctd_tpu.core.refine import make_refine_fn
    from buctd_tpu.models import get_model

    cfg = default_config()
    update_config(cfg, types.SimpleNamespace(
        cfg="/root/repo/experiments/coco/buctd/coam_w48_384x288.yaml",
        opts=["TPU.EVAL_DTYPE", "bfloat16"], modelDir="", logDir="", dataDir=""))
    model = get_model(cfg, dtype=jnp.bfloat16)
    J = int(cfg.MODEL.NUM_JOINTS)
    colors = np.linspace(0, 255, J * 3).reshape(-1, 3)

    x0 = jnp.zeros((1, 384, 288, 6), jnp.float32)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x0,
                                               train=False))
    variables = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()

    refine = make_refine_fn(cfg, model, colors, n_iters=3)
    rng = np.random.RandomState(0)
    image = jnp.array(rng.rand(IMG_H, IMG_W, 3).astype(np.float32) * 255)

    for P in [int(p) for p in sys.argv[1:]] or [16, 32, 64]:
        cond = jnp.array(
            np.concatenate([rng.rand(P, J, 2) * [IMG_W, IMG_H],
                            np.ones((P, J, 1))], -1).astype(np.float32))
        try:
            def run(n):
                acc = None
                for _ in range(n):
                    p, m = refine(variables, image, cond)
                    s = p.sum() + m.sum()
                    acc = s if acc is None else acc + s
                return float(acc)

            run(1)
            run(2)
            t0 = time.perf_counter()
            run(STEPS)
            dt = (time.perf_counter() - t0) / STEPS
            print(f"3x refine CoAM-W48 {IMG_H}x{IMG_W} P={P:3d}: "
                  f"{dt * 1e3:8.2f} ms/image  ({P * 3 / dt:7.1f} crops/s)",
                  flush=True)
        except Exception as e:
            print(f"P={P}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
