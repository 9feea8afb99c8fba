"""TransPose-H serving bench: forward throughput vs batch (flash-attention path).

Usage: python tools/bench_transpose.py [BATCHES...]   (default: 16 64 128)
"""

import sys
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

    cfg = default_config()
    update_config(cfg, types.SimpleNamespace(
        cfg="/root/repo/experiments/coco/buctd/transpose_h_384x288.yaml",
        opts=[], modelDir="", logDir="", dataDir=""))
    model = get_model(cfg, dtype=jnp.bfloat16)

    x0 = jnp.zeros((1, 384, 288, 6), jnp.float32)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x0,
                                               train=False))
    variables = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    for B in [int(b) for b in sys.argv[1:]] or [16, 64, 128]:
        x = jnp.array(np.random.RandomState(0)
                      .rand(B, 384, 288, 6).astype(np.float32))
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
            from buctd_tpu.utils.summary import mfu_string
            print(f"TransPose-H b{B:3d}: {dt * 1e3:8.2f} ms/step  "
                  f"{B / dt:7.1f} crops/s{mfu_string(fwd, (variables, x), dt)}",
                  flush=True)
        except Exception as e:
            print(f"b{B}: FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
