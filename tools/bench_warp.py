"""Micro-bench: rotated-warp engines (TPU.WARP_ENGINE) on the live chip.

Times the banded-matmul engine vs the pallas kernel on the device-pipeline shape
(batch of rotated 512x512 -> 384x288 crops) — the decision bench for VERDICT
round-1 item 6 (wire or drop the pallas warp).

Usage: python tools/bench_warp.py [BATCH]
"""

import sys
import time

import numpy as np

import _init_paths  # noqa: F401

from buctd_tpu.utils.compcache import enable as _enable_compcache

_enable_compcache()

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
STEPS = 10
SRC = 512


def main():
    import jax
    import jax.numpy as jnp

    from buctd_tpu.geometry import make_affine_jax
    from buctd_tpu.ops.warp import warp_affine_general

    rng = np.random.RandomState(0)
    images = jnp.array(rng.rand(B, SRC, SRC, 3).astype(np.float32))
    centers = jnp.array(rng.rand(B, 2).astype(np.float32) * 200 + 150)
    scales = jnp.array(rng.rand(B, 2).astype(np.float32) * 0.5 + 1.0)
    rots = jnp.array(rng.uniform(-40, 40, B).astype(np.float32))
    t_inv = make_affine_jax(centers, scales, rots, (288, 384), inv=True)

    outs = {}
    for engine in ("matmul", "pallas"):
        fn = jax.jit(lambda im, t, e=engine: warp_affine_general(
            im, t, (384, 288), engine=e))

        def run(steps):
            acc = None
            for _ in range(steps):
                s = fn(images, t_inv).sum()
                acc = s if acc is None else acc + s
            return float(acc)   # host fetch = the only reliable fence on axon

        run(1)
        run(3)
        t0 = time.perf_counter()
        run(STEPS)
        dt = (time.perf_counter() - t0) / STEPS
        outs[engine] = np.asarray(fn(images, t_inv))
        print(f"{engine:8s} b{B} rotated 512^2->384x288: {dt * 1e3:8.2f} ms/step "
              f"({B / dt:8.1f} crops/s)")

    err = np.abs(outs["matmul"] - outs["pallas"]).max()
    print(f"max |matmul - pallas| = {err:.5f} (0..255 pixel scale)")


if __name__ == "__main__":
    main()
