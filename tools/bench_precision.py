"""Measure the serving-pipeline cost and output drift of relaxed warp/render
matmul precision (HIGHEST f32 vs DEFAULT bf16) on the live chip.

The aligned warp and colored render are banded matmuls on 0..255 pixel data;
HIGHEST costs ~6 bf16 MXU passes per f32 multiply.  This prints the e2e time
under each precision and the decoded-keypoint drift, to decide the serving
default (AP-parity eval keeps HIGHEST regardless).

Usage: python tools/bench_precision.py [BATCH]
"""

import sys
import time
import types

import numpy as np

import _init_paths  # noqa: F401

from buctd_tpu.utils.compcache import enable as _enable_compcache

_enable_compcache()

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
STEPS = 10
SRC_HW = 512


def main():
    import jax
    import jax.numpy as jnp

    from buctd_tpu.config import default_config, update_config
    from buctd_tpu.geometry import affine_points_jax, make_affine_jax
    from buctd_tpu.models import get_model
    from buctd_tpu.ops import get_final_preds, render_condition_colored
    from buctd_tpu.ops.warp import warp_affine_aligned

    cfg = default_config()
    update_config(cfg, types.SimpleNamespace(
        cfg="/root/repo/experiments/coco/buctd/prenet_w48_384x288.yaml",
        opts=[], modelDir="", logDir="", dataDir=""))
    model = get_model(cfg, dtype=jnp.bfloat16)
    img_w, img_h = cfg.MODEL.IMAGE_SIZE
    hm_w, hm_h = cfg.MODEL.HEATMAP_SIZE
    J = cfg.MODEL.NUM_JOINTS
    colors = np.linspace(0, 255, J * 3).reshape(-1, 3)

    rng = np.random.RandomState(0)
    images = jnp.array(rng.rand(B, SRC_HW, SRC_HW, 3).astype(np.float32))
    centers = jnp.array(rng.rand(B, 2).astype(np.float32) * 200 + 150)
    scales = jnp.array(rng.rand(B, 2).astype(np.float32) * 0.5 + 1.0)
    joints = jnp.array(rng.rand(B, J, 2).astype(np.float32) * 180 + 60)

    x0 = jnp.zeros((1, img_h, img_w, 6), jnp.float32)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x0,
                                               train=False))
    variables = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()
    mean = jnp.array([0.485, 0.456, 0.406])
    std = jnp.array([0.229, 0.224, 0.225])
    zeros = jnp.zeros(B)

    def make_e2e(precision):
        def e2e(v, im, c, s, cj):
            ti = make_affine_jax(c, s, zeros, (img_w, img_h), inv=True)
            cr = warp_affine_aligned(im, ti, (img_h, img_w), precision=precision)
            tf = make_affine_jax(c, s, zeros, (img_w, img_h), inv=False)
            ci = render_condition_colored(affine_points_jax(cj, tf), colors,
                                          (img_h, img_w),
                                          precision=precision) / 255.0
            xx = jnp.concatenate([(cr - mean) / std, ci], axis=-1)
            h = model.apply(v, xx, train=False)
            return get_final_preds(h.astype(jnp.float32).transpose(0, 3, 1, 2),
                                   c, s, (hm_w, hm_h), post_process=True)

        return jax.jit(e2e)

    results = {}
    for name, prec in (("highest", "highest"), ("default", "default")):
        fn = make_e2e(prec)

        def run(steps):
            acc = None
            for _ in range(steps):
                p, m = fn(variables, images, centers, scales, joints)
                s = p.sum() + m.sum()
                acc = s if acc is None else acc + s
            return float(acc)

        run(1)
        run(3)
        t0 = time.perf_counter()
        run(STEPS)
        dt = (time.perf_counter() - t0) / STEPS
        preds, maxvals = fn(variables, images, centers, scales, joints)
        results[name] = (np.asarray(preds), np.asarray(maxvals))
        print(f"{name:8s}: {dt * 1e3:8.2f} ms/step  {B / dt:8.1f} crops/s",
              flush=True)

    dp = np.linalg.norm(results["highest"][0] - results["default"][0], axis=-1)
    dm = np.abs(results["highest"][1] - results["default"][1])
    print(f"pred drift px: median {np.median(dp):.4f}  p99 "
          f"{np.percentile(dp, 99):.4f}  max {dp.max():.4f}")
    print(f"conf drift:    max {dm.max():.5f}")


if __name__ == "__main__":
    main()
