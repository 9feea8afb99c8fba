"""PreNet stem microbench: canonical PreNet vs the fused eval form, plus the
full W48 forward both ways (quantifies the models/fuse.py win end-to-end).

Usage: python tools/bench_stem.py [BATCHES...]   (default: 256 384)
"""

import argparse
import time
import types

import numpy as np

import _init_paths  # noqa: F401

from buctd_tpu.utils.compcache import enable as _enable_compcache

_enable_compcache()

STEPS = 5
CFG = "/root/repo/experiments/coco/buctd/prenet_w48_384x288.yaml"


def _time(fn, args, steps=STEPS):
    def run(n):
        acc = None
        for _ in range(n):
            s = fn(*args).astype("float32").sum()
            acc = s if acc is None else acc + s
        return float(acc)   # host fetch fences the chain (CLAUDE.md)

    run(1)
    run(2)
    t0 = time.perf_counter()
    run(steps)
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("batches", nargs="*", type=int, default=[256, 384])
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from buctd_tpu.config import default_config, update_config
    from buctd_tpu.models import get_model
    from buctd_tpu.models.fuse import maybe_fuse_prenet
    from buctd_tpu.models.hrnet import FusedPreNet, PreNet

    cfg = default_config()
    update_config(cfg, types.SimpleNamespace(
        cfg=CFG, opts=[], modelDir="", logDir="", dataDir=""))
    model = get_model(cfg, dtype=jnp.bfloat16)
    img_w, img_h = cfg.MODEL.IMAGE_SIZE

    shapes = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, img_h, img_w, 6)), train=False))
    variables = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()
    fmodel, fvars = maybe_fuse_prenet(cfg, model, variables)

    pn, fpn = PreNet(dtype=jnp.bfloat16), FusedPreNet(dtype=jnp.bfloat16)
    pn_vars = {k: v["_prenet"] for k, v in variables.items()
               if "_prenet" in v}
    fpn_vars = {"params": fvars["params"]["_prenet_fused"]}

    stem = jax.jit(lambda v, r, c: pn.apply(v, r, c, train=False))
    fstem = jax.jit(lambda v, r, c: fpn.apply(v, r, c))
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    ffwd = jax.jit(lambda v, x: fmodel.apply(v, x, train=False))

    for B in a.batches:
        x = jnp.array(np.random.RandomState(0)
                      .rand(B, img_h, img_w, 6).astype(np.float32))
        rgb, cond = x[..., :3], x[..., 3:6]
        t_pn = _time(stem, (pn_vars, rgb, cond))
        t_fpn = _time(fstem, (fpn_vars, rgb, cond))
        t_fwd = _time(fwd, (variables, x))
        t_ffwd = _time(ffwd, (fvars, x))
        print(f"b{B:3d}: preNet {t_pn * 1e3:7.2f} ms -> fused "
              f"{t_fpn * 1e3:7.2f} ms ({t_pn / t_fpn:4.2f}x) | W48 fwd "
              f"{t_fwd * 1e3:7.2f} -> {t_ffwd * 1e3:7.2f} ms "
              f"({B / t_ffwd:7.1f} crops/s, {(t_fwd / t_ffwd - 1) * 100:+.1f}%)",
              flush=True)


if __name__ == "__main__":
    main()
