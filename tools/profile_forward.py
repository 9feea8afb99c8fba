"""Forward-pass breakdown on the live chip: preNet stems vs HRNet trunk, plus
compiled-FLOPs MFU.  Informs the forward-optimization work (VERDICT item 5).

Usage: python tools/profile_forward.py [BATCH]
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
V5E_BF16_PEAK = 197e12


def _cfg(path, opts=()):
    from buctd_tpu.config import default_config, update_config
    cfg = default_config()
    update_config(cfg, types.SimpleNamespace(
        cfg=path, opts=list(opts), modelDir="", logDir="", dataDir=""))
    return cfg


def main():
    import jax
    import jax.numpy as jnp

    from buctd_tpu.models import get_model
    from buctd_tpu.models.hrnet import PreNet

    def init_vars(model, x):
        shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x,
                                                   train=False))
        return jax.jit(lambda: jax.tree.map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()

    def timed(name, f, *args):
        def run(steps):
            acc = None
            for _ in range(steps):
                out = f(*args)
                s = sum(jnp.sum(l.astype(jnp.float32))
                        for l in jax.tree.leaves(out))
                acc = s if acc is None else acc + s
            return float(acc)

        run(1)
        run(3)
        t0 = time.perf_counter()
        run(STEPS)
        dt = (time.perf_counter() - t0) / STEPS
        print(f"{name:46s} {dt * 1e3:9.2f} ms/step  {B / dt:9.1f} crops/s",
              flush=True)
        return dt

    def flops_of(f, *args):
        try:
            return float(jax.jit(f).lower(*args).compile()
                         .cost_analysis()["flops"])
        except Exception as e:
            print(f"  (cost_analysis failed: {e!r})")
            return float("nan")

    x6 = jnp.zeros((B, 384, 288, 6), jnp.float32)
    x3 = jnp.zeros((B, 384, 288, 3), jnp.float32)

    # full preNet-W48
    cfgp = _cfg("/root/repo/experiments/coco/buctd/prenet_w48_384x288.yaml")
    mp = get_model(cfgp, dtype=jnp.bfloat16)
    vp = init_vars(mp, x6)
    fp = jax.jit(lambda v, x: mp.apply(v, x, train=False))
    tp = timed("preNet-W48 full forward", fp, vp, x6)
    fl = flops_of(lambda v, x: mp.apply(v, x, train=False), vp, x6)
    print(f"  compiled flops/step {fl / 1e12:.2f} TF -> MFU "
          f"{fl / tp / V5E_BF16_PEAK * 100:.1f}%")

    # plain W48 (no preNet, 3ch) — isolates the preNet stems + 6ch stem cost
    cfg3 = _cfg("/root/repo/experiments/coco/hrnet/w48_384x288_adam_lr1e-3.yaml")
    m3 = get_model(cfg3, dtype=jnp.bfloat16)
    v3 = init_vars(m3, x3)
    f3 = jax.jit(lambda v, x: m3.apply(v, x, train=False))
    t3 = timed("plain W48 (3ch, no preNet)", f3, v3, x3)

    # preNet stems alone at full res (init must be jitted: eager BN at this
    # batch OOMs through the relay)
    pn = PreNet(dtype=jnp.bfloat16)
    x3s = jnp.zeros((1, 384, 288, 3), jnp.float32)
    shapes = jax.eval_shape(lambda: pn.init(jax.random.PRNGKey(0), x3s, x3s,
                                            train=False))
    vpn = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()
    fpn = jax.jit(lambda v, a, b: pn.apply(v, a, b, train=False))
    tpn = timed("preNet stems alone (384x288)", fpn, vpn, x3, x3)

    print(f"preNet-W48 minus plain W48: {(tp - t3) * 1e3:.2f} ms")

    # W32 for reference
    cfg32 = _cfg("/root/repo/experiments/coco/buctd/coam_w32_384x288.yaml")
    m32 = get_model(cfg32, dtype=jnp.bfloat16)
    v32 = init_vars(m32, x6)
    f32_ = jax.jit(lambda v, x: m32.apply(v, x, train=False))
    t32 = timed("CoAM-W32 full forward", f32_, v32, x6)
    fl32 = flops_of(lambda v, x: m32.apply(v, x, train=False), v32, x6)
    print(f"  compiled flops/step {fl32 / 1e12:.2f} TF -> MFU "
          f"{fl32 / t32 / V5E_BF16_PEAK * 100:.1f}%")


if __name__ == "__main__":
    main()
