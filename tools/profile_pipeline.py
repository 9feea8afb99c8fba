"""Stage-by-stage timing of the serving pipeline on the live chip.

Times each piece of bench.py's e2e program (warp, condition render, normalize,
forward, decode) as its own jitted program, plus the fused e2e, to attribute the
e2e-vs-forward gap (VERDICT round-1 item 5).  Timing is fenced by host fetches
(block_until_ready returns early on the axon relay).

Usage: python tools/profile_pipeline.py [BATCH]
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
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x0, train=False))
    variables = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()

    mean = jnp.array([0.485, 0.456, 0.406])
    std = jnp.array([0.229, 0.224, 0.225])

    def timed(name, f, *args):
        def run(steps):
            acc = None
            for _ in range(steps):
                out = f(*args)
                leaves = jax.tree.leaves(out)
                s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
                acc = s if acc is None else acc + s
            return float(acc)

        run(1)
        run(3)
        t0 = time.perf_counter()
        run(STEPS)
        dt = (time.perf_counter() - t0) / STEPS
        print(f"{name:42s} {dt * 1e3:9.2f} ms/step   {B / dt:9.1f} crops/s")
        return dt

    zeros = jnp.zeros(B)
    t_inv = make_affine_jax(centers, scales, zeros, (img_w, img_h), inv=True)
    t_fwd = make_affine_jax(centers, scales, zeros, (img_w, img_h), inv=False)

    warp = jax.jit(lambda im, t: warp_affine_aligned(im, t, (img_h, img_w)))
    crops = warp(images, t_inv)

    cond_crop = affine_points_jax(joints, t_fwd)
    render = jax.jit(lambda cj: render_condition_colored(cj, colors, (img_h, img_w)))
    cond_img = render(cond_crop)

    norm = jax.jit(lambda c, ci: jnp.concatenate(
        [(c - mean) / std, ci / 255.0], axis=-1))
    x = norm(crops, cond_img)

    fwd = jax.jit(lambda v, xx: model.apply(v, xx, train=False))
    hm = fwd(variables, x)

    dec = jax.jit(lambda h, c, s: get_final_preds(
        h.astype(jnp.float32).transpose(0, 3, 1, 2), c, s, (hm_w, hm_h),
        post_process=True, use_dark=False))

    print(f"batch {B}, {img_h}x{img_w}, W48 preNet, bf16 fwd")
    t_warp = timed("warp (aligned two-matmul, f32 HIGHEST)", warp, images, t_inv)
    t_rend = timed("condition render (colored)", render, cond_crop)
    t_norm = timed("normalize+concat", norm, crops, cond_img)
    t_fwdp = timed("forward (bf16)", fwd, variables, x)
    t_dec = timed("decode (argmax+nudge+unproject)", dec, hm, centers, scales)

    def e2e(v, im, c, s, cj):
        ti = make_affine_jax(c, s, zeros, (img_w, img_h), inv=True)
        cr = warp_affine_aligned(im, ti, (img_h, img_w))
        tf = make_affine_jax(c, s, zeros, (img_w, img_h), inv=False)
        ci = render_condition_colored(affine_points_jax(cj, tf), colors,
                                      (img_h, img_w)) / 255.0
        xx = jnp.concatenate([(cr - mean) / std, ci], axis=-1)
        h = model.apply(v, xx, train=False)
        return get_final_preds(h.astype(jnp.float32).transpose(0, 3, 1, 2),
                               c, s, (hm_w, hm_h), post_process=True)

    t_e2e = timed("e2e fused (bench.py program)", jax.jit(e2e),
                  variables, images, centers, scales, joints)
    parts = t_warp + t_rend + t_norm + t_fwdp + t_dec
    print(f"{'sum of stages':42s} {parts * 1e3:9.2f} ms/step")
    print(f"overhead vs forward: {(t_e2e - t_fwdp) * 1e3:.2f} ms/step "
          f"({(t_e2e / t_fwdp - 1) * 100:.1f}%)")


if __name__ == "__main__":
    main()
