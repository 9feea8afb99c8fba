"""End-to-end throughput benchmark: warp -> condition render -> forward -> decode.

Flagship: BUCTD-preNet-W48 384x288 (COCO headline model, BASELINE.md).  The whole
pipeline is ONE jitted program on device: batched affine crop (ops/warp.py), colored
condition rendering (ops/heatmap.py), bf16 HRNet-W48 forward, argmax+nudge decode and
inverse-affine unprojection (ops/decode.py).  Baseline is the reference's own PyTorch
pipeline on CPU (cv2.warpAffine + torch forward + numpy get_final_preds), run in
process from /root/reference — per BASELINE.json: target >=5x crops/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time
import types

import numpy as np

from buctd_tpu.utils.relay import ensure_live_backend

ensure_live_backend()   # dead-relay guard: CPU fallback instead of a hang

from buctd_tpu.utils.compcache import enable as _enable_compcache

_enable_compcache()

B = 384         # crops per step (serving batch): fwd 903/1172/883 crops/s at
                # b256/384/512 — 384 tiles the W48 branches best; 512 spills
STEPS = 10      # timed steps
SRC_HW = 512    # synthetic source image side
N_TORCH = 20    # baseline crops to time
V5E_BF16_PEAK = 197e12  # v5e MXU peak, bf16 FLOP/s (for the forward-MFU line)


def _flagship_cfg():
    from buctd_tpu.config import default_config, update_config

    cfg = default_config()
    update_config(cfg, types.SimpleNamespace(
        cfg="/root/repo/experiments/coco/buctd/prenet_w48_384x288.yaml",
        opts=["TEST.POST_PROCESS", "True"], modelDir="", logDir="", dataDir=""))
    return cfg


def _synth_inputs(rng, n):
    images = rng.rand(n, SRC_HW, SRC_HW, 3).astype(np.float32)
    centers = rng.rand(n, 2).astype(np.float32) * 200 + 150
    scales = (rng.rand(n, 2).astype(np.float32) * 0.5 + 1.0)  # *200px boxes
    joints = rng.rand(n, 17, 2).astype(np.float32) * 180 + 60  # near center, src frame
    return images, centers, scales, joints


def measure_tpu():
    import jax
    import jax.numpy as jnp

    from buctd_tpu.geometry import affine_points_jax, make_affine_jax
    from buctd_tpu.models import get_model
    from buctd_tpu.ops import get_final_preds, render_condition_colored
    from buctd_tpu.ops.warp import warp_affine_aligned

    global B, STEPS
    if jax.devices()[0].platform == "cpu":
        # relay-down / forced-CPU fallback: b384 W48 on one CPU core would
        # take hours — shrink so the driver still gets a labeled JSON line
        B, STEPS = 4, 2

    cfg = _flagship_cfg()
    model = get_model(cfg, dtype=jnp.bfloat16)
    img_w, img_h = cfg.MODEL.IMAGE_SIZE
    hm_w, hm_h = cfg.MODEL.HEATMAP_SIZE
    colors = np.linspace(0, 255, cfg.MODEL.NUM_JOINTS * 3).reshape(-1, 3)

    rng = np.random.RandomState(0)
    images, centers, scales, joints = _synth_inputs(rng, B)
    x0 = jnp.zeros((1, img_h, img_w, 6), jnp.float32)
    # shape-only init + one jitted constant program: avoids dispatching hundreds of
    # eager init ops through the device tunnel (weights' values don't affect timing)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x0, train=False))
    variables = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()
    from buctd_tpu.models.fuse import maybe_fuse_prenet
    model, variables = maybe_fuse_prenet(cfg, model, variables)

    mean = jnp.array([0.485, 0.456, 0.406])
    std = jnp.array([0.229, 0.224, 0.225])

    def pipeline(variables, images, centers, scales, cond_src):
        zeros = jnp.zeros(centers.shape[0])
        # source -> crop frame: warp RGB and condition joints with the same affine
        # (axis-aligned two-matmul path: eval/inference crops always have rot=0)
        t_inv = make_affine_jax(centers, scales, zeros, (img_w, img_h), inv=True)
        # 'default' (bf16-pass) matmul precision: the model quantizes its input
        # to bf16 anyway, so the extra f32 warp/render precision is discarded —
        # measured 0.00 px decode drift, +3.4% e2e (tools/bench_precision.py)
        crops = warp_affine_aligned(images, t_inv, (img_h, img_w),
                                    precision="default")
        t_fwd = make_affine_jax(centers, scales, zeros, (img_w, img_h), inv=False)
        cond_crop = affine_points_jax(cond_src, t_fwd)
        cond_img = render_condition_colored(cond_crop, colors, (img_h, img_w),
                                            precision="default") / 255.0
        x = jnp.concatenate([(crops - mean) / std, cond_img], axis=-1)
        hm = model.apply(variables, x, train=False)          # (B, hm_h, hm_w, J)
        hm = hm.astype(jnp.float32).transpose(0, 3, 1, 2)    # decode wants (B, J, h, w)
        preds, maxvals = get_final_preds(hm, centers, scales, (hm_w, hm_h),
                                         post_process=True, use_dark=False)
        return preds, maxvals

    fn = jax.jit(pipeline)
    args = (variables, jnp.array(images), jnp.array(centers), jnp.array(scales),
            jnp.array(joints))
    # NB: on the axon relay backend block_until_ready() returns before execution
    # finishes; a host fetch is the only reliable fence, so time through np.asarray.
    def run(steps, f=fn, a=args):
        acc = None
        for _ in range(steps):
            out = f(*a)
            s = sum(o.sum() for o in out) if isinstance(out, tuple) else out.sum()
            acc = s if acc is None else acc + s
        return float(acc)     # one host fetch fences the whole dependency chain

    run(1)                    # compile (incl. the eager reduction/add dispatches)
    run(3)                    # warm
    t0 = time.perf_counter()
    run(STEPS)
    dt = time.perf_counter() - t0
    e2e_cps = B * STEPS / dt

    # forward-only: same batch through just the model, for the MFU line
    x6 = jnp.zeros((B, img_h, img_w, 6), jnp.bfloat16)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False).astype(jnp.float32))
    fargs = (variables, x6)
    run(1, fwd, fargs)
    run(3, fwd, fargs)
    t0 = time.perf_counter()
    run(STEPS, fwd, fargs)
    fdt = time.perf_counter() - t0
    fwd_cps = B * STEPS / fdt
    try:
        if _on_cpu():
            mfu = float("nan")   # v5e-peak MFU is meaningless on the fallback,
            #                      and cost_analysis costs a second full compile
        else:
            flops = float(jax.jit(lambda v, x: model.apply(v, x, train=False))
                          .lower(variables, x6).compile()
                          .cost_analysis()["flops"])
            mfu = flops * (STEPS / fdt) / V5E_BF16_PEAK
    except Exception:
        mfu = float("nan")
    return e2e_cps, fwd_cps, mfu, jax.devices()[0].platform


def _cfg_for(path, opts=()):
    from buctd_tpu.config import default_config, update_config

    cfg = default_config()
    update_config(cfg, types.SimpleNamespace(
        cfg=path, opts=list(opts), modelDir="", logDir="", dataDir=""))
    return cfg


def _zeros_like_init(model, x0):
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x0,
                                               train=False))
    return jax.jit(lambda: jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()


def _on_cpu():
    import jax

    return jax.devices()[0].platform == "cpu"


def _time_fetch(run, steps=None):
    steps = steps or (2 if _on_cpu() else STEPS)
    run(1)
    run(2)
    t0 = time.perf_counter()
    run(steps)
    return (time.perf_counter() - t0) / steps


def measure_forward(cfg_path, batch):
    """Forward crops/s + MFU for one architecture (bf16, 384x288)."""
    import jax
    import jax.numpy as jnp

    from buctd_tpu.models import get_model

    cfg = _cfg_for(cfg_path)
    if _on_cpu():
        batch = 2    # relay-down fallback: keep the labeled JSON line cheap
    model = get_model(cfg, dtype=jnp.bfloat16)
    variables = _zeros_like_init(model, jnp.zeros((1, 384, 288, 6), jnp.float32))
    from buctd_tpu.models.fuse import maybe_fuse_prenet
    model, variables = maybe_fuse_prenet(cfg, model, variables)
    x = jnp.array(np.random.RandomState(0)
                  .rand(batch, 384, 288, 6).astype(np.float32))
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False)
                  .astype(jnp.float32))

    def run(steps):
        acc = None
        for _ in range(steps):
            s = fwd(variables, x).sum()
            acc = s if acc is None else acc + s
        return float(acc)

    dt = _time_fetch(run)
    try:
        flops = float(jax.jit(lambda v, x: model.apply(v, x, train=False))
                      .lower(variables, x).compile().cost_analysis()["flops"])
        mfu = flops / dt / V5E_BF16_PEAK
    except Exception:
        mfu = float("nan")
    return batch / dt, mfu, batch


def measure_refine(poses=16):
    """3x-refine scan ms/image (the OCHuman protocol: CoAM-W48 + 3 rounds,
    README.md:104) on a 960x720 source frame."""
    import jax.numpy as jnp

    from buctd_tpu.core.refine import make_refine_fn
    from buctd_tpu.models import get_model

    cfg = _cfg_for("/root/repo/experiments/coco/buctd/coam_w48_384x288.yaml",
                   ["TPU.EVAL_DTYPE", "bfloat16"])
    if _on_cpu():
        poses = 2    # relay-down fallback
    model = get_model(cfg, dtype=jnp.bfloat16)
    J = int(cfg.MODEL.NUM_JOINTS)
    variables = _zeros_like_init(model, jnp.zeros((1, 384, 288, 6), jnp.float32))
    refine = make_refine_fn(cfg, model, np.linspace(0, 255, J * 3).reshape(-1, 3),
                            n_iters=3)
    rng = np.random.RandomState(0)
    image = jnp.array(rng.rand(960, 720, 3).astype(np.float32) * 255)
    cond = jnp.array(np.concatenate(
        [rng.rand(poses, J, 2) * [720, 960], np.ones((poses, J, 1))],
        -1).astype(np.float32))

    def run(n):
        acc = None
        for _ in range(n):
            p, m = refine(variables, image, cond)
            s = p.sum() + m.sum()
            acc = s if acc is None else acc + s
        return float(acc)

    return _time_fetch(run) * 1e3, poses   # ms/image


def measure_serving(nb=8, hb=768, wb=1024, pb=16):
    """Device-resident predict_batch program (serving.py's vmapped refine) on
    one crowded bucket: uint8 decode -> full-res crop-warp -> colored render
    -> CoAM forward -> decode for nb images x pb poses.  Device-resident =
    the deployable number (a production host feeds over PCIe; this tunnel's
    45 MB/s transfer is measured separately in tools/bench_serve.py)."""
    import jax.numpy as jnp

    from buctd_tpu.serving import PoseEstimator

    cfg = _cfg_for("/root/repo/experiments/coco/buctd/coam_w48_384x288.yaml",
                   ["TPU.EVAL_DTYPE", "bfloat16"])
    est = PoseEstimator(cfg, refine_iters=1, max_compiles=4)
    fn = est._ensure_refine_batch()
    J = est.num_joints
    rng = np.random.RandomState(0)
    imgs = jnp.asarray((rng.rand(nb, hb, wb, 3) * 255).astype(np.uint8))
    cnds = jnp.asarray(np.concatenate(
        [rng.rand(nb, pb, J, 2) * [wb, hb], np.ones((nb, pb, J, 1))],
        -1).astype(np.float32))
    whs = jnp.asarray(np.tile([wb, hb], (nb, 1)).astype(np.float32))

    def run(n):
        acc = None
        for _ in range(n):
            p, m = fn(est.variables, imgs, cnds, whs)
            s = p.sum() + m.sum()
            acc = s if acc is None else acc + s
        return float(acc)

    dt = _time_fetch(run, steps=5)
    return nb * pb / dt, (nb, hb, wb, pb)


def measure_torch_cpu():
    """Reference pipeline, run (not copied) from /root/reference on CPU."""
    import cv2
    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    sys.path.insert(0, "/root/reference/lib")
    torch.Tensor.cuda = lambda self, *a, **k: self      # preNet branch calls .cuda()
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if "torchvision" not in sys.modules:                 # only TF.resize is ever used
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        tf = types.ModuleType("torchvision.transforms.functional")
        tf.resize = lambda img, size, *a, **k: torch.nn.functional.interpolate(
            img, size=list(size), mode="bilinear", align_corners=False)
        tr.functional = tf
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
        sys.modules["torchvision.transforms.functional"] = tf
    from models import pose_hrnet                        # reference torch model
    from utils.transforms import get_affine_transform    # reference geometry
    from core.inference import get_final_preds           # reference decode

    cfg = _flagship_cfg()
    model = pose_hrnet.get_pose_net(cfg, is_train=False)
    model.eval()
    img_w, img_h = cfg.MODEL.IMAGE_SIZE
    colors = np.linspace(0, 255, cfg.MODEL.NUM_JOINTS * 3).reshape(-1, 3)

    rng = np.random.RandomState(0)
    images, centers, scales, joints = _synth_inputs(rng, N_TORCH + 1)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    def one(i):
        trans = get_affine_transform(centers[i], scales[i], 0, (img_w, img_h))
        crop = cv2.warpAffine(images[i], trans, (img_w, img_h), flags=cv2.INTER_LINEAR)
        pts = joints[i] @ trans[:, :2].T + trans[:, 2]
        cond = np.zeros((img_h, img_w, 3), np.float32)   # reference-style point splat
        for j, (x, y) in enumerate(pts):
            if 0 <= int(x) < img_w and 0 <= int(y) < img_h:
                cond[int(y), int(x)] = colors[j]
        cond = cv2.GaussianBlur(cond, (0, 0), 15)
        if cond.max() > 0:
            cond = cond / cond.max() * 255.0
        x_in = np.concatenate([(crop - mean) / std, cond / 255.0], axis=-1)
        with torch.no_grad():
            hm = model(torch.from_numpy(x_in.transpose(2, 0, 1)[None]))
        get_final_preds(cfg, hm.numpy(), centers[i:i + 1], scales[i:i + 1])

    one(N_TORCH)  # warm
    t0 = time.perf_counter()
    for i in range(N_TORCH):
        one(i)
    dt = time.perf_counter() - t0
    return N_TORCH / dt


def main():
    tpu_cps, fwd_cps, mfu, platform = measure_tpu()
    try:
        global N_TORCH
        if platform == "cpu":
            N_TORCH = 5      # fallback: both sides share the one CPU core
        torch_cps = measure_torch_cpu()
    except Exception as e:  # baseline must not sink the bench
        print(f"# torch baseline failed: {e!r}", file=sys.stderr)
        torch_cps = float("nan")
    vs = tpu_cps / torch_cps if torch_cps == torch_cps else float("nan")
    record = {
        "metric": f"e2e_crops_per_sec_per_chip[{platform},BUCTD-preNet-W48,384x288,warp+render+fwd+decode]",
        "value": round(tpu_cps, 2),
        "unit": "crops/s",
        "vs_baseline": round(vs, 2) if vs == vs else None,
        "forward_crops_per_sec": round(fwd_cps, 2),
        "forward_mfu": round(mfu, 4) if mfu == mfu else None,
        "torch_cpu_crops_per_sec": round(torch_cps, 3) if torch_cps == torch_cps else None,
    }
    if platform == "cpu":
        record["note"] = (
            "axon relay tunnel unreachable -> tiny-batch CPU fallback run; "
            "last on-chip v5e numbers (round 4, perf_logs/r4_queue.log): "
            "1131 crops/s/chip e2e b384, CoAM-W48 831 crops/s b192, refine "
            "84 ms/image, serving ~470-500 device-resident crops/s (PERF.md); "
            "tools/relay_watch.sh re-measures when the tunnel returns")
    # the OCHuman/CrowdPose flagship (CoAM-W48 + 3x refinement, README.md:104)
    # and the TransPose family, so the driver-captured JSON evidences every
    # headline model, not just preNet (VERDICT r2 item 4).  Skipped on the CPU
    # fallback: three more W48/transformer compiles on this host's single core
    # would outlive any reasonable bench timeout without producing a number
    # that means anything — the ONE labeled JSON line must still land.
    if os.environ.get("BUCTD_BENCH_HEADLINE_ONLY") != "1" and platform != "cpu":
        try:
            cps, m, b = measure_forward(
                "/root/repo/experiments/coco/buctd/coam_w48_384x288.yaml", 128)
            record[f"coam_w48_fwd_crops_per_sec_b{b}"] = round(cps, 2)
            record["coam_w48_fwd_mfu"] = round(m, 4) if m == m else None
        except Exception as e:
            print(f"# coam bench failed: {e!r}", file=sys.stderr)
        try:
            cps, m, b = measure_forward(
                "/root/repo/experiments/coco/buctd/transpose_h_384x288.yaml",
                64)
            record[f"transpose_h_fwd_crops_per_sec_b{b}"] = round(cps, 2)
            record["transpose_h_fwd_mfu"] = round(m, 4) if m == m else None
        except Exception as e:
            print(f"# transpose bench failed: {e!r}", file=sys.stderr)
        try:
            ms, p = measure_refine(16)
            record[f"coam_refine3x_ms_per_image_p{p}"] = round(ms, 1)
        except Exception as e:
            print(f"# refine bench failed: {e!r}", file=sys.stderr)
        try:
            cps, (nb, hb, wb, pb) = measure_serving()
            record[f"serving_device_crops_per_sec_{nb}x{hb}x{wb}_p{pb}"] = (
                round(cps, 1))
        except Exception as e:
            print(f"# serving bench failed: {e!r}", file=sys.stderr)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
