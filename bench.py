"""End-to-end throughput benchmark: warp -> condition render -> forward -> decode.

Flagship: BUCTD-preNet-W48 384x288 (COCO headline model, BASELINE.md).  The whole
pipeline is ONE jitted program on device: batched affine crop (ops/warp.py), colored
condition rendering (ops/heatmap.py), bf16 HRNet-W48 forward, argmax+nudge decode and
inverse-affine unprojection (ops/decode.py).  Baseline is the reference's own PyTorch
pipeline on CPU (cv2.warpAffine + torch forward + numpy get_final_preds), run in
process from /root/reference — per BASELINE.json: target >=5x crops/sec/chip.

Variance methodology (PERF.md "Measurement methodology"; VERDICT r4 item 1).  The
axon relay's session throughput swings up to ~3x within an hour (perf_logs/
r4_queue3.log vs r4_queue4.log), so a single timing pass per metric is noise:

  * every metric's program returns ONE scalar and threads an ``acc`` carry, so a
    timing pass is STEPS async dispatches + ONE host fetch — zero eager ops inside
    the timed loop (eager dispatch through the relay costs 50-400 ms/op and was the
    round-4 CoAM-collapse suspect);
  * all metrics are timed in ROUNDS interleaved passes (metric A round 1, metric B
    round 1, ..., metric A round 2, ...) and the reported value is the
    median-of-rounds, so drift hits every metric equally;
  * a fixed CANARY program (16 chained 4096^2 bf16 matmuls in one fori_loop) is
    timed immediately before every metric pass; ``canary_ratio`` = median canary
    ms / known-good v5e ms labels a degraded session in the JSON itself;
  * every metric is checked against its PERF.md reference value and anything >25%
    off lands in ``flags`` — a regression (or relay weather) is visible in the
    artifact, not just in a diff against an old JSON.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
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
ROUNDS = 5      # interleaved timing rounds per metric (median reported)
SRC_HW = 512    # synthetic source image side
N_TORCH = 20    # baseline crops to time
V5E_BF16_PEAK = 197e12  # v5e MXU peak, bf16 FLOP/s (for the forward-MFU line)

# Known-good v5e canary time (median of 30 readings, 2026-08-20, in a session
# whose six metrics all landed within 1-6% of their PERF.md references; the
# canary is compute-bound — 16 chained 4096^2 matmuls + tanh — and
# relay-fetch-fenced, so a healthy session reproduces it closely).
# None -> ratio reported but not judged.
CANARY_REF_MS = 34.5

# PERF.md reference values per metric (v5e, bf16, device-side medians).  A
# driver run >25% off any of these gets the metric listed in "flags".
PERF_REF = {
    "value": 1131.0,                                  # e2e crops/s b384
    "forward_crops_per_sec": 1175.0,
    "coam_w48_fwd_crops_per_sec_b128": 800.0,
    "transpose_h_fwd_crops_per_sec_b64": 470.0,
    "coam_refine3x_ms_per_image_p16": 83.0,
    "serving_device_crops_per_sec_8x768x1024_p16": 510.0,
}
FLAG_TOL = 0.25


def _flagship_cfg():
    from buctd_tpu.config import default_config, update_config

    cfg = default_config()
    update_config(cfg, types.SimpleNamespace(
        cfg="/root/repo/experiments/coco/buctd/prenet_w48_384x288.yaml",
        opts=["TEST.POST_PROCESS", "True"], modelDir="", logDir="", dataDir=""))
    return cfg


def _cfg_for(path, opts=()):
    from buctd_tpu.config import default_config, update_config

    cfg = default_config()
    update_config(cfg, types.SimpleNamespace(
        cfg=path, opts=list(opts), modelDir="", logDir="", dataDir=""))
    return cfg


def _synth_inputs(rng, n):
    images = rng.rand(n, SRC_HW, SRC_HW, 3).astype(np.float32)
    centers = rng.rand(n, 2).astype(np.float32) * 200 + 150
    scales = (rng.rand(n, 2).astype(np.float32) * 0.5 + 1.0)  # *200px boxes
    joints = rng.rand(n, 17, 2).astype(np.float32) * 180 + 60  # near center, src frame
    return images, centers, scales, joints


def _zeros_like_init(model, x0):
    import jax
    import jax.numpy as jnp

    # shape-only init + one jitted constant program: avoids dispatching hundreds
    # of eager init ops through the device tunnel (values don't affect timing)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x0,
                                               train=False))
    return jax.jit(lambda: jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()


def _on_cpu():
    import jax

    return jax.devices()[0].platform == "cpu"


class Unit:
    """One benchmarked program: an AOT-compiled scalar-carry step.

    ``step(*args, acc) -> acc'`` is compiled once (compile excluded from
    timing; cost_analysis comes free from the same executable).  A timing
    pass issues ``steps`` async dispatches chained through ``acc`` and fences
    with ONE host fetch — on the axon relay block_until_ready() returns
    early, so the fetch is the only reliable fence, and eager ops (the old
    per-step ``out.sum()``) are relay-latency landmines kept out of the loop.
    """

    def __init__(self, name, step, args, steps):
        import jax

        self.name, self.steps = name, steps
        lowered = jax.jit(step).lower(*args, 0.0)
        self.compiled = lowered.compile()
        try:
            self.flops = float(self.compiled.cost_analysis()["flops"])
        except Exception:
            self.flops = float("nan")
        self.args = args
        float(self.run(1))            # warm (first real execution)

    def run(self, steps):
        acc = 0.0
        for _ in range(steps):
            acc = self.compiled(*self.args, acc)
        return float(acc)             # the one host fetch

    def time_pass(self):
        t0 = time.perf_counter()
        self.run(self.steps)
        return (time.perf_counter() - t0) / self.steps


def make_canary():
    """Fixed-shape compute canary: 16 chained 4096^2 bf16 matmuls + tanh in one
    fori_loop, one scalar fetch.  ~17.6 GFLOP/matmul -> ~11 ms at 50% MXU
    efficiency on v5e; relay/session degradation shows up as a ratio >> 1."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    n, iters = (512, 4) if _on_cpu() else (4096, 16)
    a = jnp.array(np.random.RandomState(7).rand(n, n), jnp.bfloat16)

    def prog(a, acc):
        def body(_, x):
            return jnp.tanh(x @ a)          # carry feeds the matmul: no hoisting
        return acc + lax.fori_loop(0, iters, body, a).astype(jnp.float32).sum()

    compiled = jax.jit(prog).lower(a, 0.0).compile()
    float(compiled(a, 0.0))                 # warm

    def timed():
        t0 = time.perf_counter()
        float(compiled(a, 0.0))
        return (time.perf_counter() - t0) * 1e3
    timed()
    return timed


def unit_e2e_and_forward():
    """Flagship e2e pipeline + forward-only units (share model/variables)."""
    import jax.numpy as jnp

    from buctd_tpu.geometry import affine_points_jax, make_affine_jax
    from buctd_tpu.models import get_model
    from buctd_tpu.models.fuse import maybe_fuse_prenet
    from buctd_tpu.ops import get_final_preds, render_condition_colored
    from buctd_tpu.ops.warp import warp_affine_aligned

    global B
    if _on_cpu():
        # relay-down / forced-CPU fallback: b384 W48 on one CPU core would
        # take hours — shrink so the driver still gets a labeled JSON line
        B = 4

    cfg = _flagship_cfg()
    model = get_model(cfg, dtype=jnp.bfloat16)
    img_w, img_h = cfg.MODEL.IMAGE_SIZE
    hm_w, hm_h = cfg.MODEL.HEATMAP_SIZE
    colors = np.linspace(0, 255, cfg.MODEL.NUM_JOINTS * 3).reshape(-1, 3)

    rng = np.random.RandomState(0)
    images, centers, scales, joints = _synth_inputs(rng, B)
    variables = _zeros_like_init(model, jnp.zeros((1, img_h, img_w, 6),
                                                  jnp.float32))
    model, variables = maybe_fuse_prenet(cfg, model, variables)

    mean = jnp.array([0.485, 0.456, 0.406])
    std = jnp.array([0.229, 0.224, 0.225])

    def pipeline(variables, images, centers, scales, cond_src, acc):
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
        return acc + preds.sum() + maxvals.sum()

    args = (variables, jnp.array(images), jnp.array(centers),
            jnp.array(scales), jnp.array(joints))
    e2e = Unit("e2e", pipeline, args, steps=1 if _on_cpu() else 4)

    x6 = jnp.zeros((B, img_h, img_w, 6), jnp.bfloat16)
    fwd = Unit("fwd",
               lambda v, x, acc: acc + model.apply(v, x, train=False)
               .astype(jnp.float32).sum(),
               (variables, x6), steps=1 if _on_cpu() else 4)
    return e2e, fwd


def unit_forward(name, cfg_path, batch, steps):
    """Forward crops/s (+MFU) unit for one architecture (bf16, 384x288)."""
    import jax.numpy as jnp

    from buctd_tpu.models import get_model
    from buctd_tpu.models.fuse import maybe_fuse_prenet

    cfg = _cfg_for(cfg_path)
    model = get_model(cfg, dtype=jnp.bfloat16)
    variables = _zeros_like_init(model, jnp.zeros((1, 384, 288, 6), jnp.float32))
    model, variables = maybe_fuse_prenet(cfg, model, variables)
    x = jnp.array(np.random.RandomState(0)
                  .rand(batch, 384, 288, 6).astype(np.float32))
    u = Unit(name,
             lambda v, x, acc: acc + model.apply(v, x, train=False)
             .astype(jnp.float32).sum(),
             (variables, x), steps=steps)
    u.batch = batch
    return u


def unit_refine(poses=16):
    """3x-refine scan ms/image (the OCHuman protocol: CoAM-W48 + 3 rounds,
    README.md:104) on a 960x720 source frame."""
    import jax.numpy as jnp

    from buctd_tpu.core.refine import make_refine_fn
    from buctd_tpu.models import get_model

    cfg = _cfg_for("/root/repo/experiments/coco/buctd/coam_w48_384x288.yaml",
                   ["TPU.EVAL_DTYPE", "bfloat16"])
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

    def step(v, image, cond, acc):
        p, m = refine(v, image, cond)
        return acc + p.sum() + m.sum()

    u = Unit("refine", step, (variables, image, cond), steps=3)
    u.poses = poses
    return u


def unit_serving(nb=8, hb=768, wb=1024, pb=16):
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

    def step(v, imgs, cnds, whs, acc):
        p, m = fn(v, imgs, cnds, whs)
        return acc + p.sum() + m.sum()

    u = Unit("serving", step, (est.variables, imgs, cnds, whs), steps=3)
    u.shape = (nb, hb, wb, pb)
    return u


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
        # the reference passes (15, 15) as cv2.GaussianBlur's KSIZE (sigma=0 ->
        # OpenCV derives sigma~=2.6), NOT as sigma — JointsDataset.py:457-463;
        # ops/heatmap.py reproduces the same 15-tap kernel on device
        cond = cv2.GaussianBlur(cond, (15, 15), 0)
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
    import jax

    platform = jax.devices()[0].platform
    on_cpu = platform == "cpu"
    rounds = 1 if on_cpu else ROUNDS
    headline_only = (os.environ.get("BUCTD_BENCH_HEADLINE_ONLY") == "1"
                     or on_cpu)

    # --- build all units (compile once each; failures drop the unit only) ---
    units, errors = [], {}
    e2e, fwd = unit_e2e_and_forward()
    units += [e2e, fwd]
    if not headline_only:
        for name, builder in [
            ("coam", lambda: unit_forward(
                "coam", "/root/repo/experiments/coco/buctd/coam_w48_384x288.yaml",
                128, steps=4)),
            ("transpose", lambda: unit_forward(
                "transpose",
                "/root/repo/experiments/coco/buctd/transpose_h_384x288.yaml",
                64, steps=4)),
            ("refine", lambda: unit_refine(16)),
            ("serving", lambda: unit_serving()),
        ]:
            try:
                units.append(builder())
            except Exception as e:
                errors[name] = repr(e)
                print(f"# {name} bench setup failed: {e!r}", file=sys.stderr)

    canary = make_canary()

    # --- interleaved timing rounds, one canary reading before each pass ---
    times = {u.name: [] for u in units}
    canary_ms = []
    for _ in range(rounds):
        for u in units:
            canary_ms.append(canary())
            times[u.name].append(u.time_pass())
    med = {name: float(np.median(ts)) for name, ts in times.items()}
    spread = {name: (float(np.min(ts)), float(np.max(ts)))
              for name, ts in times.items()}

    # --- torch-CPU baseline (the reference's own pipeline, in process) ---
    try:
        global N_TORCH
        if on_cpu:
            N_TORCH = 5      # fallback: both sides share the one CPU core
        torch_cps = measure_torch_cpu()
    except Exception as e:  # baseline must not sink the bench
        print(f"# torch baseline failed: {e!r}", file=sys.stderr)
        torch_cps = float("nan")

    tpu_cps = B / med["e2e"]
    vs = tpu_cps / torch_cps if torch_cps == torch_cps else float("nan")
    record = {
        "metric": f"e2e_crops_per_sec_per_chip[{platform},BUCTD-preNet-W48,384x288,warp+render+fwd+decode]",
        "value": round(tpu_cps, 2),
        "unit": "crops/s",
        "vs_baseline": round(vs, 2) if vs == vs else None,
        "forward_crops_per_sec": round(B / med["fwd"], 2),
        "torch_cpu_crops_per_sec": round(torch_cps, 3) if torch_cps == torch_cps else None,
        "rounds": rounds,
    }
    if fwd.flops == fwd.flops and not on_cpu:
        record["forward_mfu"] = round(fwd.flops / med["fwd"] / V5E_BF16_PEAK, 4)
    for u in units:
        if u.name == "coam":
            record["coam_w48_fwd_crops_per_sec_b128"] = round(u.batch / med[u.name], 2)
            if u.flops == u.flops:
                record["coam_w48_fwd_mfu"] = round(
                    u.flops / med[u.name] / V5E_BF16_PEAK, 4)
        elif u.name == "transpose":
            record["transpose_h_fwd_crops_per_sec_b64"] = round(u.batch / med[u.name], 2)
            if u.flops == u.flops:
                record["transpose_h_fwd_mfu"] = round(
                    u.flops / med[u.name] / V5E_BF16_PEAK, 4)
        elif u.name == "refine":
            record[f"coam_refine3x_ms_per_image_p{u.poses}"] = round(
                med[u.name] * 1e3, 1)
        elif u.name == "serving":
            nb, hb, wb, pb = u.shape
            record[f"serving_device_crops_per_sec_{nb}x{hb}x{wb}_p{pb}"] = round(
                nb * pb / med[u.name], 1)

    # --- session-health canary + per-metric deviation flags -----------------
    c_med = float(np.median(canary_ms))
    record["canary_ms"] = round(c_med, 2)
    record["canary_ms_max"] = round(float(np.max(canary_ms)), 2)
    if CANARY_REF_MS and not on_cpu:
        record["canary_ratio"] = round(c_med / CANARY_REF_MS, 3)
        if record["canary_ratio"] > 1.25:
            record["session_degraded"] = True
    # min/max per-metric spread across rounds, as % of the median
    record["round_spread_pct"] = {
        n: round(100 * (spread[n][1] - spread[n][0]) / med[n], 1) for n in med}
    if not on_cpu:
        flags = {}
        for key, ref in PERF_REF.items():
            if key in record and record[key] is not None:
                ratio = record[key] / ref
                if abs(ratio - 1.0) > FLAG_TOL:
                    flags[key] = {"ref": ref, "ratio": round(ratio, 3)}
        if flags:
            record["flags"] = flags
    if errors:
        record["setup_errors"] = errors
    if on_cpu:
        record["note"] = (
            "axon relay tunnel unreachable -> tiny-batch CPU fallback run; "
            "last on-chip v5e numbers (round 5, PERF.md): 1131 crops/s/chip "
            "e2e b384, CoAM-W48 ~800 crops/s b128, refine ~83 ms/image, "
            "serving ~470-550 device-resident crops/s; tools/relay_watch.sh "
            "re-measures when the tunnel returns")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
