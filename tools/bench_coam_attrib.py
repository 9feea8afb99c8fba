"""CoAM-W48 serving-step attribution (VERDICT r4 item 2).

Decomposes the b128 CoAM-W48 eval forward (the OCHuman/CrowdPose flagship,
/root/reference/lib/models/pose_hrnet_coam.py:631-725) into separately jitted
programs whose times should sum to ~the full step:

  full        : CoAM-W48 forward, 6-ch input (the bench.py metric)
  trunk       : identical model with ATT_MODULES all-false (plain W48 trunk +
                final layer on the RGB channels — the non-attention floor)
  coam_block  : the stage-2 CoAMBlock alone (3 DAModules on branch tensors +
                the full-res colored condition)
  cond_resize : the 3 bilinear condition resizes (384x288 -> branch dims)
  pos_att[i]  : PositionAttentionModule per branch (branch 0 = the flash op)
  chan_att[i] : ChannelAttentionModule per branch (the H*W-wide fc_o linear)

Every program is AOT-compiled, returns ONE scalar through an acc carry (no
eager ops in the loop; one host fetch per pass), and all programs are timed in
interleaved rounds (median reported) — same methodology as bench.py, because
cross-pass relay drift is ~3x worst-case (PERF.md).

A trivial ``floor`` program measures the relay's per-dispatch host overhead
(~6 ms round 5) and is subtracted from every median: the floor dominates any
program under ~20 ms, and only floor-corrected piece times sum to the
in-context block/full times (PERF.md round-5 CoAM section).

Usage: python tools/bench_coam_attrib.py [BATCH] [--rounds 5] [--steps 4]
"""

import argparse
import time
import types

import numpy as np

import _init_paths  # noqa: F401

from buctd_tpu.utils.compcache import enable as _enable_compcache

_enable_compcache()

CFG = "/root/repo/experiments/coco/buctd/coam_w48_384x288.yaml"
V5E_BF16_PEAK = 197e12

# stage-2 injection point of the default config (ATT_MODULES=[F,T,F,F]):
# 3 branches after transition2 (pose_hrnet_coam.py:359-379)
BRANCHES = [((96, 72), 48), ((48, 36), 96), ((24, 18), 192)]


def _cfg(opts=()):
    from buctd_tpu.config import default_config, update_config

    cfg = default_config()
    update_config(cfg, types.SimpleNamespace(
        cfg=CFG, opts=list(opts), modelDir="", logDir="", dataDir=""))
    return cfg


class Prog:
    def __init__(self, name, fn, args):
        import jax

        self.name = name
        self.compiled = jax.jit(fn).lower(*args, 0.0).compile()
        try:
            self.flops = float(self.compiled.cost_analysis()["flops"])
        except Exception:
            self.flops = float("nan")
        self.args = args
        self.run(1)                      # warm

    def run(self, steps):
        acc = 0.0
        for _ in range(steps):
            acc = self.compiled(*self.args, acc)
        return float(acc)

    def time_pass(self, steps):
        t0 = time.perf_counter()
        self.run(steps)
        return (time.perf_counter() - t0) / steps


def _zeros_vars(model, x0):
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x0,
                                               train=False))
    return jax.jit(lambda: jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("batch", nargs="?", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--steps", type=int, default=4)
    a = ap.parse_args()
    B = a.batch

    import jax
    import jax.numpy as jnp

    from buctd_tpu.models import get_model
    from buctd_tpu.models.coam import (ChannelAttentionModule, CoAMBlock,
                                       PositionAttentionModule)
    from buctd_tpu.ops.warp import resize_bilinear

    rng = np.random.RandomState(0)
    x6 = jnp.array(rng.rand(B, 384, 288, 6).astype(np.float32))
    progs = []

    # --- dispatch-floor witness ----------------------------------------------
    # A trivial program: its measured per-step time is almost purely the
    # relay's per-dispatch host overhead (~6 ms measured round 5).  Subtract
    # it from every OTHER program's median to read the true device time of
    # small pieces — the floor dominates anything under ~20 ms and is what
    # made the raw piece sums exceed the in-context block by ~2x.
    tiny = jnp.array(rng.rand(128, 128).astype(np.float32))
    progs.append(Prog("floor", lambda t, acc: acc + t.sum(), (tiny,)))

    # --- full model vs attention-free trunk ---------------------------------
    for name, opts in [("full", []),
                       ("trunk", ["MODEL.ATT_MODULES",
                                  "[False, False, False, False]"])]:
        model = get_model(_cfg(opts), dtype=jnp.bfloat16)
        variables = _zeros_vars(model, jnp.zeros((1, 384, 288, 6)))
        progs.append(Prog(
            name,
            lambda v, x, acc, m=model: acc + m.apply(v, x, train=False)
            .astype(jnp.float32).sum(),
            (variables, x6)))

    # --- the stage-2 CoAMBlock and its pieces, in isolation -----------------
    cond = jnp.array(rng.rand(B, 384, 288, 3).astype(np.float32) * 255)
    ys = tuple(jnp.array(rng.rand(B, h, w, c).astype(np.float32))
               for (h, w), c in BRANCHES)
    chans = tuple(c for _, c in BRANCHES)

    block = CoAMBlock(channel_list=chans, d_cond=3, n_heads=1,
                      channel_only=False, dtype=jnp.bfloat16)
    bvars = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype),
        jax.eval_shape(lambda: block.init(
            jax.random.PRNGKey(0), ys, cond, train=False))))()

    def block_fn(v, ys, cond, acc):
        outs = block.apply(v, ys, cond, train=False)
        return acc + sum(o.astype(jnp.float32).sum() for o in outs)

    progs.append(Prog("coam_block", block_fn, (bvars, ys, cond)))

    def resize_fn(cond, acc):
        s = 0.0
        for (h, w), _ in BRANCHES:
            s = s + resize_bilinear(cond, (h, w)).astype(jnp.float32).sum()
        return acc + s

    progs.append(Prog("cond_resize", resize_fn, (cond,)))

    for i, (((h, w), c), y) in enumerate(zip(BRANCHES, ys)):
        ci = resize_bilinear(cond, (h, w))
        pa = PositionAttentionModule(d_model=c, d_cond=3, n_heads=1,
                                     dtype=jnp.bfloat16)
        pv = jax.jit(lambda pa=pa, y=y, ci=ci: jax.tree.map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype),
            jax.eval_shape(lambda: pa.init(
                jax.random.PRNGKey(0), y, ci, train=False))))()
        progs.append(Prog(
            f"pos_att[{i}] L={h * w} d={c}",
            lambda v, y, ci, acc, pa=pa: acc + pa.apply(v, y, ci, train=False)
            .astype(jnp.float32).sum(),
            (pv, y, ci)))
        ca = ChannelAttentionModule(d_model=c, d_cond=3, hw=h * w, n_heads=1,
                                    dtype=jnp.bfloat16)
        cv = jax.jit(lambda ca=ca, y=y, ci=ci: jax.tree.map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype),
            jax.eval_shape(lambda: ca.init(
                jax.random.PRNGKey(0), y, ci, train=False))))()
        progs.append(Prog(
            f"chan_att[{i}] hw={h * w} C={c}",
            lambda v, y, ci, acc, ca=ca: acc + ca.apply(v, y, ci, train=False)
            .astype(jnp.float32).sum(),
            (cv, y, ci)))

    # --- interleaved timing rounds ------------------------------------------
    times = {p.name: [] for p in progs}
    for _ in range(a.rounds):
        for p in progs:
            times[p.name].append(p.time_pass(a.steps))

    med = {n: float(np.median(ts)) * 1e3 for n, ts in times.items()}
    floor = med.get("floor", 0.0)
    print(f"CoAM-W48 b{B} attribution (bf16, medians of {a.rounds} interleaved "
          f"rounds x {a.steps} steps; device = raw - {floor:.2f} ms dispatch "
          f"floor):")
    dev = {n: max(ms - floor, 0.0) for n, ms in med.items() if n != "floor"}
    for p in progs:
        if p.name == "floor":
            continue
        ms = med[p.name]
        mfu = (p.flops / (dev[p.name] / 1e3) / V5E_BF16_PEAK
               if p.flops == p.flops and dev[p.name] > 0 else float("nan"))
        lo = min(times[p.name]) * 1e3
        hi = max(times[p.name]) * 1e3
        print(f"  {p.name:24s}: {ms:8.2f} ms raw, {dev[p.name]:8.2f} device "
              f"(min {lo:7.2f}, max {hi:7.2f})  "
              f"{p.flops / 1e9 if p.flops == p.flops else float('nan'):9.1f} GF "
              f" MFU {100 * mfu:5.1f}%", flush=True)
    parts = dev["trunk"] + dev["coam_block"]
    print(f"  sum trunk+coam_block    : {parts:8.2f} ms vs full {dev['full']:.2f} "
          f"({100 * parts / dev['full']:.0f}%)")
    pieces = dev["cond_resize"] + sum(
        dev[n] for n in dev if n.startswith(("pos_att", "chan_att")))
    print(f"  sum block pieces        : {pieces:8.2f} ms vs coam_block "
          f"{dev['coam_block']:.2f} ({100 * pieces / max(dev['coam_block'], 1e-9):.0f}%)")
    print(f"  full throughput         : {B / (med['full'] / 1e3):8.1f} crops/s "
          f"(raw; {B / (dev['full'] / 1e3):.1f} device)")


if __name__ == "__main__":
    main()
