"""HBM roofline probe: sustained bandwidth + per-model bytes-bound floors.

Two parts (run either or both):

1. ``--stream``: measures the chip's *sustained* read+write HBM bandwidth with
   a carried full-array multiply inside ONE dispatch (K iterations of
   ``y = y * 1.0000001`` over a 1 GiB f32 array via ``lax.fori_loop``).  Each
   iteration streams the array through the VPU (1 GiB read + 1 GiB write); the
   ~7 ms relay dispatch floor (PERF.md round-5) is paid once for the whole
   K-deep chain, so it is negligible.  The array (1 GiB) cannot live in VMEM
   (~128 MB), forcing true HBM traffic.

2. ``--roofline``: compiles the flagship forwards (CoAM-W48 b128 full + trunk,
   preNet-W48 b384) and prints XLA ``cost_analysis`` flops / bytes-accessed,
   the MXU-bound and HBM-bound time floors, and arithmetic intensity.
   ``bytes accessed`` is post-fusion operand+output traffic — a *lower bound*
   on real HBM traffic (assumes perfect within-fusion reuse), so
   measured_time / (bytes / sustained_BW) is a defensible "fraction of the
   bytes floor" statement.

Round-5 measurement on the v5e (2026-08-20): sustained r+w = **576 GB/s**
(137 GB in 238.4 ms, spread 237.5-242.7 over 5 passes) vs ~819 GB/s nominal.
See PERF.md "HBM roofline" section for the resulting model table.
"""
import argparse
import time
import types

import numpy as np

import _init_paths  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax

from buctd_tpu.utils.compcache import enable

# v5e nominal peaks (How to Scale Your Model, v5e row)
PEAK_BF16 = 197e12
NOMINAL_HBM = 819e9
# measured sustained r+w on this chip's relay session, round 5
SUSTAINED_HBM = 576e9


def stream_probe(gib=1, iters=64, passes=5):
    n = gib * 256 * 1024 * 1024  # f32 elements
    x0 = jax.jit(lambda: jnp.full((n,), 1.0, jnp.float32))()

    def prog(x, acc):
        y = lax.fori_loop(0, iters, lambda i, y: y * 1.0000001, x)
        return acc + y[0] + y[n // 2]

    fn = jax.jit(prog).lower(x0, 0.0).compile()
    float(fn(x0, 0.0))  # warm
    ts = []
    for _ in range(passes):
        t0 = time.perf_counter()
        float(fn(x0, 0.0))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1e3
    traffic = iters * 2 * n * 4 / 1e9  # read + write per iteration
    print(f"stream: {ms:.1f} ms for {traffic:.0f} GB -> sustained r+w "
          f"{traffic / (ms / 1e3):.0f} GB/s "
          f"(min {min(ts) * 1e3:.1f} max {max(ts) * 1e3:.1f})")


def _cfg_for(path, opts=()):
    from buctd_tpu.config import default_config, update_config
    c = default_config()
    update_config(c, types.SimpleNamespace(cfg=path, opts=list(opts),
                                           modelDir="", logDir="", dataDir=""))
    return c


def _report(name, cfg, batch):
    from buctd_tpu.models import get_model
    model = get_model(cfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 384, 288, 6)), train=False))
    variables = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()
    x = jnp.zeros((batch, 384, 288, 6), jnp.bfloat16)
    comp = jax.jit(lambda v, x: model.apply(v, x, train=False)).lower(
        variables, x).compile()
    ca = comp.cost_analysis()
    fl = ca.get("flops", float("nan"))
    by = ca.get("bytes accessed", float("nan"))
    print(f"{name:16s} b{batch}: {fl / 1e12:6.2f} TF {by / 1e9:7.2f} GB  "
          f"MXU floor {fl / PEAK_BF16 * 1e3:7.2f} ms  "
          f"HBM floor {by / SUSTAINED_HBM * 1e3:7.2f} ms @576  "
          f"AI {fl / by:6.1f} F/B  "
          f"MFU ceiling {fl / by * SUSTAINED_HBM / PEAK_BF16 * 100:.1f}%")


def roofline():
    coam = "experiments/coco/buctd/coam_w48_384x288.yaml"
    prenet = "experiments/coco/buctd/prenet_w48_384x288.yaml"
    print(f"# peaks: {PEAK_BF16 / 1e12:.0f} TF/s bf16, sustained HBM "
          f"{SUSTAINED_HBM / 1e9:.0f} GB/s (nominal {NOMINAL_HBM / 1e9:.0f})")
    _report("CoAM-W48 full", _cfg_for(coam), 128)
    _report("CoAM-W48 trunk",
            _cfg_for(coam, ["MODEL.ATT_MODULES", "[False, False, False, False]"]),
            128)
    _report("preNet-W48", _cfg_for(prenet), 384)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--roofline", action="store_true")
    args = ap.parse_args()
    enable()
    if not (args.stream or args.roofline):
        args.stream = args.roofline = True
    if args.stream:
        stream_probe()
    if args.roofline:
        roofline()
