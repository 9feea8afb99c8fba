"""Per-branch isolation of the HRNet basic-block conv pair (eval mode).

The round-5 HBM-roofline section (PERF.md) predicts, per branch geometry,
which bound binds a W48 basic block (two 3x3 SAME convs + bias/ReLU + the
residual add, BN folded as in eval):

    branch 0: (96, 72)xC48  — MXU lane fill 37.5% -> fill-bound
    branch 1: (48, 36)xC96  — fill 75%
    branch 2: (24, 18)xC192 — full fill, tiny activations
    branch 3: (12,  9)xC384 — full fill

This tool times each geometry's block at b128 with the scalar-carry protocol
(K block applications chained inside one fori_loop dispatch — the output
feeds back as the next input, so nothing leaves the device and the ~7 ms
relay dispatch floor amortizes over the chain), interleaved over R rounds,
and prints measured ms/block vs the two structural bounds.  The verdict
column says how much headroom a pallas fused-block kernel could possibly
have (measured / max(bounds)).

Optionally (--pallas) A/Bs the pallas fused basic-block kernel
(ops/pallas_block.py) against XLA's pair under the same protocol.
"""
import argparse
import time

import numpy as np

import _init_paths  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax

from buctd_tpu.utils.compcache import enable

PEAK_BF16 = 197e12
SUSTAINED_HBM = 576e9   # measured, tools/bench_hbm.py --stream
B = 128
K = 50                  # chained block applications per dispatch
ROUNDS = 5

BRANCHES = [          # (name, H, W, C, lane_fill)
    ("branch0", 96, 72, 48, 48 / 128),
    ("branch1", 48, 36, 96, 96 / 128),
    ("branch2", 24, 18, 192, 1.0),
    ("branch3", 12, 9, 384, 1.0),
]


def make_params(rng, c):
    # small weights keep the K-deep chain numerically tame in bf16
    w1 = jnp.asarray(rng.randn(3, 3, c, c) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(3, 3, c, c) * 0.02, jnp.bfloat16)
    b1 = jnp.asarray(rng.randn(c) * 0.01, jnp.bfloat16)
    b2 = jnp.asarray(rng.randn(c) * 0.01, jnp.bfloat16)
    return w1, w2, b1, b2


def xla_block(x, w1, w2, b1, b2):
    dn = lax.conv_dimension_numbers(x.shape, w1.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(x, w1, (1, 1), "SAME", dimension_numbers=dn)
    y = jax.nn.relu(y + b1)
    z = lax.conv_general_dilated(y, w2, (1, 1), "SAME", dimension_numbers=dn)
    return jax.nn.relu(z + b2 + x)


def timed_chain(block_fn, x, params):
    """Compile x -> K chained blocks -> scalar; return median ms/block."""

    def prog(x):
        y = lax.fori_loop(0, K, lambda i, y: block_fn(y, *params), x)
        return (y[0, 0, 0, 0] + y[-1, -1, -1, -1]).astype(jnp.float32)

    fn = jax.jit(prog).lower(x).compile()
    float(fn(x))  # warm
    ts = []
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        float(fn(x))
        ts.append((time.perf_counter() - t0) / K * 1e3)
    return float(np.median(ts)), min(ts), max(ts)


def bounds(h, w, c, fill):
    flops = 2 * 2 * 9 * c * c * h * w * B           # two 3x3 convs
    t_fill = flops / (PEAK_BF16 * fill) * 1e3
    # fused-pair ideal traffic: x in + out (+ residual re-read is in VMEM)
    t_hbm = (2 * B * h * w * c * 2) / SUSTAINED_HBM * 1e3
    return t_fill, t_hbm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pallas", action="store_true",
                    help="also time ops/pallas_block.py's fused kernel")
    args = ap.parse_args()
    enable()
    rng = np.random.RandomState(0)
    cases = []
    for name, h, w, c, fill in BRANCHES:
        params = make_params(rng, c)
        x = jnp.asarray(rng.randn(B, h, w, c) * 0.5, jnp.bfloat16)
        cases.append((name, h, w, c, fill, x, params))

    print(f"# b{B}, {K} chained blocks/dispatch, {ROUNDS} interleaved rounds"
          f" — ms per block (2 convs + bias/relu + residual)")
    print(f"# bounds: fill = flops/(197TF*lane_fill); "
          f"hbm = fused-pair in+out @ {SUSTAINED_HBM / 1e9:.0f} GB/s")
    results = {}
    for name, h, w, c, fill, x, params in cases:
        med, lo, hi = timed_chain(xla_block, x, params)
        t_fill, t_hbm = bounds(h, w, c, fill)
        bound = max(t_fill, t_hbm)
        results[name] = med
        print(f"{name} ({h}x{w}xC{c}): XLA {med:7.3f} ms "
              f"[{lo:.3f}-{hi:.3f}]  fill-bound {t_fill:6.3f}  "
              f"hbm-bound {t_hbm:6.3f}  headroom {med / bound:5.2f}x")

    if args.pallas:
        from buctd_tpu.ops.pallas_block import fused_basic_block
        for name, h, w, c, fill, x, params in cases:
            try:
                med, lo, hi = timed_chain(fused_basic_block, x, params)
            except Exception as e:  # one geometry failing shouldn't kill the run
                print(f"{name} ({h}x{w}xC{c}): PALLAS failed: "
                      f"{str(e).splitlines()[0][:120]}")
                continue
            print(f"{name} ({h}x{w}xC{c}): PALLAS {med:7.3f} ms "
                  f"[{lo:.3f}-{hi:.3f}]  vs XLA {results[name]:7.3f} "
                  f"({results[name] / med:.2f}x)")


if __name__ == "__main__":
    main()
