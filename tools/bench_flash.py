"""Flash-attention kernel validation + benchmark on the real TPU.

CPU interpret-mode parity lives in tests/test_flash_attention.py; this script
covers what the interpreter cannot: real-Mosaic compilation, the TPU PRNG
dropout path, and wall-clock vs the round-2 mapped-2-D-GEMM formulation.

    python tools/bench_flash.py [--parity] [--dropout] [--perf] (default: all)
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from buctd_tpu.utils.compcache import enable as _enable

_enable()

import jax                                                     # noqa: E402
import jax.numpy as jnp                                        # noqa: E402

from buctd_tpu.models.attention import _attend                 # noqa: E402
from buctd_tpu.ops.flash_attention import flash_attention      # noqa: E402


def _fetch(x):
    return float(jnp.sum(x))   # host fetch = the only reliable fence (CLAUDE.md)


def _mk(bh, l, d, dtype=jnp.float32, seed=0):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(bh, l, d), dtype),
            jnp.asarray(rng.randn(bh, l, d), dtype),
            jnp.asarray(rng.randn(bh, l, d), dtype))


def check_parity():
    print("== parity (TPU Mosaic vs mapped-GEMM dense) ==", flush=True)
    for bh, l, d in [(2, 1728, 48), (1, 432, 96), (2, 6912, 112)]:
        q, k, v = _mk(bh, l, d)
        scale = 1.0 / np.sqrt(d)
        flash = jax.jit(lambda q, k, v, s=scale: flash_attention(q, k, v, 0, s))
        dense = jax.jit(lambda q, k, v, s=scale: _attend(
            q[:, None], k[:, None], v[:, None], s)[:, 0])
        import os
        os.environ["BUCTD_ATTENTION_ENGINE"] = "mapped"
        with jax.default_matmul_precision("highest"):   # f32-exact reference
            want = np.asarray(dense(q, k, v))
        os.environ["BUCTD_ATTENTION_ENGINE"] = "auto"
        got = np.asarray(flash(q, k, v))
        err = np.abs(got - want).max() / (np.abs(want).max() + 1e-12)
        print(f"  bh={bh} L={l} d={d}: rel max err {err:.2e} "
              f"{'OK' if err < 1e-4 else 'FAIL'}", flush=True)


def check_dropout():
    print("== dropout (TPU PRNG) ==", flush=True)
    bh, l, d, p = 1, 1728, 64, 0.1
    q, k, v = _mk(bh, l, d)
    scale = 1.0 / np.sqrt(d)
    f = jax.jit(lambda q, k, v, s: flash_attention(q, k, v, s, scale, p))
    o1 = np.asarray(f(q, k, v, jnp.int32(7)))
    o2 = np.asarray(f(q, k, v, jnp.int32(7)))
    o3 = np.asarray(f(q, k, v, jnp.int32(8)))
    det = np.array_equal(o1, o2)
    diff = not np.allclose(o1, o3)
    print(f"  same-seed deterministic: {det}; different-seed differs: {diff}", flush=True)

    base = np.asarray(jax.jit(
        lambda q, k, v: flash_attention(q, k, v, 0, scale, 0.0))(q, k, v))
    outs = np.stack([np.asarray(f(q, k, v, jnp.int32(s))) for s in range(20)])
    mean_rel = (np.abs(outs.mean(0) - base).mean()
                / (np.abs(base).mean() + 1e-12))
    print(f"  E[dropout-out] vs dropout-free: mean rel dev {mean_rel:.3f} "
          f"{'OK' if mean_rel < 0.08 else 'CHECK'}", flush=True)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, 7, scale, p) ** 2)

    g1 = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    g2 = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    finite = all(bool(jnp.isfinite(x).all()) for x in g1)
    same = all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(g1, g2))
    print(f"  grads finite: {finite}; grads deterministic: {same}", flush=True)
    # fwd/bwd mask consistency: at p -> 0+ the dropout grads must approach the
    # dropout-free grads (the masks cancel); at p=0.1 they differ but correlate
    g0 = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(flash_attention(q, k, v, 7, scale, 0.0) ** 2),
        argnums=(0, 1, 2)))(q, k, v)
    for a, b, n in zip(g1, g0, "qkv"):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        print(f"  d{n} corr(p=0.1, p=0): {corr:.3f}", flush=True)


def bench_perf():
    print("== perf vs mapped-GEMM (bf16 inputs, f32 softmax) ==", flush=True)
    import os
    for name, bh, l, d in [("CoAM-stage2 b128", 128, 6912, 48),
                           ("TransPose b16 (x6 layers)", 16, 6912, 112)]:
        q, k, v = _mk(bh, l, d, jnp.bfloat16)
        scale = 1.0 / np.sqrt(d)
        flash = jax.jit(lambda q, k, v, s=scale: flash_attention(q, k, v, 0, s))
        os.environ["BUCTD_ATTENTION_ENGINE"] = "mapped"
        mapped = jax.jit(lambda q, k, v, s=scale: _attend(
            q[:, None], k[:, None], v[:, None], s)[:, 0])

        for label, fn in [("flash", flash), ("mapped", mapped)]:
            _fetch(fn(q, k, v))          # compile
            _fetch(fn(q, k, v))          # warm
            t0 = time.perf_counter()
            n = 5
            for _ in range(n):
                _fetch(fn(q, k, v))
            dt = (time.perf_counter() - t0) / n * 1e3
            print(f"  {name:28s} {label:6s}: {dt:8.2f} ms", flush=True)
        os.environ["BUCTD_ATTENTION_ENGINE"] = "auto"


def bench_levers():
    """Isolate each forward lever on chip (VERDICT r3 item 1): grid kernel vs
    kv-resident kernel, f32 vs bf16 softmax tiles, 1024^2 vs 1152^2 tiles.
    Env knobs are read at TRACE time, so each config jits a fresh lambda."""
    import os
    print("== per-lever forward isolation (bf16 operands) ==", flush=True)
    configs = [
        # (label, KVRES, BF16_SOFTMAX, TILE) — grid/1024/f32 won the round-4
        # A/B (perf_logs/r4_queue2.log) and is now the default
        ("grid  1024^2 f32-softmax (dflt)",    "0", "",  "1024"),
        ("grid  1024^2 bf16-softmax",          "0", "1", "1024"),
        ("grid  1152^2 bf16-softmax (r3 dflt)", "0", "1", "1152"),
        ("kvres 1152^2 bf16-softmax",          "1", "1", "1152"),
        ("kvres 1152^2 f32-softmax",           "1", "",  "1152"),
    ]
    for name, bh, l, d in [("CoAM-stage2 b128", 128, 6912, 48),
                           ("TransPose b16 (x6 layers)", 16, 6912, 112)]:
        q, k, v = _mk(bh, l, d, jnp.bfloat16)
        scale = 1.0 / np.sqrt(d)
        ref = None
        for label, kvres, bf16sm, tile in configs:
            os.environ["BUCTD_FLASH_KVRES"] = kvres
            os.environ["BUCTD_FLASH_BF16_SOFTMAX"] = bf16sm
            if tile:
                os.environ["BUCTD_FLASH_TILE"] = tile
            else:
                os.environ.pop("BUCTD_FLASH_TILE", None)
            fn = jax.jit(lambda q, k, v, s=scale: flash_attention(q, k, v, 0, s))
            try:
                got = np.asarray(fn(q, k, v), np.float32)
                if ref is None:
                    ref = got
                err = (np.abs(got - ref).max() / (np.abs(ref).max() + 1e-12))
                _fetch(fn(q, k, v))
                t0 = time.perf_counter()
                n = 5
                for _ in range(n):
                    _fetch(fn(q, k, v))
                dt = (time.perf_counter() - t0) / n * 1e3
                print(f"  {name:26s} {label:36s}: {dt:8.2f} ms  "
                      f"(rel-vs-base {err:.1e})", flush=True)
            except Exception as e:
                print(f"  {name:26s} {label:36s}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
        for kk in ("BUCTD_FLASH_KVRES", "BUCTD_FLASH_BF16_SOFTMAX",
                   "BUCTD_FLASH_TILE"):
            os.environ.pop(kk, None)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--dropout", action="store_true")
    ap.add_argument("--perf", action="store_true")
    ap.add_argument("--levers", action="store_true")
    a = ap.parse_args()
    run_all = not (a.parity or a.dropout or a.perf or a.levers)
    print("devices:", jax.devices(), flush=True)
    if a.parity or run_all:
        check_parity()
    if a.dropout or run_all:
        check_dropout()
    if a.perf or run_all:
        bench_perf()
    if a.levers:
        bench_levers()
