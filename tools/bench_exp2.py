"""Micro A/B: VPU transcendental throughput — math.exp vs native math.exp2.

The flash kernels (ops/flash_attention.py) sit at their VPU-exp bound
(PERF.md round 4): ~2 elementwise softmax passes per (1024, 1024) s-tile, and
the exp is the dominant term.  On backends newer than 2025-07-26 Mosaic lowers
``jnp.exp2`` to native ``math.exp2`` (pow2) instead of ``exp(ln2*x)``
(jax/_src/pallas/mosaic/lowering.py::_exp2_lowering_rule) — if pow2 is
materially cheaper than exp on the v5e VPU, the whole flash softmax can run in
the log2 domain (fold log2(e) into the q-scale; the GPU/Triton flash trick).

This benchmark isolates that question: one Pallas kernel per variant runs
INNER chained ``op(y * c)`` steps on a VMEM-resident f32 tile (the multiply
keeps the op count identical across variants; c keeps values bounded), OUTER
calls are chained inside ONE jit so a single host fetch fences the whole run
(relay rule: block_until_ready returns early).  Interleaved rounds, medians.

Usage: python tools/bench_exp2.py [rounds=5]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

ROWS, COLS = 512, 1024
INNER = 128          # chained transcendentals per element per call
OUTER = 8            # pallas calls chained per jit


def _kernel(op, x_ref, o_ref):
    y = x_ref[...]

    def body(i, y):
        # *0.03 keeps exp/exp2 outputs in a sane range (y stays near 1.03);
        # every variant pays the same multiply so the delta is the
        # transcendental alone
        return op(y * 0.03)

    y = jax.lax.fori_loop(0, INNER, body, y)
    o_ref[...] = y


def make(op):
    call = pl.pallas_call(
        functools.partial(_kernel, op),
        out_shape=jax.ShapeDtypeStruct((ROWS, COLS), jnp.float32),
    )

    @jax.jit
    def run(x):
        def body(i, y):
            return call(y)
        return jax.lax.fori_loop(0, OUTER, body, x)

    return run


VARIANTS = {
    "exp": jnp.exp,
    "exp2": jnp.exp2,
    # exp decomposed as pow2: what the log2-domain flash softmax would run
    "exp2(x*log2e)": lambda y: jnp.exp2(y * 1.4426950408889634),
}


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    x = jnp.ones((ROWS, COLS), jnp.float32)
    fns = {name: make(op) for name, op in VARIANTS.items()}
    for f in fns.values():                       # compile + warm
        np.asarray(f(x))
    n_trans = ROWS * COLS * INNER * OUTER
    times = {name: [] for name in fns}
    for r in range(rounds):
        for name, f in fns.items():              # interleaved A/B/C
            t0 = time.perf_counter()
            np.asarray(f(x))                     # host fetch = the only fence
            times[name].append(time.perf_counter() - t0)
    print(f"tile ({ROWS}, {COLS}) f32, {INNER} chained ops x {OUTER} calls, "
          f"{rounds} interleaved rounds")
    base = np.median(times["exp"])
    for name, ts in times.items():
        med = float(np.median(ts))
        print(f"  {name:16s} {med * 1e3:8.2f} ms   "
              f"{n_trans / med / 1e9:6.2f} Gop/s   vs exp {base / med:.2f}x")


if __name__ == "__main__":
    main()
