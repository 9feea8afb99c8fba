"""Model summary: params + FLOPs via XLA cost analysis.

Replaces the reference's hook-based get_model_summary (lib/utils/utils.py:311-426)
with jit lowering cost analysis — exact for the compiled program, no hooks needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_model_summary(model, variables, input_shape) -> str:
    params = variables.get("params", variables)
    n_params = sum(x.size for x in jax.tree.leaves(params))

    x = jnp.zeros(input_shape, jnp.float32)
    lowered = jax.jit(lambda v, x: model.apply(v, x, train=False)).lower(variables, x)
    flops = None
    try:
        cost = lowered.compile().cost_analysis()
        if cost:
            flops = cost.get("flops")
    except Exception:
        pass

    lines = [
        "=" * 60,
        f"Model: {type(model).__name__}",
        f"Input shape: {tuple(input_shape)}",
        f"Total parameters: {n_params:,} ({n_params * 4 / 1024 ** 2:.2f} MB fp32)",
    ]
    if flops:
        lines.append(f"Compiled forward FLOPs: {flops / 1e9:.2f} GFLOPs")
    lines.append("=" * 60)
    return "\n".join(lines)


V5E_BF16_PEAK = 197e12  # v5e MXU peak, bf16 FLOP/s


def compiled_flops(jitted, *args) -> float:
    """FLOPs of the compiled ``jitted(*args)``: XLA cost_analysis + analytic
    matmul FLOPs for pallas flash-attention calls (XLA counts custom calls as
    ~0 — ops/flash_attention.py::trace_shapes)."""
    from ..ops import flash_attention as fa

    fa.trace_shapes(True)
    try:
        flops = float(jitted.lower(*args).compile().cost_analysis()["flops"])
        return flops + fa.logged_flops()
    finally:
        fa.trace_shapes(False)


def mfu_string(jitted, args, dt_seconds, peak=V5E_BF16_PEAK) -> str:
    """'  NN.NN TF -> MFU X.X%' suffix for bench lines ('' if analysis fails).
    Shared by tools/bench_coam.py, bench_transpose.py, bench_train.py."""
    try:
        flops = compiled_flops(jitted, *args)
    except Exception:
        return ""
    return (f"  {flops / 1e12:.2f} TF -> MFU "
            f"{flops / dt_seconds / peak * 100:.1f}%")
