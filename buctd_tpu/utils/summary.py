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
