"""ops/pallas_block.py fused basic block: interpret-mode parity vs the XLA
conv pair (the kernel is a documented measured-NEGATIVE — see PERF.md
round-5 'fused basic block' — kept correct as the record of the experiment)."""

import numpy as np
import pytest


def _xla_block(x, w1, w2, b1, b2):
    import jax
    from jax import lax

    dn = lax.conv_dimension_numbers(x.shape, w1.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(x, w1, (1, 1), "SAME", dimension_numbers=dn)
    y = jax.nn.relu(y + b1)
    z = lax.conv_general_dilated(y, w2, (1, 1), "SAME", dimension_numbers=dn)
    return jax.nn.relu(z + b2 + x)


@pytest.mark.parametrize("b,h,w,c", [
    (3, 12, 9, 16),    # width not a sublane multiple -> pad/mask path
    (4, 8, 8, 8),      # aligned width
    (2, 6, 16, 4),     # group >1 (b divides, h*w small)
])
def test_fused_block_matches_xla_pair(b, h, w, c):
    import jax.numpy as jnp

    from buctd_tpu.ops.pallas_block import fused_basic_block

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    w1 = jnp.asarray(rng.randn(3, 3, c, c) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(3, 3, c, c) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    want = _xla_block(x, w1, w2, b1, b2)
    got = fused_basic_block(x, w1, w2, b1, b2, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)
