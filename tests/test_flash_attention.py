"""Pallas flash attention vs the dense formulation (ops/flash_attention.py).

CPU runs use interpret=True.  Dropout paths need the TPU PRNG (no interpreter
lowering) and are exercised by tools/bench_flash.py on the real chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from buctd_tpu.ops.flash_attention import flash_attention


def _dense(q, k, v, scale):
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("bh,lq,lk,d", [
    (2, 256, 256, 48),      # CoAM-ish head dim, aligned L
    (1, 300, 300, 112),     # TransPose-ish head dim, unaligned L (padding+mask)
    (3, 640, 384, 96),      # cross-attention lengths, multi-block
    (1, 128, 700, 64),      # single q block, padded kv tail
])
def test_flash_forward_matches_dense(bh, lq, lk, d):
    rng = np.random.RandomState(0)
    q = rng.randn(bh, lq, d).astype(np.float32)
    k = rng.randn(bh, lk, d).astype(np.float32)
    v = rng.randn(bh, lk, d).astype(np.float32)
    scale = 1.0 / np.sqrt(d)
    got = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 0,
                          scale, 0.0, True)
    want = _dense(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_backward_matches_dense():
    bh, lq, lk, d = 2, 300, 200, 48
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(bh, lq, d).astype(np.float32))
    k = jnp.asarray(rng.randn(bh, lk, d).astype(np.float32))
    v = jnp.asarray(rng.randn(bh, lk, d).astype(np.float32))
    g = jnp.asarray(rng.randn(bh, lq, d).astype(np.float32))
    scale = 1.0 / np.sqrt(d)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, 0, scale, 0.0, True) * g)

    def loss_dense(q, k, v):
        return jnp.sum(_dense(q, k, v, scale) * g)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for gg, ww, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(ww), atol=5e-4,
                                   rtol=1e-3, err_msg=f"d{name}")


@pytest.mark.parametrize("bh,lq,lk,d", [
    (2, 256, 256, 48),      # aligned
    (1, 300, 384, 112),     # padded q tail, cross lengths
    (1, 128, 700, 64),      # padded kv tail (masked sub-tile)
])
def test_flash_kvres_forward_and_backward(monkeypatch, bh, lq, lk, d):
    """The kv-resident kernels (BUCTD_FLASH_KVRES): forward parity vs dense
    plus full VJP parity — the round-4 serving-path kernels."""
    monkeypatch.setenv("BUCTD_FLASH_KVRES", "1")
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(bh, lq, d).astype(np.float32))
    k = jnp.asarray(rng.randn(bh, lk, d).astype(np.float32))
    v = jnp.asarray(rng.randn(bh, lk, d).astype(np.float32))
    g = jnp.asarray(rng.randn(bh, lq, d).astype(np.float32))
    scale = 1.0 / np.sqrt(d)

    got = flash_attention(q, k, v, 0, scale, 0.0, True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_dense(q, k, v, scale)),
                               atol=2e-5, rtol=2e-5)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, 0, scale, 0.0, True) * g)

    def loss_dense(q, k, v):
        return jnp.sum(_dense(q, k, v, scale) * g)

    got_g = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want_g = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for gg, ww, name in zip(got_g, want_g, "qkv"):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(ww), atol=5e-4,
                                   rtol=1e-3, err_msg=f"d{name}")


def test_flash_vmap_folds_into_bh():
    """jax.vmap over flash_attention (the serving batched path vmaps the whole
    refine loop) folds the vmapped dim into BH via the custom_vmap rule —
    custom_partitioning itself has no batching rule.  Forward AND grad."""
    n, bh, l, d = 3, 2, 256, 48
    rng = np.random.RandomState(5)
    q = jnp.asarray(rng.randn(n, bh, l, d).astype(np.float32))
    k = jnp.asarray(rng.randn(n, bh, l, d).astype(np.float32))
    v = jnp.asarray(rng.randn(n, bh, l, d).astype(np.float32))
    scale = 1.0 / np.sqrt(d)

    fn = lambda q, k, v: flash_attention(q, k, v, 0, scale, 0.0, True)
    got = jax.vmap(fn)(q, k, v)
    want = jnp.stack([fn(q[i], k[i], v[i]) for i in range(n)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    # unbatched kv broadcast across the vmapped dim
    got_b = jax.vmap(fn, in_axes=(0, None, None))(q, k[0], v[0])
    want_b = jnp.stack([fn(q[i], k[0], v[0]) for i in range(n)])
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b),
                               atol=2e-5, rtol=2e-5)

    g = jnp.asarray(rng.randn(n, bh, l, d).astype(np.float32))
    got_g = jax.vmap(jax.grad(
        lambda q, k, v, g: jnp.sum(fn(q, k, v) * g), argnums=(0, 1, 2)
    ))(q, k, v, g)
    want_g = jax.grad(
        lambda q, k, v: sum(jnp.sum(fn(q[i], k[i], v[i]) * g[i])
                            for i in range(n)), argnums=(0, 1, 2))(q, k, v)
    for gg, ww, name in zip(got_g, want_g, "qkv"):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(ww), atol=5e-4,
                                   rtol=1e-3, err_msg=f"d{name}")


def test_flash_bf16_inputs():
    bh, l, d = 1, 256, 48
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(bh, l, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(bh, l, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(bh, l, d), jnp.bfloat16)
    got = flash_attention(q, k, v, 0, 0.2, 0.0, True)
    want = _dense(q, k, v, 0.2)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-2)


def test_attend_routes_to_flash(monkeypatch):
    """models.attention._attend uses the flash kernel when the engine says so
    (interpret-mode shim on CPU) and matches its own mapped-GEMM path."""
    from buctd_tpu.models import attention as A
    from buctd_tpu.ops import flash_attention as F

    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(2, 1, 300, 48).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 1, 300, 48).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 1, 300, 48).astype(np.float32))
    want = np.asarray(A._attend(q, k, v, 0.15))   # mapped path (CPU auto)

    orig = F.flash_attention

    def interp(qq, kk, vv, seed=0, scale=1.0, dropout=0.0, interpret=False):
        return orig(qq, kk, vv, seed, scale, dropout, True)

    monkeypatch.setattr(F, "flash_attention", interp)
    monkeypatch.setenv("BUCTD_ATTENTION_ENGINE", "flash")
    got = np.asarray(A._attend(q, k, v, 0.15))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_pick_blocks_tiling():
    """Forward caps at 1024^2 (1152^2 zero-pad tiles measured slower on chip,
    round 4 — the op is VPU-bound so step count doesn't matter); backward
    keeps 768 (vmem-stack bound, PERF.md); BUCTD_FLASH_TILE overrides for
    bench A/Bs."""
    from buctd_tpu.ops.flash_attention import _pick_blocks

    assert _pick_blocks(6912, 6912) == (1024, 1024)
    assert _pick_blocks(1728, 1728) == (1024, 1024)
    assert _pick_blocks(6912, 6912, bwd=True) == (768, 768)
    assert _pick_blocks(300, 300) == (384, 384)         # lane-rounded small L
    import os
    os.environ["BUCTD_FLASH_TILE"] = "1152"
    try:
        assert _pick_blocks(6912, 6912) == (1152, 1152)
        assert _pick_blocks(6912, 6912, bwd=True) == (768, 768)
    finally:
        del os.environ["BUCTD_FLASH_TILE"]


def test_trace_shapes_logged_flops():
    """The bench MFU helpers read analytic FLOPs from the trace-time log
    (XLA cost_analysis reports ~0 for pallas custom calls)."""
    from buctd_tpu.ops import flash_attention as fa

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 256, 48), jnp.float32)
    fa.trace_shapes(True)
    try:
        jax.eval_shape(lambda a: flash_attention(a, a, a, 0, 1.0, 0.0, True),
                       q)
        assert fa.TRACE_SHAPES == [(2, 256, 256, 48)]
        assert fa.logged_flops() == 4.0 * 2 * 256 * 256 * 48
    finally:
        fa.trace_shapes(False)
    assert fa.TRACE_SHAPES == []


def test_dropout_forward_tiles_match_backward():
    """Dropout masks regenerate per-TILE from (seed, bh, qi, ki): the forward
    must tile exactly like the backward (768^2) whenever dropout is live, or
    the VJP draws a different realization than the forward applied.  The lse
    padding exposes the chosen block size."""
    from buctd_tpu.ops.flash_attention import _flash_fwd_impl

    spec = jax.ShapeDtypeStruct((1, 1000, 48), jnp.float32)
    _, lse0 = jax.eval_shape(
        lambda a: _flash_fwd_impl(a, a, a, 0, 1.0, 0.0, True), spec)
    _, lsed = jax.eval_shape(
        lambda a: _flash_fwd_impl(a, a, a, 0, 1.0, 0.1, True), spec)
    assert lse0.shape[1] == 1024          # dropout-free: big-tile fast path
    assert lsed.shape[1] == 1536          # dropout: 768-tiled like the bwd


def test_flash_partitions_over_batch_mesh():
    """Under a sharded jit the custom_partitioning rule partitions the BH axis
    across the mesh (each device runs the kernel on its rows) instead of
    GSPMD replicating the operands; values and output sharding must match the
    unsharded run — forward and grads."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices()[:8])
    if devs.size < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest)")
    mesh = Mesh(devs, ("data",))
    sh = NamedSharding(mesh, P("data", None, None))

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(8, 256, 48).astype(np.float32))
    want = flash_attention(q, q, q, 0, 0.15, 0.0, True)

    qs = jax.device_put(q, sh)
    fwd = jax.jit(lambda a: flash_attention(a, a, a, 0, 0.15, 0.0, True),
                  in_shardings=sh, out_shardings=sh)
    got = fwd(qs)
    assert got.sharding.is_equivalent_to(sh, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    def loss(a):
        return flash_attention(a, a, a, 0, 0.15, 0.0, True).sum()

    g_want = jax.grad(loss)(q)
    g_got = jax.jit(jax.grad(loss), in_shardings=sh, out_shardings=sh)(qs)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               atol=5e-4, rtol=1e-3)
