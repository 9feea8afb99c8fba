"""Pallas flash attention for the 6912-token CoAM / TransPose attention.

Reference semantics: softmax(q k^T * scale) (+ dropout on the probabilities at
train) @ v — lib/models/self_attention.py:10-88, transpose_h.py:168-243.  At the
BUCTD resolutions (stage-2/3 of 384x288: L = 96*72 = 6912, head dim 48-112,
heads = 1) attention is HBM-bound: the (L, L) probability matrix is 191 MB f32
per batch*head slice, and the round-2 mapped-2-D-GEMM formulation
(models/attention.py::_attend) still writes + re-reads it once per slice.  These
kernels stream q/k/v blocks through VMEM with an online softmax, so NO (L, L)
matrix ever touches HBM — forward or backward.

Structure follows the canonical TPU flash kernel (grid with the kv axis
innermost, VMEM scratch carrying the running max / sum / accumulator across kv
steps, row statistics kept lane-replicated as (block_q, 128) tiles).

Training: custom VJP with the standard flash backward — probabilities are
recomputed from the saved logsumexp; dq accumulates over kv blocks with the
q-block resident, dk/dv accumulate over q blocks with the kv-block resident.
Dropout uses the TPU PRNG with a seed derived from (seed, bh, q-block,
kv-block), so the forward and both backward kernels regenerate identical masks
without ever storing them.

All kernels also run under ``interpret=True`` for CPU parity tests (dropout=0
only — the TPU PRNG has no interpreter lowering).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _rep(col, width):
    """(block_q, 1) or (block_q, LANES) lane-replicated -> (block_q, width)."""
    if col.shape[1] == 1:
        col = jax.lax.broadcast_in_dim(col, (col.shape[0], LANES), (0, 1))
    if width == LANES:
        return col
    return jnp.tile(col, (1, width // LANES))


def _dropout_keep(shape, dropout: float):
    """(keep_mask * 1/keep) f32 for the current PRNG stream position."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = np.uint32(min(int(dropout * 2.0**32), 2**32 - 1))
    return jnp.where(bits >= threshold, 1.0 / (1.0 - dropout), 0.0)


def _tile_seed(seed, bh, qi, ki, n_q, n_k):
    # unique int32 stream per (slice, q-block, kv-block); identical in the
    # forward and both backward kernels so the masks regenerate exactly
    return seed + ((bh * n_q + qi) * n_k + ki)


def _mxu_precision(dtype):
    # f32 operands: multi-pass f32-accurate MXU matmuls (the 1-pass default
    # quantizes inputs to bf16 -> ~2e-3 rel error, enough to threaten the f32
    # AP-parity eval protocol); bf16 operands: the normal single pass
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _kv_mask(s, ki, block_k, l_k, n_k):
    """Mask logits of zero-padded keys (ki is a traced program id; the
    whether-any-padding-exists decision is static)."""
    if n_k * block_k <= l_k:
        return s
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    return jnp.where(col + ki * block_k < l_k, s, NEG_INF)


# ---------------------------------------------------------------- forward ----
def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, scale, l_k, block_k, n_k, n_q,
                dropout, prec, sm_dtype):
    bh, qi, ki = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # scale q once per grid step (block_q x d elements) instead of the
    # (block_q, block_k) logits — 8x fewer VPU multiplies at 1024/128 blocks
    q, kb, vb = q_ref[0] * jnp.asarray(scale, q_ref.dtype), k_ref[0], v_ref[0]
    dp = q.shape[1]
    # logits/max/stats stay f32 (Mosaic requires a 32-bit matmul acc; exact
    # row max); only the exp — the VPU-transcendental bottleneck of the whole
    # kernel — runs on sm_dtype tiles (bf16 for bf16 operands: 2x packing,
    # and the cast replaces the p-to-bf16 cast the p@v matmul needed anyway).
    s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
    s = _kv_mask(s, ki, block_k, l_k, n_k)

    m_prev, l_prev = m_scr[:], l_scr[:]
    m_curr = jnp.max(s, axis=1)[:, None]                 # (block_q, 1)
    m_next = jnp.maximum(m_prev, m_curr)                 # lane-replicated
    alpha = jnp.exp(m_prev - m_next)
    # bf16 rounding of the shifted logits costs <=0.4% per p, normalized away
    # by l below; parity vs dense stays ~3e-3 (tests + on-chip parity table)
    p = jnp.exp((s - _rep(m_next[:, :1], s.shape[1])).astype(sm_dtype))
    l_scr[:] = l_prev * alpha + jnp.sum(p, axis=1,
                                        dtype=jnp.float32)[:, None]
    m_scr[:] = m_next
    if dropout > 0.0:
        # dropout applies to the NORMALIZED probabilities (torch nn.Dropout
        # after softmax); the normalizer l is mask-independent, so masking the
        # un-normalized p here (but not the l update above) is equivalent
        pltpu.prng_seed(_tile_seed(seed_ref[0], bh, qi, ki, n_q, n_k))
        p = p * _dropout_keep(p.shape, dropout).astype(sm_dtype)
    acc_scr[:] = (acc_scr[:] * _rep(alpha[:, :1], dp)
                  + jax.lax.dot_general(p.astype(vb.dtype), vb,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32,
                                        precision=prec))

    @pl.when(ki == n_k - 1)
    def _():
        l = jnp.maximum(l_scr[:], 1e-30)
        o_ref[0] = acc_scr[:] / _rep(l[:, :1], dp)
        lse_ref[0] = m_scr[:] + jnp.log(l)


def _fwd_kernel_kvres(seed_ref, q_ref, k_hbm, v_hbm, o_ref, lse_ref,
                      k_scr, v_scr, k_sem, v_sem, *, scale, l_k, block_k,
                      n_k, n_q, dropout, prec, sm_dtype):
    """Forward with the kv axis INSIDE the kernel (grid = (bh, q-blocks)).

    The round-3 kernel put kv on the grid: 4608 Mosaic steps at b128/L=6912,
    each paying the fixed step cost plus a scratch rescale, and the VPU exp of
    step i could never overlap the MXU matmul of step i+1 (separate grid
    steps).  Here the online-softmax loop over kv sub-tiles is a STATIC python
    loop in one kernel body: 6-9x fewer grid steps, no cross-step scratch
    semantics, and the sub-steps' s-matmuls are independent of the previous
    sub-step's exp/rescale chain, so Mosaic can software-pipeline MXU against
    VPU.  k/v stream from HBM through a hand double-buffered DMA pair (the
    pipeline pattern from the pallas guide) — 2 sub-tile slots instead of
    full-kv residency, so VMEM stays ~14 MB at 1152^2 tiles and the path works
    for any L.
    """
    b, qi = pl.program_id(0), pl.program_id(1)

    def kv_dma(ki, slot):
        return (pltpu.make_async_copy(
                    k_hbm.at[b, pl.ds(ki * block_k, block_k), :],
                    k_scr.at[slot], k_sem.at[slot]),
                pltpu.make_async_copy(
                    v_hbm.at[b, pl.ds(ki * block_k, block_k), :],
                    v_scr.at[slot], v_sem.at[slot]))

    for dma in kv_dma(0, 0):
        dma.start()

    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)
    bq, dp = q.shape
    m = jnp.full((bq, LANES), NEG_INF, jnp.float32)
    l = jnp.zeros((bq, LANES), jnp.float32)
    acc = jnp.zeros((bq, dp), jnp.float32)

    for ki in range(n_k):                      # static unroll (n_k is 6-9)
        slot = ki % 2
        if ki + 1 < n_k:
            for dma in kv_dma(ki + 1, 1 - slot):
                dma.start()
        for dma in kv_dma(ki, slot):
            dma.wait()
        kb, vb = k_scr[slot], v_scr[slot]
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec)
        if (ki + 1) * block_k > l_k:           # static: only padded sub-tiles
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col + ki * block_k < l_k, s, NEG_INF)
        m_curr = jnp.max(s, axis=1)[:, None]
        m_next = jnp.maximum(m, _rep(m_curr, LANES))
        alpha = jnp.exp(m - m_next)
        p = jnp.exp((s - _rep(m_next[:, :1], s.shape[1])).astype(sm_dtype))
        l = l * alpha + jnp.sum(p, axis=1, dtype=jnp.float32)[:, None]
        m = m_next
        if dropout > 0.0:
            # same (seed, bh, qi, ki) stream as the grid kernels — the
            # backward regenerates identical masks (see _tile_seed)
            pltpu.prng_seed(_tile_seed(seed_ref[0], b, qi, ki, n_q, n_k))
            p = p * _dropout_keep(p.shape, dropout).astype(sm_dtype)
        acc = (acc * _rep(alpha[:, :1], dp)
               + jax.lax.dot_general(p.astype(vb.dtype), vb,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=prec))

    l = jnp.maximum(l, 1e-30)
    o_ref[0] = acc / _rep(l[:, :1], dp)
    lse_ref[0] = m + jnp.log(l)


# --------------------------------------------------------------- backward ----
def _dq_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
               dq_ref, dq_scr, *, scale, l_k, block_k, n_k, n_q, dropout,
               prec):
    bh, qi, ki = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q, kb, vb, do = q_ref[0] * jnp.asarray(scale, q_ref.dtype), k_ref[0], v_ref[0], do_ref[0]
    dp = q.shape[1]
    s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
    s = _kv_mask(s, ki, block_k, l_k, n_k)
    p = jnp.exp(s - _rep(lse_ref[0][:, :1], s.shape[1]))  # normalized probs
    g = jax.lax.dot_general(do, vb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
    if dropout > 0.0:
        pltpu.prng_seed(_tile_seed(seed_ref[0], bh, qi, ki, n_q, n_k))
        g = g * _dropout_keep(g.shape, dropout)
    ds = p * (g - _rep(delta_ref[0][:, :1], g.shape[1]))
    dq_scr[:] += jax.lax.dot_general(ds.astype(kb.dtype), kb,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=prec)

    @pl.when(ki == n_k - 1)
    def _():
        dq_ref[0] = dq_scr[:] * scale


def _dq_kernel_kvres(seed_ref, q_ref, do_ref, lse_ref, delta_ref, k_hbm, v_hbm,
                     dq_ref, k_scr, v_scr, k_sem, v_sem, *, scale, l_k,
                     block_k, n_k, n_q, dropout, prec):
    """dq with the kv axis inside the kernel (see _fwd_kernel_kvres): grid =
    (bh, q-blocks), kv sub-tiles stream through a double-buffered DMA pair."""
    b, qi = pl.program_id(0), pl.program_id(1)

    def kv_dma(ki, slot):
        return (pltpu.make_async_copy(
                    k_hbm.at[b, pl.ds(ki * block_k, block_k), :],
                    k_scr.at[slot], k_sem.at[slot]),
                pltpu.make_async_copy(
                    v_hbm.at[b, pl.ds(ki * block_k, block_k), :],
                    v_scr.at[slot], v_sem.at[slot]))

    for dma in kv_dma(0, 0):
        dma.start()

    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)
    do, lse, delta = do_ref[0], lse_ref[0], delta_ref[0]
    dq = jnp.zeros((q.shape[0], q.shape[1]), jnp.float32)
    for ki in range(n_k):
        slot = ki % 2
        if ki + 1 < n_k:
            for dma in kv_dma(ki + 1, 1 - slot):
                dma.start()
        for dma in kv_dma(ki, slot):
            dma.wait()
        kb, vb = k_scr[slot], v_scr[slot]
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec)
        if (ki + 1) * block_k > l_k:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col + ki * block_k < l_k, s, NEG_INF)
        p = jnp.exp(s - _rep(lse[:, :1], s.shape[1]))
        g = jax.lax.dot_general(do, vb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec)
        if dropout > 0.0:
            pltpu.prng_seed(_tile_seed(seed_ref[0], b, qi, ki, n_q, n_k))
            g = g * _dropout_keep(g.shape, dropout)
        ds = p * (g - _rep(delta[:, :1], g.shape[1]))
        dq += jax.lax.dot_general(ds.astype(kb.dtype), kb,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=prec)
    dq_ref[0] = dq * scale


def _dkv_kernel_kvres(seed_ref, k_ref, v_ref, q_hbm, do_hbm, lse_hbm,
                      delta_hbm, dk_ref, dv_ref, q_scr, do_scr, lse_scr,
                      delta_scr, q_sem, do_sem, lse_sem, delta_sem, *, scale,
                      l_k, block_q, block_k, n_k, n_q, dropout, prec):
    """dk/dv with the q axis inside the kernel: grid = (bh, kv-blocks); the
    q-side operands (q, do, lse, delta) stream through four double-buffered
    DMA channels while k/v stay resident for the whole grid step."""
    b, ki = pl.program_id(0), pl.program_id(1)

    def q_dma(qi, slot):
        return (pltpu.make_async_copy(
                    q_hbm.at[b, pl.ds(qi * block_q, block_q), :],
                    q_scr.at[slot], q_sem.at[slot]),
                pltpu.make_async_copy(
                    do_hbm.at[b, pl.ds(qi * block_q, block_q), :],
                    do_scr.at[slot], do_sem.at[slot]),
                pltpu.make_async_copy(
                    lse_hbm.at[b, pl.ds(qi * block_q, block_q), :],
                    lse_scr.at[slot], lse_sem.at[slot]),
                pltpu.make_async_copy(
                    delta_hbm.at[b, pl.ds(qi * block_q, block_q), :],
                    delta_scr.at[slot], delta_sem.at[slot]))

    for dma in q_dma(0, 0):
        dma.start()

    kb, vb = k_ref[0], v_ref[0]
    dk = jnp.zeros((kb.shape[0], kb.shape[1]), jnp.float32)
    dv = jnp.zeros_like(dk)
    for qi in range(n_q):
        slot = qi % 2
        if qi + 1 < n_q:
            for dma in q_dma(qi + 1, 1 - slot):
                dma.start()
        for dma in q_dma(qi, slot):
            dma.wait()
        # q pre-scaled: dk = ds^T q' absorbs the chain-rule scale (see
        # _dkv_kernel)
        q = q_scr[slot] * jnp.asarray(scale, q_scr.dtype)
        do, lse, delta = do_scr[slot], lse_scr[slot], delta_scr[slot]
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec)
        s = _kv_mask(s, ki, block_k, l_k, n_k)   # ki is a traced program id
        p = jnp.exp(s - _rep(lse[:, :1], s.shape[1]))
        keep = None
        if dropout > 0.0:
            pltpu.prng_seed(_tile_seed(seed_ref[0], b, qi, ki, n_q, n_k))
            keep = _dropout_keep(p.shape, dropout)
        pd = p * keep if keep is not None else p
        dv += jax.lax.dot_general(pd.astype(do.dtype), do,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=prec)
        g = jax.lax.dot_general(do, vb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec)
        if keep is not None:
            g = g * keep
        ds = p * (g - _rep(delta[:, :1], g.shape[1]))
        dk += jax.lax.dot_general(ds.astype(q.dtype), q,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=prec)
    dk_ref[0] = dk
    dv_ref[0] = dv


def _dkv_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_scr, dv_scr, *, scale, l_k, block_k, n_k,
                n_q, dropout, prec):
    bh, ki, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(qi == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    # q pre-scaled: s = q'k^T directly, and dk = ds^T q' absorbs the chain-rule
    # scale (the final dk_ref write drops its * scale)
    q, kb, vb, do = q_ref[0] * jnp.asarray(scale, q_ref.dtype), k_ref[0], v_ref[0], do_ref[0]
    s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
    s = _kv_mask(s, ki, block_k, l_k, n_k)
    p = jnp.exp(s - _rep(lse_ref[0][:, :1], s.shape[1]))
    keep = None
    if dropout > 0.0:
        pltpu.prng_seed(_tile_seed(seed_ref[0], bh, qi, ki, n_q, n_k))
        keep = _dropout_keep(p.shape, dropout)
    pd = p * keep if keep is not None else p
    dv_scr[:] += jax.lax.dot_general(pd.astype(do.dtype), do,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=prec)
    g = jax.lax.dot_general(do, vb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
    if keep is not None:
        g = g * keep
    ds = p * (g - _rep(delta_ref[0][:, :1], g.shape[1]))
    dk_scr[:] += jax.lax.dot_general(ds.astype(q.dtype), q,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=prec)

    @pl.when(qi == n_q - 1)
    def _():
        dk_ref[0] = dk_scr[:]
        dv_ref[0] = dv_scr[:]


# ---------------------------------------------------------------- wrapper ----
def _pick_blocks(l_q: int, l_k: int, bwd: bool = False):
    # forward: large tiles — the BUCTD shapes (d <= 128) are not VMEM-limited,
    # and the grid-step count dominates wall clock at 512-tiles (measured 78 ms
    # for b128 L=6912 at 512^2 tiles = 25k steps); 1024^2 quarters the step
    # count.  backward: the dq/dkv kernels keep FOUR live f32 (block_q,
    # block_k) intermediates (s, p, g, ds) vs the forward's two — 1024^2 tiles
    # put 16 MB on the scoped-vmem stack and the compile fails at its 16 MB
    # limit ("allocating on stack for ... pallas_call", 17.8M > 16M).  768^2
    # tiles cut that to 9 MB and tile L=6912 exactly (9x9 grid, no padding).
    # NOTE on dropout: the masks regenerate from (seed, bh, qi, ki) + the tile
    # SHAPE, so the forward and backward must tile identically for the VJP to
    # see the same realization — dropout>0 forces the backward's 768 blocks in
    # the forward too (callers pass bwd=True; test_dropout_blocks_match).
    # 1152^2 tiles (6912 = 6*1152, zero padded rows, 27% fewer grid steps)
    # were tried and measured SLOWER than padded 1024^2 on chip (59.4 vs
    # 55.0 ms CoAM-stage2 b128, 29.5 vs 27.1 ms TransPose — bench_flash
    # --levers, perf_logs/r4_queue2.log): the op is VPU-transcendental-bound,
    # so the step count doesn't matter and the bigger tile only adds live-
    # intermediate pressure.  1024 stays the cap.
    cap = 768 if bwd else 1024
    if not bwd and os.environ.get("BUCTD_FLASH_TILE"):   # bench A/B only
        cap = int(os.environ["BUCTD_FLASH_TILE"])
    return (min(cap, _ceil_to(l_q, LANES)), min(cap, _ceil_to(l_k, LANES)))


def _pad(x, l_pad, d_pad):
    bh, l, d = x.shape
    if l == l_pad and d == d_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, l_pad - l), (0, d_pad - d)))


def _dims(q, k, bwd: bool = False):
    bh, l_q, d = q.shape
    l_k = k.shape[1]
    block_q, block_k = _pick_blocks(l_q, l_k, bwd)
    lqp, lkp, dp = (_ceil_to(l_q, block_q), _ceil_to(l_k, block_k),
                    _ceil_to(d, LANES))
    return bh, l_q, l_k, d, block_q, block_k, lqp, lkp, dp


def _unify(q, k, v):
    # Mosaic rejects mixed-dtype matmul operands ("Bad rhs type"); promote all
    # three to their common dtype before padding
    dt = jnp.result_type(q.dtype, k.dtype, v.dtype)
    return q.astype(dt), k.astype(dt), v.astype(dt)


def _flash_fwd_impl(q, k, v, seed, scale, dropout, interpret):
    q, k, v = _unify(q, k, v)
    # dropout masks regenerate per-tile in the backward: tile like the
    # backward (768^2) whenever dropout is live, so fwd and VJP draw the SAME
    # masks; the big-tile fast path stays for the dropout-free eval/serving
    # f32 softmax tiles by default: bf16 exp tiles measured SLOWER on chip
    # (55.7 vs 55.0 ms CoAM, 28.7 vs 27.1 ms TransPose — the v5e VPU has no
    # 2x bf16 packing for transcendentals, so the casts are pure overhead)
    # AND less accurate (2.6e-3 rel err).  BUCTD_FLASH_BF16_SOFTMAX=1 keeps
    # the bf16 tiles reachable for A/B.
    sm_dtype = (jnp.bfloat16
                if q.dtype == jnp.bfloat16
                and os.environ.get("BUCTD_FLASH_BF16_SOFTMAX") == "1"
                else jnp.float32)
    # kv-resident kernels: measured a wash vs the grid kernels (56.0 vs
    # 55.0 ms CoAM, 32.5 vs 27.1 ms TransPose) — the bottleneck is the
    # in-step serial MXU->VPU-exp->MXU chain, not the grid-step count, so
    # fewer steps buy nothing.  Kept env-gated for A/B; default off.
    if os.environ.get("BUCTD_FLASH_KVRES", "0") != "0":
        return _flash_fwd_kvres(q, k, v, seed, scale, dropout, interpret,
                                sm_dtype)
    bh, l_q, l_k, d, block_q, block_k, lqp, lkp, dp = _dims(
        q, k, bwd=dropout > 0.0)
    n_q, n_k = lqp // block_q, lkp // block_k
    qp, kp, vp = _pad(q, lqp, dp), _pad(k, lkp, dp), _pad(v, lkp, dp)

    kernel = functools.partial(_fwd_kernel, scale=scale, l_k=l_k,
                               block_k=block_k, n_k=n_k, n_q=n_q,
                               dropout=dropout, prec=_mxu_precision(q.dtype),
                               sm_dtype=sm_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i, j, *_: (b, i, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, i, j, *_: (b, j, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, i, j, *_: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i, j, *_: (b, i, 0)),
            pl.BlockSpec((1, block_q, LANES), lambda b, i, j, *_: (b, i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, dp), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((bh, lqp, dp), jnp.float32),
                   jax.ShapeDtypeStruct((bh, lqp, LANES), jnp.float32)],
        interpret=interpret,
        # bh and the q axis are independent programs (scratch resets at ki==0);
        # only the kv axis carries state — lets Mosaic overlap across (bh, qi)
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * l_q * l_k * d, transcendentals=bh * l_q * l_k,
            bytes_accessed=4 * bh * (2 * l_q + 2 * l_k) * d),
    )(jnp.asarray(seed, jnp.int32).reshape(1), qp, kp, vp)
    return out[:, :l_q, :d], lse


def _flash_fwd_kvres(q, k, v, seed, scale, dropout, interpret, sm_dtype):
    """pallas_call plumbing for _fwd_kernel_kvres (see its docstring).

    Block choice: dropout>0 pins 768^2 (the backward's tiling — the PRNG
    masks regenerate per logical tile, so forward and VJP must tile alike);
    f32 operands cap at 768 (s AND p tiles are f32: 1152^2 would put ~17 MB
    of intermediates + dma scratch on the 16 MB scoped-vmem stack); bf16
    serving follows _pick_blocks (1024^2; BUCTD_FLASH_TILE overrides).
    """
    bh, l_q, d = q.shape
    l_k = k.shape[1]
    if dropout > 0.0 or q.dtype == jnp.float32:
        block_q = block_k = 768
    else:
        block_q, block_k = _pick_blocks(l_q, l_k)
    block_q = min(block_q, _ceil_to(l_q, LANES))
    block_k = min(block_k, _ceil_to(l_k, LANES))
    lqp, lkp, dp = (_ceil_to(l_q, block_q), _ceil_to(l_k, block_k),
                    _ceil_to(d, LANES))
    n_q, n_k = lqp // block_q, lkp // block_k
    qp, kp, vp = _pad(q, lqp, dp), _pad(k, lkp, dp), _pad(v, lkp, dp)

    kernel = functools.partial(_fwd_kernel_kvres, scale=scale, l_k=l_k,
                               block_k=block_k, n_k=n_k, n_q=n_q,
                               dropout=dropout, prec=_mxu_precision(q.dtype),
                               sm_dtype=sm_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),    # k stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),    # v stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, block_q, LANES), lambda b, i, *_: (b, i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block_k, dp), q.dtype),   # kv double buffers
            pltpu.VMEM((2, block_k, dp), q.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((bh, lqp, dp), jnp.float32),
                   jax.ShapeDtypeStruct((bh, lqp, LANES), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * l_q * l_k * d, transcendentals=bh * l_q * l_k,
            bytes_accessed=4 * bh * (2 * l_q + 2 * l_k) * d),
    )(jnp.asarray(seed, jnp.int32).reshape(1), qp, kp, vp)
    return out[:, :l_q, :d], lse


def _flash_bwd_kvres(q, k, v, seed, scale, dropout, interpret, lse, out, dout,
                     qd, kd, vd):
    """pallas_call plumbing for the kv/q-resident backward kernels: dq runs a
    (bh, n_q) grid streaming kv sub-tiles by DMA, dk/dv a (bh, n_k) grid
    streaming the q-side operands.  Same 768^2 logical tiling (and therefore
    the same dropout PRNG streams) as the grid backward."""
    bh, l_q, d = q.shape
    l_k = k.shape[1]
    block_q, block_k = _pick_blocks(l_q, l_k, bwd=True)
    lqp, lkp, dp = (_ceil_to(l_q, block_q), _ceil_to(l_k, block_k),
                    _ceil_to(d, LANES))
    n_q, n_k = lqp // block_q, lkp // block_k
    qp, kp, vp = _pad(q, lqp, dp), _pad(k, lkp, dp), _pad(v, lkp, dp)
    dop = _pad(dout.astype(jnp.float32), lqp, dp)
    lse = _pad(lse[:, :l_q], lqp, LANES)
    delta = jnp.sum(dout.astype(jnp.float32) * out, axis=-1)
    delta = jnp.broadcast_to(
        jnp.pad(delta, ((0, 0), (0, lqp - l_q)))[:, :, None], (bh, lqp, LANES))
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    prec = _mxu_precision(q.dtype)

    dq_kernel = functools.partial(_dq_kernel_kvres, scale=scale, l_k=l_k,
                                  block_k=block_k, n_k=n_k, n_q=n_q,
                                  dropout=dropout, prec=prec)
    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, block_q, dp), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, block_q, LANES), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, block_q, LANES), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),    # k stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),    # v stays in HBM
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda b, i, *_: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, block_k, dp), q.dtype),
            pltpu.VMEM((2, block_k, dp), q.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dq = pl.pallas_call(
        dq_kernel, grid_spec=dq_spec,
        out_shape=jax.ShapeDtypeStruct((bh, lqp, dp), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * l_q * l_k * d, transcendentals=bh * l_q * l_k,
            bytes_accessed=4 * bh * (3 * l_q + 2 * l_k) * d),
    )(seed_arr, qp, dop, lse, delta, kp, vp)

    dkv_kernel = functools.partial(_dkv_kernel_kvres, scale=scale, l_k=l_k,
                                   block_q=block_q, block_k=block_k, n_k=n_k,
                                   n_q=n_q, dropout=dropout, prec=prec)
    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, n_k),
        in_specs=[
            pl.BlockSpec((1, block_k, dp), lambda b, j, *_: (b, j, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, j, *_: (b, j, 0)),
            pl.BlockSpec(memory_space=pl.ANY),    # q
            pl.BlockSpec(memory_space=pl.ANY),    # do
            pl.BlockSpec(memory_space=pl.ANY),    # lse
            pl.BlockSpec(memory_space=pl.ANY),    # delta
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, dp), lambda b, j, *_: (b, j, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, j, *_: (b, j, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block_q, dp), q.dtype),
            pltpu.VMEM((2, block_q, dp), jnp.float32),   # do is f32
            pltpu.VMEM((2, block_q, LANES), jnp.float32),
            pltpu.VMEM((2, block_q, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dk, dv = pl.pallas_call(
        dkv_kernel, grid_spec=dkv_spec,
        out_shape=[jax.ShapeDtypeStruct((bh, lkp, dp), jnp.float32),
                   jax.ShapeDtypeStruct((bh, lkp, dp), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * l_q * l_k * d, transcendentals=bh * l_q * l_k,
            bytes_accessed=4 * bh * (3 * l_q + 3 * l_k) * d),
    )(seed_arr, kp, vp, qp, dop, lse, delta)

    return (dq[:, :l_q, :d].astype(qd),
            dk[:, :l_k, :d].astype(kd),
            dv[:, :l_k, :d].astype(vd))


def _flash_bwd_impl(q, k, v, seed, scale, dropout, interpret, lse, out, dout):
    qd, kd, vd = q.dtype, k.dtype, v.dtype
    q, k, v = _unify(q, k, v)
    if os.environ.get("BUCTD_FLASH_KVRES", "0") != "0":
        return _flash_bwd_kvres(q, k, v, seed, scale, dropout, interpret,
                                lse, out, dout, qd, kd, vd)
    bh, l_q, l_k, d, block_q, block_k, lqp, lkp, dp = _dims(q, k, bwd=True)
    n_q, n_k = lqp // block_q, lkp // block_k
    qp, kp, vp = _pad(q, lqp, dp), _pad(k, lkp, dp), _pad(v, lkp, dp)
    dop = _pad(dout.astype(jnp.float32), lqp, dp)
    # lse is padded to the FORWARD q-block multiple; re-pad for the (smaller)
    # backward blocks.  Zero-lse padding rows are harmless: their do rows are
    # zero, which annihilates the dk/dv contributions, and their dq rows are
    # sliced off below.
    lse = _pad(lse[:, :l_q], lqp, LANES)
    # delta_i = sum_d do_id * o_id (the dropout-aware softmax-backward rowsum
    # collapses to this — see module docstring); lane-replicated like lse
    delta = jnp.sum(dout.astype(jnp.float32) * out, axis=-1)      # (bh, l_q)
    delta = jnp.broadcast_to(
        jnp.pad(delta, ((0, 0), (0, lqp - l_q)))[:, :, None], (bh, lqp, LANES))
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    dq_kernel = functools.partial(_dq_kernel, scale=scale, l_k=l_k,
                                  block_k=block_k, n_k=n_k, n_q=n_q,
                                  dropout=dropout,
                                  prec=_mxu_precision(q.dtype))
    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i, j, *_: (b, i, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, i, j, *_: (b, j, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, i, j, *_: (b, j, 0)),
            pl.BlockSpec((1, block_q, dp), lambda b, i, j, *_: (b, i, 0)),
            pl.BlockSpec((1, block_q, LANES), lambda b, i, j, *_: (b, i, 0)),
            pl.BlockSpec((1, block_q, LANES), lambda b, i, j, *_: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda b, i, j, *_: (b, i, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, dp), jnp.float32)],
    )
    dq = pl.pallas_call(
        dq_kernel, grid_spec=dq_spec,
        out_shape=jax.ShapeDtypeStruct((bh, lqp, dp), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * l_q * l_k * d, transcendentals=bh * l_q * l_k,
            bytes_accessed=4 * bh * (3 * l_q + 2 * l_k) * d),
    )(seed_arr, qp, kp, vp, dop, lse, delta)

    dkv_kernel = functools.partial(_dkv_kernel, scale=scale, l_k=l_k,
                                   block_k=block_k, n_k=n_k, n_q=n_q,
                                   dropout=dropout,
                                   prec=_mxu_precision(q.dtype))
    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, n_k, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, j, i, *_: (b, i, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, j, i, *_: (b, j, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, j, i, *_: (b, j, 0)),
            pl.BlockSpec((1, block_q, dp), lambda b, j, i, *_: (b, i, 0)),
            pl.BlockSpec((1, block_q, LANES), lambda b, j, i, *_: (b, i, 0)),
            pl.BlockSpec((1, block_q, LANES), lambda b, j, i, *_: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, dp), lambda b, j, i, *_: (b, j, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, j, i, *_: (b, j, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((block_k, dp), jnp.float32),
                        pltpu.VMEM((block_k, dp), jnp.float32)],
    )
    dk, dv = pl.pallas_call(
        dkv_kernel, grid_spec=dkv_spec,
        out_shape=[jax.ShapeDtypeStruct((bh, lkp, dp), jnp.float32),
                   jax.ShapeDtypeStruct((bh, lkp, dp), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * l_q * l_k * d, transcendentals=bh * l_q * l_k,
            bytes_accessed=4 * bh * (3 * l_q + 3 * l_k) * d),
    )(seed_arr, qp, kp, vp, dop, lse, delta)

    return (dq[:, :l_q, :d].astype(qd),
            dk[:, :l_k, :d].astype(kd),
            dv[:, :l_k, :d].astype(vd))


# Trace-time shape log: XLA cost_analysis reports ~0 FLOPs for pallas custom
# calls, so MFU benches enable this, lower() the program, and add the analytic
# matmul FLOPs (2*Lq*Lk*d qk + 2*Lq*Lk*d av, per bh slice) for each logged call.
TRACE_SHAPES: list = []
_TRACE = False


def trace_shapes(on: bool = True):
    """Enable/clear the call-shape log (benches only; not thread-safe)."""
    global _TRACE
    _TRACE = on
    TRACE_SHAPES.clear()


def logged_flops() -> float:
    """Analytic MXU FLOPs of all flash calls traced since trace_shapes(True)."""
    return float(sum(4.0 * bh * lq * lk * d for bh, lq, lk, d in TRACE_SHAPES))


# ------------------------------------------------- SPMD batch partitioning ----
# Attention is embarrassingly parallel over the folded batch*heads axis, but a
# Mosaic custom call inside a sharded jit has no partitioning rule of its own —
# GSPMD would replicate the operands (a full-batch all-gather per device).
# custom_partitioning declares: dim 0 may shard, everything else replicates,
# and each device runs the kernel on its own BH rows.  (The production layout
# is data-parallel batch sharding — SURVEY.md §2.8 — so this is exact.)

def _dim0_axis(arg_shapes, result_shape):
    """The mesh axis (if any) the batch dim is sharded over, from the SPMD
    suggestion for q (first operand) or the first result."""
    for s in (arg_shapes[0], jax.tree.leaves(result_shape)[0]):
        sh = getattr(s, "sharding", None)
        spec = tuple(getattr(sh, "spec", ()) or ())
        if spec and spec[0] is not None:
            return spec[0]
    return None


def _batch_shardings(mesh, b_axis, shapes):
    from jax.sharding import NamedSharding, PartitionSpec

    def one(s):
        rank = len(s.shape)
        if rank <= 1:       # the (1,) seed: replicated
            return NamedSharding(mesh, PartitionSpec(*([None] * rank)))
        return NamedSharding(mesh,
                             PartitionSpec(b_axis, *([None] * (rank - 1))))

    return jax.tree.map(one, shapes)


def _make_spmd(inner, rule, need_replication, static_argnums=(4, 5, 6)):
    from jax.experimental.custom_partitioning import custom_partitioning

    wrapped = custom_partitioning(inner, static_argnums=static_argnums)

    def partition(*cb_args):
        scale, dropout, interpret, mesh, arg_shapes, result_shape = cb_args

        def lower_fn(*args):
            return inner(*args[:4], scale, dropout, interpret, *args[4:])

        b = _dim0_axis(arg_shapes, result_shape)
        return (mesh, lower_fn,
                _batch_shardings(mesh, b, result_shape),
                _batch_shardings(mesh, b, tuple(arg_shapes)))

    def infer(*cb_args):
        _, _, _, mesh, arg_shapes, result_shape = cb_args
        b = _dim0_axis(arg_shapes, result_shape)
        return _batch_shardings(mesh, b, result_shape)

    wrapped.def_partition(partition=partition,
                          infer_sharding_from_operands=infer,
                          sharding_rule=rule,
                          need_replication_factors=need_replication)
    return wrapped


def _fwd_spmd_inner(q, k, v, seed, scale, dropout, interpret):
    return _flash_fwd_impl(q, k, v, seed, scale, dropout, interpret)


def _bwd_spmd_inner(q, k, v, seed, scale, dropout, interpret, lse, out, dout):
    return _flash_bwd_impl(q, k, v, seed, scale, dropout, interpret,
                           lse, out, dout)


# factors: b = batch*heads (shardable); i/j = q/kv token lengths; p = the
# forward-padded lse length; d = head dim; m = lanes; s = the (1,) seed
_FWD_SPMD = _make_spmd(           # need_replication in rule-appearance order
    _fwd_spmd_inner,              # (the Shardy verifier requires sorted
    "b i d, b j d, b j d, s -> b i d, b p m",   # special-factor indices)
    ("i", "d", "j", "s", "p", "m"))
_BWD_SPMD = _make_spmd(
    _bwd_spmd_inner,
    "b i d, b j d, b j d, s, b p m, b i d, b i d -> b i d, b j d, b j d",
    ("i", "d", "j", "s", "p", "m"))


def _seed1(seed):
    return jnp.asarray(seed, jnp.int32).reshape(1)


# --------------------------------------------------------------- vmap rule ----
# custom_partitioning has no batching rule in JAX, but attention over the
# folded batch*heads axis vmaps trivially: fold the vmapped dim INTO dim 0 and
# unfold the results.  Without this, jax.vmap over anything containing a
# flash call (e.g. serving's batched multi-image predict_batch vmapping the
# whole refine loop) dies with "Batching rule for 'custom_partitioning' not
# implemented".

def _fold(x, batched, axis_size):
    if batched:
        return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])
    return jnp.broadcast_to(x[None], (axis_size,) + x.shape).reshape(
        (axis_size * x.shape[0],) + x.shape[1:])


def _unfold(x, axis_size):
    return x.reshape((axis_size, x.shape[0] // axis_size) + x.shape[1:])


def _fwd_call(scale, dropout, interpret):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def call(q, k, v, seed1):
        return _FWD_SPMD(q, k, v, seed1, scale, dropout, interpret)

    @call.def_vmap
    def _rule(axis_size, in_batched, q, k, v, seed1):
        if in_batched[3] and dropout > 0.0:
            # one kernel call draws one seed stream; per-element seeds would
            # silently correlate.  No caller vmaps a live-dropout flash today.
            raise NotImplementedError(
                "vmap over flash_attention with per-element dropout seeds")
        seed = seed1[0] if in_batched[3] else seed1
        out, lse = call(_fold(q, in_batched[0], axis_size),
                        _fold(k, in_batched[1], axis_size),
                        _fold(v, in_batched[2], axis_size), seed)
        return (_unfold(out, axis_size), _unfold(lse, axis_size)), (True, True)

    return call


def _bwd_call(scale, dropout, interpret):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def call(q, k, v, seed1, lse, out, dout):
        return _BWD_SPMD(q, k, v, seed1, scale, dropout, interpret,
                         lse, out, dout)

    @call.def_vmap
    def _rule(axis_size, in_batched, q, k, v, seed1, lse, out, dout):
        if in_batched[3] and dropout > 0.0:
            raise NotImplementedError(
                "vmap over flash_attention VJP with per-element dropout seeds")
        seed = seed1[0] if in_batched[3] else seed1
        args = [_fold(a, b, axis_size)
                for a, b in zip((q, k, v), in_batched[:3])]
        args += [seed] + [_fold(a, b, axis_size)
                          for a, b in zip((lse, out, dout), in_batched[4:])]
        dq, dk, dv = call(*args)
        return tuple(_unfold(g, axis_size) for g in (dq, dk, dv)), (True,) * 3

    return call


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention(q, k, v, seed=0, scale=1.0, dropout=0.0, interpret=False):
    """out = dropout(softmax(q k^T * scale)) @ v without materializing (L, L).

    q: (BH, Lq, d); k, v: (BH, Lk, d); seed: int32 (dropout stream, ignored when
    dropout == 0).  Returns f32 (BH, Lq, d).  Differentiable; the backward
    regenerates dropout masks from the same seed.  Under a sharded jit the BH
    axis partitions across the mesh (custom_partitioning above).
    """
    assert v.shape[2] == q.shape[2], (
        "flash_attention assumes one head dim (d_v == d_k); got "
        f"{v.shape[2]} != {q.shape[2]} — use the mapped-GEMM path instead")
    if _TRACE:
        TRACE_SHAPES.append((q.shape[0], q.shape[1], k.shape[1], q.shape[2]))
    out, _ = _fwd_call(scale, dropout, interpret)(q, k, v, _seed1(seed))
    return out


def _flash_fwd_rule(q, k, v, seed, scale, dropout, interpret):
    out, lse = _fwd_call(scale, dropout, interpret)(q, k, v, _seed1(seed))
    return out, (q, k, v, seed, lse, out)


def _flash_bwd_rule(scale, dropout, interpret, res, dout):
    q, k, v, seed, lse, out = res
    dq, dk, dv = _bwd_call(scale, dropout, interpret)(
        q, k, v, _seed1(seed), lse, out, dout)
    return dq, dk, dv, jnp.zeros_like(jnp.asarray(seed))


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)
