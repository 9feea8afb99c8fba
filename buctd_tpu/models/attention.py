"""Attention primitives (flax) matching lib/models/self_attention.py.

Written as einsum-on-MXU token attention; param names mirror the torch modules
(fc_q/fc_k/fc_v/fc_o) for the generic converter.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

LINEAR_INIT = nn.initializers.normal(stddev=0.001)

# engine for the long-sequence token attention (CoAM position attention,
# TransPose encoder): 'auto' = pallas flash kernel on TPU backends for
# L_q*L_k >= 512*512, mapped 2-D GEMMs elsewhere; 'flash'/'mapped' force.
# cfg.TPU.ATTENTION_ENGINE is exported here by models.get_model.  Known
# limitation (accepted): the knob is process-global, read at TRACE time — two
# live models wanting different engines must set the env var around each
# build/trace themselves (get_model only overwrites its own previous export,
# never a user-set value; threading a field through six module dataclasses
# was judged worse than this note).
_ENGINE_ENV = "BUCTD_ATTENTION_ENGINE"
_FLASH_MIN_TOKENS = 512 * 512


def _use_flash(nq: int, nk: int, dq: int = 0, dv: int = 0) -> bool:
    if dq != dv:
        # the flash kernel assumes one head dim (d_v == d_k); mixed dims take
        # the mapped-GEMM path (no in-repo module hits this — guard only)
        return False
    eng = os.environ.get(_ENGINE_ENV, "auto")
    if eng == "flash":
        return True
    if eng != "auto":
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    return platform in ("tpu", "axon") and nq * nk >= _FLASH_MIN_TOKENS


def _flash(q, k, v, scale, dropout=0.0, rng=None):
    """(B, h, n, d) operands -> flash kernel on the folded batch*heads axis."""
    from ..ops.flash_attention import flash_attention

    B, h, nq, _ = q.shape
    q3, k3, v3 = (x.reshape(B * h, x.shape[2], x.shape[3]) for x in (q, k, v))
    seed = (jax.random.randint(rng, (), 0, np.iinfo(np.int32).max, jnp.int32)
            if rng is not None else jnp.zeros((), jnp.int32))
    try:
        # forced 'flash' off-TPU (CPU tests) runs the interpreter — Mosaic
        # only lowers for real TPU backends
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:
        interpret = True
    out = flash_attention(q3, k3, v3, seed, float(scale), float(dropout),
                          interpret)
    return out.reshape(B, h, nq, v.shape[3])


def _attend(q, k, v, scale):
    """Attention on (B, h, n, d) operands.  On TPU at the BUCTD sequence
    lengths this is the pallas flash kernel (ops/flash_attention.py — no (L, L)
    matrix in HBM at all); elsewhere a lax.map of PLAIN 2-D GEMMs over the
    folded batch x heads axis.  XLA's 3-D batched dot is pathological for
    long-sequence attention shapes on v5e — the (16, 6912, 6912) qk/softmax/av
    chain costs 265 ms batched vs 39.5 ms as mapped 2-D dots (6.7x); the same
    holds with a singleton head axis or an optimization barrier, so the fix is
    the formulation, not tuning."""
    B, h, nq, _ = q.shape
    if _use_flash(nq, k.shape[2], q.shape[3], v.shape[3]):
        return _flash(q, k, v, scale)
    q3, k3, v3 = (x.reshape(B * h, x.shape[2], x.shape[3]) for x in (q, k, v))

    def one(args):
        qi, ki, vi = args
        att = nn.softmax(
            jnp.dot(qi, ki.T, preferred_element_type=jnp.float32) * scale,
            axis=-1)
        return jnp.dot(att, vi.astype(jnp.float32))

    out = jax.lax.map(one, (q3, k3, v3))
    return out.reshape(B, h, nq, v.shape[3])


def _attend_train(q, k, v, scale, dropout, rng):
    """Training-path attention.  On TPU at the BUCTD lengths: the pallas flash
    kernel with in-kernel PRNG dropout and a flash backward (custom VJP — the
    masks regenerate from the seed, so neither the (L, L) probabilities nor the
    masks are ever stored).  Elsewhere: mapped 2-D GEMMs with explicit
    per-slice dropout, each map step CHECKPOINTED so the backward recomputes one
    (nq, nk) attention matrix at a time — flash-like memory without a kernel.
    (Both rng streams differ from flax's nn.Dropout, which only changes training
    randomness, not its distribution.)"""
    if _use_flash(q.shape[2], k.shape[2], q.shape[3], v.shape[3]):
        return _flash(q, k, v, scale, dropout=dropout, rng=rng)
    B, h, nq, _ = q.shape
    q3, k3, v3 = (x.reshape(B * h, x.shape[2], x.shape[3]) for x in (q, k, v))
    keep_p = 1.0 - dropout
    if dropout > 0.0:
        keys = jax.random.split(rng, B * h)
    else:
        # rng is None when dropout is inactive (callers only draw a "dropout"
        # rng when rate > 0); placeholder keeps the map operands uniform
        keys = jnp.zeros((B * h, 2), jnp.uint32)

    @jax.checkpoint
    def one(args):
        qi, ki, vi, kk = args
        att = nn.softmax(
            jnp.dot(qi, ki.T, preferred_element_type=jnp.float32) * scale,
            axis=-1)
        if dropout > 0.0:
            keep = jax.random.bernoulli(kk, keep_p, att.shape)
            att = jnp.where(keep, att / keep_p, 0.0)
        return jnp.dot(att, vi.astype(jnp.float32))

    out = jax.lax.map(one, (q3, k3, v3, keys))
    return out.reshape(B, h, nq, v.shape[3])


def dense(features, name, dtype=None):
    return nn.Dense(features, kernel_init=LINEAR_INIT, bias_init=nn.initializers.zeros,
                    name=name, dtype=dtype)


class ScaledDotProductAttention(nn.Module):
    """Multi-head attention with separate q/k input dims (self_attention.py:10-88).

    q: (B, nq, in_dim_q), k/v: (B, nk, in_dim_k) -> (B, nq, d_model=in_dim_k).
    """

    in_dim_k: int
    d_k: int
    d_v: int
    h: int = 1
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, queries, keys, values, train: bool = False):
        B, nq, _ = queries.shape
        nk = keys.shape[1]
        q = dense(self.h * self.d_k, "fc_q", self.dtype)(queries)
        k = dense(self.h * self.d_k, "fc_k", self.dtype)(keys)
        v = dense(self.h * self.d_v, "fc_v", self.dtype)(values)
        q = q.reshape(B, nq, self.h, self.d_k).transpose(0, 2, 1, 3)
        k = k.reshape(B, nk, self.h, self.d_k).transpose(0, 2, 1, 3)
        v = v.reshape(B, nk, self.h, self.d_v).transpose(0, 2, 1, 3)
        scale = 1.0 / np.sqrt(self.d_k)
        if not train:
            # eval fast path: mapped 2-D GEMMs; per-sample attention memory, so
            # large serving batches compile where the batched form cannot
            out = _attend(q, k, v, scale)
        else:
            out = _attend_train(q, k, v, scale, self.dropout,
                                self.make_rng("dropout")
                                if self.dropout > 0.0 else None)
        out = out.transpose(0, 2, 1, 3).reshape(B, nq, self.h * self.d_v)
        return dense(self.in_dim_k, "fc_o", self.dtype)(out)


class SimplifiedScaledDotProductAttention(nn.Module):
    """No q/k/v projections, only an output linear (self_attention.py:95-160).

    d_model is the TOKEN feature dim (for CoAM channel attention: H*W).
    """

    d_model: int
    h: int = 1
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, queries, keys, values, train: bool = False):
        B, nq, _ = queries.shape
        nk = keys.shape[1]
        d_k = self.d_model // self.h
        d_v = self.d_model // self.h
        q = queries.reshape(B, nq, self.h, d_k).transpose(0, 2, 1, 3)
        k = keys.reshape(B, nk, self.h, d_k).transpose(0, 2, 1, 3)
        v = values.reshape(B, nk, self.h, d_v).transpose(0, 2, 1, 3)
        q3, k3, v3 = (x.reshape(B * self.h, x.shape[2], x.shape[3])
                      for x in (q, k, v))      # folded: see _attend
        att = jnp.einsum("bqd,bkd->bqk", q3, k3,
                         preferred_element_type=jnp.float32) / np.sqrt(d_k)
        att = nn.softmax(att, axis=-1)
        att = nn.Dropout(self.dropout, deterministic=not train)(att)
        out = jnp.einsum("bqk,bkd->bqd", att, v3,
                         preferred_element_type=jnp.float32)
        out = out.reshape(B, self.h, nq, d_v).transpose(0, 2, 1, 3)
        out = out.reshape(B, nq, self.h * d_v)
        return dense(self.d_model, "fc_o", self.dtype)(out)
