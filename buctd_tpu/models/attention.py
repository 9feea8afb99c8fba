"""Attention primitives (flax) matching lib/models/self_attention.py.

Written as einsum-on-MXU token attention; param names mirror the torch modules
(fc_q/fc_k/fc_v/fc_o) for the generic converter.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

LINEAR_INIT = nn.initializers.normal(stddev=0.001)

# chunk the query axis at eval when the full (B, h, nq, nk) attention tensor
# would exceed this many elements (f32: 2^31 = 8.6 GB, roughly half the v5e's
# HBM) — CoAM's stage-2 position attention is 6912x6912 = 191 MB PER SAMPLE,
# which capped serving batches at ~32 before.  q-chunking is EXACT (each query
# row's softmax is complete within its chunk) and shrinks the live footprint to
# O(B x chunk x nk): measured b64 CoAM-W48 at 489.9 crops/s where the full
# form cannot compile (tools/bench_coam.py)
Q_CHUNK = 512
Q_CHUNK_THRESHOLD = 1 << 31


def _attend(q, k, v, scale):
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                     preferred_element_type=jnp.float32) * scale
    att = nn.softmax(att, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", att, v,
                      preferred_element_type=jnp.float32)


def _attend_chunked(q, k, v, scale, chunk=Q_CHUNK):
    """Exact attention with the query axis processed in chunks (lax.map)."""
    B, h, nq, d = q.shape
    pad = (-nq) % chunk
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    qc = qp.reshape(B, h, -1, chunk, d).transpose(2, 0, 1, 3, 4)
    out = jax.lax.map(lambda qi: _attend(qi, k, v, scale), qc)
    out = out.transpose(1, 2, 0, 3, 4).reshape(B, h, nq + pad, v.shape[-1])
    return out[:, :, :nq]


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
        if not train and B * self.h * nq * nk > Q_CHUNK_THRESHOLD:
            # eval fast path: dropout is inactive, so q-chunking is exact
            out = _attend_chunked(q, k, v, scale)
        else:
            att = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                             preferred_element_type=jnp.float32) * scale
            att = nn.softmax(att, axis=-1)
            att = nn.Dropout(self.dropout, deterministic=not train)(att)
            out = jnp.einsum("bhqk,bhkd->bhqd", att, v,
                             preferred_element_type=jnp.float32)
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
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                         preferred_element_type=jnp.float32) / np.sqrt(d_k)
        att = nn.softmax(att, axis=-1)
        att = nn.Dropout(self.dropout, deterministic=not train)(att)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v, preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, nq, self.h * d_v)
        return dense(self.d_model, "fc_o", self.dtype)(out)
