"""CoAM — Conditional Attention Modules (BUCTD-CoAM).

Re-implements the dual-attention condition injection of lib/models/pose_hrnet_coam.py:
  * PositionAttentionModule (:631-660): 3x3 convs on features and condition, then
    cross-attention with the CONDITION as query and features as key/value over
    h*w spatial tokens.
  * ChannelAttentionModule (:662-689): condition projected to feature channel count,
    attention over CHANNEL tokens whose feature dim is H*W (the output linear acts on
    the spatial dim, making weights input-resolution specific, as in the reference).
  * DAModule (:692-725): residual combine input + (p_out + c_out), or input * c_out when
    channel_only.
  * CoAMBlock (:728-757): one DAModule per resolution branch; the full-resolution
    condition map is bilinearly resized (no antialias) to each branch.
  * Self-attention twins (:761-801).

NHWC layout; module names mirror torch paths for the converter.
"""

from __future__ import annotations

from typing import Any, Sequence

from flax import linen as nn

from ..ops.warp import resize_bilinear
from .attention import ScaledDotProductAttention, SimplifiedScaledDotProductAttention
from .hrnet import KERNEL_INIT


def conv3x3(features, name, dtype=None):
    return nn.Conv(features, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                   kernel_init=KERNEL_INIT, name=name, dtype=dtype)


class PositionAttentionModule(nn.Module):
    d_model: int
    d_cond: int | None
    n_heads: int = 1
    self_att: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, cond=None, train: bool = False):
        B, H, W, C = x.shape
        y = conv3x3(self.d_model, "cnn", self.dtype)(x).reshape(B, H * W, C)
        if not self.self_att:
            yc = conv3x3(self.d_cond, "cnn_cond", self.dtype)(cond)
            yc = yc.reshape(B, H * W, self.d_cond)
            out = ScaledDotProductAttention(
                in_dim_k=self.d_model, d_k=self.d_model, d_v=self.d_model,
                h=self.n_heads, name="pa", dtype=self.dtype)(yc, y, y, train=train)
        else:
            out = ScaledDotProductAttention(
                in_dim_k=self.d_model, d_k=self.d_model, d_v=self.d_model,
                h=self.n_heads, name="pa", dtype=self.dtype)(y, y, y, train=train)
        return out  # (B, H*W, C)


class ChannelAttentionModule(nn.Module):
    d_model: int
    d_cond: int | None
    hw: int  # H*W of this branch (fc_o weight size)
    n_heads: int = 1
    self_att: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, cond=None, train: bool = False):
        B, H, W, C = x.shape
        # channel tokens: (B, C, H*W)
        y = conv3x3(self.d_model, "cnn", self.dtype)(x)
        y = y.reshape(B, H * W, C).transpose(0, 2, 1)
        if not self.self_att:
            yc = conv3x3(self.d_model, "cnn_cond", self.dtype)(cond)
            yc = yc.reshape(B, H * W, C).transpose(0, 2, 1)
            out = SimplifiedScaledDotProductAttention(
                d_model=self.hw, h=self.n_heads, name="pa", dtype=self.dtype)(
                yc, y, y, train=train)
        else:
            out = SimplifiedScaledDotProductAttention(
                d_model=self.hw, h=self.n_heads, name="pa", dtype=self.dtype)(
                y, y, y, train=train)
        return out  # (B, C, H*W)


class DAModule(nn.Module):
    d_model: int
    d_cond: int
    hw: int
    n_heads: int = 1
    channel_only: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, cond, train: bool = False):
        B, H, W, C = x.shape
        c_out = ChannelAttentionModule(
            d_model=self.d_model, d_cond=self.d_cond, hw=self.hw, n_heads=self.n_heads,
            name="channel_attention_module", dtype=self.dtype)(x, cond, train=train)
        # (B, C, H*W) -> NHWC
        c_out = c_out.reshape(B, C, H, W).transpose(0, 2, 3, 1)
        if self.channel_only:
            return x * c_out
        p_out = PositionAttentionModule(
            d_model=self.d_model, d_cond=self.d_cond, n_heads=self.n_heads,
            name="position_attention_module", dtype=self.dtype)(x, cond, train=train)
        p_out = p_out.reshape(B, H, W, C)
        return x + (p_out + c_out)


class CoAMBlock(nn.Module):
    """One DAModule per branch; condition resized per-branch (pose_hrnet_coam.py:750)."""

    channel_list: Sequence[int]
    d_cond: int
    n_heads: int = 1
    channel_only: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, ys, cond_hm, train: bool = False):
        if self.d_cond == 1:
            cond_hm = cond_hm[..., :1]  # plain condition: single channel
        outs = []
        for i, y in enumerate(ys):
            _, H, W, _ = y.shape
            c = resize_bilinear(cond_hm, (H, W))
            outs.append(DAModule(
                d_model=self.channel_list[i], d_cond=self.d_cond, hw=H * W,
                n_heads=self.n_heads, channel_only=self.channel_only,
                name=f"att_layers.{i}", dtype=self.dtype)(y, c, train=train))
        return outs


class SelfDAModule(nn.Module):
    d_model: int
    hw: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        p_out = PositionAttentionModule(
            d_model=self.d_model, d_cond=None, self_att=True,
            name="position_attention_module", dtype=self.dtype)(x, train=train)
        c_out = ChannelAttentionModule(
            d_model=self.d_model, d_cond=None, hw=self.hw, self_att=True,
            name="channel_attention_module", dtype=self.dtype)(x, train=train)
        return p_out.reshape(B, H, W, C) + c_out.reshape(B, C, H, W).transpose(0, 2, 3, 1)


class SelfAttentionModule(nn.Module):
    channel_list: Sequence[int]
    dtype: Any = None

    @nn.compact
    def __call__(self, ys, cond_hm=None, train: bool = False):
        del cond_hm
        outs = []
        for i, y in enumerate(ys):
            _, H, W, _ = y.shape
            outs.append(SelfDAModule(d_model=self.channel_list[i], hw=H * W,
                                     name=f"att_layers.{i}", dtype=self.dtype)(
                y, train=train))
        return outs
