"""BUCTD-TransPose: HRNet-small trunk (stages 2-3) + transformer encoder head.

Re-implements lib/models/transpose_h.py:419-681: stem + stage2 + stage3
(multi_scale_output=False), 1x1 ``reduce`` to d_model, optional conditional path
(``trans_cond`` 1x1 conv 3->16, concatenated: d_model += 16), 2D sine / learnable
position embedding, N DETR-style post-norm encoder layers (pos added to q,k each
layer), then a 1x1 head.

TPU notes: tokens kept batch-first (B, L, d) so attention einsums hit the MXU without
leading-axis transposes; the sine PE is a compile-time numpy constant (the reference
stores it as a frozen nn.Parameter — converter ignores it).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from ..ops.warp import resize_bilinear
from .hrnet import (Bottleneck, HRModule, KERNEL_INIT, StageSpec, Transition,
                    batch_norm, conv)
from .attention import dense


def make_sine_position_embedding(h: int, w: int, d_model: int,
                                 temperature: float = 10000,
                                 scale: float = 2 * math.pi) -> np.ndarray:
    """(h*w, d_model) sine PE, matching transpose_h.py:513-537."""
    y_embed = np.tile(np.arange(1, h + 1, dtype=np.float32)[:, None], (1, w))
    x_embed = np.tile(np.arange(1, w + 1, dtype=np.float32)[None, :], (h, 1))
    eps = 1e-6
    y_embed = y_embed / (h + eps) * scale
    x_embed = x_embed / (w + eps) * scale

    half = d_model // 2
    dim_t = np.arange(half, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / half)

    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])],
                     axis=3).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])],
                     axis=3).reshape(h, w, -1)
    pos = np.concatenate([pos_y, pos_x], axis=2)  # (h, w, d_model)
    return pos.reshape(h * w, -1)


class _PackedInProj(nn.Module):
    """torch-layout packed qkv projection applied as three d-wide matmuls.

    Keeps the single (d, 3d) kernel + (3d,) bias param tree of nn.Dense (so the
    converter maps torch's in_proj_weight/_bias unchanged) but avoids computing the
    full 3d-wide projection per input — q/k/v each only need their own third
    (projecting all three would waste ~2x the FLOPs across every encoder layer).
    """

    d_model: int
    dtype: Any = None

    @nn.compact
    def __call__(self, q_in, k_in, v_in):
        from .attention import LINEAR_INIT

        d = self.d_model
        kernel = self.param("kernel", LINEAR_INIT, (d, 3 * d))
        bias = self.param("bias", nn.initializers.zeros, (3 * d,))
        dt = self.dtype or kernel.dtype

        def proj(x, sl):
            return (x.astype(dt) @ kernel[:, sl].astype(dt)
                    + bias[sl].astype(dt))

        return (proj(q_in, slice(0, d)), proj(k_in, slice(d, 2 * d)),
                proj(v_in, slice(2 * d, 3 * d)))


class MultiheadSelfAttention(nn.Module):
    """torch nn.MultiheadAttention-compatible self-attention with packed in_proj.

    Parameter names produce torch keys 'self_attn.in_proj_weight/_bias' and
    'self_attn.out_proj.weight/.bias' via the converter key_map.
    """

    d_model: int
    n_head: int
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, q_in, k_in, v_in, train: bool = False):
        B, L, d = q_in.shape
        h = self.n_head
        hd = d // h
        qkv_q, qkv_k, qkv_v = _PackedInProj(d, self.dtype, name="in_proj")(
            q_in, k_in, v_in)
        # scale by a PYTHON float (weak type): an np scalar would promote bf16
        # activations to f32 and hand the flash kernel mixed-dtype operands
        q = qkv_q.reshape(B, L, h, hd).transpose(0, 2, 1, 3) / float(np.sqrt(hd))
        k = qkv_k.reshape(B, L, h, hd).transpose(0, 2, 1, 3)
        v = qkv_v.reshape(B, L, h, hd).transpose(0, 2, 1, 3)
        from .attention import _attend, _attend_train
        if not train:
            # eval fast path: mapped 2-D GEMMs (models/attention.py) — 6.7x the
            # batched-dot form at 6912 tokens, with per-sample attention memory
            out = _attend(q, k, v, 1.0)             # q is pre-scaled
        else:
            out = _attend_train(q, k, v, 1.0, self.dropout,
                                self.make_rng("dropout")
                                if self.dropout > 0.0 else None)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, d)
        return dense(d, "out_proj", self.dtype)(out)


class TransformerEncoderLayer(nn.Module):
    """DETR-style post-norm encoder layer (transpose_h.py:168-243)."""

    d_model: int
    n_head: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, src, pos, train: bool = False):
        q = k = src + pos
        src2 = MultiheadSelfAttention(d_model=self.d_model, n_head=self.n_head,
                                      dropout=self.dropout, name="self_attn",
                                      dtype=self.dtype)(q, k, src, train=train)
        src = src + nn.Dropout(self.dropout, deterministic=not train)(src2)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=self.dtype)(src)
        src2 = dense(self.dim_feedforward, "linear1", self.dtype)(src)
        src2 = nn.relu(src2)
        src2 = nn.Dropout(self.dropout, deterministic=not train)(src2)
        src2 = dense(self.d_model, "linear2", self.dtype)(src2)
        src = src + nn.Dropout(self.dropout, deterministic=not train)(src2)
        return nn.LayerNorm(epsilon=1e-5, name="norm2", dtype=self.dtype)(src)


@dataclasses.dataclass(frozen=True)
class TransPoseSpec:
    num_joints: int
    stage2: StageSpec
    stage3: StageSpec
    d_model: int
    dim_feedforward: int
    n_head: int
    encoder_layers: int
    pos_embedding: str           # 'sine' | 'learnable' | 'none'
    pe_hw: tuple                 # (h, w) at quarter resolution
    final_conv_kernel: int
    use_attention: bool          # conditional input path

    @staticmethod
    def from_cfg(cfg) -> "TransPoseSpec":
        extra = cfg.MODEL.EXTRA
        w, h = cfg.MODEL.IMAGE_SIZE
        return TransPoseSpec(
            num_joints=int(cfg.MODEL.NUM_JOINTS),
            stage2=StageSpec.from_cfg(extra["STAGE2"]),
            stage3=StageSpec.from_cfg(extra["STAGE3"]),
            d_model=int(cfg.MODEL.DIM_MODEL),
            dim_feedforward=int(cfg.MODEL.DIM_FEEDFORWARD),
            n_head=int(cfg.MODEL.N_HEAD),
            encoder_layers=int(cfg.MODEL.ENCODER_LAYERS),
            pos_embedding=str(cfg.MODEL.POS_EMBEDDING),
            pe_hw=(int(h) // 4, int(w) // 4),
            final_conv_kernel=int(extra.get("FINAL_CONV_KERNEL", 1)),
            use_attention=bool(extra.get("USE_ATTENTION", False)),
        )


class TransPoseH(nn.Module):
    spec: TransPoseSpec
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec, dt = self.spec, self.dtype
        if spec.use_attention:
            assert x.shape[-1] > 3, "conditional TransPose requires cond channels"
            x, cond_hm = x[..., :3], x[..., 3:]

        x = conv(64, 3, 2, name="conv1", dtype=dt)(x)
        x = batch_norm(name="bn1", dtype=dt)(x, use_running_average=not train)
        x = nn.relu(x)
        x = conv(64, 3, 2, name="conv2", dtype=dt)(x)
        x = batch_norm(name="bn2", dtype=dt)(x, use_running_average=not train)
        x = nn.relu(x)
        cin = 64
        for k in range(4):
            x = Bottleneck(planes=64, has_downsample=(k == 0 and cin != 256),
                           name=f"layer1.{k}", dtype=dt)(x, train=train)
            cin = 256

        ys = [x]
        pre = (256,)
        for si, (stage, tname, sname) in enumerate([
            (spec.stage2, "transition1", "stage2"),
            (spec.stage3, "transition2", "stage3"),
        ]):
            cur = stage.out_channels
            ys = Transition(pre_channels=pre, cur_channels=cur, name_prefix=tname,
                            name=f"_{tname}", dtype=dt)(ys, train=train)
            last = si == 1
            for m in range(stage.num_modules):
                mso = not (last and m == stage.num_modules - 1)
                ys = HRModule(spec=stage, in_channels=cur, multi_scale_output=mso,
                              name=f"{sname}.{m}", dtype=dt)(ys, train=train)
            pre = cur

        feat = nn.Conv(spec.d_model, (1, 1), use_bias=False, kernel_init=KERNEL_INIT,
                       name="reduce", dtype=dt)(ys[0])
        B, H, W, C = feat.shape
        d = spec.d_model
        if spec.use_attention:
            cond = resize_bilinear(cond_hm, (H, W))
            xc = nn.Conv(16, (1, 1), use_bias=False, kernel_init=KERNEL_INIT,
                         name="trans_cond", dtype=dt)(cond)
            feat = jnp.concatenate([feat, xc], axis=-1)
            d += 16

        tokens = feat.reshape(B, H * W, d)
        if spec.pos_embedding == "sine":
            pos = jnp.asarray(make_sine_position_embedding(H, W, d))[None]
        elif spec.pos_embedding == "learnable":
            pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                             (H * W, 1, d))  # torch layout (L, 1, d)
            pos = pos[:, 0][None]
        else:
            pos = jnp.zeros((1, 1, d))

        for i in range(spec.encoder_layers):
            tokens = TransformerEncoderLayer(
                d_model=d, n_head=spec.n_head, dim_feedforward=spec.dim_feedforward,
                name=f"global_encoder.layers.{i}", dtype=dt)(tokens, pos, train=train)

        out = tokens.reshape(B, H, W, d)
        k = spec.final_conv_kernel
        return nn.Conv(spec.num_joints, (k, k), padding=((k // 2, k // 2),) * 2,
                       use_bias=True, kernel_init=KERNEL_INIT, name="final_layer",
                       dtype=dt)(out)


def transpose_key_map(torch_key: str) -> str:
    """Converter key_map: our packed in_proj Dense is torch's in_proj_weight/_bias."""
    return (torch_key
            .replace("self_attn.in_proj.weight", "self_attn.in_proj_weight")
            .replace("self_attn.in_proj.bias", "self_attn.in_proj_bias"))


def get_pose_net(cfg, is_train: bool = False, dtype=None) -> TransPoseH:
    del is_train
    return TransPoseH(spec=TransPoseSpec.from_cfg(cfg), dtype=dtype)
