"""PoseResNet (SimpleBaseline): ResNet backbone + 3 deconv layers + 1x1 head.

Re-implements lib/models/pose_resnet.py:103-235 including the preNet fusion variant
(:113-115, :160-171 — NB its RGB stem uses k7, unlike HRNet's k3).  Deconvs reproduce
torch ConvTranspose2d exactly as an input-dilated conv with a spatially-flipped,
io-swapped kernel (kernel param stored (kh,kw,O,I) so the generic converter's 4D rule
maps torch's (I,O,kh,kw) directly).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .hrnet import (BasicBlock, Bottleneck, FusedPreNet, KERNEL_INIT,
                    batch_norm, conv)

RESNET_SPEC = {
    18: ("BASIC", (2, 2, 2, 2)),
    34: ("BASIC", (3, 4, 6, 3)),
    50: ("BOTTLENECK", (3, 4, 6, 3)),
    101: ("BOTTLENECK", (3, 4, 23, 3)),
    152: ("BOTTLENECK", (3, 8, 36, 3)),
}


class Deconv(nn.Module):
    """torch nn.ConvTranspose2d(kernel, stride=2, padding, output_padding) parity."""

    features: int
    kernel: int
    padding: int
    output_padding: int
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        k, p, op = self.kernel, self.padding, self.output_padding
        w = self.param("kernel", KERNEL_INIT, (k, k, self.features, C))  # (kh,kw,O,I)
        # transposed conv == lhs-dilated conv with flipped, io-swapped kernel
        w_conv = jnp.flip(w.transpose(0, 1, 3, 2), axis=(0, 1))  # (kh,kw,I,O)
        pad = (k - 1 - p, k - 1 - p + op)
        out = jax.lax.conv_general_dilated(
            x, w_conv, window_strides=(1, 1), padding=(pad, pad),
            lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.features,))
        return out


@dataclasses.dataclass(frozen=True)
class ResNetSpec:
    num_joints: int
    block: str
    layers: tuple
    deconv_filters: tuple
    deconv_kernels: tuple
    deconv_with_bias: bool
    final_conv_kernel: int
    use_pre_net: bool

    @staticmethod
    def from_cfg(cfg) -> "ResNetSpec":
        extra = cfg.MODEL.EXTRA
        block, layers = RESNET_SPEC[int(extra["NUM_LAYERS"])]
        return ResNetSpec(
            num_joints=int(cfg.MODEL.NUM_JOINTS),
            block=block,
            layers=tuple(layers),
            deconv_filters=tuple(extra.get("NUM_DECONV_FILTERS", [256, 256, 256])),
            deconv_kernels=tuple(extra.get("NUM_DECONV_KERNELS", [4, 4, 4])),
            deconv_with_bias=bool(extra.get("DECONV_WITH_BIAS", False)),
            final_conv_kernel=int(extra.get("FINAL_CONV_KERNEL", 1)),
            use_pre_net=bool(extra.get("USE_PRE_NET", False)),
        )


_DECONV_CFG = {4: (1, 0), 3: (1, 1), 2: (0, 0)}  # kernel -> (padding, output_padding)


class ResNetPreNet(nn.Module):
    """pose_resnet preNet (pose_resnet.py:160-171): RGB k7(3->64)+BN, k7(64->3)+BN;
    cond k7(3->3)+BN; summed."""

    dtype: Any = None

    @nn.compact
    def __call__(self, rgb, cond, train: bool = False):
        x0 = conv(64, 7, 1, bias=True, name="rgb_preNet.0", dtype=self.dtype)(rgb)
        x0 = batch_norm(name="rgb_preNet.1", dtype=self.dtype)(x0, use_running_average=not train)
        x0 = conv(3, 7, 1, bias=True, name="rgb_preNet.2", dtype=self.dtype)(x0)
        x0 = batch_norm(name="rgb_preNet.3", dtype=self.dtype)(x0, use_running_average=not train)
        x1 = conv(3, 7, 1, bias=True, name="cond_preNet.0", dtype=self.dtype)(cond)
        x1 = batch_norm(name="cond_preNet.1", dtype=self.dtype)(x1, use_running_average=not train)
        return x0 + x1


class PoseResNet(nn.Module):
    spec: ResNetSpec
    dtype: Any = None
    fused_prenet: bool = False  # set via models/fuse.py::maybe_fuse_prenet

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec, dt = self.spec, self.dtype
        if spec.use_pre_net:
            assert x.shape[-1] >= 6, "preNet requires RGB + 3-channel condition input"
            if self.fused_prenet:
                assert not train, "fused preNet is an eval-only transform"
                x = FusedPreNet(first_kernel=7, name="_prenet_fused",
                                dtype=dt)(x[..., :3], x[..., 3:6])
            else:
                x = ResNetPreNet(name="_prenet", dtype=dt)(
                    x[..., :3], x[..., 3:6], train=train)

        x = conv(64, 7, 2, name="conv1", dtype=dt)(x)
        x = batch_norm(name="bn1", dtype=dt)(x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        block_cls = BasicBlock if spec.block == "BASIC" else Bottleneck
        exp = 1 if spec.block == "BASIC" else 4
        cin = 64
        for li, (planes, n_blocks) in enumerate(zip((64, 128, 256, 512), spec.layers)):
            stride = 1 if li == 0 else 2
            for b in range(n_blocks):
                x = block_cls(planes=planes,
                              stride=stride if b == 0 else 1,
                              has_downsample=(b == 0 and (stride != 1 or cin != planes * exp)),
                              name=f"layer{li + 1}.{b}", dtype=dt)(x, train=train)
                cin = planes * exp

        for di, (f, k) in enumerate(zip(spec.deconv_filters, spec.deconv_kernels)):
            p, op = _DECONV_CFG[k]
            x = Deconv(features=f, kernel=k, padding=p, output_padding=op,
                       use_bias=spec.deconv_with_bias,
                       name=f"deconv_layers.{di * 3}", dtype=dt)(x)
            x = batch_norm(name=f"deconv_layers.{di * 3 + 1}", dtype=dt)(
                x, use_running_average=not train)
            x = nn.relu(x)

        k = spec.final_conv_kernel
        return nn.Conv(spec.num_joints, (k, k), padding=((k // 2, k // 2),) * 2,
                       use_bias=True, kernel_init=KERNEL_INIT, name="final_layer",
                       dtype=dt)(x)


def get_pose_net(cfg, is_train: bool = False, dtype=None) -> PoseResNet:
    del is_train
    return PoseResNet(spec=ResNetSpec.from_cfg(cfg), dtype=dtype)
