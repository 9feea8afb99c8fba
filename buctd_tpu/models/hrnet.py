"""HRNet backbone (W32/W48) + preNet conditional fusion — flax/NHWC, TPU-first.

Re-implements the architecture of lib/models/pose_hrnet.py:274-495 (stem -> 4-block
Bottleneck layer1 -> 3 multi-resolution stages with cross-resolution fusion -> 1x1 head),
including the BUCTD "preNet" input-fusion stems (pose_hrnet.py:431-442, :452-458).

Design notes (TPU):
  * NHWC everywhere — feeds the MXU without layout transposes.
  * All convs use explicit numeric padding to match torch's `padding=1` placement
    (XLA 'SAME' pads (0,1) for stride-2/even-size, torch pads (1,1) — different result).
  * Nearest-neighbor 2^k upsampling in the fuse mesh = reshape+broadcast, which XLA
    fuses into the following add.
  * Module names mirror the torch dotted paths ("layer1"."0"."conv1", ...) so a single
    generic state_dict converter covers every architecture (convert/torch2jax.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

BN_MOMENTUM_FLAX = 0.9  # == torch BN momentum 0.1
BN_EPS = 1e-5

KERNEL_INIT = nn.initializers.normal(stddev=0.001)  # init_weights (pose_hrnet.py:578)


def conv(features, kernel, stride=1, pad=None, bias=False, name=None, dtype=None):
    if pad is None:
        pad = (kernel - 1) // 2
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        use_bias=bias,
        kernel_init=KERNEL_INIT,
        name=name,
        dtype=dtype,
    )


def batch_norm(name=None, dtype=None):
    return nn.BatchNorm(momentum=BN_MOMENTUM_FLAX, epsilon=BN_EPS, name=name, dtype=dtype)


def upsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, factor, W, factor, C))
    return x.reshape(B, H * factor, W * factor, C)


class BasicBlock(nn.Module):
    """conv3x3-bn-relu-conv3x3-bn + residual (pose_hrnet.py:28-57)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = conv(self.planes, 3, self.stride, name="conv1", dtype=self.dtype)(x)
        out = batch_norm(name="bn1", dtype=self.dtype)(out, use_running_average=not train)
        out = nn.relu(out)
        out = conv(self.planes, 3, name="conv2", dtype=self.dtype)(out)
        out = batch_norm(name="bn2", dtype=self.dtype)(out, use_running_average=not train)
        if self.has_downsample:
            residual = conv(self.planes, 1, self.stride, name="downsample.0", dtype=self.dtype)(x)
            residual = batch_norm(name="downsample.1", dtype=self.dtype)(
                residual, use_running_average=not train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """1x1-3x3-1x1 with 4x expansion (pose_hrnet.py:60-98)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = conv(self.planes, 1, name="conv1", dtype=self.dtype)(x)
        out = batch_norm(name="bn1", dtype=self.dtype)(out, use_running_average=not train)
        out = nn.relu(out)
        out = conv(self.planes, 3, self.stride, name="conv2", dtype=self.dtype)(out)
        out = batch_norm(name="bn2", dtype=self.dtype)(out, use_running_average=not train)
        out = nn.relu(out)
        out = conv(self.planes * self.expansion, 1, name="conv3", dtype=self.dtype)(out)
        out = batch_norm(name="bn3", dtype=self.dtype)(out, use_running_average=not train)
        if self.has_downsample:
            residual = conv(self.planes * self.expansion, 1, self.stride,
                            name="downsample.0", dtype=self.dtype)(x)
            residual = batch_norm(name="downsample.1", dtype=self.dtype)(
                residual, use_running_average=not train)
        return nn.relu(out + residual)


BLOCKS = {"BASIC": (BasicBlock, 1), "BOTTLENECK": (Bottleneck, 4)}


def _maybe_remat(block_cls, remat: str, train: bool,
                 when=("blocks", "modules", "stem")):
    """Rematerialization granularity (TPU.REMAT + TPU.REMAT_MODE).

    Whole-forward jax.checkpoint CANNOT reduce the peak of a plain fwd+bwd
    step — the backward replay re-stores every intermediate the backward
    needs, so the peak equals the no-remat peak (measured: b192 preNet-W48
    bf16 OOMs identically, 17.98G > 15.75G HBM, with and without it).

    'blocks' checkpoints each residual block — but the dominant temps are the
    block BOUNDARY tensors (four 648 MB bf16 [192,96,72,256] layer1 outputs),
    which block-granularity must keep (measured: b192 still 17.98G).

    'modules' (default) checkpoints layer1 + the stem as ONE unit each and
    every HRModule as a unit: only the unit INPUTS stay resident through the
    backward (layer1: one 96x72x64 tensor instead of 4x 648 MB), and each
    unit's internals are recomputed one-at-a-time when its backward runs —
    peak becomes boundary-sum + the largest single unit.  The only granularity
    measured to fit b192+ (for 1.5-2x per-crop time).

    'stem' checkpoints ONLY preNet + stem + layer1 — the largest single
    temps (4x 648 MB layer1 boundaries + the full-res 1.8x-padded preNet
    maps) — and stores everything else: a 5% tax, but b192 still OOMs on the
    stored 162 MB stage3/4 branch activations (PERF.md, probe_train_compile)."""
    if remat not in when or not train:
        return block_cls
    # static_argnums counts self as 0; every block signature is (self, *arrays,
    # train), so the static `train` flag is the last positional argument
    train_argnum = {PreNet: 3}.get(block_cls, 2)
    return nn.remat(block_cls, static_argnums=(train_argnum,))


@dataclasses.dataclass(frozen=True)
class StageSpec:
    num_modules: int
    num_branches: int
    block: str
    num_blocks: tuple
    num_channels: tuple

    @staticmethod
    def from_cfg(d) -> "StageSpec":
        return StageSpec(
            num_modules=int(d["NUM_MODULES"]),
            num_branches=int(d["NUM_BRANCHES"]),
            block=str(d["BLOCK"]),
            num_blocks=tuple(d["NUM_BLOCKS"]),
            num_channels=tuple(d["NUM_CHANNELS"]),
        )

    @property
    def out_channels(self) -> tuple:
        exp = BLOCKS[self.block][1]
        return tuple(c * exp for c in self.num_channels)


class HRModule(nn.Module):
    """One HighResolutionModule: per-branch block stacks + full cross-resolution fuse
    (pose_hrnet.py:101-265)."""

    spec: StageSpec
    in_channels: tuple
    multi_scale_output: bool = True
    dtype: Any = None
    remat: str = ""

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        spec = self.spec
        block_cls, exp = BLOCKS[spec.block]
        block_cls = _maybe_remat(block_cls, self.remat, train, when=("blocks",))
        nb = spec.num_branches

        outs = []
        for i in range(nb):
            x = xs[i]
            cin = self.in_channels[i]
            cout = spec.num_channels[i] * exp
            for k in range(spec.num_blocks[i]):
                x = block_cls(
                    planes=spec.num_channels[i],
                    stride=1,
                    has_downsample=(k == 0 and cin != cout),
                    name=f"branches.{i}.{k}",
                    dtype=self.dtype,
                )(x, train)   # positional: remat static_argnums binds positionally
            outs.append(x)

        if nb == 1:
            return outs

        chans = spec.out_channels
        n_out = nb if self.multi_scale_output else 1
        fused = []
        for i in range(n_out):
            y = None
            for j in range(nb):
                if j == i:
                    t = outs[j]
                elif j > i:
                    t = conv(chans[i], 1, pad=0, name=f"fuse_layers.{i}.{j}.0",
                             dtype=self.dtype)(outs[j])
                    t = batch_norm(name=f"fuse_layers.{i}.{j}.1", dtype=self.dtype)(
                        t, use_running_average=not train)
                    t = upsample_nearest(t, 2 ** (j - i))
                else:  # j < i: chain of stride-2 3x3s
                    t = outs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        co = chans[i] if last else chans[j]
                        t = conv(co, 3, 2, name=f"fuse_layers.{i}.{j}.{k}.0",
                                 dtype=self.dtype)(t)
                        t = batch_norm(name=f"fuse_layers.{i}.{j}.{k}.1", dtype=self.dtype)(
                            t, use_running_average=not train)
                        if not last:
                            t = nn.relu(t)
                y = t if y is None else y + t
            fused.append(nn.relu(y))
        return fused


class Transition(nn.Module):
    """Between-stage transition (pose_hrnet.py:338-377).

    Matches the reference forward semantics (pose_hrnet.py:469-491): a present
    transition layer consumes the LAST previous branch; identity passes branch i.
    """

    pre_channels: tuple
    cur_channels: tuple
    name_prefix: str
    dtype: Any = None

    @nn.compact
    def __call__(self, ys: Sequence[jnp.ndarray], train: bool = False):
        n_pre = len(self.pre_channels)
        outs = []
        for i, c_cur in enumerate(self.cur_channels):
            if i < n_pre:
                if c_cur != self.pre_channels[i]:
                    t = conv(c_cur, 3, 1, name=f"{self.name_prefix}.{i}.0",
                             dtype=self.dtype)(ys[-1])
                    t = batch_norm(name=f"{self.name_prefix}.{i}.1", dtype=self.dtype)(
                        t, use_running_average=not train)
                    outs.append(nn.relu(t))
                else:
                    outs.append(ys[i])
            else:
                t = ys[-1]
                for j in range(i + 1 - n_pre):
                    co = c_cur if j == i - n_pre else self.pre_channels[-1]
                    t = conv(co, 3, 2, name=f"{self.name_prefix}.{i}.{j}.0",
                             dtype=self.dtype)(t)
                    t = batch_norm(name=f"{self.name_prefix}.{i}.{j}.1", dtype=self.dtype)(
                        t, use_running_average=not train)
                    t = nn.relu(t)
                outs.append(t)
        return outs


@dataclasses.dataclass(frozen=True)
class HRNetSpec:
    num_joints: int
    stage2: StageSpec
    stage3: StageSpec
    stage4: StageSpec
    final_conv_kernel: int = 1
    use_pre_net: bool = False

    @staticmethod
    def from_cfg(cfg) -> "HRNetSpec":
        extra = cfg.MODEL.EXTRA
        return HRNetSpec(
            num_joints=int(cfg.MODEL.NUM_JOINTS),
            stage2=StageSpec.from_cfg(extra["STAGE2"]),
            stage3=StageSpec.from_cfg(extra["STAGE3"]),
            stage4=StageSpec.from_cfg(extra["STAGE4"]),
            final_conv_kernel=int(extra.get("FINAL_CONV_KERNEL", 1)),
            use_pre_net=bool(extra.get("USE_PRE_NET", False)),
        )


class HRNetTrunk(nn.Module):
    """Stem + layer1 + stages 2-4.  Shared by pose_hrnet, pose_hrnet_coam.

    ``taps`` optionally receives per-stage hooks (used by CoAM injection); each hook is
    ``f(list_of_branch_tensors, tap_arg, train) -> list``, applied right after the
    transition (stages 1-3) and after stage4 fusion, mirroring
    pose_hrnet_coam.py:521-563.  Hooks run inside this module's compact scope, so any
    flax modules they construct become children of the trunk.
    """

    spec: HRNetSpec
    dtype: Any = None
    remat: str = ""

    @nn.compact
    def __call__(self, x, train: bool = False, taps=(None, None, None, None),
                 tap_arg=None):
        dt = self.dtype

        def _stem_layer1(mdl, x, train):
            del mdl  # child modules auto-parent to the enclosing compact scope
            x = conv(64, 3, 2, name="conv1", dtype=dt)(x)
            x = batch_norm(name="bn1", dtype=dt)(x, use_running_average=not train)
            x = nn.relu(x)
            x = conv(64, 3, 2, name="conv2", dtype=dt)(x)
            x = batch_norm(name="bn2", dtype=dt)(x, use_running_average=not train)
            x = nn.relu(x)
            cin = 64
            layer1_cls = _maybe_remat(Bottleneck, self.remat, train,
                                      when=("blocks",))
            for k in range(4):
                x = layer1_cls(planes=64, has_downsample=(k == 0 and cin != 256),
                               name=f"layer1.{k}", dtype=dt)(x, train)
                cin = 256
            return x

        if self.remat in ("modules", "stem") and train:
            # ONE remat unit for stem+layer1: only its input stays resident
            # through the backward (the four 648 MB bf16 [B,96,72,256] block
            # outputs are recomputed when this unit's backward runs)
            x = nn.remat(_stem_layer1, static_argnums=(2,))(self, x, train)
        else:
            x = _stem_layer1(self, x, train)

        ys = [x]
        pre = (256,)
        for si, (stage, tname, sname) in enumerate([
            (self.spec.stage2, "transition1", "stage2"),
            (self.spec.stage3, "transition2", "stage3"),
            (self.spec.stage4, "transition3", "stage4"),
        ]):
            cur = stage.out_channels
            ys = Transition(pre_channels=pre, cur_channels=cur, name_prefix=tname,
                            name=f"_{tname}", dtype=dt)(ys, train=train)
            if taps[si] is not None:
                ys = taps[si](ys, tap_arg, train)
            last = si == 2
            for m in range(stage.num_modules):
                mso = not (last and m == stage.num_modules - 1)
                mod_cls = _maybe_remat(HRModule, self.remat, train,
                                       when=("modules",))
                ys = mod_cls(spec=stage, in_channels=cur, multi_scale_output=mso,
                             name=f"{sname}.{m}", dtype=dt,
                             remat=self.remat)(ys, train)
            pre = cur
        if taps[3] is not None:
            ys = taps[3](ys, tap_arg, train)
        return ys


class PreNet(nn.Module):
    """BUCTD-preNet input fusion stems (pose_hrnet.py:431-442): the RGB stem is
    conv3x3(3->64)+BN then conv7x7(64->3)+BN; the condition stem is conv7x7(3->3)+BN.
    Outputs are summed (pose_hrnet.py:456-458).  Convs carry biases (torch default)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, rgb, cond, train: bool = False):
        x0 = conv(64, 3, 1, bias=True, name="rgb_preNet.0", dtype=self.dtype)(rgb)
        x0 = batch_norm(name="rgb_preNet.1", dtype=self.dtype)(x0, use_running_average=not train)
        x0 = conv(3, 7, 1, bias=True, name="rgb_preNet.2", dtype=self.dtype)(x0)
        x0 = batch_norm(name="rgb_preNet.3", dtype=self.dtype)(x0, use_running_average=not train)
        x1 = conv(3, 7, 1, bias=True, name="cond_preNet.0", dtype=self.dtype)(cond)
        x1 = batch_norm(name="cond_preNet.1", dtype=self.dtype)(x1, use_running_average=not train)
        return x0 + x1


class FusedPreNet(nn.Module):
    """Eval-only exact refactoring of PreNet: the three BNs are affine at eval
    and fold into the conv weights, and the two parallel 7x7 convs (rgb-path
    64->3 and cond-path 3->3, same stride/padding) merge into ONE 7x7 conv over
    67 concatenated channels — a sum of convs over disjoint inputs IS a conv
    over their concat.  Exact up to float reassociation; params are built from
    trained PreNet variables by models/fuse.py (never trained directly).
    Cuts the full-resolution stem from 3 convs + 3 BNs + add to 2 convs."""

    first_kernel: int = 3   # 3 for HRNet PreNet, 7 for pose_resnet's
    dtype: Any = None

    @nn.compact
    def __call__(self, rgb, cond):
        h = conv(64, self.first_kernel, 1, bias=True, name="a",
                 dtype=self.dtype)(rgb)
        h = jnp.concatenate([h, cond.astype(h.dtype)], axis=-1)
        return conv(3, 7, 1, bias=True, name="b", dtype=self.dtype)(h)


class PoseHRNet(nn.Module):
    """pose_hrnet / BUCTD-preNet.  Input NHWC with C = 3 (plain) or 3 + cond channels.

    Returns (B, h/4, w/4, num_joints) heatmaps (NHWC).

    ``fused_prenet`` swaps the PreNet for its exact eval-time fusion (see
    FusedPreNet); set via models/fuse.py::maybe_fuse_prenet, never directly.
    """

    spec: HRNetSpec
    dtype: Any = None
    remat: str = ""
    fused_prenet: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, film=None, lambda_vec=None,
                 return_features=False):
        """film=(mu, sigma) (B, C) enables the MIPNet-heritage λ-conditioned FiLM
        modulation of the final features (forward_lamda, pose_hrnet.py:497-540);
        return_features returns the pre-head trunk features (forward_feature,
        :542-576).

        lambda_vec (B, 2) is the λ-conditioned call form ``model(input,
        lambda_vec)`` used by the reference's legacy λ loops (lib/core/
        train.py:391, validate.py:205-207).  The MIPNet model that consumed it is
        NOT part of the reference repo, so the embedding head is ours: a small
        MLP maps λ to the (mu, sigma) FiLM slot, with sigma initialised around 1
        (zero-init last layer) so an untrained head is a near-identity."""
        if self.spec.use_pre_net:
            assert x.shape[-1] >= 6, "preNet requires RGB + 3-channel condition input"
            if self.fused_prenet:
                assert not train, "fused preNet is an eval-only transform"
                x = FusedPreNet(first_kernel=3, name="_prenet_fused",
                                dtype=self.dtype)(x[..., :3], x[..., 3:6])
            else:
                # remat the preNet too: its full-resolution 3-channel temps pad
                # 1.8x on TPU (216 MB each at b192) for a ~2%-of-FLOPs stem
                prenet_cls = _maybe_remat(PreNet, self.remat, train)
                x = prenet_cls(name="_prenet", dtype=self.dtype)(
                    x[..., :3], x[..., 3:6], train)
        ys = HRNetTrunk(spec=self.spec, name="_trunk", dtype=self.dtype,
                        remat=self.remat)(x, train=train)
        feats = ys[0]
        if return_features:
            return feats
        if lambda_vec is not None:
            assert film is None, "pass film or lambda_vec, not both"
            C = feats.shape[-1]
            emb = nn.relu(nn.Dense(C, name="lambda_fc")(lambda_vec))
            mu = nn.Dense(C, kernel_init=nn.initializers.zeros,
                          name="lambda_mu")(emb)
            sigma = 1.0 + nn.Dense(C, kernel_init=nn.initializers.zeros,
                                   name="lambda_sigma")(emb)
            film = (mu, sigma)
        if film is not None:
            mu, sigma = film  # out = mu + y * sigma (pose_hrnet.py:531-537)
            feats = mu[:, None, None, :] + feats * sigma[:, None, None, :]
        k = self.spec.final_conv_kernel
        out = nn.Conv(self.spec.num_joints, (k, k), padding=((k // 2, k // 2),) * 2,
                      use_bias=True, kernel_init=KERNEL_INIT, name="final_layer",
                      dtype=self.dtype)(feats)
        return out


def remat_mode(cfg, is_train: bool) -> str:
    """'' (off), 'stem', 'blocks', or 'modules' — the in-model remat
    granularity.  'forward' (legacy whole-forward jax.checkpoint, handled in
    train/state.py) maps to '' here.  Unknown strings raise: a typo'd mode
    would otherwise silently degrade to the whole-forward fallback that
    cannot lower the HRNet peak (PERF.md) and OOM exactly like remat-off."""
    if not (bool(is_train) and bool(getattr(cfg.TPU, "REMAT", False))):
        return ""
    mode = str(getattr(cfg.TPU, "REMAT_MODE", "modules"))
    if mode not in ("stem", "blocks", "modules", "forward"):
        raise ValueError(
            f"TPU.REMAT_MODE={mode!r}: expected one of "
            "'modules', 'stem', 'blocks', 'forward'")
    return mode if mode != "forward" else ""


def get_pose_net(cfg, is_train: bool = False, dtype=None) -> PoseHRNet:
    return PoseHRNet(spec=HRNetSpec.from_cfg(cfg), dtype=dtype,
                     remat=remat_mode(cfg, is_train))
