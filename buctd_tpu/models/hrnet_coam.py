"""BUCTD-CoAM: HRNet trunk + per-stage conditional cross-attention injection.

Mirrors lib/models/pose_hrnet_coam.py:488-572: the input splits into RGB ([..., :3],
fed to the stem) and the condition heatmap ([..., 3:]); CoAM blocks run right after
transitions 1/2/3 and after stage4, gated by MODEL.ATT_MODULES.  Self-attention twins
are gated by MODEL.SELFATT_MODULES (mutually exclusive per stage, :354-357) but are
parameter-only: the reference forward never calls them (see the tap comment below).

Unlike the reference (which duplicates all HRNet classes), the trunk is shared with
pose_hrnet via HRNetTrunk taps.
"""

from __future__ import annotations

import dataclasses
from typing import Any

from flax import linen as nn

from .coam import CoAMBlock, SelfAttentionModule
from .hrnet import HRNetSpec, HRNetTrunk, KERNEL_INIT


@dataclasses.dataclass(frozen=True)
class CoAMSpec:
    att_modules: tuple       # 4 bools: CoAM after transition1/2/3 + after stage4
    selfatt_modules: tuple   # 4 bools
    d_cond: int              # J if stacked, 3 if colored, else 1
    n_heads: int
    channel_only: bool

    @staticmethod
    def from_cfg(cfg) -> "CoAMSpec":
        if cfg.DATASET.STACKED_CONDITION:
            d_cond = int(cfg.MODEL.NUM_JOINTS)
        elif cfg.DATASET.COLORED:
            d_cond = 3
        else:
            d_cond = 1
        att = tuple(bool(b) for b in cfg.MODEL.ATT_MODULES)
        satt = tuple(bool(b) for b in cfg.MODEL.SELFATT_MODULES)
        for a, s in zip(att, satt):
            assert not (a and s), "ATT_MODULES and SELFATT_MODULES are mutually exclusive"
        return CoAMSpec(att_modules=att, selfatt_modules=satt, d_cond=d_cond,
                        n_heads=int(cfg.MODEL.ATTENTION_HEADS),
                        channel_only=bool(cfg.MODEL.ATT_CHANNEL_ONLY))


class PoseHRNetCoAM(nn.Module):
    spec: HRNetSpec
    coam: CoAMSpec
    dtype: Any = None
    remat: str = ""

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.shape[-1] > 3, "CoAM requires RGB + condition channels"
        rgb, cond_hm = x[..., :3], x[..., 3:]

        # branch channel lists seen by each injection point (pose_hrnet_coam.py:359-379)
        stage_channels = [
            self.spec.stage2.num_channels,           # after transition1 (2 branches)
            self.spec.stage3.num_channels,           # after transition2 (3 branches)
            self.spec.stage4.num_channels,           # after transition3 (4 branches)
            (self.spec.stage4.num_channels[0],),     # after stage4 (single fused branch)
        ]

        # hooks construct their CoAM modules lazily INSIDE the trunk's compact scope,
        # so parameters land under _trunk/stageN_att (the converter drops "_trunk")
        coam_spec, dt = self.coam, self.dtype
        taps = []
        for s in range(4):
            chans = stage_channels[s]
            if coam_spec.att_modules[s]:
                def tap(ys, cond, tr, s=s, chans=chans):
                    return CoAMBlock(
                        channel_list=chans, d_cond=coam_spec.d_cond,
                        n_heads=coam_spec.n_heads, channel_only=coam_spec.channel_only,
                        name=f"stage{s + 1}_att", dtype=dt)(ys, cond, train=tr)
                taps.append(tap)
            elif coam_spec.selfatt_modules[s]:
                # Reference quirk (pose_hrnet_coam.py:521-562): every injection site
                # is gated on ATT_MODULES[s] ONLY, so a SelfAttentionModule built from
                # SELFATT_MODULES is constructed but NEVER called in forward (the
                # asserts at :354-357 forbid both flags per stage).  We instantiate it
                # so the param tree / checkpoint layout matches, discard its output
                # (XLA dead-code-eliminates the compute under jit), and pass ys through.
                def tap(ys, cond, tr, s=s, chans=chans):
                    del cond
                    SelfAttentionModule(
                        channel_list=chans, name=f"stage{s + 1}_att", dtype=dt)(
                        ys, train=tr)
                    return ys
                taps.append(tap)
            else:
                taps.append(None)

        ys = HRNetTrunk(spec=self.spec, name="_trunk", dtype=self.dtype,
                        remat=self.remat)(
            rgb, train=train, taps=tuple(taps), tap_arg=cond_hm)
        k = self.spec.final_conv_kernel
        out = nn.Conv(self.spec.num_joints, (k, k), padding=((k // 2, k // 2),) * 2,
                      use_bias=True, kernel_init=KERNEL_INIT, name="final_layer",
                      dtype=self.dtype)(ys[0])
        return out


def get_pose_net(cfg, is_train: bool = False, dtype=None) -> PoseHRNetCoAM:
    from .hrnet import remat_mode

    return PoseHRNetCoAM(spec=HRNetSpec.from_cfg(cfg), coam=CoAMSpec.from_cfg(cfg),
                         dtype=dtype, remat=remat_mode(cfg, is_train))
