"""Eval-time exact fusion of the BUCTD preNet stems (models/hrnet.py::PreNet,
models/resnet.py::ResNetPreNet -> models/hrnet.py::FusedPreNet).

At eval every PreNet op is linear: conv -> BN(affine) -> conv -> BN, plus a
parallel conv -> BN on the condition, summed (reference pose_hrnet.py:431-458,
pose_resnet.py:160-171 — no activations inside the stems).  So:

  * each BatchNorm folds into the preceding conv:  BN(conv(x, K) + c)
    == conv(x, K * a) + (c * a + b)  with  a = scale / sqrt(var + eps),
    b = bias - a * mean;
  * the two parallel 7x7 convs (rgb-path 64->3 and cond-path 3->3, same
    stride/padding) merge into one 7x7 conv over 67 concatenated channels:
    conv(u, Ku) + conv(v, Kv) == conv(concat(u, v), concat(Ku, Kv)).

The result is exact up to float reassociation (the affine is computed in f64
here, once, on the host; it is *more* accurate than the bf16 BN it replaces).
This is a variables+model transform applied after checkpoint load — training
and the converter always see the canonical PreNet tree.
"""

from __future__ import annotations

import numpy as np

from .hrnet import BN_EPS

_PRENET = "_prenet"
_FUSED = "_prenet_fused"


def _bn_affine(bn_params, bn_stats):
    """BN at eval is y = a*x + b per channel."""
    a = (np.asarray(bn_params["scale"], np.float64)
         / np.sqrt(np.asarray(bn_stats["var"], np.float64) + BN_EPS))
    b = np.asarray(bn_params["bias"], np.float64) - a * np.asarray(
        bn_stats["mean"], np.float64)
    return a, b


def _fold(conv_tree, bn_params, bn_stats):
    """Fold a following BN into (kernel, bias); kernel is HWIO so the affine
    broadcasts over the last (output-channel) axis."""
    a, b = _bn_affine(bn_params, bn_stats)
    k = np.asarray(conv_tree["kernel"], np.float64) * a
    c = np.asarray(conv_tree["bias"], np.float64) * a + b
    return k, c


def fuse_prenet_variables(variables):
    """Rewrite params/batch_stats['_prenet'] into params['_prenet_fused'].

    Works for both PreNet layouts (HRNet k3 rgb stem, pose_resnet k7) — the
    subtree key names are identical; the kernel shapes carry the difference.
    """
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    pn = params.pop(_PRENET)
    sn = stats.pop(_PRENET)

    ka, ca = _fold(pn["rgb_preNet.0"], pn["rgb_preNet.1"], sn["rgb_preNet.1"])
    k2, c2 = _fold(pn["rgb_preNet.2"], pn["rgb_preNet.3"], sn["rgb_preNet.3"])
    kc, cc = _fold(pn["cond_preNet.0"], pn["cond_preNet.1"], sn["cond_preNet.1"])
    kb = np.concatenate([k2, kc], axis=2)  # (7,7,64,3)+(7,7,3,3) -> (7,7,67,3)
    cb = c2 + cc

    params[_FUSED] = {
        "a": {"kernel": ka.astype(np.float32), "bias": ca.astype(np.float32)},
        "b": {"kernel": kb.astype(np.float32), "bias": cb.astype(np.float32)},
    }
    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = stats
    return out


def maybe_fuse_prenet(cfg, model, variables):
    """(model, variables) -> fused pair when TPU.FUSED_PRENET allows and the
    model actually carries a preNet; identity otherwise.  Call after checkpoint
    load, before replicate/jit.  'auto' (default) == fuse at eval."""
    knob = str(getattr(cfg.TPU, "FUSED_PRENET", "auto")).lower()
    if knob in ("off", "false", "0", "none"):
        return model, variables
    if not getattr(getattr(model, "spec", None), "use_pre_net", False):
        return model, variables
    if getattr(model, "fused_prenet", False):
        return model, variables
    if _PRENET not in variables.get("params", {}):
        return model, variables
    return model.clone(fused_prenet=True), fuse_prenet_variables(variables)
