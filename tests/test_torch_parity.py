"""Golden parity: our flax models vs the reference torch models with converted weights.

The reference model files are pure torch and importable; we build them with our CfgNode
(attribute+dict access compatible), convert their randomly-initialized state_dicts into
our flax trees, and require matching outputs on the same inputs.  This is the test that
locks architecture + converter fidelity for the <=0.3 AP target (BASELINE.md).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference/lib")

# torchvision isn't installed; the reference only uses TF.resize (bilinear,
# align_corners=False, antialias off) in the CoAM blocks — provide that.
if "torchvision" not in sys.modules:
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    tf = types.ModuleType("torchvision.transforms.functional")

    def _resize(img, size, *a, **k):
        import torch.nn.functional as F
        return F.interpolate(img, size=list(size), mode="bilinear", align_corners=False)

    tf.resize = _resize
    tr.functional = tf
    tv.transforms = tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
    sys.modules["torchvision.transforms.functional"] = tf

from buctd_tpu.config import default_config, update_config
from buctd_tpu.convert import torch_to_flax

# reference forward calls .cuda() in the preNet branch (pose_hrnet.py:453); CPU-safe it
torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self


def _cfg(yaml_name="w32_384x288_adam_lr1e-3.yaml", opts=()):
    cfg = default_config()
    args = types.SimpleNamespace(
        cfg=f"/root/reference/experiments/coco/hrnet/{yaml_name}",
        opts=list(opts), modelDir="", logDir="", dataDir="")
    update_config(cfg, args)
    return cfg


def _compare(torch_model, flax_model, x_nchw, rtol=2e-3, atol=1e-6, train=False):
    import jax

    torch_model.eval()
    with torch.no_grad():
        want = torch_model(torch.from_numpy(x_nchw)).numpy()

    x_nhwc = np.transpose(x_nchw, (0, 2, 3, 1))
    template = flax_model.init(jax.random.PRNGKey(0), x_nhwc, train=False)
    variables = torch_to_flax(torch_model.state_dict(), template)
    got = np.asarray(flax_model.apply(variables, x_nhwc, train=False))
    got = np.transpose(got, (0, 3, 1, 2))

    scale = np.abs(want).max() + 1e-12
    err = np.abs(got - want).max() / scale
    assert err < rtol, f"relative output mismatch {err:.2e} (scale {scale:.2e})"
    return got, want


def test_pose_hrnet_w32_parity():
    cfg = _cfg()
    import models.pose_hrnet as ref_hrnet
    from buctd_tpu.models.hrnet import get_pose_net

    torch_model = ref_hrnet.get_pose_net(cfg, is_train=False)
    flax_model = get_pose_net(cfg)
    x = np.random.RandomState(0).randn(2, 3, 128, 96).astype(np.float32)
    _compare(torch_model, flax_model, x)


def test_pose_hrnet_prenet_parity():
    cfg = _cfg(opts=["MODEL.EXTRA.USE_PRE_NET", "True",
                     "MODEL.CONDITIONAL_TOPDOWN", "True"])
    import models.pose_hrnet as ref_hrnet
    from buctd_tpu.models.hrnet import get_pose_net

    torch_model = ref_hrnet.get_pose_net(cfg, is_train=False)
    flax_model = get_pose_net(cfg)
    x = np.random.RandomState(1).randn(2, 6, 64, 64).astype(np.float32)
    _compare(torch_model, flax_model, x)
