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

    class _Normalize:  # lib/utils/utils.py:92 uses it as a default arg
        def __init__(self, mean, std):
            self.mean, self.std = mean, std

        def __call__(self, t):
            mean = torch.tensor(self.mean)[:, None, None]
            std = torch.tensor(self.std)[:, None, None]
            return (t - mean) / std

    tf.resize = _resize
    tr.functional = tf
    tr.Normalize = _Normalize
    tr.Compose = lambda fs: (lambda x: [x := f(x) for f in fs][-1])
    tv.transforms = tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
    sys.modules["torchvision.transforms.functional"] = tf

from buctd_tpu.config import default_config, update_config
from buctd_tpu.convert import torch_to_flax

# reference forward calls .cuda() in the preNet branch (pose_hrnet.py:453); CPU-safe it
torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self


@pytest.fixture(autouse=True)
def _seed_torch():
    # The reference models are built with random init; an unseeded torch RNG made
    # parity errors vary run-to-run (which is how the dead-selfatt bug hid at ~2e-3).
    torch.manual_seed(0)


def _cfg(yaml_name="w32_384x288_adam_lr1e-3.yaml", opts=()):
    cfg = default_config()
    args = types.SimpleNamespace(
        cfg=f"/root/reference/experiments/coco/hrnet/{yaml_name}",
        opts=list(opts), modelDir="", logDir="", dataDir="")
    update_config(cfg, args)
    return cfg


def _compare(torch_model, flax_model, x_nchw, rtol=2e-3, atol=1e-6, train=False,
             key_map=None, ignore=()):
    import jax

    torch_model.eval()
    with torch.no_grad():
        want = torch_model(torch.from_numpy(x_nchw)).numpy()

    x_nhwc = np.transpose(x_nchw, (0, 2, 3, 1))
    template = flax_model.init(jax.random.PRNGKey(0), x_nhwc, train=False)
    variables = torch_to_flax(torch_model.state_dict(), template,
                              key_map=key_map, ignore=ignore)
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


def test_pose_hrnet_coam_parity():
    # flagship BUCTD-CoAM config (scripts/train/train_BUCTD_COAM.sh)
    cfg = _cfg(opts=["MODEL.NAME", "pose_hrnet_coam",
                     "MODEL.EXTRA.USE_ATTENTION", "True",
                     "MODEL.ATT_MODULES", "[False, True, False, False]",
                     "MODEL.ATT_CHANNEL_ONLY", "False",
                     "MODEL.ATTENTION_HEADS", "1",
                     "MODEL.CONDITIONAL_TOPDOWN", "True",
                     "DATASET.COLORED", "True",
                     # small input so the resolution-specific attention is cheap
                     "MODEL.IMAGE_SIZE", "[96, 128]"])
    import models.pose_hrnet_coam as ref_coam
    from buctd_tpu.models.hrnet_coam import get_pose_net

    torch_model = ref_coam.get_pose_net(cfg, is_train=False)
    flax_model = get_pose_net(cfg)
    x = np.random.RandomState(2).randn(2, 6, 128, 96).astype(np.float32)
    # make the condition channels heatmap-like (nonnegative, sparse-ish)
    x[:, 3:] = np.abs(x[:, 3:]) * 10
    _compare(torch_model, flax_model, x)


def test_pose_hrnet_coam_channel_only_and_selfatt_parity():
    cfg = _cfg(opts=["MODEL.NAME", "pose_hrnet_coam",
                     "MODEL.EXTRA.USE_ATTENTION", "True",
                     "MODEL.ATT_MODULES", "[False, True, False, False]",
                     "MODEL.ATT_CHANNEL_ONLY", "True",
                     "MODEL.SELFATT_MODULES", "[False, False, True, False]",
                     "MODEL.CONDITIONAL_TOPDOWN", "True",
                     "DATASET.COLORED", "True",
                     "MODEL.IMAGE_SIZE", "[64, 64]"])
    import models.pose_hrnet_coam as ref_coam
    from buctd_tpu.models.hrnet_coam import get_pose_net

    torch_model = ref_coam.get_pose_net(cfg, is_train=False)
    flax_model = get_pose_net(cfg)
    x = np.random.RandomState(3).randn(1, 6, 64, 64).astype(np.float32)
    x[:, 3:] = np.abs(x[:, 3:]) * 10
    _compare(torch_model, flax_model, x)


def test_transpose_h_parity():
    cfg = _cfg(opts=["MODEL.NAME", "transpose_h",
                     "MODEL.EXTRA.USE_ATTENTION", "True",
                     "MODEL.CONDITIONAL_TOPDOWN", "True",
                     "MODEL.DIM_MODEL", "96",
                     "MODEL.DIM_FEEDFORWARD", "192",
                     "MODEL.N_HEAD", "2",
                     "MODEL.ENCODER_LAYERS", "3",
                     "MODEL.POS_EMBEDDING", "sine",
                     "DATASET.COLORED", "True",
                     "MODEL.IMAGE_SIZE", "[96, 128]",
                     # trim stage3 so the test stays fast
                     "MODEL.EXTRA.STAGE3.NUM_MODULES", "1"])
    import models.transpose_h as ref_tp
    from buctd_tpu.models.transpose import get_pose_net
    from buctd_tpu.models import converter_options

    torch_model = ref_tp.get_pose_net(cfg, is_train=False)
    flax_model = get_pose_net(cfg)
    x = np.random.RandomState(4).randn(2, 6, 128, 96).astype(np.float32)
    x[:, 3:] = np.abs(x[:, 3:]) * 10
    _compare(torch_model, flax_model, x, **converter_options("transpose_h"))


def test_pose_resnet_parity():
    cfg = _cfg(opts=["MODEL.NAME", "pose_resnet",
                     "MODEL.EXTRA.NUM_LAYERS", "50",
                     "MODEL.EXTRA.NUM_DECONV_LAYERS", "3",
                     "MODEL.EXTRA.NUM_DECONV_FILTERS", "[256, 256, 256]",
                     "MODEL.EXTRA.NUM_DECONV_KERNELS", "[4, 4, 4]",
                     "MODEL.EXTRA.DECONV_WITH_BIAS", "False",
                     "MODEL.EXTRA.USE_PRE_NET", "True",
                     "MODEL.CONDITIONAL_TOPDOWN", "True"])
    import models.pose_resnet as ref_rn
    from buctd_tpu.models.resnet import get_pose_net

    torch_model = ref_rn.get_pose_net(cfg, is_train=False)
    flax_model = get_pose_net(cfg)
    x = np.random.RandomState(5).randn(1, 6, 64, 64).astype(np.float32)
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


def test_pose_hrnet_prenet_fused_parity():
    """The eval-time fused preNet (models/fuse.py) must match the TORCH
    reference directly, with non-trivial BN running stats (fresh-init stats are
    mean=0/var=1, which would hide folding bugs)."""
    import jax

    from buctd_tpu.models.fuse import maybe_fuse_prenet

    cfg = _cfg(opts=["MODEL.EXTRA.USE_PRE_NET", "True",
                     "MODEL.CONDITIONAL_TOPDOWN", "True",
                     "TPU.FUSED_PRENET", "auto"])  # opt-in since round 4
    import models.pose_hrnet as ref_hrnet
    from buctd_tpu.models.hrnet import get_pose_net

    torch_model = ref_hrnet.get_pose_net(cfg, is_train=False)
    with torch.no_grad():
        for m in torch_model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)
    torch_model.eval()

    x = np.random.RandomState(7).randn(2, 6, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = torch_model(torch.from_numpy(x)).numpy()

    flax_model = get_pose_net(cfg)
    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    template = flax_model.init(jax.random.PRNGKey(0), x_nhwc, train=False)
    variables = torch_to_flax(torch_model.state_dict(), template)
    fused_model, fused_vars = maybe_fuse_prenet(cfg, flax_model, variables)
    assert fused_model.fused_prenet
    got = np.transpose(
        np.asarray(fused_model.apply(fused_vars, x_nhwc, train=False)),
        (0, 3, 1, 2))
    scale = np.abs(want).max() + 1e-12
    err = np.abs(got - want).max() / scale
    assert err < 2e-3, f"fused preNet vs torch mismatch {err:.2e}"


def test_forward_lamda_and_feature_parity():
    """forward_lamda (FiLM modulation, pose_hrnet.py:497-540) and forward_feature
    (:542-576) vs our film=/return_features= call-time options."""
    import jax
    import numpy as np

    cfg = _cfg()
    import models.pose_hrnet as ref_hrnet
    from buctd_tpu.models.hrnet import get_pose_net
    from buctd_tpu.convert import torch_to_flax

    torch_model = ref_hrnet.get_pose_net(cfg, is_train=False)
    torch_model.eval()
    flax_model = get_pose_net(cfg)
    x = np.random.RandomState(4).randn(2, 3, 128, 96).astype(np.float32)
    C = 32  # width of the finest stage-4 branch
    mu = np.random.RandomState(5).randn(2, C).astype(np.float32)
    sigma = np.random.RandomState(6).randn(2, C).astype(np.float32)

    with torch.no_grad():
        want_lam = torch_model.forward_lamda(
            torch.from_numpy(x), torch.from_numpy(mu), torch.from_numpy(sigma)).numpy()
        want_feat = torch_model.forward_feature(torch.from_numpy(x)).numpy()

    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    template = flax_model.init(jax.random.PRNGKey(0), x_nhwc, train=False)
    variables = torch_to_flax(torch_model.state_dict(), template)
    got_lam = np.transpose(np.asarray(flax_model.apply(
        variables, x_nhwc, train=False, film=(mu, sigma))), (0, 3, 1, 2))
    got_feat = np.transpose(np.asarray(flax_model.apply(
        variables, x_nhwc, train=False, return_features=True)), (0, 3, 1, 2))

    for got, want in ((got_lam, want_lam), (got_feat, want_feat)):
        scale = np.abs(want).max() + 1e-12
        assert np.abs(got - want).max() / scale < 2e-3


def test_pretrained_subset_loading():
    """init_weights-style subset warm start (pose_hrnet.py:596-614): listed layers
    load from the checkpoint, everything else keeps its fresh initialization."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from buctd_tpu.convert import load_pretrained_subset
    from buctd_tpu.models.hrnet import get_pose_net

    cfg = _cfg(opts=["MODEL.IMAGE_SIZE", "[96, 128]",
                     "MODEL.EXTRA.STAGE2.NUM_MODULES", "1",
                     "MODEL.EXTRA.STAGE3.NUM_MODULES", "1",
                     "MODEL.EXTRA.STAGE4.NUM_MODULES", "1"])
    import models.pose_hrnet as ref_hrnet
    torch_model = ref_hrnet.get_pose_net(cfg, is_train=False)
    sd = torch_model.state_dict()

    flax_model = get_pose_net(cfg)
    fresh = flax_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 96, 3)),
                            train=False)
    loaded = load_pretrained_subset(fresh, sd,
                                    pretrained_layers=["conv1", "bn1", "layer1"])

    # conv1 came from torch (OIHW -> HWIO); params nest under the trunk module
    want = sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["_trunk"]["conv1"]["kernel"]), want, atol=1e-6)
    # final_layer untouched (not in the list)
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["final_layer"]["kernel"]),
        np.asarray(fresh["params"]["final_layer"]["kernel"]), atol=0)
    # conv2 untouched too
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["_trunk"]["conv2"]["kernel"]),
        np.asarray(fresh["params"]["_trunk"]["conv2"]["kernel"]), atol=0)
    # wildcard loads everything
    all_loaded = load_pretrained_subset(fresh, sd, pretrained_layers=["*"])
    want_fl = sd["final_layer.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(
        np.asarray(all_loaded["params"]["final_layer"]["kernel"]), want_fl,
        atol=1e-6)
