"""Golden differential fuzz: core/loss.py vs the reference's own core/loss.py.

tests/test_train.py checks joints_mse_loss against a REBUILT torch formula;
this suite imports /root/reference/lib/core/loss.py itself (torch CPU; needs
utils.gaussian on sys.path for JointsExpectationLoss's unused smoother) and
fuzzes all four losses on random heatmaps/weights, both with and without
target weighting.

Layouts: ours NHWC (B, h, w, J) + (B, J) weights; the reference NCHW +
(B, J, 1) weights.
"""

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from buctd_tpu.core.loss import (joints_expectation_loss,
                                 joints_lambda_mse_loss, joints_mse_loss,
                                 joints_ohkm_mse_loss)

B, J, H, W = 4, 17, 24, 18


@pytest.fixture(scope="module")
def ref():
    if "/root/reference/lib" not in sys.path:
        sys.path.insert(0, "/root/reference/lib")
    spec = importlib.util.spec_from_file_location(
        "ref_core_loss", "/root/reference/lib/core/loss.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_core_loss"] = mod
    spec.loader.exec_module(mod)
    return mod


def _random_batch(rng):
    pred = rng.randn(B, H, W, J).astype(np.float32)
    tgt = (rng.rand(B, H, W, J) ** 3).astype(np.float32)
    wgt = (rng.rand(B, J) > 0.3).astype(np.float32)
    return pred, tgt, wgt


def _torch_args(pred, tgt, wgt):
    return (torch.from_numpy(pred.transpose(0, 3, 1, 2)),
            torch.from_numpy(tgt.transpose(0, 3, 1, 2)),
            torch.from_numpy(wgt[:, :, None]))


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("use_w", [True, False])
def test_joints_mse_loss_golden(ref, seed, use_w):
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    pred, tgt, wgt = _random_batch(rng)
    p, t, w = _torch_args(pred, tgt, wgt)
    want = float(ref.JointsMSELoss(use_target_weight=use_w)(p, t, w))
    got = float(joints_mse_loss(jnp.array(pred), jnp.array(tgt),
                                jnp.array(wgt), use_target_weight=use_w))
    assert got == pytest.approx(want, rel=1e-5)


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("use_w", [True, False])
def test_joints_lambda_mse_loss_golden(ref, seed, use_w):
    import jax.numpy as jnp

    rng = np.random.RandomState(100 + seed)
    pred, tgt, wgt = _random_batch(rng)
    p, t, w = _torch_args(pred, tgt, wgt)
    want = ref.JointsLambdaMSELoss(use_target_weight=use_w)(p, t, w).numpy()
    got = np.asarray(joints_lambda_mse_loss(
        jnp.array(pred), jnp.array(tgt), jnp.array(wgt),
        use_target_weight=use_w))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("topk", [4, 8])
def test_joints_ohkm_mse_loss_golden(ref, seed, topk):
    import jax.numpy as jnp

    rng = np.random.RandomState(200 + seed)
    pred, tgt, wgt = _random_batch(rng)
    p, t, w = _torch_args(pred, tgt, wgt)
    want = float(ref.JointsOHKMMSELoss(use_target_weight=True, topk=topk)(
        p, t, w))
    got = float(joints_ohkm_mse_loss(jnp.array(pred), jnp.array(tgt),
                                     jnp.array(wgt), topk=topk))
    assert got == pytest.approx(want, rel=1e-5)


@pytest.mark.parametrize("seed", range(4))
def test_gaussian_smoothing_golden(ref, seed):
    """utils/gaussian.py vs the reference's depthwise-conv2d module: the
    reference convolves VALID (its call sites reflect-pad by kernel//2 first,
    reference loss.py:80 commented form), ours pads reflect internally — so
    compare ours(x) against ref(F.pad(x, reflect))."""
    del ref
    import importlib.util as ilu

    import torch.nn.functional as F

    from buctd_tpu.utils.gaussian import GaussianSmoothing

    spec = ilu.spec_from_file_location(
        "ref_gaussian", "/root/reference/lib/utils/gaussian.py")
    mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.RandomState(400 + seed)
    x = rng.rand(B, H, W, J).astype(np.float32)
    ref_sm = mod.GaussianSmoothing(channels=J, kernel_size=11, sigma=6)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = ref_sm(F.pad(xt, (5, 5, 5, 5), mode="reflect")).numpy()
    got = np.asarray(GaussianSmoothing(channels=J, kernel_size=11, sigma=6)(
        x)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("seed", range(6))
def test_joints_expectation_loss_golden(ref, seed):
    import jax.numpy as jnp

    rng = np.random.RandomState(300 + seed)
    pred = (rng.rand(B, H, W, J) ** 3).astype(np.float32)
    joints = np.stack([rng.rand(B, J) * (W - 1),
                       rng.rand(B, J) * (H - 1)], axis=-1).astype(np.float32)
    wgt = (rng.rand(B, J) > 0.3).astype(np.float32)

    crit = ref.JointsExpectationLoss()

    # the reference's forward is CUDA-only as written: output.get_device()
    # returns -1 on CPU and torch.arange(...).to(-1) raises — hand it a
    # tensor whose get_device() reports a real CPU device instead
    class _CpuT(torch.Tensor):
        def get_device(self):
            return torch.device("cpu")

    want = float(crit(
        torch.from_numpy(pred.transpose(0, 3, 1, 2)).as_subclass(_CpuT),
        torch.from_numpy(joints),
        torch.from_numpy(wgt[:, :, None])))
    got = float(joints_expectation_loss(jnp.array(pred), jnp.array(joints),
                                        jnp.array(wgt)))
    assert got == pytest.approx(want, rel=1e-4)
