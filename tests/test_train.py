"""Training-layer tests: loss parity vs torch, sharded train step on an 8-device CPU
mesh, LR schedule, checkpoint round-trip."""

import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from buctd_tpu.config import default_config, update_config
from buctd_tpu.core.loss import joints_mse_loss, joints_ohkm_mse_loss
from buctd_tpu.core.metrics import pck_accuracy


def _small_cfg(opts=()):
    cfg = default_config()
    args = types.SimpleNamespace(
        cfg="/root/reference/experiments/coco/hrnet/w32_384x288_adam_lr1e-3.yaml",
        opts=list(opts), modelDir="", logDir="", dataDir="")
    update_config(cfg, args)
    return cfg


def test_joints_mse_loss_matches_torch():
    torch = pytest.importorskip("torch")
    B, h, w, J = 4, 16, 12, 17
    rng = np.random.RandomState(0)
    pred = rng.rand(B, h, w, J).astype(np.float32)
    tgt = rng.rand(B, h, w, J).astype(np.float32)
    wgt = (rng.rand(B, J) > 0.3).astype(np.float32)

    got = float(joints_mse_loss(jnp.array(pred), jnp.array(tgt), jnp.array(wgt)))

    # torch reference semantics (loss.py:17-41)
    crit = torch.nn.MSELoss(reduction="mean")
    p = torch.from_numpy(pred.transpose(0, 3, 1, 2)).reshape(B, J, -1)
    t = torch.from_numpy(tgt.transpose(0, 3, 1, 2)).reshape(B, J, -1)
    tw = torch.from_numpy(wgt)[:, :, None]
    want = 0.0
    for j in range(J):
        want += 0.5 * crit(p[:, j] * tw[:, j], t[:, j] * tw[:, j])
    want = float(want / J)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ohkm_loss_selects_hard_joints():
    B, h, w, J = 2, 8, 8, 17
    pred = np.zeros((B, h, w, J), np.float32)
    tgt = np.zeros((B, h, w, J), np.float32)
    tgt[..., 0] = 1.0  # joint 0 is hard
    wgt = np.ones((B, J), np.float32)
    full = float(joints_mse_loss(jnp.array(pred), jnp.array(tgt), jnp.array(wgt)))
    ohkm = float(joints_ohkm_mse_loss(jnp.array(pred), jnp.array(tgt), jnp.array(wgt), topk=1))
    assert ohkm > full  # mining concentrates on the hard joint


def test_pck_accuracy_perfect_and_shifted():
    from buctd_tpu.ops import generate_target
    J = 17
    joints = np.random.RandomState(1).rand(2, J, 2).astype(np.float32) * [280, 370] + 4
    vis = np.ones((2, J))
    tgt, _ = generate_target(jnp.array(joints), jnp.array(vis), (288, 384), (72, 96), 3)
    acc, cnt, _ = pck_accuracy(tgt, tgt)
    assert float(acc) == 1.0
    # heavily shifted predictions -> low accuracy
    shifted, _ = generate_target(jnp.array(joints + 150), jnp.array(vis),
                                 (288, 384), (72, 96), 3)
    acc2, _, _ = pck_accuracy(shifted, tgt)
    assert float(acc2) < 0.3


def test_lr_schedule_multistep():
    from buctd_tpu.train.state import make_lr_schedule
    cfg = _small_cfg()  # LR=1e-3, steps [170, 200], factor 0.1
    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(170 * 10)) == pytest.approx(1e-4)
    assert float(sched(200 * 10 + 5)) == pytest.approx(1e-5)


def test_sharded_train_step_runs_and_learns():
    from buctd_tpu.models import get_model
    from buctd_tpu.parallel import make_mesh, shard_batch, replicate
    from buctd_tpu.train.state import create_train_state, make_train_step

    cfg = _small_cfg([
        "MODEL.IMAGE_SIZE", "[64, 64]", "MODEL.HEATMAP_SIZE", "[16, 16]",
        # tiny net: 1 module everywhere
        "MODEL.EXTRA.STAGE2.NUM_MODULES", "1",
        "MODEL.EXTRA.STAGE3.NUM_MODULES", "1",
        "MODEL.EXTRA.STAGE4.NUM_MODULES", "1",
        "TRAIN.LR", "0.001",
    ])
    assert len(jax.devices()) == 8, "expected virtual 8-device CPU mesh"
    mesh = make_mesh(cfg)
    model = get_model(cfg)

    B = 16
    rng = np.random.RandomState(0)
    from buctd_tpu.ops import generate_target
    joints = rng.rand(B, 17, 2).astype(np.float32) * 56 + 4
    tgt, _ = generate_target(jnp.array(joints), jnp.ones((B, 17)), (64, 64), (16, 16), 2)
    batch = {
        "input": rng.rand(B, 64, 64, 3).astype(np.float32),
        "target": np.asarray(tgt).transpose(0, 2, 3, 1),
        "target_weight": np.ones((B, 17), np.float32),
    }
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), steps_per_epoch=10)
    state = replicate(state, mesh)
    sb = shard_batch(batch, mesh)
    step = make_train_step(cfg, model, mesh)
    d_rng = jax.random.PRNGKey(1)

    losses = []
    for i in range(10):
        state, metrics = step(state, sb, d_rng)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 10
    # skip step 0 (pre-update loss); training on a fixed batch must reduce loss
    assert losses[-1] < losses[1], f"loss did not decrease: {losses}"


def test_grad_accumulation_matches_single_step():
    """TRAIN.GRAD_ACCUM_STEPS=k (optax.MultiSteps): params frozen for k-1
    micro-steps, and — on the same repeated micro-batch, where the average of
    k identical grads IS the grad — the k-th update equals the k=1 update."""
    from buctd_tpu.models import get_model
    from buctd_tpu.train.state import create_train_state, make_train_step

    tiny = ["MODEL.IMAGE_SIZE", "[64, 64]", "MODEL.HEATMAP_SIZE", "[16, 16]",
            "MODEL.EXTRA.STAGE2.NUM_MODULES", "1",
            "MODEL.EXTRA.STAGE3.NUM_MODULES", "1",
            "MODEL.EXTRA.STAGE4.NUM_MODULES", "1"]
    rng = np.random.RandomState(0)
    B = 4
    from buctd_tpu.ops import generate_target
    joints = rng.rand(B, 17, 2).astype(np.float32) * 56 + 4
    tgt, _ = generate_target(jnp.array(joints), jnp.ones((B, 17)),
                             (64, 64), (16, 16), 2)
    batch = {
        "input": rng.rand(B, 64, 64, 3).astype(np.float32),
        "target": np.asarray(tgt).transpose(0, 2, 3, 1),
        "target_weight": np.ones((B, 17), np.float32),
    }
    d_rng = jax.random.PRNGKey(1)

    def run(k, n_micro):
        cfg = _small_cfg(tiny + ["TRAIN.GRAD_ACCUM_STEPS", str(k)])
        model = get_model(cfg)
        state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 64, 64, 3)), steps_per_epoch=10)
        # snapshot to host: the step donates its state argument, so device
        # buffers read after stepping would be invalidated/reused
        snap = lambda s: jax.tree.map(np.asarray, s.params)  # noqa: E731
        p0 = snap(state)
        step = make_train_step(cfg, model)
        params = []
        for _ in range(n_micro):
            state, _ = step(state, batch, d_rng)
            params.append(snap(state))
        return p0, params

    p0, (p1, p2) = run(2, 2)
    # micro-step 1 of 2: grads accumulated, params untouched
    assert all(np.array_equal(a, b) for a, b in
               zip(jax.tree.leaves(p0), jax.tree.leaves(p1)))
    # micro-step 2: update applied, equal to the k=1 single-step update
    _, (ref,) = run(1, 1)
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(ref)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_grad_accum_lr_schedule_counts_optimizer_steps():
    """LR milestones fire after e*steps_per_epoch OPTIMIZER steps; with k=4
    accumulation the schedule sees steps_per_epoch//4 per epoch."""
    from buctd_tpu.train.state import make_optimizer

    cfg = _small_cfg(["TRAIN.LR", "0.1", "TRAIN.LR_FACTOR", "0.1",
                      "TRAIN.LR_STEP", "[2, 3]",
                      "TRAIN.GRAD_ACCUM_STEPS", "4"])
    _, sched = make_optimizer(cfg, steps_per_epoch=40)  # 40 micro = 10 real
    assert float(sched(19)) == pytest.approx(0.1)       # epoch 1 (real steps)
    assert float(sched(20)) == pytest.approx(0.01)      # epoch-2 boundary
    assert float(sched(30)) == pytest.approx(0.001)     # epoch-3 boundary


@pytest.mark.parametrize("opt_opts", [
    [],                                                   # adam (reference default)
    ["TRAIN.OPTIMIZER", "sgd", "TRAIN.WD", "0.0001",
     "TRAIN.MOMENTUM", "0.9", "TRAIN.NESTEROV", "True"],  # sgd chain (uses params)
    ["TRAIN.GRAD_ACCUM_STEPS", "2"],                      # MultiSteps inside fusion
])
def test_fused_optimizer_matches_per_leaf(opt_opts):
    """TPU.FUSED_OPTIMIZER (state.py::_fused_flat) runs the update in flat-
    parameter space purely for speed (HRNet's ~1000 leaves); the trajectory
    must match the per-leaf optax form leaf-for-leaf."""
    from buctd_tpu.models import get_model
    from buctd_tpu.train.state import create_train_state, make_train_step

    tiny = ["MODEL.IMAGE_SIZE", "[64, 64]", "MODEL.HEATMAP_SIZE", "[16, 16]",
            "MODEL.EXTRA.STAGE2.NUM_MODULES", "1",
            "MODEL.EXTRA.STAGE3.NUM_MODULES", "1",
            "MODEL.EXTRA.STAGE4.NUM_MODULES", "1"]
    rng = np.random.RandomState(0)
    B = 2
    from buctd_tpu.ops import generate_target
    joints = rng.rand(B, 17, 2).astype(np.float32) * 56 + 4
    tgt, _ = generate_target(jnp.array(joints), jnp.ones((B, 17)),
                             (64, 64), (16, 16), 2)
    batch = {
        "input": rng.rand(B, 64, 64, 3).astype(np.float32),
        "target": np.asarray(tgt).transpose(0, 2, 3, 1),
        "target_weight": np.ones((B, 17), np.float32),
    }

    def run(fused):
        cfg = _small_cfg(tiny + opt_opts
                         + ["TPU.FUSED_OPTIMIZER", str(fused)])
        model = get_model(cfg)
        state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 64, 64, 3)), steps_per_epoch=10)
        step = make_train_step(cfg, model)
        for _ in range(3):
            state, _ = step(state, batch, jax.random.PRNGKey(1))
        return jax.tree.map(np.asarray, state.params)

    got, want = run(True), run(False)
    # rtol: flat-vs-per-leaf changes XLA's elementwise fusion shapes, and
    # adam's update is ~lr*sign(g) for near-zero grads — 1-ulp rounding
    # differences amplify chaotically over the 3 steps (same effect as the
    # adam note in test_distributed.py).  Observed: 3/590k elements past
    # 1e-6 after 3 steps.
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    from buctd_tpu.models import get_model
    from buctd_tpu.train.state import create_train_state
    from buctd_tpu.train.checkpoint import save_checkpoint, restore_checkpoint

    cfg = _small_cfg([
        "MODEL.IMAGE_SIZE", "[64, 64]", "MODEL.HEATMAP_SIZE", "[16, 16]",
        "MODEL.EXTRA.STAGE2.NUM_MODULES", "1",
        "MODEL.EXTRA.STAGE3.NUM_MODULES", "1",
        "MODEL.EXTRA.STAGE4.NUM_MODULES", "1",
        # accumulation on: the MultiStepsState wrapper must round-trip too
        "TRAIN.GRAD_ACCUM_STEPS", "2",
    ])
    model = get_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)))
    state = state.replace(step=state.step + 7)
    save_checkpoint(state, str(tmp_path), is_best=True, perf=12.3)

    fresh = create_train_state(cfg, model, jax.random.PRNGKey(1),
                               jnp.zeros((1, 64, 64, 3)))
    restored, found = restore_checkpoint(fresh, str(tmp_path))
    assert found
    assert int(restored.step) == 7
    k0 = jax.tree.leaves(state.params)[0]
    k1 = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))
    # missing dir -> found False
    _, found2 = restore_checkpoint(fresh, str(tmp_path / "nope"))
    assert not found2


def test_lambda_and_expectation_losses():
    from buctd_tpu.core.loss import joints_lambda_mse_loss, joints_expectation_loss
    B, h, w, J = 3, 8, 6, 17
    rng = np.random.RandomState(0)
    pred = rng.rand(B, h, w, J).astype(np.float32)
    tgt = rng.rand(B, h, w, J).astype(np.float32)
    wgt = np.ones((B, J), np.float32)
    per_sample = np.asarray(joints_lambda_mse_loss(jnp.array(pred), jnp.array(tgt), jnp.array(wgt)))
    assert per_sample.shape == (B,)
    # mean of the per-sample form == the scalar loss
    from buctd_tpu.core.loss import joints_mse_loss
    np.testing.assert_allclose(per_sample.mean(),
                               float(joints_mse_loss(jnp.array(pred), jnp.array(tgt), jnp.array(wgt))),
                               rtol=1e-6)
    gt_joints = rng.rand(B, J, 2).astype(np.float32) * [5, 7]
    le = float(joints_expectation_loss(jnp.array(pred), jnp.array(gt_joints), jnp.array(wgt)))
    assert np.isfinite(le) and le > 0


def test_gaussian_smoothing_matches_scipy_like():
    from buctd_tpu.utils.gaussian import GaussianSmoothing, gaussian_kernel1d
    import numpy as np
    sm = GaussianSmoothing(channels=2, kernel_size=11, sigma=6)
    x = np.zeros((1, 21, 21, 2), np.float32)
    x[0, 10, 10, :] = 1.0
    out = np.asarray(sm(jnp.array(x)))
    k = gaussian_kernel1d(11, 6)
    want = np.outer(k, k)
    np.testing.assert_allclose(out[0, 5:16, 5:16, 0], want, atol=1e-6)


def test_double_target_train_step():
    from buctd_tpu.models import get_model
    from buctd_tpu.train.state import create_train_state, make_train_step_double
    cfg = _small_cfg([
        "MODEL.IMAGE_SIZE", "[64, 64]", "MODEL.HEATMAP_SIZE", "[16, 16]",
        "MODEL.EXTRA.STAGE2.NUM_MODULES", "1",
        "MODEL.EXTRA.STAGE3.NUM_MODULES", "1",
        "MODEL.EXTRA.STAGE4.NUM_MODULES", "1",
    ])
    model = get_model(cfg)
    B = 2
    rng = np.random.RandomState(0)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)))
    batch = {
        "input": rng.rand(B, 64, 64, 3).astype(np.float32),
        "target_f": rng.rand(B, 16, 16, 17).astype(np.float32),
        "target_b": rng.rand(B, 16, 16, 17).astype(np.float32),
        "target_weight_f": np.ones((B, 17), np.float32),
        "target_weight_b": np.ones((B, 17), np.float32),
        "lambda_f": np.full((B,), 0.7, np.float32),
        "lambda_b": np.full((B,), 0.3, np.float32),
    }
    step = make_train_step_double(cfg, model)
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(state2.step) == 1 and np.isfinite(float(metrics["loss"]))


def _plain_batch(B=8, rng=None):
    rng = rng or np.random.RandomState(0)
    return {
        "input": rng.rand(B, 64, 64, 3).astype(np.float32),
        "target": rng.rand(B, 16, 16, 17).astype(np.float32),
        "target_weight": np.ones((B, 17), np.float32),
    }


def test_mixup_batch_oracle():
    """mixup = λ·x_f + (1-λ)·roll(x_f); targets are NOT mixed (train.py:205-214)."""
    from buctd_tpu.train.mixing import mixup_batch
    batch = _plain_batch()
    key = jax.random.PRNGKey(3)
    mixed = jax.jit(lambda k, b: mixup_batch(k, b, 1.0))(key, batch)
    lam = np.asarray(mixed["lambda_f"])
    assert ((lam > 0) & (lam < 1)).all()
    np.testing.assert_allclose(lam + np.asarray(mixed["lambda_b"]), 1.0, atol=1e-6)
    want = (lam[:, None, None, None] * batch["input"]
            + (1 - lam)[:, None, None, None] * np.roll(batch["input"], 1, axis=0))
    np.testing.assert_allclose(np.asarray(mixed["input"]), want, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(mixed["target_f"]), batch["target"])
    np.testing.assert_array_equal(np.asarray(mixed["target_b"]),
                                  np.roll(batch["target"], 1, axis=0))


def test_cutmix_batch_oracle():
    """cutmix pastes one axis-aligned box of the rolled neighbour; λ_b = exact
    pasted pixel fraction."""
    from buctd_tpu.train.mixing import cutmix_batch
    batch = _plain_batch()
    x_f, x_b = batch["input"], np.roll(batch["input"], 1, axis=0)
    mixed = jax.jit(lambda k, b: cutmix_batch(k, b, 1.0))(jax.random.PRNGKey(7), batch)
    out = np.asarray(mixed["input"])
    lam_b = np.asarray(mixed["lambda_b"])
    np.testing.assert_allclose(np.asarray(mixed["lambda_f"]) + lam_b, 1.0, atol=1e-6)
    for i in range(out.shape[0]):
        from_b = np.all(np.isclose(out[i], x_b[i]), axis=-1)  # (H, W) pasted mask
        from_f = np.all(np.isclose(out[i], x_f[i]), axis=-1)
        assert (from_b | from_f).all()  # every pixel comes from one of the two
        np.testing.assert_allclose(lam_b[i], from_b.mean(), atol=1e-2)
        ys, xs = np.where(from_b)
        if len(ys):  # pasted region is one solid axis-aligned rectangle
            assert from_b[ys.min():ys.max() + 1, xs.min():xs.max() + 1].all()


def test_mixed_train_step_learns_on_mesh():
    """cutmix step on the 8-device CPU mesh: runs, loss finite and decreasing
    (VERDICT item 3 acceptance)."""
    from buctd_tpu.models import get_model
    from buctd_tpu.parallel import make_mesh, replicate, shard_batch
    from buctd_tpu.train.state import create_train_state, make_train_step_mixed

    cfg = _small_cfg([
        "MODEL.IMAGE_SIZE", "[64, 64]", "MODEL.HEATMAP_SIZE", "[16, 16]",
        "MODEL.EXTRA.STAGE2.NUM_MODULES", "1",
        "MODEL.EXTRA.STAGE3.NUM_MODULES", "1",
        "MODEL.EXTRA.STAGE4.NUM_MODULES", "1",
        "TRAIN.MIX", "cutmix", "TRAIN.MIX_ALPHA", "1.0",
    ])
    mesh = make_mesh(cfg)
    model = get_model(cfg)
    rng = np.random.RandomState(0)
    from buctd_tpu.ops import generate_target
    B = 16
    joints = rng.rand(B, 17, 2).astype(np.float32) * 56 + 4
    tgt, _ = generate_target(jnp.array(joints), jnp.ones((B, 17)), (64, 64), (16, 16), 2)
    batch = {
        "input": rng.rand(B, 64, 64, 3).astype(np.float32),
        "target": np.asarray(tgt).transpose(0, 2, 3, 1),
        "target_weight": np.ones((B, 17), np.float32),
    }
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), steps_per_epoch=10)
    state = replicate(state, mesh)
    step = make_train_step_mixed(cfg, model, mesh)
    sb = shard_batch(batch, mesh)
    losses = []
    for _ in range(8):
        state, metrics = step(state, sb, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 8
    assert all(np.isfinite(l) for l in losses)
    # λ is redrawn per step (folded with state.step) but the net must still fit
    # the fixed pair of targets on average
    assert min(losses[2:]) < losses[0], f"loss did not decrease: {losses}"


def test_make_mix_fn_dispatch():
    from buctd_tpu.train.mixing import make_mix_fn
    assert make_mix_fn(_small_cfg()) is None
    assert make_mix_fn(_small_cfg(["TRAIN.MIX", "mixup"])) is not None
    with pytest.raises(ValueError):
        make_mix_fn(_small_cfg(["TRAIN.MIX", "nope"]))


def test_process_shard_single_host():
    from buctd_tpu.parallel import initialize_distributed, process_shard
    assert initialize_distributed() is False  # single-process: no-op
    assert process_shard(10) == slice(0, 10)


def test_pck_accuracy_matches_reference():
    """Golden parity vs lib/core/evaluate.py accuracy() incl. its swapped [h, w]/10
    normalizer and cnt = #valid joint types."""
    import importlib.util, sys
    sys.path.insert(0, "/root/reference/lib")
    spec = importlib.util.spec_from_file_location(
        "ref_evaluate", "/root/reference/lib/core/evaluate.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from buctd_tpu.core.metrics import pck_accuracy
    rng = np.random.RandomState(0)
    B, J, h, w = 6, 17, 32, 24
    out = rng.rand(B, J, h, w).astype(np.float32)
    tgt = rng.rand(B, J, h, w).astype(np.float32)
    tgt[:, 3] = 0  # one joint type entirely invalid (argmax at 0,0)

    _, want_avg, want_cnt, _ = ref.accuracy(out, tgt)
    got_avg, got_cnt, _ = pck_accuracy(jnp.array(out), jnp.array(tgt))
    assert int(got_cnt) == want_cnt
    np.testing.assert_allclose(float(got_avg), want_avg, atol=1e-6)


def test_remat_is_identity():
    """TPU.REMAT (modes 'blocks'/'modules', models/hrnet.py::_maybe_remat) must
    not change the step numerics: same loss and same updated params as the
    no-remat step (remat only changes WHEN activations are (re)computed)."""
    from jax.flatten_util import ravel_pytree

    from buctd_tpu.models import get_model
    from buctd_tpu.ops import generate_target
    from buctd_tpu.train.state import create_train_state, make_train_step

    opts = [
        "MODEL.IMAGE_SIZE", "[64, 64]", "MODEL.HEATMAP_SIZE", "[16, 16]",
        "MODEL.EXTRA.STAGE2.NUM_MODULES", "1",
        "MODEL.EXTRA.STAGE3.NUM_MODULES", "1",
        "MODEL.EXTRA.STAGE4.NUM_MODULES", "1",
    ]
    B = 2
    rng = np.random.RandomState(0)
    joints = rng.rand(B, 17, 2).astype(np.float32) * 56 + 4
    tgt, _ = generate_target(jnp.array(joints), jnp.ones((B, 17)),
                             (64, 64), (16, 16), 2)
    batch = {
        "input": rng.rand(B, 64, 64, 3).astype(np.float32),
        "target": np.asarray(tgt).transpose(0, 2, 3, 1),
        "target_weight": np.ones((B, 17), np.float32),
    }

    got = {}
    for tag, extra in [
        ("off", []),
        ("modules", ["TPU.REMAT", "True"]),
        ("stem", ["TPU.REMAT", "True", "TPU.REMAT_MODE", "stem"]),
        ("blocks", ["TPU.REMAT", "True", "TPU.REMAT_MODE", "blocks"]),
    ]:
        cfg = _small_cfg(opts + extra)
        model = get_model(cfg, is_train=True)
        state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 64, 64, 3)), steps_per_epoch=10)
        new_state, metrics = make_train_step(cfg, model)(
            state, dict(batch), jax.random.PRNGKey(1))
        flat = ravel_pytree(new_state.params)[0]
        got[tag] = (float(metrics["loss"]), np.asarray(flat))

    for tag in ("stem", "modules", "blocks"):
        assert got["off"][0] == pytest.approx(got[tag][0], rel=1e-6), tag
        np.testing.assert_allclose(got["off"][1], got[tag][1], rtol=1e-5,
                                   atol=1e-7, err_msg=tag)
