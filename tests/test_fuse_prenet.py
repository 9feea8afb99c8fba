"""Eval-time preNet fusion (models/fuse.py): exactness vs the canonical PreNet.

The fusion folds eval BatchNorms into conv weights and merges the two parallel
7x7 stems into one conv over concatenated channels (reference stems:
pose_hrnet.py:431-458, pose_resnet.py:160-171 — linear at eval, so this must be
exact up to float reassociation)."""

import numpy as np
import pytest

from test_data_pipeline import _cfg
from test_refine import TINY

# FUSED_PRENET defaults to 'off' since round 4 (measured negative on chip,
# bench_stem); the exactness tests opt in explicitly
PRENET_TINY = TINY + ["MODEL.EXTRA.USE_PRE_NET", "True",
                      "TPU.FUSED_PRENET", "auto"]


def _random_variables(model, x, seed=0):
    """Init then randomize every leaf so the BNs are NOT identity (fresh init
    has scale=1/bias=0/mean=0/var=1, which would hide folding bugs)."""
    import jax
    from jax.tree_util import keystr, tree_map_with_path

    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    rng = np.random.RandomState(seed)

    def rand(path, leaf):
        shape, dt = np.shape(leaf), np.asarray(leaf).dtype
        if "var" in keystr(path):
            return rng.uniform(0.3, 2.0, shape).astype(dt)
        if "scale" in keystr(path):
            return rng.uniform(0.5, 1.5, shape).astype(dt)
        # modest std: deep nets amplify normal(0, 0.5) weights to ~1e24 outputs
        return rng.normal(0.0, 0.05, shape).astype(dt)

    return tree_map_with_path(rand, variables)


def _fusion_roundtrip(cfg, x):
    import jax

    from buctd_tpu.models import get_model
    from buctd_tpu.models.fuse import maybe_fuse_prenet

    model = get_model(cfg, is_train=False)
    variables = _random_variables(model, x[:1])
    ref = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)

    fused_model, fused_vars = maybe_fuse_prenet(cfg, model, variables)
    assert fused_model.fused_prenet
    assert "_prenet" not in fused_vars["params"]
    assert "_prenet" not in fused_vars["batch_stats"]
    kb = np.asarray(fused_vars["params"]["_prenet_fused"]["b"]["kernel"])
    assert kb.shape[:3] == (7, 7, 67)  # 64 rgb-path + 3 cond channels
    out = jax.jit(lambda v, x: fused_model.apply(v, x, train=False))(
        fused_vars, x)
    # scale-normalized max error (matches test_torch_parity::_compare): the
    # trunk amplifies magnitudes, so per-element atol/rtol would be arbitrary
    want, got = np.asarray(ref), np.asarray(out)
    scale = np.abs(want).max() + 1e-12
    err = np.abs(got - want).max() / scale
    assert err < 1e-5, f"fused output mismatch {err:.2e} (scale {scale:.2e})"


def test_hrnet_prenet_fusion_exact():
    cfg = _cfg(opts=PRENET_TINY)
    x = np.random.RandomState(1).rand(2, 128, 96, 6).astype(np.float32)
    _fusion_roundtrip(cfg, x)


def test_resnet_prenet_fusion_exact():
    cfg = _cfg(opts=["MODEL.NAME", "pose_resnet",
                     "MODEL.EXTRA.NUM_LAYERS", "18",
                     "MODEL.IMAGE_SIZE", "[96, 128]",
                     "MODEL.HEATMAP_SIZE", "[24, 32]",
                     "MODEL.CONDITIONAL_TOPDOWN", "True",
                     "MODEL.EXTRA.USE_PRE_NET", "True",
                     "TPU.FUSED_PRENET", "auto"])
    x = np.random.RandomState(2).rand(2, 128, 96, 6).astype(np.float32)
    _fusion_roundtrip(cfg, x)


def test_maybe_fuse_is_identity_when_off_or_inapplicable():
    from buctd_tpu.models import get_model
    from buctd_tpu.models.fuse import maybe_fuse_prenet

    # knob off -> untouched
    cfg = _cfg(opts=PRENET_TINY + ["TPU.FUSED_PRENET", "off"])
    model = get_model(cfg, is_train=False)
    m2, v2 = maybe_fuse_prenet(cfg, model, {"params": {"_prenet": {}}})
    assert m2 is model and not getattr(m2, "fused_prenet", False)

    # no preNet in the model -> untouched even with the knob on
    cfg = _cfg(opts=TINY)
    model = get_model(cfg, is_train=False)
    m3, _ = maybe_fuse_prenet(cfg, model, {"params": {}})
    assert m3 is model

    # idempotent: fusing a fused pair is a no-op
    cfg = _cfg(opts=PRENET_TINY)
    model = get_model(cfg, is_train=False)
    import jax
    x = np.zeros((1, 128, 96, 6), np.float32)
    variables = jax.jit(lambda k: model.init(k, x, train=False))(
        jax.random.PRNGKey(0))
    m4, v4 = maybe_fuse_prenet(cfg, model, variables)
    m5, v5 = maybe_fuse_prenet(cfg, m4, v4)
    assert m5 is m4 and v5 is v4


def test_fused_model_refuses_training():
    import jax

    from buctd_tpu.models import get_model
    from buctd_tpu.models.fuse import maybe_fuse_prenet

    cfg = _cfg(opts=PRENET_TINY)
    model = get_model(cfg, is_train=False)
    x = np.zeros((1, 128, 96, 6), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    fused_model, fused_vars = maybe_fuse_prenet(cfg, model, variables)
    with pytest.raises(AssertionError, match="eval-only"):
        fused_model.apply(fused_vars, x, train=True,
                          mutable=["batch_stats"])
