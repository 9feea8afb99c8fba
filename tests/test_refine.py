"""On-device lax.scan iterative refinement (core/refine.py) and the inference API."""

import numpy as np
import pytest

from test_data_pipeline import _cfg

TINY = ["MODEL.IMAGE_SIZE", "[96, 128]", "MODEL.HEATMAP_SIZE", "[24, 32]",
        "MODEL.EXTRA.STAGE2.NUM_MODULES", "1",
        "MODEL.EXTRA.STAGE3.NUM_MODULES", "1",
        "MODEL.EXTRA.STAGE4.NUM_MODULES", "1",
        "MODEL.CONDITIONAL_TOPDOWN", "True", "DATASET.COLORED", "True",
        "TEST.POST_PROCESS", "True"]


def test_joints2cs_matches_numpy_path():
    import jax.numpy as jnp

    from buctd_tpu.core.refine import joints2cs_jax
    from buctd_tpu.geometry import joints2box, xywh2cs

    rng = np.random.RandomState(0)
    J = 17
    joints = rng.uniform(20, 200, (3, J, 3))
    joints[0, :5, :2] = 0  # some missing kpts
    c, s = joints2cs_jax(jnp.array(joints), 320, 240, 25, 96 / 128, 1.25)
    for i in range(3):
        box = joints2box(joints[i], margin=25, img_w=320, img_h=240)
        want_c, want_s = xywh2cs(*box, aspect_ratio=96 / 128, scale_thre=1.25)
        np.testing.assert_allclose(np.asarray(c)[i], want_c, atol=1e-3)
        np.testing.assert_allclose(np.asarray(s)[i], want_s, atol=1e-4)


def test_refine_scan_runs_and_first_round_matches_single_pass():
    import jax
    import jax.numpy as jnp

    from buctd_tpu.core.refine import make_refine_fn
    from buctd_tpu.models import get_model

    cfg = _cfg(TINY)
    model = get_model(cfg)
    variables = jax.jit(lambda k: model.init(k, jnp.zeros((1, 128, 96, 6)),
                                             train=False))(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (240, 320, 3)).astype(np.float32)
    cond = np.concatenate([rng.uniform(60, 260, (2, 17, 2)),
                           np.ones((2, 17, 1))], -1).astype(np.float32)
    colors = np.linspace(0, 255, 17 * 3).reshape(-1, 3)

    r1 = make_refine_fn(cfg, model, colors, n_iters=1)
    r3 = make_refine_fn(cfg, model, colors, n_iters=3)
    p1, m1 = r1(variables, jnp.asarray(img), jnp.asarray(cond))
    p3, m3 = r3(variables, jnp.asarray(img), jnp.asarray(cond))
    assert np.asarray(p3).shape == (2, 17, 2)
    assert np.isfinite(np.asarray(p3)).all()
    # refinement changes the answer (different conditions each round)...
    assert not np.allclose(np.asarray(p1), np.asarray(p3))
    # ...and 3 rounds from round-1 output == 2 rounds from round-1 conditions
    r2 = make_refine_fn(cfg, model, colors, n_iters=2)
    cond2 = np.concatenate([np.asarray(p1), np.asarray(m1)], axis=2)
    p_manual, _ = r2(variables, jnp.asarray(img), jnp.asarray(cond2))
    np.testing.assert_allclose(np.asarray(p_manual), np.asarray(p3), atol=1e-3)
