"""Shared helpers for the 2-process distributed tests (test_distributed.py).

Imported both by the pytest parent (single-process CPU) and by the spawned
jax.distributed children, so the single-process reference and the multi-process
runs execute the SAME code on the SAME deterministic model/batch.
"""

import types

import numpy as np

TINY = ["MODEL.IMAGE_SIZE", "[64, 64]", "MODEL.HEATMAP_SIZE", "[16, 16]",
        "MODEL.EXTRA.STAGE2.NUM_MODULES", "1",
        "MODEL.EXTRA.STAGE3.NUM_MODULES", "1",
        "MODEL.EXTRA.STAGE4.NUM_MODULES", "1"]


def tiny_cfg(extra=()):
    from buctd_tpu.config import default_config, update_config

    cfg = default_config()
    update_config(cfg, types.SimpleNamespace(
        cfg="/root/repo/experiments/coco/hrnet/w32_384x288_adam_lr1e-3.yaml",
        opts=TINY + list(extra), modelDir="", logDir="", dataDir=""))
    return cfg


def global_batch(n=8, J=17):
    """Deterministic n-row training batch (same on every process)."""
    import jax
    import jax.numpy as jnp

    from buctd_tpu.ops import generate_target

    rng = np.random.RandomState(0)
    joints = rng.rand(n, J, 2).astype(np.float32) * 56 + 4
    tgt, _ = jax.jit(
        lambda j, v: generate_target(j, v, (64, 64), (16, 16), 2))(
            jnp.array(joints), jnp.ones((n, J)))
    return {
        "input": rng.rand(n, 64, 64, 3).astype(np.float32),
        "target": np.asarray(tgt).transpose(0, 2, 3, 1),
        "target_weight": np.ones((n, J), np.float32),
    }


def two_step_losses(cfg, batch, mesh=None):
    """Losses of TWO consecutive make_train_step calls on the same batch.

    The second loss sees the first step's params/BN updates, so matching
    (loss1, loss2) across a single-process run and an N-process sharded run
    proves end-to-end gradient/update equivalence (reference DataParallel is
    loss-equivalent to single-GPU, tools/train.py:147), not just that the
    forward agrees.  ``batch``: the global batch single-process, or this
    process's local rows under a multi-process mesh (shard_batch convention).
    """
    import jax
    import jax.numpy as jnp

    from buctd_tpu.models import get_model
    from buctd_tpu.train.state import create_train_state, make_train_step

    model = get_model(cfg, is_train=True)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), steps_per_epoch=10)
    step = make_train_step(cfg, model, mesh)
    if mesh is not None:
        from buctd_tpu.parallel import replicate, shard_batch
        state = replicate(state, mesh)
        batch = shard_batch(batch, mesh)
    losses = []
    for _ in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))
    return losses
